"""Pure vectorized kernels (NumPy / pyarrow.compute) — no Ray imports here.

Each module documents the reference semantics it reproduces
(citations are file:line into the read-only reference checkout).
"""
