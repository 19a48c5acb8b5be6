"""Multimodal column plumbing: binary payloads + typed metadata.

Image/audio/video are treated as opaque ``binary`` columns with typed
metadata, processed by actor-pool map_batches stages. The decode /
resize / frame-sample kernels themselves are STUBBED (the decode
libraries are not in this container): ``DecodeStub`` either raises
``NotImplementedError`` (strict mode) or produces a deterministic fake
feature vector derived from the payload's content hash — which keeps
the Ray-side plumbing (schema, batch sizing, actor signature, output
layout) real and testable end-to-end.

Scale notes: binary payloads are large, so these stages use small
``batch_size`` (payload_bytes * batch_size * concurrency must fit the
worker heap) and ``batch_format="pyarrow"`` throughout (binary columns
round-trip poorly through pandas).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from stringzilla_ray.functions import szhash
from stringzilla_ray.util import actor_pool_limits

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("kind", pa.string()),        # image | audio | video
        ("payload", pa.large_binary()),
        ("width", pa.int32()),
        ("height", pa.int32()),
        ("sample_rate", pa.int32()),
        ("duration_ms", pa.int32()),
    ]
)


class DecodeStub:
    """Actor-pool UDF with the real signature a decoder would have.

    strict=True raises NotImplementedError (the honest marker that the
    decode kernel is absent in this environment); strict=False emits a
    deterministic fake: feature = first 16 bytes of the payload's
    seeded AES-64 hash stream, as float32[16].
    """

    FEATURE_DIM = 16

    def __init__(self, strict: bool = False, seed: int = 0):
        self.strict = strict
        self.seed = seed

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.strict:
            raise NotImplementedError(
                "media decode requires image/audio libraries not present in this container"
            )
        payloads = batch["payload"]
        if isinstance(payloads, pa.ChunkedArray):
            payloads = payloads.combine_chunks()
        # Vectorized: one batched tape hash per feature dim (bit-equal
        # to the old per-row hash_bytes loop), no per-row Python.
        from stringzilla_ray.functions.text import tape_of

        tape, offsets = tape_of(payloads)
        tape = np.asarray(tape)
        feats = np.zeros((len(batch), self.FEATURE_DIM), dtype=np.float32)
        for j in range(self.FEATURE_DIM):
            h = szhash.hash_batch(tape, offsets, seed=self.seed + j)
            feats[:, j] = (h % np.uint64(10_000)).astype(np.float32) / np.float32(10_000.0)
        col = pa.FixedSizeListArray.from_arrays(
            pa.array(feats.ravel(), pa.float32()), self.FEATURE_DIM
        )
        return batch.append_column("features", col)


def decode_features(ds, strict: bool = False, seed: int = 0, batch_size: int = 64):
    """Media Dataset -> + features fixed_size_list<float32>[16].

    Small batch_size: payloads are large binaries; concurrency x
    batch_size x payload bytes bounds per-actor heap use.
    """
    return ds.map_batches(
        DecodeStub,
        fn_constructor_kwargs=dict(strict=strict, seed=seed),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=actor_pool_limits(16),
    )


def synthetic_media_table(n: int = 32, seed: int = 0) -> pa.Table:
    """Deterministic fake media rows for tests/demos."""
    rng = np.random.default_rng(seed)
    payloads = [rng.integers(0, 256, size=int(rng.integers(64, 2048)), dtype=np.uint8).tobytes() for _ in range(n)]
    kinds = [["image", "audio", "video"][i % 3] for i in range(n)]
    return pa.table(
        {
            "media_id": pa.array(np.arange(n), pa.int64()),
            "kind": pa.array(kinds, pa.string()),
            "payload": pa.array(payloads, pa.large_binary()),
            "width": pa.array(rng.integers(16, 1024, n, dtype=np.int32), pa.int32()),
            "height": pa.array(rng.integers(16, 1024, n, dtype=np.int32), pa.int32()),
            "sample_rate": pa.array(np.where(np.arange(n) % 3 == 1, 16000, 0).astype(np.int32), pa.int32()),
            "duration_ms": pa.array(rng.integers(0, 60000, n, dtype=np.int32), pa.int32()),
        }
    )
