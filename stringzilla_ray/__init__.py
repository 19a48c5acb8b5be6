"""stringzilla_ray — a Ray-Data-native record-linkage / string-processing engine.

A brand-new engine (NOT a port) exposing the query and data-processing
capabilities of ashvardanian/StringZilla as distributed Ray Data
operators: per-string scalar kernels (hash / find / split / fold),
batch similarity engines (Levenshtein / Needleman-Wunsch /
Smith-Waterman), rolling-hash MinHash fingerprints, collection
operators (sort / top-k / intersect / sample / dedup) — composed into
the flagship blocking + pairwise-scoring + transitive-clustering
entity-resolution pipeline over multi-turn conversation transcripts.

Layout:
  functions/  pure, vectorized NumPy/Arrow kernels (no Ray) with
              bit-parity contracts against the reference's own test
              oracles (see each module's docstring for file:line cites)
  stages/     Dataset -> Dataset transforms (map_batches / groupby)
  sources/    readers / writers / checkpointed parquet IO
  pipelines/  flagship compositions (entity resolution, dedup)
  state/      configs, stage manifests, resume logic
"""

__version__ = "0.1.0"
