"""Small shared helpers for stage construction."""

from __future__ import annotations


def actor_pool_limits(cap: int = 64) -> tuple[int, int]:
    """Autoscaling (min, max) actor-pool size bounded by the cluster's
    CPUs — the same code then sizes itself correctly at N and 4N CPUs
    without retuning, and small test sessions don't churn actors."""
    try:
        import ray

        cpus = int(ray.available_resources().get("CPU", 0)) or 8
    except Exception:
        cpus = 8
    hi = max(1, min(cap, cpus))
    return (max(1, hi // 2), hi)


def ensure_materialized(ds):
    """Materialize a Dataset once (no-op when already materialized).

    Guard for gather points: ``to_arrow_refs()`` on a LAZY dataset
    executes the plan and then issues a limit=1 schema peek that
    RE-EXECUTES it — for all-to-all plans (groupby/sort) the peek
    re-runs the full shuffle; ``count()`` before a gather adds a third
    execution. Measured: a lazy census plan ran twice per gather."""
    try:
        from ray.data.dataset import MaterializedDataset

        if isinstance(ds, MaterializedDataset):
            return ds
    except ImportError:
        pass
    return ds.materialize()


def reduce_buckets(per_cpu: int = 4, cap: int = 256) -> int:
    """Bucket count for hash-bucket reduces (the groupby replacement
    for HIGH-CARDINALITY keys). Ray's native groupby-aggregate runs a
    per-group Python reduce — minutes at 10^6 distinct keys, unusable
    at 10^7 pairs; bucketing by key hash leaves a handful of groups,
    each reduced with one vectorized np.unique/lexsort pass."""
    try:
        import ray

        cpus = int(ray.available_resources().get("CPU", 0)) or 8
    except Exception:
        cpus = 8
    return max(4, min(cap, cpus * per_cpu))


def join_partitions(cap: int = 16) -> int:
    """Hash-join partition count bounded by HALF the cluster CPUs: join
    aggregators are actors that hold their CPU slot for the lifetime of
    the execution graph, so a join sized to ALL CPUs starves any
    downstream map/aggregate operator in the same lazy graph and the
    whole pipeline deadlocks (observed: blocking self-join + distinct
    groupby at num_partitions == num_cpus == 8). Half leaves slots for
    the rest of the graph; on a big cluster the cap keeps partitions
    reasonable anyway."""
    try:
        import ray

        cpus = int(ray.available_resources().get("CPU", 0)) or 8
    except Exception:
        cpus = 8
    return max(2, min(cap, cpus // 2))


def strip_schema_metadata(batch):
    """Drop parquet's pandas schema metadata from a batch. Ray's hash
    shuffle deduplicates partition schemas by hashing them; the pandas
    metadata dict makes every schema unhashable ("Failed to hash the
    schemas" in every HashShuffleAggregator) and forces repeated
    schema unification in finalize — the path behind a rare
    ArrowInvalid there. Zero-copy: only the schema object changes."""
    return batch.replace_schema_metadata(None)


def read_parquet_clean(path, **kwargs):
    """ray.data.read_parquet + metadata strip fused into the read."""
    import ray.data

    return ray.data.read_parquet(path, **kwargs).map_batches(
        strip_schema_metadata, batch_format="pyarrow", zero_copy_batch=True
    )
