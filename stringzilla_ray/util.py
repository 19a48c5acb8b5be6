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


def join_partitions(cap: int = 16) -> int:
    """Hash-join/shuffle partition count bounded by cluster CPUs: join
    aggregators are actors, and asking for more partitions than CPUs
    deadlocks a small session while adding nothing on a big one."""
    try:
        import ray

        cpus = int(ray.available_resources().get("CPU", 0)) or 8
    except Exception:
        cpus = 8
    return max(2, min(cap, cpus))
