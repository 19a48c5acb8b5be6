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
    return (1, max(1, min(cap, cpus)))
