"""Actor-pool sizing shared by every broadcast map_batches stage.

A fixed ``concurrency=(1, 8)`` default left 24 of 32 CPUs idle during the
dominant stage of most queries (overlay_union spent 210 s at 8 actors where
the same work fits in ~70 s at 28). Autoscaling pools start at 1 actor, so
small inputs never over-spawn; the cap just needs to track the cluster.

NOTE: never use a FIXED concurrency equal to the CPU count — it starves
upstream read tasks and deadlocks (see DEVNOTES); always (1, N) with
N < cpus.
"""

from __future__ import annotations


def default_pool(concurrency=None):
    """Resolve ``None`` into ``(1, max(8, cpus - 4))``; pass explicit
    values through unchanged."""
    if concurrency is not None:
        return concurrency
    import ray

    try:
        cpus = int(ray.cluster_resources().get("CPU", 8))
    except Exception:
        cpus = 8
    return (1, max(8, cpus - 4))
