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


def default_pool(concurrency=None, nrows=None, batch_size=None):
    """Resolve ``None`` into ``(1, max(8, cpus - 4))``; pass explicit
    values through unchanged.

    ``nrows``/``batch_size`` (both optional) are a size hint: when the
    caller knows the input row count (parquet footer metadata — free),
    the actor cap is additionally bounded by the number of batches the
    input actually yields. Tiny broadcast queries (single-block inputs)
    otherwise pay ~24 actors of spin-up for one batch of work — the
    r3 pip_pairs/knn3 regression (1.2 s → 4.2/7.9 s). The hint only
    LOWERS the cap, so big inputs keep the full cluster-sized pool."""
    if concurrency is not None:
        return concurrency
    import ray

    try:
        cpus = int(ray.cluster_resources().get("CPU", 8))
    except Exception:
        cpus = 8
    cap = max(8, cpus - 4)
    if nrows is not None and batch_size:
        # floor of 2: block bundling can emit one stray extra batch, and a
        # second warm actor hides one slow spawn; beyond that, extra actors
        # on a single-batch input are pure spin-up cost
        cap = min(cap, max(2, -(-int(nrows) // int(batch_size))))
    return (1, cap)


SMALL_TASK_BATCHES = 4


def broadcast_map_batches(ds, cls, *, fn_constructor_kwargs, batch_size,
                          batch_format="pyarrow", concurrency=None,
                          nrows=None, **kw):
    """map_batches dispatch for broadcast stages with a CHEAP __init__.

    Small inputs (<= SMALL_TASK_BATCHES batches by the ``nrows`` hint) run
    as a STATELESS task-pool stage: Ray tasks reuse warm worker processes,
    so there is no actor spawn at all — the class is constructed fresh per
    batch (init must be cheap: a ray.get of the broadcast ref + a small
    index build). Measured on knn3 (15k rows, one batch): even a capped
    2-actor pool swings 1.4-6.7 s on a warm session from actor-spawn
    timing; the task pool is a stable 0.8-0.9 s. Large inputs keep the
    autoscaling actor pool so the init runs once per actor, not per batch.
    """
    if concurrency is None and nrows is not None and batch_size:
        if -(-int(nrows) // int(batch_size)) <= SMALL_TASK_BATCHES:
            def fn(batch):
                return cls(**fn_constructor_kwargs)(batch)

            return ds.map_batches(fn, batch_size=batch_size,
                                  batch_format=batch_format, **kw)
    return ds.map_batches(
        cls, fn_constructor_kwargs=fn_constructor_kwargs,
        batch_size=batch_size, batch_format=batch_format,
        concurrency=default_pool(concurrency, nrows=nrows,
                                 batch_size=batch_size),
        **kw,
    )
