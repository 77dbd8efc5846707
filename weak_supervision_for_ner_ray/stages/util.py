"""Small stage utilities."""

from __future__ import annotations

import ray


def default_concurrency(concurrency=None):
    """Actor-pool sizing: autoscale between 1 and the cluster CPU count.

    Callable-class ``map_batches`` stages require an explicit pool size; an
    autoscaling (1, n_cpus) pool lets the streaming executor balance this
    stage against the read/write/shuffle stages instead of starving them.
    """
    if concurrency is not None:
        return concurrency
    try:
        cpus = int(ray.cluster_resources().get("CPU", 4))
    except Exception:
        cpus = 4
    return (1, max(2, cpus))
