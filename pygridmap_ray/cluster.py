"""Cluster-derived execution defaults.

Shuffle widths must never be literals in a pipeline plan: a constant
that fits one laptop caps exchange parallelism on a 256-node cluster
and concentrates per-partition memory.  Every partitioned join /
repartition in the engine derives its width from the live cluster via
:func:`default_num_partitions` (CPU-count based in this single-node
sandbox; on a real cluster ``ray.cluster_resources()`` reflects all
nodes, so the same call scales the plan with the cluster).
"""

from __future__ import annotations

import ray


def default_num_partitions(min_parts: int = 2, per_cpu: float = 0.5) -> int:
    """Shuffle width for partitioned joins / repartitions.

    ``per_cpu`` defaults to 0.5 (one exchange partition per two cores):
    hash-join build/probe tasks are memory-hungry, so oversubscribing
    cores with exchange partitions only adds object-store churn.  Falls
    back to 4 CPUs when no Ray session exists yet (plan built before
    ``ray.init`` — the width is re-derived lazily at call time by every
    pipeline, so this path only serves unit imports).
    """
    cpus = 4.0
    if ray.is_initialized():
        cpus = float(ray.cluster_resources().get("CPU", 4.0))
    return max(min_parts, int(cpus * per_cpu))
