"""Shared pipeline helpers."""

from __future__ import annotations


def cluster_partitions(minimum: int = 16) -> int:
    """Bucketed-shuffle partition count derived from the CLUSTER's CPU count
    (P = max(minimum, 2 x total cores)).

    P ≈ 2x total cores keeps every core busy without paying Ray per-group
    overhead for tiny groups; deriving from ``ray.cluster_resources()`` means
    the same pipeline code sizes its shuffles correctly on a 256-node cluster
    without hand-set knobs (the ``kg.triples_pipeline`` pattern). Callers that
    iterate (e.g. connected components) pass a smaller ``minimum`` so fixed
    per-round task overhead stays bounded in small sessions.
    """
    import ray

    return max(minimum, 2 * int(ray.cluster_resources().get("CPU", 8)))
