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


def source_blocks(path: str, per_block_bytes: int = 96 << 10,
                  target_block_bytes: int = 32 << 20) -> int:
    """Read block count bounded by BOTH the cluster and the data:
    ``max(size/32MB, min(2 x cores, size/per_block_bytes))``.

    The ``2 x cores`` term alone (and Ray's own default heuristic) is
    cluster-first: a megabyte-scale file on a 16-cpu session splits into 32
    near-empty blocks, and every downstream stage pays 32 task launches for
    kilobytes of work — measured as the small bench queries running SLOWER
    at 16 cpus than at 4 (anti-scaling pure overhead). Bounding the fan-out
    at one block per ``per_block_bytes`` of source makes parallelism follow
    the data. At 100-TB scale the ``size/32MB`` term dominates and the
    behavior is identical to Ray's default splitting."""
    import os as _os

    import ray

    try:
        size = _os.path.getsize(path)
    except OSError:
        size = 0
    ncpu = int(ray.cluster_resources().get("CPU", 8))
    size_blocks = size // target_block_bytes + 1
    return int(max(size_blocks, min(2 * ncpu, size // per_block_bytes + 1)))


def sized_partitions(data_bytes: int, minimum: int = 4,
                     per_part_bytes: int = 64 << 10) -> int:
    """Bucketed-shuffle partition count bounded by BOTH cluster and data:
    ``max(minimum, min(2 x cores, data_bytes/per_part_bytes))``. The
    data-size bound matters only at the small end (a 5k-row table does not
    need a 32-way exchange); at scale the cluster term wins, matching
    :func:`cluster_partitions`."""
    import ray

    ncpu = int(ray.cluster_resources().get("CPU", 8))
    return int(max(
        minimum, min(2 * ncpu, data_bytes // per_part_bytes + 1)
    ))


def bucketed_sum_combine(partials, keys, sum_cols, schema,
                         num_partitions: int | None = None,
                         how: str = "sum"):
    """Combine small pre-aggregated partials by key through ONE bucketed
    map_groups: crc32(key) % P bucket column, in-task pandas groupby-sum over
    the real keys, Arrow out with the caller's explicit ``schema``.

    This replaces ``Dataset.groupby(...).aggregate(Sum(...))`` for
    BOUNDED-cardinality aggregates (windows, status codes, Q1 flag pairs):
    Ray's aggregate pays ~2.5s of fixed shuffle/aggregator setup per call
    (measured at 16 cpus, sf0.1 — 2.7s vs 1.2s for this pattern), which
    dominates when the partials are already tiny (≤ groups x blocks rows).
    The data movement is identical — partials partition once by key hash —
    so the choice holds at any scale where the group count is bounded.
    Unbounded keys (tokens, doc hashes) keep using Ray's aggregate, which
    spills; this helper assumes the in-task groups fit a worker's heap.

    ``how`` is any associative pandas reduction ("sum", "max", "min") — max
    is the HLL register-merge.
    """
    import zlib

    import numpy as np
    import pandas as pd
    import pyarrow as pa

    if num_partitions is None:
        num_partitions = cluster_partitions(minimum=8)

    def bucket(df: pd.DataFrame) -> pa.Table:
        if len(keys) == 1:
            sk = df[keys[0]].astype(str)
        else:
            sk = df[keys[0]].astype(str)
            for k in keys[1:]:
                sk = sk + ":" + df[k].astype(str)
        parts = np.fromiter(
            (zlib.crc32(s.encode()) % num_partitions for s in sk),
            dtype=np.int32, count=len(sk),
        )
        df = df.assign(part=parts)
        return pa.Table.from_pandas(df, preserve_index=False)

    def combine(df: pd.DataFrame) -> pa.Table:
        if len(df) == 0:
            return schema.empty_table()
        g = df.groupby(keys, as_index=False)[sum_cols].agg(how)
        return pa.Table.from_pandas(g, preserve_index=False).select(
            schema.names
        ).cast(schema)

    return (
        partials.map_batches(bucket, batch_format="pandas")
        .groupby("part")
        .map_groups(combine, batch_format="pandas")
    )


def bloom_bitmap(ds, col: str, m_bits: int):
    """Build one Bloom bitmap over a uint64-keyed dataset column: every
    block reduces to a FIXED-SIZE bitmap partial (m_bits/8 bytes regardless
    of how many keys the block held), and the driver OR-merges the
    <= #blocks partials — a bounded streaming reduction like a convergence
    scalar, never the key set itself. Returns the merged uint64 word array
    (ship it with ``ray.put``)."""
    import numpy as np
    import pyarrow as pa

    from ..functions.vectorized import bloom_set

    n_words = m_bits >> 6

    def partial(batch: pa.Table) -> pa.Table:
        words = np.zeros(n_words, dtype=np.uint64)
        bloom_set(
            words, np.asarray(batch[col].to_pylist(), dtype=np.uint64),
            m_bits,
        )
        return pa.table({"words": pa.array([words.tobytes()], pa.binary())})

    merged = np.zeros(n_words, dtype=np.uint64)
    for b in ds.map_batches(
        partial, batch_format="pyarrow"
    ).iter_batches(batch_format="pyarrow"):
        for buf in b["words"]:
            merged |= np.frombuffer(buf.as_py(), dtype=np.uint64)
    return merged
