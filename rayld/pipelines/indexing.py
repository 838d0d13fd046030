"""Corpus indexing / ordering operators over the ``documents`` table:
inverted-index posting lists and deterministic seeded shuffle-sharding
(training-order assignment).

Scale shapes:
- ``token_postings`` rides ONE bucketed token-key shuffle; each batch
  pre-truncates to its local first-K doc ids per token, so the exchange
  moves at most K rows per token per block — never the full posting list
  of a stop-word-grade token.
- ``shuffle_shards`` needs NO global sort: md5 keys are uniform, so the
  shard id is a pure key-prefix range split (embarrassingly parallel), and
  the within-shard position comes from an in-task sort inside one bucketed
  shard-key exchange. Equal-size-shard guarantees at 100 TB come from the
  key uniformity (binomial concentration), not a rank pass.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa

from .text import _TOKEN_RE, documents

_POSTINGS_SCHEMA = pa.schema(
    [
        ("token", pa.string()),
        ("doc_id", pa.int64()),
        ("rank", pa.int64()),
    ]
)


def token_postings(sf_dir: str, k: int = 20, num_partitions: int | None = None):
    """Inverted-index posting lists: the first ``k`` doc_ids (ascending) per
    token, ranked — the retrieval-index building block. Per-batch partial:
    distinct (token, doc_id) pairs truncated to the batch-local first-k per
    token (any doc in the global first-k is in its block's first-k, so the
    truncation is lossless); then one crc32(token) % P bucketed exchange and
    an in-task merge + final truncation per real token."""
    import zlib

    from .common import cluster_partitions

    if num_partitions is None:
        num_partitions = cluster_partitions()

    def partial(df: pd.DataFrame) -> pa.Table:
        ex = df.set_index("doc_id")["text"].str.findall(_TOKEN_RE).explode()
        ex = ex.dropna()
        pairs = (
            pd.DataFrame({"doc_id": ex.index, "token": ex.to_numpy()})
            .drop_duplicates()
            .sort_values(["token", "doc_id"], kind="mergesort")
            .groupby("token", as_index=False, sort=False)
            .head(k)
        )
        parts = np.fromiter(
            (zlib.crc32(t.encode()) % num_partitions for t in pairs["token"]),
            dtype=np.int32, count=len(pairs),
        )
        return pa.table(
            {
                "token": pa.array(pairs["token"].astype(str), pa.string()),
                "doc_id": pa.array(
                    pairs["doc_id"].to_numpy(np.int64), pa.int64()
                ),
                "part": pa.array(parts, pa.int32()),
            }
        )

    def finish(g: pd.DataFrame) -> pa.Table:
        if len(g) == 0:
            return _POSTINGS_SCHEMA.empty_table()
        g = (
            g.drop_duplicates(["token", "doc_id"])
            .sort_values(["token", "doc_id"], kind="mergesort")
            .groupby("token", as_index=False, sort=False)
            .head(k)
        )
        rank = g.groupby("token", sort=False).cumcount() + 1
        return pa.table(
            {
                "token": pa.array(g["token"].astype(str), pa.string()),
                "doc_id": pa.array(g["doc_id"].to_numpy(np.int64), pa.int64()),
                "rank": pa.array(rank.to_numpy(np.int64), pa.int64()),
            }
        )

    return (
        documents(sf_dir)
        .map_batches(partial, batch_format="pandas")
        .groupby("part")
        .map_groups(finish, batch_format="pandas")
    )


_SHARD_SCHEMA = pa.schema(
    [
        ("doc_id", pa.int64()),
        ("shard_id", pa.int64()),
        ("pos", pa.int64()),
    ]
)


def shuffle_shards(sf_dir: str, n_shards: int = 8, seed: int = 42):
    """Deterministic seeded corpus shuffle + shard assignment (the training
    data-order primitive): key = md5(seed:doc_id); shard_id is a range split
    of the key's 32-bit prefix (uniform keys -> near-equal shards with no
    global rank pass); pos is the key-order position within the shard, from
    an in-task sort inside one bucketed shard exchange. Reshuffling = new
    seed; adding docs permutes only their own shard's positions."""

    def keyed(df: pd.DataFrame) -> pa.Table:
        keys = [
            hashlib.md5(f"{seed}:{i}".encode()).hexdigest()
            for i in df["doc_id"]
        ]
        prefix = np.fromiter(
            (int(x[:8], 16) for x in keys), dtype=np.int64, count=len(keys)
        )
        shard = prefix * n_shards // (1 << 32)
        return pa.table(
            {
                "doc_id": pa.array(df["doc_id"].to_numpy(np.int64)),
                "key": pa.array(keys, pa.string()),
                "shard_id": pa.array(shard.astype(np.int64), pa.int64()),
            }
        )

    def rank_shard(g: pd.DataFrame) -> pa.Table:
        if len(g) == 0:
            return _SHARD_SCHEMA.empty_table()
        g = g.sort_values(["key", "doc_id"], kind="mergesort")
        return pa.table(
            {
                "doc_id": pa.array(g["doc_id"].to_numpy(np.int64), pa.int64()),
                "shard_id": pa.array(
                    g["shard_id"].to_numpy(np.int64), pa.int64()
                ),
                "pos": pa.array(
                    np.arange(len(g), dtype=np.int64), pa.int64()
                ),
            }
        )

    return (
        documents(sf_dir, columns=("doc_id",))
        .map_batches(keyed, batch_format="pandas")
        .groupby("shard_id")
        .map_groups(rank_shard, batch_format="pandas")
    )
