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
import math

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


BM25_TERMS = ("hash", "join", "scan", "window")


def bm25_scores(sf_dir: str, terms: tuple[str, ...] = BM25_TERMS):
    """BM25 ranked retrieval scores (Robertson/Sparck-Jones; the Lucene
    ``k1=1.2, b=0.75`` parameterization with the +1-smoothed idf) for a fixed
    query-term set over every matching document.

    Plan: ONE scan of the text column projects each doc to a compact
    ``(doc_id, dl, tf_i...)`` row (k+2 int64 columns — the only thing
    materialized); corpus stats ``(N, total_tokens, df_i...)`` fold to one
    tiny row via per-block partials summed on the driver; scoring is then an
    embarrassingly-parallel vectorized pass over the projection with the
    stats closed over — no shuffle anywhere.

    Exact-oracle contract: each per-term score is rounded half-up to integer
    MICRO units before the cross-term sum, and every float expression is
    written in the same literal op order as the SQL oracle (idf via libm
    ``ln`` on both sides), so the final doubles are bit-identical.
    ``dl * N`` must stay under 2^53 for the float64 ratio to be exact —
    fine up to ~10^9 docs of 10^4 tokens; beyond that switch the ratio to
    a pre-divided ``avgdl`` at a documented ulp cost."""
    k = len(terms)
    sch = pa.schema(
        [("doc_id", pa.int64()), ("dl", pa.int64())]
        + [(f"tf_{i}", pa.int64()) for i in range(k)]
    )

    def project(df: pd.DataFrame) -> pa.Table:
        toks = df["text"].str.findall(_TOKEN_RE)
        cols = {
            "doc_id": df["doc_id"].to_numpy(np.int64),
            "dl": toks.str.len().to_numpy(np.int64),
        }
        ex = toks.explode().dropna()
        sel = ex[ex.isin(terms)]
        ct = sel.groupby([sel.index, sel]).size().unstack(fill_value=0)
        ct = ct.reindex(index=df.index, columns=list(terms), fill_value=0)
        for i, t in enumerate(terms):
            cols[f"tf_{i}"] = ct[t].to_numpy(np.int64)
        return pa.table(cols, schema=sch)

    proj = documents(sf_dir).map_batches(
        project, batch_format="pandas"
    ).materialize()

    def stat_partial(df: pd.DataFrame) -> pd.DataFrame:
        row = {"n": [len(df)], "tt": [int(df["dl"].sum())]}
        for i in range(k):
            row[f"df_{i}"] = [int((df[f"tf_{i}"] > 0).sum())]
        return pd.DataFrame(row)

    stats = pd.concat(
        [b for b in proj.map_batches(
            stat_partial, batch_format="pandas"
        ).iter_batches(batch_format="pandas")],
        ignore_index=True,
    ).sum()
    n_docs, total = int(stats["n"]), int(stats["tt"])
    idf = [
        math.log(1.0 + (n_docs - int(stats[f"df_{i}"]) + 0.5)
                 / (int(stats[f"df_{i}"]) + 0.5))
        for i in range(k)
    ]

    out_sch = pa.schema([
        ("doc_id", pa.int64()), ("n_terms", pa.int64()),
        ("bm25", pa.float64()),
    ])

    def score(df: pd.DataFrame) -> pa.Table:
        dl = df["dl"].to_numpy(np.int64)
        micro = np.zeros(len(df), np.int64)
        n_terms = np.zeros(len(df), np.int64)
        denom_tail = 1.2 * (0.25 + 0.75 * ((dl * n_docs) / total))
        for i in range(k):
            tf = df[f"tf_{i}"].to_numpy(np.int64)
            s = (idf[i] * (tf * 2.2)) / (tf + denom_tail)
            micro += np.floor(s * 1000000.0 + 0.5).astype(np.int64)
            n_terms += (tf > 0).astype(np.int64)
        keep = n_terms > 0
        return pa.table({
            "doc_id": pa.array(df["doc_id"].to_numpy(np.int64)[keep]),
            "n_terms": pa.array(n_terms[keep]),
            "bm25": pa.array(micro[keep] / 1000000.0, pa.float64()),
        }, schema=out_sch)

    return proj.map_batches(score, batch_format="pandas")


def bm25_oracle_sql(terms: tuple[str, ...] = BM25_TERMS) -> str:
    """DuckDB mirror of ``bm25_scores`` — the SAME literal float expression
    per term (libm ``ln``, left-assoc multiply/divide, integer-micro
    rounding before the cross-term sum), generated for the default terms."""
    tf_cols = ", ".join(
        "len(list_filter(toks, x -> x = '%s'))::BIGINT AS tf_%d" % (t, i)
        for i, t in enumerate(terms)
    )
    df_cols = ", ".join(
        "sum(CASE WHEN tf_%d > 0 THEN 1 ELSE 0 END)::BIGINT AS df_%d"
        % (i, i) for i in range(len(terms))
    )
    n_terms = " + ".join(
        "(tf_%d > 0)::BIGINT" % i for i in range(len(terms))
    )
    micro = " + ".join(
        "floor(ln(1 + (n - df_%d + 0.5) / (df_%d + 0.5))"
        " * (tf_%d * 2.2)"
        " / (tf_%d + 1.2 * (0.25 + 0.75 * ((dl * n)::DOUBLE / tt::DOUBLE)))"
        " * 1000000.0 + 0.5)::BIGINT" % (i, i, i, i)
        for i in range(len(terms))
    )
    return (
        "WITH t AS (SELECT doc_id, len(toks)::BIGINT AS dl, " + tf_cols
        + " FROM (SELECT doc_id,"
        " regexp_extract_all(text, '[A-Za-z0-9]+') AS toks"
        " FROM documents)),"
        " s AS (SELECT count(*)::BIGINT AS n, sum(dl)::BIGINT AS tt, "
        + df_cols + " FROM t)"
        " SELECT doc_id, (" + n_terms + ")::BIGINT AS n_terms,"
        " (" + micro + ") / 1000000.0 AS bm25"
        " FROM t, s WHERE " + n_terms + " > 0"
    )


def rrf_fusion(sf_dir: str, terms: tuple[str, ...] = BM25_TERMS,
               k_rrf: int = 60, list_n: int = 100, top_n: int = 20):
    """Hybrid retrieval re-ranking: reciprocal-rank fusion (Cormack et al.
    2009) of the BM25 relevance list and the corpus quality-score list —
    the 'relevant AND well-formed' document selection step of a curation
    pipeline. rrf(d) = 1/(k + rank_bm25(d)) + 1/(k + rank_quality(d)),
    each term 0 when the doc is outside that list's top ``list_n``.

    Both input rankings are integer-exact (bm25 micro-units, quality
    6dp-quantized), ranks are total orders with doc_id tiebreak, and the
    two reciprocal terms are added in a fixed order — so the fused score
    is bit-identical to the SQL oracle. Distributed work = the two
    existing shuffle-free scoring passes + two sort/limit(list_n) heads;
    the fusion itself is a driver-side merge of two <= list_n-row lists
    (bounded, like the ann merge)."""
    from .text import quality_score

    bm = (
        bm25_scores(sf_dir, terms)
        .sort(["bm25", "doc_id"], descending=[True, False])
        .limit(list_n).to_pandas()
    )
    qual = (
        quality_score(sf_dir)
        .sort(["quality", "doc_id"], descending=[True, False])
        .limit(list_n).to_pandas()
    )
    rb = {int(d): i + 1 for i, d in enumerate(bm["doc_id"])}
    rq = {int(d): i + 1 for i, d in enumerate(qual["doc_id"])}
    rows = []
    for d in sorted(set(rb) | set(rq)):
        # fixed addition order (bm25 term, then quality term) — the oracle
        # mirrors it literally
        score = (1.0 / (k_rrf + rb[d]) if d in rb else 0.0) + (
            1.0 / (k_rrf + rq[d]) if d in rq else 0.0
        )
        rows.append((d, score, rb.get(d, -1), rq.get(d, -1)))
    rows.sort(key=lambda r: (-r[1], r[0]))
    out = pd.DataFrame(
        rows[:top_n],
        columns=["doc_id", "rrf", "rank_bm25", "rank_quality"],
    )
    for c in ("doc_id", "rank_bm25", "rank_quality"):
        out[c] = out[c].astype("int64")
    return out


_QUALITY_SQL = (
    "WITH x AS ("
    " SELECT doc_id,"
    "  greatest(length(text), 1) AS n_chars,"
    "  greatest(len(regexp_extract_all(text, '[A-Za-z0-9]+')), 1)"
    "    AS n_toks,"
    "  len(list_filter(regexp_extract_all(text, '[A-Za-z0-9]+'),"
    "      t -> lower(t) IN ('the','and','of','to','a','in','is',"
    "      'it','for','with'))) AS stop,"
    "  len(regexp_extract_all(text, '[.,;:!?]')) AS n_punct"
    " FROM documents)"
    " SELECT doc_id,"
    " floor((0.4 * least(n_toks / 64.0, 1.0)"
    "     + 0.3 * (1 - least(n_punct / n_chars::DOUBLE, 1.0))"
    "     + 0.3 * least(stop / n_toks::DOUBLE, 1.0)) * 1e6 + 0.5)"
    "   / 1e6 AS quality"
    " FROM x"
)


def rrf_oracle_sql(terms: tuple[str, ...] = BM25_TERMS, k_rrf: int = 60,
                   list_n: int = 100, top_n: int = 20) -> str:
    """DuckDB mirror of ``rrf_fusion``: the bm25 and quality oracle bodies
    as subqueries, row_number ranks with the doc_id tiebreak, and the two
    reciprocal terms added in the same literal order (quality SQL kept
    bit-identical to the quality_score oracle; a drift would fail THIS
    gate too)."""
    return (
        "WITH rb AS (SELECT doc_id, r FROM ("
        "  SELECT doc_id, row_number() OVER (ORDER BY bm25 DESC, doc_id)"
        "   AS r FROM (" + bm25_oracle_sql(terms) + ")) WHERE r <= "
        + str(list_n) + "),"
        " rq AS (SELECT doc_id, r FROM ("
        "  SELECT doc_id, row_number() OVER (ORDER BY quality DESC, doc_id)"
        "   AS r FROM (" + _QUALITY_SQL + ")) WHERE r <= " + str(list_n)
        + "),"
        " f AS (SELECT coalesce(rb.doc_id, rq.doc_id) AS doc_id,"
        "  coalesce(1.0 / (" + str(k_rrf) + " + rb.r), 0.0)"
        "   + coalesce(1.0 / (" + str(k_rrf) + " + rq.r), 0.0) AS rrf,"
        "  coalesce(rb.r, -1)::BIGINT AS rank_bm25,"
        "  coalesce(rq.r, -1)::BIGINT AS rank_quality"
        " FROM rb FULL OUTER JOIN rq ON rb.doc_id = rq.doc_id)"
        " SELECT doc_id::BIGINT AS doc_id, rrf, rank_bm25, rank_quality"
        " FROM f ORDER BY rrf DESC, doc_id LIMIT " + str(top_n)
    )
