"""End-to-end training-data prep chain over the ``documents`` table.

``corpus_clean`` is the pipeline a user would actually run before
tokenization: quality gate -> normalized exact-dedup survivor pick,
SQL-oracled end to end. Scale shape: the per-batch map computes quality and
the dedup key and FILTERS before the shuffle, so only passing rows — four
small columns, no text — cross the single bucketed exchange
(crc32(h) % cluster_partitions() groups, pandas transform('min') inside the
task; the dedup_survivor_map pattern, never one Ray group per hash).
"""

from __future__ import annotations

import hashlib
import zlib

import numpy as np
import pandas as pd
import pyarrow as pa

from .text import documents, quality_cols

_CLEAN_SCHEMA = pa.schema(
    [
        ("doc_id", pa.int64()),
        ("lang", pa.string()),
        ("n_tokens", pa.int64()),
        ("quality", pa.float64()),
    ]
)


def corpus_clean(
    sf_dir: str, min_quality: float = 0.5, num_partitions: int | None = None
):
    """Surviving documents after the prep chain: quality >= min_quality,
    then one survivor (min doc_id) per whitespace/case-normalized text hash
    AMONG THE PASSING DOCS (filter-then-dedup, the order the SQL oracle
    pins). Returns (doc_id, lang, n_tokens, quality) per survivor."""
    from .common import cluster_partitions
    from .dedup import _WS_RE

    if num_partitions is None:
        num_partitions = cluster_partitions()

    def score_hash_filter(df: pd.DataFrame) -> pa.Table:
        n_tokens, quality = quality_cols(df["text"])
        keep = quality >= min_quality
        df = df[keep]
        n_tokens = n_tokens[keep]
        quality = quality[keep]
        hs = [
            hashlib.md5(
                _WS_RE.sub(" ", t.lower()).strip().encode("utf-8")
            ).hexdigest()
            for t in df["text"]
        ]
        parts = np.fromiter(
            (zlib.crc32(h.encode()) % num_partitions for h in hs),
            dtype=np.int32,
            count=len(hs),
        )
        # explicit schema: an all-filtered batch must not degrade lang/h to
        # Arrow null type (the token_frequencies empty-batch hazard)
        return pa.table(
            {
                "doc_id": pa.array(df["doc_id"].to_numpy(np.int64), pa.int64()),
                "lang": pa.array(df["lang"].tolist(), pa.string()),
                "n_tokens": pa.array(n_tokens.to_numpy(np.int64), pa.int64()),
                "quality": pa.array(
                    np.asarray(quality, dtype=np.float64), pa.float64()
                ),
                "h": pa.array(hs, pa.string()),
                "part": pa.array(parts, pa.int32()),
            }
        )

    def pick_survivors(df: pd.DataFrame) -> pa.Table:
        keep = df["doc_id"] == df.groupby("h")["doc_id"].transform("min")
        out = df[keep]
        return pa.table(
            {
                "doc_id": pa.array(out["doc_id"].to_numpy(np.int64), pa.int64()),
                "lang": pa.array(out["lang"].tolist(), pa.string()),
                "n_tokens": pa.array(
                    out["n_tokens"].to_numpy(np.int64), pa.int64()
                ),
                "quality": pa.array(
                    out["quality"].to_numpy(np.float64), pa.float64()
                ),
            },
            schema=_CLEAN_SCHEMA,
        )

    scored = documents(sf_dir, columns=("doc_id", "text", "lang")).map_batches(
        score_hash_filter, batch_format="pandas"
    )
    return scored.groupby("part").map_groups(
        pick_survivors, batch_format="pandas"
    )
