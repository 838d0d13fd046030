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
                _WS_RE.sub(" ", t.lower()).strip(" ").encode("utf-8")
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


def _corpus_manifest_path(out_dir: str, bucket: int) -> str:
    import os

    return os.path.join(out_dir, f"_manifest_bucket_{bucket}.json")


def write_curated_corpus(sf_dir: str, out_dir: str, num_buckets: int = 16,
                         min_quality: float = 0.5,
                         resume: bool = True) -> dict:
    """Resumable curated-corpus sink (the documents-side counterpart of the
    kg pipeline's bucketed sink): corpus_clean survivors written as Parquet
    partitioned by ``bucket = crc32(doc_id) % num_buckets`` with a per-bucket
    manifest (row count + order-free doc_id checksum). A re-run skips
    finished buckets — pruned AT THE MAP, so skipped buckets' rows never
    reach the shuffle — and rewrites manifest-less (crashed) buckets.
    Returns {"rows", "buckets_skipped"}.

    Each bucket is one recoverable unit of a 100-TB write: a failed run
    costs only its unfinished buckets, never the finished ones."""
    import json
    import os
    import shutil

    os.makedirs(out_dir, exist_ok=True)
    done = {
        b for b in range(num_buckets)
        if resume and os.path.exists(_corpus_manifest_path(out_dir, b))
    }
    for b in range(num_buckets):
        bdir = os.path.join(out_dir, f"bucket={b}")
        if b not in done and os.path.isdir(bdir):
            shutil.rmtree(bdir)  # partial output from a crashed run

    ds = corpus_clean(sf_dir, min_quality=min_quality)

    def add_bucket(batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch["doc_id"].to_pylist(), dtype=np.int64)
        buckets = np.fromiter(
            (zlib.crc32(str(i).encode()) % num_buckets for i in ids),
            dtype=np.int32, count=len(ids),
        )
        batch = batch.append_column("bucket", pa.array(buckets, pa.int32()))
        if done:
            mask = np.isin(
                buckets, np.fromiter(done, dtype=np.int32), invert=True
            )
            batch = batch.filter(pa.array(mask))
        return batch

    out = ds.map_batches(add_bucket, batch_format="pyarrow")
    out.write_parquet(out_dir, partition_cols=["bucket"])

    import pyarrow.parquet as pq

    total = 0
    skipped = 0
    for b in range(num_buckets):
        mp = _corpus_manifest_path(out_dir, b)
        if b in done:
            with open(mp) as f:
                total += json.load(f)["rows"]
            skipped += 1
            continue
        bdir = os.path.join(out_dir, f"bucket={b}")
        rows = 0
        checksum = 0
        if os.path.isdir(bdir):
            for fn in sorted(os.listdir(bdir)):
                if not fn.endswith(".parquet"):
                    continue
                t = pq.read_table(
                    os.path.join(bdir, fn), columns=["doc_id"]
                )
                ids = np.asarray(t["doc_id"].to_pylist(), dtype=np.uint64)
                rows += len(ids)
                # order-free checksum: xor of multiply-mixed ids
                with np.errstate(over="ignore"):
                    mixed = ids * np.uint64(0x9E3779B97F4A7C15)
                checksum ^= int(np.bitwise_xor.reduce(mixed)) if len(ids) else 0
        with open(mp, "w") as f:
            json.dump({"bucket": b, "rows": rows,
                       "doc_id_checksum": format(checksum, "016x")}, f)
        total += rows
    return {"rows": total, "buckets_skipped": skipped}
