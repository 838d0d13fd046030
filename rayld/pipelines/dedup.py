"""Deduplication pipelines over the ``documents`` table.

- exact: content-hash groupby + per-group first (SQL-checkable)
- MinHash + LSH banding: shingle -> minhash -> band groupby -> verify Jaccard
- SimHash: 64-bit token-hash sign aggregation
- n-gram Jaccard verification (used by the LSH candidates)
- embedding-cosine near-dup over the ``embeddings`` table

Shuffle strategy: the only all-to-all exchanges are the small groupbys over
(hash) / (band_id, band_hash) keys — both tiny compared to the input, because
per-batch map stages reduce documents to fixed-size signatures first
(pre-aggregate before shuffle, SURVEY.md §4)."""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pandas as pd
import pyarrow as pa

from .text import documents

_TOKEN_RE = re.compile(r"[A-Za-z0-9]+")

_MERSENNE = (1 << 61) - 1
_N_HASHES = 64
_BAND_SIZE = 4  # 16 bands of 4 -> catches jaccard >= ~0.5 reliably


def _hash_params(seed: int = 42):
    rng = np.random.default_rng(seed)
    a = rng.integers(1, _MERSENNE, size=_N_HASHES, dtype=np.int64).astype(np.uint64)
    b = rng.integers(0, _MERSENNE, size=_N_HASHES, dtype=np.int64).astype(np.uint64)
    return a, b


_A, _B = _hash_params()


def _shingles(text: str, k: int = 3) -> np.ndarray:
    """Distinct k-token shingle hashes (61-bit). One crc32 per token plus a
    vectorized O(n) polynomial window roll — no per-shingle digesting (10M+
    md5 calls per 50k-doc corpus otherwise dominate the MinHash stage)."""
    import zlib

    from .text import _rk_window_hashes

    toks = _TOKEN_RE.findall(text.lower())
    if not toks:
        return np.zeros(0, dtype=np.uint64)
    h = np.fromiter(
        (zlib.crc32(t.encode()) for t in toks), dtype=np.uint64,
        count=len(toks),
    )
    if len(toks) < k:
        win = _rk_window_hashes(h, len(toks))
    else:
        win = _rk_window_hashes(h, k)
    return np.unique(win & np.uint64((1 << 61) - 1))


def minhash_signature(text: str) -> np.ndarray:
    sh = _shingles(text)
    if len(sh) == 0:
        return np.zeros(_N_HASHES, dtype=np.uint64)
    # (a*x + b) mod p, vectorized over shingles x hashes
    vals = (sh[:, None] * _A[None, :] + _B[None, :]) % _MERSENNE
    return vals.min(axis=0)


def jaccard(text_a: str, text_b: str) -> float:
    sa, sb = set(_shingles(text_a).tolist()), set(_shingles(text_b).tolist())
    if not sa and not sb:
        return 1.0
    return len(sa & sb) / max(1, len(sa | sb))


# ---------------------------------------------------------------------------
# Exact dedup
# ---------------------------------------------------------------------------

def _keep_min_per_hash(hashed):
    """ONE bucketed crc32(h) % P exchange + in-task groupby-min: the
    house replacement for ``groupby('h').aggregate(Min)`` on the bench
    path — Ray's aggregate pays a fixed hash-shuffle aggregator setup per
    call that flattens the small-cpu end of the scaling ladder
    (verdict-r3 item 3). Data movement is identical (one row per doc,
    partitioned by content hash). Callers pre-compute the ``part``
    bucket column; this function only exchanges on it — it never
    repartitions."""
    sch = pa.schema([("doc_id", pa.int64())])

    def first(df: pd.DataFrame) -> pa.Table:
        if len(df) == 0:
            return sch.empty_table()
        g = df.groupby("h")["doc_id"].min()
        return pa.table(
            {"doc_id": pa.array(g.to_numpy(np.int64))}, schema=sch
        )

    return hashed.groupby("part").map_groups(first, batch_format="pandas")


def _hash_parts(hs: list, num_partitions: int) -> np.ndarray:
    import zlib

    return np.fromiter(
        (zlib.crc32(h.encode()) % num_partitions for h in hs),
        dtype=np.int32, count=len(hs),
    )


def dedup_exact(sf_dir: str, num_partitions: int | None = None):
    """Hash-partition + per-group first: one surviving doc_id per distinct
    text. Shuffle key = md5(text) — md5 stays (one digest per DOCUMENT, i.e.
    proportional to I/O, unlike the per-shingle loops that were vectorized
    away) because the SQL oracle pins the exact same md5(text) key."""
    import os

    from .common import sized_partitions

    if num_partitions is None:
        # data-bounded exchange width: one partition per 64KB of source,
        # capped at 2x cores (survivors are partition-count independent)
        num_partitions = sized_partitions(
            os.path.getsize(f"{sf_dir}/documents.parquet")
        )

    def add_hash(batch: pa.Table) -> pa.Table:
        hs = [
            hashlib.md5(t.encode("utf-8")).hexdigest()
            for t in batch["text"].to_pylist()
        ]
        return pa.table({
            "doc_id": batch["doc_id"], "h": pa.array(hs, pa.string()),
            "part": pa.array(_hash_parts(hs, num_partitions), pa.int32()),
        })

    hashed = documents(sf_dir).map_batches(add_hash, batch_format="pyarrow")
    return _keep_min_per_hash(hashed)


# ASCII-only whitespace class + space-only strip: Python's \s and
# str.strip() are Unicode-aware, but the pinned DuckDB oracle uses
# RE2's ASCII \s+ and space-only trim() — a \xa0 in a document would
# otherwise hash differently on the two sides (the pii_redact
# RE2-parity contract applies here too)
_WS_RE = re.compile(r"[ \t\n\r\f\v]+")


def dedup_exact_normalized(sf_dir: str):
    """Whitespace/case-normalized exact dedup: one surviving doc_id per
    distinct lower(text) with whitespace runs collapsed to single spaces and
    trimmed — the form training pipelines actually dedup on (raw exact dedup
    misses trivial reflows). Same shuffle shape as dedup_exact; the
    normalization is pinned by the SQL oracle
    (md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))))."""
    from .common import cluster_partitions

    num_partitions = cluster_partitions()

    def add_hash(batch: pa.Table) -> pa.Table:
        hs = [
            hashlib.md5(
                _WS_RE.sub(" ", t.lower()).strip(" ").encode("utf-8")
            ).hexdigest()
            for t in batch["text"].to_pylist()
        ]
        return pa.table({
            "doc_id": batch["doc_id"], "h": pa.array(hs, pa.string()),
            "part": pa.array(_hash_parts(hs, num_partitions), pa.int32()),
        })

    hashed = documents(sf_dir).map_batches(add_hash, batch_format="pyarrow")
    return _keep_min_per_hash(hashed)


def dedup_survivor_map(sf_dir: str, num_partitions: int | None = None):
    """Exact-dedup REMAPPING: every doc_id -> the canonical survivor (min
    doc_id sharing its text hash). The content-hash shuffle is bucketed
    (hash(h) % P groups, pandas transform('min') inside the task) so the
    remap emits one row per document without per-group Ray overhead —
    the apply-side of dedup_exact that a training pipeline uses to rewrite
    references to deduped documents."""
    import zlib

    from .common import cluster_partitions

    if num_partitions is None:
        num_partitions = cluster_partitions()

    def add_hash(batch: pa.Table) -> pa.Table:
        hs = [
            hashlib.md5(t.encode("utf-8")).hexdigest()
            for t in batch["text"].to_pylist()
        ]
        parts = np.fromiter(
            (zlib.crc32(h.encode()) % num_partitions for h in hs),
            dtype=np.int32, count=len(hs),
        )
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "h": pa.array(hs, pa.string()),
                "part": pa.array(parts, pa.int32()),
            }
        )

    def assign(df: pd.DataFrame) -> pd.DataFrame:
        surv = df.groupby("h")["doc_id"].transform("min")
        return pd.DataFrame(
            {"doc_id": df["doc_id"].astype("int64"),
             "survivor_id": surv.astype("int64")}
        )

    hashed = documents(sf_dir).map_batches(add_hash, batch_format="pyarrow")
    return hashed.groupby("part").map_groups(assign, batch_format="pandas")


# ---------------------------------------------------------------------------
# MinHash + LSH near-dup
# ---------------------------------------------------------------------------

class MinHasher:
    """Signature stage. The hash params are module globals (built once per
    worker process at import), so this runs as a PLAIN TASK map, not an actor
    pool: tasks reuse Ray's warm worker pool while an actor pool pays a fresh
    actor spawn per execution (measured ~2s/exec at 16 cpus — pure fixed
    overhead for a stage whose only 'state' is two module arrays). Keep actor
    pools for stages with real per-actor setup (the linker's token index)."""

    def __init__(self):
        self.a, self.b = _A, _B

    def __call__(self, batch: pa.Table) -> pa.Table:
        doc_ids = batch["doc_id"].to_pylist()
        sigs = [minhash_signature(t) for t in batch["text"].to_pylist()]
        return pa.table(
            {
                "doc_id": pa.array(doc_ids, pa.int64()),
                "sig": pa.array(
                    [s.astype(np.int64).tolist() for s in sigs],
                    pa.list_(pa.int64()),
                ),
            }
        )


def _minhash_batch(batch: pa.Table) -> pa.Table:
    return MinHasher()(batch)


_BAND_MIX = np.array(
    [0x9E3779B97F4A7C15, 0xC2B2AE3D27D4EB4F, 0x165667B19E3779F9,
     0x27D4EB2F165667C5],
    dtype=np.uint64,
)


def _explode_bands(batch: pa.Table) -> pa.Table:
    """(doc_id, band_id, band_hash) rows, fully vectorized: the band hash is
    a 64-bit multiply-mix of the band's signature chunk (a rare mix collision
    only adds a candidate pair, which Jaccard verification rejects)."""
    n_bands = _N_HASHES // _BAND_SIZE
    doc_ids = np.asarray(batch["doc_id"].to_pylist(), dtype=np.int64)
    sigs = np.asarray(batch["sig"].to_pylist(), dtype=np.uint64)
    if sigs.size == 0:
        return pa.table(
            {"doc_id": pa.array([], pa.int64()),
             "band_id": pa.array([], pa.int32()),
             "band_hash": pa.array([], pa.int64())}
        )
    chunks = sigs.reshape(len(doc_ids), n_bands, _BAND_SIZE)
    with np.errstate(over="ignore"):
        mixed = (chunks * _BAND_MIX[None, None, :]).sum(
            axis=2, dtype=np.uint64
        )
        mixed ^= mixed >> np.uint64(33)
    return pa.table(
        {
            "doc_id": pa.array(np.repeat(doc_ids, n_bands), pa.int64()),
            "band_id": pa.array(
                np.tile(np.arange(n_bands, dtype=np.int32), len(doc_ids)),
                pa.int32(),
            ),
            "band_hash": pa.array(mixed.reshape(-1).view(np.int64), pa.int64()),
        }
    )


def minhash_candidates(sf_dir: str, concurrency: int | None = None,
                       distinct: bool = True):
    """Candidate near-dup pairs via LSH banding. Output: (doc_a, doc_b).

    The signature stage is a plain TASK map (see MinHasher's docstring): its
    state is module-level, so tasks on warm workers match an actor pool's
    amortization without the per-execution actor-spawn cost that dominated
    this stage's wall time. ``concurrency`` is kept for API compatibility
    (task maps scale with the cluster on their own)."""
    del concurrency  # task map: parallelism follows block structure

    from .common import cluster_partitions

    # fine-grained blocks (16KB of source each): the shingle+signature map is
    # CPU-bound per byte, so it wants the full 2x-cores fan-out even on a
    # sub-MB benchmark file (unlike the light per-document stages)
    ds = documents(sf_dir, per_block_bytes=16 << 10).map_batches(
        _minhash_batch, batch_format="pyarrow"
    )
    bands = ds.map_batches(_explode_bands, batch_format="pyarrow")

    # bucket the band key: one Ray group per hash bucket (not per band value
    # — hundreds of thousands of tiny groups otherwise pay huge per-group
    # overhead, the CLAUDE.md rule); pairs emerge from an in-task pandas
    # groupby over the real key
    num_buckets = cluster_partitions()

    def add_bucket(batch: pa.Table) -> pa.Table:
        h = np.asarray(batch["band_hash"].to_pylist(), dtype=np.int64)
        b = np.asarray(batch["band_id"].to_pylist(), dtype=np.int64)
        parts = (((h * 31 + b) % num_buckets) + num_buckets) % num_buckets
        return batch.append_column(
            "part", pa.array(parts.astype(np.int32), pa.int32())
        )

    def bucket_pairs(part_df: pd.DataFrame) -> pd.DataFrame:
        rows_a, rows_b = [], []
        for _, df in part_df.groupby(["band_id", "band_hash"], sort=False):
            if len(df) < 2:
                continue
            ids = sorted(df["doc_id"].unique().tolist())
            # bucket sizes are tiny (docs sharing a band hash); cap
            # pathological buckets and log (no silent cap)
            if len(ids) > 200:
                print(f"[minhash] capping bucket of {len(ids)} docs at 200")
                ids = ids[:200]
            for i in range(len(ids)):
                for j in range(i + 1, len(ids)):
                    rows_a.append(ids[i])
                    rows_b.append(ids[j])
        # ARROW out with explicit types: empty pandas frames carry
        # object/null columns that poison schema unification, and Ray
        # aggregates over pandas blocks are ~16x slower than over Arrow.
        # In-task drop_duplicates: a pair colliding in several bands of the
        # SAME part emits once (cross-part duplicates remain unless
        # ``distinct``).
        t = pd.DataFrame({"doc_a": rows_a, "doc_b": rows_b}).drop_duplicates()
        return pa.table(
            {"doc_a": pa.array(t["doc_a"].to_numpy(np.int64), pa.int64()),
             "doc_b": pa.array(t["doc_b"].to_numpy(np.int64), pa.int64())}
        )

    pairs = bands.map_batches(add_bucket, batch_format="pyarrow").groupby(
        "part"
    ).map_groups(bucket_pairs, batch_format="pandas")

    if not distinct:
        # callers whose next stage already groups on the pair key (the
        # Jaccard verification pivot) skip this whole all-to-all: duplicate
        # pairs are bounded by n_bands (16x of the tiny candidate set) and
        # collapse for free in that downstream groupby
        return pairs

    # distinct pairs via a vectorized aggregate on the pair key (a pair that
    # collides in several bands shuffles once here, never per-band)
    from ray.data.aggregate import Count

    return pairs.groupby(["doc_a", "doc_b"]).aggregate(
        Count(alias_name="_n")
    ).drop_columns(["_n"])


def _bucketed_hash_join(left_ds, right_ds, key: str, num_partitions: int,
                        merge_fn):
    """Distributed hash join built from primitives that are stable in this
    engine: tag + union the two sides, bucket on ``hash(key) % P``, and run a
    pandas merge inside each bucket task (``merge_fn(group) -> DataFrame``).

    Both sides already carry the key in the SAME column name and an
    ``is_right`` marker column. This is the same data movement as a shuffle
    hash join (each side partitioned once by key) without Ray's JoinOperator,
    whose fixed aggregator actors deadlock nondeterministically in small CPU
    sessions and choke on the schema-less empty blocks that groupby stages
    emit."""

    def bucket(batch: pa.Table) -> pa.Table:
        k = np.asarray(batch[key].to_pylist(), dtype=np.int64)
        parts = (k % num_partitions).astype(np.int32)
        return batch.append_column("part", pa.array(parts, pa.int32()))

    u = left_ds.union(right_ds).map_batches(bucket, batch_format="pyarrow")
    return u.groupby("part").map_groups(merge_fn, batch_format="pandas")


def minhash_dedup(sf_dir: str, threshold: float = 0.5, concurrency: int | None = None,
                  num_partitions: int | None = None,
                  broadcast_pairs_max: int = 200_000):
    """LSH candidates verified by true n-gram Jaccard >= threshold.

    Verification strategy is COST-BASED on the measured candidate count
    (the candidate set is already materialized as a pipeline breaker, so the
    count is free):

    - candidates <= ``broadcast_pairs_max``: BROADCAST path — the pair list
      ships once via ``ray.put`` (a few MB), one vectorized map over the
      corpus emits the half-rows for member docs, and ONE bucketed pair-key
      shuffle pivots (text_a, text_b) together for the in-task Jaccard. The
      small-side-broadcast join selection every shuffle-averse engine makes.
    - otherwise: fully distributed TWO-shuffle path — half-rows union with
      the documents table, a bucketed hash(doc) % P groupby attaches texts
      via in-task pandas merge (the corpus partitions ONCE, not once per
      pair side), then the same pair-key pivot shuffle. No driver-side
      corpus scan at any size.

    Both paths are value-identical (parity-tested)."""
    import ray

    from .common import cluster_partitions

    if num_partitions is None:
        num_partitions = cluster_partitions()
    cands = minhash_candidates(
        sf_dir, concurrency=concurrency, distinct=False
    ).materialize()
    # fine-grained blocks: the verify map shingles member docs (CPU-bound
    # per byte), same reasoning as the signature stage above
    docs = documents(sf_dir, per_block_bytes=16 << 10)

    def bucket_pair(batch: pa.Table) -> pa.Table:
        a = np.asarray(batch["doc_a"].to_pylist(), dtype=np.int64)
        b = np.asarray(batch["doc_b"].to_pylist(), dtype=np.int64)
        parts = ((a * 1000003 + b) % num_partitions).astype(np.int32)
        return batch.append_column("part2", pa.array(parts, pa.int32()))

    def pivot_verify(df: pd.DataFrame) -> pd.DataFrame:
        out_a, out_b = [], []
        for (a, b), g in df.groupby(["doc_a", "doc_b"], sort=True):
            ta = g[g["slot"] == 0]["t"]
            tb = g[g["slot"] == 1]["t"]
            if len(ta) and len(tb) and jaccard(ta.iloc[0], tb.iloc[0]) >= threshold:
                out_a.append(a)
                out_b.append(b)
        return pd.DataFrame(
            {"doc_a": pd.Series(out_a, dtype="int64"),
             "doc_b": pd.Series(out_b, dtype="int64")}
        )

    if cands.count() <= broadcast_pairs_max:
        # broadcast path: ship the (deduped) pair list once; member docs
        # emit their half-rows straight from the corpus map — the doc-key
        # attach shuffle disappears entirely
        pdf = cands.to_pandas()
        if len(pdf) == 0:
            return cands.map_batches(
                lambda b: b.select(["doc_a", "doc_b"]),
                batch_format="pyarrow",
            )
        pdf = pdf.drop_duplicates()
        slots: dict[int, list[tuple[int, int, int]]] = {}
        for a, b in zip(pdf["doc_a"].to_numpy(), pdf["doc_b"].to_numpy()):
            slots.setdefault(int(a), []).append((int(a), int(b), 0))
            slots.setdefault(int(b), []).append((int(a), int(b), 1))
        ref = ray.put(slots)

        def emit_halves(df: pd.DataFrame) -> pa.Table:
            lk = ray.get(ref)
            out_a, out_b, out_s, out_t = [], [], [], []
            for did, t in zip(df["doc_id"], df["text"]):
                for a, b, s in lk.get(int(did), ()):
                    out_a.append(a)
                    out_b.append(b)
                    out_s.append(s)
                    out_t.append(t)
            return pa.table(
                {
                    "doc_a": pa.array(out_a, pa.int64()),
                    "doc_b": pa.array(out_b, pa.int64()),
                    "slot": pa.array(out_s, pa.int8()),
                    "t": pa.array(out_t, pa.string()),
                }
            )

        halves_ds = docs.map_batches(emit_halves, batch_format="pandas")
        return halves_ds.map_batches(
            bucket_pair, batch_format="pyarrow"
        ).groupby("part2").map_groups(pivot_verify, batch_format="pandas")

    def halves(batch: pa.Table) -> pa.Table:
        a = np.asarray(batch["doc_a"].to_pylist(), dtype=np.int64)
        b = np.asarray(batch["doc_b"].to_pylist(), dtype=np.int64)
        n2 = 2 * len(a)
        return pa.table(
            {
                "doc": pa.array(np.concatenate([a, b]), pa.int64()),
                "mate": pa.array(np.concatenate([b, a]), pa.int64()),
                "slot": pa.array(
                    np.concatenate(
                        [np.zeros(len(a), np.int8), np.ones(len(b), np.int8)]
                    ),
                    pa.int8(),
                ),
                "t": pa.nulls(n2, pa.string()),
                "is_doc": pa.array(np.zeros(n2, np.int8)),
            }
        )

    def tag_docs(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        return pa.table(
            {
                "doc": batch["doc_id"].cast(pa.int64()),
                "mate": pa.nulls(n, pa.int64()),
                "slot": pa.nulls(n, pa.int8()),
                "t": batch["text"],
                "is_doc": pa.array(np.ones(n, np.int8)),
            }
        )

    def attach(df: pd.DataFrame) -> pd.DataFrame:
        d = df[df["is_doc"] == 1][["doc", "t"]]
        h = df[df["is_doc"] == 0][["doc", "mate", "slot"]]
        out = h.merge(d, on="doc", how="inner")
        slot0 = out["slot"] == 0
        a = np.where(slot0, out["doc"], out["mate"])
        b = np.where(slot0, out["mate"], out["doc"])
        return pd.DataFrame(
            {
                "doc_a": pd.Series(a, dtype="int64"),
                "doc_b": pd.Series(b, dtype="int64"),
                "slot": out["slot"].astype("int8").to_numpy(),
                "t": out["t"].astype("object").to_numpy(),
            }
        )

    u = cands.map_batches(halves, batch_format="pyarrow").union(
        docs.map_batches(tag_docs, batch_format="pyarrow")
    )

    def bucket_doc(batch: pa.Table) -> pa.Table:
        k = np.asarray(batch["doc"].to_pylist(), dtype=np.int64)
        parts = (k % num_partitions).astype(np.int32)
        return batch.append_column("part", pa.array(parts, pa.int32()))

    attached = u.map_batches(bucket_doc, batch_format="pyarrow").groupby(
        "part"
    ).map_groups(attach, batch_format="pandas")

    return attached.map_batches(bucket_pair, batch_format="pyarrow").groupby(
        "part2"
    ).map_groups(pivot_verify, batch_format="pandas")


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

_SIMHASH_MIX1 = np.uint64(0xFF51AFD7ED558CCD)
_SIMHASH_MIX2 = np.uint64(0xC4CEB9FE1A85EC53)


def simhash_signature(text: str) -> int:
    """64-bit SimHash: one crc32 per distinct token widened by a
    splitmix-style multiply-mix (no per-token md5 — the digest loop was
    2-5x the stage cost), then a vectorized n_tokens x 64 sign
    aggregation. The signature values are pinned by a fixture test."""
    import zlib

    toks = {t.lower() for t in _TOKEN_RE.findall(text)}
    if not toks:
        return 0
    h = np.fromiter(
        (zlib.crc32(t.encode()) for t in toks), dtype=np.uint64,
        count=len(toks),
    )
    with np.errstate(over="ignore"):
        h ^= h >> np.uint64(33)
        h *= _SIMHASH_MIX1
        h ^= h >> np.uint64(33)
        h *= _SIMHASH_MIX2
        h ^= h >> np.uint64(33)
    bits = (
        (h[:, None] >> np.arange(64, dtype=np.uint64)[None, :])
        & np.uint64(1)
    ).astype(np.int64)
    acc = (bits * 2 - 1).sum(axis=0)
    sig_bits = np.where(acc > 0, np.uint64(1), np.uint64(0))
    return int((sig_bits << np.arange(64, dtype=np.uint64)).sum(dtype=np.uint64))


def simhash(sf_dir: str):
    def fn(batch: pa.Table) -> pa.Table:
        sigs = [
            format(simhash_signature(t), "016x") for t in batch["text"].to_pylist()
        ]
        return pa.table(
            {"doc_id": batch["doc_id"], "simhash": pa.array(sigs, pa.string())}
        )

    return documents(sf_dir).map_batches(fn, batch_format="pyarrow")


def simhash_check(sf_dir: str) -> pd.DataFrame:
    """Gate: distributed SimHash signatures == a single-process recount
    over the same parquet, exactly one signature per doc, and the
    token-set invariance SimHash promises (identical token SETS — here a
    doubled+shuffled text — produce identical signatures). Driver-visible
    guard for the rows-only signature query (verdict-r3 item 8)."""
    got = simhash(sf_dir).to_pandas()
    docs = pd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    want = {
        int(i): format(simhash_signature(t), "016x")
        for i, t in zip(docs["doc_id"], docs["text"])
    }
    got_map = dict(zip(got["doc_id"].astype(int), got["simhash"]))
    tokset_ok = 1
    for t in docs["text"].head(50):
        if simhash_signature(t) != simhash_signature(t + " " + t):
            tokset_ok = 0
    return pd.DataFrame({
        "parity_ok": [int(got_map == want)],
        "one_sig_per_doc": [int(
            len(got) == len(docs) and got["doc_id"].nunique() == len(docs)
        )],
        "token_set_invariance_ok": [tokset_ok],
    })


_SIMHASH_BANDS = 4  # 4 x 16-bit bands: Hamming <= 3 pairs share >= 1 band


def _popcount64(x: np.ndarray) -> np.ndarray:
    """Vectorized popcount of a uint64 array (bit_count needs numpy>=2)."""
    return np.unpackbits(
        np.ascontiguousarray(x).view(np.uint8).reshape(len(x), 8), axis=1
    ).sum(axis=1, dtype=np.int64)


def simhash_neardup(
    sf_dir: str,
    max_hamming: int = 3,
    num_partitions: int | None = None,
    max_bucket: int = 4096,
):
    """SimHash near-dup pairs: (doc_a, doc_b, hamming) for every document
    pair whose 64-bit SimHash signatures differ in <= max_hamming bits.

    Scale shape (the MinHash band pattern, one level simpler): signatures
    are fixed-size per-doc; each doc emits 4 x 16-bit band rows; the band
    shuffle is BUCKETED (multiply-mix of (band, value) % P groups, in-task
    pandas groupby over the real band key — never one Ray group per band
    value); candidate pairs are Hamming-verified in-task with a vectorized
    XOR-popcount (exact, by pigeonhole over the 4 bands: any pair within
    max_hamming <= 3 collides in at least one band, so no recall loss);
    the final bucketed pair-key shuffle dedups pairs that collided in more
    than one band. Degenerate bands (e.g. the all-zero signature of empty
    docs) are capped at max_bucket docs and logged, like embedding_neardup.
    """
    from .common import cluster_partitions

    if num_partitions is None:
        num_partitions = cluster_partitions()
    bands = _SIMHASH_BANDS

    def sign_and_band(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy().astype(np.int64)
        sigs = np.array(
            [simhash_signature(t) for t in batch["text"].to_pylist()],
            dtype=np.uint64,
        )
        n = len(ids)
        band = np.repeat(np.arange(bands, dtype=np.uint64), n)
        doc = np.tile(ids, bands)
        sig = np.tile(sigs, bands)
        val = (sig >> (band * np.uint64(16))) & np.uint64(0xFFFF)
        with np.errstate(over="ignore"):
            key = (band << np.uint64(16) | val) * _SIMHASH_MIX1
        part = ((key >> np.uint64(33)) % np.uint64(num_partitions)).astype(
            np.int32
        )
        return pa.table(
            {
                "doc_id": pa.array(doc, pa.int64()),
                "sig": pa.array(sig.astype(np.int64), pa.int64()),
                "band": pa.array(band.astype(np.int32), pa.int32()),
                "val": pa.array(val.astype(np.int32), pa.int32()),
                "part": pa.array(part, pa.int32()),
            }
        )

    def bucket_pairs(df: pd.DataFrame) -> pa.Table:
        out_a: list[np.ndarray] = []
        out_b: list[np.ndarray] = []
        out_h: list[np.ndarray] = []
        for _, g in df.groupby(["band", "val"], sort=False):
            if len(g) < 2:
                continue
            if len(g) > max_bucket:
                print(
                    f"simhash_neardup: band bucket capped "
                    f"{len(g)} -> {max_bucket} docs"
                )
                g = g.nsmallest(max_bucket, "doc_id")
            g = g.sort_values("doc_id", kind="mergesort")
            ids = g["doc_id"].to_numpy(np.int64)
            sigs = g["sig"].to_numpy(np.int64).view(np.uint64)
            ia, ib = np.triu_indices(len(ids), 1)
            ham = _popcount64(sigs[ia] ^ sigs[ib])
            ok = ham <= max_hamming
            out_a.append(ids[ia][ok])
            out_b.append(ids[ib][ok])
            out_h.append(ham[ok])
        a = np.concatenate(out_a) if out_a else np.empty(0, np.int64)
        b = np.concatenate(out_b) if out_b else np.empty(0, np.int64)
        h = np.concatenate(out_h) if out_h else np.empty(0, np.int64)
        with np.errstate(over="ignore"):
            part2 = (
                (a.view(np.uint64) * _SIMHASH_MIX1 + b.view(np.uint64))
                >> np.uint64(33)
            ) % np.uint64(num_partitions)
        return pa.table(
            {
                "doc_a": pa.array(a, pa.int64()),
                "doc_b": pa.array(b, pa.int64()),
                "hamming": pa.array(h, pa.int64()),
                "part2": pa.array(part2.astype(np.int32), pa.int32()),
            }
        )

    def dedup_pairs(df: pd.DataFrame) -> pa.Table:
        out = df.drop_duplicates(["doc_a", "doc_b"])
        return pa.table(
            {
                "doc_a": pa.array(out["doc_a"].to_numpy(np.int64), pa.int64()),
                "doc_b": pa.array(out["doc_b"].to_numpy(np.int64), pa.int64()),
                "hamming": pa.array(
                    out["hamming"].to_numpy(np.int64), pa.int64()
                ),
            }
        )

    banded = documents(sf_dir).map_batches(
        sign_and_band, batch_format="pyarrow"
    )
    pairs = banded.groupby("part").map_groups(
        bucket_pairs, batch_format="pandas"
    )
    return pairs.groupby("part2").map_groups(dedup_pairs, batch_format="pandas")


# ---------------------------------------------------------------------------
# Embedding-cosine near-dup
# ---------------------------------------------------------------------------

def _hyperplanes(dim: int, n_tables: int, n_planes: int, seed: int) -> np.ndarray:
    """Deterministic random hyperplanes, regenerated from (seed, dim) inside
    any task — cheap enough that nothing needs broadcasting."""
    rng = np.random.default_rng([seed, dim])
    return rng.standard_normal((n_tables, n_planes, dim))


def embedding_neardup(sf_dir: str, threshold: float = 0.95, n_tables: int = 4,
                      n_planes: int = 6, seed: int = 7, max_bucket: int = 4096,
                      path: str | None = None):
    """Pairs of embeddings with cosine >= threshold, blocked by sign-bit
    hyperplane LSH (n_tables independent tables of n_planes random
    hyperplanes). Vectors land in one bucket per table; exact cosine verifies
    candidates inside each (table, bucket) group; a final pair-key aggregate
    dedups pairs found by several tables.

    Scale shape: the only shuffles are the bounded (table, bucket) groupby and
    the tiny pair dedup — the full matrix is never materialized anywhere. At
    larger corpora raise n_planes (buckets ~ n / 2^n_planes vectors each) so
    the in-bucket gram matrix stays small; pathological buckets are capped
    with a logged truncation."""
    import ray.data as rd
    from ray.data.aggregate import Count

    src = path or f"{sf_dir}/embeddings.parquet"
    emb = rd.read_parquet(src, columns=["vec_id", "embedding"])

    def assign(batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch["vec_id"].to_pylist(), dtype=np.int64)
        mat = np.asarray(batch["embedding"].to_pylist(), dtype=np.float64)
        n, dim = mat.shape if mat.ndim == 2 else (0, 0)
        if n == 0:
            return pa.table(
                {"table_id": pa.array([], pa.int32()),
                 "bucket": pa.array([], pa.int32()),
                 "vec_id": pa.array([], pa.int64()),
                 "embedding": pa.array([], pa.list_(pa.float64()))}
            )
        planes = _hyperplanes(dim, n_tables, n_planes, seed)
        bits = 1 << np.arange(n_planes, dtype=np.int64)
        out_t, out_b, out_v, out_e = [], [], [], []
        for t in range(n_tables):
            proj = mat @ planes[t].T  # (n, n_planes)
            buckets = ((proj > 0).astype(np.int64) @ bits).astype(np.int32)
            out_t.append(np.full(n, t, dtype=np.int32))
            out_b.append(buckets)
            out_v.append(ids)
            out_e.extend(mat.tolist())
        return pa.table(
            {
                "table_id": pa.array(np.concatenate(out_t), pa.int32()),
                "bucket": pa.array(np.concatenate(out_b), pa.int32()),
                "vec_id": pa.array(np.concatenate(out_v), pa.int64()),
                "embedding": pa.array(out_e, pa.list_(pa.float64())),
            }
        )

    exploded = emb.map_batches(assign, batch_format="pyarrow")

    def bucket_pairs(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) > max_bucket:
            print(f"[embedding_neardup] capping bucket of {len(df)} at {max_bucket}")
            df = df.sort_values("vec_id").head(max_bucket)
        ids = np.asarray(df["vec_id"].tolist(), dtype=np.int64)
        mat = np.asarray(df["embedding"].tolist(), dtype=np.float64)
        if len(ids) < 2:
            return pa.table(
                {"vec_a": pa.array([], pa.int64()),
                 "vec_b": pa.array([], pa.int64())}
            )
        norms = np.linalg.norm(mat, axis=1)
        norms[norms == 0] = 1.0
        matn = mat / norms[:, None]
        sims = matn @ matn.T
        ii, jj = np.nonzero(np.triu(sims >= threshold, k=1))
        a, b = ids[ii], ids[jj]
        swap = a > b
        a2 = np.where(swap, b, a)
        b2 = np.where(swap, a, b)
        # ARROW out: the pair-dedup aggregate is 16x faster over Arrow blocks
        return pa.table(
            {"vec_a": pa.array(a2, pa.int64()),
             "vec_b": pa.array(b2, pa.int64())}
        )

    pairs = exploded.groupby(["table_id", "bucket"]).map_groups(
        bucket_pairs, batch_format="pandas"
    )
    return pairs.groupby(["vec_a", "vec_b"]).aggregate(
        Count(alias_name="_n")
    ).drop_columns(["_n"])


def semdedup(sf_dir: str, n_clusters: int = 16, threshold: float = 0.95,
             sample_size: int = 2048, seed: int = 42,
             max_cluster: int = 65536):
    """SemDeDup-style semantic deduplication (Abbas et al. 2023,
    arXiv:2303.09540): cluster the embedding space with k-means, then inside
    each cluster greedily keep a vector only if its cosine to every
    already-kept LOWER-id vector of the cluster stays under ``threshold`` —
    so of each semantic-duplicate group the smallest vec_id survives,
    deterministically. Output is every vector tagged (vec_id, cluster,
    keep), so downstream filters stream.

    Plan: centroids train on the deterministic scattered sample
    (``ann._ivf_training_sample`` — never a prefix) with the same
    ``_kmeans_lite`` the IVF index uses; the trained k x dim matrix
    broadcasts once via ``ray.put``; assignment is an embarrassingly
    parallel argmax-cosine map; the ONLY exchange is the cluster-key
    groupby, bounded by n_clusters groups. The in-task gram matrix costs
    O(|cluster|^2) — inherent to SemDeDup — so at scale n_clusters grows
    proportionally to corpus size (the paper uses ~11k clusters for LAION)
    keeping clusters near a constant target size; a pathological cluster is
    capped with a logged truncation (extra rows kept unexamined, the
    conservative direction for dedup)."""
    import ray

    from .ann import _embeddings, _ivf_training_sample, _kmeans_lite
    from .ann import _normalize

    _, mat = _ivf_training_sample(sf_dir, sample_size)
    cents = _kmeans_lite(mat, n_clusters, seed=seed)
    ref = ray.put(cents)

    def assign(batch: pa.Table) -> pa.Table:
        C = ray.get(ref)
        X = _normalize(
            np.asarray(batch["embedding"].to_pylist(), dtype=np.float64)
        )
        cl = np.argmax(X @ C.T, axis=1).astype(np.int64)
        return pa.table({
            "vec_id": batch["vec_id"],
            "cluster": pa.array(cl),
            "embedding": batch["embedding"],
        })

    sch = pa.schema([
        ("vec_id", pa.int64()), ("cluster", pa.int64()),
        ("keep", pa.int8()),
    ])

    def cluster_dedup(df: pd.DataFrame) -> pa.Table:
        if len(df) == 0:
            return sch.empty_table()
        df = df.sort_values("vec_id", kind="mergesort")
        examined = df
        if len(df) > max_cluster:
            print(f"[semdedup] capping cluster of {len(df)} at {max_cluster}")
            examined = df.head(max_cluster)
        V = _normalize(
            np.asarray(examined["embedding"].tolist(), dtype=np.float64)
        )
        G = V @ V.T
        n = len(examined)
        keep = np.zeros(n, dtype=bool)
        for i in range(n):
            prior = G[i, :i][keep[:i]]
            keep[i] = bool((prior < threshold).all()) if prior.size else True
        flags = np.ones(len(df), dtype=np.int8)
        flags[:n] = keep.astype(np.int8)  # unexamined tail kept
        return pa.table({
            "vec_id": pa.array(df["vec_id"].to_numpy(np.int64)),
            "cluster": pa.array(df["cluster"].to_numpy(np.int64)),
            "keep": pa.array(flags),
        }, schema=sch)

    return (
        _embeddings(sf_dir)
        .map_batches(assign, batch_format="pyarrow")
        .groupby("cluster")
        .map_groups(cluster_dedup, batch_format="pandas")
    )


def semdedup_check(sf_dir: str, n_clusters: int = 16,
                   threshold: float = 0.95, sample_size: int = 2048,
                   seed: int = 42) -> pd.DataFrame:
    """Gate: the DISTRIBUTED SemDeDup result equals a single-process
    recount with the identical scattered sample, k-means, assignment and
    greedy lower-id rule — so a regression in the broadcast/groupby
    plumbing or the in-task gram-matrix greedy fails the driver's
    hash-checked constant oracle (verdict-r3 item 1; the recount
    previously lived only in pytest)."""
    import pyarrow.parquet as pq

    from .ann import _ivf_training_sample, _kmeans_lite, _normalize

    out = semdedup(
        sf_dir, n_clusters=n_clusters, threshold=threshold,
        sample_size=sample_size, seed=seed,
    ).to_pandas()

    tbl = pq.read_table(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    ).to_pandas().sort_values("vec_id")
    ids = tbl["vec_id"].to_numpy(np.int64)
    X = _normalize(np.stack(
        [np.asarray(e, dtype=np.float64) for e in tbl["embedding"]]
    ))
    _, sample = _ivf_training_sample(sf_dir, sample_size)
    cents = _kmeans_lite(sample, n_clusters, seed=seed)
    cl = np.argmax(X @ cents.T, axis=1).astype(np.int64)

    want_keep: dict[int, int] = {}
    for c in np.unique(cl):
        idx = np.nonzero(cl == c)[0]  # ids sorted -> idx in vec_id order
        kept: list[int] = []
        for i in idx:
            dup = any(float(X[i] @ X[j]) >= threshold for j in kept)
            want_keep[int(ids[i])] = 0 if dup else 1
            if not dup:
                kept.append(i)

    got_keep = dict(zip(out["vec_id"].astype(int),
                        out["keep"].astype(int)))
    got_cl = dict(zip(out["vec_id"].astype(int),
                      out["cluster"].astype(int)))
    want_cl = dict(zip(ids.tolist(), cl.tolist()))
    return pd.DataFrame({
        "parity_ok": [int(got_keep == want_keep)],
        "clusters_ok": [int(got_cl == want_cl)],
        "all_tagged_once": [int(
            len(out) == len(ids)
            and out["vec_id"].nunique() == len(ids)
        )],
    })


def _planted_doc_corpus(sf_dir: str, offset: int, tag: str) -> tuple[str, int]:
    """Write a doubled documents corpus (each doc plus an EXACT copy at
    doc_id+offset) under a pid-scoped /tmp sf_dir; returns (tmp_sf_dir,
    n_docs). Exact copies make the planted-pair gates DETERMINISTIC: every
    sketch (minhash bands, simhash bands, rolling fingerprints) is identical
    for the copy, so blocking cannot miss and verification scores 1.0."""
    import os
    import shutil

    from .text import documents

    docs = documents(sf_dir)
    n_docs = docs.count()

    def plant(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy().astype(np.int64)
        texts = batch["text"].to_pylist()
        return pa.table(
            {
                "doc_id": pa.array(
                    np.concatenate([ids, ids + offset]), pa.int64()
                ),
                "text": pa.array(texts + texts, pa.string()),
            }
        )

    tmp = f"/tmp/rayld_{tag}_recall/pid{os.getpid()}"
    shutil.rmtree(tmp, ignore_errors=True)
    # documents() resolves {sf_dir}/documents.parquet — write the doubled
    # corpus as a parquet DIRECTORY of that name so tmp acts as an sf_dir
    os.makedirs(f"{tmp}/documents.parquet", exist_ok=True)
    docs.map_batches(plant, batch_format="pyarrow").write_parquet(
        f"{tmp}/documents.parquet"
    )
    return tmp, n_docs


def _pair_recall_row(pairs, offset: int, n_expected: int) -> pd.DataFrame:
    """Distributed count of planted (a, a+offset) pairs in a (doc_a, doc_b)
    dataset -> the constant-shape gate row the driver hash-checks."""

    def planted_flag(batch: pa.Table) -> pa.Table:
        a = batch["doc_a"].to_numpy()
        b = batch["doc_b"].to_numpy()
        return pa.table(
            {
                "planted": pa.array(
                    (b - a == offset).astype(np.int64), pa.int64()
                )
            }
        )

    flagged = pairs.map_batches(planted_flag, batch_format="pyarrow")
    n_found = int(flagged.sum("planted") or 0)
    ok = 1 if n_found == n_expected else 0
    return pd.DataFrame(
        {
            "n_expected": pd.Series([n_expected], dtype="int64"),
            "n_found": pd.Series([n_found], dtype="int64"),
            "recall_ok": pd.Series([ok], dtype="int64"),
        }
    )


def minhash_dedup_recall(sf_dir: str, offset: int = 10_000_000):
    """Planted-pair quality gate for the MinHash+LSH pipeline (same pattern
    as embedding_neardup_recall): identical text means identical signatures,
    so every planted pair must collide in every band and verify at Jaccard
    1.0 — recovery is deterministic, not probabilistic. Organic near-dup
    pairs are allowed alongside; the driver hash-checks the constant-shape
    result against a constant-1 SQL oracle, so a band shuffle /
    verification-join regression fails correctness."""
    tmp, n = _planted_doc_corpus(sf_dir, offset, "minhash")
    return _pair_recall_row(minhash_dedup(tmp), offset, n)


def simhash_neardup_recall(sf_dir: str, offset: int = 10_000_000):
    """Planted-pair gate for the banded SimHash pipeline: exact copies have
    Hamming distance 0, which shares all four bands — every planted pair
    must appear. Exercises the band shuffle, in-bucket popcount verify, and
    the pair-dedup shuffle end to end."""
    tmp, n = _planted_doc_corpus(sf_dir, offset, "simhash")
    return _pair_recall_row(simhash_neardup(tmp), offset, n)


def ngram_jaccard_recall(sf_dir: str, offset: int = 10_000_000):
    """Planted-pair gate for the rolling-fingerprint-blocked Jaccard
    pipeline: exact copies share every window fingerprint (so the min
    fingerprint blocks them together) and verify at Jaccard 1.0."""
    tmp, n = _planted_doc_corpus(sf_dir, offset, "ngram")
    return _pair_recall_row(ngram_jaccard_dedup(tmp), offset, n)


def dedup_clusters_check(sf_dir: str, offset: int = 10_000_000,
                         num_partitions: int | None = None):
    """Planted-copy gate for the connected-components clustering: over the
    doubled corpus, doc d and its exact copy d+offset must land in the SAME
    cluster for every d (the planted edge guarantees the component exists).
    Checked distributed: cluster rows re-key to the original doc id and a
    bucketed groupby verifies both copies are present and agree; the driver
    hash-checks the constant-shape result against a constant-1 oracle —
    typed verification for the min-label-propagation loop, which was
    rows-only before."""
    import zlib

    from .common import cluster_partitions

    if num_partitions is None:
        num_partitions = cluster_partitions(minimum=8)

    tmp, n = _planted_doc_corpus(sf_dir, offset, "clusters")
    clusters = dedup_clusters(tmp)

    def rekey(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy().astype(np.int64)
        nid = np.where(ids >= offset, ids - offset, ids)
        part = np.fromiter(
            (zlib.crc32(int(x).to_bytes(8, "little")) % num_partitions
             for x in nid),
            dtype=np.int32, count=len(nid),
        )
        return pa.table(
            {
                "nid": pa.array(nid, pa.int64()),
                "cluster_id": batch["cluster_id"].cast(pa.int64()),
                "part": pa.array(part, pa.int32()),
            }
        )

    def agree(df: pd.DataFrame) -> pa.Table:
        g = df.groupby("nid")["cluster_id"]
        ok = ((g.transform("nunique") == 1) & (g.transform("size") >= 2))
        n_ok = int(df[ok]["nid"].nunique())
        return pa.table({"n_ok": pa.array([n_ok], pa.int64())})

    agreed = clusters.map_batches(rekey, batch_format="pyarrow").groupby(
        "part"
    ).map_groups(agree, batch_format="pandas")
    n_found = int(agreed.sum("n_ok") or 0)
    ok = 1 if n_found == n else 0
    return pd.DataFrame(
        {
            "n_expected": pd.Series([n], dtype="int64"),
            "n_found": pd.Series([n_found], dtype="int64"),
            "recall_ok": pd.Series([ok], dtype="int64"),
        }
    )


def embedding_neardup_recall(sf_dir: str, threshold: float = 0.95,
                             eps: float = 0.03, offset: int = 10_000_000,
                             seed: int = 11):
    """Planted-pair quality gate for the hyperplane-LSH near-dup pipeline
    (the ann_ivf_recall structural-oracle pattern): the raw corpus has no
    near-dups (max pairwise cosine ~0.51), so the rows-only check proved
    nothing. Here each embedding gets a deterministically perturbed copy
    (counter-based noise mixed from vec_id — batch-independent, no RNG
    state — cosine ~1-eps^2/2 >= 0.9995), the LSH pipeline runs over the
    doubled corpus, and the gate requires it to find EXACTLY the planted
    (vec_id, vec_id+offset) pairs: full recall and no spurious pairs. The
    driver hash-checks the constant-shape result against a constant-1 SQL
    oracle, so a blocking/verification regression fails correctness."""
    import os
    import shutil

    import ray.data as rd

    src = f"{sf_dir}/embeddings.parquet"
    emb = rd.read_parquet(src, columns=["vec_id", "embedding"])
    n_expected = emb.count()

    def plant(batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch["vec_id"].to_pylist(), dtype=np.int64)
        mat = np.asarray(batch["embedding"].to_pylist(), dtype=np.float64)
        if len(ids) == 0:
            return pa.table(
                {"vec_id": pa.array([], pa.int64()),
                 "embedding": pa.array([], pa.list_(pa.float64()))}
            )
        norms = np.linalg.norm(mat, axis=1)
        norms[norms == 0] = 1.0
        matn = mat / norms[:, None]
        dim = mat.shape[1]
        # counter-based noise: splitmix-mix of (seed, vec_id, component) —
        # identical for a given vec_id regardless of batch boundaries
        seed_mix = np.uint64((seed * 0x9E3779B97F4A7C15) & 0xFFFFFFFFFFFFFFFF)
        with np.errstate(over="ignore"):
            ctr = (
                ids[:, None].astype(np.uint64) * np.uint64(dim)
                + np.arange(dim, dtype=np.uint64)[None, :]
                + seed_mix
            )
            ctr ^= ctr >> np.uint64(33)
            ctr *= _SIMHASH_MIX1
            ctr ^= ctr >> np.uint64(33)
            ctr *= _SIMHASH_MIX2
            ctr ^= ctr >> np.uint64(33)
        noise = ctr.astype(np.float64) / float(2**64) - 0.5
        nn = np.linalg.norm(noise, axis=1)
        nn[nn == 0] = 1.0
        pert = matn + eps * noise / nn[:, None]
        pert /= np.linalg.norm(pert, axis=1)[:, None]
        return pa.table(
            {
                "vec_id": pa.array(
                    np.concatenate([ids, ids + offset]), pa.int64()
                ),
                "embedding": pa.array(
                    list(matn) + list(pert), pa.list_(pa.float64())
                ),
            }
        )

    tmp = f"/tmp/rayld_neardup_recall/pid{os.getpid()}"
    shutil.rmtree(tmp, ignore_errors=True)
    os.makedirs(tmp, exist_ok=True)
    emb.map_batches(plant, batch_format="pyarrow").write_parquet(tmp)

    pairs = embedding_neardup(sf_dir, threshold=threshold, path=tmp)

    def planted_flag(batch: pa.Table) -> pa.Table:
        a = batch["vec_a"].to_numpy()
        b = batch["vec_b"].to_numpy()
        return pa.table(
            {
                "planted": pa.array(
                    (b - a == offset).astype(np.int64), pa.int64()
                )
            }
        )

    flagged = pairs.map_batches(planted_flag, batch_format="pyarrow")
    n_pairs = flagged.count()
    n_found = int(flagged.sum("planted") or 0)
    ok = 1 if (n_found == n_expected and n_pairs == n_found) else 0
    return pd.DataFrame(
        {
            "n_expected": pd.Series([n_expected], dtype="int64"),
            "n_found": pd.Series([n_found], dtype="int64"),
            "recall_ok": pd.Series([ok], dtype="int64"),
        }
    )


# ---------------------------------------------------------------------------
# Near-dup clusters (connected components over verified pairs)
# ---------------------------------------------------------------------------

def connected_components(pairs_ds, num_partitions: int | None = None,
                         max_iters: int = 50):
    """Distributed connected components by min-label propagation over an
    undirected edge Dataset (doc_a, doc_b) -> (doc_id, cluster_id) with
    cluster_id = the component's min doc_id.

    Each round is a neighbor-min hash join (edges x labels on dst) plus a
    POINTER JUMP (labels joined to themselves: label(node) <-
    label(label(node))), each followed by a groupby-min — the jump squares
    the propagation reach, so even high-diameter chains converge in
    O(log diameter) rounds (measured: a 200k-node random graph with a giant
    component finishes in a handful of rounds where one-hop propagation
    needed 30+). The driver never holds the edge list; it only sees the
    scalar label sum used as the convergence test (labels are monotonically
    non-increasing, so an unchanged sum is a fixpoint). The per-round label
    table (one row per non-singleton doc — far smaller than the corpus) is
    materialized to cut lineage growth across iterations."""
    from .common import cluster_partitions

    if num_partitions is None:
        # lower floor than the one-shot shuffles: the per-round task count is
        # P x rounds, so a small session should not pay 64 groups per round
        num_partitions = cluster_partitions(minimum=8)

    def symmetrize(batch: pa.Table) -> pa.Table:
        a = batch["doc_a"].cast(pa.int64())
        b = batch["doc_b"].cast(pa.int64())
        # both directions plus self-loops so each node's own label always
        # participates in the per-round min
        src = pa.concat_arrays(
            [c.combine_chunks() for c in (a, b, a, b)]
        )
        dst = pa.concat_arrays(
            [c.combine_chunks() for c in (b, a, a, b)]
        )
        return pa.table({"src": src, "dst": dst})

    # pipeline breaker: materialize the (small) pair set to the object store
    # before the propagation loop — running the upstream verification joins
    # inside the same streaming execution as the per-round joins starves the
    # executor in small sessions. repartition purges schema-less empty blocks
    # (see _join_pair_texts) and bounds the block count for the loop.
    edges = pairs_ds.materialize().repartition(num_partitions).map_batches(
        symmetrize, batch_format="pyarrow"
    ).materialize()
    if edges.count() == 0:
        return pa.table(
            {"doc_id": pa.array([], pa.int64()),
             "cluster_id": pa.array([], pa.int64())}
        )

    # Every step below uses ONLY sort-based bucketed map_groups — per-round
    # groupby.aggregate() calls spin up to 64 hash-shuffle aggregator ACTORS
    # each, which dominates wall time in an iterative loop.

    # -1 SENTINELS (not nulls) in the unused side-columns: a nullable int64
    # column comes out of the Arrow->pandas conversion as float64, which
    # silently rounds node ids above 2^53 at scale; the sentinel cells are
    # never read (merge_min selects only each side's own columns)
    def tag_edges(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        return pa.table(
            {
                "dst": batch["dst"].cast(pa.int64()),
                "src": batch["src"].cast(pa.int64()),
                "label": pa.array(np.full(n, -1, np.int64)),
                "is_right": pa.array(np.zeros(n, np.int8)),
            }
        )

    def tag_labels(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        return pa.table(
            {
                "dst": batch["src"].cast(pa.int64()),  # keyed on the node
                "src": pa.array(np.full(n, -1, np.int64)),
                "label": batch["label"].cast(pa.int64()),
                "is_right": pa.array(np.ones(n, np.int8)),
            }
        )

    def tag_label_queries(batch: pa.Table) -> pa.Table:
        """labels as join QUERIES keyed by their current label value — the
        pointer-jump side: look up label(label(node))."""
        n = batch.num_rows
        return pa.table(
            {
                "dst": batch["label"].cast(pa.int64()),
                "src": batch["src"].cast(pa.int64()),
                "label": pa.array(np.full(n, -1, np.int64)),
                "is_right": pa.array(np.zeros(n, np.int8)),
            }
        )

    def merge_min(df: pd.DataFrame) -> pa.Table:
        """In-bucket hash join + PARTIAL min per src (Arrow out: aggregates
        and sorts over pandas blocks are ~16x slower)."""
        lab = df[df["is_right"] == 1][["dst", "label"]]
        edg = df[df["is_right"] == 0][["dst", "src"]]
        out = edg.merge(lab, on="dst", how="inner")
        g = out.groupby("src", as_index=False)["label"].min()
        return pa.table(
            {"src": pa.array(g["src"].astype("int64"), pa.int64()),
             "label": pa.array(g["label"].astype("int64"), pa.int64())}
        )

    def combine_min(df: pd.DataFrame) -> pa.Table:
        g = df.groupby("src", as_index=False)["label"].min()
        return pa.table(
            {"src": pa.array(g["src"].astype("int64"), pa.int64()),
             "label": pa.array(g["label"].astype("int64"), pa.int64())}
        )

    def bucket_src(batch: pa.Table) -> pa.Table:
        k = np.asarray(batch["src"].to_pylist(), dtype=np.int64)
        parts = (k % num_partitions).astype(np.int32)
        return batch.append_column("part", pa.array(parts, pa.int32()))

    def label_sum(lab_ds) -> int:
        """Convergence scalar streamed on the driver (no aggregate actors)."""
        import pyarrow.compute as pc

        tot = 0
        for b in lab_ds.iter_batches(batch_size=65536, batch_format="pyarrow"):
            if b.num_rows:
                tot += pc.sum(b["label"]).as_py() or 0
        return tot

    # initial label(node) = min neighbor (self-loops include the node)
    labels = edges.map_batches(bucket_src, batch_format="pyarrow").groupby(
        "part"
    ).map_groups(
        lambda df: combine_min(
            df[["src", "dst"]].rename(columns={"dst": "label"})
        ),
        batch_format="pandas",
    ).materialize()
    prev_sum = label_sum(labels)

    tagged_edges = edges.map_batches(
        tag_edges, batch_format="pyarrow"
    ).materialize()
    propagate_rounds = 0
    for step in range(3 * max_iters):
        # ADAPTIVE pointer jump: near-dup components have tiny diameters and
        # converge in 2-3 plain propagate rounds, so the jump's extra shuffle
        # would be pure overhead there; only when plain propagation hasn't
        # converged after 3 rounds (a high-diameter component) do jump rounds
        # interleave — label(node) <- label(label(node)) squares the reach,
        # giving O(log diameter) rounds on chains.
        do_jump = propagate_rounds >= 3 and step % 2 == 1
        if not do_jump:
            # propagate: candidate(node) = min label over neighbors —
            # bucketed join on dst with in-bucket partial min, then a
            # src-bucketed combine
            msgs = _bucketed_hash_join(
                tagged_edges,
                labels.map_batches(tag_labels, batch_format="pyarrow"),
                "dst", num_partitions, merge_min,
            )
            labels = msgs.map_batches(
                bucket_src, batch_format="pyarrow"
            ).groupby("part").map_groups(
                combine_min, batch_format="pandas"
            ).materialize()
            propagate_rounds += 1
            new_sum = label_sum(labels)
            # a propagate fixpoint is THE fixpoint: unchanged neighbor-min
            # (with self-loops) means labels are constant per component
            if new_sum == prev_sum:
                break
            prev_sum = new_sum
        else:
            # every node emits exactly one query row, so the jump's join
            # output is already one row per node — no combine shuffle;
            # label(label(n)) <= label(n) keeps monotonicity
            labels = _bucketed_hash_join(
                labels.map_batches(tag_label_queries, batch_format="pyarrow"),
                labels.map_batches(tag_labels, batch_format="pyarrow"),
                "dst", num_partitions, merge_min,
            ).materialize()
            prev_sum = label_sum(labels)

    def rename(batch: pa.Table) -> pa.Table:
        return pa.table(
            {"doc_id": batch["src"], "cluster_id": batch["label"]}
        )

    return labels.map_batches(rename, batch_format="pyarrow")


def dedup_clusters(sf_dir: str, threshold: float = 0.5, concurrency: int | None = None):
    """Connected components over the verified near-dup pairs:
    (doc_id, cluster_id) with cluster_id = min doc_id of the component;
    singleton docs are omitted (every doc in a pair gets a row, including the
    component minimum itself).

    Fully distributed: the verified pairs feed min-label propagation
    (connected_components) — one join + groupby-min per round; the driver
    never materializes the pair set."""
    pairs = minhash_dedup(sf_dir, threshold=threshold, concurrency=concurrency)
    return connected_components(pairs)


# ---------------------------------------------------------------------------
# n-gram Jaccard dedup (rolling-fingerprint blocking)
# ---------------------------------------------------------------------------

def ngram_jaccard_dedup(sf_dir: str, threshold: float = 0.5, window: int = 8,
                        num_partitions: int | None = None):
    """Near-dup pairs via true n-gram Jaccard, blocked by the min rolling-hash
    fingerprint (shift-resistant): docs sharing a fingerprint are compared
    pairwise. A distinct blocking strategy from MinHash banding.
    Output: (doc_a, doc_b) with doc_a < doc_b.

    The fingerprint is a pure per-document function, so it is computed
    ALONGSIDE the text in one map stage (no doc_id join), and the blocking
    shuffle is BUCKETED: fingerprints are near-unique, so grouping on the raw
    key would make one Ray group per document at scale — instead rows carry
    ``part = crc32(rolling_fp) % P`` (P cluster-derived), the groupby runs on
    ``part``, and an in-task pandas groupby recovers the real fingerprint
    buckets."""
    import zlib

    from .common import cluster_partitions
    from .text import _doc_rolling_fp

    if num_partitions is None:
        num_partitions = cluster_partitions()

    def fp_and_bucket(df: pd.DataFrame) -> pa.Table:
        fps = [_doc_rolling_fp(t, window) for t in df["text"]]
        parts = np.fromiter(
            (zlib.crc32(f.encode()) % num_partitions for f in fps),
            dtype=np.int32, count=len(fps),
        )
        return pa.table(
            {
                "doc_id": pa.array(df["doc_id"].astype("int64"), pa.int64()),
                "rolling_fp": pa.array(fps, pa.string()),
                "text": pa.array(df["text"], pa.string()),
                "part": pa.array(parts, pa.int32()),
            }
        )

    def bucket_pairs(df: pd.DataFrame) -> pa.Table:
        rows_a, rows_b = [], []
        for _, grp in df.groupby("rolling_fp", sort=False):
            if len(grp) <= 1:
                continue
            recs = sorted(zip(grp["doc_id"].tolist(), grp["text"].tolist()))
            if len(recs) > 200:
                print(f"[ngram_jaccard] capping bucket of {len(recs)} at 200")
                recs = recs[:200]
            for i in range(len(recs)):
                for j in range(i + 1, len(recs)):
                    if jaccard(recs[i][1], recs[j][1]) >= threshold:
                        rows_a.append(recs[i][0])
                        rows_b.append(recs[j][0])
        return pa.table(
            {"doc_a": pa.array(rows_a, pa.int64()),
             "doc_b": pa.array(rows_b, pa.int64())}
        )

    return documents(sf_dir).map_batches(
        fp_and_bucket, batch_format="pandas"
    ).groupby("part").map_groups(bucket_pairs, batch_format="pandas")


# ---------------------------------------------------------------------------
# exact substring-duplication stats (duplicate n-gram spans)
# ---------------------------------------------------------------------------

def duplicate_ngram_spans(sf_dir: str, window: int = 8,
                          num_partitions: int | None = None):
    """Exact substring-duplication stats, the training-data dedup measure of
    Lee et al., "Deduplicating Training Data Makes Language Models Better"
    (ACL 2022, public): a window POSITION is duplicated when its exact
    ``window``-token n-gram occurs at >= 2 positions anywhere in the corpus
    (other docs or elsewhere in the same doc). Per-doc output:
    (doc_id, n_windows, n_dup_positions, dup_fraction).

    Scale shape — one tokenize pass, two bucketed exchanges:
    1. map: each batch reduces to (ngram, doc_id, occ) partials via
       per-doc Counter (value counts, never one row per position when a
       doc repeats itself), plus one (doc_id, n_windows) row per doc so
       zero-dup docs survive to the output;
    2. exchange A keys pair rows by crc32(ngram) % P (doc rows ride along
       on crc32(doc_id) % P and pass through): each bucket totals corpus
       occurrences per ngram exactly (the STRING is the group key — the
       hash only buckets; at 100 TB you would swap in the 64-bit roll and
       accept its collision rate, same plumbing) and emits per-doc
       duplicated-position partials;
    3. exchange B combines per doc_id (bucketed_sum_combine) and a final
       stateless map computes the fraction.
    """
    import zlib
    from collections import Counter

    from .common import bucketed_sum_combine, cluster_partitions
    from .text import documents

    if num_partitions is None:
        num_partitions = cluster_partitions()

    _mixed_schema = pa.schema([
        ("ngram", pa.string()), ("doc_id", pa.int64()),
        ("occ", pa.int64()), ("n_windows", pa.int64()),
        ("is_doc", pa.int8()), ("part", pa.int32()),
    ])

    def partials(df: pd.DataFrame) -> pa.Table:
        ngrams: list[str] = []
        doc_ids: list[int] = []
        occs: list[int] = []
        d_ids = df["doc_id"].astype("int64").tolist()
        win_counts: list[int] = []
        for doc_id, text in zip(d_ids, df["text"]):
            toks = _TOKEN_RE.findall(text)
            n_win = max(0, len(toks) - window + 1)
            win_counts.append(n_win)
            if n_win == 0:
                continue
            counts = Counter(
                " ".join(toks[i:i + window]) for i in range(n_win)
            )
            ngrams.extend(counts.keys())
            occs.extend(counts.values())
            doc_ids.extend([doc_id] * len(counts))
        pair_parts = np.fromiter(
            (zlib.crc32(g.encode()) % num_partitions for g in ngrams),
            dtype=np.int32, count=len(ngrams),
        )
        doc_parts = np.fromiter(
            (zlib.crc32(str(d).encode()) % num_partitions for d in d_ids),
            dtype=np.int32, count=len(d_ids),
        )
        n_p, n_d = len(ngrams), len(d_ids)
        return pa.table({
            "ngram": pa.array(ngrams + [""] * n_d, pa.string()),
            "doc_id": pa.array(doc_ids + d_ids, pa.int64()),
            "occ": pa.array(occs + [0] * n_d, pa.int64()),
            "n_windows": pa.array([0] * n_p + win_counts, pa.int64()),
            "is_doc": pa.array(
                np.concatenate([np.zeros(n_p, np.int8),
                                np.ones(n_d, np.int8)]), pa.int8()),
            "part": pa.array(np.concatenate([pair_parts, doc_parts]),
                             pa.int32()),
        }, schema=_mixed_schema)

    _part_schema = pa.schema([
        ("doc_id", pa.int64()), ("n_windows", pa.int64()),
        ("n_dup", pa.int64()),
    ])

    def count_dups(df: pd.DataFrame) -> pa.Table:
        if len(df) == 0:
            return _part_schema.empty_table()
        docs = df[df["is_doc"] == 1]
        pairs = df[df["is_doc"] == 0]
        out = [pa.table({
            "doc_id": pa.array(docs["doc_id"].to_numpy(np.int64)),
            "n_windows": pa.array(docs["n_windows"].to_numpy(np.int64)),
            "n_dup": pa.array(np.zeros(len(docs), np.int64)),
        }, schema=_part_schema)]
        if len(pairs):
            tot = pairs.groupby("ngram")["occ"].transform("sum")
            dup = pairs[tot > 1]
            g = dup.groupby("doc_id", as_index=False)["occ"].sum()
            out.append(pa.table({
                "doc_id": pa.array(g["doc_id"].to_numpy(np.int64)),
                "n_windows": pa.array(np.zeros(len(g), np.int64)),
                "n_dup": pa.array(g["occ"].to_numpy(np.int64)),
            }, schema=_part_schema))
        return pa.concat_tables(out)

    per_doc = bucketed_sum_combine(
        documents(sf_dir).map_batches(partials, batch_format="pandas")
        .groupby("part").map_groups(count_dups, batch_format="pandas"),
        keys=["doc_id"], sum_cols=["n_windows", "n_dup"],
        schema=pa.schema([
            ("doc_id", pa.int64()), ("n_windows", pa.int64()),
            ("n_dup", pa.int64()),
        ]),
        num_partitions=num_partitions,
    )

    def finish(df: pd.DataFrame) -> pa.Table:
        if len(df) == 0:
            return pa.schema([
                ("doc_id", pa.int64()), ("n_windows", pa.int64()),
                ("n_dup_positions", pa.int64()),
                ("dup_fraction", pa.float64()),
            ]).empty_table()
        n_win = df["n_windows"].to_numpy(np.int64)
        n_dup = df["n_dup"].to_numpy(np.int64)
        frac = np.where(n_win > 0, n_dup / np.maximum(n_win, 1), 0.0)
        return pa.table({
            "doc_id": pa.array(df["doc_id"].to_numpy(np.int64)),
            "n_windows": pa.array(n_win),
            "n_dup_positions": pa.array(n_dup),
            "dup_fraction": pa.array(frac, pa.float64()),
        })

    return per_doc.map_batches(finish, batch_format="pandas")


# ---------------------------------------------------------------------------
# Incremental ingest dedup (new shard vs existing corpus, Bloom exchange)
# ---------------------------------------------------------------------------


def bloom_incremental_dedup(sf_dir: str, key_chars: int = 80,
                            m_bits: int = 1 << 20,
                            num_partitions: int | None = None):
    """Flag each NEW-batch document that duplicates an EXISTING-corpus
    document — the incremental-ingest shape that matters at 100 TB, where
    the existing corpus must never be shuffled wholesale. The split is the
    stable md5(doc_id) bucket (< 50 = existing, the ``hash_split``
    convention); the dedup key is md5 of the first ``key_chars``
    characters (the cheap prefix fingerprint; near-dup corpora share
    openings long before they share full bodies — pass a huge ``key_chars``
    for whole-text keys).

    Two-sided Bloom exchange — only bitmaps and candidate hashes move:

      1. hash pass: one read computes (doc_id, hex key, uint64 probe key,
         side) per doc; the hash table (~50 B/row, ~0.05%% of corpus
         bytes) is materialized once as the pipeline breaker so the three
         consumers below don't re-read + re-digest the corpus;
      2. Bloom A over the EXISTING keys (fixed-size per-block partials,
         driver OR-merge — ``common.bloom_bitmap``), broadcast via
         ray.put. New docs that MISS are definitely-new and never touch a
         shuffle;
      3. Bloom B over the (small) candidate hits, broadcast back: it
         prunes the existing side down to ~|candidates| + FP rows, so the
         exact pass never shuffles the old corpus's key set;
      4. exact pass: union of candidates + surviving existing keys,
         one crc32(hex key) bucketed shuffle, in-task set membership over
         the FULL hex digest (the uint64 probe keys exist only for the
         bitmaps). Bloom false positives die here; false negatives are
         impossible (no-false-negative property of the filter), which the
         tiny-bitmap unit test pins.

    Output: (doc_id, dup_of_existing) for every new-batch doc; exactly the
    SQL EXISTS flag (oracle-checked)."""
    import ray

    from ..functions.vectorized import bloom_test
    from .common import bloom_bitmap, cluster_partitions

    if num_partitions is None:
        num_partitions = cluster_partitions()

    def tag(df: pd.DataFrame) -> pa.Table:
        # the split is curation's hash_split contract — one definition
        from .curation import _split_bucket

        hexes = [
            hashlib.md5(t[:key_chars].encode("utf-8")).hexdigest()
            for t in df["text"]
        ]
        h64 = np.fromiter(
            (int(h[:16], 16) for h in hexes), dtype=np.uint64,
            count=len(hexes),
        )
        bucket = _split_bucket(df["doc_id"])
        return pa.table({
            "doc_id": pa.array(df["doc_id"].to_numpy(np.int64)),
            "h": pa.array(hexes, pa.string()),
            "h64": pa.array(h64, pa.uint64()),
            "is_old": pa.array((bucket < 50).astype(np.int8), pa.int8()),
        })

    tagged = documents(sf_dir).map_batches(
        tag, batch_format="pandas"
    ).materialize()

    def old_keys(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return batch.filter(pc.equal(batch["is_old"], 1)).select(["h64"])

    bloom_a = ray.put(bloom_bitmap(
        tagged.map_batches(old_keys, batch_format="pyarrow"), "h64", m_bits
    ))

    out_sch = pa.schema([
        ("doc_id", pa.int64()), ("dup_of_existing", pa.int64()),
    ])

    def probe_new(df: pd.DataFrame) -> pa.Table:
        new = df[df["is_old"] == 0]
        bm = ray.get(bloom_a)
        hit = bloom_test(
            bm, new["h64"].to_numpy(np.uint64), m_bits
        ).astype(np.int8)
        return pa.table({
            "doc_id": pa.array(new["doc_id"].to_numpy(np.int64)),
            "h": pa.array(new["h"].tolist(), pa.string()),
            "h64": pa.array(new["h64"].to_numpy(np.uint64), pa.uint64()),
            "hit": pa.array(hit, pa.int8()),
        })

    probed = tagged.map_batches(probe_new, batch_format="pandas").materialize()

    def definite(df: pd.DataFrame) -> pa.Table:
        miss = df[df["hit"] == 0]
        return pa.table({
            "doc_id": pa.array(miss["doc_id"].to_numpy(np.int64)),
            "dup_of_existing": pa.array(
                np.zeros(len(miss), np.int64), pa.int64()
            ),
        }, schema=out_sch)

    def cand_keys(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return batch.filter(pc.equal(batch["hit"], 1)).select(["h64"])

    bloom_b = ray.put(bloom_bitmap(
        probed.map_batches(cand_keys, batch_format="pyarrow"), "h64", m_bits
    ))

    def old_cand(df: pd.DataFrame) -> pa.Table:
        old = df[df["is_old"] == 1]
        bm = ray.get(bloom_b)
        kept = old[bloom_test(bm, old["h64"].to_numpy(np.uint64), m_bits)]
        return pa.table({
            "doc_id": pa.array(
                np.full(len(kept), -1, np.int64), pa.int64()
            ),
            "h": pa.array(kept["h"].tolist(), pa.string()),
            "is_old": pa.array(np.ones(len(kept), np.int8), pa.int8()),
        })

    def cand_rows(df: pd.DataFrame) -> pa.Table:
        hits = df[df["hit"] == 1]
        return pa.table({
            "doc_id": pa.array(hits["doc_id"].to_numpy(np.int64)),
            "h": pa.array(hits["h"].tolist(), pa.string()),
            "is_old": pa.array(np.zeros(len(hits), np.int8), pa.int8()),
        })

    def bucket(df: pd.DataFrame) -> pa.Table:
        from ..functions.vectorized import crc32_buckets

        df = df.assign(part=crc32_buckets(df["h"], num_partitions))
        return pa.Table.from_pandas(df, preserve_index=False)

    def verify(df: pd.DataFrame) -> pa.Table:
        if len(df) == 0:
            return out_sch.empty_table()
        have = set(df.loc[df["is_old"] == 1, "h"])
        new = df[df["is_old"] == 0]
        return pa.table({
            "doc_id": pa.array(new["doc_id"].to_numpy(np.int64)),
            "dup_of_existing": pa.array(
                new["h"].isin(have).to_numpy(bool).astype(np.int64),
                pa.int64(),
            ),
        }, schema=out_sch)

    verified = (
        probed.map_batches(cand_rows, batch_format="pandas")
        .union(tagged.map_batches(old_cand, batch_format="pandas"))
        .map_batches(bucket, batch_format="pandas")
        .groupby("part")
        .map_groups(verify, batch_format="pandas")
    )
    return probed.map_batches(definite, batch_format="pandas").union(verified)


# ---------------------------------------------------------------------------
# Exact edit-distance similarity self-join (segment blocking + banded DP)
# ---------------------------------------------------------------------------


def _banded_levenshtein(a: str, b: str, k: int) -> int:
    """Levenshtein distance capped at k+1: the classic banded DP visits
    only the |i-j| <= k diagonal band, O((2k+1) * len) per pair instead of
    O(len^2). Returns a value > k when the true distance exceeds k."""
    la, lb = len(a), len(b)
    if abs(la - lb) > k:
        return k + 1
    big = k + 1
    prev = [j if j <= k else big for j in range(lb + 1)]
    for i in range(1, la + 1):
        cur = [big] * (lb + 1)
        if i <= k:
            cur[0] = i
        ca = a[i - 1]
        lo = max(1, i - k)
        hi = min(lb, i + k)
        for j in range(lo, hi + 1):
            cur[j] = min(
                prev[j] + 1,
                cur[j - 1] + 1,
                prev[j - 1] + (ca != b[j - 1]),
            )
        prev = cur
    return prev[lb]


def edit_distance_pairs(sf_dir: str, k: int = 2, prefix_chars: int = 40,
                        num_partitions: int | None = None,
                        max_block_pairs: int = 4_000_000):
    """All unordered document pairs whose ``prefix_chars``-char text
    prefixes are within Levenshtein distance ``k`` — EXACT fuzzy string
    self-join via Pass-Join-style segment blocking (Li et al., PVLDB
    2011 lineage):

      pigeonhole: split every string into k+1 contiguous segments; an
      alignment with <= k edits must leave at least one segment untouched,
      and the untouched segment reappears in the other string shifted by
      at most k positions. So each string emits its k+1 segments (index
      role) AND, per segment slot, its substrings at the <= 2k+1 shifted
      positions (probe role); a probe/index content match inside one
      (slot, content) block is a candidate.

    One blocking exchange on crc32(slot:content); then a SALTING pass
    bounds hub blocks (verdict-r3 item 2): a (slot, content) block whose
    index x probe product exceeds ``max_block_pairs`` has its LARGER side
    hash-split by doc_id into S = ceil(pairs / max_block_pairs)
    sub-blocks with the smaller side replicated into each — every pair
    still meets in exactly the sub-block its split-side doc hashes to, so
    the result stays EXACT while per-task pair fan-out is bounded (an OOM
    at 100 TB becomes S parallel tasks; the split is logged, never a
    truncation). In-task index x probe pair generation follows, one
    pair-key exchange dedups the (k+1)(2k+1) + salting re-discoveries,
    and the banded DP confirms dist <= k in-task. Strings
    shorter than 2(k+1) chars fall back to one brute-force short block
    (sound because ed <= k forces |len diff| <= k). Result is exactly the
    SQL levenshtein cross-join (oracle-checked)."""
    import zlib

    from .common import cluster_partitions

    if num_partitions is None:
        num_partitions = cluster_partitions()
    min_len = 2 * (k + 1)

    cand_sch = pa.schema([
        ("slot", pa.string()), ("content", pa.string()),
        ("doc_id", pa.int64()), ("s", pa.string()),
        ("is_probe", pa.int8()), ("part", pa.int32()),
    ])

    def emit(df: pd.DataFrame) -> pa.Table:
        slots, contents, ids, strs, roles = [], [], [], [], []

        def add(slot, content, doc, s, probe):
            slots.append(slot)
            contents.append(content)
            ids.append(doc)
            strs.append(s)
            roles.append(probe)

        def seg_bounds(length, i):
            return i * length // (k + 1), (i + 1) * length // (k + 1)

        for doc, text in zip(df["doc_id"], df["text"]):
            s = (text or "")[:prefix_chars]
            L = len(s)
            if L < min_len + k:
                # short block: every string that could pair with a short
                # string lands here; brute-force inside the task
                add("#short", "", int(doc), s, 0)
                if L < min_len:
                    add("#short", "", int(doc), s, 1)
                if L < min_len:
                    continue
            if L >= min_len:
                for i in range(k + 1):
                    st, en = seg_bounds(L, i)
                    # index role: my own segments, keyed by MY length —
                    # probe substrings must use the INDEX side's scheme
                    # (its segment starts/lengths depend on its length),
                    # so the block key carries that length
                    add(f"{L}:{i}", s[st:en], int(doc), s, 0)
                # probe role: for every candidate index length within the
                # |len diff| <= k bound, extract that scheme's substrings
                # shifted by up to k net indels
                for Lx in range(max(min_len, L - k), L + k + 1):
                    for i in range(k + 1):
                        st_x, en_x = seg_bounds(Lx, i)
                        seg_len = en_x - st_x
                        seen = set()
                        for d in range(-k, k + 1):
                            p = st_x + d
                            if 0 <= p and p + seg_len <= L:
                                sub = s[p:p + seg_len]
                                if sub not in seen:  # dedupe shifts
                                    seen.add(sub)
                                    add(f"{Lx}:{i}", sub, int(doc), s, 1)
        parts = np.fromiter(
            (zlib.crc32(f"{sl}:{c}".encode("utf-8")) % num_partitions
             for sl, c in zip(slots, contents)),
            dtype=np.int32, count=len(slots),
        )
        return pa.table({
            "slot": pa.array(slots, pa.string()),
            "content": pa.array(contents, pa.string()),
            "doc_id": pa.array(np.asarray(ids, dtype=np.int64)),
            "s": pa.array(strs, pa.string()),
            "is_probe": pa.array(np.asarray(roles, dtype=np.int8), pa.int8()),
            "part": pa.array(parts, pa.int32()),
        }, schema=cand_sch)

    def salt_hubs(df: pd.DataFrame) -> pa.Table:
        if "slot" not in df.columns or len(df) == 0:
            return cand_sch.empty_table()
        outs = []
        for (sl, ct), g in df.groupby(["slot", "content"], sort=False):
            is_prb = g["is_probe"].to_numpy() == 1
            n_idx = int((~is_prb).sum())
            n_prb = int(is_prb.sum())
            if n_idx * n_prb <= max_block_pairs:
                outs.append(g)
                continue
            # 2-D grid split: cell (i, j) holds index rows with
            # hash(doc) % s_idx == i and probe rows with
            # hash(doc) % s_prb == j, so every (index-doc, probe-doc)
            # pair meets in EXACTLY one cell. Grid shape balances
            # replication (idx rows copy s_prb times, probe rows s_idx
            # times) — for a one-sided hub this degenerates to splitting
            # the big side only; for a symmetric mega-hub replication
            # stays O(sqrt(pairs/T)) per row instead of O(pairs/T).
            s_tot = -(-n_idx * n_prb // max_block_pairs)
            s_idx = min(n_idx, max(
                1, int(round((s_tot * n_idx / n_prb) ** 0.5))))
            s_prb = min(n_prb, -(-s_tot // s_idx))
            print(f"edit_distance_pairs: hub block {n_idx}x{n_prb} "
                  f"split into {s_idx}x{s_prb} grid cells (exact)")
            idx_rows = g[~is_prb]
            prb_rows = g[is_prb]
            hi = idx_rows["doc_id"].to_numpy(np.int64) % s_idx
            hp = prb_rows["doc_id"].to_numpy(np.int64) % s_prb
            for i in range(s_idx):
                sub_i = idx_rows[hi == i]
                if len(sub_i) == 0:
                    continue
                for j in range(s_prb):
                    sub_p = prb_rows[hp == j]
                    if len(sub_p) == 0:
                        continue
                    blk = pd.concat([sub_i, sub_p]).copy()
                    blk["slot"] = f"{sl}~{i}x{j}"
                    outs.append(blk)
        res = pd.concat(outs) if outs else df.iloc[:0]
        parts = np.fromiter(
            (zlib.crc32(f"{sl}:{c}".encode("utf-8")) % num_partitions
             for sl, c in zip(res["slot"], res["content"])),
            dtype=np.int32, count=len(res),
        )
        res = res.assign(part=parts)
        return pa.Table.from_pandas(res, preserve_index=False).cast(
            cand_sch
        )

    pair_sch = pa.schema([
        ("doc_a", pa.int64()), ("doc_b", pa.int64()),
        ("sa", pa.string()), ("sb", pa.string()), ("part", pa.int32()),
    ])

    def candidates(df: pd.DataFrame) -> pa.Table:
        if "slot" not in df.columns:
            return pair_sch.empty_table()
        out_a, out_b, out_sa, out_sb = [], [], [], []
        for (_, _), g in df.groupby(["slot", "content"]):
            idx = g[g["is_probe"] == 0]
            prb = g[g["is_probe"] == 1]
            if len(idx) == 0 or len(prb) == 0:
                continue
            prb = prb.drop_duplicates("doc_id")
            idx = idx.drop_duplicates("doc_id")
            for a, s_a in zip(idx["doc_id"], idx["s"]):
                for b, s_b in zip(prb["doc_id"], prb["s"]):
                    if a == b:
                        continue
                    lo, hi = (a, b) if a < b else (b, a)
                    s_lo, s_hi = (s_a, s_b) if a < b else (s_b, s_a)
                    out_a.append(lo)
                    out_b.append(hi)
                    out_sa.append(s_lo)
                    out_sb.append(s_hi)
        if not out_a:
            return pair_sch.empty_table()
        pr = np.fromiter(
            ((a * 1000003 + b) % num_partitions
             for a, b in zip(out_a, out_b)),
            dtype=np.int32, count=len(out_a),
        )
        return pa.table({
            "doc_a": pa.array(np.asarray(out_a, np.int64)),
            "doc_b": pa.array(np.asarray(out_b, np.int64)),
            "sa": pa.array(out_sa, pa.string()),
            "sb": pa.array(out_sb, pa.string()),
            "part": pa.array(pr, pa.int32()),
        }, schema=pair_sch)

    out_sch = pa.schema([
        ("doc_a", pa.int64()), ("doc_b", pa.int64()), ("dist", pa.int64()),
    ])

    def verify(df: pd.DataFrame) -> pa.Table:
        if "doc_a" not in df.columns:
            return out_sch.empty_table()
        g = df.drop_duplicates(["doc_a", "doc_b"])
        keep_a, keep_b, dists = [], [], []
        for a, b, sa, sb in zip(g["doc_a"], g["doc_b"], g["sa"], g["sb"]):
            d = _banded_levenshtein(sa, sb, k)
            if d <= k:
                keep_a.append(a)
                keep_b.append(b)
                dists.append(d)
        return pa.table({
            "doc_a": pa.array(np.asarray(keep_a, np.int64)),
            "doc_b": pa.array(np.asarray(keep_b, np.int64)),
            "dist": pa.array(np.asarray(dists, np.int64)),
        }, schema=out_sch)

    # materialize = breakers between the three chained all-to-alls: fusing
    # sort->sort chains in one streaming plan thrashes the executor (the
    # graph family's pair exchange measured 431s fused vs ~5s broken;
    # CLAUDE.md rule). Each breaker holds candidate-sized data only.
    blocked = (
        documents(sf_dir).map_batches(emit, batch_format="pandas")
        .groupby("part").map_groups(salt_hubs, batch_format="pandas")
    ).materialize()
    cands = (
        blocked.groupby("part").map_groups(
            candidates, batch_format="pandas"
        )
    ).materialize()
    return cands.groupby("part").map_groups(verify, batch_format="pandas")


def dup_rate_by_source(sf_dir: str, num_partitions: int | None = None):
    """Per-source exact-duplicate rate: for each document source, the
    fraction of its docs that are NON-survivors of content-hash dedup
    (min doc_id per md5(text) survives) — the crawl-health diagnostic
    that tells you WHICH feed to dedup or drop, where dedup_exact only
    says how much survives overall.

    Same single bucketed content-hash exchange as dedup_survivor_map with
    the source carried through; each hash bucket resolves survivors
    in-task and pre-counts per source, so the second combine moves one
    row per (source x bucket) — bounded by the source alphabet."""
    import zlib

    from .common import bucketed_sum_combine, cluster_partitions

    if num_partitions is None:
        num_partitions = cluster_partitions()

    def add_hash(batch: pa.Table) -> pa.Table:
        hs = [
            hashlib.md5(t.encode("utf-8")).hexdigest()
            for t in batch["text"].to_pylist()
        ]
        parts = np.fromiter(
            (zlib.crc32(h.encode()) % num_partitions for h in hs),
            dtype=np.int32, count=len(hs),
        )
        return pa.table({
            "doc_id": batch["doc_id"],
            "source": batch["source"],
            "h": pa.array(hs, pa.string()),
            "part": pa.array(parts, pa.int32()),
        })

    cnt_sch = pa.schema([
        ("source", pa.string()), ("n_docs", pa.int64()),
        ("n_dups", pa.int64()),
    ])

    def count_dups(df: pd.DataFrame) -> pa.Table:
        if len(df) == 0:
            return cnt_sch.empty_table()
        surv = df.groupby("h")["doc_id"].transform("min")
        g = pd.DataFrame({
            "source": df["source"],
            "n_docs": 1,
            "n_dups": (df["doc_id"] != surv).astype("int64"),
        }).groupby("source", as_index=False).sum()
        return pa.Table.from_pandas(g, preserve_index=False).cast(cnt_sch)

    partials = (
        documents(sf_dir, columns=("doc_id", "source", "text"))
        .map_batches(add_hash, batch_format="pyarrow")
        .groupby("part")
        .map_groups(count_dups, batch_format="pandas")
    )
    agg = bucketed_sum_combine(
        partials, keys=["source"], sum_cols=["n_docs", "n_dups"],
        schema=cnt_sch,
    )

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        df["dup_rate"] = (
            df["n_dups"].astype("int64") / df["n_docs"].astype("int64")
        )
        return df[["source", "n_docs", "n_dups", "dup_rate"]]

    return agg.map_batches(finish, batch_format="pandas")


def dedup_exact_keep_best(sf_dir: str, num_partitions: int | None = None):
    """NORMALIZED exact dedup with a QUALITY-AWARE survivor policy: per
    distinct normalized text (lowercase, whitespace collapsed — the
    dedup_exact_normalized key), keep the highest-RAW-quality copy
    (tie -> min doc_id) — the curation rule real training pipelines use
    instead of keep-first: reflowed/cased variants of one document score
    differently, and an arbitrary survivor may be the worst copy.

    Same bucketed shuffle as dedup_exact_normalized; quality computes
    in-map on the RAW text through the shared text.quality_cols contract
    and converts to integer MICRO units before the argmax, so survivor
    selection is bit-identical to the SQL window oracle
    (ROW_NUMBER ... ORDER BY q6 DESC, doc_id). Returns
    (doc_id, quality_micro) survivors."""
    import os

    from .common import sized_partitions
    from .text import documents, quality_cols

    if num_partitions is None:
        num_partitions = sized_partitions(
            os.path.getsize(f"{sf_dir}/documents.parquet")
        )

    out_sch = pa.schema([
        ("doc_id", pa.int64()), ("quality_micro", pa.int64()),
    ])

    def add_hash_quality(df: pd.DataFrame) -> pa.Table:
        hs = [
            hashlib.md5(
                _WS_RE.sub(" ", t.lower()).strip(" ").encode("utf-8")
            ).hexdigest()
            for t in df["text"]
        ]
        _, score = quality_cols(df["text"])
        q6 = np.rint(np.asarray(score) * 1e6).astype(np.int64)
        return pa.table({
            "doc_id": pa.array(df["doc_id"].to_numpy(np.int64)),
            "h": pa.array(hs, pa.string()),
            "q6": pa.array(q6),
            "part": pa.array(_hash_parts(hs, num_partitions), pa.int32()),
        })

    def best(df: pd.DataFrame) -> pa.Table:
        if len(df) == 0 or "h" not in df.columns:
            return out_sch.empty_table()
        df = df.sort_values(["h", "q6", "doc_id"],
                            ascending=[True, False, True],
                            kind="mergesort")
        g = df.groupby("h", as_index=False).first()
        return pa.table({
            "doc_id": pa.array(g["doc_id"].to_numpy(np.int64)),
            "quality_micro": pa.array(g["q6"].to_numpy(np.int64)),
        }, schema=out_sch)

    hashed = documents(sf_dir).map_batches(
        add_hash_quality, batch_format="pandas")
    return hashed.groupby("part").map_groups(best, batch_format="pandas")


def source_overlap_matrix(sf_dir: str, prefix_len: int = 40,
                          num_partitions: int | None = None):
    """Cross-source content-overlap matrix — the curation diagnostic
    that says WHICH sources share material before any dedup decision:
    for every unordered source pair, the number of 40-char opening
    fingerprints both sources contain (template/boilerplate overlap)
    and the number of exact full texts both contain (true duplication;
    always a subset, since identical text implies identical prefix).

    Plan: one map emits per-batch-distinct (kind, fingerprint, source)
    rows; ONE crc32(fingerprint) bucketed exchange co-locates each
    fingerprint's source set; per-bucket unordered source pairs
    pre-aggregate and fold through the bounded house combine (the
    source vocabulary is bounded, so the pair matrix is result-sized).
    No text ever moves — only digests."""
    from .common import bucketed_sum_combine, cluster_partitions
    from .text import documents

    if num_partitions is None:
        num_partitions = cluster_partitions()

    leg_sch = pa.schema([
        ("kind", pa.string()), ("h", pa.string()),
        ("source", pa.string()), ("part", pa.int32()),
    ])
    out_sch = pa.schema([
        ("source_a", pa.string()), ("source_b", pa.string()),
        ("n_shared_prefixes", pa.int64()), ("n_shared_texts", pa.int64()),
    ])

    def legs(df: pd.DataFrame) -> pa.Table:
        ht = [hashlib.md5(t.encode("utf-8")).hexdigest()
              for t in df["text"]]
        hp = [hashlib.md5(t[:prefix_len].encode("utf-8")).hexdigest()
              for t in df["text"]]
        rows = pd.concat([
            pd.DataFrame({"kind": "t", "h": ht, "source": df["source"]}),
            pd.DataFrame({"kind": "p", "h": hp, "source": df["source"]}),
        ], ignore_index=True).drop_duplicates()
        return pa.table({
            "kind": pa.array(rows["kind"].astype(str), pa.string()),
            "h": pa.array(rows["h"].astype(str), pa.string()),
            "source": pa.array(rows["source"].astype(str), pa.string()),
            "part": pa.array(
                _hash_parts(rows["h"].tolist(), num_partitions), pa.int32()),
        }, schema=leg_sch)

    pair_sch = pa.schema([
        ("source_a", pa.string()), ("source_b", pa.string()),
        ("n_shared_prefixes", pa.int64()), ("n_shared_texts", pa.int64()),
    ])

    def pairs(df: pd.DataFrame) -> pa.Table:
        if len(df) == 0 or "kind" not in df.columns:
            return pair_sch.empty_table()
        df = df.drop_duplicates(["kind", "h", "source"])
        out: dict = {}
        for (kind, _h), grp in df.groupby(["kind", "h"], sort=False):
            srcs = sorted(set(grp["source"]))
            for i in range(len(srcs)):
                for j in range(i + 1, len(srcs)):
                    key = (srcs[i], srcs[j])
                    np_, nt_ = out.get(key, (0, 0))
                    if kind == "p":
                        out[key] = (np_ + 1, nt_)
                    else:
                        out[key] = (np_, nt_ + 1)
        if not out:
            return pair_sch.empty_table()
        ks = sorted(out)
        return pa.table({
            "source_a": pa.array([a for a, _ in ks], pa.string()),
            "source_b": pa.array([b for _, b in ks], pa.string()),
            "n_shared_prefixes": pa.array(
                [out[k][0] for k in ks], pa.int64()),
            "n_shared_texts": pa.array(
                [out[k][1] for k in ks], pa.int64()),
        }, schema=pair_sch)

    partials = (
        documents(sf_dir, columns=("doc_id", "text", "source"))
        .map_batches(legs, batch_format="pandas")
        .groupby("part").map_groups(pairs, batch_format="pandas")
    )
    return bucketed_sum_combine(
        partials, keys=["source_a", "source_b"],
        sum_cols=["n_shared_prefixes", "n_shared_texts"], schema=out_sch,
        num_partitions=8,
    )
