"""Corpus-curation operators for training-data pipelines over the
``documents`` table: benchmark decontamination, PII/denylist redaction,
deterministic train/val/test splitting, stratified (data-mixing) sampling,
repetition statistics (Gopher-style signals), percentile length-outlier
filtering, and token-budget sequence packing.

Scale shapes (the rules every op here follows):
- The benchmark side of decontamination is SMALL BY CONTRACT (an eval set,
  not a second corpus): its n-gram set is broadcast once via ``ray.put`` and
  membership-tested per batch with one vectorized ``searchsorted`` — the
  100-TB corpus itself never shuffles.
- Everything per-document is a vectorized ``map_batches`` body (pandas
  string kernels, numpy rolling hashes); the only per-row digests are the
  one-md5-per-doc keys that the SQL oracles pin (the ``dedup_exact``
  precedent).
- ``pack_sequences`` is the one op that genuinely needs a sequential scan
  (greedy packing is a recurrence); it localizes the recurrence to fixed
  ``chunk_docs``-sized doc_id ranges and ships chunks through ONE bucketed
  shuffle (``crc32(chunk) % cluster_partitions()`` groups, in-task pandas
  groupby over the real chunk key — never one Ray group per chunk).
"""

from __future__ import annotations

import hashlib
import re
import zlib

import numpy as np
import pandas as pd
import pyarrow as pa

from .text import _TOKEN_RE, _rk_window_hashes, documents

# PII / denylist patterns: ASCII-only, valid with identical semantics in
# Python re and DuckDB's RE2 (parity-tested in tests/test_curation.py)
_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_PHONE_RE = r"\+?[0-9][0-9() \-]{6,}[0-9]"
_TERM_RE = r"\bcustomer\b"

_TOKEN_PAT = re.compile(_TOKEN_RE)


def _doc_window_hashes(text: str, n: int) -> np.ndarray:
    """Position-normalized polynomial hashes of every n-token window
    (crc32 per token + the O(n) vectorized Rabin-Karp roll). Two equal token
    windows hash equal regardless of position, so set membership over these
    hashes IS n-gram membership (64-bit; collision odds are negligible at
    any realistic benchmark size)."""
    toks = _TOKEN_PAT.findall(text)
    if len(toks) < n:
        return np.empty(0, dtype=np.uint64)
    h = np.fromiter(
        (zlib.crc32(t.encode()) for t in toks),
        dtype=np.uint64,
        count=len(toks),
    )
    return _rk_window_hashes(h, n)


def decontaminate(sf_dir: str, ngram_n: int = 3, bench_mod: int = 29):
    """Benchmark-overlap decontamination: flag every training document that
    shares at least one n-token window with the benchmark set (here: the
    deterministic ``doc_id % bench_mod == 0`` slice standing in for an eval
    corpus; real pipelines pass the eval set's grams). Returns one row per
    NON-benchmark document: (doc_id, n_hits, contaminated).

    Two passes, zero corpus shuffles: (1) the benchmark slice's distinct
    window hashes are collected driver-side (small by contract — eval sets
    are KBs-to-MBs while the corpus is TBs) and broadcast once via
    ``ray.put``; (2) one vectorized map over the corpus counts window-hash
    membership with a single ``searchsorted`` per document. In practice
    decontamination uses 8-13-gram windows; the default 3 matches this
    corpus's short synthetic docs."""
    import ray

    def bench_partial(df: pd.DataFrame) -> pa.Table:
        sel = df[(df["doc_id"] % bench_mod) == 0]
        if len(sel) == 0:
            hs = np.empty(0, dtype=np.uint64)
        else:
            hs = np.unique(
                np.concatenate(
                    [_doc_window_hashes(t, ngram_n) for t in sel["text"]]
                    or [np.empty(0, dtype=np.uint64)]
                )
            )
        return pa.table({"h": pa.array(hs, pa.uint64())})

    bench_tbl = (
        documents(sf_dir)
        .map_batches(bench_partial, batch_format="pandas")
        .to_pandas()
    )
    # an all-empty dataset comes back column-less from to_pandas
    bench = (
        np.unique(bench_tbl["h"].to_numpy(dtype=np.uint64))
        if "h" in bench_tbl.columns
        else np.empty(0, dtype=np.uint64)
    )
    ref = ray.put(bench)  # sorted — searchsorted-ready

    def score(df: pd.DataFrame) -> pa.Table:
        grams = ray.get(ref)
        df = df[(df["doc_id"] % bench_mod) != 0]
        hits = np.zeros(len(df), dtype=np.int64)
        for i, t in enumerate(df["text"]):
            ws = _doc_window_hashes(t, ngram_n)
            if len(ws) and len(grams):
                idx = np.searchsorted(grams, ws)
                idx[idx == len(grams)] = 0
                hits[i] = int((grams[idx] == ws).sum())
        return pa.table(
            {
                "doc_id": pa.array(
                    df["doc_id"].to_numpy(np.int64), pa.int64()
                ),
                "n_hits": pa.array(hits, pa.int64()),
                "contaminated": pa.array(
                    (hits > 0).astype(np.int64), pa.int64()
                ),
            }
        )

    return documents(sf_dir).map_batches(score, batch_format="pandas")


def pii_redact(sf_dir: str):
    """PII / denylist scrub: redact emails, then phone numbers, then the
    denylist term, in that order (counts are taken against the text each
    pattern actually saw, which the SQL oracle pins stage by stage).
    Returns (doc_id, n_emails, n_phones, n_terms, redacted_md5) — the md5
    proves the full redacted text matches the oracle byte for byte without
    shipping it."""

    def fn(df: pd.DataFrame) -> pa.Table:
        t0 = df["text"]
        n_emails = t0.str.count(_EMAIL_RE).astype("int64")
        t1 = t0.str.replace(_EMAIL_RE, "<EMAIL>", regex=True)
        n_phones = t1.str.count(_PHONE_RE).astype("int64")
        t2 = t1.str.replace(_PHONE_RE, "<PHONE>", regex=True)
        n_terms = t2.str.count(_TERM_RE).astype("int64")
        t3 = t2.str.replace(_TERM_RE, "<TERM>", regex=True)
        md5s = [hashlib.md5(s.encode("utf-8")).hexdigest() for s in t3]
        return pa.table(
            {
                "doc_id": pa.array(df["doc_id"].to_numpy(np.int64)),
                "n_emails": pa.array(n_emails.to_numpy(np.int64)),
                "n_phones": pa.array(n_phones.to_numpy(np.int64)),
                "n_terms": pa.array(n_terms.to_numpy(np.int64)),
                "redacted_md5": pa.array(md5s, pa.string()),
            }
        )

    return documents(sf_dir).map_batches(fn, batch_format="pandas")


def _split_bucket(doc_ids: pd.Series) -> np.ndarray:
    """Deterministic 0-99 bucket per doc: first 8 hex digits of
    md5(str(doc_id)) mod 100 — stable across runs, machines and partitioning
    (and exactly reproducible in SQL, so the split is auditable)."""
    return np.fromiter(
        (
            int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16) % 100
            for i in doc_ids
        ),
        dtype=np.int64,
        count=len(doc_ids),
    )


def hash_split(sf_dir: str, train_pct: int = 80, val_pct: int = 10):
    """Deterministic train/val/test assignment by content-independent doc_id
    hash: bucket < train_pct -> train, < train_pct+val_pct -> val, else
    test. Embarrassingly parallel (no shuffle); adding data never reassigns
    existing docs — the property that matters when a 100-TB corpus grows
    incrementally."""

    def fn(df: pd.DataFrame) -> pa.Table:
        b = _split_bucket(df["doc_id"])
        split = np.where(
            b < train_pct, "train", np.where(b < train_pct + val_pct, "val", "test")
        )
        return pa.table(
            {
                "doc_id": pa.array(df["doc_id"].to_numpy(np.int64)),
                "bucket": pa.array(b, pa.int64()),
                "split": pa.array(split, pa.string()),
            }
        )

    return documents(sf_dir, columns=("doc_id",)).map_batches(
        fn, batch_format="pandas"
    )


def stratified_sample(sf_dir: str, quota: int = 50):
    """Per-language quota sample (the data-mixing primitive): the ``quota``
    docs with smallest md5(doc_id) per lang, ranked. Per-batch partial
    top-quota BEFORE the shuffle means each block contributes at most
    ``quota`` rows per lang — the groupby moves O(quota x langs x blocks)
    tiny rows, never the corpus; the final per-lang merge is a handful of
    groups (bounded by the language inventory, not the data)."""

    def partial(df: pd.DataFrame) -> pa.Table:
        key = [
            hashlib.md5(str(i).encode()).hexdigest()
            for i in df["doc_id"]
        ]
        x = pd.DataFrame(
            {"doc_id": df["doc_id"], "lang": df["lang"], "key": key}
        )
        x = (
            x.sort_values(["key", "doc_id"], kind="mergesort")
            .groupby("lang", as_index=False, sort=False)
            .head(quota)
        )
        return pa.table(
            {
                "lang": pa.array(x["lang"].astype(str), pa.string()),
                "doc_id": pa.array(x["doc_id"].to_numpy(np.int64)),
                "key": pa.array(x["key"].astype(str), pa.string()),
            }
        )

    def final(g: pd.DataFrame) -> pa.Table:
        g = g.sort_values(["key", "doc_id"], kind="mergesort").head(quota)
        return pa.table(
            {
                "doc_id": pa.array(g["doc_id"].to_numpy(np.int64)),
                "lang": pa.array(g["lang"].astype(str), pa.string()),
                "sample_rank": pa.array(
                    np.arange(1, len(g) + 1, dtype=np.int64), pa.int64()
                ),
            }
        )

    return (
        documents(sf_dir, columns=("doc_id", "lang"))
        .map_batches(partial, batch_format="pandas")
        .groupby("lang")
        .map_groups(final, batch_format="pandas")
    )


def _round6(x: np.ndarray) -> np.ndarray:
    # half-up to 6dp on both sides of the oracle (round() is half-even in
    # numpy and half-away in DuckDB; they diverge on exact ties)
    return np.floor(x * 1e6 + 0.5) / 1e6


def repetition_stats(sf_dir: str):
    """Gopher-style repetition signals per document: distinct-token ratio,
    top-token fraction, top-bigram fraction (half-up 6dp). One vectorized
    pass — tokens explode WITHIN the batch (pandas groupby over the row
    index), nothing crosses the wire but the per-doc result row."""

    def fn(df: pd.DataFrame) -> pa.Table:
        df = df.reset_index(drop=True)
        toks = df["text"].str.findall(_TOKEN_RE)
        ex = toks.explode().dropna()
        ntok = np.zeros(len(df), dtype=np.int64)
        ndist = np.zeros(len(df), dtype=np.int64)
        topn = np.zeros(len(df), dtype=np.int64)
        nbg = np.zeros(len(df), dtype=np.int64)
        topbg = np.zeros(len(df), dtype=np.int64)
        if len(ex):
            tc = ex.groupby([ex.index, ex]).size()
            ntok_s = tc.groupby(level=0).sum()
            ntok[ntok_s.index] = ntok_s.to_numpy(np.int64)
            ndist_s = tc.groupby(level=0).size()
            ndist[ndist_s.index] = ndist_s.to_numpy(np.int64)
            topn_s = tc.groupby(level=0).max()
            topn[topn_s.index] = topn_s.to_numpy(np.int64)
            nxt = ex.groupby(level=0).shift(-1)
            mask = nxt.notna()
            if mask.any():
                bg = ex[mask] + " " + nxt[mask]
                bc = bg.groupby([bg.index, bg]).size()
                nbg_s = bc.groupby(level=0).sum()
                nbg[nbg_s.index] = nbg_s.to_numpy(np.int64)
                topbg_s = bc.groupby(level=0).max()
                topbg[topbg_s.index] = topbg_s.to_numpy(np.int64)
        return pa.table(
            {
                "doc_id": pa.array(df["doc_id"].to_numpy(np.int64)),
                "n_tokens": pa.array(ntok, pa.int64()),
                "distinct_ratio": pa.array(
                    _round6(ndist / np.maximum(ntok, 1)), pa.float64()
                ),
                "top_token_frac": pa.array(
                    _round6(topn / np.maximum(ntok, 1)), pa.float64()
                ),
                "top_bigram_frac": pa.array(
                    _round6(topbg / np.maximum(nbg, 1)), pa.float64()
                ),
            }
        )

    return documents(sf_dir).map_batches(fn, batch_format="pandas")


def length_outlier_filter(sf_dir: str, lo_q: float = 0.01, hi_q: float = 0.99):
    """Percentile length-outlier filter: keep documents whose token count
    lies within [percentile_disc(lo_q), percentile_disc(hi_q)]. Two passes —
    the thresholds come from the tiny distributed length histogram (distinct
    lengths ≪ corpus at any scale), then one embarrassingly-parallel filter;
    the thresholds ship in the task closure, not a join."""
    from .text import _token_length_histogram, histogram_percentile_disc

    disc = histogram_percentile_disc(*_token_length_histogram(sf_dir))
    lo, hi = disc(lo_q), disc(hi_q)

    def fn(df: pd.DataFrame) -> pa.Table:
        n = df["text"].str.findall(_TOKEN_RE).str.len().to_numpy(np.int64)
        keep = (n >= lo) & (n <= hi)
        return pa.table(
            {
                "doc_id": pa.array(
                    df["doc_id"].to_numpy(np.int64)[keep], pa.int64()
                ),
                "n_tokens": pa.array(n[keep], pa.int64()),
            }
        )

    return documents(sf_dir).map_batches(fn, batch_format="pandas")


_PACK_SCHEMA = pa.schema(
    [
        ("doc_id", pa.int64()),
        ("bin_id", pa.int64()),
        ("n_tokens", pa.int64()),
        ("token_offset", pa.int64()),
    ]
)


def pack_sequences(
    sf_dir: str,
    capacity: int = 256,
    chunk_docs: int = 128,
    num_partitions: int | None = None,
):
    """Token-budget sequence packing: greedy in-doc_id-order binning with
    capacity ``capacity`` tokens, restarted every ``chunk_docs`` documents so
    the recurrence is chunk-local and the job stays embarrassingly parallel
    across chunks (bin_id = chunk * chunk_docs + local bin — globally unique
    with no cross-chunk scan). An oversize doc (> capacity) occupies its own
    bin. Returns (doc_id, bin_id, n_tokens, token_offset).

    Shuffle shape: token counts are vectorized per batch; chunks ride ONE
    bucketed exchange (crc32(chunk) % P groups, in-task pandas groupby over
    the real chunk key); the greedy scan is O(1) integer work per doc after
    the vectorized tokenization that dominates it."""
    from .common import cluster_partitions

    if num_partitions is None:
        num_partitions = cluster_partitions()

    def lengths(df: pd.DataFrame) -> pa.Table:
        n = df["text"].str.findall(_TOKEN_RE).str.len().to_numpy(np.int64)
        did = df["doc_id"].to_numpy(np.int64)
        chunk = did // chunk_docs
        return pa.table(
            {
                "doc_id": pa.array(did, pa.int64()),
                "chunk": pa.array(chunk, pa.int64()),
                "part": pa.array(
                    (chunk % num_partitions).astype(np.int64), pa.int64()
                ),
                "n": pa.array(n, pa.int64()),
            }
        )

    def pack_part(g: pd.DataFrame) -> pa.Table:
        if len(g) == 0:
            return _PACK_SCHEMA.empty_table()
        g = g.sort_values(["chunk", "doc_id"], kind="mergesort")
        chunks = g["chunk"].to_numpy(np.int64)
        ns = g["n"].to_numpy(np.int64)
        bins = np.empty(len(g), dtype=np.int64)
        offs = np.empty(len(g), dtype=np.int64)
        cur_chunk, local, fill = -1, 0, 0
        for i in range(len(g)):
            if chunks[i] != cur_chunk:
                cur_chunk, local, fill = chunks[i], 0, 0
            # the oracle's recurrence: any NON-FIRST doc that does not fit
            # opens a bin — including when fill == 0 (all-empty docs so
            # far) and the doc alone exceeds capacity; the first doc of a
            # chunk always lands in bin 0 whatever its size
            elif fill + ns[i] > capacity:
                local += 1
                fill = 0
            offs[i] = fill
            fill += ns[i]
            bins[i] = chunks[i] * chunk_docs + local
        return pa.table(
            {
                "doc_id": pa.array(g["doc_id"].to_numpy(np.int64)),
                "bin_id": pa.array(bins, pa.int64()),
                "n_tokens": pa.array(ns, pa.int64()),
                "token_offset": pa.array(offs, pa.int64()),
            }
        )

    return (
        documents(sf_dir)
        .map_batches(lengths, batch_format="pandas")
        .groupby("part")
        .map_groups(pack_part, batch_format="pandas")
    )


_CHUNK_SCHEMA = pa.schema(
    [
        ("doc_id", pa.int64()),
        ("chunk_idx", pa.int64()),
        ("chunk_start", pa.int64()),
        ("chunk_tokens", pa.int64()),
    ]
)


def chunk_documents(sf_dir: str, chunk: int = 64, stride: int = 48):
    """Overlapping token-window chunking (the embedding-pipeline prep step):
    windows of ``chunk`` tokens starting every ``stride`` tokens; every
    document emits at least one chunk (an empty doc emits one empty chunk,
    keeping the coverage invariant 'every doc appears'). Embarrassingly
    parallel — the window geometry is pure arithmetic on the vectorized
    token count, expanded with np.repeat, no shuffle at all."""

    def fn(df: pd.DataFrame) -> pa.Table:
        n = df["text"].str.findall(_TOKEN_PAT).str.len().to_numpy(np.int64)
        did = df["doc_id"].to_numpy(np.int64)
        n_chunks = (np.maximum(n, 1) + stride - 1) // stride
        doc_rep = np.repeat(did, n_chunks)
        n_rep = np.repeat(n, n_chunks)
        # chunk_idx restarts at 0 within each doc
        ends = np.cumsum(n_chunks)
        idx = np.arange(ends[-1] if len(ends) else 0, dtype=np.int64)
        idx -= np.repeat(ends - n_chunks, n_chunks)
        starts = idx * stride
        toks = np.minimum(chunk, n_rep - starts)
        return pa.table(
            {
                "doc_id": pa.array(doc_rep, pa.int64()),
                "chunk_idx": pa.array(idx, pa.int64()),
                "chunk_start": pa.array(starts, pa.int64()),
                "chunk_tokens": pa.array(toks, pa.int64()),
            }
        )

    return documents(sf_dir).map_batches(fn, batch_format="pandas")


def mixture_sample(sf_dir: str):
    """Weighted data-mixing sampler: per-source keep-fractions (the 'mixture
    weights' of a training-data recipe), applied as a deterministic md5
    bucket test — keep a doc when bucket(doc_id) < pct(source), where
    pct = 20 + 7*(source number) mod 60. Shuffle-free, append-stable, and
    fully auditable in SQL. Returns (doc_id, source, bucket, pct)."""

    def fn(df: pd.DataFrame) -> pa.Table:
        b = _split_bucket(df["doc_id"])
        srcnum = (
            df["source"].str.extract(r"([0-9]+)", expand=False)
            .fillna("0").astype(np.int64)
        )
        pct = 20 + (srcnum * 7) % 60
        keep = b < pct.to_numpy(np.int64)
        return pa.table(
            {
                "doc_id": pa.array(df["doc_id"].to_numpy(np.int64)[keep]),
                "source": pa.array(
                    df["source"].astype(str).to_numpy()[keep], pa.string()
                ),
                "bucket": pa.array(b[keep], pa.int64()),
                "pct": pa.array(pct.to_numpy(np.int64)[keep], pa.int64()),
            }
        )

    return documents(sf_dir, columns=("doc_id", "source")).map_batches(
        fn, batch_format="pandas"
    )


def weighted_sample(sf_dir: str, k: int = 64):
    """Deterministic weighted sampling WITHOUT replacement, probability
    proportional to document length: the Efraimidis–Spirakis A-ES scheme
    (public classic) with the uniform drawn from md5(doc_id) — key
    u^(1/w), realized as ln(u)/w (same ordering, fewer float ops), global
    top-k by key. Seedless and reproducible: adding data never changes an
    existing doc's key, only the cutoff.

    Scale shape: keys are per-row arithmetic; each batch emits only its
    LOCAL top-k partial, so the final sort sees <= k x blocks rows — the
    same tiny-merge contract as ann.brute_force_topk."""

    def partial(df: pd.DataFrame) -> pa.Table:
        u = np.fromiter(
            (int(hashlib.md5(str(i).encode()).hexdigest()[:13], 16) + 1
             for i in df["doc_id"]),
            dtype=np.float64, count=len(df),
        ) / 4503599627370496.0  # 16^13 = 2^52; u in (0, 1]
        w = np.maximum(df["n_chars"].to_numpy(np.int64), 1)
        key = np.log(u) / w
        g = pd.DataFrame({
            "doc_id": df["doc_id"].to_numpy(np.int64),
            "weight": w.astype("int64"),
            "es_key": key,
        }).sort_values(["es_key", "doc_id"], ascending=[False, True]).head(k)
        return pa.Table.from_pandas(g, preserve_index=False)

    top = (
        documents(sf_dir, columns=("doc_id", "n_chars"))
        .map_batches(partial, batch_format="pandas")
        .sort(["es_key", "doc_id"], descending=[True, False])
        .limit(k)
    )

    def finish(t: pa.Table) -> pa.Table:
        n = t.num_rows
        return pa.table({
            "doc_id": t["doc_id"].cast(pa.int64()),
            "weight": t["weight"].cast(pa.int64()),
            "sample_rank": pa.array(
                np.arange(1, n + 1, dtype=np.int64), pa.int64()
            ),
        })

    # ONE consolidated block so ranks are global (k rows total)
    return top.repartition(1).map_batches(finish, batch_format="pyarrow")


def leakage_safe_split(sf_dir: str, train_pct: int = 80, val_pct: int = 10,
                       threshold: float = 0.5,
                       num_partitions: int | None = None):
    """Cluster-aware train/val/test assignment — the contamination guard
    ``hash_split`` alone cannot give: two NEAR-DUPLICATE documents split
    independently leak one into train and the other into test. Here every
    doc is keyed by its near-dup component (``dedup.dedup_clusters``
    min-label; singletons key by their own doc_id), and the whole
    component rides one md5 bucket — so a cluster can never straddle
    splits, and adding data still never reassigns existing docs (the
    hash_split contract, now at cluster granularity).

    One bucketed hash join attaches the (candidates-only, << corpus)
    cluster table to the doc ids; the split is then embarrassingly
    parallel. Output: (doc_id, split_key, bucket, split)."""
    from .dedup import _bucketed_hash_join, dedup_clusters
    from .common import cluster_partitions

    if num_partitions is None:
        num_partitions = cluster_partitions()

    clusters = dedup_clusters(sf_dir, threshold=threshold).materialize()
    docs = documents(sf_dir, columns=("doc_id",))

    sch = pa.schema([
        ("doc_id", pa.int64()), ("split_key", pa.int64()),
        ("bucket", pa.int64()), ("split", pa.string()),
    ])

    def doc_side(batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch["doc_id"].to_pylist(), dtype=np.int64)
        return pa.table({
            "node": pa.array(ids),
            "cluster_id": pa.array(np.full(len(ids), -1, np.int64)),
            "is_cl": pa.array(np.zeros(len(ids), np.int8), pa.int8()),
        })

    def cl_side(batch: pa.Table) -> pa.Table:
        return pa.table({
            "node": batch["doc_id"],
            "cluster_id": batch["cluster_id"],
            "is_cl": pa.array(np.ones(batch.num_rows, np.int8), pa.int8()),
        })

    def assign(df: pd.DataFrame) -> pa.Table:
        if "node" not in df.columns:
            return sch.empty_table()
        cmap = df[df["is_cl"] == 1].set_index("node")["cluster_id"]
        d = df[df["is_cl"] == 0]
        ids = d["node"].to_numpy(np.int64)
        key = d["node"].map(cmap).fillna(
            pd.Series(ids, index=d.index)
        ).to_numpy(np.int64)
        b = _split_bucket(pd.Series(key))
        split = np.where(
            b < train_pct, "train",
            np.where(b < train_pct + val_pct, "val", "test"),
        )
        return pa.table({
            "doc_id": pa.array(ids),
            "split_key": pa.array(key),
            "bucket": pa.array(b, pa.int64()),
            "split": pa.array(split, pa.string()),
        }, schema=sch)

    return _bucketed_hash_join(
        docs.map_batches(doc_side, batch_format="pyarrow"),
        clusters.map_batches(cl_side, batch_format="pyarrow"),
        key="node", num_partitions=num_partitions, merge_fn=assign,
    )


def leakage_safe_split_check(sf_dir: str, threshold: float = 0.5):
    """Gate: no near-dup cluster straddles splits (per-cluster split
    nunique == 1 for every multi-doc cluster), every doc is assigned
    exactly once, and singleton assignments equal plain hash_split."""
    import zlib

    from .common import cluster_partitions

    P = cluster_partitions()
    assigned = leakage_safe_split(sf_dir, threshold=threshold).materialize()

    def part_key(batch: pa.Table) -> pa.Table:
        keys = np.asarray(batch["split_key"].to_pylist(), dtype=np.int64)
        return batch.append_column(
            "part", pa.array((keys % P).astype(np.int32), pa.int32())
        )

    def violations(df: pd.DataFrame) -> pa.Table:
        sch = pa.schema([("n_bad", pa.int64())])
        if "split_key" not in df.columns:
            return sch.empty_table()
        g = df.groupby("split_key")["split"].nunique()
        return pa.table({
            "n_bad": pa.array([int((g > 1).sum())], pa.int64()),
        }, schema=sch)

    bad = assigned.map_batches(
        part_key, batch_format="pyarrow"
    ).groupby("part").map_groups(
        violations, batch_format="pandas"
    ).to_pandas()
    n_bad = int(bad["n_bad"].sum()) if "n_bad" in bad.columns else 0

    n_docs = documents(sf_dir, columns=("doc_id",)).count()
    n_assigned = assigned.count()
    return pd.DataFrame({
        "no_cluster_straddles": [int(n_bad == 0)],
        "all_docs_assigned_once": [int(n_assigned == n_docs)],
    })


def contamination_by_source(sf_dir: str, ngram_n: int = 3,
                            bench_mod: int = 29):
    """Per-source benchmark-contamination rates: which feed leaks eval
    n-grams — the rollup that turns ``decontaminate``'s per-doc flags into
    a remove-the-source decision. Same two-pass broadcast plan (benchmark
    window hashes collected once, one vectorized searchsorted map) with
    the source carried through; per-batch partials collapse to (source,
    n_docs, n_contaminated) and ONE bounded combine finishes."""
    import ray

    from .common import bucketed_sum_combine

    def bench_partial(df: pd.DataFrame) -> pa.Table:
        sel = df[(df["doc_id"] % bench_mod) == 0]
        if len(sel) == 0:
            hs = np.empty(0, dtype=np.uint64)
        else:
            hs = np.unique(
                np.concatenate(
                    [_doc_window_hashes(t, ngram_n) for t in sel["text"]]
                    or [np.empty(0, dtype=np.uint64)]
                )
            )
        return pa.table({"h": pa.array(hs, pa.uint64())})

    bench_tbl = (
        documents(sf_dir)
        .map_batches(bench_partial, batch_format="pandas")
        .to_pandas()
    )
    bench = (
        np.unique(bench_tbl["h"].to_numpy(dtype=np.uint64))
        if "h" in bench_tbl.columns
        else np.empty(0, dtype=np.uint64)
    )
    ref = ray.put(bench)

    cnt_sch = pa.schema([
        ("source", pa.string()), ("n_docs", pa.int64()),
        ("n_contaminated", pa.int64()),
    ])

    def score(df: pd.DataFrame) -> pa.Table:
        grams = ray.get(ref)
        df = df[(df["doc_id"] % bench_mod) != 0]
        if len(df) == 0:
            return cnt_sch.empty_table()
        flags = np.zeros(len(df), dtype=np.int64)
        for i, t in enumerate(df["text"]):
            ws = _doc_window_hashes(t, ngram_n)
            if len(ws) and len(grams):
                idx = np.searchsorted(grams, ws)
                idx[idx == len(grams)] = 0
                flags[i] = int((grams[idx] == ws).any())
        g = pd.DataFrame({
            "source": df["source"], "n_docs": 1, "n_contaminated": flags,
        }).groupby("source", as_index=False).sum()
        return pa.Table.from_pandas(g, preserve_index=False).cast(cnt_sch)

    agg = bucketed_sum_combine(
        documents(sf_dir, columns=("doc_id", "source", "text"))
        .map_batches(score, batch_format="pandas"),
        keys=["source"], sum_cols=["n_docs", "n_contaminated"],
        schema=cnt_sch,
    )

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        df["contamination_rate"] = (
            df["n_contaminated"].astype("int64")
            / df["n_docs"].astype("int64")
        )
        return df[["source", "n_docs", "n_contaminated",
                   "contamination_rate"]]

    return agg.map_batches(finish, batch_format="pandas")
