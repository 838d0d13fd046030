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
import struct

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
    toks = [t.lower() for t in _TOKEN_RE.findall(text)]
    if len(toks) < k:
        grams = [" ".join(toks)] if toks else [""]
    else:
        grams = [" ".join(toks[i:i + k]) for i in range(len(toks) - k + 1)]
    out = np.fromiter(
        (
            struct.unpack("<Q", hashlib.md5(g.encode()).digest()[:8])[0]
            & ((1 << 61) - 1)
            for g in set(grams)
        ),
        dtype=np.uint64,
    )
    return out


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

def dedup_exact(sf_dir: str):
    """Hash-partition + per-group first: one surviving doc_id per distinct
    text. Shuffle key = md5(text)."""
    from ray.data.aggregate import Min

    def add_hash(batch: pa.Table) -> pa.Table:
        hs = [
            hashlib.md5(t.encode("utf-8")).hexdigest()
            for t in batch["text"].to_pylist()
        ]
        return pa.table({"doc_id": batch["doc_id"], "h": pa.array(hs, pa.string())})

    hashed = documents(sf_dir).map_batches(add_hash, batch_format="pyarrow")
    kept = hashed.groupby("h").aggregate(Min("doc_id", alias_name="doc_id"))
    return kept.select_columns(["doc_id"])


# ---------------------------------------------------------------------------
# MinHash + LSH near-dup
# ---------------------------------------------------------------------------

class MinHasher:
    """Actor stage: hash params held per actor; emits fixed-size signatures."""

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


def _explode_bands(batch: pa.Table) -> pa.Table:
    doc_ids = batch["doc_id"].to_pylist()
    sigs = batch["sig"].to_pylist()
    out_doc, out_band, out_hash = [], [], []
    for doc_id, sig in zip(doc_ids, sigs):
        for band in range(_N_HASHES // _BAND_SIZE):
            chunk = sig[band * _BAND_SIZE:(band + 1) * _BAND_SIZE]
            h = hashlib.md5(
                struct.pack(f"<{_BAND_SIZE}q", *chunk) + struct.pack("<i", band)
            ).hexdigest()[:16]
            out_doc.append(doc_id)
            out_band.append(band)
            out_hash.append(h)
    return pa.table(
        {
            "doc_id": pa.array(out_doc, pa.int64()),
            "band_id": pa.array(out_band, pa.int32()),
            "band_hash": pa.array(out_hash, pa.string()),
        }
    )


def minhash_candidates(sf_dir: str, concurrency: int = 2):
    """Candidate near-dup pairs via LSH banding. Output: (doc_a, doc_b)."""
    ds = documents(sf_dir).map_batches(
        MinHasher, batch_format="pyarrow", concurrency=concurrency, num_cpus=1
    )
    bands = ds.map_batches(_explode_bands, batch_format="pyarrow")

    def bucket_pairs(df: pd.DataFrame) -> pd.DataFrame:
        ids = sorted(df["doc_id"].unique().tolist())
        rows_a, rows_b = [], []
        # bucket sizes are tiny (docs sharing a band hash); cap pathological
        # buckets and log (no silent cap)
        if len(ids) > 200:
            print(f"[minhash] capping bucket of {len(ids)} docs at 200")
            ids = ids[:200]
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                rows_a.append(ids[i])
                rows_b.append(ids[j])
        return pd.DataFrame({"doc_a": rows_a, "doc_b": rows_b})

    pairs = bands.groupby(["band_id", "band_hash"]).map_groups(
        bucket_pairs, batch_format="pandas"
    )

    def dedup_pairs(df: pd.DataFrame) -> pd.DataFrame:
        return df.head(1)

    return pairs.groupby(["doc_a", "doc_b"]).map_groups(
        dedup_pairs, batch_format="pandas"
    )


def minhash_dedup(sf_dir: str, threshold: float = 0.5, concurrency: int = 2):
    """LSH candidates verified by true n-gram Jaccard >= threshold.

    Verification broadcasts the candidate doc texts: candidate sets are tiny
    relative to the corpus (only banding collisions), so we join them to text
    by broadcasting the needed texts, not by shuffling the corpus."""
    import ray

    cands = minhash_candidates(sf_dir, concurrency=concurrency).to_pandas()
    if len(cands) == 0:
        return pa.table(
            {"doc_a": pa.array([], pa.int64()), "doc_b": pa.array([], pa.int64())}
        )
    needed = set(cands["doc_a"]) | set(cands["doc_b"])
    texts = {}
    for batch in documents(sf_dir).iter_batches(
        batch_size=8192, batch_format="pyarrow"
    ):
        for d, t in zip(batch["doc_id"].to_pylist(), batch["text"].to_pylist()):
            if d in needed:
                texts[d] = t
    keep_a, keep_b = [], []
    for a, b in zip(cands["doc_a"], cands["doc_b"]):
        if jaccard(texts[int(a)], texts[int(b)]) >= threshold:
            keep_a.append(int(a))
            keep_b.append(int(b))
    return pa.table(
        {"doc_a": pa.array(keep_a, pa.int64()), "doc_b": pa.array(keep_b, pa.int64())}
    )


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

def simhash_signature(text: str) -> int:
    toks = [t.lower() for t in _TOKEN_RE.findall(text)]
    if not toks:
        return 0
    acc = np.zeros(64, dtype=np.int64)
    for t in set(toks):
        h = struct.unpack("<Q", hashlib.md5(t.encode()).digest()[:8])[0]
        bits = np.unpackbits(
            np.frombuffer(struct.pack("<Q", h), dtype=np.uint8)
        ).astype(np.int64)
        acc += bits * 2 - 1
    sig = np.packbits((acc > 0).astype(np.uint8))
    return struct.unpack("<Q", sig.tobytes())[0]


def simhash(sf_dir: str):
    def fn(batch: pa.Table) -> pa.Table:
        sigs = [
            format(simhash_signature(t), "016x") for t in batch["text"].to_pylist()
        ]
        return pa.table(
            {"doc_id": batch["doc_id"], "simhash": pa.array(sigs, pa.string())}
        )

    return documents(sf_dir).map_batches(fn, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Embedding-cosine near-dup
# ---------------------------------------------------------------------------

def embedding_neardup(sf_dir: str, threshold: float = 0.95):
    """Pairs of embeddings with cosine >= threshold. The comparison side is
    broadcast once (ray.put) and each batch does one numpy matmul against it —
    no O(n^2) shuffle. At 100 TB scale the broadcast side becomes the IVF
    centroid table from ann.ivf_index instead of the full matrix."""
    import ray
    import ray.data as rd

    emb = rd.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    all_tbl = emb.to_arrow_refs()
    tables = ray.get(all_tbl)
    full = pa.concat_tables(tables)
    ids = np.asarray(full["vec_id"].to_pylist(), dtype=np.int64)
    mat = np.asarray(full["embedding"].to_pylist(), dtype=np.float64)
    norms = np.linalg.norm(mat, axis=1)
    norms[norms == 0] = 1.0
    matn = mat / norms[:, None]
    ref = ray.put((ids, matn))

    def fn(batch: pa.Table) -> pa.Table:
        r_ids, r_mat = ray.get(ref)
        b_ids = np.asarray(batch["vec_id"].to_pylist(), dtype=np.int64)
        b_mat = np.asarray(batch["embedding"].to_pylist(), dtype=np.float64)
        bn = np.linalg.norm(b_mat, axis=1)
        bn[bn == 0] = 1.0
        b_mat = b_mat / bn[:, None]
        sims = b_mat @ r_mat.T
        ii, jj = np.nonzero(sims >= threshold)
        keep = b_ids[ii] < r_ids[jj]
        return pa.table(
            {
                "vec_a": pa.array(b_ids[ii][keep], pa.int64()),
                "vec_b": pa.array(r_ids[jj][keep], pa.int64()),
            }
        )

    return emb.map_batches(fn, batch_format="pyarrow", batch_size=1024)


# ---------------------------------------------------------------------------
# Near-dup clusters (connected components over verified pairs)
# ---------------------------------------------------------------------------

def dedup_clusters(sf_dir: str, threshold: float = 0.5, concurrency: int = 2):
    """Connected components over the verified near-dup pairs:
    (doc_id, cluster_id) with cluster_id = min doc_id of the component;
    singleton docs are omitted.

    The verified pair set is orders of magnitude smaller than the corpus
    (only banding collisions that passed Jaccard), so union-find runs on the
    driver. At 100 TB scale with huge components, swap in min-label
    propagation: iterate `labels = edges.join(labels).groupby(node).min()`
    until no label changes — each round is one shuffle over the edge list."""
    pairs = minhash_dedup(sf_dir, threshold=threshold, concurrency=concurrency)
    n_pairs = len(pairs)
    if n_pairs > 5_000_000:
        print(f"[dedup_clusters] {n_pairs} pairs exceeds the driver-side "
              "union-find budget; switch to distributed label propagation")
    parent: dict = {}

    def find(x: int) -> int:
        while parent.get(x, x) != x:
            parent[x] = parent.get(parent[x], parent[x])
            x = parent[x]
        return x

    def union(a: int, b: int) -> None:
        ra, rb = find(a), find(b)
        if ra != rb:
            if rb < ra:
                ra, rb = rb, ra
            parent[rb] = ra

    for a, b in zip(pairs["doc_a"].to_pylist(), pairs["doc_b"].to_pylist()):
        parent.setdefault(a, a)
        parent.setdefault(b, b)
        union(a, b)
    rows = sorted((doc, find(doc)) for doc in parent)
    return pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "cluster_id": pa.array([r[1] for r in rows], pa.int64()),
        }
    )


# ---------------------------------------------------------------------------
# n-gram Jaccard dedup (rolling-fingerprint blocking)
# ---------------------------------------------------------------------------

def ngram_jaccard_dedup(sf_dir: str, threshold: float = 0.5, window: int = 8):
    """Near-dup pairs via true n-gram Jaccard, blocked by the min rolling-hash
    fingerprint (shift-resistant): docs sharing a fingerprint bucket are
    compared pairwise. A distinct blocking strategy from MinHash banding —
    one shuffle on the fingerprint, pairwise verification inside buckets.
    Output: (doc_a, doc_b) with doc_a < doc_b."""
    from .text import rolling_fingerprint

    fps = rolling_fingerprint(sf_dir, window=window)
    texts_ds = documents(sf_dir)

    # join fingerprints back to text via the doc_id (both tiny projections);
    # bucket on the fingerprint and verify inside the bucket
    import ray.data as rd

    joined = fps.join(
        texts_ds, join_type="inner", num_partitions=8, on=("doc_id",)
    )

    def bucket_pairs(df: pd.DataFrame) -> pd.DataFrame:
        rows_a, rows_b = [], []
        if len(df) > 1:
            recs = sorted(
                zip(df["doc_id"].tolist(), df["text"].tolist())
            )
            if len(recs) > 200:
                print(f"[ngram_jaccard] capping bucket of {len(recs)} at 200")
                recs = recs[:200]
            for i in range(len(recs)):
                for j in range(i + 1, len(recs)):
                    if jaccard(recs[i][1], recs[j][1]) >= threshold:
                        rows_a.append(recs[i][0])
                        rows_b.append(recs[j][0])
        return pd.DataFrame(
            {"doc_a": pd.Series(rows_a, dtype="int64"),
             "doc_b": pd.Series(rows_b, dtype="int64")}
        )

    return joined.groupby("rolling_fp").map_groups(
        bucket_pairs, batch_format="pandas"
    )
