"""Similarity search over the ``embeddings`` table.

- brute-force cosine top-k: numpy matmul per batch against a broadcast query
  matrix (the baseline; SQL-checkable against DuckDB list_cosine_similarity)
- IVF index + query: a build step materializes the table as Parquet
  partitioned by nearest-centroid id (k-means-lite, deterministic seed);
  queries read ONLY their ``nprobe`` partition directories — the probe prunes
  actual I/O, which is what makes this the 100 TB scale path (centroids are
  the tiny persisted side).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def _embeddings(sf_dir: str):
    import ray.data as rd

    from .common import source_blocks

    path = f"{sf_dir}/embeddings.parquet"
    # data-bounded read fan-out (see common.source_blocks): Ray's default
    # cluster-first split anti-scales the small-query bench legs
    return rd.read_parquet(
        path, columns=["vec_id", "embedding"],
        override_num_blocks=source_blocks(path),
    )


from ..functions.vectorized import l2_normalize_rows as _normalize  # noqa: E402
from ..functions.vectorized import u64_sort_key  # noqa: E402


def query_vectors(sf_dir: str, query_ids=(0, 1, 2, 3)) -> tuple:
    """Deterministic query set: the embeddings of fixed vec_ids (lets the SQL
    oracle reference the same vectors without float literals)."""
    import pyarrow.parquet as pq
    import pyarrow.compute as pc

    tbl = pq.read_table(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    mask = pc.is_in(tbl["vec_id"], value_set=pa.array(list(query_ids)))
    sel = tbl.filter(mask)
    order = np.argsort(np.asarray(sel["vec_id"].to_pylist()))
    ids = np.asarray(sel["vec_id"].to_pylist(), dtype=np.int64)[order]
    mat = np.asarray(sel["embedding"].to_pylist(), dtype=np.float64)[order]
    return ids, mat


def brute_force_topk(sf_dir: str, k: int = 10, query_ids=(0, 1, 2, 3)):
    """Per-batch partial top-k (vectorized cosine against the broadcast query
    matrix) -> driver-side merge of the tiny partials. Output:
    (query_id, vec_id), the k nearest per query, ties broken by vec_id."""
    import ray

    q_ids, q_mat = query_vectors(sf_dir, query_ids)
    q_norm = _normalize(q_mat)
    ref = ray.put((q_ids, q_norm))

    def partial(batch: pa.Table) -> pa.Table:
        qi, qm = ray.get(ref)
        b_ids = np.asarray(batch["vec_id"].to_pylist(), dtype=np.int64)
        b_mat = _normalize(np.asarray(batch["embedding"].to_pylist(), dtype=np.float64))
        sims = qm @ b_mat.T  # (n_q, n_batch)
        out_q, out_v, out_s = [], [], []
        kk = min(k, sims.shape[1])
        for row, qid in enumerate(qi):
            # partial top-k inside the batch, deterministic tie-break by vec_id
            order = np.lexsort((b_ids, -sims[row]))[:kk]
            out_q.extend([qid] * len(order))
            out_v.extend(b_ids[order].tolist())
            out_s.extend(sims[row][order].tolist())
        return pa.table(
            {
                "query_id": pa.array(out_q, pa.int64()),
                "vec_id": pa.array(out_v, pa.int64()),
                "sim": pa.array(out_s, pa.float64()),
            }
        )

    partials = _embeddings(sf_dir).map_batches(
        partial, batch_format="pyarrow", batch_size=4096
    )

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["sim", "vec_id"], ascending=[False, True], kind="mergesort")
        return df.head(k)[["query_id", "vec_id"]]

    return partials.groupby("query_id").map_groups(merge, batch_format="pandas")


# ---------------------------------------------------------------------------
# IVF-bucketed variant (scale path)
# ---------------------------------------------------------------------------

def _kmeans_lite(mat: np.ndarray, n_clusters: int, seed: int = 42,
                 iters: int = 5) -> np.ndarray:
    rng = np.random.default_rng(seed)
    idx = rng.choice(len(mat), size=min(n_clusters, len(mat)), replace=False)
    centroids = mat[np.sort(idx)].copy()
    for _ in range(iters):
        assign = np.argmax(mat @ centroids.T, axis=1)
        for c in range(len(centroids)):
            members = mat[assign == c]
            if len(members):
                v = members.mean(axis=0)
                n = np.linalg.norm(v)
                if n > 0:
                    centroids[c] = v / n
    return centroids


_SAMPLE_MIX = np.uint64(0x9E3779B97F4A7C15)


def _sample_threshold(n_rows: int, sample_size: int) -> np.uint64:
    """Keep-probability threshold for the 32-bit scatter hash: the exact
    big-int ratio (sample/n_rows) * 2^32, floored at 1 so it never
    collapses to 0 — the old ((1 << 32) // n_rows) factor hit 0 above 2^32
    rows, which would empty the sample on the very tables the scatter
    exists for."""
    return np.uint64(max(
        1, (min(n_rows, max(1, sample_size)) << 32) // max(1, n_rows)
    ))


def _ivf_training_sample(sf_dir: str, sample_size: int) -> np.ndarray:
    """Deterministic SCATTERED sample for centroid training: keep a row when
    a multiply-mix hash of its vec_id lands under sample_size/n_rows — the
    sample draws from EVERY block of the table, not a prefix (a prefix is
    biased whenever the table is ordered, which at 100 TB it always is).
    Returns (vec_ids, L2-normalized dense matrix), ordered by vec_id."""
    import pyarrow.parquet as pq

    n_rows = pq.ParquetFile(
        f"{sf_dir}/embeddings.parquet"
    ).metadata.num_rows
    threshold = _sample_threshold(n_rows, sample_size)

    def keep(batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch["vec_id"].to_pylist(), dtype=np.uint64)
        with np.errstate(over="ignore"):
            h = (ids * _SAMPLE_MIX) >> np.uint64(32)
        return batch.filter(pa.array(h < threshold))

    df = (
        _embeddings(sf_dir)
        .map_batches(keep, batch_format="pyarrow")
        .to_pandas()
        .sort_values("vec_id", kind="mergesort")
    )
    mat = _normalize(np.asarray(df["embedding"].tolist(), dtype=np.float64))
    return df["vec_id"].to_numpy(np.int64), mat


def ivf_build(sf_dir: str, index_dir: str, n_clusters: int = 16,
              sample_size: int = 2048, seed: int = 42) -> str:
    """Build a materialized IVF index: centroids trained on a deterministic
    scattered sample, then the whole table rewritten as Parquet partitioned
    by the nearest-centroid id (one directory per centroid). Queries read
    ONLY their ``nprobe`` partition directories, so the probe prunes actual
    I/O — the 100 TB scale path. Centroids persist beside the partitions.

    Idempotent AND concurrency-safe: the build happens in a pid-suffixed tmp
    dir that is atomically renamed into place, so two concurrent builders
    never interleave writes; the loser discards its tmp dir. ``_SUCCESS``
    records every build parameter, and a finished index is reused only when
    the requested parameters match — otherwise it is rebuilt."""
    import json
    import os
    import shutil

    import ray

    params = {
        "n_clusters": int(n_clusters),
        "sample_size": int(sample_size),
        "seed": int(seed),
        # bump when the sampling math changes: a pre-threshold-fix cached
        # index must fail _valid() and rebuild, not be silently reused
        "sample": "scatter-v2",
    }

    def _valid(d: str) -> bool:
        s = os.path.join(d, "_SUCCESS")
        if not os.path.exists(s):
            return False
        try:
            with open(s) as f:
                return json.load(f) == params
        except (ValueError, OSError):
            return False

    if _valid(index_dir):
        return index_dir
    if os.path.isdir(index_dir):
        # stale params or a partial legacy build. NEVER rmtree in place —
        # a concurrent builder may have renamed a finished index in after
        # our _valid() read. Atomically CLAIM the dir first, inspect what
        # we actually grabbed, and put it back if it turned out valid.
        trash = f"{index_dir}.stale.{os.getpid()}"
        try:
            os.rename(index_dir, trash)
        except OSError:
            pass  # someone else claimed/replaced it; fall through
        else:
            if _valid(trash):
                try:
                    os.rename(trash, index_dir)
                    return index_dir
                except OSError:
                    pass  # another valid index appeared meanwhile
            shutil.rmtree(trash, ignore_errors=True)

    tmp_dir = f"{index_dir}.build.{os.getpid()}"
    if os.path.isdir(tmp_dir):
        shutil.rmtree(tmp_dir)
    os.makedirs(tmp_dir)
    _, train = _ivf_training_sample(sf_dir, sample_size)
    centroids = _kmeans_lite(train, n_clusters, seed=seed)
    np.save(os.path.join(tmp_dir, "_CENTROIDS.npy"), centroids)
    cents_ref = ray.put(centroids)

    def assign(batch: pa.Table) -> pa.Table:
        cents = ray.get(cents_ref)
        mat = _normalize(
            np.asarray(batch["embedding"].to_pylist(), dtype=np.float64)
        )
        cid = np.argmax(mat @ cents.T, axis=1).astype(np.int32)
        # centroid drives the hive partitioning (consumed into the dir name);
        # cid stays inside the files so pruned per-file reads keep the
        # assignment column
        batch = batch.append_column("centroid", pa.array(cid, pa.int32()))
        return batch.append_column("cid", pa.array(cid, pa.int32()))

    _embeddings(sf_dir).map_batches(
        assign, batch_format="pyarrow"
    ).write_parquet(tmp_dir, partition_cols=["centroid"])
    with open(os.path.join(tmp_dir, "_SUCCESS"), "w") as f:
        json.dump(params, f)
    try:
        os.rename(tmp_dir, index_dir)
    except OSError:
        # a concurrent builder won the rename race; keep theirs if valid
        shutil.rmtree(tmp_dir)
        if not _valid(index_dir):
            raise
    return index_dir


def _default_index_dir(sf_dir: str, n_clusters: int, sample_size: int) -> str:
    import hashlib
    import os

    import pyarrow.parquet as pq

    n_rows = pq.ParquetFile(f"{sf_dir}/embeddings.parquet").metadata.num_rows
    key = hashlib.md5(
        f"v2|{os.path.abspath(sf_dir)}|{n_rows}|{n_clusters}|{sample_size}".encode()
    ).hexdigest()[:16]
    return f"/tmp/rayld_ivf/{key}"


def ivf_probe_paths(index_dir: str, q_norm: np.ndarray, nprobe: int):
    """The partition directories the probe selects: union over queries of the
    nprobe nearest centroids. Returns (paths, probe_sets, centroids)."""
    import os

    centroids = np.load(os.path.join(index_dir, "_CENTROIDS.npy"))
    order = np.argsort(-(q_norm @ centroids.T), axis=1)[:, :nprobe]
    probe_sets = [set(row.tolist()) for row in order]
    import glob as _glob

    buckets = sorted(set().union(*probe_sets)) if probe_sets else []
    paths = []
    for b in buckets:
        pdir = os.path.join(index_dir, f"centroid={b}")
        if os.path.isdir(pdir):
            paths.extend(sorted(_glob.glob(os.path.join(pdir, "*.parquet"))))
    return paths, probe_sets, centroids


def ivf_topk(sf_dir: str, k: int = 10, query_ids=(0, 1, 2, 3),
             n_clusters: int = 16, nprobe: int = 4, sample_size: int = 2048,
             index_dir: str | None = None):
    """IVF query over the materialized centroid-partitioned index: read ONLY
    the union of each query's nprobe partition dirs (pruned at the read — at
    scale this skips (n_clusters - nprobe)/n_clusters of the bytes), then
    per-batch partial top-k filtered to each query's own probe set via the
    index's ``centroid`` column. Returns (query_id, vec_id) — approximate;
    tests compare recall vs brute force and assert the read is pruned."""
    import ray
    import ray.data as rd

    if index_dir is None:
        index_dir = _default_index_dir(sf_dir, n_clusters, sample_size)
    ivf_build(sf_dir, index_dir, n_clusters=n_clusters,
              sample_size=sample_size)
    q_ids, q_mat = query_vectors(sf_dir, query_ids)
    q_norm = _normalize(q_mat)
    paths, probe_sets, _ = ivf_probe_paths(index_dir, q_norm, nprobe)
    probe_by_qid = {int(qid): probe_sets[row] for row, qid in enumerate(q_ids)}
    ref = ray.put((q_ids, q_norm, probe_by_qid))

    ds = rd.read_parquet(paths, columns=["vec_id", "embedding", "cid"])

    def partial(batch: pa.Table) -> pa.Table:
        qi, qm, probes = ray.get(ref)
        b_ids = np.asarray(batch["vec_id"].to_pylist(), dtype=np.int64)
        b_mat = _normalize(np.asarray(batch["embedding"].to_pylist(), dtype=np.float64))
        assign = np.asarray(batch["cid"].to_pylist(), dtype=np.int64)
        out_q, out_v, out_s = [], [], []
        for row, qid in enumerate(qi):
            mask = np.isin(assign, list(probes[int(qid)]))
            if not mask.any():
                continue
            sims = qm[row] @ b_mat[mask].T
            ids = b_ids[mask]
            kk = min(k, len(ids))
            order = np.lexsort((ids, -sims))[:kk]
            out_q.extend([qid] * len(order))
            out_v.extend(ids[order].tolist())
            out_s.extend(sims[order].tolist())
        return pa.table(
            {
                "query_id": pa.array(out_q, pa.int64()),
                "vec_id": pa.array(out_v, pa.int64()),
                "sim": pa.array(out_s, pa.float64()),
            }
        )

    partials = ds.map_batches(partial, batch_format="pyarrow", batch_size=4096)

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["sim", "vec_id"], ascending=[False, True], kind="mergesort")
        return df.head(k)[["query_id", "vec_id"]]

    return partials.groupby("query_id").map_groups(merge, batch_format="pandas")


def ivf_recall(sf_dir: str, k: int = 10, query_ids=(0, 1, 2, 3),
               n_clusters: int = 16, nprobe: int = 12,
               min_recall: float = 0.85):
    """Typed IVF quality gate: per query, recall of the IVF top-k against the
    exact brute-force top-k, emitted as ``recall_ok`` (1 when recall >=
    min_recall). The driver hash-checks this against a constant-1 SQL oracle
    — the same structural-oracle pattern as the jsonld roundtrip flags — so
    an IVF regression (bad centroids, broken pruning) fails the correctness
    gate instead of passing rows-only."""
    brute = brute_force_topk(sf_dir, k=k, query_ids=query_ids).to_pandas()
    approx = ivf_topk(
        sf_dir, k=k, query_ids=query_ids, n_clusters=n_clusters, nprobe=nprobe
    ).to_pandas()
    qids, oks = [], []
    for qid in sorted(set(brute["query_id"])):
        b = set(brute[brute["query_id"] == qid]["vec_id"])
        i = set(approx[approx["query_id"] == qid]["vec_id"])
        recall = len(b & i) / max(1, len(b))
        qids.append(int(qid))
        oks.append(1 if recall >= min_recall else 0)
    return pd.DataFrame(
        {"query_id": pd.Series(qids, dtype="int64"),
         "recall_ok": pd.Series(oks, dtype="int64")}
    )


# ---------------------------------------------------------------------------
# Per-label centroids (distributed vector aggregate)
# ---------------------------------------------------------------------------

def label_centroids(sf_dir: str):
    """Per-label mean embedding as a distributed VECTOR aggregate: each batch
    reduces to (label, dim, partial_sum, partial_n) rows (10 labels x 64 dims
    regardless of batch size), a tiny (label, dim) groupby sums the partials,
    and the mean is finished with half-up 6dp rounding so the float matches
    the SQL oracle bit-for-bit. The classic pre-aggregate-before-shuffle
    shape for training-set class prototypes / cluster seeding."""
    import ray.data as rd

    ds = rd.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["label", "embedding"]
    )

    def partial(batch: pa.Table) -> pa.Table:
        labels = np.asarray(batch["label"].to_pylist(), dtype=np.int64)
        mat = np.asarray(batch["embedding"].to_pylist(), dtype=np.float64)
        dim = mat.shape[1]  # from the data — a parameter could disagree
        out_label, out_dim, out_s, out_n = [], [], [], []
        for lab in np.unique(labels):
            sel = mat[labels == lab]
            out_label.extend([int(lab)] * dim)
            out_dim.extend(range(dim))
            out_s.extend(sel.sum(axis=0).tolist())
            out_n.extend([len(sel)] * dim)
        return pa.table(
            {
                "label": pa.array(out_label, pa.int64()),
                "dim": pa.array(out_dim, pa.int64()),
                "s": pa.array(out_s, pa.float64()),
                "n": pa.array(out_n, pa.int64()),
            }
        )

    partials = ds.map_batches(partial, batch_format="pyarrow")
    # labels x dims is bounded (hundreds of rows) -> the bucketed combine;
    # float partial sums merge in a different order than Ray's aggregate
    # would use, both far inside the 6dp half-up rounding
    from .common import bucketed_sum_combine

    agg = bucketed_sum_combine(
        partials,
        keys=["label", "dim"],
        sum_cols=["s", "n"],
        schema=pa.schema(
            [("label", pa.int64()), ("dim", pa.int64()),
             ("s", pa.float64()), ("n", pa.int64())]
        ),
    )

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        mean = df["s"] / df["n"]
        return pd.DataFrame(
            {
                "label": df["label"].astype("int64"),
                "dim": df["dim"].astype("int64"),
                "mean_val": np.floor(mean * 1e6 + 0.5) / 1e6,
            }
        )

    return agg.map_batches(finish, batch_format="pandas")


def knn_label_vote(sf_dir: str, k: int = 10, query_ids=(0, 1, 2, 3)):
    """kNN classification vote: majority label of each query's k nearest
    neighbors (ties -> min label). The neighbor search is the distributed
    brute-force top-k; the vote runs over the tiny (n_queries x k) result —
    labels for just those ids come from a pruned filtered read, never the
    full label column."""
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    top = brute_force_topk(sf_dir, k=k, query_ids=query_ids).to_pandas()
    ids = sorted(set(top["vec_id"].tolist()))
    lab_tbl = pq.read_table(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "label"],
        filters=[("vec_id", "in", ids)],
    )
    lab = dict(zip(lab_tbl["vec_id"].to_pylist(), lab_tbl["label"].to_pylist()))
    top["label"] = top["vec_id"].map(lab)
    votes = top.groupby(["query_id", "label"], as_index=False).size()
    votes = votes.sort_values(
        ["query_id", "size", "label"], ascending=[True, False, True],
        kind="mergesort",
    )
    best = votes.groupby("query_id", as_index=False).first()
    return pd.DataFrame(
        {"query_id": best["query_id"].astype("int64"),
         "knn_label": best["label"].astype("int64")}
    )


def embedding_quantize(sf_dir: str):
    """Per-vector int8-style quantization summary (the vector-index
    compression step): min, max, scale = (max-min)/255 and the quantized
    code checksum. Embarrassingly parallel, fully vectorized per batch; the
    float32 payload promotes exactly to float64, so every arithmetic step is
    one identical IEEE op on both oracle sides (codes are exact integers —
    their sum is order-independent)."""

    def fn(batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch["vec_id"].to_pylist(), dtype=np.int64)
        mat = np.asarray(batch["embedding"].to_pylist(), dtype=np.float64)
        if mat.size == 0:
            mn = mx = np.zeros(0, np.float64)
            code_sum = np.zeros(0, np.int64)
        else:
            mn = mat.min(axis=1)
            mx = mat.max(axis=1)
            rng = mx - mn
            safe = np.where(rng == 0, 1.0, rng)
            codes = np.floor(
                (mat - mn[:, None]) / safe[:, None] * 255 + 0.5
            )
            code_sum = np.where(
                rng == 0, 0, codes.sum(axis=1)
            ).astype(np.int64)
        r6 = lambda x: np.floor(x * 1e6 + 0.5) / 1e6  # noqa: E731
        return pa.table(
            {
                "vec_id": pa.array(ids, pa.int64()),
                "vmin": pa.array(r6(mn), pa.float64()),
                "vmax": pa.array(r6(mx), pa.float64()),
                "scale": pa.array(r6((mx - mn) / 255.0), pa.float64()),
                "code_sum": pa.array(code_sum, pa.int64()),
            }
        )

    import ray.data as rd

    ds = rd.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    return ds.map_batches(fn, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# distributed Lloyd's k-means (iterative training loop)
# ---------------------------------------------------------------------------

def _kmeans_seeds(sf_dir: str, n_clusters: int) -> np.ndarray:
    """Seedless scattered init: the embeddings of the n_clusters vec_ids
    with smallest multiply-mixed hash — deterministic, order-free, and
    unbiased by file layout (the ivf prefix-sample lesson). One vectorized
    per-batch local top-k partial -> tiny global merge (the per-row
    md5-hexdigest loop this replaces was the CLAUDE.md 2-5x digest tax,
    and shipped 32-char string sort keys for no reason)."""

    def partial(batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch["vec_id"].to_pylist(), dtype=np.uint64)
        with np.errstate(over="ignore"):
            h = ids * _SAMPLE_MIX
            h ^= h >> np.uint64(29)
            h *= np.uint64(0xBF58476D1CE4E5B9)
            h ^= h >> np.uint64(32)
        k = min(n_clusters, len(ids))
        order = np.argsort(h, kind="stable")[:k]
        key = u64_sort_key(h[order])
        return pa.table({
            "mixkey": pa.array(key),
            "vec_id": pa.array(ids[order].view(np.int64)),
            "embedding": pa.array(
                [batch["embedding"][int(i)].as_py() for i in order]
            ),
        })

    top = (
        _embeddings(sf_dir)
        .map_batches(partial, batch_format="pyarrow")
        .sort("mixkey")
        .limit(n_clusters)
        .to_pandas()
    )
    return np.stack(
        [np.asarray(e, dtype=np.float64) for e in top["embedding"]]
    )


def _assign_clusters(X: np.ndarray, cents: np.ndarray) -> np.ndarray:
    """Argmin over per-cluster elementwise distances. Deliberately NOT a
    matmul: dgemm's blocking changes dot-product summation order with the
    row count, so batch-shaped and corpus-shaped evaluations could disagree
    in the last ulp and flip near-ties; the elementwise form reduces along
    the fixed dim axis only, so every row scores identically regardless of
    batch shape (the parity gate depends on this)."""
    d2 = np.empty((len(X), len(cents)))
    for j, c in enumerate(cents):
        d2[:, j] = ((X - c) ** 2).sum(axis=1)
    return d2.argmin(axis=1)


def kmeans_train(sf_dir: str, n_clusters: int = 8, n_iter: int = 5,
                 num_partitions: int | None = None) -> pd.DataFrame:
    """Distributed Lloyd's k-means over the embeddings table. Per iteration:
    centroids broadcast via ray.put; each batch assigns vectors and
    pre-aggregates (cluster, dim, partial-sum) + counts — k x (dim+1) rows
    per block, never the vectors; ONE bounded-key bucketed exchange folds
    the partials with a SORTED in-task sum (order-free floats, CLAUDE.md
    determinism contract); the driver holds only the k x dim centroid
    matrix. Empty clusters keep their previous centroid.

    Output (long form): (cluster, dim_idx, value, n_points)."""
    import zlib

    import ray

    from .common import cluster_partitions

    if num_partitions is None:
        num_partitions = cluster_partitions(minimum=8)
    cents = _kmeans_seeds(sf_dir, n_clusters)
    dim = cents.shape[1]
    ds = _embeddings(sf_dir).materialize()  # reused every iteration

    _part_schema = pa.schema([
        ("cluster", pa.int64()), ("dim_idx", pa.int64()),
        ("val", pa.float64()), ("part", pa.int32()),
    ])

    def combine(df: pd.DataFrame) -> pa.Table:
        sch = pa.schema([
            ("cluster", pa.int64()), ("dim_idx", pa.int64()),
            ("val", pa.float64()),
        ])
        if len(df) == 0:
            return sch.empty_table()
        df = df.sort_values(["cluster", "dim_idx", "val"], kind="mergesort")
        g = df.groupby(["cluster", "dim_idx"], as_index=False)["val"].sum()
        return pa.Table.from_pandas(
            g, preserve_index=False
        ).select(sch.names).cast(sch)

    counts = np.zeros(n_clusters, dtype=np.int64)
    for _ in range(n_iter):
        ref = ray.put(cents)

        def partials(batch: pa.Table, _k=n_clusters, _d=dim) -> pa.Table:
            C = ray.get(ref)
            X = np.stack([
                np.asarray(e, dtype=np.float64)
                for e in batch["embedding"].to_pylist()
            ]) if batch.num_rows else np.zeros((0, _d))
            a = _assign_clusters(X, C)
            sums = np.zeros((_k, _d))
            np.add.at(sums, a, X)
            n = np.bincount(a, minlength=_k).astype(np.float64)
            # long form: dim_idx -1 carries the count
            cl = np.repeat(np.arange(_k, dtype=np.int64), _d + 1)
            di = np.tile(
                np.concatenate([[-1], np.arange(_d, dtype=np.int64)]), _k
            )
            val = np.concatenate(
                [np.concatenate([[n[j]], sums[j]]) for j in range(_k)]
            )
            keep = val != 0.0  # sparse blocks ship only touched cells
            cl, di, val = cl[keep], di[keep], val[keep]
            parts = np.fromiter(
                (zlib.crc32(f"{c}:{d}".encode()) % num_partitions
                 for c, d in zip(cl, di)),
                dtype=np.int32, count=len(cl),
            )
            return pa.table({
                "cluster": pa.array(cl), "dim_idx": pa.array(di),
                "val": pa.array(val), "part": pa.array(parts, pa.int32()),
            }, schema=_part_schema)

        folded = (
            ds.map_batches(partials, batch_format="pyarrow")
            .groupby("part")
            .map_groups(combine, batch_format="pandas")
            .to_pandas()
        )
        counts = np.zeros(n_clusters, dtype=np.int64)
        new = cents.copy()  # empty clusters keep their centroid
        if len(folded):
            cnt = folded[folded["dim_idx"] == -1]
            counts[cnt["cluster"].to_numpy(np.int64)] = (
                cnt["val"].to_numpy(np.float64).astype(np.int64)
            )
            sums = folded[folded["dim_idx"] >= 0]
            nonzero = counts > 0
            mat = np.zeros((n_clusters, dim))
            mat[sums["cluster"].to_numpy(np.int64),
                sums["dim_idx"].to_numpy(np.int64)] = (
                sums["val"].to_numpy(np.float64)
            )
            new[nonzero] = mat[nonzero] / counts[nonzero, None]
        cents = new

    rows = []
    for j in range(n_clusters):
        for d_i in range(dim):
            rows.append((j, d_i, cents[j, d_i], int(counts[j])))
    return pd.DataFrame(
        rows, columns=["cluster", "dim_idx", "value", "n_points"]
    )


def kmeans_reference(X: np.ndarray, seeds: np.ndarray,
                     n_iter: int = 5) -> tuple:
    """Single-process Lloyd's with the identical assignment formula (the
    parity oracle)."""
    cents = seeds.copy()
    k = len(seeds)
    counts = np.zeros(k, dtype=np.int64)
    for _ in range(n_iter):
        a = _assign_clusters(X, cents)
        counts = np.bincount(a, minlength=k)
        new = cents.copy()
        for j in range(k):
            if counts[j]:
                # sum/count with one division, like the distributed fold
                new[j] = X[a == j].sum(axis=0) / counts[j]
        cents = new
    return cents, counts


def kmeans_check(sf_dir: str, n_clusters: int = 8,
                 n_iter: int = 5) -> pd.DataFrame:
    """Gate: distributed k-means == single-process Lloyd's from the same
    seedless init (spot-check harness; the driver holds the sf-scale
    matrix only here, never in the training path)."""
    got = kmeans_train(sf_dir, n_clusters=n_clusters, n_iter=n_iter)
    import pyarrow.parquet as pq

    tbl = pq.read_table(f"{sf_dir}/embeddings.parquet",
                        columns=["vec_id", "embedding"]).to_pandas()
    tbl = tbl.sort_values("vec_id")
    X = np.stack([np.asarray(e, dtype=np.float64)
                  for e in tbl["embedding"]])
    seeds = _kmeans_seeds(sf_dir, n_clusters)
    want_c, want_n = kmeans_reference(X, seeds, n_iter=n_iter)
    k, dim = want_c.shape
    got_c = np.zeros((k, dim))
    got_c[got["cluster"].to_numpy(np.int64),
          got["dim_idx"].to_numpy(np.int64)] = got["value"].to_numpy()
    got_n = np.zeros(k, dtype=np.int64)
    got_n[got.drop_duplicates("cluster")["cluster"].to_numpy(np.int64)] = (
        got.drop_duplicates("cluster")["n_points"].to_numpy(np.int64)
    )
    return pd.DataFrame({
        "parity_ok": [int(np.abs(got_c - want_c).max() < 1e-9)],
        "counts_ok": [int((got_n == want_n).all())],
        "all_points_assigned": [int(got_n.sum() == len(X))],
    })


# ---------------------------------------------------------------------------
# Distributed logistic regression (full-batch GD, bounded exchange/iter)
# ---------------------------------------------------------------------------


def logreg_train(sf_dir: str, n_iter: int = 5, lr: float = 1.0,
                 num_partitions: int | None = None) -> pd.DataFrame:
    """Distributed binary logistic regression over the embeddings table
    (y = label < 5), full-batch gradient descent — the iterative-training
    shape next to ``kmeans_train``. Per iteration: weights broadcast via
    ray.put; each batch computes sigmoid scores and pre-aggregates ONE
    gradient partial per dimension plus bias/loss/count cells — dim+3
    rows per block, never the vectors; the bounded-key bucketed exchange
    folds partials with a SORTED in-task sum (order-free floats, the
    kmeans determinism contract); the driver holds only the (dim+1)
    weight vector. Deterministic: zero init, fixed lr, fixed iterations,
    no sampling.

    Output (long form): dim_idx -1 = bias, else the weight per embedding
    dimension; final_loss and n_rows repeated per row for the gate."""
    import zlib

    import ray
    import ray.data as rd

    from .common import cluster_partitions

    if num_partitions is None:
        num_partitions = cluster_partitions(minimum=8)

    ds = rd.read_parquet(
        f"{sf_dir}/embeddings.parquet",
        columns=["embedding", "label"],
    ).materialize()  # reused every iteration
    dim = len(ds.take(1)[0]["embedding"])

    _part_schema = pa.schema([
        ("dim_idx", pa.int64()), ("val", pa.float64()), ("part", pa.int32()),
    ])
    _fold_schema = pa.schema([("dim_idx", pa.int64()), ("val", pa.float64())])

    def combine(df: pd.DataFrame) -> pa.Table:
        if len(df) == 0:
            return _fold_schema.empty_table()
        df = df.sort_values(["dim_idx", "val"], kind="mergesort")
        g = df.groupby("dim_idx", as_index=False)["val"].sum()
        return pa.Table.from_pandas(
            g, preserve_index=False
        ).select(_fold_schema.names).cast(_fold_schema)

    w = np.zeros(dim)
    bias = 0.0
    loss = float("nan")
    n_rows = 0
    for _ in range(n_iter):
        ref = ray.put((w, bias))

        def partials(batch: pa.Table, _d=dim) -> pa.Table:
            W, B = ray.get(ref)
            X = np.stack([
                np.asarray(e, dtype=np.float64)
                for e in batch["embedding"].to_pylist()
            ]) if batch.num_rows else np.zeros((0, _d))
            y = (np.asarray(
                batch["label"].to_pylist(), dtype=np.int64
            ) < 5).astype(np.float64)
            z = X @ W + B
            p = 1.0 / (1.0 + np.exp(-z))
            r = p - y
            # log-loss via the stable log(1+e^-|z|) + max(z,0) - z*y form
            ll = np.log1p(np.exp(-np.abs(z))) + np.maximum(z, 0.0) - z * y
            di = np.concatenate([
                np.arange(_d, dtype=np.int64), [-1, -2, -3]
            ])
            val = np.concatenate([X.T @ r, [r.sum(), ll.sum(), float(len(y))]])
            parts = np.fromiter(
                (zlib.crc32(str(d).encode()) % num_partitions for d in di),
                dtype=np.int32, count=len(di),
            )
            return pa.table({
                "dim_idx": pa.array(di), "val": pa.array(val),
                "part": pa.array(parts, pa.int32()),
            }, schema=_part_schema)

        folded = (
            ds.map_batches(partials, batch_format="pyarrow")
            .groupby("part")
            .map_groups(combine, batch_format="pandas")
            .to_pandas()
        )
        cells = dict(zip(folded["dim_idx"].to_numpy(np.int64),
                         folded["val"].to_numpy(np.float64)))
        n_rows = int(cells.pop(-3))
        loss = cells.pop(-2) / n_rows
        gb = cells.pop(-1)
        g = np.zeros(dim)
        idx = folded["dim_idx"].to_numpy(np.int64)
        keep = idx >= 0
        g[idx[keep]] = folded["val"].to_numpy(np.float64)[keep]
        w = w - lr * g / n_rows
        bias = bias - lr * gb / n_rows

    return pd.DataFrame({
        "dim_idx": np.concatenate([[-1], np.arange(dim, dtype=np.int64)]),
        "weight": np.concatenate([[bias], w]),
        "final_loss": np.full(dim + 1, loss),
        "n_rows": np.full(dim + 1, n_rows, dtype=np.int64),
    })


def logreg_reference(X: np.ndarray, y: np.ndarray, n_iter: int = 5,
                     lr: float = 1.0) -> tuple:
    """Single-process GD with the identical update formula (the parity
    oracle). Returns (w, bias, final mean loss)."""
    w = np.zeros(X.shape[1])
    bias = 0.0
    loss = float("nan")
    for _ in range(n_iter):
        z = X @ w + bias
        p = 1.0 / (1.0 + np.exp(-z))
        r = p - y
        loss = float(
            (np.log1p(np.exp(-np.abs(z))) + np.maximum(z, 0.0) - z * y).sum()
            / len(y)
        )
        w = w - lr * (X.T @ r) / len(y)
        bias = bias - lr * r.sum() / len(y)
    return w, bias, loss


def logreg_check(sf_dir: str, n_iter: int = 5, lr: float = 1.0):
    """Gate: distributed GD == single-process GD from the same zero init
    (weights within 1e-8 after n_iter full-batch steps), the final loss
    improved on the w=0 loss (ln 2), and every row was counted."""
    import pyarrow.parquet as pq

    got = logreg_train(sf_dir, n_iter=n_iter, lr=lr)
    tbl = pq.read_table(f"{sf_dir}/embeddings.parquet",
                        columns=["vec_id", "embedding", "label"]).to_pandas()
    tbl = tbl.sort_values("vec_id")
    X = np.stack([np.asarray(e, dtype=np.float64) for e in tbl["embedding"]])
    y = (tbl["label"].to_numpy(np.int64) < 5).astype(np.float64)
    want_w, want_b, want_loss = logreg_reference(X, y, n_iter=n_iter, lr=lr)
    got = got.sort_values("dim_idx")
    got_b = got.loc[got["dim_idx"] == -1, "weight"].iloc[0]
    got_w = got.loc[got["dim_idx"] >= 0, "weight"].to_numpy()
    err = max(abs(got_b - want_b), float(np.abs(got_w - want_w).max()))
    return pd.DataFrame({
        "parity_ok": [int(err < 1e-8)],
        "loss_improved": [int(got["final_loss"].iloc[0] < np.log(2.0))],
        "all_rows_counted": [int(got["n_rows"].iloc[0] == len(X))],
    })


def hard_negatives(sf_dir: str, k: int = 5, query_ids=(0, 1, 2, 3)):
    """Hard-negative mining — for each query vector, the k most similar
    embeddings with a DIFFERENT label (the contrastive-training batch
    builder). Same plan as ``brute_force_topk``: broadcast query matrix +
    labels, per-batch vectorized cosine with a per-query label mask and
    partial top-k, tiny per-query merge. Output: (query_id, vec_id)."""
    import pyarrow.compute as pc
    import pyarrow.parquet as pq
    import ray

    q_ids, q_mat = query_vectors(sf_dir, query_ids)
    lbl_tbl = pq.read_table(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "label"]
    )
    sel = lbl_tbl.filter(
        pc.is_in(lbl_tbl["vec_id"], value_set=pa.array(list(query_ids)))
    ).to_pandas().set_index("vec_id")["label"]
    q_labels = sel.reindex(q_ids).to_numpy(np.int64)
    ref = ray.put((q_ids, _normalize(q_mat), q_labels))

    def partial(batch: pa.Table) -> pa.Table:
        qi, qm, ql = ray.get(ref)
        b_ids = np.asarray(batch["vec_id"].to_pylist(), dtype=np.int64)
        b_lbl = np.asarray(batch["label"].to_pylist(), dtype=np.int64)
        b_mat = _normalize(
            np.asarray(batch["embedding"].to_pylist(), dtype=np.float64)
        )
        sims = qm @ b_mat.T
        out_q, out_v, out_s = [], [], []
        for row, qid in enumerate(qi):
            valid = b_lbl != ql[row]
            if not valid.any():
                continue
            ids_v = b_ids[valid]
            sims_v = sims[row][valid]
            kk = min(k, len(ids_v))
            order = np.lexsort((ids_v, -sims_v))[:kk]
            out_q.extend([qid] * len(order))
            out_v.extend(ids_v[order].tolist())
            out_s.extend(sims_v[order].tolist())
        return pa.table({
            "query_id": pa.array(out_q, pa.int64()),
            "vec_id": pa.array(out_v, pa.int64()),
            "sim": pa.array(out_s, pa.float64()),
        })

    import ray.data as rd

    ds = rd.read_parquet(
        f"{sf_dir}/embeddings.parquet",
        columns=["vec_id", "embedding", "label"],
    )
    partials = ds.map_batches(partial, batch_format="pyarrow",
                              batch_size=4096)

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["sim", "vec_id"], ascending=[False, True],
                            kind="mergesort")
        return df.head(k)[["query_id", "vec_id"]]

    return partials.groupby("query_id").map_groups(
        merge, batch_format="pandas"
    )


# ---------------------------------------------------------------------------
# Product quantization (PQ) ANN: ADC code scan + exact shortlist re-rank
# ---------------------------------------------------------------------------


def _pq_train(sf_dir: str, m_sub: int, n_centroids: int,
              sample_size: int = 2048) -> np.ndarray:
    """Per-subspace PQ codebooks trained on the hash-scattered sample (the
    ivf sampling contract — never a biased prefix). Returns
    (m_sub, n_centroids, dim/m_sub) float64."""
    _, mat = _ivf_training_sample(sf_dir, sample_size)
    dim = mat.shape[1]
    assert dim % m_sub == 0, (dim, m_sub)
    sub = dim // m_sub
    books = np.empty((m_sub, n_centroids, sub))
    for s in range(m_sub):
        block = np.ascontiguousarray(mat[:, s * sub:(s + 1) * sub])
        # _kmeans_lite expects normalized rows for its dot-product assign;
        # PQ subspaces need EUCLIDEAN kmeans — run Lloyd's directly
        rng_idx = np.argsort(
            (np.arange(len(block), dtype=np.uint64) * _SAMPLE_MIX)
            >> np.uint64(32), kind="stable"
        )[:n_centroids]
        cents = block[rng_idx].copy()
        for _ in range(8):
            d2 = (
                (block ** 2).sum(1)[:, None]
                - 2.0 * block @ cents.T
                + (cents ** 2).sum(1)[None, :]
            )
            assign = np.argmin(d2, axis=1)
            for c in range(n_centroids):
                mem = block[assign == c]
                if len(mem):
                    cents[c] = mem.mean(axis=0)
        books[s] = cents
    return books


def pq_topk(sf_dir: str, k: int = 10, query_ids=(0, 1, 2, 3),
            m_sub: int = 16, n_centroids: int = 64,
            shortlist_factor: int = 16):
    # n_centroids=64 (6-bit codes): the sf0.1 gate showed 16 centroids per
    # subspace lose top-k members past the fixed shortlist once the corpus
    # outgrows it (min recall 0.80 at 2000 vecs vs 1.00 at 64 cents, both
    # scales) — quantization fidelity, not shortlist size, is the scale
    # knob that doesn't grow with the corpus. Codes stay one uint8 per
    # subspace up to 256 centroids.
    """Two-stage PQ retrieval — the memory-bound scale path (a 64-dim
    float vector becomes ``m_sub`` uint8 codes, a 32x shrink, so the code
    table for a corpus 32x too big for RAM still scans in memory):

      1. ADC scan: per query, a (m_sub x n_centroids) lookup table of
         subspace distances to the codebooks; every batch encodes its
         vectors once (argmin over codebooks) and approximates distances
         by LUT gather + sum — pure numpy fancy indexing, no per-row
         loop; per-batch partial SHORTLIST of ``shortlist_factor * k``;
      2. exact re-rank: the tiny merged shortlist's true cosine
         similarities (one pruned filtered read) pick the final top-k —
         PQ error costs recall inside the shortlist, never wrong order
         of the final ranks it did keep.

    Output: (query_id, vec_id), ties by vec_id — same contract as
    ``brute_force_topk``."""
    import pyarrow.compute as pc
    import pyarrow.parquet as pq
    import ray
    import ray.data as rd

    books = _pq_train(sf_dir, m_sub, n_centroids)
    q_ids, q_mat = query_vectors(sf_dir, query_ids)
    qn = _normalize(q_mat)
    dim = qn.shape[1]
    sub = dim // m_sub
    # LUT[q, s, c] = squared distance from q's subvector s to codebook c
    lut = np.empty((len(q_ids), m_sub, n_centroids))
    for s in range(m_sub):
        qb = qn[:, s * sub:(s + 1) * sub]
        lut[:, s, :] = (
            (qb ** 2).sum(1)[:, None]
            - 2.0 * qb @ books[s].T
            + (books[s] ** 2).sum(1)[None, :]
        )
    ref = ray.put((q_ids, books, lut))
    n_short = shortlist_factor * k

    def adc_partial(batch: pa.Table) -> pa.Table:
        qi, bks, tables = ray.get(ref)
        b_ids = np.asarray(batch["vec_id"].to_pylist(), dtype=np.int64)
        b_mat = _normalize(
            np.asarray(batch["embedding"].to_pylist(), dtype=np.float64)
        )
        n = len(b_ids)
        codes = np.empty((n, m_sub), dtype=np.int64)
        for s in range(m_sub):
            blk = b_mat[:, s * sub:(s + 1) * sub]
            d2 = (
                (blk ** 2).sum(1)[:, None]
                - 2.0 * blk @ bks[s].T
                + (bks[s] ** 2).sum(1)[None, :]
            )
            codes[:, s] = np.argmin(d2, axis=1)
        out_q, out_v, out_d = [], [], []
        kk = min(n_short, n)
        for row, qid in enumerate(qi):
            # gather: approx dist = sum over subspaces of LUT[s, code]
            approx = tables[row][np.arange(m_sub)[None, :], codes].sum(1)
            order = np.lexsort((b_ids, approx))[:kk]
            out_q.extend([qid] * len(order))
            out_v.extend(b_ids[order].tolist())
            out_d.extend(approx[order].tolist())
        return pa.table({
            "query_id": pa.array(out_q, pa.int64()),
            "vec_id": pa.array(out_v, pa.int64()),
            "adist": pa.array(out_d, pa.float64()),
        })

    partials = _embeddings(sf_dir).map_batches(
        adc_partial, batch_format="pyarrow", batch_size=4096
    )

    def shortlist(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["adist", "vec_id"], kind="mergesort")
        return df.head(n_short)[["query_id", "vec_id"]]

    short = partials.groupby("query_id").map_groups(
        shortlist, batch_format="pandas"
    ).to_pandas()

    # exact re-rank of the tiny shortlist (one filtered read)
    cand_ids = sorted(set(short["vec_id"]))
    tbl = pq.read_table(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    tbl = tbl.filter(pc.is_in(tbl["vec_id"], value_set=pa.array(cand_ids)))
    c_ids = np.asarray(tbl["vec_id"].to_pylist(), dtype=np.int64)
    c_mat = _normalize(np.asarray(tbl["embedding"].to_pylist(),
                                  dtype=np.float64))
    pos = {v: i for i, v in enumerate(c_ids)}
    rows = []
    for row, qid in enumerate(q_ids):
        mine = short[short["query_id"] == qid]["vec_id"].to_numpy(np.int64)
        idx = np.asarray([pos[v] for v in mine], dtype=np.int64)
        sims = c_mat[idx] @ qn[row]
        order = np.lexsort((mine, -sims))[:k]
        rows.extend((int(qid), int(v)) for v in mine[order])
    return pd.DataFrame(rows, columns=["query_id", "vec_id"])


def pq_recall_check(sf_dir: str, k: int = 10) -> pd.DataFrame:
    """Gate: PQ shortlist + exact re-rank recovers >= 90% of the exact
    brute-force top-k on the synthetic corpus (flag row, sf-independent)."""
    exact = brute_force_topk(sf_dir, k=k).to_pandas()
    approx = pq_topk(sf_dir, k=k)
    recalls = []
    for qid in exact["query_id"].unique():
        e = set(exact[exact["query_id"] == qid]["vec_id"])
        a = set(approx[approx["query_id"] == qid]["vec_id"])
        recalls.append(len(e & a) / max(1, len(e)))
    return pd.DataFrame({
        "recall_ge_090": [int(min(recalls) >= 0.9)],
        "rows_per_query_ok": [
            int((approx.groupby("query_id").size() == k).all())
        ],
    })


# ---------------------------------------------------------------------------
# Distributed PCA (moment partials -> driver eigh -> distributed projection)
# ---------------------------------------------------------------------------


def _pca_moments(sf_dir: str):
    """One pass over embeddings reducing every block to a FIXED-SIZE moment
    partial (n, sum vector, X^T X Gram matrix — 1 + d + d*d doubles, ~33 KB
    at d=64 regardless of block row count). The driver merges the <= #blocks
    partials in sorted min-vec_id order so the float reduction is
    DETERMINISTIC across runs (Ray block arrival order is not)."""
    import ray.data as rd

    ds = rd.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )

    def partial(t: pa.Table) -> pa.Table:
        X = np.stack(
            [np.asarray(e, dtype=np.float64) for e in t["embedding"].to_pylist()]
        )
        return pa.table({
            "key": pa.array([int(min(t["vec_id"].to_pylist()))], pa.int64()),
            "n": pa.array([len(X)], pa.int64()),
            "s": pa.array([X.sum(axis=0).tobytes()], pa.binary()),
            "ss": pa.array([(X.T @ X).tobytes()], pa.binary()),
        })

    rows = sorted(
        (
            (r["key"], r["n"], r["s"], r["ss"])
            for b in ds.map_batches(
                partial, batch_format="pyarrow"
            ).iter_batches(batch_format="pyarrow")
            for r in b.to_pylist()
        ),
        key=lambda r: r[0],
    )
    n = sum(r[1] for r in rows)
    d = len(np.frombuffer(rows[0][2], dtype=np.float64))
    s = np.zeros(d)
    ss = np.zeros((d, d))
    for _, _, sb, ssb in rows:
        s += np.frombuffer(sb, dtype=np.float64)
        ss += np.frombuffer(ssb, dtype=np.float64).reshape(d, d)
    return n, s, ss


def pca_components(n: int, s: np.ndarray, ss: np.ndarray, k: int):
    """Closed-form PCA from the merged moments: population covariance
    cov = SS/n - outer(mean, mean), symmetric eigh, top-k by descending
    eigenvalue. Sign fixed deterministically (the largest-|x| element of
    each component is made positive — eigh's sign is arbitrary)."""
    mean = s / n
    cov = ss / n - np.outer(mean, mean)
    w, v = np.linalg.eigh(cov)
    order = np.argsort(w)[::-1][:k]
    comps = v[:, order].T                     # (k, d)
    for i in range(comps.shape[0]):
        j = int(np.argmax(np.abs(comps[i])))
        if comps[i, j] < 0:
            comps[i] = -comps[i]
    evr = w[order] / max(w.sum(), 1e-300)
    return mean, comps, evr


def pca_project(sf_dir: str, k: int = 8):
    """Distributed PCA projection of the embeddings table onto the top-k
    principal components: ONE moment pass (fixed-size partials, no
    shuffle), a d x d driver eigh (d=64 — milliseconds), then one
    stateless vectorized map projects every row; the (mean, components)
    pair broadcasts once via ray.put. Output: vec_id + pc_0..pc_{k-1}.

    Nothing materializes but the 33 KB moments; at 100 TB the projection
    streams. Non-SQL-expressible (eigendecomposition) — correctness is
    gated by ``pca_check`` single-process parity."""
    import ray
    import ray.data as rd

    n, s, ss = _pca_moments(sf_dir)
    mean, comps, _ = pca_components(n, s, ss, k)
    ref = ray.put((mean, comps))

    ds = rd.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    sch = pa.schema(
        [("vec_id", pa.int64())]
        + [(f"pc_{i}", pa.float64()) for i in range(k)]
    )

    def project(t: pa.Table) -> pa.Table:
        m, c = ray.get(ref)
        X = np.stack(
            [np.asarray(e, dtype=np.float64) for e in t["embedding"].to_pylist()]
        )
        Y = (X - m) @ c.T
        cols = {"vec_id": pa.array(
            np.asarray(t["vec_id"].to_pylist(), dtype=np.int64)
        )}
        for i in range(c.shape[0]):
            cols[f"pc_{i}"] = pa.array(Y[:, i], pa.float64())
        return pa.table(cols, schema=sch)

    return ds.map_batches(project, batch_format="pyarrow")


def pca_check(sf_dir: str, k: int = 8) -> pd.DataFrame:
    """Gate: distributed moment-PCA == single-process numpy PCA on the
    full matrix — covariance parity, projection parity (after the shared
    deterministic sign convention), and orthonormal components."""
    import pyarrow.parquet as pq

    n, s, ss = _pca_moments(sf_dir)
    mean, comps, evr = pca_components(n, s, ss, k)

    tbl = pq.read_table(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    ).to_pandas().sort_values("vec_id")
    X = np.stack([np.asarray(e, dtype=np.float64) for e in tbl["embedding"]])
    ref_mean = X.mean(axis=0)
    ref_cov = np.cov(X, rowvar=False, bias=True)
    got_cov = ss / n - np.outer(mean, mean)

    got = pca_project(sf_dir, k=k).to_pandas().sort_values("vec_id")
    want = (X - ref_mean) @ comps.T
    pc_cols = [f"pc_{i}" for i in range(k)]
    proj_err = np.abs(got[pc_cols].to_numpy() - want).max()

    return pd.DataFrame({
        "cov_parity_ok": [int(np.abs(got_cov - ref_cov).max() < 1e-9)],
        "mean_parity_ok": [int(np.abs(mean - ref_mean).max() < 1e-12)],
        "proj_parity_ok": [int(proj_err < 1e-8)],
        "orthonormal_ok": [int(
            np.abs(comps @ comps.T - np.eye(k)).max() < 1e-9
        )],
        "evr_descending_ok": [int((np.diff(evr) <= 1e-12).all())],
    })


def embedding_unpivot(sf_dir: str):
    """Columnar explode of the embedding vectors to long form
    (vec_id, dim_idx, val) — the feature-store unpivot that turns a
    list<float> column into a joinable per-dimension table. Pure
    vectorized per-batch reshape (np.repeat + one flat values copy from
    Arrow's contiguous list buffer) — no shuffle, streams at any scale.
    float32 -> float64 widening is exact, so the DuckDB unnest oracle
    matches bit-for-bit."""
    import ray.data as rd

    ds = rd.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    sch = pa.schema([
        ("vec_id", pa.int64()), ("dim_idx", pa.int64()),
        ("val", pa.float64()),
    ])

    def explode(t: pa.Table) -> pa.Table:
        col = t["embedding"].combine_chunks()
        lc = col.chunk(0) if isinstance(col, pa.ChunkedArray) else col
        offs = lc.offsets.to_numpy()
        lens = np.diff(offs)
        flat = lc.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
        vid = np.repeat(
            np.asarray(t["vec_id"].to_pylist(), dtype=np.int64), lens
        )
        dim = np.concatenate([np.arange(n, dtype=np.int64) for n in lens]) \
            if len(lens) else np.empty(0, np.int64)
        return pa.table({
            "vec_id": pa.array(vid), "dim_idx": pa.array(dim),
            "val": pa.array(flat),
        }, schema=sch)

    return ds.map_batches(explode, batch_format="pyarrow")


def _norm_stats_batch(batch: pa.Table, sch: pa.Schema,
                      lo: int, hi: int) -> pa.Table:
    """Per-vector (n_dims, integer-micro squared norm, unit flag) from the
    ListArray offsets directly — a ragged/truncated embedding is REPORTED
    with its true length instead of crashing a rectangular ``np.asarray``
    conversion (advice-r3 item). Segment sums via cumsum difference; no
    per-row Python."""
    import pyarrow.compute as pc

    ids = np.asarray(batch["vec_id"].to_pylist(), dtype=np.int64)
    col = batch["embedding"].combine_chunks()
    n_dims = pc.list_value_length(col).fill_null(0).to_numpy(
        zero_copy_only=False).astype(np.int64)
    vals = col.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
    q = np.floor(vals * 1_000_000.0 + 0.5).astype(np.int64)
    csum = np.concatenate(([0], np.cumsum(q * q)))
    ends = np.cumsum(n_dims)
    norm2 = csum[ends] - csum[ends - n_dims]
    return pa.table({
        "vec_id": pa.array(ids),
        "n_dims": pa.array(n_dims),
        "norm2_micro2": pa.array(norm2),
        "is_unit": pa.array(
            ((norm2 >= lo) & (norm2 <= hi)).astype(np.int64)
        ),
    }, schema=sch)


def embedding_norm_stats(sf_dir: str):
    """Embedding hygiene validation: per-vector dimensionality and squared
    L2 norm, plus a unit-norm flag — the ingest gate that catches the
    zero/huge/truncated vectors that silently corrupt every cosine op
    downstream. Shuffle-free single pass.

    Integer-exact contract: each element quantizes ONCE to micro units
    (floor(x*1e6+0.5), float32 -> float64 promotion is exact) and the
    squared norm is the int64 sum of squared micro values — so the value,
    and the unit-band compare (0.99..1.01 as integer bounds), are
    bit-identical to the SQL oracle with no float-summation-order
    hazard."""
    _LO = int((0.99 * 1_000_000) ** 2)   # 980100000000
    _HI = int((1.01 * 1_000_000) ** 2)   # 1020100000000

    sch = pa.schema([
        ("vec_id", pa.int64()), ("n_dims", pa.int64()),
        ("norm2_micro2", pa.int64()), ("is_unit", pa.int64()),
    ])

    def stats(batch: pa.Table) -> pa.Table:
        return _norm_stats_batch(batch, sch, _LO, _HI)

    return _embeddings(sf_dir).map_batches(
        stats, batch_format="pyarrow", batch_size=4096
    )


def ann_hamming_range(sf_dir: str, radius: int = 24, query_ids=(0, 1, 2, 3)):
    """RANGE similarity search (the radius complement of brute_force_topk):
    return every vector whose sign-hyperplane signature lies within
    ``radius`` Hamming bits of the query's — the standard LSH angular-
    distance range primitive (sign bit b_i = embedding[i] > 0; Hamming
    distance estimates the angle, Charikar 2002).

    Exactness: the sign predicate and the bit-count arithmetic are integer,
    so the DuckDB oracle (list_transform sign bits + list_inner_product)
    matches bit-for-bit — no float-threshold boundary to flip.

    Scale shape: embarrassingly parallel — the query signature block (|Q| x
    d bits, bytes) rides the task closure; each batch computes an N x |Q|
    XOR-popcount via one vectorized boolean compare and emits only rows
    inside the radius. No shuffle, no materialization; output is
    result-sized."""
    q_ids, q_mat = query_vectors(sf_dir, query_ids)
    q_sig = q_mat > 0.0  # |Q| x d bools

    out_sch = pa.schema([
        ("query_id", pa.int64()), ("vec_id", pa.int64()),
        ("hamming", pa.int64()),
    ])

    def fn(batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch["vec_id"].to_pylist(), dtype=np.int64)
        mat = np.asarray(batch["embedding"].to_pylist(), dtype=np.float64)
        if mat.size == 0:
            return out_sch.empty_table()
        sig = mat > 0.0  # N x d
        # N x |Q| Hamming counts: one broadcasted XOR + popcount
        ham = (sig[:, None, :] != q_sig[None, :, :]).sum(axis=2)
        vi, qi = np.nonzero(ham <= radius)
        return pa.table({
            "query_id": pa.array(q_ids[qi], pa.int64()),
            "vec_id": pa.array(ids[vi], pa.int64()),
            "hamming": pa.array(ham[vi, qi].astype(np.int64)),
        }, schema=out_sch)

    return _embeddings(sf_dir).map_batches(fn, batch_format="pyarrow")
