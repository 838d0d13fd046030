"""Similarity search over the ``embeddings`` table.

- brute-force cosine top-k: numpy matmul per batch against a broadcast query
  matrix (the baseline; SQL-checkable against DuckDB list_cosine_similarity)
- IVF-bucketed variant: k-means-lite centroids (deterministic seed), assign
  each vector to its nearest centroid inside map_batches, probe only the
  nearest ``nprobe`` buckets at query time — the 100 TB scale path (the probe
  prunes the scan; centroids are the broadcast small side).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def _embeddings(sf_dir: str):
    import ray.data as rd

    return rd.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )


def _normalize(mat: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(mat, axis=1)
    norms[norms == 0] = 1.0
    return mat / norms[:, None]


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


def ivf_topk(sf_dir: str, k: int = 10, query_ids=(0, 1, 2, 3),
             n_clusters: int = 16, nprobe: int = 4, sample_size: int = 2048):
    """IVF: train centroids on a deterministic sample, assign vectors to
    buckets in map_batches, scan only the nprobe closest buckets per query.
    Returns (query_id, vec_id) — approximate; tests compare recall vs brute
    force."""
    import ray

    # train on a deterministic prefix sample (small, driver-side)
    head = _embeddings(sf_dir).limit(sample_size).to_pandas()
    train = _normalize(np.asarray(head["embedding"].tolist(), dtype=np.float64))
    centroids = _kmeans_lite(train, n_clusters)
    q_ids, q_mat = query_vectors(sf_dir, query_ids)
    q_norm = _normalize(q_mat)
    probe = np.argsort(-(q_norm @ centroids.T), axis=1)[:, :nprobe]
    probe_sets = {int(qid): set(probe[row].tolist()) for row, qid in enumerate(q_ids)}
    ref = ray.put((q_ids, q_norm, centroids, probe_sets))

    def partial(batch: pa.Table) -> pa.Table:
        qi, qm, cents, probes = ray.get(ref)
        b_ids = np.asarray(batch["vec_id"].to_pylist(), dtype=np.int64)
        b_mat = _normalize(np.asarray(batch["embedding"].to_pylist(), dtype=np.float64))
        assign = np.argmax(b_mat @ cents.T, axis=1)
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

    partials = _embeddings(sf_dir).map_batches(
        partial, batch_format="pyarrow", batch_size=4096
    )

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["sim", "vec_id"], ascending=[False, True], kind="mergesort")
        return df.head(k)[["query_id", "vec_id"]]

    return partials.groupby("query_id").map_groups(merge, batch_format="pandas")
