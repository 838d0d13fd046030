"""Tests for corpus indexing / ordering operators
(rayld/pipelines/indexing.py)."""

from __future__ import annotations

import hashlib

import pyarrow as pa
import pyarrow.parquet as pq


def _write_docs(tmp_path, texts, name="docs"):
    d = tmp_path / name
    d.mkdir()
    pq.write_table(
        pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                  "text": pa.array(texts, pa.string())}),
        d / "documents.parquet",
    )
    return str(d)


def test_token_postings_first_k(ray_session, tmp_path):
    from rayld.pipelines.indexing import token_postings

    sf = _write_docs(tmp_path, ["a b", "a c", "a b a", "b"])
    out = token_postings(sf, k=2, num_partitions=2).to_pandas()
    got = {
        t: g.sort_values("rank")["doc_id"].tolist()
        for t, g in out.groupby("token")
    }
    # first 2 ascending doc_ids per token; duplicates within a doc collapse
    assert got == {"a": [0, 1], "b": [0, 2], "c": [1]}
    assert set(out["rank"]) <= {1, 2}


def test_shuffle_shards_deterministic_assignment(ray_session, tmp_path):
    from rayld.pipelines.indexing import shuffle_shards

    sf = _write_docs(tmp_path, [f"doc {i}" for i in range(24)])
    out = shuffle_shards(sf, n_shards=4, seed=42).to_pandas()
    assert sorted(out["doc_id"]) == list(range(24))
    # shard id matches the md5-prefix range split, pos the in-shard key rank
    keys = {i: hashlib.md5(f"42:{i}".encode()).hexdigest() for i in range(24)}
    for i in range(24):
        shard = int(keys[i][:8], 16) * 4 // (1 << 32)
        assert out.set_index("doc_id").loc[i, "shard_id"] == shard
    for s, g in out.groupby("shard_id"):
        g = g.sort_values("pos")
        assert g["pos"].tolist() == list(range(len(g)))
        want = sorted(g["doc_id"], key=lambda i: (keys[i], i))
        assert g["doc_id"].tolist() == want

    # a different seed permutes; the same seed reproduces byte-identically
    again = shuffle_shards(sf, n_shards=4, seed=42).to_pandas()
    assert again.sort_values("doc_id").reset_index(drop=True).equals(
        out.sort_values("doc_id").reset_index(drop=True)
    )
    other = shuffle_shards(sf, n_shards=4, seed=7).to_pandas()
    assert not other.sort_values("doc_id").reset_index(drop=True).equals(
        out.sort_values("doc_id").reset_index(drop=True)
    )


def test_bm25_scores_known_corpus(ray_session, tmp_path):
    """BM25 equals a hand-rolled per-doc recount with the same k1/b/idf and
    micro rounding; non-matching docs are excluded; rarer terms score
    higher than common ones at equal tf."""
    import math

    import numpy as np

    from rayld.pipelines.indexing import bm25_scores

    texts = [
        "hash join hash scan",      # tf: hash 2, join 1, scan 1
        "window window filter",     # tf: window 2
        "filter merge sort",        # no query terms -> excluded
        "scan scan scan hash",      # tf: scan 3, hash 1
        "join",                     # tf: join 1
    ]
    sf = _write_docs(tmp_path, texts)
    got = bm25_scores(sf).to_pandas().set_index("doc_id").sort_index()
    assert got.index.tolist() == [0, 1, 3, 4]

    terms = ("hash", "join", "scan", "window")
    toks = [t.split() for t in texts]
    n, total = len(texts), sum(len(t) for t in toks)
    df = {t: sum(t in ts for ts in toks) for t in terms}
    for i, ts in enumerate(toks):
        micro = 0
        for t in terms:
            tf = ts.count(t)
            idf = math.log(1.0 + (n - df[t] + 0.5) / (df[t] + 0.5))
            s = (idf * (tf * 2.2)) / (
                tf + 1.2 * (0.25 + 0.75 * ((len(ts) * n) / total))
            )
            micro += int(np.floor(s * 1000000.0 + 0.5))
        if i in got.index:
            assert got.loc[i, "bm25"] == micro / 1000000.0
            assert got.loc[i, "n_terms"] == sum(
                t in ts for t in terms
            )
    # doc 3's rare-term tf=3 scan beats doc 1's common-term tf=2 window
    assert got.loc[3, "bm25"] > 0 and got.loc[1, "bm25"] > 0


def test_doc_embedding_features_join(ray_session, tmp_path):
    from rayld.pipelines.relational import doc_embedding_features

    d = tmp_path / "mini"
    d.mkdir()
    pq.write_table(
        pa.table({"doc_id": pa.array([0, 1, 2], pa.int64()),
                  "text": pa.array(["a b c", "d e", "f"], pa.string()),
                  "lang": pa.array(["en", "de", "en"], pa.string())}),
        d / "documents.parquet",
    )
    pq.write_table(
        pa.table({"vec_id": pa.array([1, 2, 9], pa.int64()),
                  "label": pa.array([7, 8, 9], pa.int64())}),
        d / "embeddings.parquet",
    )
    out = doc_embedding_features(str(d), num_partitions=2).to_pandas()
    out = out.sort_values("doc_id").reset_index(drop=True)
    # inner join: doc 0 has no embedding, vec 9 has no doc
    assert out["doc_id"].tolist() == [1, 2]
    assert out["lang"].tolist() == ["de", "en"]
    assert out["n_tokens"].tolist() == [2, 1]
    assert out["label"].tolist() == [7, 8]


def test_events_hourly_users_distinct(ray_session, tmp_path):
    import pandas as pd
    from rayld.pipelines.relational import events_hourly_users

    d = tmp_path / "mini"
    d.mkdir()
    ts = pd.to_datetime([
        "2024-01-01 10:05", "2024-01-01 10:20", "2024-01-01 10:50",
        "2024-01-01 11:05", "2024-01-01 11:10",
    ])
    pq.write_table(
        pa.table({"ts": pa.array(ts),
                  "user_id": pa.array([1, 1, 2, 1, 1], pa.int64())}),
        d / "events.parquet",
    )
    out = events_hourly_users(str(d), num_partitions=2).to_pandas()
    got = dict(zip(out["window_start"], out["n_users"]))
    h10 = int(pd.Timestamp("2024-01-01 10:00").timestamp())
    h11 = int(pd.Timestamp("2024-01-01 11:00").timestamp())
    # hour 10: users {1, 2}; hour 11: user {1} (duplicates collapse)
    assert got == {h10: 2, h11: 1}


def test_embedding_quantize_known_vectors(ray_session, tmp_path):
    from rayld.pipelines.ann import embedding_quantize

    d = tmp_path / "mini"
    d.mkdir()
    pq.write_table(
        pa.table({
            "vec_id": pa.array([0, 1], pa.int64()),
            "embedding": pa.array(
                [[0.0, 1.0, 0.5], [2.0, 2.0, 2.0]],
                pa.list_(pa.float32()),
            ),
        }),
        d / "embeddings.parquet",
    )
    out = embedding_quantize(str(d)).to_pandas().set_index("vec_id")
    assert out.loc[0, "vmin"] == 0.0 and out.loc[0, "vmax"] == 1.0
    assert out.loc[0, "scale"] == round(1 / 255, 6)
    # codes: 0, 255, round(0.5*255)=128 -> sum 383
    assert out.loc[0, "code_sum"] == 383
    # constant vector: zero range -> zero codes by contract
    assert out.loc[1, "scale"] == 0.0 and out.loc[1, "code_sum"] == 0


def test_hll_users_gate_accuracy(ray_session, tmp_path):
    """Planted high-cardinality window: the distributed register-max merge
    must land within the gate; a tiny window hits the linear-counting path."""
    import pandas as pd
    from rayld.pipelines.relational import hll_users_gate

    d = tmp_path / "mini"
    d.mkdir()
    base = pd.Timestamp("2024-01-01 10:30")
    ts = [base] * 2000 + [pd.Timestamp("2024-01-01 11:30")] * 3
    users = list(range(2000)) + [7, 7, 8]
    pq.write_table(
        pa.table({"ts": pa.array(pd.to_datetime(ts)),
                  "user_id": pa.array(users, pa.int64())}),
        d / "events.parquet",
    )
    out = hll_users_gate(str(d), num_partitions=4).to_pandas()
    got = {int(w): (int(n), int(ok))
           for w, n, ok in zip(out["window_start"], out["n_users"],
                               out["hll_ok"])}
    h10 = int(pd.Timestamp("2024-01-01 10:00").timestamp())
    h11 = int(pd.Timestamp("2024-01-01 11:00").timestamp())
    assert got[h10] == (2000, 1)   # sketch within 25% on 2000 distinct
    assert got[h11] == (2, 1)      # linear-counting path, abs-3 floor


def test_mixture_sample_weights(ray_session, tmp_path):
    import hashlib

    from rayld.pipelines.curation import mixture_sample

    d = tmp_path / "mini"
    d.mkdir()
    srcs = ["src0", "src5", "src10"] * 20   # pct 20, 55, 30
    pq.write_table(
        pa.table({"doc_id": pa.array(range(60), pa.int64()),
                  "source": pa.array(srcs, pa.string())}),
        d / "documents.parquet",
    )
    out = mixture_sample(str(d)).to_pandas()
    pcts = {"src0": 20, "src5": 55, "src10": 30}  # 20 + (n*7) % 60
    for i in range(60):
        b = int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16) % 100
        kept = i in set(out["doc_id"])
        assert kept == (b < pcts[srcs[i]]), (i, b, srcs[i])
