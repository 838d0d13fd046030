"""Tests for the training-data pipelines: dedup family, ANN, text analysis,
multimodal plumbing, relational/windowed ops."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"


def test_minhash_jaccard_properties():
    from rayld.pipelines.dedup import jaccard, minhash_signature

    a = "the quick brown fox jumps over the lazy dog again and again today"
    b = "the quick brown fox jumps over the lazy dog again and again tomorrow"
    c = "completely different words entirely unrelated content elsewhere"
    assert jaccard(a, a) == 1.0
    assert jaccard(a, b) > 0.5
    assert jaccard(a, c) < 0.1
    sa, sb = minhash_signature(a), minhash_signature(b)
    est = float(np.mean(sa == sb))
    assert abs(est - jaccard(a, b)) < 0.35  # 64-hash estimator tolerance
    # determinism
    assert (minhash_signature(a) == sa).all()


def test_simhash_close_for_similar_text():
    from rayld.pipelines.dedup import simhash_signature

    a = "the quick brown fox jumps over the lazy dog near the river bank"
    b = "the quick brown fox jumps over the lazy dog near the river shore"
    c = "numeric tables parquet shuffle compute cluster resource scheduling"
    da = bin(simhash_signature(a) ^ simhash_signature(b)).count("1")
    dc = bin(simhash_signature(a) ^ simhash_signature(c)).count("1")
    assert da < dc
    assert da <= 16


def test_langid_heuristic():
    from rayld.pipelines.text import LangId

    li = LangId()
    assert li.predict("the cat and the dog went to the house") == "en"
    assert li.predict("der Hund und die Katze sind nicht da") == "de"
    assert li.predict("le chat est dans la maison avec les enfants") == "fr"
    assert li.predict("你好世界这是一个测试") == "zh"


def test_rolling_fingerprint_shift_invariance():
    from rayld.pipelines.text import rolling_fingerprint  # noqa: F401
    import hashlib, re

    # the min-rolling-hash of a doc is invariant to a prefix insertion when
    # the minimal window survives
    def min_window_hash(text, window=8):
        toks = re.findall(r"[A-Za-z0-9]+", text)
        return min(
            hashlib.md5(" ".join(toks[i:i + window]).encode()).hexdigest()[:16]
            for i in range(len(toks) - window + 1)
        )

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa " \
           "lambda mu nu xi omicron pi rho sigma tau upsilon"
    shifted = "zzz " + base
    assert min_window_hash(base) == min_window_hash(shifted)


def test_ann_ivf_recall(ray_session):
    from rayld.pipelines.ann import brute_force_topk, ivf_topk

    brute = brute_force_topk(SF, k=10).to_pandas()
    ivf = ivf_topk(SF, k=10, nprobe=8, n_clusters=8).to_pandas()
    recalls = []
    for qid in brute["query_id"].unique():
        b = set(brute[brute["query_id"] == qid]["vec_id"])
        i = set(ivf[ivf["query_id"] == qid]["vec_id"])
        recalls.append(len(b & i) / len(b))
    assert np.mean(recalls) >= 0.5, recalls


def test_ann_brute_force_self_hit(ray_session):
    from rayld.pipelines.ann import brute_force_topk

    out = brute_force_topk(SF, k=5).to_pandas()
    for qid, grp in out.groupby("query_id"):
        assert qid in set(grp["vec_id"])  # a vector is its own nearest


def test_dedup_exact_survivors(ray_session):
    from rayld.pipelines.dedup import dedup_exact
    import duckdb

    got = sorted(dedup_exact(SF).to_pandas()["doc_id"].tolist())
    want = sorted(
        r[0]
        for r in duckdb.sql(
            "SELECT min(doc_id) FROM read_parquet("
            f"'{SF}/documents.parquet') GROUP BY md5(text)"
        ).fetchall()
    )
    assert got == want


def test_minhash_dedup_finds_known_near_dups(ray_session, tmp_path):
    """Plant near-duplicate docs and check the LSH pipeline surfaces them."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    from rayld.pipelines.dedup import minhash_dedup

    base = (
        "spark shuffle merge join window aggregate partition batch stream "
        "table scan hash sort key order compute cluster memory spill disk"
    )
    texts = [base, base + " extra", "totally different content here now",
             "unrelated words about nothing in particular at all today"]
    tbl = pa.table(
        {
            "doc_id": pa.array(range(4), pa.int64()),
            "text": pa.array(texts, pa.string()),
        }
    )
    d = tmp_path / "mini"
    d.mkdir()
    pq.write_table(tbl, d / "documents.parquet")
    pairs = minhash_dedup(str(d), threshold=0.5)
    got = set(zip(pairs["doc_a"].to_pylist(), pairs["doc_b"].to_pylist()))
    assert (0, 1) in got
    assert (2, 3) not in got


def test_media_features_stub(ray_session):
    from rayld.pipelines.multimodal import MediaDecoder, media_features

    out = media_features(SF).to_pandas()
    assert len(out) == 500
    assert set(out.columns) == {"media_id", "n_bytes", "width", "height", "feature"}
    assert (out["n_bytes"] > 0).all()
    with pytest.raises(NotImplementedError):
        MediaDecoder(raise_on_decode=True)._decode(b"x", "image/fake")


def test_user_sessions_gap_logic(ray_session):
    from rayld.pipelines.relational import user_sessions

    out = user_sessions(SF).to_pandas()
    assert (out["session_id"] >= 1).all()
    assert (out["n_events"] >= 1).all()


def test_quality_score_bounds(ray_session):
    from rayld.pipelines.text import quality_score

    out = quality_score(SF).to_pandas()
    assert out["quality"].between(0, 1).all()


def test_dedup_clusters_transitive(ray_session, tmp_path):
    """a~b, b~c -> one cluster {a,b,c} even if a~c was never a pair."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    from rayld.pipelines.dedup import dedup_clusters

    base = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
            "lambda mu nu xi omicron pi rho sigma tau upsilon phi chi")
    texts = [base + " one", base + " two", base + " three",
             "completely different content in this document entirely"]
    tbl = pa.table({"doc_id": pa.array(range(4), pa.int64()),
                    "text": pa.array(texts, pa.string())})
    d = tmp_path / "mini"
    d.mkdir()
    pq.write_table(tbl, d / "documents.parquet")
    out = dedup_clusters(str(d))
    clusters = dict(zip(out["doc_id"].to_pylist(), out["cluster_id"].to_pylist()))
    assert clusters.get(0) == clusters.get(1) == clusters.get(2) == 0
    assert 3 not in clusters


def test_ngram_jaccard_dedup(ray_session, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq
    from rayld.pipelines.dedup import ngram_jaccard_dedup

    base = ("one two three four five six seven eight nine ten eleven twelve "
            "thirteen fourteen fifteen sixteen seventeen eighteen nineteen")
    texts = [base, "prefix " + base, "other words that differ completely "
             "from the rest of the corpus in every way imaginable today"]
    tbl = pa.table({"doc_id": pa.array(range(3), pa.int64()),
                    "text": pa.array(texts, pa.string())})
    d = tmp_path / "mini"
    d.mkdir()
    pq.write_table(tbl, d / "documents.parquet")
    out = ngram_jaccard_dedup(str(d)).to_pandas()
    got = set(zip(out["doc_a"], out["doc_b"]))
    assert (0, 1) in got
    assert all(2 not in p for p in got)
