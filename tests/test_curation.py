"""Planted-fixture tests for the corpus-curation operators
(rayld/pipelines/curation.py): decontamination, PII redaction, hash
splitting, stratified sampling, repetition stats, length-outlier filtering,
and sequence packing."""

from __future__ import annotations

import hashlib

import pyarrow as pa
import pyarrow.parquet as pq


def _write_docs(tmp_path, texts, langs=None, name="docs"):
    d = tmp_path / name
    d.mkdir()
    cols = {
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string()),
    }
    if langs is not None:
        cols["lang"] = pa.array(langs, pa.string())
    pq.write_table(pa.table(cols), d / "documents.parquet")
    return str(d)


def test_decontaminate_planted_overlap(ray_session, tmp_path):
    """Doc 0 (doc_id % 29 == 0) is the benchmark; a doc that copies one of
    its 3-token windows is contaminated, a disjoint doc is not."""
    from rayld.pipelines.curation import decontaminate

    sf = _write_docs(tmp_path, [
        "alpha beta gamma delta epsilon",          # benchmark (id 0)
        "noise beta gamma delta more noise",        # shares 'beta gamma delta'
        "totally disjoint words here",              # clean
        "alpha beta gamma delta zeta",              # shares two windows
    ])
    out = decontaminate(sf).to_pandas().set_index("doc_id")
    assert sorted(out.index) == [1, 2, 3]
    assert out.loc[1, "n_hits"] == 1 and out.loc[1, "contaminated"] == 1
    assert out.loc[2, "n_hits"] == 0 and out.loc[2, "contaminated"] == 0
    # id 3 shares 'alpha beta gamma' and 'beta gamma delta'
    assert out.loc[3, "n_hits"] == 2 and out.loc[3, "contaminated"] == 1


def test_decontaminate_short_docs_and_empty_bench(ray_session, tmp_path):
    from rayld.pipelines.curation import decontaminate

    # benchmark doc too short for any 3-gram -> empty benchmark set
    sf = _write_docs(tmp_path, ["one two", "one two three four"])
    out = decontaminate(sf).to_pandas()
    assert out["n_hits"].tolist() == [0]
    assert out["contaminated"].tolist() == [0]


def test_pii_redact_planted(ray_session, tmp_path):
    from rayld.pipelines.curation import pii_redact

    sf = _write_docs(tmp_path, [
        "contact john.doe+x@mail.example.co or call +1 415-555-0199 now",
        "customer said: customers and customer. +41 22 555 12 34",
        "plain text with no pii at all",
    ])
    out = pii_redact(sf).to_pandas().set_index("doc_id").sort_index()
    assert out.loc[0, "n_emails"] == 1
    assert out.loc[0, "n_phones"] == 1
    assert out.loc[0, "n_terms"] == 0
    assert out.loc[1, "n_terms"] == 2  # 'customers' does not match \b
    assert out.loc[1, "n_phones"] == 1
    expected = "<TERM> said: customers and <TERM>. <PHONE>"
    assert out.loc[1, "redacted_md5"] == hashlib.md5(
        expected.encode()
    ).hexdigest()
    # no-op doc: md5 of the original text
    assert out.loc[2, "redacted_md5"] == hashlib.md5(
        b"plain text with no pii at all"
    ).hexdigest()


def test_pii_regex_parity_with_duckdb():
    """The redaction regexes must behave identically in Python re and
    DuckDB's RE2 — the invariant the SQL oracle rests on."""
    import re

    import duckdb

    from rayld.pipelines.curation import _EMAIL_RE, _PHONE_RE, _TERM_RE

    samples = [
        "contact john.doe+x@mail.example.co, or call +1 415-555-0199 now",
        "customer said: customers and customer. +41 22 555 12 34",
        "a@b.io x@y.z no-digits here 12345678901",
        "edge@case.museum trailing@dot. and (555) 123 4567",
        "",
    ]
    con = duckdb.connect()
    for s in samples:
        t1 = re.sub(_EMAIL_RE, "<EMAIL>", s)
        t2 = re.sub(_PHONE_RE, "<PHONE>", t1)
        t3 = re.sub(_TERM_RE, "<TERM>", t2)
        (d3,) = con.execute(
            "SELECT regexp_replace(regexp_replace(regexp_replace(?, ?,"
            " '<EMAIL>', 'g'), ?, '<PHONE>', 'g'), ?, '<TERM>', 'g')",
            [s, _EMAIL_RE, _PHONE_RE, _TERM_RE],
        ).fetchone()
        assert d3 == t3, (s, d3, t3)


def test_hash_split_deterministic_partition(ray_session, tmp_path):
    from rayld.pipelines.curation import hash_split

    sf = _write_docs(tmp_path, [f"doc {i}" for i in range(40)])
    out = hash_split(sf).to_pandas().set_index("doc_id").sort_index()
    assert len(out) == 40
    for i in range(40):
        b = int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16) % 100
        assert out.loc[i, "bucket"] == b
        want = "train" if b < 80 else ("val" if b < 90 else "test")
        assert out.loc[i, "split"] == want


def test_leakage_safe_split(ray_session, tmp_path):
    """Near-duplicate docs always land in the same split (keyed by their
    cluster min), singletons keep the plain hash_split assignment, and
    the gate holds on the real corpus."""
    from rayld.pipelines.curation import (
        leakage_safe_split,
        leakage_safe_split_check,
    )

    # docs 0/1/2 are near-identical (one cluster); 3..9 unique
    dup = "the same long shared near duplicate body of text " * 6
    texts = [dup, dup + "tail", dup + "other tail"] + [
        f"completely unrelated document body number {i} " * 6
        for i in range(3, 10)
    ]
    sf = _write_docs(tmp_path, texts)
    out = leakage_safe_split(sf, num_partitions=4).to_pandas()
    out = out.set_index("doc_id").sort_index()
    assert len(out) == 10
    # the cluster rides its min id; all three members share one split
    assert (out.loc[[0, 1, 2], "split_key"] == 0).all()
    assert out.loc[[0, 1, 2], "split"].nunique() == 1
    # singletons == hash_split on their own id
    for i in range(3, 10):
        assert out.loc[i, "split_key"] == i
        b = int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16) % 100
        want = "train" if b < 80 else ("val" if b < 90 else "test")
        assert out.loc[i, "split"] == want

    gate = leakage_safe_split_check("/root/testdata/sf0.001")
    assert gate["no_cluster_straddles"].iloc[0] == 1
    assert gate["all_docs_assigned_once"].iloc[0] == 1


def test_stratified_sample_quota_and_rank(ray_session, tmp_path):
    from rayld.pipelines.curation import stratified_sample

    texts = [f"doc {i}" for i in range(10)]
    langs = ["en"] * 6 + ["de"] * 4
    sf = _write_docs(tmp_path, texts, langs=langs)
    out = stratified_sample(sf, quota=2).to_pandas()
    assert len(out) == 4
    assert sorted(out["lang"].value_counts().to_dict().items()) == [
        ("de", 2), ("en", 2)
    ]
    # selection = the 2 smallest md5(doc_id) keys per lang, ranked
    for lang, ids in (("en", range(6)), ("de", range(6, 10))):
        keyed = sorted(
            (hashlib.md5(str(i).encode()).hexdigest(), i) for i in ids
        )
        want = [i for _, i in keyed[:2]]
        got = out[out["lang"] == lang].sort_values("sample_rank")
        assert got["doc_id"].tolist() == want


def test_repetition_stats_known_values(ray_session, tmp_path):
    from rayld.pipelines.curation import repetition_stats

    sf = _write_docs(tmp_path, ["a a a b", "x y z", ""])
    out = repetition_stats(sf).to_pandas().set_index("doc_id").sort_index()
    assert out.loc[0, "n_tokens"] == 4
    assert out.loc[0, "distinct_ratio"] == 0.5
    assert out.loc[0, "top_token_frac"] == 0.75
    # bigrams of doc 0: 'a a' x2, 'a b' -> 2/3 half-up at 6dp
    assert out.loc[0, "top_bigram_frac"] == 0.666667
    assert out.loc[1, "distinct_ratio"] == 1.0
    assert out.loc[2, "n_tokens"] == 0
    assert out.loc[2, "top_bigram_frac"] == 0.0


def test_length_outlier_filter_trims_tails(ray_session, tmp_path):
    from rayld.pipelines.curation import length_outlier_filter

    texts = ["t"] + ["w " * 5] * 6 + ["x " * 100]
    sf = _write_docs(tmp_path, texts)
    out = length_outlier_filter(sf, lo_q=0.2, hi_q=0.8).to_pandas()
    assert sorted(out["doc_id"]) == [1, 2, 3, 4, 5, 6]
    assert (out["n_tokens"] == 5).all()


def test_pack_sequences_greedy_chunked(ray_session, tmp_path):
    from rayld.pipelines.curation import pack_sequences

    lens = [4, 5, 3, 11, 6, 5]
    sf = _write_docs(tmp_path, [("t " * n).strip() for n in lens])
    out = (
        pack_sequences(sf, capacity=10, chunk_docs=4, num_partitions=2)
        .to_pandas()
        .set_index("doc_id")
        .sort_index()
    )
    assert out["n_tokens"].tolist() == lens
    # chunk 0 = ids 0-3: [0,1] fill 9; 2 opens bin 1; 3 (oversize) bin 2
    # chunk 1 = ids 4-5: 4 opens bin 4 (=1*4+0); 5 overflows into bin 5
    assert out["bin_id"].tolist() == [0, 0, 1, 2, 4, 5]
    assert out["token_offset"].tolist() == [0, 4, 0, 0, 0, 0]
    # every bin is within capacity unless it holds a single oversize doc
    g = out.reset_index().groupby("bin_id").agg(
        total=("n_tokens", "sum"), n=("doc_id", "size")
    )
    assert ((g["total"] <= 10) | (g["n"] == 1)).all()


def test_pack_sequences_deterministic_across_partitionings(
    ray_session, tmp_path
):
    from rayld.pipelines.curation import pack_sequences

    lens = [7, 2, 9, 1, 5, 5, 5, 12, 3]
    sf = _write_docs(tmp_path, [("t " * n).strip() for n in lens])
    a = (
        pack_sequences(sf, capacity=12, chunk_docs=4, num_partitions=2)
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    b = (
        pack_sequences(sf, capacity=12, chunk_docs=4, num_partitions=5)
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    assert a.equals(b)


def test_chunk_documents_geometry(ray_session, tmp_path):
    from rayld.pipelines.curation import chunk_documents

    lens = [0, 10, 48, 100]
    sf = _write_docs(tmp_path, [("t " * n).strip() for n in lens])
    out = chunk_documents(sf, chunk=64, stride=48).to_pandas()
    got = {
        i: g.sort_values("chunk_idx")[
            ["chunk_start", "chunk_tokens"]
        ].values.tolist()
        for i, g in out.groupby("doc_id")
    }
    assert got == {
        0: [[0, 0]],                       # empty doc -> one empty chunk
        1: [[0, 10]],
        2: [[0, 48]],
        3: [[0, 64], [48, 52], [96, 4]],   # overlap of 16 tokens
    }


def test_source_quality_report_exact_means(ray_session, tmp_path):
    import numpy as np
    import pyarrow.parquet as pq

    from rayld.pipelines.text import quality_cols, source_quality_report

    d = tmp_path / "mini"
    d.mkdir()
    texts = ["the and of to a in is it", "zz", "the the the", "x y"]
    srcs = ["s1", "s1", "s2", "s2"]
    pq.write_table(
        pa.table({"doc_id": pa.array(range(4), pa.int64()),
                  "text": pa.array(texts, pa.string()),
                  "source": pa.array(srcs, pa.string())}),
        d / "documents.parquet",
    )
    out = source_quality_report(str(d)).to_pandas().set_index("source")
    import pandas as pd

    n_toks, quality = quality_cols(pd.Series(texts))
    for s, idxs in (("s1", [0, 1]), ("s2", [2, 3])):
        assert out.loc[s, "n_docs"] == 2
        assert out.loc[s, "total_tokens"] == int(n_toks[idxs].sum())
        micro = np.floor(quality[idxs] * 1e6 + 0.5).sum()
        assert out.loc[s, "mean_quality"] == np.floor(micro / 2 + 0.5) / 1e6


def test_top_quality_by_lang(ray_session, tmp_path):
    import pandas as pd

    from rayld.pipelines.text import quality_cols, top_quality_by_lang

    texts = [
        "the and of to a in is it for with more words here now",
        "zz",
        "the quick brown fox jumps with the pack in a field of grass",
        "a b",
        "x",
    ]
    langs = ["en", "en", "en", "de", "de"]
    sf = _write_docs(tmp_path, texts, langs=langs)
    out = top_quality_by_lang(sf, k=2).to_pandas()
    _, q = quality_cols(pd.Series(texts))
    for lang, ids in (("en", [0, 1, 2]), ("de", [3, 4])):
        want = sorted(ids, key=lambda i: (-q[i], i))[:2]
        got = out[out["lang"] == lang].sort_values("rank")
        assert got["doc_id"].tolist() == want
        assert got["rank"].tolist() == [1, 2]


def test_write_curated_corpus_resume(ray_session, tmp_path):
    """The documents-side resumable sink: a re-run after losing one bucket
    rewrites ONLY that bucket and reports the others skipped; the final
    corpus equals a direct corpus_clean run."""
    import shutil

    import pyarrow.parquet as pq

    from rayld.pipelines.prep import corpus_clean, write_curated_corpus

    sf = "/root/testdata/sf0.001"
    out = str(tmp_path / "corpus")
    r1 = write_curated_corpus(sf, out, num_buckets=4)
    assert r1["buckets_skipped"] == 0 and r1["rows"] > 0

    # read-back equals the direct pipeline output
    import pandas as pd

    direct = corpus_clean(sf).to_pandas().sort_values("doc_id")
    back = pq.read_table(out).to_pandas().sort_values("doc_id")
    assert back["doc_id"].tolist() == direct["doc_id"].tolist()

    # lose one bucket (data + manifest) -> only it is rebuilt
    shutil.rmtree(f"{out}/bucket=2")
    import os

    os.remove(f"{out}/_manifest_bucket_2.json")
    r2 = write_curated_corpus(sf, out, num_buckets=4)
    assert r2["buckets_skipped"] == 3
    assert r2["rows"] == r1["rows"]
    back2 = pq.read_table(out).to_pandas().sort_values("doc_id")
    assert back2["doc_id"].tolist() == direct["doc_id"].tolist()


def test_weighted_sample_is_proportional_and_deterministic(ray_session):
    """A-ES sampling: repeated runs are identical; the sampled set skews
    toward heavier (longer) docs; growing the corpus never evicts a doc by
    key change (keys are per-doc and data-independent)."""
    import pandas as pd

    from rayld.pipelines.curation import weighted_sample

    SF = "/root/testdata/sf0.001"
    a = weighted_sample(SF, k=32).to_pandas()
    b = weighted_sample(SF, k=32).to_pandas()
    pd.testing.assert_frame_equal(a, b)
    assert a["sample_rank"].tolist() == list(range(1, 33))
    docs = pd.read_parquet(f"{SF}/documents.parquet",
                           columns=["doc_id", "n_chars"])
    # weighted mean of the sampled docs exceeds the corpus mean
    assert a["weight"].mean() > docs["n_chars"].mean() * 0.9
    # the top-16 of k=32 equals the k=16 sample (prefix property of top-k)
    small = weighted_sample(SF, k=16).to_pandas()
    assert small["doc_id"].tolist() == a["doc_id"].head(16).tolist()


def test_contamination_by_source(ray_session):
    """Per-source rollup reconciles exactly with the per-doc decontaminate
    flags joined to the source column."""
    import pandas as pd

    from rayld.pipelines.curation import contamination_by_source, decontaminate

    SF = "/root/testdata/sf0.001"
    got = contamination_by_source(SF).to_pandas().set_index("source")
    flags = decontaminate(SF).to_pandas()
    src = pd.read_parquet(
        f"{SF}/documents.parquet", columns=["doc_id", "source"]
    )
    j = flags.merge(src, on="doc_id")
    want = j.groupby("source").agg(
        n=("doc_id", "size"), c=("contaminated", "sum")
    )
    assert len(got) == len(want)
    for s, row in want.iterrows():
        assert int(got.loc[s, "n_docs"]) == int(row["n"])
        assert int(got.loc[s, "n_contaminated"]) == int(row["c"])
        assert float(got.loc[s, "contamination_rate"]) == int(
            row["c"]
        ) / int(row["n"])
