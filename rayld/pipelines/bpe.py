"""Distributed BPE tokenizer training and application.

Byte-pair-encoding merge induction (Sennrich, Haddow & Birch 2016,
"Neural Machine Translation of Rare Words with Subword Units" — public
algorithm) over the ``documents`` table, engine-shaped:

- training runs on the DISTINCT word-frequency table, never the corpus:
  the raw stream collapses once (the ``token_frequencies`` pattern) and
  every merge round touches only |vocab| rows;
- the round is cost-based like ``graph.pagerank``: when the vocabulary
  fits the driver threshold the exact reference loop runs locally (one
  collect, zero per-round exchanges); above it, each round is one
  vectorized map over the distributed word table + one bounded
  pair-count combine + a tiny argmax collect. Both paths are
  value-identical (``bpe_check`` forces the distributed path and
  compares).
- determinism: the winning pair maximizes count with ties broken by the
  lexicographically SMALLEST (left, right) pair, on both paths.

Non-SQL-expressible (iterative argmax); correctness is gated by
``bpe_check`` parity and the planted-corpus unit tests.
"""

from __future__ import annotations

import re
from collections import Counter

import numpy as np
import pandas as pd
import pyarrow as pa

_TOKEN_RE = re.compile(r"[A-Za-z0-9]+")


def _apply_merge(seg: tuple, left: str, right: str) -> tuple:
    """Left-to-right single-pass merge of adjacent (left, right) pairs —
    the standard BPE apply rule (overlaps resolve leftmost-first)."""
    out = []
    i = 0
    n = len(seg)
    while i < n:
        if i + 1 < n and seg[i] == left and seg[i + 1] == right:
            out.append(left + right)
            i += 2
        else:
            out.append(seg[i])
            i += 1
    return tuple(out)


def _pair_counts(segs: dict, freqs: dict) -> Counter:
    pc = Counter()
    for w, n in freqs.items():
        s = segs[w]
        for i in range(len(s) - 1):
            pc[(s[i], s[i + 1])] += n
    return pc


def bpe_reference(freqs: dict, n_merges: int) -> list:
    """Single-process exact BPE trainer (the parity oracle)."""
    segs = {w: tuple(w) for w in freqs}
    merges = []
    for _ in range(n_merges):
        pc = _pair_counts(segs, freqs)
        if not pc:
            break
        best = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        segs = {w: _apply_merge(s, *best) for w, s in segs.items()}
    return merges


def bpe_encode_word(word: str, rank: dict) -> tuple:
    """Apply learned merges to one word by ascending merge rank — the
    standard BPE encode loop (lowest-rank applicable merge first)."""
    seg = tuple(word)
    while len(seg) > 1:
        pairs = [(seg[i], seg[i + 1]) for i in range(len(seg) - 1)]
        ranked = [(rank[p], p) for p in pairs if p in rank]
        if not ranked:
            break
        _, best = min(ranked)
        seg = _apply_merge(seg, *best)
    return seg


def word_freqs(sf_dir: str, num_partitions: int | None = None):
    """Distinct word-frequency table over documents: per-batch
    value_counts partials, one bucketed word-hash combine, MATERIALIZED
    (the one pass over the raw corpus that training amortizes)."""
    import zlib

    import ray.data as rd

    from .common import cluster_partitions

    if num_partitions is None:
        num_partitions = cluster_partitions()
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["text"])

    wf_sch = pa.schema([("word", pa.string()), ("n", pa.int64())])

    def partial(df: pd.DataFrame) -> pa.Table:
        vc = df["text"].str.findall(_TOKEN_RE).explode().dropna()
        if len(vc) == 0:
            return wf_sch.empty_table().append_column(
                "part", pa.array([], pa.int32())
            )
        g = vc.value_counts()
        words = g.index.to_numpy(dtype=object)
        parts = np.fromiter(
            (zlib.crc32(w.encode()) % num_partitions for w in words),
            dtype=np.int32, count=len(words),
        )
        return pa.table({
            "word": pa.array(words, pa.string()),
            "n": pa.array(g.to_numpy(np.int64)),
            "part": pa.array(parts, pa.int32()),
        })

    def combine(df: pd.DataFrame) -> pa.Table:
        if len(df) == 0:
            return wf_sch.empty_table()
        g = df.groupby("word", as_index=False)["n"].sum()
        return pa.table({
            "word": pa.array(g["word"].astype(str)),
            "n": pa.array(g["n"].to_numpy(np.int64)),
        }, schema=wf_sch)

    return (
        ds.map_batches(partial, batch_format="pandas")
        .groupby("part")
        .map_groups(combine, batch_format="pandas")
        .materialize()
    )


def _train_distributed(wf, n_merges: int, num_partitions: int):
    """Per round: one map over the distributed (word, n, seg) table emits
    adjacent-pair count partials; one bounded combine + tiny collect picks
    the argmax pair; the merge broadcasts back into the next map. Only
    |pair vocab| rows ever concentrate."""
    import ray

    from .common import bucketed_sum_combine

    seg_sch = pa.schema([
        ("word", pa.string()), ("n", pa.int64()),
        ("seg", pa.list_(pa.string())),
    ])

    def init_seg(df: pd.DataFrame) -> pa.Table:
        return pa.table({
            "word": pa.array(df["word"].astype(str)),
            "n": pa.array(df["n"].to_numpy(np.int64)),
            "seg": pa.array([list(w) for w in df["word"]],
                            pa.list_(pa.string())),
        }, schema=seg_sch)

    words = wf.map_batches(init_seg, batch_format="pandas").materialize()

    pair_sch = pa.schema([
        ("left", pa.string()), ("right", pa.string()), ("n", pa.int64()),
    ])
    merges = []
    for _ in range(n_merges):
        def pair_partial(df: pd.DataFrame) -> pa.Table:
            pc = Counter()
            for s, n in zip(df["seg"], df["n"]):
                n = int(n)
                for i in range(len(s) - 1):
                    pc[(s[i], s[i + 1])] += n
            if not pc:
                return pair_sch.empty_table()
            ks = list(pc.keys())
            return pa.table({
                "left": pa.array([k[0] for k in ks], pa.string()),
                "right": pa.array([k[1] for k in ks], pa.string()),
                "n": pa.array([pc[k] for k in ks], pa.int64()),
            }, schema=pair_sch)

        counts = bucketed_sum_combine(
            words.map_batches(pair_partial, batch_format="pandas"),
            keys=["left", "right"], sum_cols=["n"], schema=pair_sch,
            num_partitions=num_partitions,
        ).to_pandas()
        if len(counts) == 0:
            break
        counts = counts.sort_values(
            ["n", "left", "right"], ascending=[False, True, True],
            kind="mergesort",
        )
        best = (str(counts["left"].iloc[0]), str(counts["right"].iloc[0]))
        merges.append(best)
        bref = ray.put(best)

        def apply(df: pd.DataFrame) -> pa.Table:
            lf, rt = ray.get(bref)
            return pa.table({
                "word": pa.array(df["word"].astype(str)),
                "n": pa.array(df["n"].to_numpy(np.int64)),
                "seg": pa.array(
                    [list(_apply_merge(tuple(s), lf, rt))
                     for s in df["seg"]],
                    pa.list_(pa.string()),
                ),
            }, schema=seg_sch)

        words = words.map_batches(apply, batch_format="pandas").materialize()
    return merges


_MERGES_SCHEMA = pa.schema([
    ("rank", pa.int64()), ("left", pa.string()), ("right", pa.string()),
    ("merged", pa.string()),
])


def _merges_table(merges: list) -> pa.Table:
    return pa.table({
        "rank": pa.array(np.arange(len(merges), dtype=np.int64)),
        "left": pa.array([m[0] for m in merges], pa.string()),
        "right": pa.array([m[1] for m in merges], pa.string()),
        "merged": pa.array([m[0] + m[1] for m in merges], pa.string()),
    }, schema=_MERGES_SCHEMA)


def bpe_train(sf_dir: str, n_merges: int = 10,
              driver_vocab_max: int = 100_000,
              num_partitions: int | None = None) -> pa.Table:
    """Learned merge rules (rank, left, right, merged). Cost-based: the
    materialized vocabulary's count is free — at or under
    ``driver_vocab_max`` distinct words the exact local loop runs on one
    collect; above it every round is distributed. Paths are parity-gated
    by ``bpe_check``."""
    from .common import cluster_partitions

    if num_partitions is None:
        num_partitions = cluster_partitions(minimum=8)
    wf = word_freqs(sf_dir, num_partitions)
    if wf.count() <= driver_vocab_max:
        df = wf.to_pandas()
        freqs = dict(zip(df["word"], df["n"].astype(int)))
        merges = bpe_reference(freqs, n_merges)
    else:
        merges = _train_distributed(wf, n_merges, num_partitions)
    return _merges_table(merges)


def bpe_segment_count(sf_dir: str, n_merges: int = 10,
                      num_partitions: int | None = None):
    """Apply the learned tokenizer to the corpus: per document, the BPE
    token count after all merges. The merge-rank dict broadcasts once;
    each batch encodes only its DISTINCT words (memoized per batch) and
    sums segment lengths vectorized."""
    import ray
    import ray.data as rd

    merges = bpe_train(sf_dir, n_merges=n_merges,
                       num_partitions=num_partitions)
    rank = {
        (left, right): i
        for i, (left, right) in enumerate(
            zip(merges["left"].to_pylist(), merges["right"].to_pylist())
        )
    }
    rref = ray.put(rank)

    ds = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    sch = pa.schema([("doc_id", pa.int64()), ("n_bpe_tokens", pa.int64())])

    def count(df: pd.DataFrame) -> pa.Table:
        rk = ray.get(rref)
        toks = df["text"].str.findall(_TOKEN_RE)
        memo = {}
        ns = np.empty(len(df), np.int64)
        for i, words in enumerate(toks):
            total = 0
            for w in words:
                if w not in memo:
                    memo[w] = len(bpe_encode_word(w, rk))
                total += memo[w]
            ns[i] = total
        return pa.table({
            "doc_id": pa.array(df["doc_id"].to_numpy(np.int64)),
            "n_bpe_tokens": pa.array(ns),
        }, schema=sch)

    return ds.map_batches(count, batch_format="pandas")


def bpe_check(sf_dir: str, n_merges: int = 10) -> pd.DataFrame:
    """Gate: the DISTRIBUTED trainer (driver path disabled) produces the
    identical merge sequence as the single-process reference on the real
    corpus, and encoding invariants hold (tokens never exceed chars and
    merges strictly reduce the corpus token count when any merge fired)."""
    dist = bpe_train(sf_dir, n_merges=n_merges, driver_vocab_max=0)
    wf = word_freqs(sf_dir).to_pandas()
    freqs = dict(zip(wf["word"], wf["n"].astype(int)))
    want = bpe_reference(freqs, n_merges)
    got = list(zip(dist["left"].to_pylist(), dist["right"].to_pylist()))

    rank = {m: i for i, m in enumerate(want)}
    enc = {w: bpe_encode_word(w, rank) for w in freqs}
    n_char = sum(len(w) * n for w, n in freqs.items())
    n_tok = sum(len(enc[w]) * n for w, n in freqs.items())
    return pd.DataFrame({
        "merges_parity_ok": [int(got == want)],
        "n_merges_ok": [int(len(got) == n_merges)],
        "tokens_le_chars_ok": [int(n_tok <= n_char)],
        "merges_reduce_ok": [int(n_tok < n_char if want else n_tok == n_char)],
    })
