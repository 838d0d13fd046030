"""Vectorized batch kernels shared across pipelines — the hot-path helpers
that every map_batches body otherwise reimplements:

- half-up integer-cents money rounding (exact, summation-order-independent)
- crc32 bucket assignment (the shuffle-bucketing key used by kg / sessions)
- UTF-16-BE sort keys (C#-ordinal-compatible distributed sorts)
- L2 row normalization (cosine pipelines)
- mix64 / u64_sort_key (uniform uint64 priorities from ids + the
  order-preserving int64 view that Arrow sorts can key on)
"""

from __future__ import annotations

import zlib

import numpy as np
import pyarrow as pa


def money_cents(values, out_dtype: str = "int64"):
    """Half-up rounding to integer cents: floor(x*100 + 0.5).

    This is the engine's money contract (CLAUDE.md): integer-cents sums are
    exact regardless of float summation order across batches/workers, and
    half-up matches DuckDB's floor(x*100+0.5) oracle exactly — unlike
    numpy/Python round() (half-even)."""
    arr = np.asarray(values, dtype=np.float64)
    return np.floor(arr * 100 + 0.5).astype(out_dtype)


def crc32_buckets(values, num_buckets: int) -> np.ndarray:
    """Stable bucket id per value: crc32(str(v)) % num_buckets. The standard
    shuffle-bucketing key (kg conv_id, user sessions): P buckets ~ 2x cores
    keep every core busy without per-group Ray overhead."""
    it = (
        zlib.crc32(v if isinstance(v, bytes) else str(v).encode("utf-8"))
        % num_buckets
        for v in values
    )
    return np.fromiter(it, dtype=np.int32, count=len(values))


def utf16_sort_keys(strings) -> pa.Array:
    """UTF-16-BE byte keys: sorting these bytewise equals sorting by UTF-16
    code units (the reference's C# ordinal order, kernel utf16_key) — use as
    the sort column for distributed sorts that must match kernel canonical
    order even for astral-plane / U+E000..U+FFFF mixtures."""
    return pa.array(
        [s.encode("utf-16-be") for s in strings], pa.binary()
    )


def l2_normalize_rows(mat: np.ndarray) -> np.ndarray:
    """Row-wise L2 normalization with zero-row safety (cosine = dot after)."""
    mat = np.asarray(mat, dtype=np.float64)
    norms = np.linalg.norm(mat, axis=1)
    norms[norms == 0] = 1.0
    return mat / norms[:, None]


_FMIX64_C1 = np.uint64(0xFF51AFD7ED558CCD)
_FMIX64_C2 = np.uint64(0xC4CEB9FE1A85EC53)


def mix64(values) -> np.ndarray:
    """MurmurHash3 fmix64 finalizer over a uint64 array: sequential or
    structured ids in, uniform 64-bit priorities out (bottom-k sampling,
    sketch column hashing). Wraps mod 2^64 by construction."""
    h = np.asarray(values).astype(np.uint64)
    with np.errstate(over="ignore"):
        h = h ^ (h >> np.uint64(33))
        h = h * _FMIX64_C1
        h = h ^ (h >> np.uint64(33))
        h = h * _FMIX64_C2
        h = h ^ (h >> np.uint64(33))
    return h


def u64_sort_key(values) -> np.ndarray:
    """Order-preserving int64 view of uint64 values (top bit flipped), so
    Arrow/pandas int64 sorts equal unsigned order — Ray sort columns have
    no uint64 type."""
    h = np.asarray(values).astype(np.uint64)
    return (h ^ np.uint64(1 << 63)).view(np.int64)


_BLOOM_SALT = np.uint64(0xA5A5A5A5A5A5A5A5)


def bloom_positions(keys, m_bits: int):
    """k=2 Bloom bit positions per uint64 key: two independent mix64
    probes masked to the (power-of-two) bitmap width."""
    # non-power-of-two widths silently strand bits (mask loses positions);
    # <64 bits yields a zero-word bitmap — fail loudly instead
    assert m_bits >= 64 and m_bits & (m_bits - 1) == 0, m_bits
    mask = np.uint64(m_bits - 1)
    k = np.asarray(keys).astype(np.uint64)
    return (mix64(k) & mask), (mix64(k ^ _BLOOM_SALT) & mask)


def bloom_set(words: np.ndarray, keys, m_bits: int) -> np.ndarray:
    """Set the Bloom bits for ``keys`` in the uint64 word array, in place.
    ``words`` must have m_bits/64 entries."""
    for idx in bloom_positions(keys, m_bits):
        np.bitwise_or.at(
            words, (idx >> np.uint64(6)).astype(np.int64),
            np.uint64(1) << (idx & np.uint64(63)),
        )
    return words


def bloom_test(words: np.ndarray, keys, m_bits: int) -> np.ndarray:
    """Vectorized membership probe: bool per key (false = definitely not
    present; true = present or false positive)."""
    hit = np.ones(len(keys), dtype=bool)
    for idx in bloom_positions(keys, m_bits):
        hit &= (
            (words[(idx >> np.uint64(6)).astype(np.int64)]
             >> (idx & np.uint64(63))) & np.uint64(1)
        ).astype(bool)
    return hit


def append_mod_part(batch: pa.Table, col: str, num_partitions: int,
                    out: str = "part") -> pa.Table:
    """Append the int-key shuffle bucket column batch[col] % num_partitions
    (int32, non-negative for non-negative keys) — the standard pre-shuffle
    step for integer keys (user_id, custkey); crc32_buckets is the string
    twin."""
    k = np.asarray(batch[col].to_pylist(), dtype=np.int64)
    return batch.append_column(
        out, pa.array((k % num_partitions).astype(np.int32), pa.int32())
    )
