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
