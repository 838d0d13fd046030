"""Local stand-in for the driver's correctness gate: run every queries()
entry at a given sf and compare SQL-oracled ones against DuckDB
(row count + order-insensitive, column-name-sorted value comparison).

Usage: python scripts/check_queries.py [sf_dir] [-k substr]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import duckdb  # noqa: E402
import pandas as pd  # noqa: E402


def to_pandas(result) -> pd.DataFrame:
    import pyarrow as pa

    if isinstance(result, pd.DataFrame):
        return result
    if isinstance(result, pa.Table):
        return result.to_pandas()
    return result.to_pandas()  # ray Dataset


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        if str(df[c].dtype).startswith("float"):
            df[c] = df[c].round(6)
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 and not sys.argv[1].startswith("-") else "/root/testdata/sf0.001"
    only = None
    if "-k" in sys.argv:
        only = sys.argv[sys.argv.index("-k") + 1]

    import ray

    ray.init(address="local", num_cpus=8, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    import ray.data as rd  # noqa: F401
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
    import __ray_entry__ as entrymod

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()

    con = duckdb.connect()
    for t in ("region nation customer supplier part orders lineitem events "
              "documents embeddings").split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    n_ok = n_bad = 0
    for name, fn in qs.items():
        if only and only not in name:
            continue
        t0 = time.time()
        try:
            result = to_pandas(fn(sf_dir))
        except Exception as e:
            import traceback

            print(f"ERROR {name}: {type(e).__name__}: {e}")
            traceback.print_exc(limit=6)
            n_bad += 1
            continue
        dt = time.time() - t0
        if name not in oracles:
            print(f"rows-only {name}: {len(result)} rows ({dt:.1f}s)")
            continue
        want = con.execute(oracles[name]).fetchdf()
        got_c, want_c = canon(result), canon(want)
        status = "OK"
        detail = ""
        if list(got_c.columns) != list(want_c.columns):
            status = "SCHEMA-MISMATCH"
            detail = f" got={list(got_c.columns)} want={list(want_c.columns)}"
        elif len(got_c) != len(want_c):
            status = "ROWCOUNT-MISMATCH"
            detail = f" got={len(got_c)} want={len(want_c)}"
        elif not got_c.equals(want_c):
            try:
                cmp = got_c.compare(want_c)
                detail = f" diff rows={len(cmp)}:\n{cmp.head(5)}"
            except Exception:
                detail = f"\n got:\n{got_c.head(5)}\n want:\n{want_c.head(5)}"
            status = "VALUE-MISMATCH"
        if status == "OK":
            n_ok += 1
        else:
            n_bad += 1
        print(f"{status} {name}: {len(got_c)} rows ({dt:.1f}s){detail}")
    print(f"--- {n_ok} OK, {n_bad} failed")
    ray.shutdown()


if __name__ == "__main__":
    main()
