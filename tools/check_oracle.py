"""Local stand-in for the driver's correctness gate: run every queries()
entry at a given sf_dir and compare against oracle_sql() via DuckDB
(row count + column names + order-insensitive value hash)."""

import hashlib
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import pandas as pd

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
ONLY = sys.argv[2] if len(sys.argv) > 2 else None

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def to_pandas(res):
    import pyarrow as pa

    try:
        import ray.data

        if isinstance(res, ray.data.Dataset):
            return res.to_pandas()
    except ImportError:
        pass
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


def value_hash(df: pd.DataFrame) -> str:
    df = df[sorted(df.columns)]
    rows = sorted(
        tuple(str(v) for v in row) for row in df.itertuples(index=False)
    )
    h = hashlib.sha256()
    for r in rows:
        h.update("\x1f".join(r).encode())
        h.update(b"\x1e")
    return h.hexdigest()


def main():
    import ray

    ray.init(
        address="local", num_cpus=8, include_dashboard=False,
        ignore_reinit_error=True, log_to_driver=False,
    )
    import __ray_entry__ as e

    qs = e.queries()
    oracles = e.oracle_sql()
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    n_ok = n_bad = n_rows_only = 0
    for name, fn in qs.items():
        if ONLY and ONLY not in name:
            continue
        t0 = time.time()
        try:
            got = to_pandas(fn(SF_DIR))
        except Exception as ex:
            print(f"ERROR  {name}: {type(ex).__name__}: {ex}")
            n_bad += 1
            continue
        dt = time.time() - t0
        if name not in oracles:
            print(f"rows   {name}: {len(got)} rows in {dt:.1f}s (rows-only)")
            n_rows_only += 1
            continue
        exp = con.sql(oracles[name]).df()
        ok_rows = len(got) == len(exp)
        ok_cols = sorted(got.columns) == sorted(exp.columns)
        ok_hash = ok_rows and ok_cols and value_hash(got) == value_hash(exp)
        if ok_hash:
            print(f"OK     {name}: {len(got)} rows in {dt:.1f}s")
            n_ok += 1
        else:
            n_bad += 1
            print(
                f"FAIL   {name}: rows {len(got)} vs {len(exp)}, cols "
                f"{sorted(got.columns)} vs {sorted(exp.columns)}, hash_ok={ok_hash}"
            )
            if ok_rows and ok_cols:
                merged = got[sorted(got.columns)].astype(str)
                merged2 = exp[sorted(exp.columns)].astype(str)
                print("  engine head:\n", merged.head(3).to_string())
                print("  oracle head:\n", merged2.head(3).to_string())
    print(f"\nSUMMARY ok={n_ok} fail={n_bad} rows_only={n_rows_only}")
    ray.shutdown()


if __name__ == "__main__":
    main()
