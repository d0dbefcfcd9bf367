"""Local replica of the driver's correctness gate: run each queries() entry
and its oracle_sql() side-by-side at a given sf, compare row count, sorted
schema, and order-insensitive values."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import pandas as pd

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
ONLY = sys.argv[2:] or None

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def to_pandas(res):
    import ray.data
    import pyarrow as pa
    if isinstance(res, ray.data.Dataset):
        return res.to_pandas()
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df


def main():
    import ray
    ray.init(address="local", num_cpus=8, include_dashboard=False,
             logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False

    import __ray_entry__ as entrymod

    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if ONLY and name not in ONLY:
            continue
        try:
            got = canon(to_pandas(fn(SF_DIR)))
        except Exception as e:
            failures.append((name, f"query raised: {e!r}"))
            print(f"ERROR  {name}: {e!r}")
            continue
        if name not in oracles:
            print(f"rows-only  {name}: {len(got)} rows, cols={list(got.columns)}")
            continue
        exp = canon(con.sql(oracles[name]).df())
        status = "OK"
        detail = ""
        if list(got.columns) != list(exp.columns):
            status, detail = "SCHEMA-MISMATCH", f"{list(got.columns)} != {list(exp.columns)}"
        elif len(got) != len(exp):
            status, detail = "ROWCOUNT-MISMATCH", f"{len(got)} != {len(exp)}"
        else:
            try:
                exp2 = exp.astype(got.dtypes.to_dict(), errors="ignore")
            except Exception:
                exp2 = exp
            eq = got.reset_index(drop=True).astype(str).equals(
                exp2.reset_index(drop=True).astype(str))
            if not eq:
                status = "VALUE-MISMATCH"
                merged = got.astype(str).merge(exp2.astype(str), how="outer",
                                               indicator=True)
                bad = merged[merged["_merge"] != "both"]
                detail = f"{len(bad)} differing rows; sample:\n{bad.head(6)}"
        if status != "OK":
            failures.append((name, detail))
        print(f"{status:<18} {name}: {len(got)} rows" + (f"\n  {detail}" if detail else ""))
    ray.shutdown()
    if failures:
        print(f"\n{len(failures)} FAILURES")
        sys.exit(1)
    print("\nall oracle checks passed")


if __name__ == "__main__":
    main()
