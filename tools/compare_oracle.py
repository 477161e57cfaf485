#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Runs after `sbt "runMain graft.Verify <sfDir> <outDir>"`:
for each query parquet in <outDir>, executes the matching oracle SQL from
oracle_sql.json in DuckDB (tables = parquet files in <sfDir>) and compares
values with columns sorted by name — both row-order-sensitive and
order-insensitive verdicts are reported.

Usage: python3 tools/compare_oracle.py <sfDir> <outDir>
"""
import json, os, sys, glob
import duckdb
import pandas as pd
import numpy as np

def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize datetimes to ns, decimals to float-insensitive strings
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime64"):
            df[c] = pd.to_datetime(df[c]).astype("datetime64[us]")
        elif df[c].dtype == object:
            df[c] = df[c].map(lambda v: str(v) if v is not None else None)
    return df

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for p in glob.glob(os.path.join(sf_dir, "*.parquet")):
        name = os.path.basename(p)[:-8]
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    n_pass = n_fail = 0
    for q, sql in sorted(oracle.items()):
        got_dir = os.path.join(out_dir, q)
        if not os.path.isdir(got_dir):
            print(f"FAIL {q}: no output dir"); n_fail += 1; continue
        try:
            got = norm(pd.read_parquet(got_dir))
            rel = con.sql(sql)
            # DuckDB returns HUGEINT (int128) for un-cast SUM-derived
            # expressions; the driver's hash canonicalization renders those
            # differently from Spark's int64 (hash-only mismatch with
            # matching rows). Fail here so the CAST lands before the driver.
            hug = [c for c, t in zip(rel.columns, rel.types)
                   if str(t) in ("HUGEINT", "UHUGEINT")]
            if hug:
                print(f"FAIL {q}: oracle returns HUGEINT column(s) {hug} — "
                      f"add CAST(... AS BIGINT) in the oracle SQL")
                n_fail += 1; continue
            want = norm(rel.df())
        except Exception as e:
            print(f"FAIL {q}: {e}"); n_fail += 1; continue
        status = []
        if list(got.columns) != list(want.columns):
            print(f"FAIL {q}: columns {list(got.columns)} vs {list(want.columns)}")
            n_fail += 1; continue
        if len(got) != len(want):
            print(f"FAIL {q}: rows {len(got)} vs {len(want)}")
            n_fail += 1; continue
        def eq(a, b):
            try:
                pd.testing.assert_frame_equal(
                    a.reset_index(drop=True), b.reset_index(drop=True),
                    check_dtype=False, check_exact=True)
                return True
            except AssertionError as e:
                return str(e).splitlines()[0]
        ordered = eq(got, want)
        key = list(got.columns)
        unordered = ordered if ordered is True else eq(
            got.sort_values(key, ignore_index=True),
            want.sort_values(key, ignore_index=True))
        if ordered is True:
            print(f"PASS {q} ({len(got)} rows)"); n_pass += 1
        elif unordered is True:
            print(f"WARN {q}: values match only after row sort — fix ORDER BY")
            n_fail += 1
        else:
            print(f"FAIL {q}: {unordered}")
            n_fail += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
