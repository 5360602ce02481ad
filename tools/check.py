#!/usr/bin/env python3
"""Local replica of the driver's correctness gate (NOT part of the library).

Usage: python3 tools/check.py <outDir> [sfDir]
  1. expects `sbt "runMain graft.Verify <sfDir> <outDir>"` to have been run
  2. registers each testdata parquet as a DuckDB view named after the table
  3. runs every SQL in <outDir>/oracle_sql.json
  4. canonicalizes both sides (columns sorted by name, rows sorted by all
     columns, values stringified) and diffs

Exit 0 iff every query matches.
"""
import json
import sys

import duckdb
import pandas as pd
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    str_df = df.astype(str)
    order = str_df.sort_values(by=list(str_df.columns)).index
    return str_df.loc[order].reset_index(drop=True)


def main() -> int:
    out_dir = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_fail = 0
    import os
    dumped = {d for d in os.listdir(out_dir) if not d.endswith(".json")}
    for extra in sorted(dumped - set(oracle)):
        try:
            n = pq.read_table(f"{out_dir}/{extra}").num_rows
            print(f"INFO {extra}: rows-only check ({n} rows, no oracle)")
        except Exception as e:
            print(f"FAIL {extra}: unreadable rows-only output ({e})")
            n_fail += 1
    for name, sql in sorted(oracle.items()):
        try:
            got = pq.read_table(f"{out_dir}/{name}").to_pandas()
        except Exception as e:
            print(f"FAIL {name}: spark output missing ({e})")
            n_fail += 1
            continue
        try:
            exp = con.execute(sql).df()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            n_fail += 1
            continue
        g, x = canon(got), canon(exp)
        if list(g.columns) != list(x.columns):
            print(f"FAIL {name}: columns spark={list(g.columns)} duckdb={list(x.columns)}")
            n_fail += 1
            continue
        if len(g) != len(x):
            print(f"FAIL {name}: rows spark={len(g)} duckdb={len(x)}")
            n_fail += 1
            continue
        if not g.equals(x):
            neq = (g != x).any(axis=1)
            idx = neq[neq].index[:3]
            print(f"FAIL {name}: {int(neq.sum())}/{len(g)} rows differ; first diffs:")
            for i in idx:
                for c in g.columns:
                    if g.at[i, c] != x.at[i, c]:
                        print(f"  row {i} col {c}: spark={g.at[i, c]!r} duckdb={x.at[i, c]!r}")
            n_fail += 1
            continue
        # dtype check (the driver also schema-compares)
        raw_exp = con.execute(sql).df()
        raw_got = pq.read_table(f"{out_dir}/{name}").to_pandas()
        dt_g = {c: str(raw_got[c].dtype) for c in raw_got.columns}
        dt_x = {c: str(raw_exp[c].dtype) for c in raw_exp.columns}
        warn = {c: (dt_g[c], dt_x[c]) for c in dt_g if dt_g.get(c) != dt_x.get(c)}
        tag = f" [dtype warn: {warn}]" if warn else ""
        print(f"PASS {name} ({len(g)} rows){tag}")
    print(f"{'ALL PASS' if n_fail == 0 else f'{n_fail} FAILURES'} "
          f"({len(oracle)} queries)")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
