#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: run each oracle SQL in
DuckDB over the same parquet tables and compare against the Verify.scala
parquet dumps (columns sorted by name, rows sorted, exact value compare).

Usage: python3 tools/check.py <sfDir> <verifyOutDir>
"""
import json
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize timestamp columns to int64 micros for comparison
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime64"):
            if getattr(df[c].dtype, "tz", None) is not None:
                df[c] = df[c].dt.tz_convert("UTC").dt.tz_localize(None)
            df[c] = df[c].astype("datetime64[us]")
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df


def main(sf_dir: str, out_dir: str) -> None:
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        import os
        if not os.path.isdir(f"{out_dir}/{name}"):
            print(f"SKIP {name} (no dump)")
            continue
        try:
            want = con.sql(sql).fetchdf()
            got = duckdb.sql(f"SELECT * FROM '{out_dir}/{name}/*.parquet'").fetchdf()
            # mirror the driver's strict schema compare BEFORE normalizing:
            # a tz-aware Spark timestamp vs DuckDB's naive one is a driver
            # schema_match failure (bit us in r2: q56/q57/q59), and an
            # array-typed output column crashes its pandas sort (q53)
            strict = []
            for c in sorted(set(want.columns) & set(got.columns)):
                wt, gt = str(want[c].dtype), str(got[c].dtype)
                if wt != gt and (wt.startswith("datetime") or gt.startswith("datetime")):
                    strict.append(f"{c}: spark={gt} oracle={wt}")
                if want[c].dtype == object and len(want) and any(
                        hasattr(v, "__len__") and not isinstance(v, str)
                        for v in want[c].head(3)):
                    strict.append(f"{c}: array-typed output (driver sort crashes)")
            if strict:
                print(f"FAIL {name}: driver-strict schema {strict}")
                n_fail += 1
                continue
            w, g = norm(want), norm(got)
            if list(w.columns) != list(g.columns):
                print(f"FAIL {name}: columns {list(g.columns)} != {list(w.columns)}")
                n_fail += 1
                continue
            if len(w) != len(g):
                print(f"FAIL {name}: rows {len(g)} != {len(w)}")
                n_fail += 1
                continue
            eq = w.equals(g)
            if not eq:
                # detailed diff
                bad = []
                for c in w.columns:
                    wc, gc = w[c], g[c]
                    if not wc.equals(gc):
                        neq = (wc != gc) & ~(wc.isna() & gc.isna())
                        idx = neq[neq].index[:3]
                        bad.append((c, [(i, gc[i], wc[i]) for i in idx]))
                print(f"FAIL {name}: value diff {bad}")
                n_fail += 1
            else:
                print(f"PASS {name} ({len(w)} rows)")
                n_pass += 1
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: {type(e).__name__}: {e}")
            n_fail += 1
    print(f"== {n_pass} pass / {n_fail} fail")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
