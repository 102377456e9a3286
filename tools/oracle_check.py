#!/usr/bin/env python3
"""Dev-only pre-flight for the driver's DuckDB-oracle compare.

NOT part of the Scala library (the engine has no Python dependency) — this
script just emulates the driver: it reads the parquet dumps that
`graft.Verify` wrote, runs each oracle SQL from oracle_sql.json in DuckDB
over the same sf directory, and diffs values exactly (rows sorted, columns
sorted by name), so oracle mismatches are caught before the round gate.

Usage: oracle_check.py <sfDir> <verifyOutDir>
"""
import json
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize types for comparison
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime"):
            df[c] = df[c].astype("datetime64[us]")
        elif df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)


def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_fail = 0
    # Verify records analysis-time failures as data (errors.json); surface
    # them first so an outage can never look like a clean-but-smaller run.
    try:
        errors = json.load(open(f"{out_dir}/errors.json"))
    except FileNotFoundError:
        errors = {}
    for name, msg in sorted(errors.items()):
        print(f"FAIL {name}: verify error: {msg}")
        n_fail += 1
    for name, sql in sorted(oracle.items()):
        if name in errors:
            continue  # already reported above
        try:
            got = pd.read_parquet(f"{out_dir}/{name}")
        except Exception as e:
            print(f"FAIL {name}: no spark result ({e})")
            n_fail += 1
            continue
        try:
            want = con.execute(sql).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: oracle sql error: {e}")
            n_fail += 1
            continue
        g, w = canon(got), canon(want)
        if list(g.columns) != list(w.columns):
            print(f"FAIL {name}: columns {list(g.columns)} != {list(w.columns)}")
            n_fail += 1
            continue
        if len(g) != len(w):
            print(f"FAIL {name}: rows {len(g)} != {len(w)}")
            n_fail += 1
            continue
        if list(map(str, g.dtypes)) != list(map(str, w.dtypes)):
            print(f"FAIL {name}: dtypes differ: "
                  f"{[(c, str(g[c].dtype), str(w[c].dtype)) for c in g.columns if str(g[c].dtype) != str(w[c].dtype)]}")
            n_fail += 1
            continue
        if not g.equals(w):
            neq = (g != w) & ~(g.isna() & w.isna())
            bad = neq.any(axis=1)
            print(f"FAIL {name}: {int(bad.sum())}/{len(g)} rows differ; first:")
            print(pd.concat([g[bad].head(3).assign(side="spark"),
                             w[bad].head(3).assign(side="duckdb")]))
            n_fail += 1
            continue
        print(f"OK   {name}: {len(g)} rows")
    total = len(set(oracle) | set(errors))
    print(f"{total - n_fail}/{total} queries match")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
