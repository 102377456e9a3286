#!/usr/bin/env python3
"""Dev-only targeted oracle diff: run one registered query through
graft.tools.DumpOne (sorted CSV on stdout) and its oracle SQL in DuckDB,
compare values. Faster than a full Verify pass when iterating on a few
queries. Usage: spotcheck.py <sfDir> <query> [<query> ...]
Requires oracle_sql.json next to it or extracts SQL live via sbt.
"""
import io
import json
import re
import subprocess
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def spark_df(sf_dir, name):
    p = subprocess.run(
        ["sbt", "-batch", f"runMain graft.tools.DumpOne {name} {sf_dir}"],
        capture_output=True, text=True, timeout=600)
    lines = [l.split("[dumpone] ", 1)[1] for l in p.stdout.splitlines()
             if "[dumpone] " in l]
    if not lines:
        print(p.stdout[-3000:], p.stderr[-2000:])
        raise SystemExit(f"{name}: no dumpone output")
    cols = lines[0].split("columns: ", 1)[1].split(",")
    body = "\n".join(lines[1:])
    return pd.read_csv(io.StringIO(body), names=cols, header=None)


def canon(df):
    df = df.reindex(sorted(df.columns), axis=1).reset_index(drop=True)
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime"):
            df[c] = df[c].astype("datetime64[us]")
        elif df[c].dtype == object:
            df[c] = df[c].astype(str).str.lower()
        elif df[c].dtype == bool:
            df[c] = df[c].astype(str).str.lower()
        else:
            df[c] = pd.to_numeric(df[c])
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)


def main():
    sf_dir, names = sys.argv[1], sys.argv[2:]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    sql_path = "/tmp/spotcheck_oracle.json"
    subprocess.run(["sbt", "-batch",
                    "runMain graft.tools.DumpOracleSql " + sql_path],
                   capture_output=True, text=True, timeout=600)
    oracle = json.load(open(sql_path))
    fails = 0
    for name in names:
        s = canon(spark_df(sf_dir, name))
        o = canon(con.execute(oracle[name]).df())
        ok_shape = list(s.columns) == list(o.columns) and len(s) == len(o)
        ok = ok_shape
        if ok_shape:
            for c in s.columns:
                a, b = s[c], o[c]
                if str(a.dtype).startswith("float") or str(b.dtype).startswith("float"):
                    a, b = pd.to_numeric(a), pd.to_numeric(b)
                    if not (((a - b).abs() < 1e-9) | (a.isna() & b.isna())).all():
                        ok = False
                elif not (a.astype(str) == b.astype(str)).all():
                    ok = False
        print(f"{name}: {'OK' if ok else 'MISMATCH'} spark={len(s)} oracle={len(o)} cols={list(s.columns)}")
        if not ok:
            fails += 1
            print("  spark:\n", s.head(8), "\n  oracle:\n", o.head(8))
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
