#!/usr/bin/env python3
"""Local stand-in for the driver's t2 gate: run each oracle SQL in DuckDB
against the same parquet testdata and compare with the Spark output that
graft.Verify dumped. Usage:

    python3 tools/selfcheck.py /root/testdata/sf0.01 /tmp/verify_out

Run `sbt "runMain graft.Verify <sfDir> <outDir>"` first.
Not part of the engine — builder-side verification tooling only.
"""
import json
import math
import os
import struct
import sys

import duckdb

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def connect(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    return con


def norm(df):
    df = df[sorted(df.columns)].reset_index(drop=True)
    return df


def compare(name, spark_df, oracle_df):
    problems = []
    sc, oc = sorted(spark_df.columns), sorted(oracle_df.columns)
    if sc != oc:
        problems.append(f"columns differ: spark={sc} oracle={oc}")
        return problems
    if len(spark_df) != len(oracle_df):
        problems.append(f"row count differs: spark={len(spark_df)} oracle={len(oracle_df)}")
        return problems
    s, o = norm(spark_df), norm(oracle_df)
    for c in s.columns:
        sv, ov = s[c], o[c]
        try:
            import pandas.api.types as pt
            if pt.is_numeric_dtype(sv) and pt.is_numeric_dtype(ov):
                # BIT-EXACT, like the driver's hash gate: any tolerance here
                # is strictly weaker than the driver and can mask real
                # divergence (round 2 shipped a -0.0 vs +0.0 failure that
                # |a-b| <= 1e-9 called equal). NaN==NaN allowed; -0.0 != +0.0.
                bad = 0
                first = None
                for a, b in zip(sv.astype(float), ov.astype(float)):
                    an, bn = math.isnan(a), math.isnan(b)
                    if an and bn:
                        continue
                    if an != bn or struct.pack("<d", a) != struct.pack("<d", b):
                        bad += 1
                        if first is None:
                            first = (a, b)
                if bad:
                    problems.append(f"col {c}: {bad} numeric mismatches (first: spark={first[0]!r} oracle={first[1]!r})")
            else:
                neq = (sv.astype(str) != ov.astype(str))
                if neq.any():
                    i = neq.idxmax()
                    problems.append(f"col {c}: {int(neq.sum())} mismatches (row {i}: spark={sv[i]!r} oracle={ov[i]!r})")
        except Exception as e:
            problems.append(f"col {c}: compare error {e}")
    return problems


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    with open(os.path.join(out_dir, "oracle_sql.json")) as f:
        oracles = json.load(f)
    con = connect(sf_dir)
    spark_results = {}
    for name in sorted(os.listdir(out_dir)):
        d = os.path.join(out_dir, name)
        if os.path.isdir(d):
            spark_results[name] = d
    n_pass = n_fail = n_noracle = 0
    for name, d in spark_results.items():
        spark_df = duckdb.connect().execute(
            f"SELECT * FROM read_parquet('{d}/*.parquet')").df()
        if name not in oracles:
            n_noracle += 1
            print(f"[rows-only] {name}: {len(spark_df)} rows (no oracle)")
            if len(spark_df) == 0:
                print(f"  !! WARNING: 0 rows")
            continue
        try:
            oracle_df = con.execute(oracles[name]).df()
        except Exception as e:
            n_fail += 1
            print(f"[FAIL] {name}: oracle SQL error: {e}")
            continue
        problems = compare(name, spark_df, oracle_df)
        if problems:
            n_fail += 1
            print(f"[FAIL] {name}:")
            for p in problems:
                print(f"   {p}")
        else:
            n_pass += 1
            print(f"[ok]   {name}: {len(spark_df)} rows match")
    missing = set(oracles) - set(spark_results)
    for name in sorted(missing):
        n_fail += 1
        print(f"[FAIL] {name}: oracle present but no spark output")
    print(f"\n{n_pass} pass, {n_fail} fail, {n_noracle} rows-only")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
