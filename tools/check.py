#!/usr/bin/env python3
"""Local replica of the driver's correctness gate.

Usage: python3 tools/check.py <verify_out_dir> <sf_dir>

Reads each <name>/ parquet result written by graft.Verify, runs the matching
oracle SQL from oracle_sql.json in DuckDB over the same parquet tables, and
compares: schema (column names), row count, and exact values (columns sorted
by name, rows sorted). Exit code 1 if any query mismatches.
"""
import json
import math
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        out.append(tuple(norm(r[i]) for i in order))
    out.sort(key=lambda t: tuple((x is None, str(x)) for x in t))
    return out


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    if hasattr(v, "isoformat"):
        return v.isoformat()
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, list):
        return tuple(norm(x) for x in v)
    return v


def main():
    out_dir, sf_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM "
                f"read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    failed = []
    import glob
    names = sorted(d.split("/")[-1] for d in glob.glob(f"{out_dir}/*")
                   if not d.endswith(".json"))
    for name in names:
        got_rel = con.sql(
            f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')")
        got_cols = [c.lower() for c in got_rel.columns]
        got = canon(got_rel.fetchall(), got_cols)
        if name not in oracle:
            print(f"  {name}: NO ORACLE (rows-only) rows={len(got)}")
            if len(got) == 0:
                failed.append(name + " (0 rows)")
            continue
        try:
            exp_rel = con.sql(oracle[name])
            exp_cols = [c.lower() for c in exp_rel.columns]
            exp = canon(exp_rel.fetchall(), exp_cols)
        except Exception as e:
            print(f"  {name}: ORACLE SQL ERROR: {e}")
            failed.append(name)
            continue
        if sorted(got_cols) != sorted(exp_cols):
            print(f"  {name}: SCHEMA MISMATCH spark={sorted(got_cols)} "
                  f"duck={sorted(exp_cols)}")
            failed.append(name)
        elif len(got) != len(exp):
            print(f"  {name}: ROWCOUNT {len(got)} vs {len(exp)}")
            failed.append(name)
        elif got != exp:
            bad = [(g, e) for g, e in zip(got, exp) if g != e][:3]
            print(f"  {name}: VALUE MISMATCH e.g. {bad}")
            failed.append(name)
        else:
            print(f"  {name}: OK rows={len(got)}")
    print(f"\n{len(names) - len(failed)}/{len(names)} pass")
    if failed:
        print("FAILED:", failed)
        sys.exit(1)


if __name__ == "__main__":
    main()
