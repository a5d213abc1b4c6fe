#!/usr/bin/env python3
"""Local mirror of the driver's t2 gate (SURVEY §5.2).

Usage: python3 tools/check_correctness.py <verify_out_dir> [sf_dir]

Reads <verify_out_dir>/<name>/ parquet (written by graft.Verify) and
<verify_out_dir>/oracle_sql.json, replays each SQL in DuckDB over the
sf_dir tables, and compares values exactly (columns sorted by name,
rows in materialized order). Exit 0 iff every declared query matches.

Driver-side only tooling (python3 + duckdb 1.0.0 are on this box);
not part of the Spark library.
"""
import glob
import json
import math
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    if isinstance(v, (list, tuple)):
        return tuple(canon(x) for x in v)
    if hasattr(v, "isoformat"):
        return v.isoformat()
    return v


def fetch(con, sql):
    cur = con.execute(sql)
    cols = [d[0] for d in cur.description]
    rows = cur.fetchall()
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return [cols[i] for i in order], [tuple(canon(r[i]) for i in order) for r in rows]


def main():
    out_dir = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracle = json.load(f)

    failures = []
    for name, sql in sorted(oracle.items()):
        files = sorted(glob.glob(f"{out_dir}/{name}/*.parquet"))
        if not files:
            failures.append((name, "no spark output"))
            print(f"FAIL {name}: no spark output parquet")
            continue
        try:
            scols, srows = fetch(
                con, f"SELECT * FROM read_parquet({files!r})")
            ocols, orows = fetch(con, sql)
        except Exception as e:
            failures.append((name, str(e)))
            print(f"FAIL {name}: {e}")
            continue
        # The driver's pandas-based hasher cannot sort/hash array cells
        # (round-1 CORRECTNESS err on q_agg_collect_sorted/q_array_funcs):
        # every oracle-backed query must emit scalar columns only.
        nested = [c for c, r in zip(scols, zip(*srows)) if srows
                  and any(isinstance(v, tuple) for v in r)]
        if nested:
            failures.append((name, f"array-typed output columns {nested}"))
            print(f"FAIL {name}: array-typed output columns {nested} "
                  "(driver hasher cannot handle these; serialize to string)")
            continue
        if scols != ocols:
            failures.append((name, f"cols {scols} != {ocols}"))
            print(f"FAIL {name}: columns {scols} != {ocols}")
            continue
        if len(srows) != len(orows):
            failures.append((name, f"rows {len(srows)} != {len(orows)}"))
            print(f"FAIL {name}: rowcount {len(srows)} != {len(orows)}")
            continue
        bad = None
        for i, (a, b) in enumerate(zip(srows, orows)):
            if a != b:
                bad = (i, a, b)
                break
        if bad:
            failures.append((name, f"row {bad[0]}"))
            print(f"FAIL {name}: first diff at row {bad[0]}\n  spark : {bad[1]}\n  oracle: {bad[2]}")
        else:
            print(f"PASS {name} ({len(srows)} rows)")

    # queries declared without oracle: report row counts only
    for d in sorted(glob.glob(f"{out_dir}/*/")):
        name = d.rstrip("/").split("/")[-1]
        if name not in oracle:
            files = sorted(glob.glob(f"{d}/*.parquet"))
            n = con.execute(f"SELECT count(*) FROM read_parquet({files!r})").fetchone()[0] if files else -1
            print(f"INFO {name}: no oracle declared, {n} rows")

    print(f"\n{len(oracle) - len(failures)}/{len(oracle)} oracle queries match")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
