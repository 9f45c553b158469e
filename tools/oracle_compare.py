#!/usr/bin/env python3
"""Builder-side oracle compare for touched queries (mirrors the driver's
DuckDB check): run graft.Verify for the named queries at a scale factor,
then compare each dumped parquet against the query's oracleSql executed
by DuckDB over the same testdata.

Usage: python3 tools/oracle_compare.py <sfDir> <verifyOutDir> <query> [query...]
(Verify must already have dumped into <verifyOutDir>.)
"""
import json
import sys

import duckdb


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    queries = sys.argv[3:]
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracle = json.load(f)
    con = duckdb.connect()
    for table in ("documents", "embeddings", "events", "lineitem", "orders",
                  "customer", "part", "supplier", "nation", "region"):
        try:
            con.execute(
                f"CREATE VIEW {table} AS SELECT * FROM "
                f"read_parquet('{sf_dir}/{table}.parquet')")
        except Exception:
            pass
    failures = 0
    for q in queries:
        if q not in oracle:
            print(f"[cmp] {q}: NO ORACLE (dump-only query), skipping")
            continue
        try:
            got = con.execute(
                f"SELECT * FROM read_parquet('{out_dir}/{q}/*.parquet')"
            ).fetchall()
            want = con.execute(oracle[q]).fetchall()
        except Exception as e:
            print(f"[cmp] {q}: ERROR {e}")
            failures += 1
            continue

        def norm(rows):
            out = []
            for r in rows:
                out.append(tuple(
                    round(v, 9) if isinstance(v, float) else
                    (v.hex() if isinstance(v, (bytes, bytearray)) else v)
                    for v in r))
            return sorted(out, key=repr)

        g, w = norm(got), norm(want)
        if g == w:
            print(f"[cmp] {q}: OK ({len(g)} rows)")
        else:
            failures += 1
            print(f"[cmp] {q}: MISMATCH spark={len(g)} oracle={len(w)}")
            sg, sw = set(g), set(w)
            for r in list(sg - sw)[:5]:
                print(f"       spark-only: {r}")
            for r in list(sw - sg)[:5]:
                print(f"       oracle-only: {r}")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
