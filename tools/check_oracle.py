#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run graft.Verify first
(sbt "runMain graft.Verify <sfDir> <outDir>"), then this script loads each
query's parquet dump, runs the corresponding oracle SQL in DuckDB over the
same sf tables, and compares (rows, columns, values) order-insensitively.

Usage: python3 tools/check_oracle.py <sfDir> <outDir>
"""
import json
import math
import sys

import duckdb
import pyarrow.parquet as pq


def canon(rows, cols):
    """Sort columns by name, stringify values, sort rows."""
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in idx:
            v = r[i]
            if isinstance(v, float):
                if math.isnan(v):
                    vals.append("nan")
                else:
                    vals.append(repr(v))
            elif v is None:
                vals.append("NULL")
            else:
                vals.append(str(v))
        out.append(tuple(vals))
    out.sort()
    return [cols[i] for i in idx], out


def main(sf_dir, out_dir):
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            tbl = pq.read_table(f"{out_dir}/{name}")
            got_cols = tbl.column_names
            got_rows = [tuple(r[c] for c in got_cols) for r in tbl.to_pylist()]
            res = con.execute(sql)
            exp_cols = [d[0] for d in res.description]
            exp_rows = res.fetchall()
            gc, gr = canon(got_rows, got_cols)
            ec, er = canon(exp_rows, exp_cols)
            if gc != ec:
                print(f"FAIL {name}: columns differ: spark={gc} duckdb={ec}")
                n_fail += 1
            elif gr != er:
                diff1 = [r for r in gr if r not in set(er)][:3]
                diff2 = [r for r in er if r not in set(gr)][:3]
                print(f"FAIL {name}: rows differ: spark={len(gr)} duckdb={len(er)}")
                print(f"  spark-only: {diff1}")
                print(f"  duckdb-only: {diff2}")
                n_fail += 1
            else:
                print(f"PASS {name} ({len(gr)} rows)")
                n_pass += 1
        except Exception as e:
            print(f"FAIL {name}: {type(e).__name__}: {str(e)[:300]}")
            n_fail += 1
    print(f"== {n_pass} passed, {n_fail} failed ==")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
