#!/usr/bin/env python3
"""Local replica of the round driver's correctness gate.

Usage: python3 tools/check_correctness.py <sfDir> <verifyOutDir>

For each entry in <verifyOutDir>/oracle_sql.json: run the SQL in DuckDB
with the sf dir's parquet files registered as tables, load the Spark dump
from <verifyOutDir>/<name>/, sort columns by name and rows by all columns,
and compare row count, column names, and values.

Dev tool only (driver-side python env); not part of the Scala library.
"""
import sys, json, glob, math

import duckdb
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            if isinstance(v, float):
                if math.isnan(v):
                    v = "NaN"
                else:
                    v = round(v, 9)
            vals.append(str(v))
        out.append(tuple(vals))
    out.sort()
    return [cols[i] for i in order], out


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            res = con.execute(sql)
            duck_cols = [d[0] for d in res.description]
            duck_rows = res.fetchall()
            files = glob.glob(f"{out_dir}/{name}/*.parquet")
            tbl = pq.read_table(files[0]) if len(files) == 1 else \
                pq.read_table(f"{out_dir}/{name}")
            spark_cols = tbl.column_names
            spark_rows = [tuple(r[c] for c in spark_cols)
                          for r in tbl.to_pylist()]
            dc, dr = canon(duck_rows, duck_cols)
            sc, sr = canon(spark_rows, spark_cols)
            if dc != sc:
                print(f"FAIL {name}: columns differ duck={dc} spark={sc}")
                n_fail += 1
            elif len(dr) != len(sr):
                print(f"FAIL {name}: rows duck={len(dr)} spark={len(sr)}")
                n_fail += 1
            elif dr != sr:
                diff = [i for i, (a, b) in enumerate(zip(dr, sr)) if a != b]
                print(f"FAIL {name}: {len(diff)} differing rows of {len(dr)}; "
                      f"first: duck={dr[diff[0]]} spark={sr[diff[0]]}")
                n_fail += 1
            else:
                print(f"PASS {name} ({len(dr)} rows)")
                n_pass += 1
        except Exception as e:
            print(f"ERROR {name}: {e}")
            n_fail += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
