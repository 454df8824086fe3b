#!/usr/bin/env python3
"""Local dev harness mimicking the driver's correctness gate:
runs graft.Verify output against the DuckDB oracle on the same parquet
tables, sorts columns by name, sorts rows, and compares values exactly.

Usage: python3 scripts/check.py <verifyOutDir> <sfDir> [query ...]
"""
import json
import math
import os
import sys

import duckdb
import pyarrow.dataset as ds

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    return repr(v)


def rows_of(cols, data):
    # dict col -> list; produce sorted list of tuples over name-sorted cols
    names = sorted(cols)
    n = len(data[names[0]]) if names else 0
    rows = [tuple(norm(data[c][i]) for c in names) for i in range(n)]
    return names, sorted(rows)


def main():
    out_dir, sf_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        qdir = f"{out_dir}/{name}"
        if not os.path.isdir(qdir):
            print(f"FAIL {name}: no spark output dir")
            n_fail += 1
            continue
        try:
            spark_tbl = ds.dataset(qdir, format="parquet").to_table()
            spark_data = spark_tbl.to_pydict()
            spark_cols = spark_tbl.column_names
            duck_tbl = con.execute(sql).fetch_arrow_table()
            duck_data = duck_tbl.to_pydict()
            duck_cols = duck_tbl.column_names
        except Exception as e:
            print(f"FAIL {name}: exec error: {e}")
            n_fail += 1
            continue
        if sorted(spark_cols) != sorted(duck_cols):
            print(f"FAIL {name}: columns spark={sorted(spark_cols)} duck={sorted(duck_cols)}")
            n_fail += 1
            continue
        sn, srows = rows_of(spark_cols, spark_data)
        dn, drows = rows_of(duck_cols, duck_data)
        if len(srows) != len(drows):
            print(f"FAIL {name}: rowcount spark={len(srows)} duck={len(drows)}")
            n_fail += 1
            continue
        bad = [(i, a, b) for i, (a, b) in enumerate(zip(srows, drows)) if a != b]
        if bad:
            i, a, b = bad[0]
            print(f"FAIL {name}: {len(bad)}/{len(srows)} rows differ; first at {i}:")
            print(f"  cols : {sn}")
            print(f"  spark: {a}")
            print(f"  duck : {b}")
            n_fail += 1
        else:
            # schema drift report (informational — driver may hash dtypes)
            st = {f.name: str(f.type) for f in spark_tbl.schema}
            dt = {f.name: str(f.type) for f in duck_tbl.schema}
            drift = {c: (st[c], dt[c]) for c in st if st[c] != dt[c]}
            note = f"  [type drift: {drift}]" if drift else ""
            print(f"PASS {name} ({len(srows)} rows){note}")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
