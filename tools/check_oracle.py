#!/usr/bin/env python3
"""Dev-only pre-flight for the driver's DuckDB correctness gate.

NOT part of the engine (the Scala library has zero Python deps) — this
mirrors what the driver does with Verify output: load each query's
parquet result, run its oracle SQL in DuckDB over the same fixture
tables, and compare values column-by-column after sorting columns by
name. Usage:

    sbt "runMain graft.Verify /root/testdata/sf0.01 /tmp/verify_out"
    python3 tools/check_oracle.py /root/testdata/sf0.01 /tmp/verify_out
"""
import json
import math
import sys

import duckdb
import pyarrow.parquet as pq
import pyarrow.dataset as ds

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    if isinstance(v, list):
        return "[" + ",".join(canon(x) for x in v) + "]"
    return repr(v)


def table_rows(tbl):
    cols = sorted(tbl.column_names)
    data = [tbl.column(c).to_pylist() for c in cols]
    return cols, [tuple(canon(x) for x in row) for row in zip(*data)] if data else (cols, [])


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    failed = []
    for name, sql in sorted(oracle.items()):
        try:
            got = ds.dataset(f"{out_dir}/{name}").to_table()
            want = con.sql(sql).arrow()
            gc, gr = table_rows(got)
            wc, wr = table_rows(want)
            if gc != wc:
                failed.append(name)
                print(f"FAIL {name}: columns {gc} != {wc}")
            elif gr != wr:
                failed.append(name)
                diffs = [i for i, (a, b) in enumerate(zip(gr, wr)) if a != b]
                print(f"FAIL {name}: rows {len(gr)} vs {len(wr)}; "
                      f"first diffs at {diffs[:3] if diffs else 'length'}")
                for i in diffs[:2]:
                    print(f"   spark : {gr[i]}")
                    print(f"   duckdb: {wr[i]}")
                if not diffs and len(gr) != len(wr):
                    print(f"   spark head: {gr[:2]}")
                    print(f"   duck  head: {wr[:2]}")
            else:
                print(f"ok   {name} ({len(gr)} rows)")
        except Exception as e:
            failed.append(name)
            print(f"ERROR {name}: {e}")
    print(f"\n{len(oracle) - len(failed)}/{len(oracle)} queries match")
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
