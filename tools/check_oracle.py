"""Local mimic of the driver's correctness gate.

Runs every declared query on Spark and its DuckDB oracle SQL on the same
parquet fixtures, then compares row count, column-name sets, and an
order-insensitive multiset of normalized row values.

Usage: python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import os
import sys
import time
from collections import Counter

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

from multi_threaded_mapreduce_framework_spark.session import get_spark
from multi_threaded_mapreduce_framework_spark.sources import TABLES, table_path
from multi_threaded_mapreduce_framework_spark.queries import all_queries


def _norm_value(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # queries round explicitly; collapse residual ulp noise
        return f"{v:.10g}"
    if isinstance(v, (int, str, bool)):
        return v
    return str(v)


def _norm_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return Counter(
        tuple(_norm_value(row[i]) for i in order) for row in rows
    )


def check(spark, con, q, sf_dir):
    t0 = time.time()
    sdf = q.builder(spark, sf_dir)
    s_cols = sdf.columns
    s_rows = [tuple(r) for r in sdf.collect()]
    t_spark = time.time() - t0
    if not q.oracle:
        return ("ROWS-ONLY", len(s_rows), t_spark, "")
    t0 = time.time()
    cur = con.execute(q.oracle)
    d_cols = [d[0] for d in cur.description]
    d_rows = cur.fetchall()
    t_duck = time.time() - t0
    problems = []
    if sorted(s_cols) != sorted(d_cols):
        problems.append(f"schema: spark={s_cols} duck={d_cols}")
    if len(s_rows) != len(d_rows):
        problems.append(f"rowcount: spark={len(s_rows)} duck={len(d_rows)}")
    if not problems:
        sm, dm = _norm_rows(s_cols, s_rows), _norm_rows(d_cols, d_rows)
        if sm != dm:
            only_s = list((sm - dm).items())[:3]
            only_d = list((dm - sm).items())[:3]
            problems.append(f"values: only-spark={only_s} only-duck={only_d}")
    status = "OK" if not problems else "FAIL"
    return (status, len(s_rows), t_spark, "; ".join(problems))


def main():
    args = sys.argv[1:]
    sf_dir = args[0] if args and os.path.isdir(args[0]) else "/root/testdata/sf0.01"
    names = args[1:] if args and os.path.isdir(args[0]) else args
    spark = get_spark("check-oracle")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{table_path(sf_dir, t)}')"
        )
    qs = all_queries()
    if names:
        qs = {k: v for k, v in qs.items() if k in names}
    n_fail = 0
    for name, q in qs.items():
        try:
            status, nrows, secs, detail = check(spark, con, q, sf_dir)
        except Exception as e:  # noqa: BLE001
            status, nrows, secs, detail = "ERROR", -1, 0.0, f"{type(e).__name__}: {e}"
        if status not in ("OK", "ROWS-ONLY"):
            n_fail += 1
        print(f"{name:28s} {status:9s} rows={nrows:<8d} {secs:6.2f}s  {detail[:400]}")
    print(f"\n{'ALL OK' if n_fail == 0 else f'{n_fail} FAILURES'}")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
