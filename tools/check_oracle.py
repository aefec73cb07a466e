"""Local replica of the driver's correctness gate.

Runs every registered query's Spark side and DuckDB oracle side on the
same parquet tables, compares row count + column names + an
order-insensitive canonical value hash, and prints a per-query verdict.

Usage: python tools/check_oracle.py [sf_dir] [query_name ...]
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    from xlearning_spark.engine import build_session
    from xlearning_spark.queries import registry
    import xlearning_spark.queries  # noqa: F401  (populates registry)
    from xlearning_spark.testing import compare_query, duckdb_con

    spark = build_session(app_name="check_oracle", master="local[8]")
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb_con(sf_dir)

    n_pass = n_fail = n_err = n_rows_only = 0
    for name, spec in registry.specs().items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            ok, detail = compare_query(spark, con, spec, sf_dir)
        except Exception as e:
            print(f"ERROR  {name}: {type(e).__name__}: {str(e)[:300]}")
            n_err += 1
            continue
        dt = time.time() - t0
        if not ok:
            print(f"FAIL   {name}: {detail}")
            n_fail += 1
        elif spec.oracle is None:
            print(f"ROWS   {name}: {detail} [{dt:.1f}s]")
            n_rows_only += 1
        else:
            print(f"PASS   {name}: {detail} [{dt:.1f}s]")
            n_pass += 1
    print(f"\n== pass={n_pass} fail={n_fail} err={n_err} rows_only={n_rows_only}")
    return 1 if (n_fail or n_err) else 0


if __name__ == "__main__":
    sys.exit(main())
