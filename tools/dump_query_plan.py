"""Dump one formatted physical plan per named query to a file.

Usage: python tools/dump_query_plan.py OUT_SUFFIX QUERY [QUERY ...]
Writes plans/r13/<query>_<OUT_SUFFIX>.txt for each query at sf0.1.
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    suffix = sys.argv[1]
    names = sys.argv[2:]
    from xlearning_spark.engine import build_session
    from xlearning_spark.queries import registry
    import xlearning_spark.queries  # noqa: F401

    spark = build_session(app_name="dump_query_plan", master="local[4]")
    spark.sparkContext.setLogLevel("ERROR")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    for name in names:
        df = registry.get(name).spark(spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        out = os.path.join(REPO, "plans", os.environ.get("SPARK_GRAFT_PLANS_ROUND", "r14"), f"{name}_{suffix}.txt")
        with open(out, "w") as fh:
            fh.write(plan)
        print("wrote", out)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
