"""Benchmark harness: wall-clock per registered query at sf0.1.

Prints ONE JSON line:
  {"metric": "corpus_total_sec", "value": N, "unit": "sec",
   "queries": {"q01_...": sec, ...}, "sf": 0.1}

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
     SPARK_GRAFT_CPUS (default all cores).

Each query is forced end-to-end through the noop sink (full execution,
no driver collect overhead), after one warm-up query to absorb JVM/
codegen startup.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
if REPO not in sys.path:
    sys.path.insert(0, REPO)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0

    from xlearning_spark.engine import build_session
    from xlearning_spark.queries import registry
    import xlearning_spark.queries  # noqa: F401  (populates registry)

    spark = build_session(app_name="bench")
    spark.sparkContext.setLogLevel("ERROR")

    specs = registry.specs()

    # Warm-up: JVM, codegen, parquet footers.
    specs["q01_pricing_summary"].spark(spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()

    timings: dict[str, float] = {}
    for name, spec in specs.items():
        t0 = time.time()
        spec.spark(spark, sf_dir).write.format("noop").mode("overwrite").save()
        timings[name] = round(time.time() - t0, 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "corpus_total_sec",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
