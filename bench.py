"""Benchmark harness: wall-clock per registered query at sf0.1.

Prints ONE JSON line:
  {"metric": "corpus_total_sec", "value": N, "unit": "sec",
   "queries": {"q01_...": sec, ...}, "sf": 0.1}

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
     SPARK_GRAFT_CPUS (default all cores),
     SPARK_GRAFT_BENCH_RUNS (default 3 — per-query median; single runs
     showed ±10-15% machine noise, and BASELINE.md §3 is recorded as
     3-run medians, so the same methodology keeps the comparison fair).

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

    n_runs = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3")))
    import statistics

    # Host-steal canary: this VM exhibits transient host-level CPU-steal
    # windows that slow EVERY query ~3x with identical plans (see
    # BASELINE.md round-5 note). Time the warm q01 once; if it is far
    # above its stable ~1.3-1.6 s range the whole session's absolute
    # numbers are suspect — flag it in the output so a slow BENCH round
    # is read as environment, not regression.
    t0 = time.time()
    specs["q01_pricing_summary"].spark(spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()
    canary = round(time.time() - t0, 3)

    timings: dict[str, float] = {}
    for name, spec in specs.items():
        runs = []
        for _ in range(n_runs):
            t0 = time.time()
            spec.spark(spark, sf_dir).write.format("noop").mode("overwrite").save()
            runs.append(time.time() - t0)
        timings[name] = round(statistics.median(runs), 3)

    total = round(sum(timings.values()), 3)
    # Key order + compact separators matter: the driver records only
    # the TAIL of this line, so the headline total and sf go AFTER the
    # (long) queries map to survive truncation, and tight separators
    # fit ~6 more per-query rows into the recorded window.
    print(
        json.dumps(
            {
                "metric": "corpus_total_sec",
                "unit": "sec",
                "queries": timings,
                "canary_q01_warm_sec": canary,
                "host_steal_suspect": canary > 3.0,
                "value": total,
                "sf": sf,
            },
            separators=(",", ":"),
        )
    )


if __name__ == "__main__":
    main()
