"""Conversion-attribution demo: the stream-stream interval join tier
(r7/r8) end-to-end — clicks and purchases as two live streams, inner
attribution + left-outer coverage (null rows for un-converted clicks),
plus the stateless stream-static enrichment join.

State story on display: both interval-join sides carry watermarks and
the join condition bounds purchase_ts to [click_ts, click_ts+horizon],
so buffered rows are EVICTED once they can never match — the demo
prints the state-store row count from the query progress to show the
bound is real (tests assert it: the drained state holds only the
watermark-unexpirable tail, not the stream).

Drains with Trigger.AvailableNow so the demo terminates; a production
deployment points the same code at live directories/Kafka topics.
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DEFAULT_SF = "/root/testdata/sf0.001"


def main(spark, sf_dir: str = DEFAULT_SF) -> None:
    from pyspark.sql import functions as F

    from xlearning_spark import streaming as st
    from xlearning_spark.sources import read_table

    with tempfile.TemporaryDirectory() as work:
        ev = read_table(spark, sf_dir, "events").withColumn(
            "ts", F.col("ts").cast("timestamp")
        )
        cdir = os.path.join(work, "clicks")
        bdir = os.path.join(work, "buys")
        ev.filter(F.col("event_type") == "click").write.parquet(cdir)
        ev.filter(F.col("event_type") == "purchase").write.parquet(bdir)

        # Inner attribution: purchases matched to same-user clicks
        # within the horizon. Append mode — rows emit once both
        # watermarks prove them final.
        joined = st.attributed_conversions(
            st.read_events_stream(spark, cdir),
            st.read_events_stream(spark, bdir),
            horizon="1 hour",
        )
        q = (
            joined.writeStream.format("memory")
            .queryName("demo_attrib")
            .outputMode("append")
            .option("checkpointLocation", os.path.join(work, "ckpt1"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        matched = spark.table("demo_attrib")
        print(f"attributed conversions (streamed): {matched.count()}")
        matched.orderBy("purchase_ts").show(5, truncate=False)
        progress = [p for p in q.recentProgress if p.get("stateOperators")]
        if progress:
            rows = progress[-1]["stateOperators"][0]["numRowsTotal"]
            print(f"join state rows after drain (bounded, not stream-length): {rows}")

        # Coverage report: LEFT OUTER — the batch form here (identical
        # code path; the streaming form emits the same null rows once
        # both watermarks pass, parity-tested in tests/test_streaming.py).
        coverage = st.attributed_conversions(
            ev.filter(F.col("event_type") == "click"),
            ev.filter(F.col("event_type") == "purchase"),
            horizon="1 hour",
            how="left_outer",
        )
        n_clicks = coverage.count()
        n_conv = coverage.filter(F.col("purchase_id").isNotNull()).count()
        print(
            f"attribution coverage: {n_conv}/{n_clicks} click rows converted "
            f"({100.0 * n_conv / max(1, n_clicks):.1f}%)"
        )

        # Stream-static enrichment: stateless per-batch broadcast join
        # against the dimension chain, then per-nation windows.
        enriched = st.run_available_now(
            st.enriched_tumbling_by_nation(
                st.read_events_stream(spark, os.path.join(work, "clicks")),
                read_table(spark, sf_dir, "customer"),
                read_table(spark, sf_dir, "nation"),
            ),
            os.path.join(work, "ckpt2"),
            out_mode="complete",
        )
        print("per-nation hourly click rollup (top 5 by events):")
        enriched.orderBy(F.desc("n_events")).show(5, truncate=False)


if __name__ == "__main__":
    from xlearning_spark.engine import build_session

    session = build_session(app_name="example_attribution")
    session.sparkContext.setLogLevel("ERROR")
    main(session, sys.argv[1] if len(sys.argv) > 1 else DEFAULT_SF)
