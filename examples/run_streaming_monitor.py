"""Metrics-pipeline demo: the reference's ContainerReporter ->
ApplicationContainerListener loop (per-container samples -> bounded
windows -> running stats -> timeout detection) as a Structured
Streaming job over the `events` table.

Drains with Trigger.AvailableNow so the demo terminates; a production
deployment points the same code at a live directory/Kafka topic.
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
    from xlearning_spark.streaming.stateful import monitor_timeouts

    with tempfile.TemporaryDirectory() as work:
        events_dir = os.path.join(work, "events")
        read_table(spark, sf_dir, "events").withColumn(
            "ts", F.col("ts").cast("timestamp")
        ).coalesce(2).write.mode("overwrite").parquet(events_dir)

        stream = st.read_events_stream(spark, events_dir)
        sliding = st.run_available_now(
            st.sliding_stats(stream),
            os.path.join(work, "ckpt-sliding"),
            out_mode="complete",
        )
        print("sliding per-user avg/max (first 5 windows):")
        sliding.orderBy("window_start", "user_id").show(5, truncate=False)

        timeouts = st.run_available_now(
            monitor_timeouts(st.read_events_stream(spark, events_dir)),
            os.path.join(work, "ckpt-timeout"),
        )
        print(f"timed-out keys detected: {timeouts.count()}")

        # Streaming cardinality: portable-HLL register state merged
        # per micro-batch — distinct-user estimate with state bounded
        # at 2^p registers however long the stream runs.
        st.streaming_hll_distinct(
            st.read_events_stream(spark, events_dir),
            "user_id",
            os.path.join(work, "hll-state"),
            os.path.join(work, "ckpt-hll"),
        )
        est = st.hll_state_estimate(spark, os.path.join(work, "hll-state"))
        exact = (
            read_table(spark, sf_dir, "events")
            .select("user_id")
            .distinct()
            .count()
        )
        print(
            f"streaming distinct-user estimate: "
            f"{est.collect()[0][0]:.1f} (exact {exact})"
        )


if __name__ == "__main__":
    from xlearning_spark.engine import build_session

    main(build_session(app_name="example-streaming"))
