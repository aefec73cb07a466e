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
        # linear_counting: this fixture's cardinality (~15 users) sits
        # far below 2.5m, where raw HLL overestimates — the small-range
        # correction is the engine-side answer (the hash-certified q85
        # oracle path stays division-only by design).
        est = st.hll_state_estimate(
            spark, os.path.join(work, "hll-state"), linear_counting=True
        )
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

        # Streaming frequency: portable Count-Min registers SUM-merged
        # per micro-batch (exactly-once via the strictly-below version
        # discipline) — per-event-type count estimates with state
        # bounded at depth*width rows however long the stream runs.
        st.streaming_cms_counts(
            st.read_events_stream(spark, events_dir),
            "event_type",
            os.path.join(work, "cms-state"),
            os.path.join(work, "ckpt-cms"),
            depth=4,
            width=64,
        )
        ev = read_table(spark, sf_dir, "events")
        probes = ev.select("event_type").distinct()
        freqs = st.cms_state_estimate(
            spark, os.path.join(work, "cms-state"), probes, "event_type", 4, 64
        )
        print("streaming event-type frequency estimates:",
              sorted((r["event_type"], r["cms_estimate"])
                     for r in freqs.collect()))


if __name__ == "__main__":
    from xlearning_spark.engine import build_session

    main(build_session(app_name="example-streaming"))
