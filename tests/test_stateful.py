"""applyInPandasWithState timeout monitor (T3 stateful variant)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from xlearning_spark import streaming as st
from xlearning_spark.streaming.stateful import monitor_timeouts


@pytest.fixture(scope="module")
def gap_events_dir(spark, tmp_path_factory):
    # Two keys: user 1 goes silent after 01:00 (times out once the
    # watermark passes), user 2 keeps emitting until the end.
    rows = []
    eid = 0
    for minute in range(0, 61, 10):  # user 1: 00:00..01:00
        rows.append((eid, f"2024-01-01 00:{minute:02d}:00" if minute < 60 else "2024-01-01 01:00:00", 1))
        eid += 1
    for minute in range(0, 60 * 10, 30):  # user 2: 10 hours of activity
        h, m = divmod(minute, 60)
        rows.append((eid, f"2024-01-01 {h:02d}:{m:02d}:00", 2))
        eid += 1
    df = spark.createDataFrame(rows, ["event_id", "ts_str", "user_id"]).select(
        "event_id",
        F.to_timestamp("ts_str").alias("ts"),
        "user_id",
        F.lit("hb").alias("event_type"),
        F.lit(1.0).alias("value"),
        F.lit("{}").alias("props"),
    )
    d = str(tmp_path_factory.mktemp("gap_events") / "data")
    df.coalesce(1).write.parquet(d)
    return d


def test_timeout_monitor_emits_silent_key(spark, gap_events_dir, tmp_path):
    stream = monitor_timeouts(
        st.read_events_stream(spark, gap_events_dir), gap_seconds=1800
    )
    got = st.run_available_now(stream, str(tmp_path / "ckpt")).collect()
    by_user = {r.user_id: r for r in got}
    # user 1 went silent at 01:00; the watermark (driven by user 2's
    # activity up to 09:30 minus 2h) passes 01:00+30min -> TIMED_OUT.
    assert 1 in by_user, f"user 1 should have timed out; got {got}"
    assert by_user[1].status == "TIMED_OUT"
    assert by_user[1].n_events == 7
    assert by_user[1].last_seen.isoformat().startswith("2024-01-01T01:00")
    # user 2 was active until the end -> the watermark never passed its
    # timeout, so it must NOT be reported dead.
    assert 2 not in by_user
