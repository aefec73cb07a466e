"""As-of join (J5) cross-checked against DuckDB's native ASOF JOIN."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE
from xlearning_spark.operators.asof import asof_join
from xlearning_spark.sources import read_table


def test_asof_matches_duckdb_asof_join(spark, duck):
    ev = read_table(spark, SF_SMOKE, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    signups = ev.filter(F.col("event_type") == "signup").select("user_id", "ts")
    got = {
        r.event_id: r.asof_ts
        for r in asof_join(
            purchases, signups, by=["user_id"], left_on="ts", right_on="ts", value_cols=[]
        ).collect()
    }

    want_rows = duck.execute(
        """
        SELECT p.event_id, s.ts AS asof_ts
        FROM (SELECT * FROM events WHERE event_type = 'purchase') p
        ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'signup') s
          ON p.user_id = s.user_id AND p.ts >= s.ts
        """
    ).fetchall()
    want = {eid: ts for eid, ts in want_rows}
    assert set(got) == set(want)
    for eid in want:
        g, w = got[eid], want[eid]
        assert (g is None) == (w is None), eid
        if w is not None:
            assert g.replace(tzinfo=None) == w.replace(tzinfo=None), eid


def test_asof_carries_value_columns(spark):
    left = spark.createDataFrame(
        [(1, "a", 10), (2, "a", 25), (3, "b", 5)], ["id", "k", "t"]
    )
    right = spark.createDataFrame(
        [("a", 8, 1.5), ("a", 20, 2.5), ("b", 99, 9.9)], ["k", "t", "v"]
    )
    out = {
        r.id: (r.asof_ts, r.v)
        for r in asof_join(
            left, right, by=["k"], left_on="t", right_on="t", value_cols=["v"]
        ).collect()
    }
    assert out[1] == (8, 1.5)    # latest right at t<=10 is t=8
    assert out[2] == (20, 2.5)   # t<=25 -> t=20
    assert out[3] == (None, None)  # no right row at t<=5 for k=b


def test_asof_join_tie_on_timestamp_is_deterministic(spark):
    from xlearning_spark.operators.asof import asof_join

    left = spark.createDataFrame([(1, 100)], ["k", "ts"])
    right = spark.createDataFrame(
        [(1, 100, "A"), (1, 100, "B")], ["k", "ts", "val"]
    )
    for _ in range(3):
        row = asof_join(
            left, right, by=["k"], left_on="ts", right_on="ts", value_cols=["val"]
        ).collect()[0]
        assert row.val == "B"  # greatest value tuple wins the tie
