"""Skew mitigation equality tests + S10 CSV/JSON round-trips + the
T5 incremental save path + P7 fault-tolerance conf."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE
from xlearning_spark import streaming as st
from xlearning_spark.engine import fault_tolerance_conf
from xlearning_spark.operators import skew
from xlearning_spark.sources import read_table


# ------------------------------------------------------------- skew

def _skewed(spark):
    # one hot key (90%) + a long tail
    hot = spark.range(9000).select(
        F.lit("hot").alias("k"), (F.col("id") % 100).cast("double").alias("v")
    )
    tail = spark.range(1000).select(
        F.concat(F.lit("k"), F.col("id") % 50).alias("k"),
        F.col("id").cast("double").alias("v"),
    )
    return hot.unionByName(tail)


def test_salted_agg_equals_plain(spark):
    df = _skewed(spark)
    plain = {
        (r.k): (r.s, r.c, r.m)
        for r in df.groupBy("k")
        .agg(F.sum("v").alias("s"), F.count("v").alias("c"), F.max("v").alias("m"))
        .collect()
    }
    salted = {
        (r.k): (r.v_sum, r.v_count, r.v_max)
        for r in skew.salted_agg(
            df, ["k"], {"v": "sum"} | {}, salt=8
        ).join(
            skew.salted_agg(df, ["k"], {"v": "count"}, salt=8), "k"
        ).join(
            skew.salted_agg(df, ["k"], {"v": "max"}, salt=8), "k"
        ).collect()
    }
    assert set(plain) == set(salted)
    for k, (s, c, m) in plain.items():
        ss, cc, mm = salted[k]
        assert abs(ss - s) < 1e-6 and cc == c and mm == m


def test_salted_join_equals_plain(spark):
    big = _skewed(spark)
    small = spark.createDataFrame(
        [("hot", 1.0)] + [(f"k{i}", float(i)) for i in range(50)], ["k", "w"]
    )
    plain = big.join(small, "k").agg(F.count("*").alias("n"), F.sum("w").alias("s")).collect()[0]
    salted = (
        skew.salted_join(big, small, "k", salt=8)
        .agg(F.count("*").alias("n"), F.sum("w").alias("s"))
        .collect()[0]
    )
    assert plain.n == salted.n
    assert abs(plain.s - salted.s) < 1e-6


def test_key_histogram_finds_hot_key(spark):
    hist = skew.key_histogram(_skewed(spark), "k", top=3).collect()
    assert hist[0].k == "hot"
    assert hist[0].share > 0.8


# -------------------------------------------------------------- S10

def test_csv_roundtrip(spark, tmp_path):
    n = read_table(spark, SF_SMOKE, "nation")
    out = str(tmp_path / "nation_csv")
    n.write.option("header", "true").csv(out)
    back = spark.read.option("header", "true").option("inferSchema", "true").csv(out)
    assert back.count() == 25
    assert {r.n_name for r in back.collect()} == {r.n_name for r in n.collect()}


def test_json_roundtrip(spark, tmp_path):
    r = read_table(spark, SF_SMOKE, "region")
    out = str(tmp_path / "region_json")
    r.write.json(out)
    back = spark.read.json(out)
    assert back.count() == 5
    assert {x.r_name for x in back.collect()} == {x.r_name for x in r.collect()}


# --------------------------------------------------------------- T5

def test_incremental_save(spark, tmp_path):
    src = str(tmp_path / "src")
    read_table(spark, SF_SMOKE, "events").withColumn(
        "ts", F.col("ts").cast("timestamp")
    ).coalesce(1).write.parquet(src)
    stream = st.read_events_stream(spark, src).select("event_id", "ts", "user_id")
    out, ckpt = str(tmp_path / "saves"), str(tmp_path / "ckpt")
    first = st.incremental_save(stream, out, ckpt)
    assert len(first) >= 1
    total = spark.read.parquet(f"{out}/batch_*").count()
    assert total == spark.read.parquet(src).count()
    # second invocation: nothing new arrived -> nothing written
    stream2 = st.read_events_stream(spark, src).select("event_id", "ts", "user_id")
    second = st.incremental_save(stream2, out, ckpt)
    empty = sum(
        spark.read.parquet(f"{out}/batch_{b:08d}").count() for b in second
    )
    assert empty == 0


# --------------------------------------------------------------- P7

def test_fault_tolerance_conf_applies(spark):
    from xlearning_spark.engine import build_session

    conf = fault_tolerance_conf()
    assert conf["spark.excludeOnFailure.enabled"] == "true"
    # applying it must be a valid session config set
    s = build_session(extra_conf=conf)
    assert s.conf.get("spark.task.maxFailures") == "4"


def test_salted_join_rejects_small_side_preserving_types(spark):
    import pytest

    big = _skewed(spark)
    small = spark.createDataFrame([("hot", 1.0)], ["k", "w"])
    for how in ("right", "full", "full_outer"):
        with pytest.raises(ValueError, match="salted_join supports"):
            skew.salted_join(big, small, "k", salt=8, how=how)


def test_salted_join_spreads_duplicate_hot_rows(spark):
    # Exact-duplicate rows of the hot key (the canonical skew case)
    # must land in more than one salt bucket.
    big = spark.createDataFrame([("hot", "same")] * 400, ["k", "v"])
    small = spark.createDataFrame([("hot", 1.0)], ["k", "w"])
    out = skew.salted_join(big, small, "k", salt=8)
    assert out.count() == 400
    from pyspark.sql import functions as FF

    salted = big.withColumn(
        "s",
        FF.pmod(
            FF.spark_partition_id() + FF.monotonically_increasing_id(), FF.lit(8)
        ).cast("int"),
    )
    assert salted.select("s").distinct().count() > 1
