"""Scale-technique evidence: bucketed co-located joins (no shuffle) and
partition pruning (scan skips non-matching partitions) — the §4.3
physical patterns the engine relies on at 100 TB."""

from __future__ import annotations

import uuid

from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE, plan_string as _plan
from xlearning_spark.sources import read_table


def test_bucketed_join_has_no_shuffle(spark):
    o = read_table(spark, SF_SMOKE, "orders")
    c = read_table(spark, SF_SMOKE, "customer")
    # Unique names per run: the managed-table directory outlives the
    # in-memory catalog, so a fixed name + DROP IF EXISTS fails with
    # LOCATION_ALREADY_EXISTS on every run after the first.
    tag = uuid.uuid4().hex[:8]
    t_o, t_c = f"b_orders_{tag}", f"b_customer_{tag}"
    try:
        (
            o.write.bucketBy(8, "o_custkey").sortBy("o_custkey")
            .mode("overwrite").saveAsTable(t_o)
        )
        (
            c.write.bucketBy(8, "c_custkey").sortBy("c_custkey")
            .mode("overwrite").saveAsTable(t_c)
        )
        joined = (
            spark.table(t_o)
            .join(
                spark.table(t_c).hint("merge"),
                F.col("o_custkey") == F.col("c_custkey"),
            )
            .select("o_orderkey", "c_name")
        )
        plan = _plan(joined)
        # co-located bucket join: zero exchanges in the tree
        tree = plan.split("\n\n")[0]
        assert "Exchange" not in tree, tree
        assert joined.count() > 0
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {t_o}")
        spark.sql(f"DROP TABLE IF EXISTS {t_c}")


def test_partition_pruning(spark, tmp_path):
    out = str(tmp_path / "orders_by_year")
    o = read_table(spark, SF_SMOKE, "orders").withColumn(
        "order_year", F.year("o_orderdate")
    )
    o.write.partitionBy("order_year").parquet(out)
    back = spark.read.parquet(out).filter(F.col("order_year") == 1997)
    plan = _plan(back)
    # the partition filter must reach the scan's partition pruning,
    # not a post-scan Filter
    assert "PartitionFilters" in plan
    assert "order_year" in plan.split("PartitionFilters")[1][:200]
    years = {r.order_year for r in back.select("order_year").distinct().collect()}
    assert years == {1997}


def test_dynamic_partition_pruning_conf(spark):
    # DPP is the runtime form (dim-filter pushed into fact partition
    # scan); assert the engine leaves it enabled.
    assert spark.conf.get("spark.sql.optimizer.dynamicPartitionPruning.enabled") == "true"


def test_runtime_bloom_filter_semi_join_reduction(spark):
    # Runtime bloom-filter join pruning (Spark's semi-join reduction):
    # when a selective dim filter can't broadcast, Catalyst builds a
    # bloom filter from the filtered creation side and injects
    # might_contain() into the fact scan — rows that can't join are
    # dropped BEFORE the shuffle. Default-on in the engine; its size
    # thresholds (creation side <= 10 MB, application scan >= 10 GB)
    # target cluster scale, so at fixture scale we lower them to prove
    # the rule fires on our join shapes.
    assert (
        spark.conf.get("spark.sql.optimizer.runtime.bloomFilter.enabled")
        == "true"
    )
    keys = (
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
        "spark.sql.autoBroadcastJoinThreshold",
        "spark.sql.adaptive.autoBroadcastJoinThreshold",
    )
    keep = {k: spark.conf.get(k, None) for k in keys}
    try:
        spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
            "0",
        )
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
        li = read_table(spark, SF_SMOKE, "lineitem")
        o = read_table(spark, SF_SMOKE, "orders").filter(
            F.col("o_orderpriority") == "1-URGENT"
        )
        j = (
            li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
            .groupBy("o_orderpriority")
            .count()
        )
        opt = j._jdf.queryExecution().optimizedPlan().toString()
        assert "might_contain" in opt, opt
        assert "bloom_filter_agg" in opt, opt
        # The filter is applied on the FACT side (l_orderkey), built
        # from the filtered dim side (o_orderkey).
        mc = [l for l in opt.split("\n") if "might_contain" in l]
        assert any("l_orderkey" in l for l in mc), mc
        agg = [l for l in opt.split("\n") if "bloom_filter_agg" in l]
        assert any("o_orderkey" in l for l in agg), agg
        assert j.count() > 0  # and it still executes correctly
    finally:
        for k, v in keep.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
