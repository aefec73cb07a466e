"""Relational query corpus (SURVEY.md §2.4-§2.9): scans, filters,
hash aggregation, every join shape, windows, grouping sets, set ops,
scalar function families. Each query names the §2 row(s) it exercises.

Plan discipline (checked in tests/test_plans.py): dimension joins
broadcast; filters and projections reach the parquet scan; aggregates
run partial+final. These hold at any scale factor because they're
Catalyst properties of the declarative plan, not tuning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from xlearning_spark.functions import dsum, oracle_dsum
from xlearning_spark.operators.asof import asof_join
from xlearning_spark.queries.registry import query
from xlearning_spark.sources import read_table as _t


# --------------------------------------------------------------------
# Scan + filter + hash agg + sort (S10, §2.6, A5, §2.8)
# --------------------------------------------------------------------

@query(
    "q01_pricing_summary",
    oracle=f"""
SELECT l_returnflag, l_linestatus,
       {oracle_dsum('l_quantity')} AS sum_qty,
       {oracle_dsum('l_extendedprice')} AS sum_base_price,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))
                * (CAST(1 AS DECIMAL(5,4)) - CAST(l_discount AS DECIMAL(5,4)))) AS DOUBLE)
           AS sum_disc_price,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))
                * (CAST(1 AS DECIMAL(5,4)) - CAST(l_discount AS DECIMAL(5,4)))
                * (CAST(1 AS DECIMAL(5,4)) + CAST(l_tax AS DECIMAL(5,4)))) AS DOUBLE)
           AS sum_charge,
       {oracle_dsum('l_quantity')} / COUNT(*) AS avg_qty,
       {oracle_dsum('l_discount')} / COUNT(*) AS avg_disc,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
""",
    tags=("scan", "filter", "hash-agg", "sort", "A5"),
    doc="TPC-H Q1 shape: full-scan aggregate with decimal-exact sums.",
)
def q01_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    one = F.lit(1).cast("decimal(5,4)")
    ep = F.col("l_extendedprice").cast("decimal(18,4)")
    disc = F.col("l_discount").cast("decimal(5,4)")
    tax = F.col("l_tax").cast("decimal(5,4)")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity").alias("sum_qty"),
            dsum("l_extendedprice").alias("sum_base_price"),
            F.sum(ep * (one - disc)).cast("double").alias("sum_disc_price"),
            F.sum(ep * (one - disc) * (one + tax)).cast("double").alias("sum_charge"),
            (dsum("l_quantity") / F.count("*")).alias("avg_qty"),
            (dsum("l_discount") / F.count("*")).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@query(
    "q02_filter_project_pushdown",
    oracle="""
SELECT l_orderkey, l_linenumber,
       CAST(CAST(l_extendedprice AS DECIMAL(18,4))
            * (CAST(1 AS DECIMAL(5,4)) - CAST(l_discount AS DECIMAL(5,4))) AS DOUBLE)
           AS net_price
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '2000-01-01' AND l_quantity > 45
""",
    tags=("scan", "filter", "project", "pushdown"),
    doc="Selective filter + narrow projection; both must reach the scan.",
)
def q02_filter_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    one = F.lit(1).cast("decimal(5,4)")
    return li.filter(
        (F.col("l_shipdate") >= F.lit("2000-01-01").cast("timestamp"))
        & (F.col("l_quantity") > 45)
    ).select(
        "l_orderkey",
        "l_linenumber",
        (
            F.col("l_extendedprice").cast("decimal(18,4)")
            * (one - F.col("l_discount").cast("decimal(5,4)"))
        )
        .cast("double")
        .alias("net_price"),
    )


# --------------------------------------------------------------------
# Joins (J1-J6)
# --------------------------------------------------------------------

@query(
    "q03_shipping_priority",
    oracle="""
SELECT l.l_orderkey,
       CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,4))
                * (CAST(1 AS DECIMAL(5,4)) - CAST(l.l_discount AS DECIMAL(5,4)))) AS DOUBLE)
           AS revenue,
       o.o_orderdate, o.o_orderpriority
FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE c.c_mktsegment = 'BUILDING'
  AND o.o_orderdate < TIMESTAMP '1998-03-15'
  AND l.l_shipdate > TIMESTAMP '1998-03-15'
GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
ORDER BY revenue DESC, l_orderkey
LIMIT 10
""",
    tags=("join", "J1", "hash-agg", "topk"),
    doc="TPC-H Q3 shape: 3-way equi join, agg, deterministic top-k.",
)
def q03_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-03-15").cast("timestamp")
    )
    l = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-03-15").cast("timestamp")
    )
    one = F.lit(1).cast("decimal(5,4)")
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(l, l.l_orderkey == o.o_orderkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.sum(
                F.col("l_extendedprice").cast("decimal(18,4)")
                * (one - F.col("l_discount").cast("decimal(5,4)"))
            )
            .cast("double")
            .alias("revenue")
        )
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
    )


@query(
    "q05_regional_revenue",
    oracle="""
SELECT n.n_name,
       CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,4))
                * (CAST(1 AS DECIMAL(5,4)) - CAST(l.l_discount AS DECIMAL(5,4)))) AS DOUBLE)
           AS revenue
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
GROUP BY n.n_name
ORDER BY revenue DESC, n_name
""",
    tags=("join", "J1", "J2", "broadcast"),
    doc="Star join: fact lineitem with 4 dims; dims must broadcast.",
)
def q05_regional_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    one = F.lit(1).cast("decimal(5,4)")
    return (
        # nation/region are bounded dims -> force broadcast; customer is
        # fact-scale at 100 TB, so leave its join strategy to AQE (forcing
        # a broadcast there OOMs executors at scale).
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(
            F.sum(
                F.col("l_extendedprice").cast("decimal(18,4)")
                * (one - F.col("l_discount").cast("decimal(5,4)"))
            )
            .cast("double")
            .alias("revenue")
        )
        .orderBy(F.col("revenue").desc(), F.col("n_name"))
    )


@query(
    "q06_semi_join_active_customers",
    oracle="""
SELECT c_custkey, c_name
FROM customer c
WHERE EXISTS (SELECT 1 FROM orders o
              WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000)
""",
    tags=("join", "J3", "semi"),
)
def q06_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 400000)
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select(
        "c_custkey", "c_name"
    )


@query(
    "q07_anti_join_dormant_customers",
    oracle="""
SELECT c_custkey, c_acctbal
FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_orderdate >= DATE '2000-01-01')
""",
    tags=("join", "J3", "anti"),
    doc="Dormant = no order placed since 2000-01-01 (orders span "
    "1995-2001, so both sides of the anti-join are non-trivially "
    "populated at every SF; the bare no-orders-ever form returns 0 "
    "rows at small SF, which certifies nothing). The date filter is "
    "applied to the right side BEFORE the anti-join — at 100 TB that "
    "prunes the shuffled build side to the recent partitions.",
)
def q07_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderdate") >= "2000-01-01")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_acctbal"
    )


@query(
    "q08_range_join_price_bands",
    oracle="""
WITH bands(band, lo, hi) AS (
    VALUES ('budget', 0.0, 500.0), ('mid', 500.0, 1200.0),
           ('premium', 1200.0, 1000000.0))
SELECT b.band, COUNT(*) AS n_parts,
       CAST(SUM(CAST(p.p_retailprice AS DECIMAL(18,4))) AS DOUBLE) AS total_price
FROM part p JOIN bands b ON p.p_retailprice >= b.lo AND p.p_retailprice < b.hi
GROUP BY b.band
ORDER BY b.band
""",
    tags=("join", "J4", "range"),
    doc="Non-equi (theta) join against a tiny broadcast band table.",
)
def q08_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = _t(spark, sf_dir, "part")
    bands = spark.createDataFrame(
        [("budget", 0.0, 500.0), ("mid", 500.0, 1200.0), ("premium", 1200.0, 1000000.0)],
        ["band", "lo", "hi"],
    )
    return (
        p.join(
            F.broadcast(bands),
            (p.p_retailprice >= bands.lo) & (p.p_retailprice < bands.hi),
        )
        .groupBy("band")
        .agg(
            F.count("*").alias("n_parts"),
            dsum("p_retailprice").alias("total_price"),
        )
        .orderBy("band")
    )


@query(
    "q09_asof_join_purchase_signup",
    oracle="""
SELECT p.event_id, p.user_id, MAX(s.ts) AS asof_ts
FROM events p
LEFT JOIN events s
  ON s.user_id = p.user_id AND s.event_type = 'signup' AND s.ts <= p.ts
WHERE p.event_type = 'purchase'
GROUP BY p.event_id, p.user_id
""",
    tags=("join", "J5", "asof", "window"),
    doc="As-of join via single-shuffle union+window (operators/asof.py).",
)
def q09_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    signups = ev.filter(F.col("event_type") == "signup").select("user_id", "ts")
    joined = asof_join(
        purchases, signups, by=["user_id"], left_on="ts", right_on="ts", value_cols=[]
    )
    return joined.select("event_id", "user_id", "asof_ts")


@query(
    "q10_cross_join_region_nation",
    oracle="""
SELECT r.r_name, n.n_name, (n.n_regionkey = r.r_regionkey) AS is_home
FROM region r CROSS JOIN nation n
""",
    tags=("join", "J6", "cross"),
)
def q10_cross_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    r = _t(spark, sf_dir, "region")
    n = _t(spark, sf_dir, "nation")
    return r.crossJoin(n).select(
        "r_name", "n_name", (F.col("n_regionkey") == F.col("r_regionkey")).alias("is_home")
    )


@query(
    "q04_customer_order_counts",
    oracle="""
SELECT c_count, COUNT(*) AS custdist
FROM (SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
      FROM customer c LEFT OUTER JOIN orders o ON c.c_custkey = o.o_custkey
      GROUP BY c.c_custkey)
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
""",
    tags=("join", "J1", "outer", "agg"),
    doc="TPC-H Q13 shape: left outer join preserving zero-order "
    "customers, double aggregation.",
)
def q04_customer_order_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left_outer")
        .groupBy(c.c_custkey)
        .agg(F.count(o.o_orderkey).alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


# --------------------------------------------------------------------
# Aggregation surface (A5-A8)
# --------------------------------------------------------------------

@query(
    "q11_rollup_order_stats",
    oracle="""
SELECT CAST(year(o_orderdate) AS INT) AS order_year, o_orderpriority,
       COUNT(*) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total_spend
FROM orders
GROUP BY ROLLUP (CAST(year(o_orderdate) AS INT), o_orderpriority)
""",
    tags=("agg", "A7", "rollup"),
)
def q11_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders").withColumn(
        "order_year", F.year("o_orderdate").cast("int")
    )
    return o.rollup("order_year", "o_orderpriority").agg(
        F.count("*").alias("n_orders"), dsum("o_totalprice").alias("total_spend")
    )


@query(
    "q12_cube_lineitem",
    oracle="""
SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS qty
FROM lineitem
GROUP BY CUBE (l_returnflag, l_linestatus)
""",
    tags=("agg", "A7", "cube"),
)
def q12_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = _t(spark, sf_dir, "lineitem")
    return l.cube("l_returnflag", "l_linestatus").agg(
        F.count("*").alias("n"), dsum("l_quantity").alias("qty")
    )


@query(
    "q13_grouping_sets",
    oracle="""
SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
""",
    tags=("agg", "A7", "grouping-sets"),
)
def q13_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    o.createOrReplaceTempView("__gs_orders")
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n
        FROM __gs_orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        """
    )


@query(
    "q14_distinct_and_percentiles",
    oracle="""
SELECT o_orderpriority,
       COUNT(DISTINCT o_custkey) AS n_customers,
       ROUND(quantile_cont(o_totalprice, 0.5), 4) AS median_price,
       ROUND(quantile_cont(o_totalprice, 0.9), 4) AS p90_price
FROM orders
GROUP BY o_orderpriority
ORDER BY o_orderpriority
""",
    tags=("agg", "A5", "A6", "distinct", "percentile"),
    doc="Exact count-distinct + exact interpolated percentiles.",
)
def q14_distinct_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderpriority")
        .agg(
            F.countDistinct("o_custkey").alias("n_customers"),
            # r13 (guide §1.2 per-task work): ONE percentile buffer for
            # both percentiles — the array form sorts each group's
            # values once and interpolates twice, where two scalar
            # percentile aggregates each accumulated and sorted the
            # full group independently. Same algorithm, identical
            # values.
            F.expr("percentile(o_totalprice, array(0.5D, 0.9D))").alias("__ps"),
        )
        .select(
            "o_orderpriority",
            "n_customers",
            F.round(F.element_at(F.col("__ps"), 1), 4).alias("median_price"),
            F.round(F.element_at(F.col("__ps"), 2), 4).alias("p90_price"),
        )
        .orderBy("o_orderpriority")
    )


@query(
    "q15_collect_sorted",
    oracle="""
SELECT r.r_name,
       array_to_string(list_sort(list(DISTINCT n.n_name)), ',') AS nations
FROM region r JOIN nation n ON n.n_regionkey = r.r_regionkey
GROUP BY r.r_name
ORDER BY r.r_name
""",
    tags=("agg", "A8", "collect"),
)
def q15_collect_sorted(spark: SparkSession, sf_dir: str) -> DataFrame:
    r = _t(spark, sf_dir, "region")
    n = _t(spark, sf_dir, "nation")
    return (
        n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name")
        .agg(F.concat_ws(",", F.sort_array(F.collect_set("n_name"))).alias("nations"))
        .orderBy("r_name")
    )


@query(
    "q16_approx_distinct",
    oracle=None,  # approximate sketch: engines differ; rows-only + tolerance test
    tags=("agg", "A6", "approx"),
    doc="approx_count_distinct(HLL); accuracy asserted vs exact in tests.",
)
def q16_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = _t(spark, sf_dir, "lineitem")
    return l.agg(
        F.approx_count_distinct("l_orderkey").alias("approx_orders"),
        F.countDistinct("l_orderkey").alias("exact_orders"),
    )


def _q85_oracle() -> str:
    from xlearning_spark.operators.sketch import hll_distinct_oracle_sql

    return f"""
SELECT est.hll_orders, ex.exact_orders
FROM {hll_distinct_oracle_sql('l_orderkey', 'lineitem', out_col='hll_orders')} est,
     (SELECT COUNT(DISTINCT l_orderkey) AS exact_orders FROM lineitem) ex
"""


@query(
    "q85_portable_hll",
    oracle=_q85_oracle(),
    tags=("agg", "A6", "approx", "sketch"),
    doc="A6 approx-distinct, HASH-CERTIFIED (r5): q16's engine-native "
    "HLL++ can never match another engine, but this portable classic "
    "HyperLogLog (operators/sketch.py) is built from md5 + exact "
    "integer register arithmetic + one IEEE division, so Spark and "
    "DuckDB produce the bit-identical ESTIMATE — the approximate "
    "value itself carries the oracle, not just a tolerance test. "
    "p=9 (512 registers, ~4.6% target error); fixtures sit in the "
    "raw-HLL zone at every SF so no engine-specific ln() correction "
    "is needed.",
)
def q85_portable_hll(spark: SparkSession, sf_dir: str) -> DataFrame:
    from xlearning_spark.operators.sketch import hll_distinct

    l = _t(spark, sf_dir, "lineitem")
    return hll_distinct(l, "l_orderkey", out_col="hll_orders").crossJoin(
        l.agg(F.countDistinct("l_orderkey").alias("exact_orders"))
    )


def _q88_oracle() -> str:
    from xlearning_spark.operators.sketch import sampled_percentiles_oracle_sql

    est = sampled_percentiles_oracle_sql(
        ["l_orderkey", "l_linenumber"],
        "l_extendedprice",
        "lineitem",
        [0.5, 0.9],
        rate_bits=3,
        group_cols=["l_returnflag"],
    )
    return f"""
SELECT e.l_returnflag, e.sample_n, e.p50_sample, e.p90_sample,
       x.p50_exact, x.p90_exact
FROM {est} e
JOIN (SELECT l_returnflag,
             ROUND(quantile_cont(l_extendedprice, 0.5), 4) AS p50_exact,
             ROUND(quantile_cont(l_extendedprice, 0.9), 4) AS p90_exact
      FROM lineitem GROUP BY l_returnflag) x USING (l_returnflag)
ORDER BY e.l_returnflag
"""


@query(
    "q88_portable_approx_percentile",
    oracle=_q88_oracle(),
    tags=("agg", "A6", "approx", "sketch", "percentile"),
    doc="A6 approx-percentile, HASH-CERTIFIED (r5): completes the "
    "portable-sketch tier (q85 HLL / q86 MinHash / q87 SimHash) for "
    "the one A6 member still without a certified approximate form. "
    "Spark's approx_percentile (KLL-style) is engine-opaque; instead "
    "a deterministic md5-hash row sample (rate 1/8, the q85 60-bit "
    "hash over the row-unique (l_orderkey, l_linenumber) key) is "
    "selected identically by both engines, and the EXACT interpolated "
    "percentile of that sample — q14 already certifies percentile == "
    "quantile_cont at 4-decimal rounding — is the estimate. Sample "
    "predicate is a map-side scan filter (no shuffle, no state), "
    "cutting the sort-agg input 8x; exact twins sit beside the "
    "estimates so accuracy is visible in the graded rows.",
)
def q88_portable_approx_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    from xlearning_spark.operators.sketch import sampled_percentiles

    # NOT spread (r13, measured): unlike the pair-loop/Python tiers,
    # the partial percentile aggregate is cheap per row — a paired A/B
    # read the round-robin exchange as a consistent net loss (+6-22%).
    l = _t(spark, sf_dir, "lineitem")
    est = sampled_percentiles(
        l,
        ["l_orderkey", "l_linenumber"],
        "l_extendedprice",
        [0.5, 0.9],
        rate_bits=3,
        group_cols=["l_returnflag"],
    )
    # r13 (guide §1.2): one shared percentile buffer per group for both
    # exact percentiles (array form), matching q14 — identical values.
    exact = l.groupBy("l_returnflag").agg(
        F.expr("percentile(l_extendedprice, array(0.5D, 0.9D))").alias("__ps"),
    ).select(
        "l_returnflag",
        F.round(F.element_at(F.col("__ps"), 1), 4).alias("p50_exact"),
        F.round(F.element_at(F.col("__ps"), 2), 4).alias("p90_exact"),
    )
    return est.join(exact, "l_returnflag").orderBy("l_returnflag")


@query(
    "q29_pivot_status_by_priority",
    oracle="""
SELECT o_orderpriority,
       CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS F,
       CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS O,
       CAST(SUM(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS P
FROM orders
GROUP BY o_orderpriority
ORDER BY o_orderpriority
""",
    tags=("agg", "pivot"),
    doc="Pivot (wide aggregation): one column per status value. The "
    "pivoted value set is declared, so this stays a single hash "
    "aggregation — no second pass to discover columns.",
)
def q29_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(F.count(F.lit(1)))
        .na.fill(0, ["F", "O", "P"])
        .orderBy("o_orderpriority")
    )


# --------------------------------------------------------------------
# Window functions (§2.7, A2 analogue)
# --------------------------------------------------------------------

@query(
    "q17_topk_orders_per_customer",
    oracle="""
SELECT o_custkey, o_orderkey, o_totalprice
FROM (SELECT o_custkey, o_orderkey, o_totalprice,
             row_number() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey) AS rn
      FROM orders)
WHERE rn <= 3
""",
    tags=("window", "rank", "topk-per-group"),
)
def q17_topk_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice")
    )


@query(
    "q18_running_customer_spend",
    oracle="""
SELECT o_custkey, o_orderkey,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4)))
            OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
           AS running_spend
FROM orders
""",
    tags=("window", "frame", "running"),
)
def q18_running_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.sum(F.col("o_totalprice").cast("decimal(18,4)"))
        .over(w)
        .cast("double")
        .alias("running_spend"),
    )


@query(
    "q19_lead_lag_event_gaps",
    oracle="""
SELECT event_id, user_id,
       epoch_us(ts) - epoch_us(lag(ts) OVER (PARTITION BY user_id
                                             ORDER BY ts, event_id)) AS gap_us,
       lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS next_type
FROM events
""",
    tags=("window", "lead-lag"),
)
def q19_lead_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events").withColumn(
        # ts is TIMESTAMP_NTZ; unix_micros needs TIMESTAMP (UTC session).
        "ts_utc", F.col("ts").cast("timestamp")
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return e.select(
        "event_id",
        "user_id",
        (F.unix_micros("ts_utc") - F.unix_micros(F.lag("ts_utc").over(w))).alias("gap_us"),
        F.lead("event_type").over(w).alias("next_type"),
    )


@query(
    "q20_ntile_dense_rank",
    oracle="""
SELECT c_custkey,
       ntile(4) OVER (PARTITION BY c_mktsegment
                      ORDER BY c_acctbal DESC, c_custkey) AS balance_quartile,
       dense_rank() OVER (PARTITION BY c_mktsegment
                          ORDER BY c_nationkey) AS nation_rank
FROM customer
""",
    tags=("window", "ntile", "dense_rank"),
    doc="ntile/dense_rank PARTITIONED by c_mktsegment: every window in "
    "the graded corpus carries a partition key, so no task ever sees "
    "the whole table (a global no-partition window is the one shape "
    "that cannot scale — q28_quantile_buckets certifies the agg+"
    "broadcast formulation when globally-consistent buckets are "
    "needed). Single shuffle on the segment key, sort within segment.",
)
def q20_ntile(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    seg = Window.partitionBy("c_mktsegment")
    return c.select(
        "c_custkey",
        F.ntile(4)
        .over(seg.orderBy(F.col("c_acctbal").desc(), F.col("c_custkey")))
        .alias("balance_quartile"),
        F.dense_rank().over(seg.orderBy("c_nationkey")).alias("nation_rank"),
    )


@query(
    "q28_quantile_buckets",
    oracle="""
WITH b AS (SELECT quantile_cont(c_acctbal, 0.25) AS q1,
                  quantile_cont(c_acctbal, 0.50) AS q2,
                  quantile_cont(c_acctbal, 0.75) AS q3
           FROM customer)
SELECT c.c_custkey,
       CASE WHEN c.c_acctbal <= b.q1 THEN 1
            WHEN c.c_acctbal <= b.q2 THEN 2
            WHEN c.c_acctbal <= b.q3 THEN 3
            ELSE 4 END AS acctbal_bucket
FROM customer c CROSS JOIN b
""",
    tags=("window", "quantile", "scale-pattern"),
    doc="Scale-out quantile bucketing: exact quartile boundaries via one "
    "aggregation, broadcast back, bucket assignment map-side — the "
    "100 TB replacement for a global ntile window (q20). Two passes, "
    "zero global sorts.",
)
def q28_quantile_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    # r13 (guide §1.2): the three quartile boundaries share ONE
    # percentile buffer (array form) — one accumulate+sort of the
    # column instead of three. Identical values.
    b = c.agg(
        F.expr("percentile(c_acctbal, array(0.25D, 0.5D, 0.75D))").alias("__qs"),
    ).select(
        F.element_at(F.col("__qs"), 1).alias("q1"),
        F.element_at(F.col("__qs"), 2).alias("q2"),
        F.element_at(F.col("__qs"), 3).alias("q3"),
    )
    return c.crossJoin(F.broadcast(b)).select(
        "c_custkey",
        F.when(F.col("c_acctbal") <= F.col("q1"), 1)
        .when(F.col("c_acctbal") <= F.col("q2"), 2)
        .when(F.col("c_acctbal") <= F.col("q3"), 3)
        .otherwise(4)
        .alias("acctbal_bucket"),
    )


@query(
    "q39_correlated_max_order",
    oracle="""
SELECT o.o_orderkey, o.o_custkey, o.o_totalprice
FROM orders o
WHERE o.o_totalprice = (SELECT MAX(o2.o_totalprice) FROM orders o2
                        WHERE o2.o_custkey = o.o_custkey)
""",
    tags=("subquery", "correlated", "window"),
    doc="Correlated scalar subquery (each customer's priciest orders). "
    "Declared via SQL so Catalyst's subquery decorrelation rewrites it "
    "into the aggregate+join the oracle's executor also picks — the "
    "engine's parser/optimizer path, not hand-lowered.",
)
def q39_correlated_max(spark: SparkSession, sf_dir: str) -> DataFrame:
    _t(spark, sf_dir, "orders").createOrReplaceTempView("__corr_orders")
    return spark.sql(
        """
        SELECT o.o_orderkey, o.o_custkey, o.o_totalprice
        FROM __corr_orders o
        WHERE o.o_totalprice = (SELECT MAX(o2.o_totalprice)
                                FROM __corr_orders o2
                                WHERE o2.o_custkey = o.o_custkey)
        """
    )


# --------------------------------------------------------------------
# Set operations (§2.9)
# --------------------------------------------------------------------

@query(
    "q21_set_operations",
    oracle="""
WITH cn AS (SELECT DISTINCT c_nationkey AS nk FROM customer),
     sn AS (SELECT DISTINCT s_nationkey AS nk FROM supplier)
SELECT 'both' AS src, nk FROM (SELECT nk FROM cn INTERSECT SELECT nk FROM sn)
UNION ALL
SELECT 'customer_only' AS src, nk FROM (SELECT nk FROM cn EXCEPT SELECT nk FROM sn)
UNION ALL
SELECT 'all' AS src, nk FROM (SELECT nk FROM cn UNION SELECT nk FROM sn)
""",
    tags=("setops", "union", "intersect", "except"),
)
def q21_set_operations(spark: SparkSession, sf_dir: str) -> DataFrame:
    cn = _t(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nk")).distinct()
    sn = _t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nk")).distinct()
    both = cn.intersect(sn).select(F.lit("both").alias("src"), "nk")
    conly = cn.exceptAll(sn).distinct().select(
        F.lit("customer_only").alias("src"), "nk"
    )
    allk = cn.union(sn).distinct().select(F.lit("all").alias("src"), "nk")
    return both.unionByName(conly).unionByName(allk)


# --------------------------------------------------------------------
# Scalar function families (§2.6)
# --------------------------------------------------------------------

@query(
    "q22_string_functions",
    oracle="""
SELECT doc_id,
       upper(substr(text, 1, 10)) AS head_upper,
       length(text) AS text_len,
       len(string_split_regex(text, '\\s+')) AS n_tokens,
       regexp_extract(text, '([a-z]+)', 1) AS first_word,
       replace(text, ' ', '_') AS snake,
       (text LIKE '%query%') AS mentions_query,
       levenshtein(substr(text, 1, 12), 'spark engine') AS lev12
FROM documents
""",
    tags=("scalar", "string"),
)
def q22_string_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.upper(F.substring("text", 1, 10)).alias("head_upper"),
        F.length("text").alias("text_len"),
        F.size(F.split("text", r"\s+")).alias("n_tokens"),
        F.regexp_extract("text", "([a-z]+)", 1).alias("first_word"),
        F.regexp_replace("text", " ", "_").alias("snake"),
        F.col("text").like("%query%").alias("mentions_query"),
        F.levenshtein(F.substring("text", 1, 12), F.lit("spark engine")).alias("lev12"),
    )


@query(
    "q23_datetime_functions",
    oracle="""
SELECT o_orderkey,
       CAST(year(o_orderdate) AS INT) AS yr,
       CAST(month(o_orderdate) AS INT) AS mo,
       CAST(dayofmonth(o_orderdate) AS INT) AS dom,
       CAST(quarter(o_orderdate) AS INT) AS qtr,
       date_trunc('month', o_orderdate) AS month_start,
       CAST(date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS INT)
           AS days_since_epoch_start,
       strftime(o_orderdate + INTERVAL 30 DAY, '%Y-%m-%d') AS due_date,
       epoch_us(o_orderdate) AS order_us
FROM orders
""",
    tags=("scalar", "datetime"),
)
def q23_datetime_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("yr"),
        F.month("o_orderdate").alias("mo"),
        F.dayofmonth("o_orderdate").alias("dom"),
        F.quarter("o_orderdate").alias("qtr"),
        F.date_trunc("month", "o_orderdate").alias("month_start"),
        F.datediff(F.col("o_orderdate").cast("date"), F.lit("1995-01-01").cast("date")).alias(
            "days_since_epoch_start"
        ),
        # DATE columns round-trip differently through the two engines'
        # pandas bridges; a formatted string is unambiguous.
        F.date_format(F.date_add(F.col("o_orderdate").cast("date"), 30), "yyyy-MM-dd").alias(
            "due_date"
        ),
        # o_orderdate is TIMESTAMP_NTZ; unix_micros needs TIMESTAMP and the
        # session TZ is pinned UTC, so the cast is value-stable.
        F.unix_micros(F.col("o_orderdate").cast("timestamp")).alias("order_us"),
    )


@query(
    "q24_math_functions",
    oracle="""
SELECT p_partkey,
       abs(p_retailprice - 1000.0) AS dist_from_1000,
       CAST(ceil(p_retailprice) AS BIGINT) AS ceil_price,
       CAST(floor(p_retailprice) AS BIGINT) AS floor_price,
       ROUND(pow(p_size, 2.0), 6) AS size_sq,
       ROUND(ln(p_retailprice + 1.0), 6) AS log_price,
       ROUND(sqrt(CAST(p_size AS DOUBLE)), 6) AS sqrt_size,
       CAST(p_partkey % 7 AS BIGINT) AS bucket7
FROM part
""",
    tags=("scalar", "math"),
)
def q24_math_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = _t(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.abs(F.col("p_retailprice") - 1000.0).alias("dist_from_1000"),
        F.ceil("p_retailprice").alias("ceil_price"),
        F.floor("p_retailprice").alias("floor_price"),
        F.round(F.pow("p_size", F.lit(2.0)), 6).alias("size_sq"),
        F.round(F.log(F.col("p_retailprice") + 1.0), 6).alias("log_price"),
        F.round(F.sqrt(F.col("p_size").cast("double")), 6).alias("sqrt_size"),
        (F.col("p_partkey") % 7).cast("bigint").alias("bucket7"),
    )


@query(
    "q25_array_functions",
    oracle="""
WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
SELECT doc_id,
       len(toks) AS n_toks,
       list_contains(toks, 'spark') AS has_spark,
       array_to_string(list_slice(toks, 1, 3), ' ') AS first3,
       array_to_string(list_sort(list_slice(toks, 1, 5)), ',') AS first5_sorted,
       CAST(list_sum(list_transform(toks, x -> length(x))) AS BIGINT) AS total_chars,
       len(list_filter(toks, x -> length(x) > 4)) AS n_long_toks
FROM t
""",
    tags=("scalar", "array", "higher-order"),
)
def q25_array_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    return d.select(
        "doc_id",
        F.size(toks).alias("n_toks"),
        F.array_contains(toks, "spark").alias("has_spark"),
        F.concat_ws(" ", F.slice(toks, 1, 3)).alias("first3"),
        F.concat_ws(",", F.sort_array(F.slice(toks, 1, 5))).alias("first5_sorted"),
        F.aggregate(toks, F.lit(0), lambda a, x: a + F.length(x))
        .cast("bigint")
        .alias("total_chars"),
        F.size(F.filter(toks, lambda x: F.length(x) > 4)).alias("n_long_toks"),
    )


@query(
    "q26_json_functions",
    oracle="""
SELECT event_id,
       CAST(json_extract_string(props, '$.k') AS INT) AS k_value,
       (CAST(json_extract_string(props, '$.k') AS INT) % 10) AS k_mod10
FROM events
""",
    tags=("scalar", "json"),
)
def q26_json_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    return e.select(
        "event_id", k.alias("k_value"), (k % 10).alias("k_mod10")
    )


@query(
    "q27_conditional_functions",
    oracle="""
SELECT c_custkey,
       CASE WHEN c_acctbal < 0 THEN 'debt'
            WHEN c_acctbal < 5000 THEN 'low'
            ELSE 'high' END AS balance_band,
       coalesce(nullif(c_mktsegment, 'AUTOMOBILE'), 'OTHER') AS segment_masked,
       (c_acctbal > 0) AS in_credit
FROM customer
""",
    tags=("scalar", "conditional"),
)
def q27_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.when(F.col("c_acctbal") < 0, "debt")
        .when(F.col("c_acctbal") < 5000, "low")
        .otherwise("high")
        .alias("balance_band"),
        F.coalesce(F.nullif("c_mktsegment", F.lit("AUTOMOBILE")), F.lit("OTHER")).alias(
            "segment_masked"
        ),
        (F.col("c_acctbal") > 0).alias("in_credit"),
    )


@query(
    "q102_salted_agg",
    oracle="""
SELECT l_returnflag, l_linestatus,
       SUM(l_quantity) AS l_quantity_sum,
       COUNT(l_orderkey) AS l_orderkey_count,
       MAX(l_tax) AS l_tax_max
FROM lineitem
GROUP BY l_returnflag, l_linestatus
""",
    tags=("agg", "skew", "salted"),
    doc="The explicit skew-mitigation aggregate (operators/skew.salted_agg "
    "— two-stage: (keys + salt) partial, then per-key merge, so a hot "
    "grouping key spreads over `salt` reducers instead of funneling one) "
    "hash-certified against the plain single-stage GROUP BY oracle: the "
    "salting must be invisible in the result. Summed measure is "
    "integer-valued (l_quantity) so the two-stage summation order cannot "
    "introduce float drift — the comparison is exact, not tolerance-based. "
    "Reference analogue: the chief-minimum-data skew carve-out "
    "(AM/ApplicationMaster.java:987-1008); AQE skew-join split covers the "
    "join side (engine.py defaults, tests/test_skew_and_io.py).",
)
def q102_salted_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    from xlearning_spark.operators.skew import salted_agg

    li = _t(spark, sf_dir, "lineitem")
    out = salted_agg(
        li,
        keys=["l_returnflag", "l_linestatus"],
        aggs={"l_quantity": "sum", "l_orderkey": "count", "l_tax": "max"},
        salt=16,
    )
    return out.select(
        "l_returnflag",
        "l_linestatus",
        "l_quantity_sum",
        "l_orderkey_count",
        "l_tax_max",
    )
