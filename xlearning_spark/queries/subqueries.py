"""Subquery / decorrelation query tier (SURVEY.md §2.4-§2.5 depth).

TPC-H's subquery-heavy shapes (Q2/Q11/Q13/Q15/Q17/Q18/Q20/Q21/Q22)
adapted to the testdata star schema (which has no partsupp — lineitem
plays the part-supply fact). Every query here is declared through the
SQL surface on purpose: correlated scalar subqueries, EXISTS / NOT
EXISTS and IN / HAVING-scalar predicates are exactly what Catalyst's
``RewriteCorrelatedScalarSubquery`` / ``RewritePredicateSubquery``
rules lower into aggregate+join plans — the engine's parser/optimizer
path is the operator under test, not a hand-lowered join (q39
precedent). The DuckDB oracle runs the identical SQL, so both planners
must agree on the decorrelated semantics bit-for-bit.

Float discipline (registry docstring): money/quantity aggregates go
through DECIMAL so partial-aggregation order cannot move a sum;
l_quantity is integral, so double AVG over it is exact in IEEE terms
on both engines (integer sums < 2^53 are order-independent).

Scale notes: each decorrelated subquery becomes one extra hash
aggregate + equi join on the correlation key — the same shuffle
footprint a hand-written two-pass job would have. Scalar (uncorrelated)
subqueries become one-row broadcast exchanges. Nothing here collects to
the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from xlearning_spark.functions import dsum, oracle_dsum
from xlearning_spark.queries.registry import query
from xlearning_spark.sources import read_table as _t

#: Decimal-exact revenue term shared by both engines verbatim.
_REV = (
    "SUM(CAST(l_extendedprice AS DECIMAL(18,4))"
    " * (CAST(1 AS DECIMAL(5,4)) - CAST(l_discount AS DECIMAL(5,4))))"
)


def _views(spark: SparkSession, sf_dir: str, *names: str) -> None:
    """Register ``__sq_<name>`` temp views for the SQL-declared tier."""
    for n in names:
        _t(spark, sf_dir, n).createOrReplaceTempView(f"__sq_{n}")


_Q103 = """
SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) / 7.0
           AS avg_yearly
FROM {li} l
JOIN {pt} p ON p.p_partkey = l.l_partkey
WHERE p.p_brand = 'Brand#12'
  AND l.l_quantity < 0.2 * (SELECT AVG(l2.l_quantity)
                            FROM {li} l2
                            WHERE l2.l_partkey = p.p_partkey)
"""


@query(
    "q103_small_quantity_revenue",
    oracle=_Q103.format(li="lineitem", pt="part"),
    tags=("subquery", "correlated", "scalar-agg"),
    doc="TPC-H Q17 shape: correlated scalar AVG subquery on the join "
    "key — Catalyst decorrelates into a per-partkey aggregate joined "
    "back to the fact. l_quantity is integral so the double AVG is "
    "IEEE-exact on both engines; the revenue sum is decimal-exact.",
)
def q103_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    _views(spark, sf_dir, "lineitem", "part")
    return spark.sql(_Q103.format(li="__sq_lineitem", pt="__sq_part"))


_Q104 = """
SELECT s.s_name, COUNT(*) AS numwait
FROM {sup} s
JOIN {li} l1 ON s.s_suppkey = l1.l_suppkey
JOIN {ords} o ON o.o_orderkey = l1.l_orderkey
WHERE o.o_orderstatus = 'F'
  AND l1.l_returnflag = 'R'
  AND EXISTS (SELECT 1 FROM {li} l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM {li} l3
                  WHERE l3.l_orderkey = l1.l_orderkey
                    AND l3.l_suppkey <> l1.l_suppkey
                    AND l3.l_returnflag = 'R')
GROUP BY s.s_name
ORDER BY numwait DESC, s.s_name
"""


@query(
    "q104_sole_blame_supplier",
    oracle=_Q104.format(sup="supplier", li="lineitem", ords="orders"),
    tags=("subquery", "exists", "not-exists"),
    doc="TPC-H Q21 shape: EXISTS + NOT EXISTS, both correlated on the "
    "same fact — suppliers who were the ONLY supplier with a returned "
    "line on a finished multi-supplier order. Catalyst lowers the pair "
    "into a left-semi and a left-anti join on l_orderkey.",
)
def q104_sole_blame_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    _views(spark, sf_dir, "supplier", "lineitem", "orders")
    return spark.sql(
        _Q104.format(sup="__sq_supplier", li="__sq_lineitem", ords="__sq_orders")
    )


_Q105 = """
SELECT c.c_mktsegment, COUNT(*) AS numcust,
       CAST(SUM(CAST(c.c_acctbal AS DECIMAL(18,4))) AS DOUBLE) AS totacctbal
FROM {cust} c
WHERE c.c_acctbal > (SELECT CAST(SUM(CAST(c2.c_acctbal AS DECIMAL(18,4)))
                                 AS DOUBLE) / COUNT(*)
                     FROM {cust} c2 WHERE c2.c_acctbal > 0.0)
  AND NOT EXISTS (SELECT 1 FROM {ords} o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_orderdate >= TIMESTAMP '2000-01-01')
GROUP BY c.c_mktsegment
ORDER BY c.c_mktsegment
"""


@query(
    "q105_dormant_rich_customers",
    oracle=_Q105.format(cust="customer", ords="orders"),
    tags=("subquery", "not-exists", "scalar-subquery"),
    doc="TPC-H Q22 shape: uncorrelated scalar subquery (global mean "
    "balance, decimal-exact sum so the threshold is identical on both "
    "engines) + correlated NOT EXISTS with a non-key predicate (no "
    "order since 2000) -> left-anti join; the scalar becomes a "
    "one-row broadcast exchange.",
)
def q105_dormant_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    _views(spark, sf_dir, "customer", "orders")
    return spark.sql(_Q105.format(cust="__sq_customer", ords="__sq_orders"))


_Q106 = f"""
SELECT l_partkey, CAST({_REV} AS DOUBLE) AS value
FROM {{li}}
GROUP BY l_partkey
HAVING {_REV} * (SELECT COUNT(DISTINCT l_partkey) FROM {{li}}) * 5
       > (SELECT {_REV} FROM {{li}}) * 8
ORDER BY value DESC, l_partkey
"""


@query(
    "q106_important_part_share",
    oracle=_Q106.format(li="lineitem"),
    tags=("subquery", "having-scalar", "hash-agg"),
    doc="TPC-H Q11 shape: HAVING compared against global scalar "
    "subqueries — parts whose revenue exceeds 8/5 of the average "
    "part's (cross-multiplied so the comparison is DECIMAL x INT "
    "exact arithmetic on both engines, no division, and the "
    "selectivity is scale-factor-invariant); the scalars aggregate "
    "once and broadcast.",
)
def q106_important_part_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    _views(spark, sf_dir, "lineitem")
    return spark.sql(_Q106.format(li="__sq_lineitem"))


_Q107 = """
SELECT s.s_name, s.s_acctbal
FROM {sup} s
WHERE s.s_suppkey IN (
        SELECT l.l_suppkey FROM {li} l
        WHERE l.l_partkey IN (SELECT p.p_partkey FROM {pt} p
                              WHERE p.p_name LIKE 'red%')
        GROUP BY l.l_suppkey
        HAVING SUM(CAST(l.l_quantity AS DECIMAL(18,4)))
               > CAST(300 AS DECIMAL(18,4)))
  AND s.s_nationkey IN (SELECT n.n_nationkey FROM {nat} n
                        WHERE n.n_name IN ('NATION_1','NATION_2','NATION_3',
                                           'NATION_4','NATION_5'))
ORDER BY s.s_name
"""


@query(
    "q107_red_part_volume_suppliers",
    oracle=_Q107.format(sup="supplier", li="lineitem", pt="part", nat="nation"),
    tags=("subquery", "nested-in", "having"),
    doc="TPC-H Q20 shape: IN nested inside IN with a grouped HAVING "
    "between them — three levels of predicate subquery that Catalyst "
    "flattens into chained left-semi joins; quantity threshold is "
    "decimal-exact.",
)
def q107_red_part_volume_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    _views(spark, sf_dir, "supplier", "lineitem", "part", "nation")
    return spark.sql(
        _Q107.format(
            sup="__sq_supplier", li="__sq_lineitem",
            pt="__sq_part", nat="__sq_nation",
        )
    )


_Q108 = """
SELECT DISTINCT p.p_partkey, p.p_name, s.s_name, s.s_acctbal
FROM {pt} p
JOIN {li} l ON l.l_partkey = p.p_partkey
JOIN {sup} s ON s.s_suppkey = l.l_suppkey
WHERE p.p_size <= 3
  AND s.s_acctbal = (SELECT MIN(s2.s_acctbal)
                     FROM {sup} s2
                     JOIN {li} l2 ON l2.l_suppkey = s2.s_suppkey
                     WHERE l2.l_partkey = p.p_partkey)
ORDER BY p.p_partkey, s.s_name
"""


@query(
    "q108_cheapest_supplier_per_part",
    oracle=_Q108.format(pt="part", li="lineitem", sup="supplier"),
    tags=("subquery", "correlated", "min-over-join"),
    doc="TPC-H Q2 shape: correlated scalar MIN over a JOIN inside the "
    "subquery (lineitem as the part-supply fact) — the heaviest "
    "decorrelation case: the subquery's join+aggregate is pulled up "
    "and re-joined on the correlation key. Equality on s_acctbal is "
    "exact (the MIN is a value drawn from the data, not computed).",
)
def q108_cheapest_supplier_per_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    _views(spark, sf_dir, "part", "lineitem", "supplier")
    return spark.sql(
        _Q108.format(pt="__sq_part", li="__sq_lineitem", sup="__sq_supplier")
    )


@query(
    "q109_large_volume_orders",
    oracle="""
SELECT c.c_name, c.c_custkey, o.o_orderkey, o.o_totalprice,
       CAST(SUM(CAST(l.l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON o.o_orderkey = l.l_orderkey
WHERE o.o_orderkey IN (SELECT l_orderkey FROM lineitem
                       GROUP BY l_orderkey
                       HAVING SUM(CAST(l_quantity AS DECIMAL(18,4)))
                              > CAST(250 AS DECIMAL(18,4)))
GROUP BY c.c_name, c.c_custkey, o.o_orderkey, o.o_totalprice
ORDER BY o.o_totalprice DESC, o.o_orderkey
LIMIT 100
""",
    tags=("subquery", "in-having", "semi-join", "top-k"),
    doc="TPC-H Q18 shape, declared through the DataFrame API as the "
    "semi-join Catalyst lowers IN-over-HAVING into (the SQL oracle "
    "keeps the subquery form, so both lowerings must agree): orders "
    "whose total quantity crosses a decimal-exact threshold, top-100 "
    "by price with a unique tie-break key so LIMIT is deterministic.",
)
def q109_large_volume_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(18,4)")).alias("__sq"))
        .filter(F.col("__sq") > F.lit(250).cast("decimal(18,4)"))
        .select("l_orderkey")
    )
    orders = _t(spark, sf_dir, "orders").join(
        big, F.col("o_orderkey") == big["l_orderkey"], "semi"
    )
    cust = _t(spark, sf_dir, "customer")
    return (
        orders.join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("c_name", "c_custkey", "o_orderkey", "o_totalprice")
        .agg(dsum("l_quantity").alias("sum_qty"))
        .orderBy(F.desc("o_totalprice"), "o_orderkey")
        .limit(100)
    )


_Q110 = f"""
WITH revenue AS (
    SELECT l_suppkey AS supplier_no, {_REV} AS total_rev
    FROM {{li}}
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate < TIMESTAMP '1996-04-01'
    GROUP BY l_suppkey)
SELECT s.s_suppkey, s.s_name, CAST(r.total_rev AS DOUBLE) AS total_revenue
FROM {{sup}} s
JOIN revenue r ON s.s_suppkey = r.supplier_no
WHERE r.total_rev = (SELECT MAX(total_rev) FROM revenue)
ORDER BY s.s_suppkey
"""


@query(
    "q110_top_revenue_supplier",
    oracle=_Q110.format(li="lineitem", sup="supplier"),
    tags=("subquery", "cte", "max-scalar"),
    doc="TPC-H Q15 shape: CTE reused twice (once as the join input, "
    "once under a MAX scalar subquery) with an exact-equality filter "
    "against the scalar — ties survive, so the revenue stays DECIMAL "
    "through the comparison and only the output casts to double.",
)
def q110_top_revenue_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    _views(spark, sf_dir, "lineitem", "supplier")
    return spark.sql(_Q110.format(li="__sq_lineitem", sup="__sq_supplier"))


@query(
    "q111_order_count_distribution",
    oracle="""
SELECT c_count, COUNT(*) AS custdist
FROM (SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
      FROM customer c
      LEFT OUTER JOIN orders o
        ON c.c_custkey = o.o_custkey AND o.o_orderpriority <> '1-URGENT'
      GROUP BY c.c_custkey) t
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
""",
    tags=("outer-join", "count-distribution", "two-level-agg"),
    doc="TPC-H Q13 shape: LEFT OUTER JOIN with a non-key predicate in "
    "the join condition (not the WHERE — zero-order customers must "
    "survive), COUNT over the nullable side, then a count-of-counts. "
    "Declared via the DataFrame API; the oracle keeps the SQL form.",
)
def q111_order_count_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    per_cust = (
        cust.join(
            orders,
            (F.col("c_custkey") == F.col("o_custkey"))
            & (F.col("o_orderpriority") != "1-URGENT"),
            "left_outer",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )
