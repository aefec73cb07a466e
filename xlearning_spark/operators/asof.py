"""As-of join (SURVEY.md §2.5 J5): for each left row, the latest right
row with right.ts <= left.ts within the same key.

Scale strategy: the naive formulation (range join + row_number) is a
per-key cross product — O(L×R) per key, death at 100 TB. This
implementation is the single-shuffle union trick:

  1. union left and right rows, tagged with a side marker;
  2. one window over (key) ordered by (ts, side) — right rows sort
     before left rows at equal ts, giving <= semantics;
  3. ``last(value, ignorenulls=True)`` carries the most recent right
     value forward; filter back to left rows.

One shuffle on the join key, linear state per partition — the same
cost class as a sort-merge join. Skewed keys are AQE's problem, as
with any keyed shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_SIDE = "__asof_side"
_TS = "__asof_ts"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    by: list[str],
    left_on: str,
    right_on: str,
    value_cols: list[str],
) -> DataFrame:
    """Left as-of (backward) join.

    Returns all ``left`` columns plus each of ``value_cols`` and an
    ``asof_ts`` column (the matched right timestamp), null when no
    right row precedes the left row.

    Ties: when several right rows share (key, ts), the greatest
    ``value_cols`` tuple wins — the window orders by them as final
    tiebreakers, keeping the result deterministic across runs.
    """
    left_cols = left.columns
    l = (
        left.withColumn(_SIDE, F.lit(1))
        .withColumn(_TS, F.col(left_on))
        .withColumn("asof_ts", F.lit(None).cast(left.schema[left_on].dataType))
    )
    for v in value_cols:
        l = l.withColumn(v, F.lit(None).cast(right.schema[v].dataType))

    r = right.select(
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left_cols if c not in by],
        *[F.col(b) for b in by],
        F.lit(0).alias(_SIDE),
        F.col(right_on).alias(_TS),
        F.col(right_on).alias("asof_ts"),
        *[F.col(v) for v in value_cols],
    )
    ordered_cols = left_cols + [_SIDE, _TS, "asof_ts"] + value_cols
    unioned = l.select(*ordered_cols).unionByName(r.select(*ordered_cols))

    w = (
        Window.partitionBy(*by)
        .orderBy(F.col(_TS), F.col(_SIDE), *[F.col(v) for v in value_cols])
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = unioned.select(
        *[c for c in left_cols],
        F.col(_SIDE),
        F.last("asof_ts", ignorenulls=True).over(w).alias("__asof_ts_f"),
        *[F.last(v, ignorenulls=True).over(w).alias(f"__{v}_f") for v in value_cols],
    )
    out = filled.filter(F.col(_SIDE) == 1).select(
        *left_cols,
        F.col("__asof_ts_f").alias("asof_ts"),
        *[F.col(f"__{v}_f").alias(v) for v in value_cols],
    )
    return out
