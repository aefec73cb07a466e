"""Skew mitigation (SURVEY.md §2.2 P2 analogue, §4.3).

AQE's skew-join splitting handles most cases at runtime (enabled in
engine defaults). This module is the explicit fallback for the cases
AQE can't fix — e.g. a single hot key in a shuffle aggregation, or a
skewed join against a side too large to broadcast:

  salted_agg:  two-stage aggregation — key+salt partial, then key final.
  salted_join: replicate the small(er) side per salt so the hot key's
               rows spread over ``salt`` reducers.

Both keep results exactly equal to the unsalted plan; tests assert
equality row-for-row.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_SALT = "__salt"


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, str],
    salt: int = 16,
) -> DataFrame:
    """Two-stage aggregation for hot grouping keys.

    ``aggs`` maps column -> one of sum/count/min/max (the mergeable
    aggregates). Stage 1 groups on (keys + salt) spreading a hot key
    over ``salt`` reducers; stage 2 merges partials per key. Results
    are exactly the single-stage ones.
    """
    merge = {"sum": F.sum, "count": F.sum, "min": F.min, "max": F.max}
    first = {"sum": F.sum, "count": F.count, "min": F.min, "max": F.max}
    for fn in aggs.values():
        if fn not in merge:
            raise ValueError(f"non-mergeable aggregate: {fn}")
    salted = df.withColumn(_SALT, F.pmod(F.spark_partition_id() + F.monotonically_increasing_id(), F.lit(salt)))
    partial = salted.groupBy(*keys, _SALT).agg(
        *[first[fn](c).alias(f"__p_{c}_{fn}") for c, fn in aggs.items()]
    )
    return partial.groupBy(*keys).agg(
        *[merge[fn](f"__p_{c}_{fn}").alias(f"{c}_{fn}") for c, fn in aggs.items()]
    )


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    salt: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi join with the big side salted and the small side replicated.

    Each big-side row gets a row-position salt in [0, salt) — NOT a
    hash of its values, so even exact-duplicate rows of a hot key (the
    canonical skew case) spread across reducers. The small side is
    exploded ``salt`` times so every (key, salt) bucket can match. Use
    when the small side is too big to broadcast but small enough to
    replicate ``salt`` times (the classic middle ground).

    Only big-side-preserving join types are supported: replicating the
    small side would emit unmatched small rows ``salt`` times under
    right/full outer semantics.
    """
    normalized = how.lower().replace("_", "")
    if normalized not in {"inner", "left", "leftouter", "leftsemi", "leftanti"}:
        raise ValueError(
            f"salted_join supports inner/left/left_semi/left_anti, got {how!r}: "
            "the replicated small side would duplicate unmatched rows "
            "under right/full outer semantics"
        )
    big_s = big.withColumn(
        _SALT,
        F.pmod(F.spark_partition_id() + F.monotonically_increasing_id(), F.lit(salt)).cast("int"),
    )
    small_s = small.withColumn(
        _SALT, F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
    )
    out = big_s.join(small_s, [on, _SALT], how)
    return out.drop(_SALT)


def key_histogram(df: DataFrame, key: str, top: int = 20) -> DataFrame:
    """Skew diagnosis: the top-N heaviest keys with their share.

    Single-scan: the total is a broadcast one-row aggregate of the
    grouped frame instead of a second full df.count() pass — the
    grouped subtree appears twice in the plan but ReuseExchange dedupes
    its shuffle, and no stage ever funnels all keys to one partition
    (a global window here would).
    """
    grouped = df.groupBy(key).agg(F.count("*").alias("n"))
    total = grouped.agg(F.sum("n").alias("__total"))
    return (
        grouped.crossJoin(F.broadcast(total))
        .withColumn("share", F.col("n") / F.col("__total"))
        .drop("__total")
        .orderBy(F.col("n").desc())
        .limit(top)
    )
