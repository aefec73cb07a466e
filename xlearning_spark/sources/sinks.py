"""Output sinks + commit protocol (SURVEY.md §2.1 S6-S8).

The reference uploads worker-local results to
``<dfs>/_temporary/<containerId>/...`` and the AM renames them into
place, writing a ``_SUCCESS`` marker on full-job success (reference:
HboxContainer.java:525-613; ApplicationMaster.java:3106-3172 — rename
at :3121/:3141, marker at :3128/:3171). Spark's FileOutputCommitter is
the same staging->rename->marker protocol, so the engine's sinks are
thin ``df.write`` wrappers plus an explicit commit assertion, keeping
the capability auditable.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame


def write_parquet(df: DataFrame, path: str, mode: str = "error", partition_by: list[str] | None = None) -> None:
    """S6/S10 canonical sink. partition_by enables partition pruning on
    re-read — the scan-side win that matters at 100 TB."""
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)


def write_gzip_text(df: DataFrame, path: str, mode: str = "error") -> None:
    """S7: the reference's STREAM output sink — text lines,
    gzip-compressed (TextOutputFormat + GzipCodec,
    HboxContainer.java:1221-1226). ``df`` must be single-STRING-column.
    """
    df.write.mode(mode).option("compression", "gzip").text(path)


def write_csv(df: DataFrame, path: str, mode: str = "error", header: bool = True) -> None:
    """S10 CSV sink."""
    df.write.mode(mode).option("header", str(header).lower()).csv(path)


def is_committed(path: str, spark=None) -> bool:
    """S8: job-commit check — the ``_SUCCESS`` marker the reference's
    AM writes after the staging rename (ApplicationMaster.java:3128).
    Spark's FileOutputCommitter produces the identical marker. Pass
    ``spark`` to check scheme-qualified (hdfs://, s3a://) paths."""
    marker = os.path.join(path, "_SUCCESS")
    if spark is not None:
        from xlearning_spark.sources import table_exists

        return table_exists(spark, marker)
    return os.path.exists(marker)
