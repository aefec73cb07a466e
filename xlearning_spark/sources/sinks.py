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


def write_sorted_parquet(
    df: DataFrame,
    path: str,
    sort_cols: list[str],
    num_files: int | None = None,
    mode: str = "error",
) -> None:
    """S6 layout-aware sink: range-partition on ``sort_cols`` and sort
    within each file, so every output file covers a DISJOINT key range.

    This is the data-layout half of scan locality at 100 TB: parquet
    stores per-row-group min/max for every column, and a scan with a
    predicate on ``sort_cols`` skips whole files/row-groups whose range
    can't match (the storage-side complement of partition pruning —
    effective for high-cardinality keys where one-directory-per-value
    partitioning would explode). tests/test_skew_and_io.py asserts the
    disjointness from the written footers.

    ``num_files`` defaults to the current shuffle-partition setting;
    size it as total_bytes / ~128 MB on a real dataset. Range
    partitioning samples the key distribution, so skewed keys still
    yield balanced files (contrast hash bucketing, which needs a
    uniform key).
    """
    n = num_files or int(df.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    (
        df.repartitionByRange(n, *sort_cols)
        .sortWithinPartitions(*sort_cols)
        .write.mode(mode)
        .parquet(path)
    )


def compact_parquet(
    spark,
    src: str,
    dst: str,
    target_file_mb: int = 128,
    mode: str = "error",
) -> int:
    """S6 maintenance sink: rewrite a small-file-fragmented dataset
    into ~``target_file_mb`` files. Streaming ingest (one appended file
    per micro-batch — e.g. streaming.neardup_ingest) fragments a
    corpus into thousands of tiny files whose per-file open/footer cost
    eventually dominates scans; periodic compaction is how a 100 TB
    corpus stays scannable. File count is computed from the ACTUAL
    on-disk byte size (Hadoop FS API, any scheme), not row counts, so
    wide and narrow schemas both land near the target size. Returns
    the number of files written.
    """
    import math

    jvm = spark.sparkContext._jvm
    conf = spark.sparkContext._jsc.hadoopConfiguration()
    p = jvm.org.apache.hadoop.fs.Path(src)
    fs = p.getFileSystem(conf)
    total = fs.getContentSummary(p).getLength()
    n = max(1, math.ceil(total / (target_file_mb * 1024 * 1024)))
    spark.read.parquet(src).repartition(n).write.mode(mode).parquet(dst)
    return n


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
