"""Sources: canonical table loading + input-delivery strategies.

The reference's input layer is an alias->paths map resolved by glob
(reference: AM/ApplicationMaster.java:833-880) with three delivery
strategies (doc/datamanage_cn.md:6-60). Here the canonical table I/O
is `spark.read.parquet` (SURVEY.md §2.1 S10); glob/recursive listing
is Spark's own file index (S1/S2 — same API surface for local, HDFS
and s3a paths).

One fixture quirk handled centrally: `events.parquet` stores `ts` as
parquet TIMESTAMP(NANOS), which Spark 4 refuses to map to a timestamp
type. We read it with `spark.sql.legacy.parquet.nanosAsLong=true`
(long nanoseconds) and normalize to TIMESTAMP_NTZ at microsecond
precision — lossless on the fixture (all values micro-aligned) and
exactly what DuckDB surfaces for the same file.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: Canonical table names present in every /root/testdata/sf* directory.
TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

_NANOS_CONF = "spark.sql.legacy.parquet.nanosAsLong"


def read_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one canonical table, normalizing fixture-specific types."""
    # Engine contract: timestamp semantics are UTC. Pinned here (the
    # single chokepoint every query loads through) so NTZ<->LTZ casts
    # are value-stable even under a host session with another TZ.
    # Deliberate session-level side effect: a host app needing another
    # session TZ must re-set it after engine reads.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events":
        return _read_events(spark, path)
    return spark.read.parquet(path)


def _read_events(spark: SparkSession, path: str) -> DataFrame:
    # Runtime-settable in Spark 4. Session-level side effect: it stays
    # set after this read. Harmless for the canonical tables (they
    # carry micro timestamps, which the flag doesn't touch), but a host
    # app reading its own nano-parquet would see bigint columns.
    spark.conf.set(_NANOS_CONF, "true")
    df = spark.read.parquet(path)
    if dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn(
            "ts", F.timestamp_micros(F.expr("ts div 1000")).cast("timestamp_ntz")
        )
    return df


def with_provenance(df: DataFrame, col: str = "source_file") -> DataFrame:
    """Record-level provenance (S10 depth): tag every row with the
    basename of the file it was scanned from (``input_file_name`` is
    evaluated inside the scan task — a metadata column, not a join, so
    it costs nothing at any scale).

    For a training-data pipeline this is the lineage column everything
    downstream keys on: which dump/shard contributed a document, which
    files a near-dup cluster spans, what to re-ingest after an upstream
    fix. Basename (not full URI) so the value is stable across
    mounts/schemes — tests verify parity against an independent
    engine's filename column on the same directory.
    """
    return df.withColumn(
        col, F.element_at(F.split(F.input_file_name(), "/"), -1)
    )


def table_exists(spark: SparkSession, path: str) -> bool:
    """Existence check that works for any Hadoop-visible path.

    ``os.path.exists`` is always False for ``hdfs://``/``s3a://``/
    ``file:`` URIs, which would silently skip every remote table — so
    scheme-qualified paths go through the Hadoop FileSystem API.
    """
    if "://" not in path and not path.startswith("file:"):
        return os.path.exists(path)
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    return fs.exists(jpath)


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """name -> DataFrame for every canonical table present in sf_dir."""
    out: dict[str, DataFrame] = {}
    for name in TABLES:
        if table_exists(spark, os.path.join(sf_dir, f"{name}.parquet")):
            out[name] = read_table(spark, sf_dir, name)
    return out
