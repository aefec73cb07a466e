"""Reference-semantics query tier: the XLearning data-plane behaviors
that are SQL-checkable as queries (SURVEY.md §2.1-2.3, §2.11).

  - E1/U1 pipe operator: records through an arbitrary child process
    (reference: HboxContainer.java:1145-1257), oracle-checked end to
    end via a token-counting child.
  - S5 PLACEHOLDER file list: the file-name set a scan resolves
    (HboxContainer.java:352-398).
  - P1 round-robin allocation math (`i % n`,
    ApplicationMaster.java:1010-1011) and P6 epoch replay
    (HboxContainer.java:1158-1199) as queries.
  - §2.6 map functions and the U2/U3 Python UDF surface (pandas_udf /
    applyInPandas) with exact oracles.

Commit protocol (S7/S8) and the remaining sharding modes are
filesystem/driver behaviors, not result sets — they're asserted in
tests/test_reference_ops.py instead.
"""

from __future__ import annotations

import sys

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from xlearning_spark.operators.pipe import pipe_lines
from xlearning_spark.operators.sharding import epoch_replay
from xlearning_spark.queries.registry import query
from xlearning_spark.sources import read_table as _t

#: Child program for the pipe round-trip: token count per stdin line.
#: sys.executable keeps the query runnable on any host with this venv.
#: re.split(r"\s+") (not str.split()) to match the oracle's
#: string_split_regex semantics: empty/trailing-whitespace lines count
#: boundary empty tokens identically on both sides.
_PIPE_CHILD = [
    sys.executable,
    "-c",
    "import sys, re\n"
    "for line in sys.stdin:\n"
    "    print(len(re.split(r'\\s+', line.rstrip('\\n'))))",
]


# --------------------------------------------------------------------
# E1/U1: pipe operator with oracle parity
# --------------------------------------------------------------------

@query(
    "q60_pipe_wordcount",
    oracle="""
SELECT COUNT(*) AS n_docs,
       CAST(SUM(len(string_split_regex(coalesce(text, ''), '\\s+'))) AS BIGINT)
           AS total_tokens
FROM documents
""",
    tags=("pipe", "E1", "U1"),
    doc="Records piped through an external token-counting process, "
    "aggregated back in Spark — the reference's stdin/stdout line "
    "contract (HboxContainer.java:1145-1257) with oracle parity.",
)
def q60_pipe_wordcount(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Null-safe: a null text must still produce a stdin line (the
    # oracle coalesces identically).
    d = _t(spark, sf_dir, "documents").select(
        F.coalesce("text", F.lit("")).alias("text")
    )
    counts = pipe_lines(d, _PIPE_CHILD, out_col="n_tokens")
    return counts.agg(
        F.count("*").alias("n_docs"),
        F.sum(F.col("n_tokens").cast("bigint")).alias("total_tokens"),
    )


# --------------------------------------------------------------------
# S5: PLACEHOLDER file-list delivery
# --------------------------------------------------------------------

@query(
    "q61_input_file_list",
    # Fixture assumption (documented, not derivable in a fixed oracle
    # string): TESTDATA.md ships each table as a SINGLE parquet file
    # named <table>.parquet. If the fixture ever becomes a multi-part
    # directory, this literal and the Spark side both change shape —
    # tests/test_oracle_smoke.py's q61 row would flag the mismatch.
    oracle="SELECT 'lineitem.parquet' AS file_name",
    tags=("scan", "S5", "file-list"),
    doc="File-name set resolved by the scan (input_file_name), the "
    "PLACEHOLDER-mode alias->paths payload (HboxContainer.java:352-398).",
)
def q61_input_file_list(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.select(
            F.regexp_extract(F.input_file_name(), "[^/]+$", 0).alias("file_name")
        )
        .distinct()
    )


# --------------------------------------------------------------------
# §2.6 map functions (over parsed events.props)
# --------------------------------------------------------------------

@query(
    "q62_map_functions",
    oracle="""
SELECT event_id,
       json_keys(props)[1] AS first_key,
       CAST(len(json_keys(props)) AS INT) AS n_keys,
       CAST(json_extract_string(props, '$.k') AS INT) AS k_value,
       list_contains(json_keys(props), 'k') AS has_k
FROM events
""",
    tags=("scalar", "map", "json"),
    doc="from_json -> MapType -> map_keys/size/element_at/"
    "map_contains_key: the §2.6 map-function family.",
)
def q62_map_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events")
    m = F.from_json("props", "map<string,int>")
    return e.select(
        "event_id",
        F.element_at(F.map_keys(m), 1).alias("first_key"),
        F.size(m).alias("n_keys"),
        F.element_at(m, F.lit("k")).alias("k_value"),
        F.map_contains_key(m, F.lit("k")).alias("has_k"),
    )


# --------------------------------------------------------------------
# U2: scalar pandas UDF (Arrow-vectorized)
# --------------------------------------------------------------------

@query(
    "q63_pandas_udf_tokens",
    oracle="""
SELECT doc_id,
       CAST(len(string_split_regex(coalesce(text, ''), '\\s+')) AS BIGINT)
           AS n_tokens_udf
FROM documents
""",
    tags=("udf", "U2", "pandas-udf"),
    doc="Arrow-batched scalar pandas_udf (the sanctioned Python hot "
    "path; row-at-a-time udf() is the anti-pattern at scale).",
)
def q63_pandas_udf_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    @pandas_udf("long")
    def n_tokens_udf(s: pd.Series) -> pd.Series:
        # separator-count + 1 == len(re.split(r"\s+", text)): exact
        # string_split_regex parity incl. empty strings and boundary
        # whitespace (str.split() would drop empty tokens); null-safe.
        return (s.fillna("").str.count(r"\s+") + 1).astype("int64")

    d = _t(spark, sf_dir, "documents")
    return d.select("doc_id", n_tokens_udf("text").alias("n_tokens_udf"))


# --------------------------------------------------------------------
# U3: grouped-map applyInPandas (UDAF surface)
# --------------------------------------------------------------------

@query(
    "q64_apply_in_pandas_group_stats",
    oracle="""
SELECT l_returnflag, COUNT(*) AS n_rows,
       CAST(SUM(l_quantity) AS DOUBLE) AS qty_sum,
       MAX(l_quantity) AS qty_max
FROM lineitem
GROUP BY l_returnflag
""",
    tags=("udf", "U3", "applyInPandas"),
    doc="Grouped-map pandas aggregation: per-group stats computed in "
    "pandas (quantities are integral doubles, so the float sum is "
    "order-exact). One shuffle on the group key, Arrow transfer.",
)
def q64_apply_in_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    def stats(pdf: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "l_returnflag": [pdf["l_returnflag"].iloc[0]],
                "n_rows": [len(pdf)],
                "qty_sum": [float(pdf["l_quantity"].sum())],
                "qty_max": [float(pdf["l_quantity"].max())],
            }
        )

    li = _t(spark, sf_dir, "lineitem").select("l_returnflag", "l_quantity")
    return li.groupBy("l_returnflag").applyInPandas(
        stats, "l_returnflag string, n_rows long, qty_sum double, qty_max double"
    )


# --------------------------------------------------------------------
# U4: UDTF surface (1 row -> N rows); built-in generator form
# --------------------------------------------------------------------

@query(
    "q65_tokens_udtf",
    oracle="""
SELECT doc_id, CAST(t.pos AS INT) AS pos, t.token
FROM (SELECT doc_id,
             unnest(string_split_regex(text, '\\s+')) AS token,
             generate_subscripts(string_split_regex(text, '\\s+'), 1) AS pos
      FROM documents
      WHERE doc_id < 20) t
""",
    tags=("udf", "U4", "udtf", "explode"),
    doc="Row-generating (UDTF) surface via posexplode — the JVM "
    "generator path; the Python @udtf variant is demonstrated in "
    "tests/test_reference_ops.py (same semantics, slower path).",
)
def q65_tokens_udtf(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 20)
    return d.select(
        "doc_id", F.posexplode(F.split("text", r"\s+")).alias("pos0", "token")
    ).select("doc_id", (F.col("pos0") + 1).alias("pos"), "token")


# --------------------------------------------------------------------
# S3 (general form): arbitrary Hadoop InputFormat scan
# --------------------------------------------------------------------

@query(
    "q68_hadoop_records",
    oracle="SELECT n_name AS line FROM nation",
    tags=("scan", "S3", "hadoop-inputformat"),
    doc="Records scanned through the Hadoop InputFormat API "
    "(newAPIHadoopFile + TextInputFormat) — the reference's pluggable "
    "hbox.inputformat.class contract (ApplicationMaster.java:882-903, "
    "HboxContainer.java:1162-1173). The driver testdata is parquet-only, "
    "so the text fixture is materialized once per sf_dir from the "
    "nation table (25 rows — bounded), then read back through the "
    "InputFormat path and hash-checked against the table.",
)
def q68_hadoop_records(spark: SparkSession, sf_dir: str) -> DataFrame:
    import hashlib
    import os
    import tempfile

    from xlearning_spark.sources.delivery import read_hadoop_records

    names = sorted(
        r.n_name
        for r in _t(spark, sf_dir, "nation").select("n_name").collect()
    )
    tag = hashlib.sha1(sf_dir.encode()).hexdigest()[:12]
    fixture = os.path.join(
        tempfile.gettempdir(), f"xls_q68_{tag}", "nation_names.txt"
    )
    if not os.path.exists(fixture):
        os.makedirs(os.path.dirname(fixture), exist_ok=True)
        tmp = fixture + ".tmp"
        with open(tmp, "w", encoding="utf-8") as fh:
            fh.write("\n".join(names) + "\n")
        os.replace(tmp, fixture)
    df = read_hadoop_records(spark, f"file://{fixture}")
    return df.select(F.col("value").alias("line"))


# --------------------------------------------------------------------
# P1: round-robin allocation math; P6: epoch replay
# --------------------------------------------------------------------

@query(
    "q66_round_robin_allocation",
    oracle="""
SELECT CAST(o_orderkey % 8 AS BIGINT) AS shard, COUNT(*) AS n_rows,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS shard_value
FROM orders
GROUP BY 1
ORDER BY 1
""",
    tags=("sharding", "P1", "P5"),
    doc="The reference's `i % n` allocation (AM:1010-1011) with the "
    "order key as the enumeration index: deterministic, shuffle-free "
    "shard assignment whose balance is asserted in tests (P1 contract "
    "|max-min| small). The file-level variant is "
    "operators/sharding.py round_robin_assignment.",
)
def q66_round_robin(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    return (
        o.withColumn("shard", F.pmod("o_orderkey", F.lit(8)).cast("bigint"))
        .groupBy("shard")
        .agg(
            F.count("*").alias("n_rows"),
            F.sum(F.col("o_totalprice").cast("decimal(18,4)"))
            .cast("double")
            .alias("shard_value"),
        )
        .orderBy("shard")
    )


@query(
    "q67_epoch_replay",
    oracle="""
SELECT e.epoch, COUNT(*) AS n_rows, CAST(SUM(n.n_nationkey) AS BIGINT) AS key_sum
FROM nation n CROSS JOIN (SELECT unnest([0, 1, 2]) AS epoch) e
GROUP BY e.epoch
ORDER BY e.epoch
""",
    tags=("sharding", "P6", "epoch"),
    doc="Multi-epoch re-delivery with an epoch tag "
    "(operators/sharding.py epoch_replay): cache-once, replay-N — the "
    "reference's epoch-0 gzip tee (HboxContainer.java:1158-1199).",
)
def q67_epoch_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    n = _t(spark, sf_dir, "nation")
    replayed = epoch_replay(n, epochs=3, cache=False)
    return (
        replayed.groupBy("epoch")
        .agg(
            F.count("*").alias("n_rows"),
            F.sum("n_nationkey").cast("bigint").alias("key_sum"),
        )
        .orderBy("epoch")
    )
