"""Crash-replay under a REAL mid-batch task failure (r5 verdict item 4).

Runs in its own process because task retry needs ``local[N, maxFailures]``
— the shared test session's ``local[*]`` master never retries a failed
task, so an injected failure would just kill the stream instead of
exercising the replay discipline.

Scenario, per streaming operator under test:
  1. a flaky-once Python UDF is spliced into the stream's column plan;
     the FIRST task attempt that evaluates it creates a marker file
     (O_CREAT|O_EXCL — exactly one winner) and raises, failing that
     task attempt for real; Spark retries the task (maxFailures=2),
     the retry sees the marker and passes;
  2. the run completes despite the mid-batch task failure;
  3. the output is compared row-for-row against a control run of the
     same data with no failure injection — exactly-once means EQUAL,
     not "approximately once".

Covers the three commit disciplines of the ingest tier
(reference analogue: container retry + commit protocol,
ApplicationMaster.java:3106-3172):
  - excise_ingest      (delta-partitioned registry + per-batch overwrite)
  - streaming_cms_counts (versioned additive registers, strictly-below merge)
  - incremental_partition_save (dynamic partition overwrite, key merge)

Exit code 0 + final line "CRASH_REPLAY_OK" on success; assertion
failure otherwise. Driven by tests/test_streaming.py.
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402
from pyspark.sql.types import (  # noqa: E402
    LongType,
    StringType,
    StructField,
    StructType,
)


def flaky_once(marker: str):
    """String-identity UDF whose first-ever evaluation (across all
    tasks of this session) fails its task attempt for real."""

    @F.udf("string")
    def _f(x):
        import os as _os

        try:
            fd = _os.open(marker, _os.O_CREAT | _os.O_EXCL | _os.O_WRONLY)
            _os.close(fd)
            raise RuntimeError("injected mid-batch task failure")
        except FileExistsError:
            return x

    return _f


def rows_set(df, cols):
    return {tuple(r) for r in df.select(*cols).collect()}


def main() -> None:
    from xlearning_spark.engine import build_session
    from xlearning_spark.streaming import (
        cms_state_estimate,
        excise_ingest,
        incremental_partition_save,
        streaming_cms_counts,
    )

    work = tempfile.mkdtemp(prefix="crash_replay_")
    spark = build_session(
        app_name="crash-replay",
        master="local[4, 2]",  # 2 task attempts: the retry under test
        extra_conf={"spark.sql.shuffle.partitions": "4"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    # Input: two parquet files -> two micro-batches (maxFilesPerTrigger=1).
    src = os.path.join(work, "src")
    docs = [
        (1, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
        (2, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
        (3, "unique prose one two three four five six seven eight nine"),
    ]
    docs2 = [
        (4, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
        (5, "other text body nothing shared with anyone at all here ok"),
    ]
    schema = StructType(
        [StructField("doc_id", LongType()), StructField("text", StringType())]
    )
    spark.createDataFrame(docs, schema).coalesce(1).write.parquet(
        os.path.join(src, "f0")
    )
    spark.createDataFrame(docs2, schema).coalesce(1).write.parquet(
        os.path.join(src, "f1")
    )

    def doc_stream():
        return (
            spark.readStream.format("parquet")
            .schema(schema)
            .option("maxFilesPerTrigger", "1")
            .load(src + "/*")
        )

    # ---------------------------------------------------- excise_ingest
    for tag, inject in (("ctl", False), ("inj", True)):
        out_d = os.path.join(work, f"exc_out_{tag}")
        st_d = os.path.join(work, f"exc_state_{tag}")
        ck_d = os.path.join(work, f"exc_ck_{tag}")
        stream = doc_stream()
        if inject:
            marker = os.path.join(work, "exc_marker")
            stream = stream.withColumn("text", flaky_once(marker)("text"))
        excise_ingest(
            stream, out_d, st_d, ck_d, id_col="doc_id", text_col="text", k=8
        )
        if inject:
            assert os.path.exists(marker), "injection never fired"
    ctl = rows_set(
        spark.read.parquet(os.path.join(work, "exc_out_ctl")),
        ["doc_id", "n_tokens", "n_removed", "clean_text"],
    )
    inj = rows_set(
        spark.read.parquet(os.path.join(work, "exc_out_inj")),
        ["doc_id", "n_tokens", "n_removed", "clean_text"],
    )
    assert len(inj) == 5 and ctl == inj, (ctl, inj)
    print("excise_ingest: exactly-once under task failure OK")

    # ---------------------------------------------- streaming_cms_counts
    terms = spark.createDataFrame(
        [("t%d" % (i % 7),) for i in range(50)], "term string"
    )
    tsrc = os.path.join(work, "terms")
    terms.limit(25).coalesce(1).write.parquet(os.path.join(tsrc, "f0"))
    terms.limit(50).exceptAll(terms.limit(25)).coalesce(1).write.parquet(
        os.path.join(tsrc, "f1")
    )
    probes = spark.createDataFrame([("t%d" % i,) for i in range(7)], "term string")
    ests = {}
    for tag, inject in (("ctl", False), ("inj", True)):
        st_d = os.path.join(work, f"cms_state_{tag}")
        ck_d = os.path.join(work, f"cms_ck_{tag}")
        stream = (
            spark.readStream.format("parquet")
            .schema("term string")
            .option("maxFilesPerTrigger", "1")
            .load(tsrc + "/*")
        )
        if inject:
            marker = os.path.join(work, "cms_marker")
            stream = stream.withColumn("term", flaky_once(marker)("term"))
        streaming_cms_counts(stream, "term", st_d, ck_d, depth=4, width=64)
        if inject:
            assert os.path.exists(marker), "injection never fired"
        ests[tag] = rows_set(
            cms_state_estimate(spark, st_d, probes, "term", 4, 64),
            ["term", "cms_estimate"],
        )
    assert ests["ctl"] == ests["inj"], ests
    print("streaming_cms_counts: identical registers under task failure OK")

    # ------------------------------------------- incremental_partition_save
    psrc = os.path.join(work, "parts")
    pschema = "k long, part string, v long"
    spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20)], pschema
    ).coalesce(1).write.parquet(os.path.join(psrc, "f0"))
    spark.createDataFrame(
        [(3, "a", 30), (1, "a", 11)], pschema
    ).coalesce(1).write.parquet(os.path.join(psrc, "f1"))
    outs = {}
    for tag, inject in (("ctl", False), ("inj", True)):
        out_d = os.path.join(work, f"ips_out_{tag}")
        ck_d = os.path.join(work, f"ips_ck_{tag}")
        stream = (
            spark.readStream.format("parquet")
            .schema(pschema)
            .option("maxFilesPerTrigger", "1")
            .load(psrc + "/*")
        )
        if inject:
            marker = os.path.join(work, "ips_marker")
            stream = stream.withColumn(
                "part", flaky_once(marker)("part")
            )
        incremental_partition_save(
            stream, out_d, ck_d, partition_by=["part"], key_cols=["k"]
        )
        if inject:
            assert os.path.exists(marker), "injection never fired"
        outs[tag] = rows_set(spark.read.parquet(out_d), ["k", "part", "v"])
    assert outs["ctl"] == outs["inj"], outs
    # batch-wins accumulate semantics: k=1 must carry the later value
    assert (1, "a", 11) in outs["inj"] and len(outs["inj"]) == 3, outs
    print("incremental_partition_save: exactly-once under task failure OK")

    shutil.rmtree(work, ignore_errors=True)
    print("CRASH_REPLAY_OK")


if __name__ == "__main__":
    main()
