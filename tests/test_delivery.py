"""Input-delivery strategy tests (S1/S3/S4/S9) + signals (E5) + the
pipe progress protocol (E2)."""

from __future__ import annotations

import threading
import time

import pytest
from pyspark.sql import functions as F

from xlearning_spark.operators.pipe import pipe_lines
from xlearning_spark.sources import delivery


@pytest.fixture(scope="module")
def tree(tmp_path_factory):
    d = tmp_path_factory.mktemp("tree")
    (d / "a.txt").write_text("l1\nl2\n")
    (d / "b.txt").write_text("l3\n")
    sub = d / "sub"
    sub.mkdir()
    (sub / "c.txt").write_text("l4\nl5\nl6\n")
    (d / "skip.dat").write_text("binary-ish")
    return d


# ------------------------------------------------------------------ S1

def test_glob_files_flat(spark, tree):
    got = delivery.glob_files(spark, f"file:{tree}/*.txt")
    assert [p.rsplit("/", 1)[-1] for p in got] == ["a.txt", "b.txt"]


def test_glob_files_recursive_through_dirs(spark, tree):
    # a glob matching a directory recurses into it (the reference's
    # listStatusRecursively behavior, Utilities.java:41-63)
    got = delivery.glob_files(spark, f"file:{tree}/*")
    names = [p.rsplit("/", 1)[-1] for p in got]
    assert names == ["a.txt", "b.txt", "skip.dat", "c.txt"] or sorted(names) == [
        "a.txt",
        "b.txt",
        "c.txt",
        "skip.dat",
    ]


def test_glob_no_match_is_empty(spark, tree):
    assert delivery.glob_files(spark, f"file:{tree}/nope-*.xyz") == []


# ------------------------------------------------------------------ S3

def test_read_records_lines(spark, tree):
    df = delivery.read_records(spark, f"file:{tree}/*.txt")
    lines = sorted(r.value for r in df.collect())
    assert lines == ["l1", "l2", "l3"]


def test_hadoop_records_text_inputformat(spark, tree):
    # Same line=record contract as read_records, but through the
    # pluggable InputFormat API (newAPIHadoopFile).
    df = delivery.read_hadoop_records(spark, f"file:{tree}/a.txt")
    rows = sorted((r.key, r.value) for r in df.collect())
    # TextInputFormat keys are byte offsets into the file.
    assert rows == [(0, "l1"), (3, "l2")]


def test_hadoop_records_sequencefile_roundtrip(spark, tmp_path):
    # Arbitrary-InputFormat proof: write a SequenceFile, read it back
    # through SequenceFileInputFormat — the reference's custom
    # hbox.inputformat.class path (AM:882-903, HboxContainer:1162-1173).
    path = f"file:{tmp_path}/seq"
    data = [("k1", "v1"), ("k2", "v2"), ("k3", "v3")]
    spark.sparkContext.parallelize(data, 2).saveAsSequenceFile(path)
    df = delivery.read_hadoop_records(
        spark,
        path,
        input_format=delivery.SEQUENCE_INPUT_FORMAT,
        key_cls="org.apache.hadoop.io.Text",
        value_cls="org.apache.hadoop.io.Text",
        schema="key string, value string",
    )
    assert sorted((r.key, r.value) for r in df.collect()) == data


# ------------------------------------------------------------------ S4

def test_read_download_whole_files(spark, tree):
    df = delivery.read_download(spark, f"file:{tree}", glob="*.txt")
    rows = {r.path.rsplit("/", 1)[-1]: r for r in df.collect()}
    assert set(rows) == {"a.txt", "b.txt"}
    assert bytes(rows["a.txt"].content) == b"l1\nl2\n"
    assert rows["a.txt"].length == 6


# ------------------------------------------------------------------ S9

def test_distribute_cache_file(spark, tmp_path):
    f = tmp_path / "side_input.txt"
    f.write_text("cached-payload")
    name = delivery.distribute_cache_file(spark, str(f))

    def read_on_executor(_):
        from pyspark import SparkFiles

        with open(SparkFiles.get(name)) as fh:
            return fh.read()

    got = spark.sparkContext.parallelize([0, 1], 2).map(read_on_executor).collect()
    assert got == ["cached-payload", "cached-payload"]


# ------------------------------------------------------------------ E5

def test_cancel_job_group_stops_job(spark):
    sc = spark.sparkContext
    err = []

    def slow_job():
        sc.setJobGroup("sig-test", "cancellable job")
        try:
            sc.parallelize(range(8), 8).map(lambda x: time.sleep(30) or x).collect()
        except Exception as e:  # cancellation surfaces as a job failure
            err.append(e)
        finally:
            sc.setJobGroup("", "")

    t = threading.Thread(target=slow_job)
    t.start()
    time.sleep(2)  # let tasks start
    delivery.cancel_job_group(spark, "sig-test")
    t.join(timeout=30)
    assert not t.is_alive(), "job did not stop after cancel signal"
    assert err, "cancelled job should raise, not complete"


# ------------------------------------------------------------------ E2

def test_pipe_progress_protocol(spark):
    acc = spark.sparkContext.accumulator(0.0)
    df = spark.range(100).coalesce(2).select(F.col("id").cast("string").alias("l"))
    child = [
        "/bin/sh",
        "-c",
        'i=0; while read x; do echo "$x"; i=$((i+1)); '
        'echo "reporter progress:0.$i" >&2; done; '
        'echo "reporter progress:1.0" >&2',
    ]
    out = pipe_lines(df, child, progress=acc)
    assert out.count() == 100
    # each of the 2 partitions reported a final 1.0
    assert acc.value == 2.0


# ------------------------------------------------------------------ S2

def test_scheme_authority_uri_glob_and_exists(spark, tree):
    # S2 evidence: s3a://bucket/path and file:///path take ONE code
    # path — the URI scheme only selects the Hadoop FileSystem
    # implementation; glob_files/table_exists never parse paths
    # themselves. Driving the authority-form URI end-to-end certifies
    # the handling an object-store endpoint would get (real-MinIO
    # recipe: sources/delivery.py module docstring).
    from xlearning_spark.sources import table_exists

    uri = tree.as_uri()  # file:///... (authority form, like s3a://)
    got = delivery.glob_files(spark, uri + "/*.txt")
    assert [p.rsplit("/", 1)[-1] for p in got] == ["a.txt", "b.txt"]
    assert all(p.startswith("file:") for p in got)
    assert table_exists(spark, uri + "/a.txt")
    assert not table_exists(spark, uri + "/missing.txt")


def test_scheme_uri_jobspec_end_to_end(spark, tree, tmp_path):
    # Full job lifecycle with every path scheme-qualified: glob via
    # URI input, no-clobber check via URI output, commit marker read
    # back through the Hadoop FileSystem — no os.path fallbacks.
    from xlearning_spark.job import JobSpec, submit

    out_uri = (tmp_path / "s2_out").as_uri()
    spec = JobSpec(
        inputs={"in": tree.as_uri() + "/*.txt"},
        output=out_uri,
        output_format="text.gz",
    )
    res = submit(spark, spec)
    assert res.committed
    assert res.n_records_out == 3  # l1..l3 (top-level a.txt + b.txt)
    assert all(f.startswith("file:") for f in res.input_files["in"])

    # Re-submitting must refuse to clobber the URI output (the
    # reference's Client.java:298-302 check) — table_exists sees the
    # scheme-qualified path through the FileSystem API.
    with pytest.raises(FileExistsError):
        submit(spark, spec)


def test_viewfs_bucket_scheme_full_lifecycle(spark, tree, tmp_path):
    # S2 on a REAL non-file: scheme: ViewFileSystem serves
    # viewfs://warehouse/... through the Hadoop mount table, so every
    # path in this test resolves through a FileSystem whose URIs are
    # NOT file: — the exact contract an s3a:// endpoint would get.
    # Covers: glob -> record scan -> whole-file scan -> parquet
    # round-trip -> JobSpec lifecycle (validate / no-clobber / commit
    # marker), all scheme-qualified end-to-end.
    from xlearning_spark.job import JobSpec, submit
    from xlearning_spark.sources import table_exists
    from xlearning_spark.sources.sinks import is_committed

    base = delivery.mount_bucket(spark, "warehouse", tree.as_uri())
    assert base == "viewfs://warehouse/data"

    got = delivery.glob_files(spark, base + "/*.txt")
    assert [p.rsplit("/", 1)[-1] for p in got] == ["a.txt", "b.txt"]
    assert all(p.startswith("viewfs://warehouse/") for p in got)

    # record scan (S3) and whole-file scan (S4) through the scheme
    assert delivery.read_records(spark, base + "/*.txt").count() == 3
    dl = delivery.read_download(spark, base, glob="*.txt")
    assert {r.path.rsplit("/", 1)[-1] for r in dl.collect()} == {"a.txt", "b.txt"}
    assert all(r.path.startswith("viewfs://") for r in dl.collect())

    # DataFrame parquet sink + scan through the scheme (S6/S10)
    out_mnt = delivery.mount_bucket(
        spark, "warehouse", (tmp_path / "s2_viewfs_out").as_uri(), "/out"
    )
    spark.range(7).write.parquet(out_mnt + "/t1")
    assert spark.read.parquet(out_mnt + "/t1").count() == 7
    assert is_committed(out_mnt + "/t1", spark)
    assert table_exists(spark, out_mnt + "/t1")
    assert not table_exists(spark, out_mnt + "/missing")

    # Full job lifecycle on the scheme: no-clobber + commit marker
    spec = JobSpec(
        inputs={"in": base + "/*.txt"},
        output=out_mnt + "/job1",
        output_format="text.gz",
    )
    res = submit(spark, spec)
    assert res.committed
    assert res.n_records_out == 3
    assert all(f.startswith("viewfs://") for f in res.input_files["in"])
    with pytest.raises(FileExistsError):
        submit(spark, spec)
