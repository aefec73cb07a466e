"""Reference-semantics tests (SURVEY.md §5.2 item 4): behaviors of the
XLearning data plane that aren't result sets — pipe round-trip, env
contract, sharding allocation math, epoch replay, commit protocol."""

from __future__ import annotations

import gzip
import glob
import os

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE
from xlearning_spark.operators.pipe import pipe_lines, pipe_progress_parse
from xlearning_spark.operators import sharding
from xlearning_spark.sources import read_table
from xlearning_spark.sources.sinks import is_committed, write_gzip_text


# ------------------------------------------------------------------ E1

def test_pipe_identity_roundtrip(spark):
    df = spark.range(100).select(F.concat(F.lit("row-"), F.col("id")).alias("l"))
    out = pipe_lines(df, ["cat"], out_col="line")
    got = sorted(r.line for r in out.collect())
    assert got == sorted(f"row-{i}" for i in range(100))


def test_pipe_env_index(spark):
    # Each partition's child sees INDEX = its partition id
    # (reference env contract: HboxContainer.java:939).
    df = spark.range(8).repartition(4).select(F.col("id").cast("string").alias("l"))
    out = pipe_lines(df, ["/bin/sh", "-c", 'while read x; do echo "$INDEX"; done'])
    idx = {int(r.line) for r in out.collect()}
    assert idx <= {0, 1, 2, 3} and len(idx) == 4


def test_pipe_nonzero_exit_raises(spark):
    df = spark.range(4).select(F.col("id").cast("string").alias("l"))
    with pytest.raises(Exception, match="exit code"):
        pipe_lines(df, ["/bin/sh", "-c", "exit 3"]).collect()


def test_progress_protocol_parse():
    assert pipe_progress_parse("reporter progress:0.42") == 0.42
    assert pipe_progress_parse("reporter progress:abc") is None
    assert pipe_progress_parse("something else") is None


def test_make_input_file_list_metadata_walk(spark, tmp_path):
    # S5: the PLACEHOLDER payload must equal the file set a scan would
    # read — data files only, no _SUCCESS / hidden entries — and be
    # discovered by a pure metadata listing (no footer reads), so a
    # 10^6-file catalog costs list calls, not parquet opens.
    from xlearning_spark.operators.pipe import make_input_file_list

    out_dir = str(tmp_path / "t")
    spark.range(100).repartition(3).write.parquet(out_dir)
    (tmp_path / "t" / ".hidden.crc").write_text("x")

    listed = make_input_file_list(spark, {"t": out_dir})
    names = [f.rsplit("/", 1)[-1] for f in listed["t"]]
    assert names == sorted(names)
    assert all(n.endswith(".parquet") for n in names)
    assert not any(n.startswith(("_", ".")) for n in names)

    # Equals the set the scan actually reads (input_file_name basenames).
    scanned = {
        r.f.rsplit("/", 1)[-1]
        for r in spark.read.parquet(out_dir)
        .select(F.input_file_name().alias("f"))
        .distinct()
        .collect()
    }
    assert set(names) == scanned

    # A single concrete file path works too (pre-dir-layout callers).
    one = make_input_file_list(spark, {"f": listed["t"][0]})
    assert [p.rsplit("/", 1)[-1] for p in one["f"]] == [names[0]]

    # Hidden DIRECTORY segments are pruned too (ADVICE r10): a crashed
    # write's _temporary/.../part-* files look like data by basename
    # but Spark's file index would never read them.
    tmp_stage = tmp_path / "t" / "_temporary" / "0"
    tmp_stage.mkdir(parents=True)
    (tmp_stage / "part-00000.parquet").write_bytes(b"junk")
    again = make_input_file_list(spark, {"t": out_dir})
    assert [f.rsplit("/", 1)[-1] for f in again["t"]] == names

    # ...but the ROOT's own ancestry is exempt: pointing the alias AT a
    # dotted/underscored directory is the caller's explicit choice.
    inside = make_input_file_list(spark, {"s": str(tmp_stage)})
    assert [f.rsplit("/", 1)[-1] for f in inside["s"]] == [
        "part-00000.parquet"
    ]

    # A typo'd path fails fast instead of yielding an empty input list
    # (ADVICE r10 — the old input_file_name scan raised too).
    with pytest.raises(FileNotFoundError):
        make_input_file_list(spark, {"x": str(tmp_path / "nope" / "*")})


def test_make_input_file_list_qualified_root(spark, tmp_path):
    # ADVICE r11: the glob root must be Hadoop-qualified before the
    # hidden-segment rule strips it, so (a) a dotted/underscored
    # ANCESTOR of the glob root never triggers the rule and (b) a
    # RELATIVE pattern resolves to the same absolute form globStatus
    # returns instead of leaving the working directory's ancestry in
    # the compared tail.
    import os

    from xlearning_spark.operators.pipe import make_input_file_list

    # (a) legit data under a dotted ancestor: /<tmp>/.cache/_work/data/*.txt
    data = tmp_path / ".cache" / "_work" / "data"
    data.mkdir(parents=True)
    (data / "a.txt").write_text("1")
    (data / "b.txt").write_text("2")
    (data / "_SUCCESS").write_text("")
    got = make_input_file_list(spark, {"d": str(data / "*.txt")})
    assert [f.rsplit("/", 1)[-1] for f in got["d"]] == ["a.txt", "b.txt"]

    # (b) a RELATIVE glob pattern: Hadoop resolves it against the
    # JVM's working directory (user.dir, fixed at session start — NOT
    # Python's cwd), so the root must be qualified the same way or the
    # prefix never strips and the rule chews the working dir's
    # ancestry. Stage files under the JVM's user.dir to exercise it.
    import shutil
    import tempfile

    jvm_cwd = spark.sparkContext._jvm.System.getProperty("user.dir")
    rel_root = tempfile.mkdtemp(prefix=".rel_glob_", dir=jvm_cwd)
    try:
        reldata = os.path.join(rel_root, "data")
        os.mkdir(reldata)
        with open(os.path.join(reldata, "a.txt"), "w") as fh:
            fh.write("1")
        with open(os.path.join(reldata, "_SUCCESS"), "w") as fh:
            fh.write("")
        rel_pat = os.path.join(os.path.basename(rel_root), "data", "*.txt")
        rel = make_input_file_list(spark, {"d": rel_pat})
        assert [f.rsplit("/", 1)[-1] for f in rel["d"]] == ["a.txt"]
    finally:
        shutil.rmtree(rel_root, ignore_errors=True)

    # A glob matching ONLY hidden files is an empty input and must
    # raise (ADVICE r11: the fail-fast used to check the pre-filter
    # list), with a message distinguishing it from a no-match typo.
    only_hidden = tmp_path / "done"
    only_hidden.mkdir()
    (only_hidden / "_SUCCESS").write_text("")
    with pytest.raises(FileNotFoundError, match="all hidden"):
        make_input_file_list(spark, {"x": str(only_hidden / "*")})


def test_visible_fallback_judges_common_ancestor_not_basename():
    # ADVICE r12: when the qualified glob root fails to prefix a
    # globStatus URI (mount/symlink crossing changes the
    # scheme/authority spelling), the fallback must still apply the
    # hidden-segment rule below the deepest common ancestor — a
    # basename-only fallback lets _temporary/attempt_x/part-00000
    # debris through (its basename is not hidden).
    from xlearning_spark.operators.pipe import _visible

    root = "file:/data/x/"
    # Normal prefix path (unchanged behavior).
    assert not _visible("file:/data/x/_temporary/0/part-0", root)
    assert _visible("file:/data/x/sub/part-0", root)
    assert _visible("file:/home/.x/data/part-0", "file:/home/.x/data/")
    # Fallback: scheme/authority differ, ancestry shared with the root
    # is exempt, everything below it is judged.
    assert not _visible("viewfs://c/data/x/_temporary/0/part-0", root)
    assert not _visible("viewfs://c/data/x/.hidden/part-0", root)
    assert _visible("viewfs://c/data/x/sub/part-0", root)
    assert _visible("viewfs://c/home/.x/data/part-0", "file:/home/.x/data/")
    # Nothing in common at all: the whole path is judged — crash
    # debris is still rejected rather than passed on its basename.
    assert not _visible("viewfs://c/other/_temporary/part-0", root)


# --------------------------------------------------------------- P1-P5

def test_round_robin_balance():
    files = [f"f{i:03d}" for i in range(103)]
    alloc = sharding.round_robin_assignment(files, 8)
    sizes = [len(v) for v in alloc.values()]
    assert max(sizes) - min(sizes) <= 1  # the P1 contract
    assert sorted(sum(alloc.values(), [])) == sorted(files)


def test_contiguous_blocks():
    files = [f"f{i:03d}" for i in range(10)]
    alloc = sharding.contiguous_assignment(files, 3)
    assert alloc[0] == ["f000", "f001", "f002", "f003"]
    assert alloc[1] == ["f004", "f005", "f006"]
    assert alloc[2] == ["f007", "f008", "f009"]


def test_chief_minimum():
    files = [f"f{i}" for i in range(7)]
    alloc = sharding.chief_minimum_assignment(files, 3, chief_min=1)
    assert alloc[0] == ["f0"]  # chief pinned to minimum
    assert sorted(alloc[1] + alloc[2]) == sorted(files[1:])


def test_broadcast_all():
    files = ["a", "b"]
    alloc = sharding.broadcast_all(files, 3)
    assert all(v == ["a", "b"] for v in alloc.values())


# ------------------------------------------------------------------ P6

def test_epoch_replay_counts(spark):
    n = read_table(spark, SF_SMOKE, "nation")
    replayed = sharding.epoch_replay(n, epochs=3, cache=False)
    counts = {r.epoch: r.n for r in replayed.groupBy("epoch").agg(F.count("*").alias("n")).collect()}
    assert counts == {0: 25, 1: 25, 2: 25}


def test_epoch_replay_shuffle_reorders_per_epoch(spark):
    # The reference's optional between-epoch stream shuffle: every epoch
    # delivers the same multiset in a different (deterministic) order.
    n = read_table(spark, SF_SMOKE, "nation")
    replayed = sharding.epoch_replay(n, epochs=3, cache=False, shuffle=True)
    orders: dict[int, list[int]] = {0: [], 1: [], 2: []}
    for r in replayed.collect():  # collect preserves per-epoch row order
        orders[r.epoch].append(r.n_nationkey)
    assert all(sorted(v) == list(range(25)) for v in orders.values())
    assert orders[0] != orders[1] and orders[1] != orders[2]
    # Deterministic: the same seed replays the same per-epoch orders.
    again: dict[int, list[int]] = {0: [], 1: [], 2: []}
    for r in sharding.epoch_replay(n, epochs=3, cache=False, shuffle=True).collect():
        again[r.epoch].append(r.n_nationkey)
    assert again == orders


# -------------------------------------------------------------- S7/S8

def test_gzip_text_sink_and_commit(spark, tmp_path):
    out = str(tmp_path / "gzout")
    df = spark.range(50).select(F.concat(F.lit("line "), F.col("id")).alias("value"))
    write_gzip_text(df, out)
    assert is_committed(out)  # _SUCCESS marker (the S8 protocol)
    parts = glob.glob(os.path.join(out, "part-*.txt.gz"))
    assert parts
    lines = []
    for p in parts:
        with gzip.open(p, "rt") as f:
            lines += [l.rstrip("\n") for l in f]
    assert sorted(lines) == sorted(f"line {i}" for i in range(50))


def test_failed_write_leaves_no_success_marker(spark, tmp_path):
    out = str(tmp_path / "failout")
    df = spark.range(10).select(
        F.when(F.col("id") < 5, F.col("id").cast("string"))
        .otherwise(F.raise_error(F.lit("injected failure")))
        .alias("value")
    )
    with pytest.raises(Exception):
        write_gzip_text(df, out)
    assert not is_committed(out)


# ------------------------------------------------------------------ U4

def test_python_udtf(spark):
    # The real Python UDTF surface (1 row -> N rows); the JVM generator
    # path (posexplode) is the scale path, oracle-checked as q65.
    from pyspark.sql.functions import udtf, lit

    @udtf(returnType="pos int, token string")
    class SplitWords:
        def eval(self, text: str):
            for i, tok in enumerate(text.split()):
                yield i + 1, tok

    rows = SplitWords(lit("alpha beta gamma")).collect()
    assert [(r.pos, r.token) for r in rows] == [(1, "alpha"), (2, "beta"), (3, "gamma")]
