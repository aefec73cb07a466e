"""Submit-style job lifecycle tests (SURVEY.md §3.1-3.2 analogue):
validation, the three delivery strategies, epochs, pipe execution,
commit marker."""

from __future__ import annotations

import sys

import pytest

from tests.conftest import SF_SMOKE
from xlearning_spark.job import JobSpec, submit

_UPPER = [
    sys.executable,
    "-c",
    "import sys\nfor line in sys.stdin:\n    sys.stdout.write(line.upper())",
]


@pytest.fixture()
def text_input(spark, tmp_path):
    p = str(tmp_path / "in")
    spark.createDataFrame([("alpha",), ("beta",), ("gamma",)], ["value"]).coalesce(
        1
    ).write.text(p)
    return p


def test_validate_missing_input(spark):
    with pytest.raises(FileNotFoundError, match="matches no files"):
        submit(spark, JobSpec(inputs={"x": "/nonexistent/nowhere*"}))


def test_validate_existing_output_refused(spark, text_input, tmp_path):
    out = str(tmp_path / "out")
    spec = JobSpec(inputs={"t": text_input}, output=out)
    submit(spark, spec)
    with pytest.raises(FileExistsError, match="already exists"):
        submit(spark, spec)


def test_validate_bad_strategy(spark, text_input):
    with pytest.raises(ValueError, match="input_strategy"):
        submit(spark, JobSpec(inputs={"t": text_input}, input_strategy="TELEPORT"))


def test_stream_pipe_to_gzip_commit(spark, text_input, tmp_path):
    out = str(tmp_path / "out")
    res = submit(
        spark,
        JobSpec(inputs={"t": text_input}, command=_UPPER, output=out),
    )
    assert res.committed
    assert res.n_records_out == 3
    got = {r.value for r in spark.read.text(out).collect()}
    assert got == {"ALPHA", "BETA", "GAMMA"}
    # gzip codec actually applied (S7)
    import glob

    assert glob.glob(out + "/part-*.gz")


def test_stream_epochs_multiply_records(spark, text_input):
    res = submit(spark, JobSpec(inputs={"t": text_input}, epochs=3))
    assert res.n_records_out == 9


def test_placeholder_child_sees_file_list(spark, text_input, tmp_path):
    out = str(tmp_path / "out")
    child = [
        sys.executable,
        "-c",
        "import os, sys, json\n"
        "files = json.loads(os.environ['INPUT_FILE_LIST'])\n"
        "sys.stdin.read()\n"
        "print(len(files['t']))",
    ]
    res = submit(
        spark,
        JobSpec(
            inputs={"t": text_input},
            input_strategy="PLACEHOLDER",
            command=child,
            output=out,
            output_format="parquet",
        ),
    )
    assert res.committed
    vals = {int(r.line) for r in spark.read.parquet(out).collect()}
    assert vals == {len(res.input_files["t"])}
    assert len(res.input_files["t"]) >= 1


def test_placeholder_splits_file_list_per_worker(spark, tmp_path):
    # The reference AM assigns each container a private split of the
    # input files; every child must see ONLY its slice, and the slices
    # must partition the full set (disjoint + complete).
    src = tmp_path / "many"
    src.mkdir()
    for i in range(4):
        (src / f"f{i}.txt").write_text(f"line{i}\n")
    out = str(tmp_path / "out")
    child = [
        sys.executable,
        "-c",
        "import os, sys, json\n"
        "sys.stdin.read()\n"
        "for f in json.loads(os.environ['INPUT_FILE_LIST']).get('t', []):\n"
        "    print(os.environ['INDEX'] + '|' + f)",
    ]
    res = submit(
        spark,
        JobSpec(
            inputs={"t": str(src) + "/*.txt"},
            input_strategy="PLACEHOLDER",
            command=child,
            output=out,
            output_format="parquet",
            workers=2,
        ),
    )
    assert res.committed
    seen: dict[str, set[str]] = {}
    for r in spark.read.parquet(out).collect():
        idx, path = r.line.split("|", 1)
        seen.setdefault(idx, set()).add(path)
    assert set(seen) == {"0", "1"}  # both workers ran
    assert not (seen["0"] & seen["1"])  # disjoint slices
    assert seen["0"] | seen["1"] == set(res.input_files["t"])  # complete


def test_download_inventory(spark, tmp_path):
    d = tmp_path / "blobs"
    d.mkdir()
    (d / "a.bin").write_bytes(b"12345")
    (d / "b.bin").write_bytes(b"678")
    res = submit(
        spark, JobSpec(inputs={"b": str(d) + "/*"}, input_strategy="DOWNLOAD")
    )
    assert res.n_records_out == 2
    assert sorted(res.input_files["b"])[0].endswith("a.bin")


def test_stream_multi_input_unions_all_aliases(spark, tmp_path):
    p1, p2 = str(tmp_path / "in1"), str(tmp_path / "in2")
    spark.createDataFrame([("a",), ("b",)], ["value"]).coalesce(1).write.text(p1)
    spark.createDataFrame([("c",)], ["value"]).coalesce(1).write.text(p2)
    res = submit(spark, JobSpec(inputs={"one": p1, "two": p2}))
    assert res.n_records_out == 3  # both aliases delivered, not just the first
