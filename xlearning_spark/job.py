"""Submit-style batch-job API: the engine's `hbox-submit` analogue
(SURVEY.md §7 architecture item 3).

One call reproduces the reference's job lifecycle
(client/Client.java submit -> AM plan -> container execute -> commit,
SURVEY.md §3.1-3.2) on Spark:

  1. validate  — inputs must exist, output must not
     (Client.java:298-374's checks);
  2. deliver   — DOWNLOAD (whole-file rows), PLACEHOLDER (path list in
     the child's INPUT_FILE_LIST env), or STREAM (line records piped
     to the child), per doc/datamanage_cn.md:6-60;
  3. execute   — the user command over stdin/stdout lines with the
     reference env contract (INDEX per partition), multi-epoch with
     cache (HboxContainer.java:1145-1257, 1158-1199);
  4. commit    — gzip-text or parquet sink through Spark's
     FileOutputCommitter (the reference's staging->rename->_SUCCESS
     protocol, ApplicationMaster.java:3106-3172).

Everything composes the per-capability operators (sources.delivery,
operators.pipe, operators.sharding, sources.sinks) — this module adds
only the lifecycle, no new data-plane code.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from xlearning_spark.operators.pipe import pipe_lines
from xlearning_spark.operators.sharding import epoch_replay, round_robin_assignment
from xlearning_spark.sources import table_exists
from xlearning_spark.sources.delivery import glob_files, read_download, read_records
from xlearning_spark.sources.sinks import is_committed, write_gzip_text, write_parquet

_STRATEGIES = ("DOWNLOAD", "PLACEHOLDER", "STREAM")
_FORMATS = ("text.gz", "parquet")


@dataclass
class JobSpec:
    """Declarative job description — the ClientArguments analogue."""

    inputs: dict[str, str]  # alias -> path or glob
    command: list[str] | None = None  # child argv (None = identity)
    input_strategy: str = "STREAM"
    output: str | None = None
    output_format: str = "text.gz"
    epochs: int = 1
    env: dict[str, str] = field(default_factory=dict)
    #: PLACEHOLDER worker count (the reference's --worker-num); None ->
    #: one worker per default-parallelism slot, capped by file count.
    workers: int | None = None


@dataclass
class JobResult:
    output_path: str | None
    n_records_out: int
    committed: bool
    input_files: dict[str, list[str]]


def _validate(spark: SparkSession, spec: JobSpec) -> dict[str, list[str]]:
    if spec.input_strategy not in _STRATEGIES:
        raise ValueError(f"input_strategy must be one of {_STRATEGIES}")
    if spec.output_format not in _FORMATS:
        raise ValueError(f"output_format must be one of {_FORMATS}")
    if spec.epochs < 1:
        raise ValueError("epochs must be >= 1")
    def _visible(fs: list[str]) -> list[str]:
        # Drop _SUCCESS/.hidden entries: Hadoop's record readers skip
        # them, so the PLACEHOLDER list must match what STREAM reads.
        return [f for f in fs if not os.path.basename(f).startswith(("_", "."))]

    files = {alias: _visible(glob_files(spark, p)) for alias, p in spec.inputs.items()}
    for alias, fs in files.items():
        if not fs:
            raise FileNotFoundError(
                f"input {alias!r} matches no files: {spec.inputs[alias]}"
            )
    if spec.output is not None and table_exists(spark, spec.output):
        # The reference refuses to clobber outputs (Client.java:298-302).
        raise FileExistsError(f"output already exists: {spec.output}")
    return files


def submit(spark: SparkSession, spec: JobSpec) -> JobResult:
    """Run the full job lifecycle; returns counts + commit status."""
    files = _validate(spark, spec)

    def _union_all(parts: list[DataFrame]) -> DataFrame:
        out = parts[0]
        for p in parts[1:]:
            out = out.union(p)
        return out

    if spec.input_strategy == "DOWNLOAD":
        # Whole files as rows; the command (if any) sees one line per
        # file: "<path>\t<length>" — the localized-file inventory.
        # Every alias contributes (the reference feeds all -input
        # aliases to the container).
        rows: DataFrame = _union_all(
            [
                read_download(spark, p).select(
                    F.concat_ws(
                        "\t", F.col("path"), F.col("length").cast("string")
                    ).alias("line")
                )
                for p in spec.inputs.values()
            ]
        )
    elif spec.input_strategy == "PLACEHOLDER":
        # Per-container assignment (ApplicationMaster.java:971-1041):
        # each alias's files are split round-robin over the workers, and
        # partition w carries exactly worker w's files — both as stdin
        # lines and as its private INPUT_FILE_LIST slice. The reference
        # never ships the full catalog to every container; neither do we.
        n_files_max = max(len(fs) for fs in files.values())
        n_workers = spec.workers or max(
            1, min(spark.sparkContext.defaultParallelism, n_files_max)
        )
        assignment: dict[int, dict[str, list[str]]] = {}
        for alias, fs in files.items():
            for w, flist in round_robin_assignment(fs, n_workers).items():
                if flist:
                    assignment.setdefault(w, {})[alias] = flist
        rows = spark.createDataFrame(
            spark.sparkContext.parallelize(range(n_workers), n_workers).flatMap(
                lambda w: [
                    (f,)
                    for fs_ in assignment.get(w, {}).values()
                    for f in fs_
                ]
            ),
            "line string",
        )
    else:  # STREAM
        rows = _union_all(
            [
                read_records(spark, p).withColumnRenamed("value", "line")
                for p in spec.inputs.values()
            ]
        )

    if spec.epochs > 1:
        rows = epoch_replay(rows, spec.epochs).drop("epoch")

    if spec.command is not None:
        placeholder = spec.input_strategy == "PLACEHOLDER" and spec.epochs == 1
        out = pipe_lines(
            rows,
            spec.command,
            env=spec.env,
            # Epoch replay unions partitions, so the per-partition split
            # only holds in the single-epoch case; multi-epoch falls
            # back to the broadcast map (P3 shape).
            input_files_by_partition=assignment if placeholder else None,
            input_files=(
                files
                if spec.input_strategy == "PLACEHOLDER" and not placeholder
                else None
            ),
            out_col="line",
        )
    else:
        out = rows

    if spec.output is None:
        return JobResult(None, out.count(), False, files)

    if spec.output_format == "parquet":
        write_parquet(out, spec.output)
    else:
        write_gzip_text(out.select(F.col("line").cast("string")), spec.output)
    n = spark.read.parquet(spec.output).count() if spec.output_format == "parquet" else spark.read.text(spec.output).count()
    return JobResult(spec.output, n, is_committed(spec.output, spark), files)
