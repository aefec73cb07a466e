"""Data-plane demo: shard files round-robin, deliver the file list via
the PLACEHOLDER env contract, pipe records through an arbitrary child
process, and replay epochs from cache.

Reference analogue: the core hbox-submit workflow — AM shards the
input (ApplicationMaster.java:971-1041), the container pipes records
into the user binary (HboxContainer.java:1145-1257) with INDEX /
INPUT_FILE_LIST in the environment, multi-epoch with a local cache.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DEFAULT_SF = "/root/testdata/sf0.001"


def main(spark, sf_dir: str = DEFAULT_SF) -> None:
    from pyspark.sql import functions as F

    from xlearning_spark.operators.pipe import make_input_file_list, pipe_lines
    from xlearning_spark.operators.sharding import (
        epoch_replay,
        round_robin_assignment,
    )
    from xlearning_spark.sources import read_table

    # P1: round-robin file->worker split, |max-min| <= 1 by construction.
    files = make_input_file_list(
        spark, {"lineitem": os.path.join(sf_dir, "lineitem.parquet")}
    )
    shards = round_robin_assignment(files["lineitem"], n_workers=4)
    print("shard sizes:", {w: len(fs) for w, fs in shards.items()})

    # E1/U1: arbitrary child process over stdin/stdout lines, with the
    # reference's env contract visible to the child.
    docs = read_table(spark, sf_dir, "documents").select(
        F.coalesce("text", F.lit("")).alias("text")
    )
    child = [
        sys.executable,
        "-c",
        "import sys, os\n"
        "idx = os.environ.get('INDEX', '?')\n"
        "for line in sys.stdin:\n"
        "    print(f'{idx}\\t{len(line.split())}')",
    ]
    counted = pipe_lines(docs, child, out_col="indexed_count")
    print("piped sample:")
    counted.show(3, truncate=False)

    # P6: epoch replay — 3 epochs, each the same row count.
    per_epoch = (
        epoch_replay(docs, epochs=3).groupBy("epoch").count().orderBy("epoch")
    )
    print("epoch replay:")
    per_epoch.show()


if __name__ == "__main__":
    from xlearning_spark.engine import build_session

    main(build_session(app_name="example-pipe"))
