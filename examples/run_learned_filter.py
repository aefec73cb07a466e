"""Learned quality filter demo (L6, r10): hashing-trick logistic
regression over the documents table, end-to-end:

  1. weak labels from the rule-based tier (the usual bootstrap: the
     Gopher/C4-style heuristic score seeds the learned model)
  2. distributed full-batch training (train_text_lr) — per iteration
     two keyed shuffles + a <= dim+1-row driver collect; the driver is
     the parameter server, bounded because the hashing trick fixes dim
  3. scoring (score_text_lr) — a dim-row broadcast weight join +
     per-doc sigmoid, broadcastable at ANY corpus size
  4. agreement report: the learned filter should broadly reproduce its
     weak-label teacher while smoothing over individual rule edges
  5. streaming deployment (scored_ingest, r11): the trained weights
     score every landed micro-batch in-flight (foreachBatch +
     availableNow, exactly-once via the checkpoint) — the L6 streaming
     form, keeping only docs at/above the keep threshold

The scoring stage's oracle twin is q120 (md5-portable hash + replayed
LCG literals); the trainer is certified against NumPy in
tests/test_llm_ops.py; stream==batch parity for stage 5 in
tests/test_streaming.py.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DEFAULT_SF = "/root/testdata/sf0.001"


def main(spark, sf_dir: str = DEFAULT_SF) -> None:
    from pyspark.sql import functions as F

    from xlearning_spark.operators.text import (
        hashed_bow,
        quality_score,
        score_text_lr,
        train_text_lr,
    )
    from xlearning_spark.sources import read_table

    docs = read_table(spark, sf_dir, "documents")

    # 1. weak labels: above-median heuristic quality -> positive
    median = docs.select(
        F.percentile_approx(quality_score("text"), 0.5).alias("m")
    ).collect()[0].m
    labeled = docs.select(
        "doc_id",
        "text",
        (quality_score("text") >= F.lit(median)).cast("int").alias("label"),
    )

    # 2. train (small dim/iters for the demo; production: dim 2^18+)
    dim = 128
    w, b = train_text_lr(
        labeled, "label", dim=dim, iters=10, lr=0.5
    )

    # 3. score the whole corpus
    scored = score_text_lr(hashed_bow(docs, dim=dim), w, b)

    # 4. teacher agreement
    report = (
        scored.join(labeled.select("doc_id", "label"), "doc_id")
        .agg(
            F.count("*").alias("n_docs"),
            F.avg(
                ((F.col("score") >= 0.5).cast("int") == F.col("label"))
                .cast("double")
            ).alias("teacher_agreement"),
            F.round(F.avg("score"), 4).alias("mean_score"),
        )
    ).collect()[0]
    print(
        f"learned filter: {report.n_docs} docs scored, "
        f"teacher agreement {report.teacher_agreement:.2%}, "
        f"mean score {report.mean_score}"
    )

    # 5. streaming deployment: the same weights filter a live ingest
    # (here: the corpus re-landed as a file stream), keeping docs the
    # model scores at/above the corpus median — one verdict row per
    # landed doc, exactly-once via the checkpoint.
    import tempfile

    from xlearning_spark.streaming import scored_ingest

    keep_at = float(
        scored.select(
            F.percentile_approx("score", 0.5).alias("m")
        ).collect()[0].m
    )
    with tempfile.TemporaryDirectory() as tmp:
        src, out, ckpt = (os.path.join(tmp, d) for d in ("src", "out", "ck"))
        docs.select("doc_id", "text").coalesce(2).write.parquet(src)
        written = scored_ingest(
            spark.readStream.format("parquet")
            .schema("doc_id bigint, text string")
            .load(src),
            out, ckpt, w, b, keep_threshold=keep_at,
        )
        n_kept = spark.read.parquet(out).count() if written else 0
        print(
            f"streaming filter: {len(written)} batch(es) landed, "
            f"{n_kept}/{report.n_docs} docs kept at threshold "
            f"{keep_at:.4f}"
        )


if __name__ == "__main__":
    from xlearning_spark.engine import build_session

    main(build_session(app_name="run_learned_filter"))
