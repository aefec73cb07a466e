"""End-to-end streaming LLM-data pipeline (VERDICT r12 item 4): one
chained flow over the ingest tier that previously only ran as separate
drains —

    raw document feed
      -> near-dup drop vs the accumulated corpus   (neardup_ingest)
      -> learned quality score + threshold filter  (scored_ingest)
      -> BPE tokenization with a frozen merge table (tokenized_ingest,
         text recovered via a stream-static join back to the corpus)
      -> offline small-files compaction             (compact_batch_output)

with a batch-parity assertion at the end: the tokenized corpus the
chain lands equals the batch pipeline (score -> filter -> apply_bpe)
run over the same landed corpus. Each stage's output directory is the
next stage's file-stream source — the same wiring a production
deployment uses between long-lived jobs, drained here with
Trigger.AvailableNow so the demo terminates.

Reference anchor: the reference chains long-lived STREAM jobs through
HDFS output/input dirs (HboxContainer.java:1142-1257 in, 1211-1257
out); this is that composition with the LLM curation stages filled in.
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DEFAULT_SF = "/root/testdata/sf0.001"


def main(spark, sf_dir: str = DEFAULT_SF) -> None:
    from pyspark.sql import functions as F

    from xlearning_spark import streaming as st
    from xlearning_spark.operators.text import (
        apply_bpe,
        hashed_bow,
        lcg_weights,
        learn_bpe_merge_table,
        save_bpe_merge_table,
        score_text_lr,
    )
    from xlearning_spark.sources import read_table

    docs = (
        read_table(spark, sf_dir, "documents")
        .filter("text IS NOT NULL AND length(trim(text)) > 0")
        .select("doc_id", "text")
    )
    weights = lcg_weights(64, seed=7)  # deterministic filter (q120 device)
    keep = 0.5

    with tempfile.TemporaryDirectory() as work:
        feed = os.path.join(work, "feed")
        corpus = os.path.join(work, "corpus")
        scored = os.path.join(work, "scored")
        tokens = os.path.join(work, "tokens")
        model = os.path.join(work, "bpe_model")
        os.makedirs(feed)
        schema = "doc_id bigint, text string"

        # ---- stage 1: near-dup drop ------------------------------
        # Two landings; the second re-delivers docs plus planted
        # near-dups, all of which must drop against the accumulated
        # corpus.
        half = docs.filter(F.col("doc_id") % 2 == 0)
        rest = docs.filter(F.col("doc_id") % 2 == 1)
        dups = half.filter(F.col("doc_id") % 10 == 0).select(
            (F.col("doc_id") + 1_000_000).alias("doc_id"),
            F.concat_ws(" ", "text", F.lit("trailing")).alias("text"),
        )
        for chunk in (half, rest.unionByName(dups)):
            chunk.coalesce(1).write.mode("append").parquet(feed)
            st.neardup_ingest(
                spark.readStream.format("parquet").schema(schema).load(feed),
                corpus, os.path.join(work, "ckpt1"), threshold=0.5,
            )
        landed = spark.read.parquet(corpus)
        n_corpus = landed.count()
        print(
            f"stage 1 near-dup: {docs.count()} fed + {dups.count()} planted "
            f"dups -> corpus holds {n_corpus}"
        )

        # ---- stage 2: learned quality filter ---------------------
        # The corpus dir is itself the next stage's stream source.
        st.scored_ingest(
            spark.readStream.format("parquet")
            .schema(schema)
            .option("maxFilesPerTrigger", 1)  # one micro-batch per landed file
            .load(corpus),
            scored, os.path.join(work, "ckpt2"), weights,
            keep_threshold=keep,
        )
        n_kept = spark.read.parquet(scored).count()
        print(
            f"stage 2 quality filter: {n_corpus} scored, {n_kept} kept "
            f"(score >= {keep})"
        )

        # ---- stage 3: BPE tokenize (frozen model) ----------------
        # Train once on the survivors, persist, and tokenize the
        # scored stream — text recovered with a stream-static join
        # back to the landed corpus (scores carry only doc ids).
        survivors_static = spark.read.parquet(scored).select("doc_id")
        surv_docs = landed.join(survivors_static, "doc_id")
        table = learn_bpe_merge_table(surv_docs, n_merges=12, min_freq=2)
        save_bpe_merge_table(spark, table, model)
        scored_stream = (
            spark.readStream.format("parquet")
            .schema("doc_id bigint, margin double, score double")
            .option("maxFilesPerTrigger", 1)
            .load(scored)
            .select("doc_id")
            .join(landed, "doc_id")  # stream-static enrichment
        )
        st.tokenized_ingest(
            scored_stream, tokens, os.path.join(work, "ckpt3"), model
        )
        n_tok = spark.read.parquet(tokens).count()
        print(
            f"stage 3 BPE: {len(table)} frozen merge rules, "
            f"{n_tok} docs tokenized"
        )

        # ---- stage 4: compaction (drained mode) ------------------
        import re as _re

        before = [f for f in os.listdir(tokens) if f.endswith(".parquet")]
        newest = max(
            int(m.group(1))
            for f in before
            if (m := _re.match(r"batch-(\d{10})-", f))
        )
        gen = st.compact_batch_output(spark, tokens, upto_batch=newest)
        after = [f for f in os.listdir(tokens) if f.endswith(".parquet")]
        print(
            f"stage 4 compaction: generation {gen}, "
            f"{len(before)} files -> {len(after)}"
        )

        # ---- batch parity ----------------------------------------
        # The chain's tokenized corpus == the batch pipeline over the
        # same landed corpus: score, threshold, apply the SAME frozen
        # rules.
        exp_surv = (
            score_text_lr(hashed_bow(landed, dim=64), weights)
            .filter(F.col("score") >= keep)
            .select("doc_id")
        )
        exp = {
            r.doc_id: list(r.bpe_tokens)
            for r in apply_bpe(
                landed.join(exp_surv, "doc_id"),
                merges=[(l, r) for l, r, _ in table],
            ).collect()
        }
        got = {
            r.doc_id: list(r.bpe_tokens)
            for r in spark.read.parquet(tokens).collect()
        }
        assert got == exp, "stream chain != batch pipeline"
        assert n_tok == n_kept
        print(
            f"batch parity: {len(got)} tokenized docs identical to the "
            "batch score->filter->apply_bpe pipeline"
        )


if __name__ == "__main__":
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[*]")
        .appName("llm-pipeline-demo")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    main(spark, sys.argv[1] if len(sys.argv) > 1 else DEFAULT_SF)
    spark.stop()
