"""Streaming corpus-ingest demo: a live document feed lands in
micro-batches; each batch is exact-deduped, near-dup checked against
the ACCUMULATED corpus with the sub-quadratic prefix-filtered pair
generator, collapsed through connected components (corpus precedence),
and only novel docs are appended — the streaming composition of the
q80/q83 dedup sweep (streaming.neardup_ingest), plus a
watermark-bounded exact-dedup stage (streaming.dedup_stream) upstream
for in-flight redeliveries.

Drains with Trigger.AvailableNow so the demo terminates; a production
deployment points the same code at a live directory/Kafka topic.
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
    from xlearning_spark.sources import read_table

    docs = read_table(spark, sf_dir, "documents").select("doc_id", "text")
    n_docs = docs.count()

    with tempfile.TemporaryDirectory() as work:
        src = os.path.join(work, "feed")
        corpus = os.path.join(work, "corpus")
        ckpt = os.path.join(work, "ckpt")
        os.makedirs(src)
        schema = "doc_id bigint, text string"

        def stream():
            return spark.readStream.format("parquet").schema(schema).load(src)

        # Feed 1: half the corpus, plus planted near-dups (each doc
        # re-landed with one appended token — high shingle overlap).
        half = docs.filter(F.col("doc_id") % 2 == 0)
        dups = half.filter(F.col("doc_id") % 10 == 0).select(
            (F.col("doc_id") + 1_000_000).alias("doc_id"),
            F.concat_ws(" ", "text", F.lit("trailing")).alias("text"),
        )
        half.unionByName(dups).coalesce(1).write.mode("append").parquet(src)
        st.neardup_ingest(stream(), corpus, ckpt, threshold=0.5)
        landed1 = spark.read.parquet(corpus).count()
        print(
            f"batch 1: {half.count()} docs + {dups.count()} planted near-dups "
            f"-> corpus holds {landed1} (planted dups collapsed)"
        )

        # Feed 2: the other half PLUS re-deliveries of batch-1 docs —
        # they near-dup against the accumulated corpus and are dropped.
        rest = docs.filter(F.col("doc_id") % 2 == 1)
        redeliver = half.limit(20)
        rest.unionByName(redeliver).coalesce(1).write.mode("append").parquet(src)
        st.neardup_ingest(stream(), corpus, ckpt, threshold=0.5)
        landed2 = spark.read.parquet(corpus).count()
        print(
            f"batch 2: {rest.count()} new + {redeliver.count()} re-delivered "
            f"-> corpus holds {landed2} (re-deliveries dropped vs corpus)"
        )
        print(f"fixture docs: {n_docs}, final corpus: {landed2}")

        # Maintenance: the idempotent per-batch landing leaves one
        # batch-<id>-* file set per micro-batch; offline compaction
        # folds the committed ones into right-sized base files (the
        # newest batch stays out — its replay must find its own files)
        # with rows byte-identical.
        import re as _re

        files_before = [
            f for f in os.listdir(corpus) if f.endswith(".parquet")
        ]
        # This demo's stream is fully drained (AvailableNow returned),
        # so fold EVERY batch; a live deployment omits upto_batch and
        # the newest batch stays replayable.
        newest = max(
            int(m.group(1))
            for f in files_before
            if (m := _re.match(r"batch-(\d{10})-", f))
        )
        gen = st.compact_batch_output(spark, corpus, upto_batch=newest)
        files_after = [
            f for f in os.listdir(corpus) if f.endswith(".parquet")
        ]
        assert spark.read.parquet(corpus).count() == landed2
        assert any(_re.match(r"base-\d{10}-\d+\.parquet$", f) for f in files_after)
        print(
            f"compaction: generation {gen} folded "
            f"{len(files_before)} files -> {len(files_after)} "
            f"({landed2} rows unchanged)"
        )

        # Substring tier: the same feed through forward-only span
        # excision — later batches lose any 5-token span already seen
        # in earlier-landed raw text; first occurrences are immutable.
        ex_out = os.path.join(work, "excised")
        ex_state = os.path.join(work, "shingle_registry")
        ex_ckpt = os.path.join(work, "excise_ckpt")
        src2 = os.path.join(work, "feed2")
        os.makedirs(src2)
        half.coalesce(1).write.mode("append").parquet(src2)
        st.excise_ingest(
            spark.readStream.format("parquet").schema(schema).load(src2),
            ex_out, ex_state, ex_ckpt, k=5,
        )
        rest.unionByName(redeliver).coalesce(1).write.mode("append").parquet(src2)
        st.excise_ingest(
            spark.readStream.format("parquet").schema(schema).load(src2),
            ex_out, ex_state, ex_ckpt, k=5,
        )
        stats = (
            spark.read.parquet(ex_out)
            .agg(
                F.count(F.lit(1)).alias("docs"),
                F.sum("n_removed").alias("removed"),
                F.sum("n_tokens").alias("toks"),
            )
            .collect()[0]
        )
        print(
            f"substring excision: {stats['docs']} docs landed, "
            f"{stats['removed']}/{stats['toks']} tokens excised as "
            "previously-seen 5-gram spans (re-deliveries collapse to "
            "empty text; novel prose lands intact)"
        )
