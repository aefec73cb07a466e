"""Similarity-search demo over `embeddings`: exact broadcast top-k,
then the ANN compression/scale ladder (hyperplane LSH, IVF, PQ, SQ8)
with each rung's recall against the exact answer.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DEFAULT_SF = "/root/testdata/sf0.001"


def main(spark, sf_dir: str = DEFAULT_SF) -> None:
    from pyspark.sql import functions as F

    from xlearning_spark.operators.similarity import (
        brute_force_topk,
        build_sq8_index,
        ivf_topk,
        lsh_topk,
        pq_topk_oneshot,
        sq8_topk,
    )
    from xlearning_spark.sources import read_table

    emb = read_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)

    exact = {(r.qid, r.cid) for r in brute_force_topk(emb, queries, k=5).collect()}
    lsh = {(r.qid, r.cid) for r in lsh_topk(emb, queries, dim=64, k=5).collect()}
    ivf = {
        (r.qid, r.cid)
        for r in ivf_topk(emb, queries, k=5, n_cells=8, n_probe=4).collect()
    }
    pq = {
        (r.qid, r.cid)
        for r in pq_topk_oneshot(emb, queries, k=5, m=8, bits=4).collect()
    }
    sq_idx = build_sq8_index(emb)
    sq = {
        (r.qid, r.cid)
        for r in sq8_topk(sq_idx, emb, queries, k=5, shortlist=32).collect()
    }
    sq_idx.unpersist()
    print(f"exact top-5 pairs: {len(exact)}")
    if exact:
        print(f"LSH recall: {len(exact & lsh) / len(exact):.2f}")
        print(f"IVF recall: {len(exact & ivf) / len(exact):.2f}")
        print(f"PQ  recall: {len(exact & pq) / len(exact):.2f}"
              " (8x4-bit codes, ADC shortlist + exact re-rank)")
        print(f"SQ8 recall: {len(exact & sq) / len(exact):.2f}"
              " (per-dim int8 codes — deterministic, hash-certified in q114)")
    else:
        print("no query vectors in this fixture — recall undefined")

    # Streaming index maintenance (r11): build + save on half the
    # corpus, stream the other half through ann_ingest (frozen
    # centroids, no refit), probe the drained index — the FAISS-style
    # train-then-add lifecycle, end to end.
    import os
    import tempfile

    from xlearning_spark.operators.similarity import (
        build_ivf_index,
        ivf_probe,
        load_ivf_index,
        save_ivf_index,
    )
    from xlearning_spark.streaming import ann_ingest

    with tempfile.TemporaryDirectory() as tmp:
        idx_dir, ckpt, src = (
            os.path.join(tmp, d) for d in ("ivf", "ck", "src")
        )
        half_a = emb.filter(F.col("vec_id") % 2 == 0)
        half_b = emb.filter(F.col("vec_id") % 2 == 1)
        idx = build_ivf_index(half_a, n_cells=8, seed=11)
        save_ivf_index(idx, idx_dir)
        idx.unpersist()
        half_b.select("vec_id", "embedding").coalesce(2).write.parquet(src)
        written = ann_ingest(
            spark.readStream.format("parquet")
            .schema("vec_id bigint, embedding array<float>")
            .load(src),
            idx_dir, ckpt,
        )
        grown = load_ivf_index(spark, idx_dir)
        n_hits = ivf_probe(grown, queries, k=5, n_probe=4).count()
        print(
            f"streaming IVF add: {len(written)} batch(es) landed, index "
            f"now {grown.cells.count()} vectors, probe returned "
            f"{n_hits} pairs"
        )
        grown.unpersist()


if __name__ == "__main__":
    from xlearning_spark.engine import build_session

    main(build_session(app_name="example-similarity"))
