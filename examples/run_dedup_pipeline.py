"""LLM-pipeline demo: the dedup ladder over `documents` — exact
content-hash, MinHash-LSH near-dup pairs, duplicate components.

This is the 100 TB-shaped pipeline: content hash is one shuffle;
MinHash signatures are map-side with a band-key-local candidate join
and exact-Jaccard verification; components run bounded label
propagation over the verified pair graph.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DEFAULT_SF = "/root/testdata/sf0.001"


def main(spark, sf_dir: str = DEFAULT_SF) -> None:
    from pyspark.sql import functions as F

    from xlearning_spark.operators.dedup import (
        connected_components,
        exact_dedup,
        minhash_near_duplicates,
    )
    from xlearning_spark.sources import read_table

    docs = read_table(spark, sf_dir, "documents")
    n = docs.count()

    keepers = exact_dedup(
        docs.withColumn("h", F.md5("text")), ["h"], "doc_id"
    ).count()
    print(f"exact dedup: {n} docs -> {keepers} unique contents")

    pairs = minhash_near_duplicates(docs, "doc_id", "text", threshold=0.5)
    pairs_df = pairs.select("id_a", "id_b").localCheckpoint(eager=True)
    n_pairs = pairs_df.count()
    print(f"minhash near-dup pairs (j >= 0.5): {n_pairs}")

    if n_pairs:
        comps = connected_components(pairs_df)
        groups = comps.groupBy("component").count().filter(F.col("count") > 1)
        print(f"duplicate groups: {groups.count()}")
    else:
        print("duplicate groups: 0 (fixture has few near-dups at sf0.001)")

    # Sub-document granularity: exact substring dedup (Lee et al.
    # ACL'22) — excise every 8-token span shared across docs, keep
    # the unique prose. Doc-level dedup above drops WHOLE near-dup
    # docs; this stage cleans the survivors of shared boilerplate.
    from xlearning_spark.operators.dedup import excise_duplicate_spans

    cleaned = excise_duplicate_spans(docs, "doc_id", "text", k=8)
    stats = cleaned.agg(
        F.sum("n_tokens").alias("toks"), F.sum("n_removed").alias("gone")
    ).collect()[0]
    print(
        f"substring excision: removed {stats['gone']}/{stats['toks']}"
        " tokens of cross-doc 8-gram boilerplate"
    )


if __name__ == "__main__":
    from xlearning_spark.engine import build_session

    main(build_session(app_name="example-dedup"))
