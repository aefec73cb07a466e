"""Training-corpus pipeline operators (operators/corpus.py).

Property tests beyond the oracle gate: partition-layout independence of
the hash samplers (the property rand()-based sampling lacks), packing
arithmetic, planted-duplicate decontamination, redaction completeness,
and the short-document shingle guard.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from xlearning_spark.functions import shingles
from xlearning_spark.operators.corpus import (
    decontaminate,
    deterministic_split,
    hash_sample,
    hex_threshold,
    pack_token_chunks,
    pii_stats,
    repetition_stats,
    stratified_sample,
    weighted_source_sample,
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [(i, f"w{i % 7} w{i % 5} w{i % 3} common text body {i}", f"s{i % 4}")
            for i in range(400)]
    return spark.createDataFrame(rows, "doc_id bigint, text string, source string")


def test_split_proportions_and_stability(spark, docs):
    d = deterministic_split(docs, "doc_id", {"train": 0.8, "val": 0.1, "test": 0.1})
    counts = {r["split"]: r["n"] for r in d.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert counts["train"] > counts.get("val", 0) and counts["train"] > counts.get("test", 0)
    assert sum(counts.values()) == 400
    # Partition-layout independence: identical assignment at any parallelism.
    a = dict(deterministic_split(docs.repartition(13), "doc_id", {"train": 0.8, "val": 0.2})
             .select("doc_id", "split").collect())
    b = dict(deterministic_split(docs.coalesce(1), "doc_id", {"train": 0.8, "val": 0.2})
             .select("doc_id", "split").collect())
    assert a == b
    # Growing the table never reassigns existing rows.
    bigger = docs.union(
        spark.createDataFrame([(1000 + i, "x", "s0") for i in range(100)],
                              "doc_id bigint, text string, source string"))
    c = dict(deterministic_split(bigger, "doc_id", {"train": 0.8, "val": 0.2})
             .select("doc_id", "split").collect())
    assert all(c[k] == v for k, v in a.items())


def test_hex_threshold_bounds():
    assert hex_threshold(0.0) == "00000000"
    assert hex_threshold(1.0) == "gggggggg"  # above every hex string
    assert hex_threshold(0.5) == "80000000"


def test_hash_sample_deterministic_subset(docs):
    s1 = {r["doc_id"] for r in hash_sample(docs, "doc_id", 0.3).select("doc_id").collect()}
    s2 = {r["doc_id"] for r in hash_sample(docs.repartition(17), "doc_id", 0.3)
          .select("doc_id").collect()}
    assert s1 == s2
    assert 0.15 < len(s1) / 400 < 0.45  # ~Binomial(400, .3)
    # Nested property: a smaller fraction with the same salt is a subset.
    s3 = {r["doc_id"] for r in hash_sample(docs, "doc_id", 0.1).select("doc_id").collect()}
    assert s3 <= s1


def test_weighted_source_sample(docs):
    kept = weighted_source_sample(docs, "doc_id", "source",
                                  {"s0": 1.0, "s1": 0.5, "s2": 0.0})
    by_src = {r["source"]: r["n"] for r in
              kept.groupBy("source").agg(F.count("*").alias("n")).collect()}
    assert by_src["s0"] == 100          # rate 1.0 keeps everything
    assert "s2" not in by_src           # rate 0.0 drops everything
    assert "s3" not in by_src           # absent source -> default 0.0
    assert 20 < by_src["s1"] < 80


def test_stratified_sample_exact_k(docs):
    got = stratified_sample(docs, "source", "doc_id", k=7)
    by_src = {r["source"]: r["n"] for r in
              got.groupBy("source").agg(F.count("*").alias("n")).collect()}
    assert by_src == {"s0": 7, "s1": 7, "s2": 7, "s3": 7}
    # Deterministic under reshuffling.
    a = sorted(r["doc_id"] for r in got.collect())
    b = sorted(r["doc_id"] for r in
               stratified_sample(docs.repartition(11), "source", "doc_id", k=7).collect())
    assert a == b


def test_pack_token_chunks_arithmetic(spark):
    rows = [("sh", i, 30) for i in range(10)]  # 300 tokens, ctx 100 -> 3+ chunks
    df = spark.createDataFrame(rows, "shard string, doc_id bigint, nt int")
    got = {r["doc_id"]: r["chunk_id"] for r in
           pack_token_chunks(df, "shard", "doc_id", "nt", ctx_len=100).collect()}
    # doc i starts at token 30*i -> chunk floor(30i/100)
    assert got == {i: (30 * i) // 100 for i in range(10)}
    # Chunk ids are monotone in doc order and shard-local.
    df2 = df.withColumn("shard", F.concat(F.lit("p"), (F.col("doc_id") % 2).cast("string")))
    got2 = pack_token_chunks(df2, "shard", "doc_id", "nt", ctx_len=100)
    per_shard = {r["shard"]: r["n"] for r in
                 got2.groupBy("shard").agg(F.countDistinct("chunk_id").alias("n")).collect()}
    assert per_shard == {"p0": 2, "p1": 2}  # 150 tokens each -> chunks 0,1


def test_decontaminate_planted_duplicate(spark):
    base = "alpha beta gamma delta epsilon zeta eta theta"
    train = spark.createDataFrame(
        [(1, base), (2, "totally different words here entirely now")],
        "doc_id bigint, text string")
    ev = spark.createDataFrame([(100, base)], "doc_id bigint, text string")
    out = {r["train_id"]: (r["eval_id"], r["overlap_frac"])
           for r in decontaminate(train, ev, n=3, threshold=0.5).collect()}
    assert out == {1: (100, 1.0)}


def test_decontaminate_short_docs_safe(spark):
    # Docs shorter than n tokens must yield empty shingles, not a
    # slice(0) runtime error (sequence(1,0) regression guard).
    train = spark.createDataFrame([(1, "one"), (2, "a b c d e")],
                                  "doc_id bigint, text string")
    ev = spark.createDataFrame([(9, "x")], "doc_id bigint, text string")
    assert decontaminate(train, ev, n=3, threshold=0.1).count() == 0


def test_shingles_short_doc_empty(spark):
    df = spark.createDataFrame([("one",), ("a b c",)], "text string")
    got = df.select(F.size(shingles("text", 2)).alias("n")).collect()
    assert sorted(r["n"] for r in got) == [0, 2]


def test_pii_redaction_complete(spark):
    df = spark.createDataFrame(
        [(1, "mail bob.smith+x@corp.example.org then 192.168.0.1 and +44-201-5550-1234 done"),
         (2, "nothing sensitive here")],
        "doc_id bigint, text string")
    out = {r["doc_id"]: r for r in pii_stats(df, "text").collect()}
    assert (out[1]["n_emails"], out[1]["n_phones"], out[1]["n_ips"]) == (1, 1, 1)
    assert (out[2]["n_emails"], out[2]["n_phones"], out[2]["n_ips"]) == (0, 0, 0)
    red = out[1]["redacted"]
    assert "<EMAIL>" in red and "<PHONE>" in red and "<IP>" in red
    # Nothing pattern-shaped survives redaction.
    leftover = pii_stats(
        spark.createDataFrame([(1, red)], "doc_id bigint, text string"), "text"
    ).collect()[0]
    assert (leftover["n_emails"], leftover["n_phones"], leftover["n_ips"]) == (0, 0, 0)


def test_repetition_stats_hand_example(spark):
    df = spark.createDataFrame([(1, "a a a b"), (2, "w x y z")],
                               "doc_id bigint, text string")
    out = {r["doc_id"]: r for r in repetition_stats(df).collect()}
    assert out[1]["n_tokens"] == 4
    assert out[1]["dup_token_frac"] == 0.5       # 2 distinct of 4
    assert out[1]["top_bigram_frac"] == 1.0      # "a a" twice -> 2*2/4
    assert out[2]["dup_token_frac"] == 0.0
    assert out[2]["top_bigram_frac"] == 0.5      # every bigram once -> 2/4


def test_hashed_string_path_parity(spark):
    # The hashed (int-shingle) production paths must agree row-for-row
    # with the string-shingle oracle-shaped twins on the real fixture
    # corpus — this is what licenses keeping the string-based DuckDB
    # oracles for q74/q76 while the queries run the hashed path.
    from xlearning_spark.operators.corpus import decontaminate, repetition_stats

    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    # The fixture has no NULL-text / sub-n-token docs; plant both so the
    # parity claim covers the degenerate rows (r4 advice: the outer
    # explode used to count a NULL token, diverging from the string twin
    # exactly here).
    extras = spark.createDataFrame(
        [(10_000_001, None), (10_000_002, "solo"), (10_000_003, "")],
        "doc_id bigint, text string",
    )
    docs = docs.select("doc_id", "text").unionByName(extras)
    ev = docs.filter(F.col("doc_id") % 97 == 0)
    tr = docs.filter(F.col("doc_id") % 97 != 0)

    a = decontaminate(tr, ev, n=2, threshold=0.1, hashed=True).collect()
    b = decontaminate(tr, ev, n=2, threshold=0.1, hashed=False).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))

    ra = repetition_stats(docs, hashed=True).collect()
    rb = repetition_stats(docs, hashed=False).collect()
    assert len(ra) == len(rb) == docs.count()
    key = lambda r: (r is None, r)
    assert sorted(map(tuple, ra), key=lambda t: [key(v) for v in t]) == sorted(
        map(tuple, rb), key=lambda t: [key(v) for v in t]
    )


# ------------------------------------- temperature (alpha) mixture

def test_temperature_sample_flattens_mixture(spark):
    # alpha-smoothing must move domain shares TOWARD uniform: the
    # dominant domain's share shrinks, the smallest domain's share
    # grows, and tiny domains keep (nearly) everything (rate caps at 1).
    from xlearning_spark.operators.corpus import temperature_source_sample

    rows = (
        [(i, "head") for i in range(8000)]
        + [(10_000 + i, "mid") for i in range(1500)]
        + [(20_000 + i, "tail") for i in range(120)]
    )
    df = spark.createDataFrame(rows, ["doc_id", "source"])
    kept = temperature_source_sample(df, "doc_id", "source", budget_frac=0.5)
    n = {r.source: r.n for r in kept.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()}
    tot = sum(n.values())
    assert n["head"] / tot < 8000 / 9620  # head share strictly shrinks
    assert n["tail"] / tot > 120 / 9620  # tail share strictly grows
    assert n["tail"] >= 110  # near-total retention of the smallest domain
    # Budget: kept total ~ budget_frac * N (rate caps push it slightly up)
    assert 0.4 * 9620 < tot < 0.75 * 9620


def test_temperature_sample_deterministic_and_partition_invariant(spark):
    from xlearning_spark.operators.corpus import temperature_source_sample
    from xlearning_spark.sources import read_table

    docs = read_table(spark, "/root/testdata/sf0.001", "documents")
    a = {
        r.doc_id
        for r in temperature_source_sample(
            docs.repartition(1), "doc_id", "source", 0.5
        ).select("doc_id").collect()
    }
    b = {
        r.doc_id
        for r in temperature_source_sample(
            docs.repartition(17), "doc_id", "source", 0.5
        ).select("doc_id").collect()
    }
    assert a == b and len(a) > 0


def test_token_budget_cap_fills_to_budget(spark, docs):
    from xlearning_spark.functions import token_count
    from xlearning_spark.operators.corpus import token_budget_cap

    d = docs.withColumn("nt", token_count("text"))
    kept = token_budget_cap(d, "source", "doc_id", "nt", 40)
    per = {
        r["source"]: (r["n"], r["tok"])
        for r in kept.groupBy("source")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("nt").alias("tok"))
        .collect()
    }
    # Every source crosses the 40-token line with its LAST doc: total
    # >= budget, and dropping that doc would fall under budget.
    max_doc = 7  # every fixture doc is 7 tokens
    for src, (n, tok) in per.items():
        assert tok >= 40, (src, tok)
        assert tok - max_doc < 40, (src, tok)
    # Deterministic: same budget, same rows, any partitioning.
    k2 = token_budget_cap(d.repartition(13), "source", "doc_id", "nt", 40)
    assert sorted(r["doc_id"] for r in kept.collect()) == sorted(
        r["doc_id"] for r in k2.collect()
    )


def test_token_budget_cap_per_source_dict(spark, docs):
    from xlearning_spark.functions import token_count
    from xlearning_spark.operators.corpus import token_budget_cap

    d = docs.withColumn("nt", token_count("text"))
    kept = token_budget_cap(
        d, "source", "doc_id", "nt", {"s0": 70, "s1": 14}
    )
    per = {
        r["source"]: r["tok"]
        for r in kept.groupBy("source").agg(F.sum("nt").alias("tok")).collect()
    }
    # s2/s3 have no budget -> dropped entirely; s0 gets ~5x s1's tokens.
    assert set(per) == {"s0", "s1"}
    assert per["s0"] >= 70 and per["s1"] >= 14
    assert per["s0"] > per["s1"]


def test_gopher_flags_match_python_reference(spark, docs):
    from xlearning_spark.operators.text import GOPHER_STOPWORDS, gopher_flags

    got = {r["doc_id"]: r for r in gopher_flags(docs).collect()}
    for row in docs.collect():
        w = row["text"].split()
        n = len(w)
        mwl = sum(len(x) for x in w) / n
        swf = sum(1 for x in w if x in GOPHER_STOPWORDS) / n
        twf = max(w.count(t) for t in set(w)) / n
        dfr = len(set(w)) / n
        g = got[row["doc_id"]]
        assert g["n_words"] == n
        assert abs(g["mean_word_len"] - mwl) < 1e-12
        assert abs(g["stopword_frac"] - swf) < 1e-12
        assert abs(g["top_word_frac"] - twf) < 1e-12
        assert abs(g["distinct_frac"] - dfr) < 1e-12
        assert g["keep"] == (
            (20 <= n <= 80)
            and (4.0 <= mwl <= 5.0)
            and swf >= 0.03
            and twf <= 0.15
            and dfr >= 0.35
        )


def test_gopher_flags_keep_null_and_empty_text_docs(spark):
    # ADVICE r5: the top-word aggregate explodes to no rows for a
    # NULL/empty-text doc, and the old INNER join back dropped the doc
    # from the output entirely. Every input doc must yield exactly one
    # output row; metric-less docs carry NULL metrics (never a
    # fabricated pass/fail), matching the q94 oracle's CASE WHEN
    # accounting (counted in n_docs, in no fail_* column).
    from xlearning_spark.operators.text import gopher_flags

    d = spark.createDataFrame(
        [(1, "the quick brown fox and the lazy dog of yore"),
         (2, None),
         (3, "")],
        "doc_id bigint, text string",
    )
    got = {r["doc_id"]: r for r in gopher_flags(d).collect()}
    assert set(got) == {1, 2, 3}
    assert got[1]["n_words"] == 10 and got[1]["top_word_frac"] is not None
    # NULL text: no exploded rows, metric-less — NULL metrics, NULL keep.
    assert got[2]["n_words"] is None
    assert got[2]["top_word_frac"] is None
    assert got[2]["keep"] is None
    # Empty text: split yields [''] in BOTH engines (Spark split ==
    # DuckDB string_split_regex), so it is one empty token, not a
    # missing doc: real metrics, keep=False via the length rule.
    assert got[3]["n_words"] == 1
    assert got[3]["top_word_frac"] == 1.0
    assert got[3]["keep"] is False


def test_decontaminate_prefilter_identical_results(spark):
    # The candidate semi-join reduction must not change the flag set:
    # a flagged doc shares >= 1 shingle, so it always survives the
    # pre-filter, for every threshold and both join-key paths.
    from tests.conftest import SF_SMOKE
    from xlearning_spark.operators.corpus import decontaminate
    from xlearning_spark.sources import read_table

    d = read_table(spark, SF_SMOKE, "documents")
    ev = d.filter(F.col("doc_id") % 97 == 0)
    tr = d.filter(F.col("doc_id") % 97 != 0)
    for hashed in (True, False):
        a = sorted(
            map(tuple, decontaminate(tr, ev, n=2, threshold=0.1,
                                     hashed=hashed, prefilter=True).collect())
        )
        b = sorted(
            map(tuple, decontaminate(tr, ev, n=2, threshold=0.1,
                                     hashed=hashed, prefilter=False).collect())
        )
        assert a == b and a
