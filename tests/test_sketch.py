"""Portable-HLL sketch tests (A6 deep parity, operators/sketch.py).

The hash-certified engine parity (Spark estimate == DuckDB replay,
bit-for-bit) is covered by q85's oracle in the driver gate; these
tests pin the operator properties that parity alone doesn't:
determinism under partitioning, accuracy vs exact, grouped mode,
NULL semantics.
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE
from xlearning_spark.operators.sketch import hll_distinct, sampled_percentiles
from xlearning_spark.sources import read_table


def test_partition_invariance(spark):
    # Register MAX is associative/commutative, so the estimate must be
    # EXACTLY identical no matter how rows are partitioned — the
    # property that makes the sketch mergeable across 1000 executors.
    li = read_table(spark, SF_SMOKE, "lineitem").select("l_orderkey")
    e1 = hll_distinct(li.repartition(1), "l_orderkey").collect()[0][0]
    e13 = hll_distinct(li.repartition(13), "l_orderkey").collect()[0][0]
    assert e1 == e13


def test_accuracy_within_hll_error(spark):
    li = read_table(spark, SF_SMOKE, "lineitem")
    est = hll_distinct(li, "l_orderkey", p=9).collect()[0][0]
    exact = li.select("l_orderkey").distinct().count()
    sigma = 1.04 / math.sqrt(1 << 9)
    assert abs(est - exact) / exact < 3 * sigma, (est, exact)


def test_grouped_estimates(spark):
    # p=4 keeps every o_orderstatus group in the raw-HLL zone
    # (n > 2.5m = 40) at smoke scale; error target 1.04/4 = 26%.
    o = read_table(spark, SF_SMOKE, "orders")
    got = {
        r.o_orderstatus: r.hll_custkeys
        for r in hll_distinct(
            o, "o_custkey", p=4, out_col="hll_custkeys", group_cols=["o_orderstatus"]
        ).collect()
    }
    exact = {
        r.o_orderstatus: r.n
        for r in o.groupBy("o_orderstatus")
        .agg(F.countDistinct("o_custkey").alias("n"))
        .collect()
    }
    assert set(got) == set(exact)
    for k, n in exact.items():
        if n > 40:  # raw zone only; tiny groups are out of contract
            assert abs(got[k] - n) / n < 3 * (1.04 / 4), (k, got[k], n)


def test_null_rows_ignored(spark):
    base = spark.createDataFrame(
        [(i, f"v{i % 50}") for i in range(500)], ["i", "v"]
    )
    with_nulls = base.unionByName(
        spark.createDataFrame([(9999, None)] * 25, "i bigint, v string")
    )
    e_base = hll_distinct(base, "v", p=4).collect()[0][0]
    e_null = hll_distinct(with_nulls, "v", p=4).collect()[0][0]
    assert e_base == e_null


def test_portable_minhash_finds_planted_neardups(spark):
    from xlearning_spark.operators.sketch import portable_minhash_pairs

    # Planted pairs at very high shingle-Jaccard (doc vs doc + one
    # trailing token) must all surface: at j ~ 0.9 the 12-band/4-row
    # s-curve miss probability is (1 - 0.9^4)^12 ~ 2e-6 per pair, and
    # the generator is deterministic, so this is a hard assertion,
    # not a flaky one.
    base = (
        read_table(spark, SF_SMOKE, "documents")
        .limit(40)
        .select("doc_id", "text")
    )
    dup = base.select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"),
        F.concat_ws(" ", "text", F.lit("zzz")).alias("text"),
    )
    pairs = portable_minhash_pairs(
        base.unionByName(dup), "doc_id", "text", threshold=0.5
    )
    found = {(r.id_a, r.id_b) for r in pairs.collect()}
    planted = {
        (r.doc_id, r.doc_id + 1_000_000) for r in base.select("doc_id").collect()
    }
    missing = {p for p in planted if p not in found}
    assert not missing, f"planted near-dups missed: {sorted(missing)[:5]}"


def test_portable_simhash_hamming_tracks_similarity(spark):
    from xlearning_spark.operators.sketch import portable_simhash

    df = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog " * 20),
            (2, "the quick brown fox jumps over the lazy dog " * 20 + "tail"),
            (3, "entirely different vocabulary about spark engines " * 20),
        ],
        ["doc_id", "text"],
    )
    fp = {r.id: r.simhash for r in portable_simhash(df, "doc_id", "text").collect()}

    def ham(a, b):
        return bin(a ^ b).count("1")

    assert ham(fp[1], fp[2]) <= 8  # one extra token barely moves votes
    assert ham(fp[1], fp[3]) >= 15  # disjoint vocab ~ independent bits


def test_sampled_percentiles_partition_invariance(spark):
    # The sample is selected by a pure hash predicate on row keys, so
    # the estimate must be exactly identical under any partitioning —
    # no rand()/TABLESAMPLE nondeterminism anywhere.
    li = read_table(spark, SF_SMOKE, "lineitem")
    args = (["l_orderkey", "l_linenumber"], "l_extendedprice", [0.5, 0.9])
    r1 = sampled_percentiles(li.repartition(1), *args).collect()[0]
    r13 = sampled_percentiles(li.repartition(13), *args).collect()[0]
    assert r1.asDict() == r13.asDict()


def test_sampled_percentiles_rate_and_accuracy(spark):
    li = read_table(spark, SF_SMOKE, "lineitem")
    total = li.count()
    got = sampled_percentiles(
        li, ["l_orderkey", "l_linenumber"], "l_extendedprice", [0.5], rate_bits=3
    ).collect()[0]
    # Hash uniformity: sample_n ~ Binomial(total, 1/8); 6 sigma bound.
    import math

    exp = total / 8
    assert abs(got.sample_n - exp) < 6 * math.sqrt(exp), (got.sample_n, exp)
    exact = float(
        li.agg(F.expr("percentile(l_extendedprice, 0.5)")).collect()[0][0]
    )
    # Median-of-sample error ~ O(1/sqrt(n)) in quantile space; prices
    # span ~[900, 100k], so allow 10% relative.
    assert abs(float(got.p50_sample) - exact) / exact < 0.10, (got, exact)


def test_sampled_percentiles_grouped_columns(spark):
    li = read_table(spark, SF_SMOKE, "lineitem")
    out = sampled_percentiles(
        li,
        ["l_orderkey", "l_linenumber"],
        "l_extendedprice",
        [0.5, 0.9],
        group_cols=["l_returnflag"],
    )
    assert out.columns == ["l_returnflag", "sample_n", "p50_sample", "p90_sample"]
    rows = out.collect()
    assert {r.l_returnflag for r in rows} == {"A", "N", "R"}
    for r in rows:
        assert r.p50_sample <= r.p90_sample


# --------------------------------------------------------------------
# Portable Count-Min sketch (q96's machinery) — engine parity is the
# driver oracle's job; these pin the CMS-specific guarantees.
# --------------------------------------------------------------------

def _cms_fixture(spark):
    from xlearning_spark.functions import tokens

    d = read_table(spark, SF_SMOKE, "documents")
    return d.select(F.explode(tokens("text")).alias("term"))


def test_cms_never_underestimates(spark):
    from xlearning_spark.operators.sketch import cms_estimate, cms_registers

    tok = _cms_fixture(spark)
    regs = cms_registers(tok, "term", depth=4, width=32)
    exact = tok.groupBy("term").agg(F.count(F.lit(1)).alias("n"))
    est = cms_estimate(regs, exact.select("term"), "term", 4, 32)
    j = {r["term"]: (r["n"], None) for r in exact.collect()}
    for r in est.collect():
        assert r["cms_estimate"] >= j[r["term"]][0], r
    # width=32 on this vocabulary must actually collide, or the test
    # isn't exercising the approximate regime at all.
    over = [
        r["term"]
        for r in est.join(exact, "term").collect()
        if r["cms_estimate"] > r["n"]
    ]
    assert over, "expected live collisions at width=32"


def test_cms_wide_sketch_is_exact(spark):
    # With width >> vocabulary, no row collides and min == exact count.
    from xlearning_spark.operators.sketch import cms_estimate, cms_registers

    tok = _cms_fixture(spark)
    regs = cms_registers(tok, "term", depth=4, width=4096)
    exact = tok.groupBy("term").agg(F.count(F.lit(1)).alias("n"))
    est = cms_estimate(regs, exact.select("term"), "term", 4, 4096)
    for r in est.join(exact, "term").collect():
        assert r["cms_estimate"] == r["n"], r


def test_cms_registers_merge_additively(spark):
    # SUM-merge of two half-stream sketches == the whole-stream sketch:
    # the property that makes the CMS partition-safe and streamable.
    from xlearning_spark.operators.sketch import cms_registers, merge_cms_registers

    tok = _cms_fixture(spark)
    h1 = tok.filter(F.crc32("term") % 2 == 0)
    h2 = tok.filter(F.crc32("term") % 2 == 1)
    whole = {
        (r["__row"], r["__idx"]): r["__cnt"]
        for r in cms_registers(tok, "term", 4, 64).collect()
    }
    merged = {
        (r["__row"], r["__idx"]): r["__cnt"]
        for r in merge_cms_registers(
            cms_registers(h1, "term", 4, 64), cms_registers(h2, "term", 4, 64)
        ).collect()
    }
    assert whole == merged


def test_cms_unseen_probe_reads_zero(spark):
    from xlearning_spark.operators.sketch import cms_estimate, cms_registers

    tok = _cms_fixture(spark)
    regs = cms_registers(tok, "term", depth=4, width=4096)
    probes = tok.sparkSession.createDataFrame(
        [("definitely-not-in-the-corpus-xyzzy",)], "term string"
    )
    got = cms_estimate(regs, probes, "term", 4, 4096).collect()
    assert got[0]["cms_estimate"] == 0


def test_hll_linear_counting_small_range(spark):
    # Raw HLL overestimates badly for n << m; the opt-in small-range
    # correction (m * ln(m/V)) must land near exact there, and the two
    # branches must agree once n is in the raw-HLL zone (n > 2.5m).
    from xlearning_spark.operators.sketch import hll_distinct

    small = spark.range(0, 15).select(F.col("id").alias("v"))
    raw = hll_distinct(small, "v", p=9).collect()[0][0]
    corrected = hll_distinct(small, "v", p=9, linear_counting=True).collect()[0][0]
    assert abs(corrected - 15) / 15 < 0.25, (corrected, raw)
    assert raw > 2 * 15  # the regime the correction exists for

    big = spark.range(0, 20000).select(F.col("id").alias("v"))
    r = hll_distinct(big, "v", p=4).collect()[0][0]  # n >> 2.5m = 40
    c = hll_distinct(big, "v", p=4, linear_counting=True).collect()[0][0]
    assert r == c


def test_bloom_no_false_negatives_and_partition_invariance(spark):
    # Every build key must probe true (one-sided error), and the bit
    # set must be identical under any partitioning (OR idempotence).
    from xlearning_spark.operators.sketch import bloom_bits, bloom_might_contain

    build = spark.createDataFrame([(f"k{i}",) for i in range(200)], "key string")
    bits_1 = bloom_bits(build.coalesce(1), "key", m_bits=1024, k=3)
    bits_8 = bloom_bits(build.repartition(8), "key", m_bits=1024, k=3)
    assert {r["__bit"] for r in bits_1.collect()} == {
        r["__bit"] for r in bits_8.collect()
    }
    probes = spark.createDataFrame(
        [(f"k{i}",) for i in range(400)], "key string"
    )
    got = {
        r.key: r.bloom_hit
        for r in bloom_might_contain(bits_8, probes, "key", 1024, 3).collect()
    }
    assert all(got[f"k{i}"] for i in range(200))  # no false negatives
    # tight filter -> SOME false positives live, but not all non-members
    fps = [i for i in range(200, 400) if got[f"k{i}"]]
    assert 0 < len(fps) < 200


def test_bloom_union_is_distinct_union(spark):
    from xlearning_spark.operators.sketch import bloom_bits

    a = spark.createDataFrame([(f"a{i}",) for i in range(50)], "key string")
    b = spark.createDataFrame([(f"b{i}",) for i in range(50)], "key string")
    u = a.unionByName(b)
    bits_u = {r["__bit"] for r in bloom_bits(u, "key", 512, 3).collect()}
    bits_ab = {
        r["__bit"]
        for r in bloom_bits(a, "key", 512, 3)
        .unionByName(bloom_bits(b, "key", 512, 3))
        .distinct()
        .collect()
    }
    assert bits_u == bits_ab


def test_heavy_hitters_exact_on_skewed_large_domain(spark):
    # 10k distinct tail values + a few planted heavy keys: the MG
    # candidate pass must never lose a true heavy hitter, and the
    # final set must be EXACTLY {x : freq(x) * k > N} with exact
    # counts — independent of partitioning.
    import random

    from xlearning_spark.operators.sketch import heavy_hitters

    rng = random.Random(11)
    rows = [(f"hot{j}",) for j in range(3) for _ in range(4000)]
    rows += [(f"warm{j}",) for j in range(4) for _ in range(900)]
    rows += [(f"tail{i}",) for i in range(10000)]
    rng.shuffle(rows)
    df = spark.createDataFrame(rows, "v string")
    n = len(rows)
    k = 20  # threshold n/20 = 1280: hot (4000) pass, warm (900) + tail miss
    from collections import Counter

    truth = {
        (v, c) for v, c in Counter(r[0] for r in rows).items() if c * k > n
    }
    for parts in (1, 16):
        got = {
            (r.v, r.freq)
            for r in heavy_hitters(df.repartition(parts), "v", k=k).collect()
        }
        assert got == truth
    assert len(truth) == 3  # the planted hot keys, exactly


def test_heavy_hitters_releases_summary_persist(spark):
    # r7 VERDICT #4: heavy_hitters must leave nothing persisted or
    # checkpointed behind. The r8 implementation never caches at all —
    # the merged summary (<= k+1 rows) is collected once and the exact
    # recount filters with isin literals — so the persistent-RDD set
    # must be unchanged after a full run.
    from xlearning_spark.operators.sketch import heavy_hitters

    jsc = spark.sparkContext._jsc
    before = set(jsc.getPersistentRDDs().keySet().toArray())
    df = spark.createDataFrame(
        [(f"v{i % 5}",) for i in range(200)], "v string"
    )
    out = heavy_hitters(df.repartition(4), "v", k=3)
    out.collect()
    after = set(jsc.getPersistentRDDs().keySet().toArray())
    assert after - before == set(), (
        f"heavy_hitters leaked persisted RDDs: {after - before}"
    )


def test_heavy_hitters_tree_merge_at_high_partition_count(spark):
    # The >256-partition tree-merge level must not change results:
    # same exact heavy hitters as the flat merge (mergeability is
    # associative), verified on a 300-partition input.
    from collections import Counter

    from xlearning_spark.operators.sketch import heavy_hitters

    rows = [(f"hot{j}",) for j in range(2) for _ in range(3000)]
    rows += [(f"tail{i}",) for i in range(3000)]
    df = spark.createDataFrame(rows, "v string").repartition(300)
    k = 10
    n = len(rows)
    truth = {
        (v, c) for v, c in Counter(r[0] for r in rows).items() if c * k > n
    }
    got = {(r.v, r.freq) for r in heavy_hitters(df, "v", k=k).collect()}
    assert got == truth and len(truth) == 2
