"""Training-corpus pipeline query tier (operators/corpus.py).

Every operator here is deterministic and engine-portable, so the whole
tier is hash-checked against DuckDB — including the samplers: they key
on ``md5(salt || ':' || doc_id)`` hex prefixes, which both engines
compute identically (no ``rand()``, whose stream is partition-layout
dependent in Spark and unreproducible in SQL).

Scale shapes (100 TB): split/mixture/PII are map-only scans; stratified
sampling and chunking are one window shuffle on the stratum/shard key;
repetition stats are explode + two map-side-combining hash aggs;
decontamination broadcasts the bounded eval side. Decontamination and
repetition stats join/aggregate on 58-bit int shingle hashes (no
shingle strings ever materialize — functions.with_shingle_hashes);
their DuckDB oracles are the brute-force string-shingle twins, valid
because the hash outputs never reach the result and SHINGLE_MOD_58
makes hash-equality == shingle-equality at fixture scale (parity with
the ``hashed=False`` string path is also pytest-asserted).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from xlearning_spark.functions import token_count
from xlearning_spark.operators.corpus import (
    deterministic_split,
    decontaminate,
    hex_threshold,
    oracle_hash_bucket,
    oracle_split_case,
    pack_token_chunks,
    pii_stats,
    repetition_stats,
    stratified_sample,
    weighted_source_sample,
)
from xlearning_spark.queries.registry import query
from xlearning_spark.sources import read_table as _t

#: DuckDB twin of functions.tokens.
_TOKS = "string_split_regex(text, '\\s+')"

_SPLITS = {"train": 0.8, "val": 0.1, "test": 0.1}

#: Domain-mixture recipe: deterministic per-source sampling rates
#: (src0 -> 0.1, src1 -> 0.2, ..., src9/src19 -> 1.0).
_MIX = {f"src{i}": ((i % 10) + 1) / 10 for i in range(20)}


@query(
    "q71_deterministic_split",
    oracle=f"""
WITH t AS (SELECT {oracle_split_case('doc_id', _SPLITS)} AS split,
                  source, len({_TOKS}) AS nt
           FROM documents)
SELECT split, source, COUNT(*) AS n_docs, CAST(SUM(nt) AS BIGINT) AS n_tokens
FROM t GROUP BY 1, 2
""",
    tags=("corpus", "split"),
    doc="Deterministic hash train/val/test split (80/10/10) keyed on "
    "(salt, doc_id): reproducible across runs, partitionings, and "
    "engines — unlike rand()-based splits, adding rows never reassigns "
    "existing ones. Map-only (operators/corpus.deterministic_split); "
    "the oracle replays the same md5 hex-prefix CASE.",
)
def q71_deterministic_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = deterministic_split(_t(spark, sf_dir, "documents"), "doc_id", _SPLITS)
    return d.groupBy("split", "source").agg(
        F.count("*").alias("n_docs"),
        F.sum(token_count("text")).alias("n_tokens"),
    )


def _mix_case() -> str:
    arms = " ".join(
        f"WHEN '{s}' THEN '{hex_threshold(w)}'" for s, w in _MIX.items()
    )
    return f"CASE source {arms} ELSE '{hex_threshold(0.0)}' END"


@query(
    "q72_domain_mixture",
    oracle=f"""
SELECT source, COUNT(*) AS n_kept
FROM documents
WHERE {oracle_hash_bucket('doc_id', 'mix')} < {_mix_case()}
GROUP BY source
""",
    tags=("corpus", "mixture"),
    doc="Domain-mixture sampling (the 'data recipe'): each source kept "
    "at its own deterministic rate via a BROADCAST weights table + "
    "map-side hash filter — zero shuffles on the corpus at any scale "
    "(operators/corpus.weighted_source_sample).",
)
def q72_domain_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = weighted_source_sample(
        _t(spark, sf_dir, "documents"), "doc_id", "source", _MIX, salt="mix"
    )
    return d.groupBy("source").agg(F.count("*").alias("n_kept"))


@query(
    "q73_token_chunking",
    oracle=f"""
WITH t AS (SELECT source, doc_id, len({_TOKS}) AS nt FROM documents),
c AS (SELECT source, doc_id, nt,
             COALESCE(SUM(nt) OVER (PARTITION BY source ORDER BY doc_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum
      FROM t)
SELECT source, CAST(FLOOR(cum / 512.0) AS BIGINT) AS chunk_id,
       COUNT(*) AS n_docs, CAST(SUM(nt) AS BIGINT) AS n_tokens
FROM c GROUP BY 1, 2
""",
    tags=("corpus", "packing"),
    doc="GPT-style token-budget chunking (concat-then-split packing, 512 "
    "tokens): chunk_id = floor(exclusive running token sum / ctx) per "
    "shard, one window per shard key — shards scale out independently, "
    "mirroring the reference's per-worker file splits (AM:971-1041). "
    "operators/corpus.pack_token_chunks.",
)
def q73_token_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents").withColumn("nt", token_count("text"))
    packed = pack_token_chunks(d, "source", "doc_id", "nt", ctx_len=512)
    return packed.groupBy("source", "chunk_id").agg(
        F.count("*").alias("n_docs"), F.sum("nt").alias("n_tokens")
    )


@query(
    "q74_decontamination",
    oracle="""
WITH t AS (SELECT doc_id, string_split_regex(text, '\\s+') AS toks FROM documents),
s AS (SELECT doc_id,
             list_distinct(list_transform(range(1, len(toks)),
                 i -> concat_ws(' ', toks[i], toks[i+1]))) AS sh
      FROM t WHERE len(toks) >= 2),
tr AS (SELECT * FROM s WHERE doc_id % 97 <> 0),
ev AS (SELECT * FROM s WHERE doc_id % 97 = 0),
ov AS (SELECT tr.doc_id AS train_id, ev.doc_id AS eval_id,
              CAST(len(list_intersect(tr.sh, ev.sh)) AS DOUBLE) / len(tr.sh) AS f
       FROM tr JOIN ev ON len(list_intersect(tr.sh, ev.sh)) > 0),
r AS (SELECT train_id, eval_id, f,
             ROW_NUMBER() OVER (PARTITION BY train_id
                                ORDER BY f DESC, eval_id) AS rn
      FROM ov WHERE f >= 0.1)
SELECT train_id, eval_id, ROUND(f, 8) AS overlap_frac FROM r WHERE rn = 1
""",
    tags=("corpus", "decontamination"),
    doc="Benchmark decontamination: flag training docs whose distinct "
    "word-n-gram overlap with any eval doc (doc_id % 97 = 0) is >= 0.1, "
    "reporting the worst-offending eval doc. Spark side joins exploded "
    "shingles with the bounded eval side BROADCAST (corpus scanned "
    "once, no corpus shuffle) keyed on 58-bit int shingle hashes — no "
    "shingle string is ever built (functions.with_shingle_hashes, "
    "collision bound ~1.6e-7 at fixture scale, so results are identical "
    "to the string path the DuckDB brute-force all-pairs oracle "
    "computes; parity also pytest-asserted). Fixture uses bigrams "
    "(tiny synthetic vocabulary); production uses n=8..13, same shape. "
    "operators/corpus.decontaminate.",
)
def q74_decontamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    ev = d.filter(F.col("doc_id") % 97 == 0)
    tr = d.filter(F.col("doc_id") % 97 != 0)
    return decontaminate(tr, ev, n=2, threshold=0.1)


#: Deterministic synthetic PII suffix: the fixture text is clean prose,
#: so the redaction query plants one email / IPv4 / phone per doc (keyed
#: on doc_id) and the operator must find and scrub exactly those.
_PII_SUFFIX_SQL = (
    "concat(text, ' contact user', CAST(doc_id AS VARCHAR), '@example.com",
    " via 10.', CAST(doc_id % 250 AS VARCHAR), '.0.',",
    " CAST(doc_id % 200 AS VARCHAR), ' call +1-555-',",
    " lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0'))",
)


@query(
    "q75_pii_redaction",
    oracle=f"""
WITH p AS (SELECT doc_id, {''.join(_PII_SUFFIX_SQL)} AS t2 FROM documents),
r AS (SELECT doc_id,
             len(regexp_extract_all(t2, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{{2,}}')) AS n_emails,
             len(regexp_extract_all(t2, '\\+\\d{{1,2}}-\\d{{3}}-\\d{{3,4}}(-\\d{{4}})?')) AS n_phones,
             len(regexp_extract_all(t2, '\\b\\d{{1,3}}\\.\\d{{1,3}}\\.\\d{{1,3}}\\.\\d{{1,3}}\\b')) AS n_ips,
             regexp_replace(
               regexp_replace(
                 regexp_replace(t2, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{{2,}}', '<EMAIL>', 'g'),
                 '\\+\\d{{1,2}}-\\d{{3}}-\\d{{3,4}}(-\\d{{4}})?', '<PHONE>', 'g'),
               '\\b\\d{{1,3}}\\.\\d{{1,3}}\\.\\d{{1,3}}\\.\\d{{1,3}}\\b', '<IP>', 'g') AS red
      FROM p)
SELECT doc_id, n_emails, n_phones, n_ips, md5(red) AS red_hash
FROM r
""",
    tags=("corpus", "pii"),
    doc="PII detection + redaction (emails, phones, IPv4) as a map-only "
    "regex scan — patterns restricted to the Java-regex/RE2 common "
    "subset so both engines match identically; the md5 of the redacted "
    "text proves byte-exact scrub parity. Each doc gets a deterministic "
    "planted email/IP/phone so the operator's work is real. "
    "operators/corpus.pii_stats.",
)
def q75_pii_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents").withColumn(
        "t2",
        F.concat(
            F.col("text"),
            F.lit(" contact user"),
            F.col("doc_id").cast("string"),
            F.lit("@example.com via 10."),
            (F.col("doc_id") % 250).cast("string"),
            F.lit(".0."),
            (F.col("doc_id") % 200).cast("string"),
            F.lit(" call +1-555-"),
            F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
        ),
    )
    r = pii_stats(d, "t2")
    return r.select(
        "doc_id",
        F.col("n_emails").cast("bigint").alias("n_emails"),
        F.col("n_phones").cast("bigint").alias("n_phones"),
        F.col("n_ips").cast("bigint").alias("n_ips"),
        F.md5("redacted").alias("red_hash"),
    )


@query(
    "q76_repetition_filter",
    oracle="""
WITH t AS (SELECT doc_id, string_split_regex(text, '\\s+') AS toks FROM documents),
b AS (SELECT doc_id, len(toks) AS n_tokens, len(list_distinct(toks)) AS nd,
             list_transform(range(1, len(toks)),
                 i -> concat_ws(' ', toks[i], toks[i+1])) AS bg
      FROM t),
u AS (SELECT doc_id, unnest(bg) AS g FROM b),
m AS (SELECT doc_id, MAX(c) AS topc
      FROM (SELECT doc_id, g, COUNT(*) AS c FROM u GROUP BY 1, 2) GROUP BY 1)
SELECT b.doc_id, b.n_tokens,
       ROUND(1.0 - CAST(nd AS DOUBLE) / n_tokens, 8) AS dup_token_frac,
       ROUND(COALESCE(2.0 * topc / n_tokens, 0.0), 8) AS top_bigram_frac,
       (1.0 - CAST(nd AS DOUBLE) / n_tokens) > 0.6
           OR COALESCE(2.0 * topc / n_tokens, 0.0) > 0.2 AS repetitive
FROM b LEFT JOIN m ON b.doc_id = m.doc_id
""",
    tags=("corpus", "repetition", "quality"),
    doc="Gopher-style repetition filters: duplicate-token fraction and "
    "top-bigram coverage per doc; docs exceeding either threshold are "
    "flagged. Array expressions in one scan + explode/two-level "
    "map-side-combining hash agg for the bigram mode, keyed on 58-bit "
    "int bigram hashes (no bigram strings materialized; string-path "
    "parity pytest-asserted, and the DuckDB oracle is the string twin). "
    "operators/corpus.repetition_stats.",
)
def q76_repetition_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    r = repetition_stats(_t(spark, sf_dir, "documents"))
    return r.withColumn(
        "repetitive",
        (F.col("dup_token_frac") > 0.6) | (F.col("top_bigram_frac") > 0.2),
    )


@query(
    "q77_stratified_sample",
    oracle=f"""
WITH r AS (SELECT source, doc_id,
                  ROW_NUMBER() OVER (PARTITION BY source
                      ORDER BY {oracle_hash_bucket('doc_id', 'strat')}, doc_id)
                      AS sample_rank
           FROM documents)
SELECT source, doc_id, CAST(sample_rank AS INTEGER) AS sample_rank
FROM r WHERE sample_rank <= 5
""",
    tags=("corpus", "sampling"),
    doc="Exactly-k-per-stratum deterministic sample (k=5 per source): "
    "rank by hash inside each stratum, keep the first k — a "
    "reproducible, encounter-order-independent alternative to "
    "reservoir sampling. One shuffle on the stratum key. "
    "operators/corpus.stratified_sample.",
)
def q77_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = stratified_sample(
        _t(spark, sf_dir, "documents"), "source", "doc_id", k=5, salt="strat"
    )
    return d.select("source", "doc_id", "sample_rank")


def _q90_oracle() -> str:
    from xlearning_spark.operators.corpus import oracle_temperature_thr

    thr = oracle_temperature_thr("source", "documents", 0.5)
    h = f"('0x' || {oracle_hash_bucket('doc_id', 'temp')})::UBIGINT"
    return f"""
WITH thr AS {thr},
kept AS (
  SELECT d.source, thr.__thr, COUNT(*) AS n_kept
  FROM documents d JOIN thr ON d.source = thr.__src
  WHERE {h} < thr.__thr
  GROUP BY 1, 2
),
tot AS (SELECT source, COUNT(*) AS n_total FROM documents GROUP BY 1)
SELECT t.source, t.n_total, k.__thr AS thr, k.n_kept
FROM tot t JOIN kept k USING (source)
ORDER BY t.source
"""


@query(
    "q90_mixture_temperature",
    oracle=_q90_oracle(),
    tags=("corpus", "mixture", "temperature"),
    doc="Temperature-smoothed domain resampling (alpha = 0.5), the "
    "mBERT/XLM-R alpha-sampling recipe computed from the corpus's own "
    "counts: target share ∝ sqrt(domain share), per-source keep rate "
    "min(1, budget*N*q_d/n_d), rows kept by the deterministic md5 "
    "hash against floor(rate * 2^32) — an INTEGER threshold, so both "
    "engines keep the identical row set even though the rate math "
    "crosses a float sum (operators/corpus.temperature_source_sample; "
    "alpha fixed at 0.5 because IEEE sqrt is correctly rounded, "
    "unlike pow). Output is per-source totals, thresholds and kept "
    "counts — all integers, fully hash-certified. Shape: tiny count "
    "agg + broadcast rates + map-side filter; the corpus never "
    "shuffles.",
)
def q90_mixture_temperature(spark: SparkSession, sf_dir: str) -> DataFrame:
    from xlearning_spark.operators.corpus import temperature_source_sample

    docs = _t(spark, sf_dir, "documents")
    kept = temperature_source_sample(
        docs, "doc_id", "source", 0.5, salt="temp", threshold_col="thr"
    )
    kept_counts = kept.groupBy("source", "thr").agg(
        F.count(F.lit(1)).alias("n_kept")
    )
    totals = docs.groupBy("source").agg(F.count(F.lit(1)).alias("n_total"))
    return (
        totals.join(kept_counts, "source")
        .select("source", "n_total", "thr", "n_kept")
        .orderBy("source")
    )


_GOPHER_ORACLE = f"""
WITH t AS (SELECT doc_id, source, {_TOKS} AS w FROM documents),
m AS (SELECT doc_id, source,
  len(w) AS n,
  CAST(list_sum(list_transform(w, x -> length(x))) AS DOUBLE) / len(w) AS mwl,
  CAST(len(list_filter(w, x -> x IN ('the','a','and','of','to','in')))
       AS DOUBLE) / len(w) AS swf,
  CAST(list_max(list_transform(list_distinct(w),
                               d -> len(list_filter(w, x -> x = d))))
       AS DOUBLE) / len(w) AS twf,
  CAST(len(list_distinct(w)) AS DOUBLE) / len(w) AS dfr
 FROM t)
SELECT source, COUNT(*)::BIGINT AS n_docs,
 SUM(CASE WHEN NOT (n >= 20 AND n <= 80) THEN 1 ELSE 0 END)::BIGINT
     AS fail_len,
 SUM(CASE WHEN NOT (mwl >= 4.0 AND mwl <= 5.0) THEN 1 ELSE 0 END)::BIGINT
     AS fail_mean_len,
 SUM(CASE WHEN NOT (swf >= 0.03) THEN 1 ELSE 0 END)::BIGINT AS fail_stopword,
 SUM(CASE WHEN NOT (twf <= 0.15) THEN 1 ELSE 0 END)::BIGINT AS fail_top_word,
 SUM(CASE WHEN NOT (dfr >= 0.35) THEN 1 ELSE 0 END)::BIGINT AS fail_distinct,
 SUM(CASE WHEN n >= 20 AND n <= 80 AND mwl >= 4.0 AND mwl <= 5.0
           AND swf >= 0.03 AND twf <= 0.15 AND dfr >= 0.35
      THEN 1 ELSE 0 END)::BIGINT AS n_keep
FROM m GROUP BY source
"""


@query(
    "q94_gopher_rules",
    oracle=_GOPHER_ORACLE,
    tags=("corpus", "quality", "gopher"),
    doc="Gopher-style rule-by-rule curation audit (arXiv:2112.11446 "
    "§A1.1): per-source counts of documents failing each individual "
    "rule (length bounds, mean word length, stopword presence, "
    "top-word concentration, distinct-token ratio) plus the all-rules "
    "keep count — the per-rule removal-rate report corpus curation "
    "publishes, vs q45's single blended score. Every metric is an "
    "exact integer divided once into a double (bit-identical in both "
    "engines), and the graded output is pure integer counts. Shape: "
    "map-only expressions + one (id, token) hash-agg for the top-word "
    "rule (operators/text.gopher_flags); the thresholds are chosen so "
    "every rule fires on the fixture at every SF.",
)
def q94_gopher_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    from xlearning_spark.operators.text import gopher_flags

    d = _t(spark, sf_dir, "documents")
    f = gopher_flags(d)
    return (
        f.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum((~F.col("pass_len")).cast("long")).alias("fail_len"),
            F.sum((~F.col("pass_mean_len")).cast("long")).alias("fail_mean_len"),
            F.sum((~F.col("pass_stopword")).cast("long")).alias("fail_stopword"),
            F.sum((~F.col("pass_top_word")).cast("long")).alias("fail_top_word"),
            F.sum((~F.col("pass_distinct")).cast("long")).alias("fail_distinct"),
            F.sum(F.col("keep").cast("long")).alias("n_keep"),
        )
        .orderBy("source")
    )


#: Per-source token budget for q95 — FIXED across SFs (that is the
#: point: a mixture recipe is stated in tokens, so the kept volume is
#: invariant to how much raw corpus sits behind it).
_TOKEN_BUDGET = 600


def _q95_oracle() -> str:
    from xlearning_spark.operators.corpus import oracle_token_budget_where

    pos = oracle_token_budget_where("source", "doc_id", "nt")
    return f"""
WITH t AS (SELECT doc_id, source, len({_TOKS}) AS nt FROM documents),
k AS (SELECT * FROM (SELECT doc_id, source, nt, {pos} AS pos FROM t)
      WHERE pos < {_TOKEN_BUDGET})
SELECT source, COUNT(*)::BIGINT AS n_kept, SUM(nt)::BIGINT AS tokens_kept
FROM k GROUP BY source
"""


@query(
    "q95_token_budget_mixture",
    oracle=_q95_oracle(),
    tags=("corpus", "mixture", "budget"),
    doc="Token-budget mixture cap: fill each source to a fixed TOKEN "
    "budget (the 'N billion tokens per source' pretraining recipe), "
    "documents taken in deterministic hash order until the exclusive "
    "running token sum crosses the line "
    "(operators/corpus.token_budget_cap). Complements q77's count cap "
    "and q90's rate sampling: output volume is measured in tokens, "
    "invariant to document-length shifts between corpus versions. One "
    "window shuffle on the source key; sources independent, skew "
    "bounded by the largest source.",
)
def q95_token_budget_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    from xlearning_spark.operators.corpus import token_budget_cap

    d = _t(spark, sf_dir, "documents").withColumn("nt", token_count("text"))
    kept = token_budget_cap(d, "source", "doc_id", "nt", _TOKEN_BUDGET)
    return (
        kept.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_kept"),
            F.sum("nt").alias("tokens_kept"),
        )
        .orderBy("source")
    )
