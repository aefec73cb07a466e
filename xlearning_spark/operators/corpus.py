"""Training-corpus pipeline operators (north-star LLM-data mandate).

The reference (Qihoo360/XLearning) prepares training data by splitting
*files* across workers (AM/ApplicationMaster.java:971-1041) and leaves
record-level corpus construction to user code. A Spark-native engine can
do the record-level work itself; this module provides the operators a
100 TB training-data pipeline needs on top of the dedup/similarity tier
(operators/dedup.py, operators/similarity.py):

- deterministic train/val/test **splits** and **samples** keyed on a
  content-independent hash, so the assignment is reproducible across
  runs, engines, and cluster sizes (no ``rand()``: Spark's is
  per-partition-seeded, hence partition-layout-dependent);
- **domain mixture** (per-source sampling rates, the "data recipe");
- **token-budget chunking** (GPT-style concat-then-split packing);
- n-gram **decontamination** against an eval/benchmark set;
- **PII redaction** (emails / IPv4 / phone patterns);
- **repetition statistics** (Gopher-style duplicate-token and
  top-bigram fractions).

Every operator is pure JVM column expressions / joins (no Python UDFs)
and is DuckDB-reproducible, so each gets a hash-checked oracle query in
queries/corpus.py.

Scale notes (100 TB): hash-split/sample/mixture/PII/repetition are
map-only or one-shuffle shapes; chunking is a per-shard window (shuffle
by shard key, each shard sorted independently — shards are the unit of
parallelism exactly like the reference's per-worker file splits);
decontamination joins on shingles with the *bounded* eval side
broadcast. Decontamination and repetition stats run on 58-bit integer
shingle hashes by default (functions.with_shingle_hashes + the
SHINGLE_MOD_58 collision bound) — no per-shingle string is built or
shuffled at any scale; the string-shingle path is kept behind
``hashed=False`` as the oracle-shaped twin, and a pytest asserts the
two paths agree row-for-row on the fixture corpus.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from xlearning_spark.functions import (
    SHINGLE_MOD_58,
    shingle_hash_rows,
    shingles,
    token_count,
)

#: Width of the hex hash prefix used for bucketing: 8 hex chars = 32
#: bits, so split boundaries resolve to ~2.3e-10 of the id space.
_HEX_W = 8


def hash_bucket(id_col: str | Column, salt: str) -> Column:
    """Deterministic uniform bucket key: first 8 hex chars of
    ``md5(salt || ':' || id)``.

    Lowercase-hex md5 is identical in Spark and DuckDB, and equal-width
    hex strings order like the 32-bit integers they encode, so range
    predicates over this column are portable *without* any hex->int
    conversion (DuckDB has no ``conv``).
    """
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    return F.substring(F.md5(F.concat(F.lit(f"{salt}:"), c.cast("string"))), 1, _HEX_W)


def hex_threshold(fraction: float) -> str:
    """8-hex-char upper bound such that P(hash_bucket < bound) = fraction."""
    if fraction >= 1.0:
        return "g" * _HEX_W  # > every hex string of this width
    if fraction <= 0.0:
        return "0" * _HEX_W
    return format(int(fraction * (1 << 32)), f"0{_HEX_W}x")


def oracle_hash_bucket(id_expr: str, salt: str) -> str:
    """DuckDB twin of :func:`hash_bucket` (same string, same hash)."""
    return f"substr(md5(concat('{salt}:', CAST({id_expr} AS VARCHAR))), 1, {_HEX_W})"


def deterministic_split(
    df: DataFrame,
    id_col: str,
    splits: dict[str, float],
    salt: str = "split",
    out_col: str = "split",
) -> DataFrame:
    """Assign every row to a named split (train/val/test/...) by hash.

    ``splits`` maps name -> weight (normalized internally; insertion
    order defines the cumulative boundaries). The assignment depends
    only on (salt, id) — NOT on partitioning, row order, or cluster
    size — so the same row lands in the same split on a laptop and on a
    1000-executor cluster, and adding rows never reassigns existing
    ones (the property rand()-based splits lack). Map-only: no shuffle.
    """
    total = sum(splits.values())
    b = hash_bucket(id_col, salt)
    expr: Column | None = None
    cum = 0.0
    names = list(splits)
    for name in names[:-1]:
        cum += splits[name] / total
        cond = b < F.lit(hex_threshold(cum))
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    last = F.lit(names[-1])
    return df.withColumn(out_col, last if expr is None else expr.otherwise(last))


def oracle_split_case(id_expr: str, splits: dict[str, float], salt: str = "split") -> str:
    """DuckDB CASE expression twin of :func:`deterministic_split`."""
    total = sum(splits.values())
    b = oracle_hash_bucket(id_expr, salt)
    arms, cum = [], 0.0
    names = list(splits)
    for name in names[:-1]:
        cum += splits[name] / total
        arms.append(f"WHEN {b} < '{hex_threshold(cum)}' THEN '{name}'")
    return "CASE " + " ".join(arms) + f" ELSE '{names[-1]}' END"


def hash_sample(
    df: DataFrame, id_col: str, fraction: float, salt: str = "sample"
) -> DataFrame:
    """Deterministic Bernoulli(fraction) sample keyed on (salt, id).

    Unlike ``df.sample``, the kept set is a pure function of the ids:
    stable across runs, partitionings, and engines (the oracle replays
    it exactly). Map-only; composes with any downstream plan.
    """
    return df.filter(hash_bucket(id_col, salt) < F.lit(hex_threshold(fraction)))


def weighted_source_sample(
    df: DataFrame,
    id_col: str,
    source_col: str,
    weights: dict[str, float],
    salt: str = "mix",
    default: float = 0.0,
) -> DataFrame:
    """Domain-mixture sampling: keep each row with its source's rate.

    The "data recipe" operator: down/up-weight corpus domains by
    sampling each source at its own deterministic rate. The weights
    table is tiny and **broadcast** (P3's moral equivalent), so the
    corpus is filtered in a single map-side pass — no shuffle at any
    scale. Sources absent from ``weights`` keep ``default`` fraction.
    """
    spark = df.sparkSession
    wdf = spark.createDataFrame(
        [(s, hex_threshold(w)) for s, w in weights.items()],
        f"{source_col} string, __thr string",
    )
    return (
        df.join(F.broadcast(wdf), source_col, "left")
        .withColumn("__thr", F.coalesce("__thr", F.lit(hex_threshold(default))))
        .filter(hash_bucket(id_col, salt) < F.col("__thr"))
        .drop("__thr")
    )


#: Denominator of the 32-bit integer sampling threshold (2^32).
_THR_DEN = 1 << 32


def temperature_source_sample(
    df: DataFrame,
    id_col: str,
    source_col: str,
    budget_frac: float,
    salt: str = "temp",
    threshold_col: str | None = None,
) -> DataFrame:
    """Temperature-smoothed domain resampling: the multilingual/
    multi-domain "alpha sampling" recipe (exponential smoothing of
    domain shares, as in mBERT/XLM-R's alpha-smoothed language
    sampling — public papers) with alpha = 0.5, computed entirely
    inside the engine from the corpus's own counts.

    Smoothing flattens the mixture: target share q_d ∝ share_d^0.5,
    so dominant domains are down-sampled and small domains keep
    (nearly) everything — the standard fix for head-domain dominance
    in web corpora. Per-domain keep rate:

        r_d = min(1, budget_frac * N * q_d / n_d),
        q_d = sqrt(n_d) / Σ_d sqrt(n_d)

    Rows are kept by the same deterministic md5 hash as
    :func:`hash_sample`, compared against ``floor(r_d * 2^32)`` — an
    INTEGER threshold, so a last-ulp difference in another engine's
    float sum cannot flip a row's verdict unless it crosses a whole
    integer (~1e-6 probability), which is what makes the operator
    hash-certifiable (q90). alpha is fixed at 0.5 because sqrt is
    correctly rounded in IEEE-754 (bit-identical across engines);
    arbitrary-alpha pow() carries no such guarantee.

    Shape at 100 TB: one tiny per-source count agg, rates broadcast
    back, one map-side filter — the corpus never shuffles. Note
    r_d caps at 1: true up-sampling (repeating small-domain docs)
    is epoch replication (operators/sharding.epoch_replay), not
    Bernoulli sampling. Rows with a NULL ``source_col`` are dropped
    (the rates equi-join never matches null) — bucket them into a
    sentinel domain first if they should participate.
    """
    counts = df.groupBy(source_col).agg(F.count(F.lit(1)).alias("__cnt"))
    stats = counts.agg(
        F.sum("__cnt").alias("__tot"), F.sum(F.sqrt("__cnt")).alias("__ssum")
    )
    rates = counts.crossJoin(F.broadcast(stats)).select(
        source_col,
        F.floor(
            F.least(
                F.lit(1.0),
                F.lit(budget_frac)
                * F.col("__tot")
                * (F.sqrt("__cnt") / F.col("__ssum"))
                / F.col("__cnt"),
            )
            * F.lit(float(_THR_DEN))
        ).alias("__thr"),
    )
    h = F.conv(hash_bucket(id_col, salt), 16, 10).cast("long")
    out = (
        df.join(F.broadcast(rates), source_col)
        .filter(h < F.col("__thr"))
    )
    if threshold_col is not None:
        return out.withColumnRenamed("__thr", threshold_col)
    return out.drop("__thr")


def oracle_temperature_thr(source_expr: str, from_clause: str, budget_frac: float) -> str:
    """DuckDB replay of :func:`temperature_source_sample`'s per-source
    integer threshold — identical expression nesting so every rounding
    step matches. Yields (source, __thr) as a subquery."""
    return f"""(
WITH __c AS (SELECT {source_expr} AS __src, COUNT(*) AS __cnt
             FROM {from_clause} GROUP BY 1),
__t AS (SELECT SUM(__cnt) AS __tot, SUM(sqrt(__cnt)) AS __ssum FROM __c)
SELECT __src, CAST(FLOOR(LEAST(CAST(1.0 AS DOUBLE),
         CAST({budget_frac!r} AS DOUBLE) * __tot * (sqrt(__cnt) / __ssum)
         / __cnt)
         * CAST({float(_THR_DEN)!r} AS DOUBLE))
       AS BIGINT) AS __thr
FROM __c CROSS JOIN __t
)"""


def stratified_sample(
    df: DataFrame,
    stratum_col: str,
    id_col: str,
    k: int,
    salt: str = "strat",
    out_col: str = "sample_rank",
) -> DataFrame:
    """Exactly-k-per-stratum deterministic sample.

    Rows are ranked inside each stratum by hash (id tiebreak) and the
    first k kept — a reproducible alternative to reservoir sampling
    whose output is independent of encounter order. One shuffle on the
    stratum key; strata are processed independently, so skew is bounded
    by the largest stratum (salt the stratum key if one dominates).
    """
    w = Window.partitionBy(stratum_col).orderBy(hash_bucket(id_col, salt), id_col)
    return (
        df.withColumn(out_col, F.row_number().over(w))
        .filter(F.col(out_col) <= k)
    )


def pack_token_chunks(
    df: DataFrame,
    shard_col: str,
    id_col: str,
    tokens_col: str,
    ctx_len: int,
    out_col: str = "chunk_id",
) -> DataFrame:
    """GPT-style token-budget chunking (concat-then-split packing).

    Documents are laid out in deterministic (shard, id) order and the
    token stream cut every ``ctx_len`` tokens; a document belongs to
    the chunk where its first token lands:
    ``chunk_id = floor(exclusive_running_token_sum / ctx_len)``.

    This is the standard LLM pretraining packing model (documents
    concatenated, windows sliced), expressed as one window over each
    shard — the shard key is the unit of parallelism, mirroring the
    reference's per-worker file assignment (AM:971-1041): each shard's
    chunk ids are independent of every other shard, so the operator
    scales by adding shards, never by sorting the whole corpus.
    """
    w = (
        Window.partitionBy(shard_col)
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum = F.coalesce(F.sum(tokens_col).over(w), F.lit(0))
    return df.withColumn(out_col, F.floor(cum / ctx_len))


def decontaminate(
    docs: DataFrame,
    eval_docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.2,
    hashed: bool = True,
    prefilter: bool = False,
) -> DataFrame:
    """Flag training docs whose n-gram overlap with any eval doc is high.

    Benchmark decontamination: for every training doc, the fraction of
    its distinct word n-grams that appear in some single eval doc;
    rows with ``max_overlap >= threshold`` are returned with the
    offending eval doc (lowest id on ties).

    Shape: stream distinct shingle hashes on both sides and equi-join
    on the hash — the eval side is bounded (benchmarks are small) and
    **broadcast**, so the corpus is scanned once and nothing shuffles
    at corpus scale except the slim (id, hash) stream. That stream's
    per-doc window is the dominant shuffle; ``prefilter=True`` is the
    sparse-contamination scale knob that removes it: a first map-side
    pass broadcast-SEMI-joins the shingle stream against the distinct
    eval hash set to find candidate doc ids (docs sharing >= 1 shingle
    — the exact-membership analogue of a Bloom pre-filter, zero false
    positives since the eval side fits memory), and only candidates'
    rows are re-streamed into the window + overlap join. A flagged doc
    must share at least one shingle, so the result is IDENTICAL for
    every threshold (pytest-asserted). Trade-off: the corpus is
    scanned twice — a win exactly when contamination is sparse (the
    production case: ~1% candidates turns the full-corpus window
    shuffle into a 100x smaller one), pure overhead when dense (the
    synthetic fixture: 100% of docs share a bigram with some eval doc,
    so the default keeps the single-pass plan). By default
    (``hashed=True``) the join key is the 58-bit polynomial shingle
    hash built by functions.shingle_hash_rows — a pure codegen
    posexplode + lead() pipeline, no shingle string and no lambda
    interpretation anywhere — wide enough that hash equality is
    shingle equality in practice (birthday bound ~1.6e-7 colliding
    pairs at 300k distinct shingles), so results are identical to the
    string path and the brute-force string oracle still certifies
    them. ``hashed=False`` keeps the string-shingle join (the
    oracle-shaped twin, used by the parity test).
    """
    def sh(df: DataFrame, out: str) -> DataFrame:
        # Distinct (id, shingle-key) rows.
        if hashed:
            rows = shingle_hash_rows(
                df.select(F.col(id_col).alias(out), text_col), out, text_col, n
            )
            return (
                rows.filter(F.col("__h").isNotNull())
                .select(F.col(out), F.col("__h").alias("__g"))
                .distinct()
            )
        return (
            df.select(
                F.col(id_col).alias(out),
                F.explode_outer(shingles(text_col, n)).alias("__g"),
            )
            .filter(F.col("__g").isNotNull())
            .distinct()
        )

    t = sh(docs, "train_id")
    e = sh(eval_docs, "eval_id")
    if prefilter:
        cand = (
            t.join(F.broadcast(e.select("__g").distinct()), "__g", "semi")
            .select("train_id")
            .distinct()
        )
        t = t.join(cand, "train_id", "semi")
    t = t.withColumn(
        "__n_train", F.count("*").over(Window.partitionBy("train_id"))
    )
    overlap = (
        t.join(F.broadcast(e), "__g")
        .groupBy("train_id", "eval_id", "__n_train")
        .agg(F.count("*").alias("__ov"))
        .withColumn("overlap_frac", F.col("__ov") / F.col("__n_train"))
        .filter(F.col("overlap_frac") >= threshold)
    )
    w = Window.partitionBy("train_id").orderBy(
        F.col("overlap_frac").desc(), F.col("eval_id")
    )
    return (
        overlap.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select(
            "train_id",
            "eval_id",
            F.round("overlap_frac", 8).alias("overlap_frac"),
        )
    )


#: PII patterns — deliberately restricted to syntax with identical
#: semantics in Java regex (Spark) and RE2 (DuckDB): character classes,
#: bounded repetition, \b word boundaries. No lookaround (RE2 lacks it).
PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_IPV4 = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
PII_PHONE = r"\+\d{1,2}-\d{3}-\d{3,4}(-\d{4})?"


def pii_stats(df: DataFrame, text_col: str) -> DataFrame:
    """Adds n_emails / n_ips / n_phones counts and a redacted text column.

    Redaction order matters and is fixed: emails first (an address may
    embed digit runs), then phones (longest dash patterns), then bare
    IPv4. Map-only scan; at 100 TB this is the cheapest possible shape
    (regex over one pass, whole-stage codegen).
    """
    from xlearning_spark.operators.sharding import spread_small_scan

    c = F.col(text_col)
    red = F.regexp_replace(c, PII_EMAIL, "<EMAIL>")
    red = F.regexp_replace(red, PII_PHONE, "<PHONE>")
    red = F.regexp_replace(red, PII_IPV4, "<IP>")
    return (
        # r13 (guide §2.5): six regex passes per row with no shuffle
        # anywhere — on a single-file scan the whole query ran on one
        # core (pure-map queries have no post-shuffle stage to recover
        # parallelism in). No-op on an already-wide scan.
        spread_small_scan(df)
        .withColumn("n_emails", F.regexp_count(c, F.lit(PII_EMAIL)))
        .withColumn("n_phones", F.regexp_count(c, F.lit(PII_PHONE)))
        .withColumn("n_ips", F.regexp_count(c, F.lit(PII_IPV4)))
        .withColumn("redacted", red)
    )


def repetition_stats(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", hashed: bool = True
) -> DataFrame:
    """Gopher-style repetition metrics per document.

    - ``dup_token_frac``: 1 - distinct/total tokens (how much of the
      doc is repeated vocabulary);
    - ``top_bigram_frac``: tokens covered by the most frequent word
      bigram (2 * its count / total tokens).

    By default everything runs off ONE posexplode'd token stream
    (functions.shingle_hash_rows): token counts and distinct-token
    counts aggregate the per-token hashes, bigram modes aggregate the
    lead()-combined 58-bit bigram hashes — pure whole-stage codegen,
    no shingle strings, no higher-order functions (whose interpreted
    lambdas get re-inlined by pushed-down predicates — the array form
    measured SLOWER than string shingles at fixture scale). Both aggs
    combine map-side; the (doc, bigram) key is high-cardinality but
    each group is tiny, the Spark-friendly skew shape.

    ``hashed=False`` keeps the original string-shingle/array form (the
    DuckDB-oracle-shaped twin, used by the parity test). Hash-equality
    == token/bigram-equality at the SHINGLE_MOD_58 birthday bound, so
    the two paths return identical rows.
    """
    if not hashed:
        toks = token_count(text_col)
        base = df.select(
            F.col(id_col),
            toks.alias("n_tokens"),
            F.size(F.array_distinct(F.split(F.col(text_col), r"\s+"))).alias("__nd"),
            shingles(text_col, 2).alias("__bg"),
        )
        top = (
            base.select(id_col, F.explode("__bg").alias("__g"))
            .groupBy(id_col, "__g")
            .agg(F.count("*").alias("__c"))
            .groupBy(id_col)
            .agg(F.max("__c").alias("__top"))
        )
        return (
            base.join(top, id_col, "left")
            .select(
                id_col,
                "n_tokens",
                F.round(1.0 - F.col("__nd") / F.col("n_tokens"), 8).alias(
                    "dup_token_frac"
                ),
                F.round(
                    F.coalesce(2.0 * F.col("__top") / F.col("n_tokens"), F.lit(0.0)),
                    8,
                ).alias("top_bigram_frac"),
            )
        )

    rows = shingle_hash_rows(df, id_col, text_col, 2)
    stats = rows.groupBy(id_col).agg(
        F.count("*").alias("n_tokens"),
        F.countDistinct("__th").alias("__nd"),
    )
    top = (
        rows.filter(F.col("__h").isNotNull())
        .groupBy(id_col, "__h")
        .agg(F.count("*").alias("__c"))
        .groupBy(id_col)
        .agg(F.max("__c").alias("__top"))
    )
    # NULL-text docs produce zero token rows (shingle_hash_rows uses a
    # non-outer explode), so restore them from the id side: the string
    # twin emits (id, NULL, NULL, 0.0) for them and the paths must
    # agree. The ids scan is a slim single-column pass; both joins
    # co-partition on the doc key.
    return (
        df.select(id_col)
        .join(stats, id_col, "left")
        .join(top, id_col, "left")
        .select(
            id_col,
            "n_tokens",
            F.round(1.0 - F.col("__nd") / F.col("n_tokens"), 8).alias(
                "dup_token_frac"
            ),
            F.round(
                F.coalesce(2.0 * F.col("__top") / F.col("n_tokens"), F.lit(0.0)), 8
            ).alias("top_bigram_frac"),
        )
    )


def token_budget_cap(
    df: DataFrame,
    source_col: str,
    id_col: str,
    tokens_col: str,
    budget: int | dict[str, int],
    salt: str = "budget",
    cum_col: str = "budget_pos",
) -> DataFrame:
    """Fill each source's TOKEN budget, not its document count — the
    pretraining-mixture recipe ("sample N billion tokens per source"):
    documents are laid out per source in deterministic hash order
    (id tiebreak, same portable key as the samplers) and kept while
    the EXCLUSIVE running token sum is still under the budget, so the
    document that crosses the budget line is the last one kept and
    every source lands within one document of its target.

    ``budget`` is one int for all sources or a per-source dict
    (missing sources get budget 0 = dropped). Adds ``cum_col`` (the
    exclusive running sum, i.e. this doc's start offset in its
    source's token stream).

    Unlike :func:`stratified_sample` (count cap) the output volume is
    measured in tokens — invariant to document-length distribution
    shifts between corpus versions, which is the property mixture
    recipes need. One window shuffle on the source key; sources are
    independent, so the operator scales by source count and the skew
    bound is the largest single source.
    """
    w = (
        Window.partitionBy(source_col)
        .orderBy(hash_bucket(id_col, salt), F.col(id_col))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum = F.coalesce(F.sum(tokens_col).over(w), F.lit(0).cast("long"))
    if isinstance(budget, dict):
        pairs = [x for kv in budget.items() for x in kv]
        bud = F.coalesce(
            F.create_map(*[F.lit(x) for x in pairs])[F.col(source_col)],
            F.lit(0),
        ).cast("long")
    else:
        bud = F.lit(int(budget)).cast("long")
    return df.withColumn(cum_col, cum).filter(F.col(cum_col) < bud)


def oracle_token_budget_where(
    source_expr: str, id_expr: str, tokens_expr: str, salt: str = "budget"
) -> str:
    """DuckDB twin of :func:`token_budget_cap`'s running sum — a window
    expression to compare against the budget in an outer WHERE."""
    return (
        f"COALESCE(SUM({tokens_expr}) OVER ("
        f"PARTITION BY {source_expr} "
        f"ORDER BY {oracle_hash_bucket(id_expr, salt)}, {id_expr} "
        f"ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)"
    )
