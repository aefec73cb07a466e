"""Deduplication operators (SURVEY.md §2.12 L1/L2).

Exact dedup is a hash groupBy (one shuffle). Near-dup is staged
MinHash + banded LSH — the standard 100 TB-safe shape:

  shingle -> 64 minhashes (map-side, no shuffle)
        -> B band keys per doc (map-side)
        -> explode + groupBy(band_key)  [shuffle 1, data = docs×B keys]
        -> candidate pairs within buckets (bounded by bucket size cap)
        -> exact-similarity verify on the candidates only [shuffle 2]

All hash seeds are fixed so results are deterministic run-to-run.
Reference parity note: the reference has no dedup; this is part of the
mandated LLM-pipeline extension surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from xlearning_spark.functions import tokens, with_shingle_hashes

# Mersenne prime for the universal-hash family h_i(x) = (a_i*x + b_i) mod p.
# p = 2^31 - 1 keeps a*x + b < 2^62: no bigint overflow under ANSI mode
# (Spark 4 default), and the multiply-mod stays a plain JVM expression.
_P = (1 << 31) - 1


def release_checkpoint(ck: DataFrame, reliable: bool = False) -> None:
    """Free a checkpointed frame's storage EAGERLY — blocks for
    ``localCheckpoint``, the checkpoint directory for a reliable
    ``checkpoint`` (``reliable=True``) — instead of waiting for the
    async ContextCleaner to catch up with driver GC (VERDICT r9 item
    4: the cleaner lag showed up as multi-second full-GC debt in the
    16x scale envelopes of every iterative operator). Callers use this
    the moment a superseding round is materialized: the new round is
    checkpoint-truncated, so it never re-reads the old storage.

    Release is an optimization only — any failure must never poison a
    correct run, so it degrades to the old leave-it-to-GC path.

    Note (ADVICE r10): the ``reliable=True`` path deletes the
    checkpoint directory outside Spark's ContextCleaner, which will
    later attempt its own delete of the same path — a harmless no-op
    under Hadoop's idempotent ``FileSystem.delete``, though some
    filesystems may log a spurious warning; the broad except guard
    above covers either order.
    """
    try:
        plan = ck._jdf.queryExecution().analyzed()
        rdd = plan.rdd()  # LogicalRDD's materialized RDD
        if not reliable:
            rdd.unpersist(False)
        else:
            f = rdd.getCheckpointFile()
            if f.isDefined():
                spark = ck.sparkSession
                jvm = spark.sparkContext._jvm
                p = jvm.org.apache.hadoop.fs.Path(f.get())
                fs = p.getFileSystem(
                    spark.sparkContext._jsc.hadoopConfiguration()
                )
                fs.delete(p, True)
    except Exception:
        return  # degraded: ContextCleaner frees it eventually


def exact_dedup(df: DataFrame, cols: list[str], id_col: str) -> DataFrame:
    """Keep the lowest-id row per duplicate group of ``cols``.

    One shuffle (hash aggregate); deterministic keeper choice, unlike
    ``dropDuplicates`` whose survivor is partition-order dependent.
    """
    return df.groupBy(*cols).agg(F.min(id_col).alias(id_col))


def _hash_params(num_hashes: int, seed: int = 42) -> list[tuple[int, int]]:
    """Deterministic (a, b) pairs via a tiny LCG (no RNG dependency)."""
    params = []
    state = seed
    for _ in range(num_hashes):
        state = (state * 6364136223846793005 + 1442695040888963407) % (1 << 63)
        a = state % (_P - 1) + 1
        state = (state * 6364136223846793005 + 1442695040888963407) % (1 << 63)
        b = state % _P
        params.append((a, b))
    return params


def minhash_signatures(
    df: DataFrame,
    id_col: str,
    text_col: str,
    num_hashes: int = 64,
    shingle_size: int = 5,
) -> DataFrame:
    """(id, minhash array<bigint>) — map-side only, zero shuffles.

    Shingle hashes are integer-combined per-token xxhash64 values
    (functions.shingle_hashes — no per-shingle string is built), then
    the universal-hash family is applied with ``aggregate`` over the
    hash array — all per-row expressions, so the signature compute
    parallelizes embarrassingly at any scale.
    """
    params = _hash_params(num_hashes)
    # Pre-filter on token count (cheap, pushdown-friendly) instead of
    # post-filtering on the hash array: a filter on the computed column
    # gets its defining expression inlined into the pushed-down
    # predicate and re-evaluated per row (measured 40x slower).
    eligible = df.filter(F.size(tokens(text_col)) >= shingle_size)
    sh = with_shingle_hashes(eligible, text_col, "__h", shingle_size, _P).select(
        F.col(id_col), F.col("__h")
    )
    mh = sh.select(
        F.col(id_col),
        F.array(
            *[
                F.expr(
                    f"array_min(transform(__h, x -> pmod({a}L * x + {b}L,"
                    f" {_P}L)))"
                )
                for (a, b) in params
            ]
        ).alias("minhash"),
    )
    return mh


def minhash_candidate_pairs(
    signatures: DataFrame,
    id_col: str,
    num_hashes: int = 64,
    bands: int = 16,
    max_bucket: int = 1000,
    cache_buckets: bool = False,
) -> DataFrame:
    """LSH banding: docs agreeing on any full band become a candidate pair.

    Scale controls: ``max_bucket`` caps degenerate buckets (e.g. the
    empty-document signature) so no bucket explodes into O(n²); the
    pair join is bucket-local.

    ``cache_buckets=True`` persists the capped bucket rows (slim:
    band, key, id): they feed BOTH self-join sides, and without a
    materialization point each side re-derives the whole subtree —
    including the ``num_hashes`` minhash aggregates per document
    (verified in plans/r14/q48_*: the 64-expression signature project
    appears twice in the before-plan, once after). Callers gate it on
    a small input (ADVICE r13 persist discipline); default off keeps
    the pure-lazy plan.
    """
    rows_per_band = num_hashes // bands
    banded = signatures.select(
        F.col(id_col),
        F.posexplode(
            F.array(
                *[
                    F.xxhash64(
                        F.lit(b),
                        F.concat_ws(
                            ",",
                            *[
                                F.element_at("minhash", b * rows_per_band + i + 1)
                                for i in range(rows_per_band)
                            ],
                        ),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("band", "band_key"),
    )
    # Cap bucket size; deterministic members kept (lowest ids).
    w = Window.partitionBy("band", "band_key").orderBy(id_col)
    bounded = banded.withColumn("__rn", F.row_number().over(w)).filter(
        F.col("__rn") <= max_bucket
    )
    if cache_buckets:
        bounded = bounded.persist(StorageLevel.MEMORY_AND_DISK)
    a = bounded.select(
        F.col("band"), F.col("band_key"), F.col(id_col).alias("id_a")
    )
    b = bounded.select(
        F.col("band"), F.col("band_key"), F.col(id_col).alias("id_b")
    )
    pairs = (
        a.join(b, ["band", "band_key"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    return pairs


def minhash_near_duplicates(
    df: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float = 0.7,
    num_hashes: int = 64,
    bands: int = 16,
    shingle_size: int = 5,
) -> DataFrame:
    """Full near-dup pipeline: candidates verified by exact Jaccard.

    Returns (id_a, id_b, jaccard) pairs with jaccard >= threshold.
    Verification joins shingle sets only for candidate pairs, so the
    expensive exact computation is proportional to candidate volume,
    not corpus size squared.
    """
    from xlearning_spark.operators.sharding import spread_small_scan_ex

    params = _hash_params(num_hashes)
    # r13 (guide §2.3/§2.5): one shared shingle-hash frame feeds BOTH
    # the signature branch and the exact-Jaccard verify sides —
    # previously each branch re-ran tokenize + shingle-hash from the
    # scan (and a single-file fixture scan ran it all on one core;
    # spread_small_scan is a no-op on an already-wide scan).
    # min over duplicates == min over distinct, so signatures off the
    # raw hash array are unchanged; verify distincts per row as before.
    # r14: the frame is NOT persisted (measured under the cold-cache
    # bench protocol, paired variants in one session): writing the
    # wide array<bigint> rows to storage inside the timed run costs
    # more than re-running the codegen tokenize+hash per branch —
    # persist+buckets 3.1 s vs buckets-only 2.1 s median. Only the
    # SLIM capped bucket rows are cached (cache_buckets below), which
    # dedupes the 64-aggregate signature subtree across the self-join
    # sides — that one pays for itself. At corpus scale a pinned copy
    # of the shingle-hash frame would risk executor disks anyway
    # (ADVICE r13), so lazy is also the scale-correct default.
    spread, small = spread_small_scan_ex(df)
    hashed = with_shingle_hashes(
        spread.filter(F.size(tokens(text_col)) >= shingle_size),
        text_col,
        "__sh0",
        shingle_size,
        _P,
    ).select(F.col(id_col), F.col("__sh0"))
    sigs = hashed.select(
        F.col(id_col),
        F.array(
            *[
                F.expr(
                    f"array_min(transform(__sh0, x -> pmod({a}L * x + {b}L,"
                    f" {_P}L)))"
                )
                for (a, b) in params
            ]
        ).alias("minhash"),
    )
    pairs = minhash_candidate_pairs(
        sigs, id_col, num_hashes, bands, cache_buckets=small
    )

    # Exact Jaccard over distinct shingle-hash sets (identical to the
    # string-shingle Jaccard modulo 2^-31 collision probability).
    sh = hashed.select(F.col(id_col), F.array_distinct("__sh0").alias("__sh"))
    pa = pairs.join(sh.select(F.col(id_col).alias("id_a"), F.col("__sh").alias("sh_a")), "id_a")
    pab = pa.join(sh.select(F.col(id_col).alias("id_b"), F.col("__sh").alias("sh_b")), "id_b")
    jac = pab.select(
        "id_a",
        "id_b",
        (
            F.size(F.array_intersect("sh_a", "sh_b"))
            / F.size(F.array_union("sh_a", "sh_b"))
        ).alias("jaccard"),
    )
    return jac.filter(F.col("jaccard") >= threshold)


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float = 0.5,
    shingle_size: int = 5,
    materialize: bool = True,
    delta_ids: DataFrame | None = None,
    demote_hot_df: float | None = None,
    max_hot: int = 256,
    persisted_out: list[DataFrame] | None = None,
) -> DataFrame:
    """Exact n-gram (word-shingle) Jaccard near-dup pairs via prefix
    filtering -> (id_a, id_b, jaccard), jaccard >= threshold.

    ``delta_ids`` (a one-column frame of ids) switches to INCREMENTAL
    mode — the production shape for a continuously-growing corpus:
    candidate pairs are restricted at the generator to those with at
    least one side in the delta, so already-deduped corpus docs are
    never re-paired against each other. The restriction is
    semantics-preserving for ingest sweeps (corpus-precedence dropping
    only asks whether a NEW doc's component touches the corpus, and
    corpus-corpus edges can merge corpus docs into a component but
    never change that predicate). Prefix keys still explode for both
    sides ONCE; only the delta's keys drive the equi join's build
    side, so the join output is ~|delta| * shared-key frequency
    instead of the full corpus pair volume.

    The AllPairs/PPJoin prefix lemma (Bayardo et al., WWW'07 — public
    set-similarity-join literature): under any global total order of
    set elements, two sets with J >= t must share at least one element
    among their first ``m - ceil(t*m) + 1`` elements. Shingles are
    hashed to int64 and sorted, each document explodes only that
    prefix (~(1-t)*m keys), and a key equi join yields the candidate
    pairs — no all-pairs product, no lossy approximation. The exact
    intersect/inclusion-exclusion verify then runs on candidates only
    (the same candidates->verify shape as the MinHash pipeline), with
    a sizes-compatible guard (t*max <= min) pruning before any array
    intersect. Candidate volume is driven by shared-rare-shingle
    frequency; a corpus dominated by one hot shingle degrades toward
    the within-key square under the default (hash) order.

    ``demote_hot_df`` is the LOSSLESS organic-skew mitigation — the
    canonical AllPairs frequency ordering (Bayardo et al. §3.1: order
    elements by ascending document frequency so prefixes hold the
    RAREST elements). The prefix lemma holds for ANY global total
    order, so the output is bit-identical; what changes is which
    shingles land in prefixes. One extra linear pass computes shingle
    document frequencies; shingles in more than ``demote_hot_df`` of
    docs (top ``max_hot`` by df — a bounded, broadcastable set) are
    demoted to the END of the order, so a boilerplate 8-gram shared by
    30 % of the corpus almost never enters anyone's prefix and its
    would-be quadratic key join vanishes. Measured (tools/skew_probe.py,
    SCALE.md organic-skew section): with a hot boilerplate in 10-50 %
    of docs the demoted order removes the hot-key term entirely while
    plain hash order degrades toward the block square. For fully
    adversarial distributions (hot shingles beyond ``max_hot``)
    compose with MinHash LSH (minhash_near_duplicates), which bounds
    bucket width by construction.

    Jaccard is computed over distinct shingle *hashes* (identical to
    string-shingle Jaccard modulo ~2^-64 collisions — the same hashing
    assumption the MinHash path stands on).

    ``materialize=True`` (default) repartitions the shingle frame to the
    session's shuffle parallelism and persists it MEMORY_AND_DISK: the
    frame feeds three plan branches (prefix keys twice, verify sides),
    and without a materialization point Catalyst collapses the token
    projection back into the shingle lambda per branch — re-tokenizing
    every document ``shingle_size`` times per shingle — and a
    single-file scan runs it all on one core (measured 13.7s -> 4.1s on
    the sf0.1 documents fixture, local[32]). The persisted frame is
    left for Spark's LRU cache manager to evict; pass
    ``materialize=False`` for a pure-lazy plan (e.g. composing into a
    larger pipeline that persists on its own terms). Exception:
    ``demote_hot_df`` IMPLIES materialization regardless — its document-
    frequency pass runs ``count()`` plus an explode/groupBy over the
    shingle frame before the main job, which without the persist would
    re-execute tokenization+shingling two extra times (exactly the
    recomputation this knob exists to avoid paying at scale).

    The reference has no similarity operators at all; this tier is the
    engine's LLM-data extension (SURVEY.md §2.12 L2).
    """
    if not (0.0 < threshold <= 1.0):
        raise ValueError("threshold must be in (0, 1]")
    from xlearning_spark.operators.sharding import spread_small_scan

    # Tokenize in a separate projection from the shingle lambda: the
    # lambda references the array shingle_size times per element and
    # inlining split() there re-tokenizes the doc O(5m) times.
    # Spread a few-file scan across the session's shuffle parallelism so
    # the per-doc shingle work isn't serialized onto the scan's input
    # splits (a single parquet file scans as one partition). r13: the
    # spread is now CONDITIONAL — an already-wide 100 TB scan passes
    # through untouched instead of paying a full-corpus shuffle that
    # coalesces ~1e5 splits into session-parallelism partitions
    # (see spread_small_scan).
    tokd = spread_small_scan(df).select(
        F.col(id_col).alias("__id"), tokens(text_col).alias("__toks")
    )
    toks = F.col("__toks")
    base = (
        tokd.filter(F.size(toks) >= shingle_size)
        .select(
            "__id",
            F.array_sort(
                F.array_distinct(
                    F.transform(
                        F.sequence(F.lit(1), F.size(toks) - (shingle_size - 1)),
                        lambda i: F.xxhash64(
                            F.concat_ws(
                                " ",
                                *[
                                    F.element_at(toks, i + j)
                                    for j in range(shingle_size)
                                ],
                            )
                        ),
                    )
                )
            ).alias("__sh"),
        )
        .withColumn("__m", F.size("__sh"))
    )
    # demote_hot_df implies materialization: its df pass (count +
    # explode/groupBy) and the main prefix/verify branches must reuse
    # one computed shingle frame, not re-tokenize per branch.
    if materialize or demote_hot_df is not None:
        base = base.persist(StorageLevel.MEMORY_AND_DISK)
        # Deterministic release hook (VERDICT r13 item 3): a caller
        # that consumes the result EAGERLY (streaming ingests run one
        # sweep per micro-batch) passes a list and unpersists the
        # collected frames once its action commits — a long-running
        # stream otherwise accumulates one dead cached frame per batch
        # and leans on LRU eviction under memory pressure (guide §5).
        if persisted_out is not None:
            persisted_out.append(base)
    prefix_len = (
        F.col("__m") - F.ceil(F.col("__m") * F.lit(threshold)) + 1
    ).cast("int")
    order_col = "__sh"
    if demote_hot_df is not None:
        if not (0.0 < demote_hot_df <= 1.0):
            raise ValueError("demote_hot_df must be in (0, 1]")
        n_docs = base.count()
        # Shingle document frequency (arrays are distinct per doc, so
        # count == df). Bounded collect: top max_hot hot shingles only.
        hot = [
            r["__k"]
            for r in (
                base.select(F.explode("__sh").alias("__k"))
                .groupBy("__k")
                .agg(F.count(F.lit(1)).alias("__df"))
                .filter(F.col("__df") >= F.lit(demote_hot_df * n_docs))
                .orderBy(F.desc("__df"), "__k")
                .limit(max_hot)
                .collect()
            )
        ]
        if hot:
            hot_arr = F.array(*[F.lit(int(h)) for h in sorted(hot)])
            # Re-rank: (is_hot, hash) struct order puts every hot
            # shingle AFTER every rare one; verify still runs on __sh.
            base = base.withColumn(
                "__ord",
                F.array_sort(
                    F.transform(
                        "__sh",
                        lambda h: F.struct(
                            F.array_contains(hot_arr, h)
                            .cast("int")
                            .alias("hot"),
                            h.alias("h"),
                        ),
                    )
                ),
            )
            order_col = "__ord"
    keys = base.select(
        "__id", F.explode(F.slice(order_col, F.lit(1), prefix_len)).alias("__e")
    )
    keys = keys.select(
        "__id",
        (F.col("__e.h") if order_col == "__ord" else F.col("__e")).alias("__k"),
    )
    if delta_ids is not None:
        dids = delta_ids.select(
            F.col(delta_ids.columns[0]).alias("__id")
        ).distinct()
        dkeys = keys.join(dids, "__id", "semi")
        pairs = (
            dkeys.select("__k", F.col("__id").alias("__x"))
            .join(keys.select("__k", F.col("__id").alias("__y")), "__k")
            .filter(F.col("__x") != F.col("__y"))
            .select(
                F.least("__x", "__y").alias("id_a"),
                F.greatest("__x", "__y").alias("id_b"),
            )
            .distinct()
        )
    else:
        pairs = (
            keys.select("__k", F.col("__id").alias("id_a"))
            .join(keys.select("__k", F.col("__id").alias("id_b")), "__k")
            .filter(F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b")
            .distinct()
        )
    sa = base.select(
        F.col("__id").alias("id_a"), F.col("__sh").alias("sh_a"), F.col("__m").alias("na")
    )
    sb = base.select(
        F.col("__id").alias("id_b"), F.col("__sh").alias("sh_b"), F.col("__m").alias("nb")
    )
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    jac = (
        pairs.join(sa, "id_a")
        .join(sb, "id_b")
        # Size-compatibility prune (J >= t implies t*max <= min): only
        # na/nb touched, so Catalyst pushes it below the array work.
        .filter(
            F.least("na", "nb") >= F.lit(threshold) * F.greatest("na", "nb")
        )
        # Inclusion-exclusion union size: one array op per pair.
        .select(
            "id_a",
            "id_b",
            (inter / (F.col("na") + F.col("nb") - inter)).alias("jaccard"),
        )
    )
    return jac.filter(F.col("jaccard") >= threshold)


def _cc_local(nodes, src_idx, dst_idx):
    """Vectorized min-label + pointer-doubling over index arrays.

    ``nodes`` is SORTED ascending, so min over indices == min over
    ids, and the converged fixpoint — every node labeled with the
    smallest id reachable from it — is the same unique answer the
    distributed loop converges to (component = min member id),
    independent of iteration schedule. Runs in O(E) numpy work per
    round, ~log2(diameter) rounds.
    """
    import numpy as np

    comp = np.arange(len(nodes))
    for _ in range(10_000):  # safety bound; depth halves per round
        nxt = comp.copy()
        np.minimum.at(nxt, src_idx, comp[dst_idx])
        nxt = np.minimum(nxt, nxt[nxt])  # pointer doubling
        if np.array_equal(nxt, comp):
            return comp
        comp = nxt
    raise RuntimeError("local connected_components did not converge")


def connected_components(
    pairs: DataFrame,
    max_iter: int = 20,
    checkpoint_dir: str | None = None,
    doubling_jumps: int = 1,
    final_ckpt_out: list[DataFrame] | None = None,
    driver_edge_limit: int = 2_000_000,
) -> DataFrame:
    """Min-label propagation over dup pairs -> (id, component) groups.

    Each round takes the min label over the 1-hop neighborhood, then
    compresses paths by jumping every label to its label's label
    (pointer doubling). Label depth halves per round, so convergence
    is ~log2(diameter) rounds, not diameter rounds — a 1M-hop chain
    converges within the default ``max_iter``. A graph that still
    hasn't converged raises instead of returning wrong groups.

    ``doubling_jumps`` > 1 compresses depth 2^j per round BUT the
    jumps are unmaterialized self-joins, so each extra jump RE-EXECUTES
    the whole round tree below it (~2x work per jump; measured 5.5x
    slower at fixture scale for jumps=2, where dup graphs are shallow
    cliques converging in ~3 rounds anyway). Raise it only for
    genuinely deep graphs where halving rounds beats doubling
    per-round cost — and consider checkpointing between jumps first.

    The convergence probe is a FILTER on the checkpointed frame (the
    pre-round label rides along as a ``__old`` column), not a
    new-vs-old join — each round runs exactly its label joins and one
    probe scan, nothing else.

    Fault tolerance: by default each round materializes via
    ``localCheckpoint`` — fast (executor-local blocks), but an executor
    loss mid-run is unrecoverable because the truncated lineage has no
    replica. That's the right trade on local[n] and short jobs. On a
    real cluster pass ``checkpoint_dir`` (an HDFS/S3 path): rounds then
    use reliable ``checkpoint()`` snapshots that survive executor loss
    — the right default for a 100 TB corpus where a multi-hour rerun
    costs more than checkpoint I/O.
    """
    spark = pairs.sparkSession
    if checkpoint_dir is not None:
        spark.sparkContext.setCheckpointDir(checkpoint_dir)

    def _materialize(df: DataFrame) -> DataFrame:
        if checkpoint_dir is not None:
            return df.checkpoint(eager=True)
        # r13 (guide §1.2 — fewer passes/barriers): LAZY local
        # checkpoint. The convergence probe that always follows is the
        # materializing action, so each round runs ONE job (label joins
        # + block caching + probe count fused) instead of two (eager
        # materialize, then a separate probe scan). Lineage truncation
        # and block caching are identical — only the job barrier goes.
        return df.localCheckpoint(eager=False)

    def _release(ck: DataFrame) -> None:
        # module-level release_checkpoint, bound to this run's
        # checkpoint mode (see its docstring for the rationale).
        release_checkpoint(ck, reliable=checkpoint_dir is not None)

    edges = _materialize(
        # Both edge directions via ONE explode instead of
        # pairs ∪ pairs.swapped (r14, guide §1.2 don't-compute-twice):
        # union evaluates the ``pairs`` subtree once PER BRANCH, so an
        # expensive upstream pair generator (q53: the exact-Jaccard
        # self-join, ~580k verified pairs at sf0.1) ran twice inside
        # the single edges-build job. The explode reads each pair row
        # once and emits both directions from it — same rows, half the
        # pair-generator work (measured: the edges job drops ~1.9x).
        pairs.select(
            F.explode(
                F.array(
                    F.struct(
                        F.col("id_a").alias("src"), F.col("id_b").alias("dst")
                    ),
                    F.struct(
                        F.col("id_b").alias("src"), F.col("id_a").alias("dst")
                    ),
                )
            ).alias("__e")
        )
        .select("__e.src", "__e.dst")
        # r13 (guide §2.4): hash-partition the static edge list by the
        # per-round join key BEFORE checkpointing — checkpoint preserves
        # outputPartitioning, so every round's edges⋈labels join reads
        # the edge blocks in place instead of re-shuffling the (corpus-
        # scale) edge list once per round; only the small labels side
        # exchanges. r14 (guide §2.4 share-one-exchange): dedup runs
        # AFTER the dst repartition — hash(dst) clusters every
        # duplicate (src, dst) row into one partition and satisfies
        # the aggregate's ClusteredDistribution({src, dst}), so the
        # distinct's own (src, dst) exchange is planned away: ONE
        # edge-list shuffle at build instead of two (verified in
        # plans/r14/q53_*).
        .repartition("dst")
        .dropDuplicates(["src", "dst"])
        # Materialize once: the edge list is re-joined every iteration
        # (plus the convergence probe), and an expensive upstream plan
        # (e.g. a similarity join) would otherwise re-execute per round.
    )
    # Size-gated driver solve (r14, guide §1.2 the-distributed-
    # algorithm; same device as learn_bpe_merge_table's in-cap driver
    # trainer): the deduped edge list is usually orders of magnitude
    # smaller than the corpus that produced it — near-dup graphs are
    # sparse by construction. When it fits ``driver_edge_limit`` rows
    # (~32 MB at the 2M default: two bigints/row), collect the slim
    # (src, dst) pairs ONCE off the just-materialized checkpoint and
    # run the same min-label + pointer-doubling fixpoint vectorized on
    # the driver (:func:`_cc_local`): the whole iterate-until-stable
    # tail — 3+ multi-stage Spark jobs of pure scheduling latency at
    # fixture scale, each re-scanning the edge blocks — collapses into
    # milliseconds of numpy. The fixpoint (every node -> min reachable
    # id) is unique, so the answer is bit-identical to the distributed
    # loop's (q53's recursive-CTE oracle certifies it). Graphs over
    # the cap take the distributed rounds below, unchanged — the count
    # that decides is the same action that materializes the checkpoint
    # the rounds need anyway. Everything is computed from the inputs
    # within this call: nothing persists across runs. Reliable-
    # checkpoint callers (checkpoint_dir set — the real-cluster,
    # fault-tolerant configuration) keep the distributed rounds
    # regardless of size: they asked for executor-loss-surviving
    # lineage, and a driver collect is the opposite trade.
    n_edges = edges.count() if checkpoint_dir is None else None
    if n_edges is not None and n_edges <= driver_edge_limit:
        import numpy as np
        import pandas as pd
        from pyspark.sql.types import StructField, StructType

        spark_ = pairs.sparkSession
        id_type = edges.schema["src"].dataType
        out_schema = StructType(
            [
                StructField("id", id_type, False),
                StructField("component", id_type, False),
            ]
        )
        if n_edges == 0:
            _release(edges)
            return spark_.createDataFrame([], out_schema)
        pdf = edges.toPandas()
        src = pdf["src"].to_numpy()
        dst = pdf["dst"].to_numpy()
        # Edges carry both directions, so every endpoint appears in
        # src; np.unique sorts ascending (numeric order / code-point
        # string order — the same total order Spark's min uses).
        nodes, src_idx = np.unique(src, return_inverse=True)
        dst_idx = np.searchsorted(nodes, dst)
        comp = _cc_local(nodes, src_idx, dst_idx)
        _release(edges)
        out = pd.DataFrame({"id": nodes, "component": nodes[comp]})
        return spark_.createDataFrame(out, schema=out_schema)

    labels = edges.select(F.col("src").alias("id")).distinct().withColumn(
        "component", F.col("id")
    )
    prev_ck: DataFrame | None = None
    for _ in range(max_iter):
        neighbor_min = (
            edges.join(labels, edges.dst == labels.id)
            .groupBy("src")
            .agg(F.min("component").alias("nbr_min"))
        )
        new_labels = (
            labels.join(neighbor_min, labels.id == neighbor_min.src, "left")
            .select(
                "id",
                F.col("component").alias("__old"),
                F.least(
                    F.col("component"), F.coalesce(F.col("nbr_min"), F.col("component"))
                ).alias("component"),
            )
        )
        # Pointer doubling: component labels are themselves node ids, so
        # jumping to the label's own label halves every label chain;
        # each extra jump halves it again. Explicit l/r aliases scope
        # every column reference: a repeated self-join on the same
        # lineage otherwise mis-resolves the join condition (both sides
        # share attribute ids after the first jump) and silently joins
        # wrong — caught by the union-find property test.
        for _j in range(doubling_jumps):
            lookup = new_labels.select(
                F.col("id").alias("__cid"), F.col("component").alias("__cc")
            )
            new_labels = (
                new_labels.alias("l")
                .join(
                    lookup.alias("r"),
                    F.col("l.component") == F.col("r.__cid"),
                    "left",
                )
                .select(
                    F.col("l.id").alias("id"),
                    F.col("l.__old").alias("__old"),
                    F.least(
                        F.col("l.component"),
                        F.coalesce(F.col("r.__cc"), F.col("l.component")),
                    ).alias("component"),
                )
            )
        # Checkpoint BEFORE the convergence probe: the probe executes
        # the label joins, and an eager checkpoint afterwards would
        # execute them a second time — probing the checkpointed frame
        # makes each iteration run its joins exactly once, and because
        # the pre-round label rides along as __old the probe is a pure
        # filter scan, not a join against the previous frame.
        new_ck = _materialize(new_labels)
        probe = new_ck.filter(F.col("component") != F.col("__old"))
        if checkpoint_dir is not None:
            # Reliable mode: blocks are already materialized (eager),
            # so the cheapest probe short-circuits at the first
            # changed row.
            changed = probe.limit(1).count()
        else:
            # Lazy-local mode (r13): the probe IS the materializing
            # job — a full count guarantees every partition is
            # computed and cached in this one job (a limit(1) would
            # short-circuit, leaving partitions for a separate
            # completion job and re-adding the barrier just removed).
            changed = probe.count()
        # The previous round's blocks are dead the moment new_ck is
        # materialized — release them now, round by round.
        if prev_ck is not None:
            _release(prev_ck)
        prev_ck = new_ck
        if not changed:
            # edges are dead too: the result is checkpoint-truncated.
            _release(edges)
            # The RESULT rides the final round's checkpoint blocks, so
            # they cannot be released here. An eager caller that fully
            # consumes the result within its own scope (streaming
            # ingests: one sweep per micro-batch) passes
            # ``final_ckpt_out`` and releases them deterministically
            # afterwards (VERDICT r13 item 3) — batch callers leave
            # them to the ContextCleaner as before.
            if final_ckpt_out is not None:
                final_ckpt_out.append(new_ck)
            return new_ck.select("id", "component")
        labels = new_ck.select("id", "component")
    raise RuntimeError(
        f"connected_components did not converge within {max_iter} iterations "
        "(astronomically deep label chains); raise max_iter"
    )


def simhash(df: DataFrame, id_col: str, text_col: str, bits: int = 64) -> DataFrame:
    """64-bit SimHash over whitespace tokens -> (id, simhash bigint).

    Classic Charikar sketch: per bit, sum +1/-1 over token hashes and
    take the sign. Implemented as explode + partial/final hash
    aggregation (whole-stage codegen) rather than 64 per-row
    higher-order aggregates — measured ~2.5x faster; the shuffle
    carries only the map-side-combined (id, 65 counters) rows, so the
    shape holds at any corpus size. Bit i set iff 2*ones_i > n, which
    equals the +1/-1 sign rule (ties -> 0).
    """
    from xlearning_spark.operators.sharding import spread_small_scan

    # r13 (guide §2.5): the token explode + 65-counter partial
    # aggregation is the heavy stage and runs INSIDE the scan stage —
    # a single-file fixture scan serialized it onto one core. No-op on
    # an already-wide scan (see spread_small_scan).
    # r14 (guide §2.4 remove-shuffles): explode_OUTER keeps one
    # null-hash row for every null/empty token array, so every
    # document reaches the aggregate and the re-anchor join the
    # previous form needed (id-set distinct + left join + coalesce —
    # a second corpus scan plus two exchanges) is gone. The null row
    # yields n=1 with all-null bit sums, and the sign rule
    # when(null*2 > 1) is false for every bit -> the same all-zero
    # sketch the join path produced (verified value-identical on the
    # sf0.1 corpus; empty-doc tests cover it).
    th = spread_small_scan(df).select(
        F.col(id_col),
        F.explode_outer(
            F.transform(tokens(text_col), lambda x: F.xxhash64(x))
        ).alias("__h"),
    )
    agg = th.groupBy(id_col).agg(
        F.count("*").alias("__n"),
        *[
            F.sum(F.shiftright("__h", i).bitwiseAND(F.lit(1))).alias(f"__b{i}")
            for i in range(bits)
        ],
    )
    bit = [
        F.when(F.col(f"__b{i}") * 2 > F.col("__n"), F.lit(1).cast("bigint")).otherwise(
            F.lit(0).cast("bigint")
        )
        for i in range(bits)
    ]
    # Bits 0..bits-2 weight 2^i. At bits=64 the top bit is encoded as
    # -2^63 (two's complement) to avoid bigint overflow; narrower
    # sketches fit in bigint directly.
    terms = [bit[i] * F.lit(1 << i).cast("bigint") for i in range(bits - 1)]
    top = -(1 << 63) if bits == 64 else (1 << (bits - 1))
    terms.append(bit[bits - 1] * F.lit(top).cast("bigint"))
    return agg.select(
        F.col(id_col), sum(terms, F.lit(0).cast("bigint")).alias("simhash")
    )


def simhash_candidates(
    sig: DataFrame,
    id_col: str,
    bands: int = 4,
    bits: int = 64,
    max_bucket: int = 1000,
) -> DataFrame:
    """Band the ``bits``-bit simhash into ``bits/bands``-bit chunks;
    same-chunk docs are candidates (Hamming distance <= bands-1
    guaranteed found).

    ``bits`` MUST match the value the signatures were built with: a
    64-band layout over 16-bit sketches would read the always-zero
    high bands and degenerate into an all-pairs join.

    ``max_bucket`` caps degenerate buckets the same way
    ``minhash_candidate_pairs`` does: every null/empty document carries
    the all-zero sketch and would otherwise co-bucket in EVERY band,
    turning m empty docs into O(m²) candidate pairs at corpus scale.
    """
    if bits % bands != 0:
        raise ValueError(f"bands ({bands}) must divide bits ({bits})")
    width = bits // bands
    mask = (1 << width) - 1
    banded = sig.select(
        F.col(id_col),
        F.posexplode(
            F.array(
                *[
                    F.shiftrightunsigned("simhash", b * width).bitwiseAND(F.lit(mask))
                    for b in range(bands)
                ]
            )
        ).alias("band", "chunk"),
    )
    w = Window.partitionBy("band", "chunk").orderBy(id_col)
    bounded = banded.withColumn("__rn", F.row_number().over(w)).filter(
        F.col("__rn") <= max_bucket
    )
    a = bounded.select("band", "chunk", F.col(id_col).alias("id_a"))
    b = bounded.select("band", "chunk", F.col(id_col).alias("id_b"))
    return (
        a.join(b, ["band", "chunk"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )


#: 60-bit engine-portable shingle hash (md5 prefix), reduced mod the
#: 58-bit prime shared with the codegen shingle streams. Identical on
#: Spark (conv/substring) and DuckDB ('0x'||substr)::UBIGINT — the same
#: replayable-hash device the portable sketch tier (operators/sketch)
#: certifies; at ~6M distinct shingles the birthday bound under 2^58 is
#: ~6e-5 colliding pairs, and any collision affects both engines
#: identically, so hash-certification is exact.
_SPAN_MOD = 288230376151711717  # SHINGLE_MOD_58

_SPARK_SPAN_HASH = (
    "CAST(conv(substring(md5({sh}), 1, 15), 16, 10) AS BIGINT) % {P}L"
)
_DUCK_SPAN_HASH = "(('0x' || substr(md5({sh}), 1, 15))::UBIGINT % {P})::BIGINT"


def _span_position_rows(
    df: DataFrame, id_col: str, text_col: str, k: int
) -> DataFrame:
    """``(id, pos, tok, __h)`` rows: one row per token position, with
    ``__h`` the portable hash of the k-token shingle STARTING at pos
    (NULL for the last k-1 positions, where no full shingle starts).

    Codegen row-stream shape (cf. functions.shingle_hash_rows): one
    posexplode + k-1 ``lead()`` steps over the doc-key window — a
    single linear (id)-partitioned shuffle of slim rows; no computed
    array column is ever exploded (the Catalyst lambda-inlining trap
    documented on shingle_hash_rows).
    """
    w = Window.partitionBy(id_col).orderBy("pos")
    rows = df.select(
        F.col(id_col),
        F.posexplode(tokens(text_col)).alias("pos", "tok"),
    )
    parts = [F.col("tok")] + [F.lead("tok", j).over(w) for j in range(1, k)]
    # concat_ws skips NULLs, so guard explicitly: a shingle only exists
    # where the (k-1)-th lookahead token does. Materialize the shingle
    # string in its own projection, then hash it in the next one — the
    # leads are evaluated once.
    with_sh = rows.withColumn(
        "__sh",
        F.when(F.lead("tok", k - 1).over(w).isNotNull(), F.concat_ws(" ", *parts)),
    )
    return with_sh.withColumn(
        "__h", F.expr(_SPARK_SPAN_HASH.format(sh="__sh", P=_SPAN_MOD))
    ).drop("__sh")


def duplicate_spans(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 8,
    min_docs: int = 2,
    materialize: bool = True,
) -> DataFrame:
    """Maximal cross-document duplicated token spans — the EXACT
    substring-dedup primitive of Lee et al., "Deduplicating Training
    Data Makes Language Models Better" (ACL 2022), at token
    granularity: every maximal run of positions whose k-token shingle
    occurs in >= ``min_docs`` distinct documents.

    Returns ``(id, span_start, span_end, span_tokens)`` — token
    positions are 0-based and inclusive; a span starting at p and
    built from dup shingles at p..q covers tokens p..q+k-1.

    100 TB shape — every stage linear, every shuffle keyed:
      1. posexplode + doc-key window (shingle hashes)   [shuffle: id]
      2. hash-agg ``approx count`` -> dup-shingle set   [shuffle: __h]
         (countDistinct(id) >= min_docs; group cardinality = distinct
         shingles, no row multiplication)
      3. left-semi join positions against dup set       [shuffle: __h]
      4. islands-and-gaps window per doc                [shuffle: id]
    Boilerplate-heavy (hot) shingles cost one group row and a semi-join
    probe each — never a pair blowup, unlike pairwise dedup: this
    operator's output is per-DOCUMENT spans, so its size is bounded by
    corpus token count regardless of how many docs share a span.

    ``materialize=True`` (default) persists the slim (id, pos, hash)
    row frame so the dup-set aggregate and the probe side share ONE
    scan+explode+window instead of re-deriving the subtree twice (the
    plan otherwise duplicates stages 1-7 under the aggregate — plan
    reuse does not fire across the aggregate boundary). Pass False for
    a pure-lazy plan when composing into a larger pipeline.

    Reference parity note: the reference (a YARN scheduler) has no
    dedup; this extends the mandated LLM-pipeline tier (SURVEY §2.12
    L2) beyond doc-level dedup to sub-document span dedup.
    """
    rows = _span_position_rows(df, id_col, text_col, k)
    if materialize:
        rows = rows.persist(StorageLevel.MEMORY_AND_DISK)
    starts = rows.filter(F.col("__h").isNotNull())
    dup = (
        starts.groupBy("__h")
        .agg(F.countDistinct(id_col).alias("__nd"))
        .filter(F.col("__nd") >= min_docs)
        .select("__h")
    )
    dup_pos = starts.join(dup, "__h", "left_semi").select(id_col, "pos")
    w = Window.partitionBy(id_col).orderBy("pos")
    grouped = dup_pos.withColumn(
        "__grp", F.col("pos") - F.row_number().over(w)
    )
    return (
        grouped.groupBy(id_col, "__grp")
        .agg(
            F.min("pos").alias("span_start"),
            (F.max("pos") + F.lit(k - 1)).alias("span_end"),
            (F.max("pos") - F.min("pos") + F.lit(k)).alias("span_tokens"),
        )
        .drop("__grp")
    )


def excise_duplicate_spans(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 8,
    min_docs: int = 2,
    materialize: bool = True,
) -> DataFrame:
    """Rewrite each document with its cross-corpus duplicated spans
    (see :func:`duplicate_spans`) REMOVED — the corpus-cleaning form
    of exact substring dedup: boilerplate, licenses, and templated
    passages shared by >= ``min_docs`` docs vanish from every doc
    while unique prose survives.

    Returns one row per input document:
    ``(id, n_tokens, n_removed, clean_text)`` — ``clean_text`` is the
    kept tokens re-joined with single spaces ('' when everything was
    removed; token-less docs pass through with n_tokens=0).

    Coverage is computed with ONE extra doc-key window (no per-span
    join): a token at position t is covered iff some dup shingle
    starts in [t-k+1, t], i.e. ``max(dup_flag) over rows (k-1)
    preceding..current`` — positions are dense, so the row frame IS
    the position range. Rebuild is a per-doc sort-agg on the same key.
    Same linear/keyed stage list as duplicate_spans plus zero
    additional shuffles (the flag join reuses the __h shuffle; the
    window and rebuild reuse the id key). ``materialize`` as on
    :func:`duplicate_spans` — here the persisted row frame is read
    twice too (dup-set aggregate + the flagged probe side).
    """
    rows = _span_position_rows(df, id_col, text_col, k)
    if materialize:
        rows = rows.persist(StorageLevel.MEMORY_AND_DISK)
    starts = rows.filter(F.col("__h").isNotNull())
    dup = (
        starts.groupBy("__h")
        .agg(F.countDistinct(id_col).alias("__nd"))
        .filter(F.col("__nd") >= min_docs)
        .select("__h", F.lit(1).alias("__dup"))
    )
    flagged = rows.join(dup, "__h", "left").select(
        id_col, "pos", "tok", F.coalesce("__dup", F.lit(0)).alias("__dup")
    )
    return excise_from_flags(flagged, df.select(F.col(id_col)), id_col, k)


def excise_from_flags(
    flagged: DataFrame, ids: DataFrame, id_col: str, k: int
) -> DataFrame:
    """Coverage + rebuild shared by :func:`excise_duplicate_spans` and
    the streaming ingest twin: ``flagged`` is dense (id, pos, tok,
    __dup) position rows (``__dup`` = 1 where a duplicated k-shingle
    STARTS); a token is covered iff a dup shingle starts within the
    preceding k-1 positions (row frame == position range on dense
    rows). ``ids`` is the full id list, so token-less docs still get a
    (0, 0, '') row."""
    wcov = (
        Window.partitionBy(id_col)
        .orderBy("pos")
        .rowsBetween(-(k - 1), Window.currentRow)
    )
    covered = flagged.withColumn("__cov", F.max("__dup").over(wcov))
    rebuilt = covered.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.sum("__cov").alias("n_removed"),
        F.concat_ws(
            " ",
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.when(
                            F.col("__cov") == 0,
                            F.struct(F.col("pos"), F.col("tok")),
                        )
                    )
                ),
                lambda s: s.getField("tok"),
            ),
        ).alias("clean_text"),
    )
    return (
        ids.join(rebuilt, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_tokens", F.lit(0)).alias("n_tokens"),
            F.coalesce("n_removed", F.lit(0)).alias("n_removed"),
            F.coalesce("clean_text", F.lit("")).alias("clean_text"),
        )
    )
