"""Plan assertions (SURVEY.md §5.2): the physical plans Catalyst picks
must be the 100 TB-correct ones — broadcasts on bounded dims, filters
and projections pushed into the parquet scan, no accidental global
exchanges. These are properties of the declarative plan, so asserting
them at sf0.001 proves them at any scale factor."""

from __future__ import annotations

from tests.conftest import SF_SMOKE, plan_string
from xlearning_spark.queries import registry
import xlearning_spark.queries  # noqa: F401


def _plan(spark, name: str) -> str:
    return plan_string(registry.get(name).spark(spark, SF_SMOKE))


def _n_nodes(plan: str, op: str) -> int:
    # formatted explain lists each node in the tree as "Op (id)" and
    # again in the details as "(id) Op" — count tree occurrences only.
    return plan.count(f"{op} (")


def test_q05_broadcasts_bounded_dims(spark):
    plan = _plan(spark, "q05_regional_revenue")
    assert "BroadcastHashJoin" in plan
    # The fact-side join (lineitem x orders) must NOT be forced to
    # broadcast by us; AQE may still choose it at tiny SF, which is fine
    # -- what we assert is our own hint only marks nation/region.
    assert plan.count("ResolvedHint") == 0  # hints resolved, not dangling


def test_q02_filter_and_projection_reach_scan(spark):
    plan = _plan(spark, "q02_filter_project_pushdown")
    assert "PushedFilters:" in plan
    assert "l_shipdate" in plan.split("PushedFilters:")[1][:300]
    # Narrow projection: the scan must not read all 16 lineitem columns.
    read_schema = plan.split("ReadSchema:")[1][:400]
    for col in ("l_orderkey", "l_linenumber", "l_extendedprice"):
        assert col in read_schema
    assert "l_comment" not in read_schema


def test_q01_partial_aggregation(spark):
    plan = _plan(spark, "q01_pricing_summary")
    # partial+final hash aggregation (map-side combine before shuffle)
    assert _n_nodes(plan, "HashAggregate") >= 2


def test_q17_single_shuffle_window(spark):
    plan = _plan(spark, "q17_topk_orders_per_customer")
    # keyed window -> exactly one exchange on the partition key
    assert _n_nodes(plan, "Exchange") == 1


def test_asof_join_single_shuffle(spark):
    plan = _plan(spark, "q09_asof_join_purchase_signup")
    # union + keyed window formulation: no join node at all, and no
    # cartesian/range-join blowup
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_whole_stage_codegen_in_scalar_queries(spark):
    plan = _plan(spark, "q24_math_functions")
    # formatted explain marks codegen'd nodes with a '*' prefix
    assert "* Project" in plan


def test_q46_broadcasts_query_side_only(spark):
    plan = _plan(spark, "q46_cosine_topk")
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    # corpus rows are never exchanged BY KEY until the final per-query
    # top-k window: exactly one hashpartitioning exchange. (The r13
    # conditional round-robin spread of a narrow scan —
    # spread_small_scan, a plan-level no-op on an already-wide scan —
    # is parallelism recovery, not a keyed corpus shuffle, so it is
    # not counted here.)
    assert plan.count("hashpartitioning(") == 1
    # ...and total exchanges stay bounded (ADVICE r13: the
    # hashpartitioning count alone would miss a regression that adds
    # extra round-robin/range exchanges on the corpus path): one keyed
    # window exchange + the spread's round-robin + the broadcast.
    import re

    n_exchanges = len(re.findall(r"\bExchange \(\d+\)", plan))
    assert n_exchanges <= 2, f"{n_exchanges} Exchange nodes in q46 plan"
    n_bcast = len(re.findall(r"\bBroadcastExchange \(\d+\)", plan))
    assert n_bcast <= 1, f"{n_bcast} BroadcastExchange nodes in q46 plan"


def test_q54_blocked_pair_join_shape(spark):
    # Embedding near-dup must pair via an equi join on the block key
    # (no cartesian product) and materialize per-row norms in the
    # pre-join projections, not per pair.
    plan = _plan(spark, "q54_embedding_neardup")
    assert _n_nodes(plan, "CartesianProduct") == 0
    assert _n_nodes(plan, "BroadcastNestedLoopJoin") == 0
    assert "Join" in plan
    # Norms must be materialized in the pre-join projections, NOT
    # recomputed per pair: the join condition may divide by the norm
    # columns but must never contain the SQRT(aggregate(...)) norm
    # expression itself (the O(pairs) inlining regression).
    assert plan.count("SQRT(aggregate(") >= 2
    for cond in [
        seg.split("\n")[0] for seg in plan.split("Join condition:")[1:]
    ]:
        assert "SQRT" not in cond, f"per-pair norm in join condition: {cond[:200]}"


def test_no_global_window_in_graded_corpus(spark):
    # The one shape that cannot scale: a Window with an empty partition
    # spec funnels the whole table through one task, which Spark plans
    # as `Exchange SinglePartition` under a Window/Sort. No graded
    # query may contain one (q20 was re-specified in round 4; q28 is
    # the agg+broadcast form for globally-consistent buckets).
    from xlearning_spark.queries import registry

    offenders = []
    for name, spec in registry.specs().items():
        if spec.oracle is None:
            continue
        try:
            plan = _plan(spark, name)
        except Exception:
            continue  # non-plan-checkable (e.g. needs driver-side setup)
        if "Window" in plan and "Exchange SinglePartition" in plan:
            offenders.append(name)
    assert not offenders, f"global-window queries: {offenders}"


def test_q98_shares_one_position_row_frame(spark):
    # The substring-dedup span detector must not re-derive the
    # scan+explode+doc-window subtree under the dup-set aggregate: both
    # the probe side and the aggregate read the ONE persisted
    # (id, pos, hash) relation, and the corpus is scanned exactly once.
    plan = _plan(spark, "q98_duplicate_spans")
    assert _n_nodes(plan, "InMemoryTableScan") == 2
    assert "CartesianProduct" not in plan


def test_q99_excision_plan_shape(spark):
    # Excision = q98's stages + one coverage window + the rebuild
    # sort-agg; same single-scan guarantee, and the final ids join must
    # not degrade to a cartesian.
    plan = _plan(spark, "q99_excise_spans")
    assert _n_nodes(plan, "InMemoryTableScan") >= 2
    assert "CartesianProduct" not in plan


def test_dedup_sweep_anti_join_is_aqe_broadcast_not_forced(spark):
    # r7 VERDICT item 1: the loser-set anti-join in the dedup sweeps
    # must NOT force a driver-side broadcast — the loser set scales
    # with the corpus dup rate (billions of ids at 100 TB), where a
    # forced broadcast OOMs the driver and an AQE-chosen shuffled
    # left-anti just works. The hint is gone from the code; this test
    # pins the other half of the intent: at fixture scale AQE still
    # CHOOSES broadcast on its own, so small corpora keep the fast
    # plan. (Reference analogue: broadcast-vs-split is the AM's
    # runtime decision, AM/ApplicationMaster.java:1043-1076.)
    from xlearning_spark.queries import registry

    for name in (
        "q80_neardup_sweep",
        "q83_neardup_sweep_scaled",
        "q115_quality_keeper_dedup",
    ):
        df = registry.get(name).spark(spark, SF_SMOKE)
        df.collect()  # materialize so AQE finalizes the join strategy
        plan = plan_string(df)
        assert "isFinalPlan=true" in plan, name
        anti_lines = [ln for ln in plan.splitlines() if "LeftAnti" in ln]
        assert anti_lines, f"{name}: no LeftAnti join in final plan"
        assert any("Broadcast" in ln for ln in anti_lines), (
            f"{name}: AQE did not choose broadcast at fixture scale: "
            f"{anti_lines}"
        )


def test_q81_term_df_join_no_forced_hint(spark):
    # r8 VERDICT item 2: the term->df vocabulary aggregate is heaps-law
    # unbounded at corpus scale (billions of distinct terms at 100 TB),
    # so the tf<->df join must not force a broadcast. At fixture scale
    # AQE still chooses broadcast from the runtime size, so the fast
    # plan is preserved where it is safe; no dangling hints anywhere.
    from xlearning_spark.queries import registry

    df = registry.get("q81_term_salience").spark(spark, SF_SMOKE)
    df.collect()  # materialize so AQE finalizes the join strategy
    plan = plan_string(df)
    assert "isFinalPlan=true" in plan
    assert "ResolvedHint" not in plan
    join_lines = [
        ln
        for ln in plan.splitlines()
        if "Join" in ln and ("+-" in ln or ":-" in ln or ln.strip().startswith("*"))
    ]
    assert join_lines, "no join in final q81 plan"
    assert any("Broadcast" in ln for ln in join_lines), (
        f"AQE did not choose broadcast at fixture scale: {join_lines}"
    )


def test_q118_enrichment_no_forced_dim_hint_planner_broadcasts(spark):
    # r8 VERDICT item 1: the customer->nation dimension chain is
    # SF-proportional on its customer side, so the events<->dims join
    # must NOT carry a forced F.broadcast hint (that hint OOMs every
    # executor at the 100 TB target). Only the genuinely bounded side
    # (nation, 25 rows at every SF) may be hinted. What we pin here is
    # the intent, mirroring the dedup anti-join guard above: no
    # dangling hint on the dims join, and at fixture scale the planner
    # still CHOOSES broadcast on its own from the size estimate — so
    # small corpora keep the map-side plan while big ones degrade
    # gracefully to a shuffled join instead of an OOM.
    from xlearning_spark.queries import registry

    df = registry.get("q118_stream_enrichment").spark(spark, SF_SMOKE)
    df.collect()  # materialize so AQE finalizes the join strategy
    plan = plan_string(df)
    assert "isFinalPlan=true" in plan
    # both joins (customer x nation, events x dims) chosen as broadcast
    # at fixture scale
    assert plan.count("BroadcastHashJoin") >= 2
    assert "SortMergeJoin" not in plan
    # fact scan pruned to the three columns the query reads
    read_schema = plan.split("ReadSchema:")[1][:200]
    assert "ts" in read_schema and "user_id" in read_schema
    assert "props" not in read_schema and "event_type" not in read_schema


def test_train_text_lr_iteration_plan_single_idx_shuffle(spark):
    # The trainer's per-iteration contract (operators/text.py
    # train_text_lr docstring, r11 window form): above the cached
    # doc-partitioned feature frame, ONE shuffle Exchange only — the
    # dim-row-bounded gradient agg on idx — and the margin window must
    # ride the cache's partitioning (LOCAL sort, no Exchange). This is
    # the pytest twin of tools/scale_probe.py's CUSTOM_GUARDS check
    # (which asserts it at 16x volume per probe run).
    import re

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from xlearning_spark.operators.text import hashed_bow
    from xlearning_spark.sources import read_table

    dim = 64
    docs = read_table(spark, SF_SMOKE, "documents").withColumn(
        "label", (F.col("doc_id") % 2).cast("int")
    )
    feats = (
        hashed_bow(docs, dim=dim)
        .join(
            docs.select("doc_id", F.col("label").cast("double").alias("__y")),
            "doc_id",
        )
        .repartition("doc_id")
        .persist()
    )
    try:
        feats.count()
        win = Window.partitionBy("doc_id").orderBy("idx")
        full = win.rowsBetween(
            Window.unboundedPreceding, Window.unboundedFollowing
        )
        wdf = spark.createDataFrame(
            [(i, 0.0) for i in range(dim)], "idx int, wt double"
        )
        grad = (
            feats.join(F.broadcast(wdf), "idx")
            .withColumn("__m", F.sum(F.col("cnt") * F.col("wt")).over(full))
            .withColumn(
                "__r",
                F.lit(1.0) / (F.lit(1.0) + F.exp(-F.col("__m")))
                - F.col("__y"),
            )
            .withColumn("__rn", F.row_number().over(win))
            .groupBy("idx")
            .agg(
                F.sum(F.col("cnt") * F.col("__r")).alias("g"),
                F.sum(F.when(F.col("__rn") == 1, F.col("__r"))).alias("gb"),
            )
        )
        plan = grad._jdf.queryExecution().executedPlan().toString()
        iter_plan = plan.split("InMemoryRelation")[0]
        shuffles = re.findall(r"(?<!Broadcast)Exchange \w+", iter_plan)
        assert len(shuffles) == 1, shuffles
        assert "hashpartitioning(idx" in iter_plan
        # Window sort is local (global flag false) — the cached
        # hashpartitioning(doc_id) satisfies the window distribution.
        sort_tail = iter_plan.split("Sort [doc_id")[1][:80]
        assert ", false, " in sort_tail and ", true, " not in sort_tail
        # Both window expressions fused into one Window node.
        assert iter_plan.count("Window ") == 1
    finally:
        feats.unpersist()


def test_assign_cells_is_shuffle_free(spark):
    # The IVF add path (streaming ann_ingest's per-batch core) must be
    # a pure map pass: centroid literals in the plan, array_min argmin,
    # NO Exchange anywhere — the property that makes the streamed add
    # O(batch x n_cells) regardless of index size.
    from xlearning_spark.operators.similarity import assign_cells
    from xlearning_spark.sources import read_table

    emb = read_table(spark, SF_SMOKE, "embeddings")
    dim = len(emb.select("embedding").first()[0])
    cents = [[float(i)] * dim for i in range(4)]
    df = assign_cells(emb, cents)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "Join" not in plan and "Window" not in plan
