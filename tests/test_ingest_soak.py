"""Long-lived ingest soak (VERDICT r12 item 3): one ``scored_ingest``
driven over 50 micro-batches across 4 separate drains with a mid-life
``compact_batch_output`` between drains, a simulated crash-replay of
the newest batch, and a LIVE lease-refusal probe while a drain is
running — asserting reader equivalence with the batch twin, bounded
file count after compaction, and exactly-once output end to end.

The per-piece behavior is unit-tested in test_streaming.py; this file
proves the COMPOSED lifecycle a long-lived pipeline actually runs:
drain / compact / drain / crash / replay / compact / drain / final
fold. Reference anchor: the long-lived STREAM output loop + commit
protocol (HboxContainer.java:1211-1257, ApplicationMaster.java:
3106-3172)."""

from __future__ import annotations

import os
import threading
import time

import pandas as pd
import pytest

from tests.test_streaming import _drop_last_commit
from xlearning_spark import streaming as st
from xlearning_spark.operators.text import (
    hashed_bow,
    lcg_weights,
    score_text_lr,
)

_SCHEMA = "doc_id bigint, text string"
_DIM = 32


def _doc(i: int) -> tuple[int, str]:
    return (i, f"tok{i % 7} tok{i % 3} word{i} fill{i % 11}")


def _write_files(src: str, lo: int, hi: int) -> None:
    # One parquet file per doc: with maxFilesPerTrigger=1 every file
    # becomes its own micro-batch, so 50 files soak 50 batches.
    for i in range(lo, hi):
        did, text = _doc(i)
        pd.DataFrame({"doc_id": [did], "text": [text]}).to_parquet(
            os.path.join(src, f"f{i:04d}.parquet")
        )


def test_scored_ingest_soak_50_batches(spark, tmp_path):
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src)
    w = lcg_weights(_DIM, seed=13)

    def drain():
        return st.scored_ingest(
            spark.readStream.format("parquet")
            .schema(_SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .load(src),
            out, ckpt, w,
        )

    def files():
        return sorted(f for f in os.listdir(out) if f.endswith(".parquet"))

    # ---- drain 1: 20 micro-batches -------------------------------
    _write_files(src, 0, 20)
    assert drain() == list(range(20))
    n_before_compact = len(files())
    assert n_before_compact == 20  # one landed file per micro-batch

    # ---- mid-life compaction 1 (newest batch never folded) -------
    assert st.compact_batch_output(spark, out) == 18
    assert len(files()) == 2  # base-18 + batch-19
    assert spark.read.parquet(out).count() == 20

    # ---- drain 2: 20 more micro-batches --------------------------
    _write_files(src, 20, 40)
    assert drain() == list(range(20, 40))

    # ---- crash-replay of the newest batch ------------------------
    replayed = _drop_last_commit(ckpt)
    assert drain() == [replayed]  # converges, no duplicate rows
    assert spark.read.parquet(out).count() == 40

    # ---- mid-life compaction 2 -----------------------------------
    assert st.compact_batch_output(spark, out) == 38
    assert len(files()) == 2  # base-38 + batch-39
    assert spark.read.parquet(out).count() == 40

    # ---- drain 3: 10 more micro-batches, with a LIVE lease probe -
    # A compaction attempted WHILE the drain runs must refuse (the
    # cross-process offline-only guard), not fold mid-ingest.
    _write_files(src, 40, 50)
    probe: dict[str, object] = {}

    def _probe():
        deadline = time.time() + 120
        lease = os.path.join(out, "_INGEST_LEASE")
        while time.time() < deadline and not os.path.exists(lease):
            time.sleep(0.02)
        try:
            st.compact_batch_output(spark, out)
            probe["refused"] = False
        except RuntimeError as e:
            probe["refused"] = True
            probe["msg"] = str(e)

    t = threading.Thread(target=_probe)
    t.start()
    assert drain() == list(range(40, 50))
    t.join()
    assert probe.get("refused") is True
    assert "ingest lease" in str(probe.get("msg"))
    # The drained ingest released its lease on exit.
    assert not os.path.exists(os.path.join(out, "_INGEST_LEASE"))

    # ---- final fold (drained mode): everything into one generation
    assert st.compact_batch_output(spark, out, upto_batch=49) == 49
    final = files()
    assert final and all(f.startswith("base-0000000049-") for f in final)
    # Bounded file count: 50 micro-batches would have left >= 50
    # files; the compacted corpus is a handful of right-sized files.
    assert len(final) <= 3

    # ---- reader equivalence with the batch twin ------------------
    got = {
        r.doc_id: (r.margin, r.score)
        for r in spark.read.parquet(out).collect()
    }
    assert sorted(got) == list(range(50))  # exactly-once: 50 docs, no dups
    all_docs = spark.createDataFrame([_doc(i) for i in range(50)], _SCHEMA)
    exp = {
        r.doc_id: (r.margin, r.score)
        for r in score_text_lr(hashed_bow(all_docs, dim=_DIM), w).collect()
    }
    assert sorted(exp) == list(range(50))
    for doc_id, (m, s) in exp.items():
        assert got[doc_id][0] == pytest.approx(m, abs=1e-12)
        assert got[doc_id][1] == pytest.approx(s, abs=1e-12)

    # ---- nothing new: compaction and drain are both no-ops -------
    assert st.compact_batch_output(spark, out, upto_batch=49) is None
    assert drain() == []
    assert sorted(
        r.doc_id for r in spark.read.parquet(out).collect()
    ) == list(range(50))
