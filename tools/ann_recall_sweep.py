"""ANN recall-at-scale sweep (r5 verdict item 6).

The per-operator recall gates run at sf0.1 (2000 vectors); this sweep
measures the SAME recall question on the 8x scaled corpus (16,000
vectors, .scale_probe/x8 — built by tools/scale_probe.py) so the
recall-vs-cost curves are evidence at volume, not just at fixture
size:

  - IVF:   recall@10 vs n_probe      (cells bound WHO is scanned)
  - PQ:    recall@10 vs shortlist    (codes bound per-candidate cost)
  - IVFPQ: recall@10 over the (n_probe, shortlist) grid

Ground truth is brute-force exact cosine over the full scaled corpus
for a bounded 100-query batch. Indexes build ONCE per family and all
sweep points probe the same prebuilt index (the production build/probe
split — per-point cost is probe cost only).

Writes .ann_sweep/results.json + .ann_sweep/section.md (folded into
SCALE.md by tools/scale_probe.py regeneration). The monotonicity the
table shows — recall non-decreasing in n_probe/shortlist, reaching
1.0 at the exhaustive points — is pinned as a unit test in
tests/test_llm_ops.py::test_ann_recall_monotone_and_exhaustive.

Usage: python tools/ann_recall_sweep.py [--factor 8] [--queries 100] [--k 10]
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

WORK = os.path.join(REPO, ".ann_sweep")

N_CELLS = 32
N_PROBES = [1, 2, 4, 8, 16, 32]
SHORTLISTS = [10, 25, 50, 100, 200]
IVFPQ_GRID = [(2, 50), (4, 100), (8, 200), (16, 400)]


def main() -> None:
    factor, n_queries, k = 8, 100, 10
    args = sys.argv[1:]
    while args:
        a = args.pop(0)
        if a == "--factor":
            factor = int(args.pop(0))
        elif a == "--queries":
            n_queries = int(args.pop(0))
        elif a == "--k":
            k = int(args.pop(0))

    from pyspark.sql import functions as F

    from xlearning_spark.engine import build_session
    from xlearning_spark.operators.similarity import (
        brute_force_topk,
        build_ivf_index,
        build_pq_index,
        ivf_pq_topk,
        ivf_probe,
        pq_topk,
    )

    spark = build_session(app_name="ann-recall-sweep")
    spark.sparkContext.setLogLevel("ERROR")

    emb_dir = os.path.join(REPO, ".scale_probe", f"x{factor}", "embeddings.parquet")
    if not os.path.exists(emb_dir):
        sys.exit(
            f"{emb_dir} missing — run tools/scale_probe.py {factor} first"
        )
    corpus = spark.read.parquet(emb_dir).persist()
    n_corpus = corpus.count()
    # Deterministic bounded query batch from the ORIGINAL id range.
    step = max(1, (n_corpus // factor) // n_queries)
    queries = corpus.filter(
        (F.col("vec_id") < n_corpus // factor)
        & (F.pmod("vec_id", F.lit(step)) == 0)
    ).persist()
    nq = queries.count()

    truth = {
        (r.qid, r.cid)
        for r in brute_force_topk(corpus, queries, k=k).collect()
    }

    def recall(df) -> float:
        got = {(r.qid, r.cid) for r in df.collect()}
        return round(len(got & truth) / len(truth), 4)

    results: dict[str, dict] = {
        "corpus": n_corpus,
        "queries": nq,
        "k": k,
        "n_cells": N_CELLS,
        "ivf": {},
        "pq": {},
        "ivfpq": {},
    }

    ivf = build_ivf_index(corpus, n_cells=N_CELLS)
    ivf.cells.count()  # materialize the cache: points pay probe cost only
    for np_ in N_PROBES:
        t0 = time.time()
        r = recall(ivf_probe(ivf, queries, k=k, n_probe=np_))
        results["ivf"][str(np_)] = {
            "recall": r,
            "sec": round(time.time() - t0, 2),
        }
        print("ivf n_probe", np_, results["ivf"][str(np_)], flush=True)

    pq = build_pq_index(corpus, m=8, bits=4)
    pq.codes.count()
    for sl in SHORTLISTS:
        t0 = time.time()
        r = recall(pq_topk(pq, queries, k=k, shortlist=sl))
        results["pq"][str(sl)] = {
            "recall": r,
            "sec": round(time.time() - t0, 2),
        }
        print("pq shortlist", sl, results["pq"][str(sl)], flush=True)

    for np_, sl in IVFPQ_GRID:
        t0 = time.time()
        r = recall(
            ivf_pq_topk(
                corpus,
                queries,
                k=k,
                n_cells=N_CELLS,
                n_probe=np_,
                shortlist=sl,
            )
        )
        results["ivfpq"][f"{np_}/{sl}"] = {
            "recall": r,
            "sec": round(time.time() - t0, 2),
        }
        print("ivfpq", np_, sl, results["ivfpq"][f"{np_}/{sl}"], flush=True)

    os.makedirs(WORK, exist_ok=True)
    json.dump(results, open(os.path.join(WORK, "results.json"), "w"), indent=1)

    lines = [
        "## ANN recall-at-scale sweep (tools/ann_recall_sweep.py, round 6)",
        "",
        f"8x scaled corpus ({n_corpus} x 64d vectors), {nq} queries,",
        f"recall@{k} vs brute-force exact cosine. Indexes built ONCE",
        f"(n_cells={N_CELLS} IVF; m=8/bits=4 PQ); every point pays probe",
        "cost only (the build/probe split). Recall is monotone in",
        "n_probe/shortlist and reaches 1.0 at the exhaustive points —",
        "pinned as a unit test (test_ann_recall_monotone_and_exhaustive).",
        "",
        "| IVF n_probe | " + " | ".join(str(x) for x in N_PROBES) + " |",
        "|---|" + "---|" * len(N_PROBES),
        "| recall | "
        + " | ".join(str(results["ivf"][str(x)]["recall"]) for x in N_PROBES)
        + " |",
        "| probe sec | "
        + " | ".join(str(results["ivf"][str(x)]["sec"]) for x in N_PROBES)
        + " |",
        "",
        "| PQ shortlist | " + " | ".join(str(x) for x in SHORTLISTS) + " |",
        "|---|" + "---|" * len(SHORTLISTS),
        "| recall | "
        + " | ".join(str(results["pq"][str(x)]["recall"]) for x in SHORTLISTS)
        + " |",
        "| probe sec | "
        + " | ".join(str(results["pq"][str(x)]["sec"]) for x in SHORTLISTS)
        + " |",
        "",
        "| IVFPQ n_probe/shortlist | "
        + " | ".join(f"{a}/{b}" for a, b in IVFPQ_GRID)
        + " |",
        "|---|" + "---|" * len(IVFPQ_GRID),
        "| recall | "
        + " | ".join(
            str(results["ivfpq"][f"{a}/{b}"]["recall"]) for a, b in IVFPQ_GRID
        )
        + " |",
        "| end-to-end sec | "
        + " | ".join(
            str(results["ivfpq"][f"{a}/{b}"]["sec"]) for a, b in IVFPQ_GRID
        )
        + " |",
    ]
    section = "\n".join(lines) + "\n"
    open(os.path.join(WORK, "section.md"), "w").write(section)
    print(section)


if __name__ == "__main__":
    main()
