"""Organic-skew dedup probe (r5 verdict item 2).

The main scale probe (tools/scale_probe.py) replicates documents with
per-replica Caesar ciphers — by construction dup-block SIZES stay
constant and only block COUNT grows, so its curves cannot indict a
hot-key term. This probe builds the opposite corpus: ORGANIC skew —
one literal boilerplate sentence injected into a fraction ``p`` of
docs, identical across replicas, so the hot block GROWS linearly with
volume (at 16x and p=0.3, thousands of docs share the same 16 tokens:
the "same license header on every file" shape real corpora have).

Measured per (factor, p) cell, 3-run medians:
  - ngram_jaccard_pairs, default hash order          (hot-prefix-key risk)
  - ngram_jaccard_pairs, demote_hot_df=0.05          (AllPairs freq order)
  - minhash_near_duplicates                          (band caps under a hot band)
  - duplicate_spans                                  (two-phase distinct hot key)

Equality of the two jaccard pair counts is asserted every cell — the
demoted order must stay lossless at volume, not just in unit tests.

Results merge into .skew_probe/results.json; the markdown section is
written to .skew_probe/section.md and folded into SCALE.md by
tools/scale_probe.py on its next regeneration (and can be pasted
manually).

Usage: python tools/skew_probe.py [--factors 1,4,8,16] [--p 0.3]
       [--psweep 0.1,0.3,0.5]   (p-sweep runs at factor 8)
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

BASE_SF = "/root/testdata/sf0.01"
WORK = os.path.join(REPO, ".skew_probe")
RUNS = 3

#: 16 tokens -> 12 hot 5-gram shingles and 9 hot 8-gram shingles.
BOILER = (
    "this document is provided under the standard license terms "
    "without any warranty expressed or implied whatsoever"
)

_ALPHA = "abcdefghijklmnopqrstuvwxyz"


def build_skewed(spark, factor: int, p: float) -> str:
    """documents replicated ``factor``x with per-replica Caesar cipher
    (organic intra-replica structure), then the SAME literal
    boilerplate prepended to fraction ``p`` of every replica's docs —
    the hot block grows with volume."""
    from pyspark.sql import functions as F

    from xlearning_spark.sources import read_table

    tag = f"x{factor}_p{int(p * 100)}"
    out_dir = os.path.join(WORK, tag)
    marker = os.path.join(out_dir, "_READY")
    if os.path.exists(marker):
        return out_dir
    shutil.rmtree(out_dir, ignore_errors=True)
    os.makedirs(out_dir, exist_ok=True)
    df = read_table(spark, BASE_SF, "documents")
    doff = df.agg(F.max("doc_id")).collect()[0][0] + 1
    parts = []
    for i in range(factor):
        s = i % 26
        rot = _ALPHA[s:] + _ALPHA[:s]
        rep = df.withColumn("doc_id", F.col("doc_id") + F.lit(i * doff)).withColumn(
            "text",
            F.translate("text", _ALPHA + _ALPHA.upper(), rot + rot.upper()),
        )
        parts.append(rep)
    scaled = parts[0]
    for q in parts[1:]:
        scaled = scaled.union(q)
    # Deterministic hot subset: doc_id mod 100 < p*100.
    scaled = scaled.withColumn(
        "text",
        F.when(
            F.pmod("doc_id", F.lit(100)) < F.lit(int(p * 100)),
            F.concat(F.lit(BOILER + " "), F.col("text")),
        ).otherwise(F.col("text")),
    )
    scaled.write.mode("overwrite").parquet(os.path.join(out_dir, "documents.parquet"))
    open(marker, "w").write("ok")
    return out_dir


def candidate_count(docs, demote_hot_df: float | None) -> int:
    """Instrumentation twin of ngram_jaccard_pairs' candidate
    GENERATOR (prefix keys -> equi join -> distinct pairs), counting
    candidate volume BEFORE verification — the quantity the hot-key
    analysis is about. Mirrors operators/dedup.py construction
    (threshold 0.5, shingle 5) including the demoted order."""
    from pyspark.sql import functions as F

    from xlearning_spark.functions import tokens

    t, size = 0.5, 5
    tokd = docs.repartition(32).select(
        F.col("doc_id").alias("__id"), tokens("text").alias("__toks")
    )
    tk = F.col("__toks")
    base = (
        tokd.filter(F.size(tk) >= size)
        .select(
            "__id",
            F.array_sort(
                F.array_distinct(
                    F.transform(
                        F.sequence(F.lit(1), F.size(tk) - (size - 1)),
                        lambda i: F.xxhash64(
                            F.concat_ws(
                                " ",
                                *[F.element_at(tk, i + j) for j in range(size)],
                            )
                        ),
                    )
                )
            ).alias("__sh"),
        )
        .withColumn("__m", F.size("__sh"))
        .persist()
    )
    n_docs = base.count()
    order_col = "__sh"
    if demote_hot_df is not None:
        hot = [
            r["__k"]
            for r in base.select(F.explode("__sh").alias("__k"))
            .groupBy("__k")
            .agg(F.count(F.lit(1)).alias("__df"))
            .filter(F.col("__df") >= F.lit(demote_hot_df * n_docs))
            .orderBy(F.desc("__df"), "__k")
            .limit(256)
            .collect()
        ]
        if hot:
            hot_arr = F.array(*[F.lit(int(h)) for h in sorted(hot)])
            base = base.withColumn(
                "__ord",
                F.array_sort(
                    F.transform(
                        "__sh",
                        lambda h: F.struct(
                            F.array_contains(hot_arr, h).cast("int").alias("hot"),
                            h.alias("h"),
                        ),
                    )
                ),
            )
            order_col = "__ord"
    plen = (F.col("__m") - F.ceil(F.col("__m") * F.lit(t)) + 1).cast("int")
    keys = base.select(
        "__id", F.explode(F.slice(order_col, F.lit(1), plen)).alias("__e")
    ).select(
        "__id",
        (F.col("__e.h") if order_col == "__ord" else F.col("__e")).alias("__k"),
    )
    n = (
        keys.select("__k", F.col("__id").alias("id_a"))
        .join(keys.select("__k", F.col("__id").alias("id_b")), "__k")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
        .count()
    )
    base.unpersist()
    return n


def timed(fn) -> tuple[float, int]:
    runs, val = [], None
    for _ in range(RUNS):
        t0 = time.time()
        val = fn()
        runs.append(time.time() - t0)
    return round(statistics.median(runs), 3), val


def main() -> None:
    factors = [1, 4, 8, 16]
    p_main = 0.3
    psweep = [0.1, 0.5]
    args = sys.argv[1:]
    while args:
        a = args.pop(0)
        if a == "--factors":
            factors = [int(x) for x in args.pop(0).split(",") if x]
        elif a == "--p":
            p_main = float(args.pop(0))
        elif a == "--psweep":
            psweep = [float(x) for x in args.pop(0).split(",") if x]

    from xlearning_spark.engine import build_session
    from xlearning_spark.operators.dedup import (
        duplicate_spans,
        minhash_near_duplicates,
        ngram_jaccard_pairs,
    )
    from xlearning_spark.sources import read_table

    spark = build_session(app_name="skew-probe")
    spark.sparkContext.setLogLevel("ERROR")

    os.makedirs(WORK, exist_ok=True)
    sidecar = os.path.join(WORK, "results.json")
    results: dict[str, dict] = {}
    if os.path.exists(sidecar):
        results = json.load(open(sidecar))

    if args_had_report := ("--report" in sys.argv):
        cells = []
    else:
        cells = [(f, p_main) for f in factors] + [(8, p) for p in psweep]

    # ---- keeper-sweep probe (--keeper, r7 VERDICT item 7): the q115
    # quality-keeper composition (pair generator -> components ->
    # per-component keep-most-tokens argmax -> anti join) on the
    # ORGANIC-skew corpus, hash order vs demoted generator, survivor
    # sets asserted identical every cell (demotion is lossless -> same
    # pairs -> same components -> same argmax keeper -> same corpus).
    if "--keeper" in sys.argv:
        from pyspark.sql import Window
        from pyspark.sql import functions as F

        from xlearning_spark.functions import tokens
        from xlearning_spark.operators.dedup import connected_components

        def keeper_survivors(docs, demote):
            pairs = ngram_jaccard_pairs(
                docs, "doc_id", "text", 0.5, demote_hot_df=demote
            )
            comps = connected_components(pairs.select("id_a", "id_b"))
            d = docs.withColumn(
                "n_tokens", F.size(tokens("text")).cast("bigint")
            )
            ranked = comps.join(
                d.select(F.col("doc_id").alias("id"), "n_tokens"), "id"
            ).withColumn(
                "rn",
                F.row_number().over(
                    Window.partitionBy("component").orderBy(
                        F.desc("n_tokens"), F.asc("id")
                    )
                ),
            )
            losers = ranked.filter(F.col("rn") > 1).select("id")
            return d.join(
                losers, d.doc_id == losers.id, "left_anti"
            ).select("doc_id")

        for factor in factors:
            d = build_skewed(spark, factor, p_main)
            docs = read_table(spark, d, "documents")
            cell = {}
            t, ids_plain = timed(
                lambda: {r.doc_id for r in keeper_survivors(docs, None).collect()}
            )
            cell["keeper_hash_order_sec"] = t
            t, ids_dem = timed(
                lambda: {r.doc_id for r in keeper_survivors(docs, 0.05).collect()}
            )
            cell["keeper_demoted_sec"] = t
            assert ids_plain == ids_dem, (factor, len(ids_plain), len(ids_dem))
            cell["survivors"] = len(ids_plain)
            results[f"keeper_x{factor}_p{int(p_main * 100)}"] = cell
            json.dump(results, open(sidecar, "w"), indent=1, sort_keys=True)
            print(f"keeper_x{factor}", cell, flush=True)
            spark.catalog.clearCache()
        cells = []

    # ---- hot-BAND probe (--hotband): p of docs are EXACT duplicates of
    # one string — every band bucket for that text holds p*N docs, the
    # degenerate case max_bucket exists for. Measures banding under the
    # cap and the recommended composition (exact_dedup FIRST collapses
    # the identical cluster so banding never sees it).
    if "--hotband" in sys.argv:
        from pyspark.sql import functions as F

        from xlearning_spark.operators.dedup import (
            exact_dedup,
            minhash_candidate_pairs,
            minhash_signatures,
        )
        from xlearning_spark.sources import read_table

        for factor in (4, 8):
            d = build_skewed(spark, factor, 0.0)
            docs = read_table(spark, d, "documents")
            hot = (
                "identical boilerplate document body repeated verbatim "
                "across the corpus exactly as license files are"
            )
            docs = docs.withColumn(
                "text",
                F.when(F.pmod("doc_id", F.lit(100)) < 30, F.lit(hot)).otherwise(
                    F.col("text")
                ),
            ).persist()
            n = docs.count()
            cell = {"n_docs": n}
            for cap in (1000, 64):
                t0 = time.time()
                sigs = minhash_signatures(docs, "doc_id", "text")
                cand = minhash_candidate_pairs(
                    sigs, "doc_id", max_bucket=cap
                ).count()
                cell[f"cand_cap{cap}"] = cand
                cell[f"sec_cap{cap}"] = round(time.time() - t0, 3)
            # Recommended composition: exact_dedup first — the identical
            # cluster collapses to one survivor before any banding.
            t0 = time.time()
            survivors = exact_dedup(docs, ["text"], "doc_id")
            cand = minhash_candidate_pairs(
                minhash_signatures(survivors, "doc_id", "text"), "doc_id"
            ).count()
            cell["cand_after_exact_dedup"] = cand
            cell["sec_exact_then_band"] = round(time.time() - t0, 3)
            docs.unpersist()
            results[f"hotband_x{factor}"] = cell
            json.dump(results, open(sidecar, "w"), indent=1, sort_keys=True)
            print(f"hotband_x{factor}", cell, flush=True)
        cells = []
    for factor, p in cells:
        tag = f"x{factor}_p{int(p * 100)}"
        d = build_skewed(spark, factor, p)
        docs = read_table(spark, d, "documents")
        cell: dict[str, float | int] = {}

        t, n_plain = timed(
            lambda: ngram_jaccard_pairs(docs, "doc_id", "text", 0.5).count()
        )
        cell["jaccard_hash_order_sec"] = t
        t, n_dem = timed(
            lambda: ngram_jaccard_pairs(
                docs, "doc_id", "text", 0.5, demote_hot_df=0.05
            ).count()
        )
        cell["jaccard_demoted_sec"] = t
        assert n_plain == n_dem, (tag, n_plain, n_dem)
        cell["pairs"] = n_plain

        cell["cand_hash_order"] = candidate_count(docs, None)
        cell["cand_demoted"] = candidate_count(docs, 0.05)

        t, n_mh = timed(
            lambda: minhash_near_duplicates(
                docs, "doc_id", "text", threshold=0.8
            ).count()
        )
        cell["minhash_sec"] = t
        cell["minhash_pairs"] = n_mh

        t, n_sp = timed(
            lambda: duplicate_spans(docs, "doc_id", "text", k=8).count()
        )
        cell["spans_sec"] = t
        cell["span_rows"] = n_sp

        results[tag] = cell
        json.dump(results, open(sidecar, "w"), indent=1, sort_keys=True)
        print(tag, cell, flush=True)
        spark.catalog.clearCache()

    # ---------------------------------------------------------- report
    lines = [
        "## Organic-skew probe (tools/skew_probe.py, round 6)",
        "",
        "Base sf0.01 documents, Caesar replicas + ONE literal 16-token",
        f"boilerplate prepended to p of all docs (identical across replicas",
        "— the hot block GROWS with volume, unlike the main probe's",
        "constant-block design). 3-run medians, local[32]. 'hash order' =",
        "ngram_jaccard_pairs default; 'demoted' = demote_hot_df=0.05 (the",
        "lossless AllPairs frequency order — pair counts asserted equal",
        "every cell).",
        "",
        "| cell | cand hash-order | cand demoted | jaccard hash-order s | jaccard demoted s | minhash s | spans s | pairs |",
        "|---|---|---|---|---|---|---|---|",
    ]
    for tag in sorted(results):
        c = results[tag]
        if "jaccard_hash_order_sec" not in c:
            continue
        lines.append(
            f"| {tag} | {c.get('cand_hash_order', '—')} |"
            f" {c.get('cand_demoted', '—')} |"
            f" {c['jaccard_hash_order_sec']} | {c['jaccard_demoted_sec']} |"
            f" {c['minhash_sec']} | {c['spans_sec']} | {c['pairs']} |"
        )
    hb = {t: c for t, c in results.items() if t.startswith("hotband_")}
    if hb:
        lines += [
            "",
            "Hot-BAND cell (p=0.3 of docs EXACT duplicates of one string —",
            "every band bucket for that text holds 30% of the corpus, the",
            "degenerate case `max_bucket` exists for):",
            "",
            "| cell | n_docs | cand cap=1000 | s | cand cap=64 | s | cand after exact_dedup first | s |",
            "|---|---|---|---|---|---|---|---|",
        ]
        for t in sorted(hb):
            c = hb[t]
            lines.append(
                f"| {t} | {c['n_docs']} | {c['cand_cap1000']} |"
                f" {c['sec_cap1000']} | {c['cand_cap64']} | {c['sec_cap64']} |"
                f" {c['cand_after_exact_dedup']} | {c['sec_exact_then_band']} |"
            )
        lines += [
            "",
            "Reading the cells: at 4x the identical cluster (600 docs) is",
            "below cap=1000, so candidates are the raw quadratic C(600,2);",
            "at 8x the cluster (1200) EXCEEDS the cap and candidates",
            "saturate at ~C(1000,2) = 499.5k — bounded from there on no",
            "matter how the cluster grows. cap=64 bounds it at ~2.1k",
            "(235x less). The RECOMMENDED composition — exact_dedup first,",
            "banding on survivors — removes the degenerate cluster",
            "entirely (56/112 organic candidates left), which is why every",
            "sweep example runs exact dedup before MinHash.",
        ]
    kp = {t: c for t, c in results.items() if t.startswith("keeper_")}
    if kp:
        lines += [
            "",
            "Quality-keeper sweep (q115's composition) on the SAME",
            "organic-skew corpus (r7 VERDICT item 7): generator ->",
            "components -> per-component keep-most-tokens argmax -> anti",
            "join; survivor sets asserted identical between hash order and",
            "the demoted generator every cell (lossless at volume).",
            "",
            "| cell | keeper hash-order s | keeper demoted s | survivors |",
            "|---|---|---|---|",
        ]
        for t in sorted(kp, key=lambda x: int(x.split("_x")[1].split("_")[0])):
            c = kp[t]
            lines.append(
                f"| {t} | {c['keeper_hash_order_sec']} |"
                f" {c['keeper_demoted_sec']} | {c['survivors']} |"
            )
    lines += [
        "",
        "Findings (round 6):",
        "",
        "- **Hash order is quadratic in the hot block; the demoted order",
        "  removes the term entirely.** Candidate volume under hash order",
        "  grows ~4x per volume doubling (11.2k -> 180k -> 720k -> 2.88M at",
        "  1/4/8/16x, p=0.3) and quadratically in p (80k -> 720k -> 2.0M at",
        "  p=0.1/0.3/0.5, 8x) — the within-hot-key square. The demoted order",
        "  (demote_hot_df=0.05) cuts candidates 35-380x (7.6k at 16x - a",
        "  **380x reduction**) and its growth is linear in corpus size, as",
        "  the prefix lemma predicts when hot shingles cannot enter",
        "  prefixes. Wall-clock at this fixture size shows 1.4-2.4x (idle",
        "  local[32] slots absorb the blowup); at 100 TB the candidate",
        "  ratio IS the cost ratio — the hot-key join output dominates.",
        "  Output pair sets asserted equal every cell (lossless), and",
        "  q101_demoted_jaccard hash-certifies the reordered generator",
        "  against q70's brute-force DuckDB oracle.",
        "- **MinHash banding is flat under the hot block** (1.5-2.2 s across",
        "  every cell): a shared boilerplate raises pairwise Jaccard only",
        "  to ~0.2, far below banding's collision threshold at t=0.8, and",
        "  max_bucket caps any degenerate band bucket by construction.",
        "- **duplicate_spans is flat under the hot block** (0.7-1.5 s):",
        "  its hot-shingle aggregate is Spark's two-phase distinct (first",
        "  shuffle keyed on (shingle, doc) — well-spread even when one",
        "  shingle covers 50% of docs; the final per-shingle count gets",
        "  map-side partial aggregation), and span output is bounded by",
        "  corpus tokens, never pair counts. No salting needed — verified",
        "  by plan shape, not just this probe's curve.",
        "- **Trade**: the demoted order costs one extra linear DF pass",
        "  (visible at x1: 2.3 s vs 2.7 s hash-order — fixed cost",
        "  comparable at fixture scale). Enable demote_hot_df when corpora",
        "  carry boilerplate (real web/code corpora do); the default stays",
        "  hash-order for oracle-twin comparability.",
    ]
    section = "\n".join(lines) + "\n"
    open(os.path.join(WORK, "section.md"), "w").write(section)
    print(section)


if __name__ == "__main__":
    main()
