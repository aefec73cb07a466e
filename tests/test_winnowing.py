"""Winnowing fingerprint tests (operators/text.py:97-228).

Verifies the SIGMOD'03 guarantee — two documents sharing a substring of
length >= k + w - 1 share at least one fingerprint — plus density,
polynomial/xxhash path agreement on set sizes, the short-text filter,
and fingerprint_overlap_pairs with the max_df stop-fingerprint cap.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from xlearning_spark.operators.text import (
    WINNOW_BASE,
    WINNOW_PRIME,
    fingerprint_overlap_pairs,
    kgram_hashes,
    winnowing_fingerprints,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_polynomial_kgram_hash_values(spark):
    # The Rabin-Karp path must equal a reference Horner computed in Python
    # (this is exactly what the q78 DuckDB oracle replays).
    text = "abcdefgh"
    k = 3
    df = spark.createDataFrame([(text,)], "text string").select(
        kgram_hashes("text", k, polynomial=True).alias("h")
    )
    got = df.collect()[0]["h"]

    def horner(s: str) -> int:
        h = 0
        for c in s:
            h = (h * WINNOW_BASE + ord(c)) % WINNOW_PRIME
        return h

    want = [horner(text[i : i + k]) for i in range(len(text) - k + 1)]
    assert got == want


def test_shared_substring_guarantee(spark):
    # SIGMOD'03: any shared run of length >= k + w - 1 => >= 1 shared
    # fingerprint. Plant a 40-char common substring inside otherwise
    # unrelated documents (k=8, w=4 => guarantee threshold 11).
    common = "the quick brown fox jumps over the lazy"
    a = "zzz unrelated prefix AAAA " + common + " qqq suffix one"
    b = "totally different start 1234 " + common + " other ending!"
    fps = winnowing_fingerprints(
        _docs(spark, [(1, a), (2, b)]), k=8, w=4
    ).collect()
    by_id = {r["doc_id"]: set(r["fingerprints"]) for r in fps}
    assert by_id[1] & by_id[2], "guaranteed shared fingerprint missing"


def test_no_spurious_match_on_disjoint_alphabets(spark):
    fps = winnowing_fingerprints(
        _docs(
            spark,
            [(1, "aaaa bbbb cccc dddd eeee ffff"), (2, "1111 2222 3333 4444 5555 6666")],
        ),
        k=8,
        w=4,
    ).collect()
    by_id = {r["doc_id"]: set(r["fingerprints"]) for r in fps}
    assert not (by_id[1] & by_id[2])


def test_density_and_short_text_filter(spark):
    # Density ~2/(w+1): a long random-ish text must select far fewer
    # fingerprints than k-grams; texts shorter than k+w-1 are dropped
    # before any hash work.
    long_text = " ".join(f"tok{i * 7919 % 101}" for i in range(200))
    out = winnowing_fingerprints(
        _docs(spark, [(1, long_text), (2, "tiny")]), k=8, w=4
    ).collect()
    assert [r["doc_id"] for r in out] == [1]
    r = out[0]
    assert r["n_kgrams"] == len(long_text) - 8 + 1
    assert 0 < len(r["fingerprints"]) < r["n_kgrams"] / 2


def test_polynomial_and_xxhash_paths_agree_on_overlap(spark):
    # Hash family changes values, not structure: both paths must find the
    # planted overlap and the same n_kgrams.
    common = "shared winnowing substring payload"
    rows = [(1, "left pad " + common), (2, common + " right pad")]
    for poly in (False, True):
        fps = winnowing_fingerprints(_docs(spark, rows), k=8, w=4, polynomial=poly)
        got = {r["doc_id"]: set(r["fingerprints"]) for r in fps.collect()}
        assert got[1] & got[2], f"polynomial={poly}"


def test_overlap_pairs_and_max_df(spark):
    common = "the quick brown fox jumps over the lazy dog again"
    rows = [
        (1, "doc one starts here " + common),
        (2, common + " and doc two trails off"),
        (3, "completely different content with no run shared at all ok"),
    ]
    fps = winnowing_fingerprints(_docs(spark, rows), k=8, w=4)
    pairs = fingerprint_overlap_pairs(fps, min_shared=1).collect()
    assert {(r["id_a"], r["id_b"]) for r in pairs} == {(1, 2)}

    # max_df=1 drops every fingerprint present in >1 doc => no pairs.
    none = fingerprint_overlap_pairs(fps, min_shared=1, max_df=1).collect()
    assert none == []


def test_invalid_params(spark):
    with pytest.raises(ValueError):
        winnowing_fingerprints(_docs(spark, [(1, "abc")]), k=0, w=4)
    with pytest.raises(ValueError):
        winnowing_fingerprints(_docs(spark, [(1, "abc")]), k=4, w=0)


def test_rows_path_equals_spec_hashes(spark):
    # The production row-stream pipeline must produce exactly the spec
    # k-gram hash values (kgram_hashes) for both hash families: take
    # the spec array, winnow it in Python, compare with the operator.
    texts = [
        "the quick brown fox jumps over the lazy dog",
        "aaaaaaaaaaaaaaaaaaaa",
        "abcdefghijklmnopqrstuvwxyz0123456789",
    ]
    k, w = 8, 4
    for poly in (False, True):
        df = spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
        )
        spec = {
            r["doc_id"]: r["h"]
            for r in df.select(
                "doc_id", kgram_hashes("text", k, polynomial=poly).alias("h")
            ).collect()
        }
        want = {}
        for i, hs in spec.items():
            mins = {min(hs[j : j + w]) for j in range(len(hs) - w + 1)}
            want[i] = (len(hs), mins)
        got = {}
        for r in winnowing_fingerprints(df, k=k, w=w, polynomial=poly).collect():
            got[r["doc_id"]] = (r["n_kgrams"], set(r["fingerprints"]))
        assert got == want, f"polynomial={poly}"


def test_guarantee_randomized_batch(spark):
    # SIGMOD'03 guarantee over 30 seeded-random document pairs, checked
    # in ONE Spark pass: every pair plants a common substring of length
    # k + w - 1 (the exact guarantee threshold) inside otherwise
    # independent random text; each pair must share >= 1 fingerprint.
    import random

    rng = random.Random(42)
    alpha = "abcdefghijklmnopqrstuvwxyz 0123456789"

    def rand_text(n):
        return "".join(rng.choice(alpha) for _ in range(n))

    k, w = 8, 4
    rows = []
    for p in range(30):
        common = rand_text(k + w - 1)
        rows.append((2 * p, rand_text(rng.randrange(0, 60)) + common + rand_text(rng.randrange(0, 60))))
        rows.append((2 * p + 1, rand_text(rng.randrange(0, 60)) + common + rand_text(rng.randrange(0, 60))))
    fps = winnowing_fingerprints(_docs(spark, rows), k=k, w=w).collect()
    by_id = {r["doc_id"]: set(r["fingerprints"]) for r in fps}
    missing = [
        p for p in range(30) if not (by_id[2 * p] & by_id[2 * p + 1])
    ]
    assert not missing, f"guarantee violated for pairs {missing}"


def test_unicode_codepoint_parity(spark):
    # r4 advice flagged a possible UTF-16-unit vs codepoint divergence
    # between the char-stream path and the DuckDB oracle on non-ASCII
    # text. Pin the intended semantics — CODEPOINTS — on BMP accents,
    # Greek, and astral-plane (non-BMP) symbols: the spec path, the
    # row-stream path, and a Python ord() Horner must all agree
    # (DuckDB's ord(text[i]) replay is codepoint-based by definition;
    # Spark 4.1.2 split/substring/ascii are codepoint-aware and do not
    # split surrogate pairs).
    from xlearning_spark.operators.text import winnowing_fingerprint_rows

    k, w = 5, 3

    def horner(s: str) -> int:
        h = 0
        for c in s:
            h = (h * WINNOW_BASE + ord(c)) % WINNOW_PRIME
        return h

    def winnow(hs: list[int]) -> set[int]:
        return {min(hs[i : i + w]) for i in range(len(hs) - w + 1)}

    texts = [
        "héllo wörld — ünïcode ça va? Ωμέγα test string",
        "\U0001d11e music clef \U0001d11e beyond bmp plane here",  # astral
    ]
    for doc_id, text in enumerate(texts):
        df = _docs(spark, [(doc_id, text)])
        want_h = [horner(text[i : i + k]) for i in range(len(text) - k + 1)]
        got_spec = (
            df.select(kgram_hashes("text", k, polynomial=True).alias("h"))
            .collect()[0]["h"]
        )
        assert got_spec == want_h, f"spec path diverged on {text!r}"
        got_rows = sorted(
            r["fp"]
            for r in winnowing_fingerprint_rows(
                df, k=k, w=w, polynomial=True
            ).collect()
        )
        assert got_rows == sorted(winnow(want_h)), f"row path diverged on {text!r}"
