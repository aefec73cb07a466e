"""Deterministic column helpers shared by the query corpus.

The driver hash-compares Spark results against DuckDB, so every
aggregate over floating-point money/quantity columns goes through
DECIMAL: exact, associative, independent of partial-aggregation order
on either engine. Cast back to DOUBLE at the end (lossless at our
magnitudes) so output schemas stay simple.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dsum(col: str | Column, scale: int = 4) -> Column:
    """Order-independent SUM of a double column via DECIMAL(18,scale)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(f"decimal(18,{scale})")).cast("double")


def davg(col: str | Column, scale: int = 4) -> Column:
    """Order-independent AVG: exact decimal sum, double division."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(f"decimal(18,{scale})")).cast("double") / F.count(c)


def oracle_dsum(expr: str, scale: int = 4) -> str:
    """DuckDB-side twin of :func:`dsum`."""
    return f"CAST(SUM(CAST({expr} AS DECIMAL(18,{scale}))) AS DOUBLE)"


def oracle_davg(expr: str, scale: int = 4) -> str:
    return f"CAST(SUM(CAST({expr} AS DECIMAL(18,{scale}))) AS DOUBLE) / COUNT({expr})"


# --- text-analysis column bundles (SURVEY.md §2.12 L4/L6) ---------------

STOPWORDS = ("the", "a", "an", "and", "or", "of", "to", "in", "is", "on")


def tokens(col: str | Column) -> Column:
    """Whitespace tokenization (matches DuckDB string_split_regex)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.split(c, r"\s+")


def token_count(col: str | Column) -> Column:
    return F.size(tokens(col)).cast("bigint")


def punct_count(col: str | Column) -> Column:
    """Count of characters that are not alphanumeric or whitespace."""
    c = F.col(col) if isinstance(col, str) else col
    return F.length(F.regexp_replace(c, r"[a-zA-Z0-9\s]", "")).cast("bigint")


def stopword_count(col: str | Column) -> Column:
    arr = F.array(*[F.lit(w) for w in STOPWORDS])
    return F.size(F.filter(tokens(col), lambda x: F.array_contains(arr, x))).cast(
        "bigint"
    )


def fingerprint(col: str | Column) -> Column:
    """Order-insensitive document fingerprint: md5 of sorted tokens.

    The classic "fingerprint" key used for shuffled-word near-dup
    detection; identical expression exists in DuckDB
    (md5(array_to_string(list_sort(string_split(...)), ' '))).
    """
    return F.md5(F.concat_ws(" ", F.sort_array(tokens(col))))


def shingles(col: str | Column, n: int = 5) -> Column:
    """Array of n-word shingles (space-joined token windows).

    Docs with fewer than n tokens (or a null token array) yield an
    EMPTY array: ``sequence(1, 0)`` is not empty in Spark (it steps
    downward to [1, 0]), so the short case must short-circuit — the
    same guard with_shingle_hashes applies to the int-hash variant.
    """
    t = tokens(col)
    return F.when(
        F.size(t) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(t) - (n - 1)),
            lambda i: F.concat_ws(" ", F.slice(t, i, n)),
        ),
    ).otherwise(F.array().cast("array<string>"))


def shingle_hash_rows(
    df,
    id_col: str,
    text_col: str,
    n: int = 5,
    mod: int = None,
    pos_col: str = "__pos",
    tok_hash_col: str = "__th",
    out_col: str = "__h",
):
    """``(id, pos, token_hash, shingle_hash)`` rows: posexplode the
    token stream, hash each token once (xxhash64 mod ``mod``), and
    combine the n consecutive token hashes polynomially via ``lead()``
    windows — the ROW-stream twin of :func:`with_shingle_hashes`.

    Zero higher-order functions: every step (generate, hash, lead,
    arithmetic) is whole-stage-codegen'd. This matters because any
    filter or explode DOWNSTREAM of a computed-array column makes
    Catalyst push an inferred predicate below the projection and inline
    the (interpreted) lambda chain into it — re-evaluating the token
    transform per element, O(n_tokens^2) per document. Measured on the
    corpus tier: the array form got SLOWER than string shingles once
    exploded; this form is the one that holds up.

    Cost shape: one keyed shuffle (doc id) for the lead window — at
    100 TB that's a linear, key-partitioned shuffle of slim (id, pos,
    hash) rows, and downstream per-doc aggregations reuse the same key.
    Docs with fewer than n tokens produce no output rows (the lead past
    the end nulls the combine), matching with_shingle_hashes' empty
    array. NULL-text docs produce ZERO rows (posexplode, not _outer:
    xxhash64(NULL) is the non-null seed, so an outer null row would
    count as a phantom token — and at n=1 emit a phantom shingle);
    callers that need a row per doc left-join back from the id side
    (see repetition_stats).
    """
    from pyspark.sql import Window

    if mod is None:
        mod = SHINGLE_MOD_58
    toks = df.select(
        F.col(id_col),
        F.posexplode(tokens(text_col)).alias(pos_col, "__tok"),
    )
    th = toks.select(
        F.col(id_col),
        F.col(pos_col),
        F.pmod(F.xxhash64("__tok"), F.lit(mod)).alias(tok_hash_col),
    )
    w = Window.partitionBy(id_col).orderBy(pos_col)
    acc = F.col(tok_hash_col)
    for j in range(1, n):
        acc = F.pmod(acc * 31 + F.lead(tok_hash_col, j).over(w), F.lit(mod))
    return th.withColumn(out_col, acc)


#: Largest prime below 2^58 — the widest modulus whose polynomial
#: combine step (acc*31 + h, operands < mod) stays under 2^63, i.e.
#: ANSI-overflow-safe on BIGINT. At this width the birthday bound for
#: D distinct shingles is D^2/2^59 colliding pairs (~1.6e-7 at D=300k),
#: so hash-equality == shingle-equality in practice and hashed operators
#: produce byte-identical results to their string-shingle twins.
SHINGLE_MOD_58 = 288230376151711717


def with_shingle_hashes(
    df,
    text_col: str,
    out_col: str = "__h",
    n: int = 5,
    mod: int = (1 << 31) - 1,
):
    """Adds ``out_col``: array of n-gram shingle hashes in [0, mod).

    Hashes each token once (xxhash64) and combines n consecutive token
    hashes polynomially — same identity semantics as hashing the
    space-joined shingle string, but ~9x cheaper at scan time: no
    per-shingle string is ever built. The token-hash array is
    materialized in its own projection first; inlining it into the
    combine lambda would re-evaluate the tokenize+hash per shingle per
    offset (measured 10x slower). Operands stay below 2^31 before the
    multiply, so the expression is ANSI-overflow-safe.
    """
    tmp = f"__{out_col}_th"
    acc = f"{tmp}[i-1]"
    for j in range(1, n):
        acc = f"pmod({acc}*31 + {tmp}[i-1+{j}], {mod}L)"
    # sequence(1, 0) is NOT empty (it steps downward to [1, 0]), so a
    # doc with < n tokens must short-circuit to an empty array — the
    # guarded branch also absorbs null token arrays (size = -1).
    combine = (
        f"CASE WHEN size({tmp}) >= {n} "
        f"THEN transform(sequence(1, size({tmp}) - {n - 1}), i -> {acc}) "
        f"ELSE cast(array() as array<bigint>) END"
    )
    return (
        df.withColumn(
            tmp, F.transform(tokens(text_col), lambda x: F.pmod(F.xxhash64(x), F.lit(mod)))
        )
        .withColumn(out_col, F.expr(combine))
        .drop(tmp)
    )
