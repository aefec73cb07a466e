"""Shared correctness-compare helpers (the local replica of the
driver's oracle gate): canonical value encoding, order-insensitive
hashing, and a Spark-vs-DuckDB compare used by tools/check_oracle.py
and the pytest suite."""

from __future__ import annotations

import datetime as _dt
import hashlib
import math
import os

try:
    import numpy as _np
except ImportError:  # pragma: no cover - numpy is baked into the env
    _np = None


def canon(v) -> str:
    """Canonical, type-tagged string for one value."""
    if v is None:
        return "∅"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        # 12 significant digits: exact for decimal-disciplined sums,
        # tolerant of engine-order float noise.
        return f"f:{v:.12g}"
    if isinstance(v, int):
        return f"i:{v}"
    if isinstance(v, _dt.datetime):
        return "t:" + v.replace(tzinfo=None).isoformat(timespec="microseconds")
    if isinstance(v, _dt.date):
        return "d:" + v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(canon(x) for x in v) + "]"
    if isinstance(v, bytes):
        return "b:" + v.hex()
    # Escape the delimiters the hasher joins with ('|' between columns,
    # '\n' between rows, ',' and brackets inside lists): without this,
    # values containing a delimiter can collide across column/row
    # boundaries and hash a wrong result as equal.
    s = str(v)
    for ch in ("\\", "|", "\n", ",", "[", "]"):
        s = s.replace(ch, "\\" + ch)
    return "s:" + s


def df_hash(cols, rows):
    """(n_rows, sorted col names, order-insensitive value hash)."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("|".join(canon(r[i]) for i in order) for r in rows)
    h = hashlib.sha256("\n".join(lines).encode()).hexdigest()[:16]
    return len(rows), [cols[i] for i in order], h


def pandas_rows(pdf):
    """Normalize a pandas frame to plain-python row tuples."""
    rows = []
    for tup in pdf.itertuples(index=False, name=None):
        row = []
        for v in tup:
            if v is not None and hasattr(v, "to_pydatetime"):
                v = v.to_pydatetime()
            elif isinstance(v, float) and math.isnan(v):
                v = None
            elif _np is not None and isinstance(v, _np.ndarray):
                # Must precede the scalar branch: ndarray also has
                # .item, which throws on size > 1.
                v = [x.item() if hasattr(x, "item") else x for x in v]
            elif hasattr(v, "item") and type(v).__module__ == "numpy":
                v = v.item()
            if isinstance(v, _dt.datetime) and v.tzinfo is not None:
                v = v.astimezone(_dt.timezone.utc).replace(tzinfo=None)
            row.append(v)
        rows.append(tuple(row))
    return rows


def duckdb_con(sf_dir: str):
    """DuckDB connection with the canonical tables as views."""
    import duckdb

    from xlearning_spark.sources import TABLES

    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    return con


def compare_query_record(spark, con, spec, sf_dir: str) -> dict:
    """Run one QuerySpec on both engines; returns the driver's
    CORRECTNESS_r{N}.json record shape (rows/schema/hash match booleans,
    row counts, err)."""
    rec: dict = {
        "rows_match": None,
        "schema_match": None,
        "hash_match": None,
        "spark_rows": None,
        "oracle_rows": None,
        "err": None,
    }
    s_pdf = spec.spark(spark, sf_dir).toPandas()
    s_n, s_cols, s_h = df_hash(list(s_pdf.columns), pandas_rows(s_pdf))
    rec["spark_rows"] = s_n
    if spec.oracle is None:
        rec["err"] = "no_oracle"
        return rec
    o_pdf = con.execute(spec.oracle).fetchdf()
    o_n, o_cols, o_h = df_hash(list(o_pdf.columns), pandas_rows(o_pdf))
    rec["oracle_rows"] = o_n
    rec["rows_match"] = s_n == o_n
    rec["schema_match"] = s_cols == o_cols
    rec["hash_match"] = s_h == o_h
    return rec


def compare_query(spark, con, spec, sf_dir: str) -> tuple[bool, str]:
    """Run one QuerySpec on both engines; (ok, detail)."""
    rec = compare_query_record(spark, con, spec, sf_dir)
    if rec["err"] == "no_oracle":
        return True, f"rows-only rows={rec['spark_rows']}"
    if not rec["schema_match"]:
        return False, "column mismatch (aliases must agree on both sides)"
    if not rec["rows_match"]:
        return False, f"rows {rec['spark_rows']} != {rec['oracle_rows']}"
    if not rec["hash_match"]:
        return False, f"value hash mismatch (rows={rec['spark_rows']})"
    return True, f"rows={rec['spark_rows']}"
