"""Local replica of the driver's correctness gate.

Runs every registered query's Spark side and DuckDB oracle side on the
same parquet tables, compares row count + column names + an
order-insensitive canonical value hash, and prints a per-query verdict.

Usage: python tools/check_oracle.py [sf_dir] [query_name ...]
"""

from __future__ import annotations

import datetime as _dt
import hashlib
import math
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import duckdb  # noqa: E402

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


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
    return "s:" + str(v)


def df_hash(cols, rows):
    """(n_rows, sorted col names, order-insensitive value hash)."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("|".join(canon(r[i]) for i in order) for r in rows)
    h = hashlib.sha256("\n".join(lines).encode()).hexdigest()[:16]
    return len(rows), [cols[i] for i in order], h


def pandas_rows(pdf):
    import pandas as pd

    rows = []
    for tup in pdf.itertuples(index=False, name=None):
        row = []
        for v in tup:
            if v is not None and hasattr(v, "to_pydatetime"):
                v = v.to_pydatetime()
            elif isinstance(v, float) and math.isnan(v):
                v = None
            elif hasattr(v, "item") and type(v).__module__ == "numpy":
                v = v.item()
            elif type(v).__module__ == "numpy":  # numpy array
                v = [x.item() if hasattr(x, "item") else x for x in v]
            if isinstance(v, _dt.datetime) and v.tzinfo is not None:
                v = v.astimezone(_dt.timezone.utc).replace(tzinfo=None)
            row.append(v)
        rows.append(tuple(row))
    return rows


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as ent
    from xlearning_spark.engine import build_session

    spark = build_session(app_name="check_oracle", master="local[8]")
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    qs, oracles = ent.queries(), ent.oracle_sql()
    n_pass = n_fail = n_err = n_rows_only = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            s_pdf = sdf.toPandas()
            s_n, s_cols, s_h = df_hash(list(s_pdf.columns), pandas_rows(s_pdf))
        except Exception as e:
            print(f"ERROR  {name}: spark side: {type(e).__name__}: {str(e)[:300]}")
            n_err += 1
            continue
        if name not in oracles:
            print(f"ROWS   {name}: rows={s_n} (no oracle, rows-only) [{time.time()-t0:.1f}s]")
            n_rows_only += 1
            continue
        try:
            o_pdf = con.execute(oracles[name]).fetchdf()
            o_n, o_cols, o_h = df_hash(list(o_pdf.columns), pandas_rows(o_pdf))
        except Exception as e:
            print(f"ERROR  {name}: oracle side: {type(e).__name__}: {str(e)[:300]}")
            n_err += 1
            continue
        if s_cols != o_cols:
            print(f"FAIL   {name}: columns {s_cols} != {o_cols}")
            n_fail += 1
        elif s_n != o_n:
            print(f"FAIL   {name}: rows {s_n} != {o_n}")
            n_fail += 1
        elif s_h != o_h:
            print(f"FAIL   {name}: hash {s_h} != {o_h} (rows={s_n})")
            n_fail += 1
        else:
            print(f"PASS   {name}: rows={s_n} [{time.time()-t0:.1f}s]")
            n_pass += 1
    print(f"\n== pass={n_pass} fail={n_fail} err={n_err} rows_only={n_rows_only}")
    return 1 if (n_fail or n_err) else 0


if __name__ == "__main__":
    sys.exit(main())
