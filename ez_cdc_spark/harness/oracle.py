"""DuckDB differential-test harness (SURVEY.md §5.2 t2).

Mirrors the driver's check: run the Spark query and the oracle SQL on the
same parquet tables, then compare row count, column names, and an
order-insensitive canonical value hash. Used by tests/ so every operator is
proven locally before the driver sees it.
"""

from __future__ import annotations

import hashlib
import math
import os
from datetime import date, datetime
from decimal import Decimal

import duckdb

from ez_cdc_spark.schemas import TABLE_NAMES


def run_oracle(sql: str, sf_dir: str):
    """Run oracle SQL in a fresh DuckDB with the testdata views registered."""
    con = duckdb.connect()
    try:
        con.execute("SET TimeZone='UTC'")
        for name in TABLE_NAMES:
            path = os.path.join(sf_dir, f"{name}.parquet")
            if os.path.exists(path):
                con.execute(
                    f"CREATE OR REPLACE VIEW {name} AS SELECT * FROM read_parquet('{path}')"
                )
        return con.execute(sql).fetchall(), [d[0] for d in con.description]
    finally:
        con.close()


def _canon(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    if isinstance(v, Decimal):
        return str(v.normalize()) if v != 0 else "0"
    if isinstance(v, datetime):
        return v.isoformat()
    if isinstance(v, date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_canon(x) for x in v) + "]"
    if isinstance(v, bytes):
        return v.hex()
    return str(v)


def canonical_hash(rows, cols) -> str:
    """Order-insensitive hash: sort columns by name, canonicalize values,
    sort row strings, sha256."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("\x1f".join(_canon(r[i]) for i in order) for r in rows)
    return hashlib.sha256("\x1e".join(lines).encode()).hexdigest()


def compare_query(spark, name: str, sf_dir: str):
    """Run registry query `name` on Spark and DuckDB; return (ok, detail)."""
    from ez_cdc_spark.queries import load_all

    spec = load_all()[name]
    sdf = spec.fn(spark, sf_dir)
    s_rows = [tuple(r) for r in sdf.collect()]
    s_cols = sdf.columns
    if spec.oracle is None:
        return len(s_rows) >= 0, {"rows": len(s_rows), "mode": "rows-only"}
    d_rows, d_cols = run_oracle(spec.oracle, sf_dir)
    detail = {
        "spark_rows": len(s_rows),
        "duck_rows": len(d_rows),
        "spark_cols": sorted(s_cols),
        "duck_cols": sorted(d_cols),
    }
    if len(s_rows) != len(d_rows) or sorted(s_cols) != sorted(d_cols):
        return False, detail
    sh = canonical_hash(s_rows, s_cols)
    dh = canonical_hash(d_rows, d_cols)
    detail["spark_hash"] = sh
    detail["duck_hash"] = dh
    return sh == dh, detail
