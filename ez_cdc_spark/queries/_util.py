"""Shared helpers for declared queries (determinism rules of SURVEY.md §5.3).

Parity strategy with the DuckDB oracle, in order of preference:
  1. strings / bigints — trivially canonical;
  2. exact decimal arithmetic (monetary doubles cast to DECIMAL(12,2) first)
     CAST to DOUBLE at the end — the same exact rational rounds to the same
     nearest IEEE double in both engines, so no ROUND needed;
  3. derived doubles only via operations that are bit-deterministic given
     identical inputs (single IEEE division of a decimal-exact sum by a
     count);
  4. genuinely float results (stddev/corr, cosine) → ROUND(.., 4) and accept
     the boundary risk (fixture seed fixed, SURVEY §5.3).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ez_cdc_spark.sources.tables import load_table
from ez_cdc_spark.session import apply_runtime_conf

DEC = "decimal(12,2)"


def t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    apply_runtime_conf(spark)
    return load_table(spark, sf_dir, name)


def dec(c) -> Column:
    """Monetary double → exact DECIMAL(12,2)."""
    col = F.col(c) if isinstance(c, str) else c
    return col.cast(DEC)


def dsum(c) -> Column:
    """Exact decimal SUM rendered as DOUBLE (deterministic, no rounding)."""
    return F.sum(dec(c)).cast("double")


def date_s(c) -> Column:
    """Timestamp → 'yyyy-MM-dd' string (session TZ pinned UTC)."""
    col = F.col(c) if isinstance(c, str) else c
    return F.date_format(col, "yyyy-MM-dd")


# DuckDB-side equivalents used inside oracle SQL strings
def o_dec(c: str) -> str:
    return f"CAST({c} AS DECIMAL(12,2))"


def o_dsum(c: str) -> str:
    return f"CAST(SUM(CAST({c} AS DECIMAL(12,2))) AS DOUBLE)"


def o_date_s(c: str) -> str:
    return f"strftime({c}, '%Y-%m-%d')"
