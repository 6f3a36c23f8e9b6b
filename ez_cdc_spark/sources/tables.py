"""Batch sources: parquet/CSV/JSON scans of the testdata tables (S1-S3).

All scans go through ``spark.read`` so Catalyst gets predicate pushdown and
column pruning for free — tests assert ``PushedFilters`` shows up in plans.
At 100 TB the same code path works: parquet footers prune row groups, and
partitioned layouts (S7) prune whole directories.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from ez_cdc_spark.schemas import TABLE_NAMES
from ez_cdc_spark.session import apply_runtime_conf


def _normalize_timestamps(df: DataFrame) -> DataFrame:
    """Map TIMESTAMP_NTZ columns to TIMESTAMP (session TZ is pinned UTC).

    The testdata generator has shipped timestamps two ways across rounds:
    TIMESTAMP(NANOS) (no Spark type; arrives as long nanos under
    ``spark.sql.legacy.parquet.nanosAsLong``) and TIMESTAMP(MICROS,
    isAdjustedToUTC=false) (arrives as TIMESTAMP_NTZ under Spark 4's
    ``inferTimestampNTZ`` default). Chrono functions like ``unix_micros``
    and streaming watermarks want TIMESTAMP_LTZ, and the DuckDB oracle
    treats the stored wall-clock as naive — identical to interpreting the
    NTZ value in the pinned-UTC session, so this cast is value-preserving
    for every rendered/compared output.
    """
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    casts = {
        f.name: F.col(f.name).cast("timestamp")
        for f in df.schema.fields
        if isinstance(f.dataType, T.TimestampNTZType)
    }
    return df.withColumns(casts) if casts else df


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """S1: parquet scan of one testdata table.

    ``events.ts`` has been TIMESTAMP(NANOS) on disk in some rounds, which
    Spark has no type for; with ``spark.sql.legacy.parquet.nanosAsLong`` it
    arrives as long nanos and is truncated to micros here — the same value
    DuckDB produces reading the file natively.
    """
    apply_runtime_conf(spark)
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        from pyspark.sql import functions as F

        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return _normalize_timestamps(df)


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Load every testdata table present under ``sf_dir``.

    Also pins the determinism-critical runtime confs (UTC session TZ) on the
    caller's session — the correctness driver supplies its own SparkSession.
    """
    apply_runtime_conf(spark)
    out: dict[str, DataFrame] = {}
    for name in TABLE_NAMES:
        path = os.path.join(sf_dir, f"{name}.parquet")
        if os.path.exists(path):
            out[name] = _normalize_timestamps(spark.read.parquet(path))
    return out


def register_views(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Register each table as a temp view so queries can use spark.sql."""
    dfs = load_tables(spark, sf_dir)
    for name, df in dfs.items():
        df.createOrReplaceTempView(name)
    return dfs


def read_csv(spark: SparkSession, path: str, schema) -> DataFrame:
    """S2: schema-declared CSV scan (header row expected)."""
    return spark.read.schema(schema).option("header", "true").csv(path)


def read_jsonl(spark: SparkSession, path: str, schema) -> DataFrame:
    """S3: schema-declared JSON-lines scan (envelope fixtures etc.)."""
    return spark.read.schema(schema).json(path)


def widen_partitions(df: DataFrame, factor: int = 2) -> DataFrame:
    """Round-robin repartition a narrow source up to the cluster parallelism.

    A single-row-group parquet file scans as ONE task no matter how many
    cores exist, so CPU-heavy per-row work downstream (shingling, minhash,
    GEMM scoring, text metrics) serializes on one core. When the source has
    at least ``factor``x fewer partitions than the cluster, pay one narrow
    shuffle of the projected columns to unlock full parallelism. A source
    that is already wide (the 100 TB case: thousands of files) passes
    through untouched.
    """
    target = df.sparkSession.sparkContext.defaultParallelism
    # Estimate source width WITHOUT df.rdd (which forces an RDD conversion
    # and a second analysis pass per call): for the file-scan DataFrames
    # this helper wraps, input file count bounds the scan task count (a
    # single-row-group file scans as one task). Fall back to the RDD path
    # only if the plan has no file sources.
    files = df.inputFiles()
    width = len(files) if files else df.rdd.getNumPartitions()
    if width * factor <= target:
        return df.repartition(target)
    return df
