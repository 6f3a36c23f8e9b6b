"""Bucketed tables for co-located (shuffle-free) joins (SURVEY.md §4.2).

At 100 TB the dominant cost of a fact-fact join is shuffling both sides on
the key. Writing both tables bucketed by the join key with the same bucket
count makes the join a per-bucket zip: Spark reads matching buckets
side-by-side and sort-merge-joins them with NO Exchange on either side
(verified by plan assertion in tests/test_bucketing.py). This is the
pre-partitioning strategy for repeatedly-joined fact tables — pay the
shuffle once at write time, never again.

Bucketed writes go through the session catalog (``saveAsTable``) because
bucket metadata lives in the table catalog, not in parquet itself; the
local warehouse dir stands in for the production metastore.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    n_buckets: int = 8,
    sort: bool = True,
) -> None:
    """Persist ``df`` bucketed (and sorted) by ``bucket_col``.

    Sorting within buckets lets the sort-merge join skip its sort step too
    (plan shows neither Exchange nor Sort above the scans).

    Drops any stale catalog entry AND its warehouse location first: a
    fresh in-memory catalog over a leftover warehouse dir (previous
    process, same cwd) makes saveAsTable fail with
    LOCATION_ALREADY_EXISTS even in overwrite mode.
    """
    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    wh = spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse")
    for prefix in ("file://", "file:"):
        if wh.startswith(prefix):
            wh = wh[len(prefix):]
            break
    shutil.rmtree(os.path.join(wh, table.lower()), ignore_errors=True)
    writer = df.write.mode("overwrite").bucketBy(n_buckets, bucket_col)
    if sort:
        writer = writer.sortBy(bucket_col)
    writer.format("parquet").saveAsTable(table)


def bucketed_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    on: list[str],
    how: str = "inner",
    force_smj: bool = False,
) -> DataFrame:
    """Join two same-bucketed catalog tables — co-located, no shuffle.

    ``force_smj`` applies the MERGE join hint: at small scale the optimizer
    would broadcast one side (also shuffle-free, but it bypasses the
    bucketed path this operator exists to demonstrate); the hint pins the
    sort-merge strategy WITHOUT mutating session conf, and the bucket
    layout then removes both Exchanges.
    """
    left = spark.table(left_table)
    right = spark.table(right_table)
    if force_smj:
        left, right = left.hint("merge"), right.hint("merge")
    return left.join(right, on, how)
