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
from urllib.parse import urlparse

from pyspark.sql import DataFrame, SparkSession


def _local_path(uri: str) -> str | None:
    """Filesystem path for a catalog/warehouse URI, or None if non-local.

    urlparse handles the URI forms prefix-stripping got wrong:
    ``file:/x``, ``file:///x`` and bare ``/x`` all yield ``/x``, while
    ``file://host/x`` keeps only the path (the host part is not a local
    directory component) and non-file schemes (s3://, hdfs://) return
    None — there is nothing local to clean up for those.
    """
    p = urlparse(uri)
    if p.scheme not in ("", "file"):
        return None
    return p.path or None


def _catalog_location(spark: SparkSession, table: str) -> str | None:
    """The table's actual location per the catalog, or None if unknown."""
    try:
        for row in spark.sql(f"DESCRIBE TABLE EXTENDED {table}").collect():
            if row[0].strip() == "Location":
                return _local_path(row[1].strip())
    except Exception:
        pass
    return None


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    n_buckets: int = 8,
    sort: bool = True,
    sort_cols: list[str] | None = None,
    one_file_per_bucket: bool = False,
) -> None:
    """Persist ``df`` bucketed (and sorted) by ``bucket_col``.

    Sorting within buckets lets the sort-merge join skip its sort step too
    (plan shows neither Exchange nor Sort above the scans).

    ``sort_cols`` extends the within-bucket sort beyond the bucket key
    (e.g. ``[key, ts, id]`` so a per-key time-ordered Window needs no Sort
    at read time). ``one_file_per_bucket`` repartitions by the bucket
    column before writing so each writer task holds exactly one bucket
    (task hash == bucket hash, both murmur HashPartitioning): Spark only
    trusts a bucketed scan's SORT metadata when every selected bucket is
    a single file — with several files per bucket the per-file runs would
    need a merge the scan node doesn't do (s24's contract; the read side
    must also enable spark.sql.legacy.bucketedTableScan.outputOrdering).

    Drops any stale catalog entry AND its warehouse location first: a
    fresh in-memory catalog over a leftover warehouse dir (previous
    process, same cwd) makes saveAsTable fail with
    LOCATION_ALREADY_EXISTS even in overwrite mode.
    """
    spark = df.sparkSession
    # Resolve the doomed location FROM THE CATALOG while the entry still
    # exists (join(warehouse, name) is wrong for qualified names — db.tbl
    # lives under <wh>/<db>.db/<tbl> — and for custom LOCATIONs); fall
    # back to deriving the default layout only when no entry exists.
    loc = _catalog_location(spark, table) if spark.catalog.tableExists(table) else None
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    if loc is None:
        wh = _local_path(spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse"))
        parts = table.lower().split(".")
        if len(parts) == 1 or parts[0] == "default":
            rel = parts[-1]  # default-db tables sit at the warehouse root
        elif len(parts) == 2:
            rel = os.path.join(f"{parts[0]}.db", parts[1])
        else:
            raise ValueError(f"unsupported table name {table!r} (catalog.db.tbl)")
        loc = os.path.join(wh, rel) if wh else None
    if loc:
        shutil.rmtree(loc, ignore_errors=True)
    if one_file_per_bucket:
        df = df.repartition(n_buckets, bucket_col)
    writer = df.write.mode("overwrite").bucketBy(n_buckets, bucket_col)
    if sort:
        cols = sort_cols if sort_cols else [bucket_col]
        writer = writer.sortBy(*cols)
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
