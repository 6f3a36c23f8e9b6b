"""S43: the ezmanifest Python DataSource.

Pins the s43 docstring's surfaces: format reads equal read_committed,
time travel and branch heads as reader options, SQL via USING,
partition-column reconstruction at the stored type, additive-evolution
NULL-fill, and the MOR / epoch refusals.
"""

import os
import shutil

import pytest
from pyspark.sql.types import LongType, StructField

from ez_cdc_spark.sources.manifest import (
    create_branch,
    evolve_schema,
    merge_mor,
    publish,
    publish_append,
    publish_partitioned,
    read_committed,
    rename_column,
)
from ez_cdc_spark.sources.pyds import register_ezmanifest

SCRATCH = "/tmp/ez_cdc_test_pyds_manifest"


def _fmt(spark, d, **opts):
    register_ezmanifest(spark)
    r = spark.read.format("ezmanifest").option("path", d)
    for k, v in opts.items():
        r = r.option(k, v)
    return r.load()


def _table(spark, name, n=100):
    d = os.path.join(SCRATCH, name)
    shutil.rmtree(d, ignore_errors=True)
    publish(spark.range(n).selectExpr("id AS k", "id*2 AS v"), d, 1)
    return d


def test_format_read_equals_read_committed_and_travels(spark):
    d = _table(spark, "basic")
    publish_append(spark.range(100, 150).selectExpr("id AS k", "id*2 AS v"), d, 2)
    got = sorted((r["k"], r["v"]) for r in _fmt(spark, d).collect())
    want = sorted((r["k"], r["v"]) for r in read_committed(spark, d).collect())
    assert got == want and len(got) == 150
    assert _fmt(spark, d, generation=1).count() == 100
    create_branch(d, "b")
    publish_append(
        spark.range(150, 160).selectExpr("id AS k", "id*2 AS v"), d, 3, ref="b"
    )
    assert _fmt(spark, d, ref="b").count() == 160
    assert _fmt(spark, d).count() == 150  # main untouched


def test_sql_using_surface(spark):
    d = _table(spark, "sql")
    register_ezmanifest(spark)
    spark.sql(
        f"CREATE OR REPLACE TEMPORARY VIEW ezm_sql_lake "
        f"USING ezmanifest OPTIONS (path '{d}')"
    )
    row = spark.sql(
        "SELECT COUNT(*) AS n, SUM(v) AS s FROM ezm_sql_lake"
    ).first()
    assert (row["n"], row["s"]) == (100, 9900)


def test_partition_reconstruction_at_stored_type(spark):
    d = os.path.join(SCRATCH, "part")
    shutil.rmtree(d, ignore_errors=True)
    publish_partitioned(
        spark.range(60).selectExpr("id AS k", "CAST(id % 3 AS STRING) AS p"),
        d,
        1,
        partition_col="p",
    )
    r = _fmt(spark, d)
    assert dict(r.dtypes)["p"] == "string"
    assert sorted((x["p"], x["count"]) for x in r.groupBy("p").count().collect()) == [
        ("0", 20), ("1", 20), ("2", 20),
    ]


def test_additive_evolution_null_fills(spark):
    d = _table(spark, "evolve")
    evolve_schema(d, 2, [StructField("w", LongType(), True)])
    publish_append(
        spark.range(100, 105).selectExpr("id AS k", "id*2 AS v", "id*9 AS w"), d, 3
    )
    r = _fmt(spark, d)
    assert r.filter("w IS NULL").count() == 100
    assert r.filter("w IS NOT NULL AND w <> k * 9").count() == 0


def test_refusals(spark):
    d = _table(spark, "morrefuse")
    merge_mor(
        spark,
        d,
        spark.range(3).selectExpr("id AS k", "id*9 AS v", "'u' AS op", "1 AS seq"),
        key_col="k",
        generation=2,
    )
    with pytest.raises(Exception, match="merge-on-read"):
        _fmt(spark, d).count()
    d2 = _table(spark, "epochrefuse")
    rename_column(d2, 2, "v", "val")
    with pytest.raises(Exception, match="epoch"):
        _fmt(spark, d2).count()
    with pytest.raises(Exception, match="path"):
        register_ezmanifest(spark)
        spark.read.format("ezmanifest").load().count()


def test_stats_pushdown_prunes_splits(spark):
    """S28 file skipping THROUGH the DataSource API: a predicate on a
    stats column drops whole splits at planning (rdd.getNumPartitions is
    the witness — one split per kept file), results stay exact (every
    filter is handed back to Spark), and columns without stats keep
    everything — conservative, never wrong."""
    d = os.path.join(SCRATCH, "pushdown")
    shutil.rmtree(d, ignore_errors=True)
    publish(
        spark.range(1000)
        .selectExpr("id AS k", "id*2 AS v")
        .repartitionByRange(10, "k")
        .sortWithinPartitions("k"),
        d,
        1,
        stats_columns=["k"],
    )
    register_ezmanifest(spark)
    r = spark.read.format("ezmanifest").option("path", d).load()
    assert r.rdd.getNumPartitions() == 10
    ranged = r.filter("k >= 850 AND k < 900")
    assert ranged.rdd.getNumPartitions() < 10
    assert ranged.count() == 50
    point = r.filter("k = 123")
    assert point.rdd.getNumPartitions() == 1
    assert [(x["k"], x["v"]) for x in point.collect()] == [(123, 246)]
    # no stats on v: every split kept, result still exact
    nostats = r.filter("v >= 1900")
    assert nostats.rdd.getNumPartitions() == 10
    assert nostats.count() == 50
