"""S6 JDBC snapshot wiring: option plumbing only — no live database exists
in this sandbox (documented in ez_cdc_spark/sources/jdbc.py), so these tests
pin the validated option contract Spark's JDBC relation consumes."""

import pytest

from ez_cdc_spark.sources.jdbc import jdbc_options


def test_partitioned_options_complete():
    opts = jdbc_options(
        url="jdbc:postgresql://db:5432/cdctest",
        table="customers",
        user="u",
        password="p",
        partition_column="id",
        lower_bound=0,
        upper_bound=100_000,
        num_partitions=16,
        fetchsize=5_000,
    )
    assert opts == {
        "url": "jdbc:postgresql://db:5432/cdctest",
        "dbtable": "customers",
        "fetchsize": "5000",
        "partitionColumn": "id",
        "lowerBound": "0",
        "upperBound": "100000",
        "numPartitions": "16",
        "user": "u",
        "password": "p",
    }


def test_unpartitioned_minimal():
    opts = jdbc_options(url="jdbc:postgresql://db/x", table="(SELECT 1) AS t")
    assert opts == {
        "url": "jdbc:postgresql://db/x",
        "dbtable": "(SELECT 1) AS t",
        "fetchsize": "10000",
    }


@pytest.mark.parametrize(
    "kw",
    [
        {"partition_column": "id"},  # partial partition spec
        {"partition_column": "id", "lower_bound": 0, "upper_bound": 10},
        {"partition_column": "id", "lower_bound": 5, "upper_bound": 5, "num_partitions": 4},
        {"partition_column": "id", "lower_bound": 0, "upper_bound": 10, "num_partitions": 0},
    ],
)
def test_invalid_partition_specs_fail_fast(kw):
    with pytest.raises(ValueError):
        jdbc_options(url="jdbc:postgresql://db/x", table="t", **kw)


def test_non_jdbc_url_rejected():
    with pytest.raises(ValueError):
        jdbc_options(url="postgresql://db/x", table="t")


def test_reader_builds_lazily(spark):
    """format('jdbc').options(...) must build without connecting (load() is
    the first network touch); asserts the plumbing path itself is sound."""
    reader = spark.read.format("jdbc").options(
        **jdbc_options(url="jdbc:postgresql://nowhere:1/db", table="t")
    )
    assert reader is not None


def test_jdbc_end_to_end_against_embedded_derby(spark, tmp_path):
    """S6 behavior test: Spark ships Derby, so the snapshot path runs for
    real — write a table over JDBC, read it back through jdbc_snapshot's
    partitioned read, and check exact row parity, the partition fan-out,
    and that filters reach the JDBC source as pushed predicates."""
    from pyspark.sql import functions as F

    from ez_cdc_spark.sources.jdbc import jdbc_snapshot

    url = f"jdbc:derby:{tmp_path}/db;create=true"
    driver = "org.apache.derby.jdbc.EmbeddedDriver"
    src = spark.range(0, 500).select(
        F.col("id").alias("k"), (F.col("id") * 3 % 97).alias("v")
    )
    src.write.format("jdbc").option("url", url).option("dbtable", "t").option(
        "driver", driver
    ).mode("overwrite").save()

    snap = jdbc_snapshot(
        spark,
        url=url,
        table="t",
        partition_column="k",
        lower_bound=0,
        upper_bound=500,
        num_partitions=4,
        driver=driver,
    )
    assert snap.rdd.getNumPartitions() == 4  # one stride query per partition
    assert sorted(map(tuple, snap.collect())) == sorted(map(tuple, src.collect()))

    plan = (
        snap.filter(F.col("k") < 10)._jdf.queryExecution().executedPlan().toString()
    )
    assert "PushedFilters" in plan and "LessThan" in plan  # predicate reaches the DB
