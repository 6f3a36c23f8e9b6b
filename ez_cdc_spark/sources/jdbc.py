"""S6: JDBC snapshot source wiring (SURVEY.md §2b S6, declared optional).

The reference's upstream table lives in Postgres (`/root/reference/
postgres/init.sql:2-7` creates `customers`; the Debezium connector
snapshots it before streaming). Spark-natively a one-shot snapshot is
`spark.read.jdbc` with partitioned-read options so the scan fans out
across executors instead of funneling through one connection:

  * ``partitionColumn`` / ``lowerBound`` / ``upperBound`` /
    ``numPartitions`` — Spark derives ``numPartitions`` stride predicates
    (`WHERE col >= x AND col < y`) and runs one JDBC query per partition;
  * ``fetchsize`` — rows per network round-trip (driver default is often
    10 and kills throughput);
  * ``pushDownPredicate`` stays on (default) so filters reach the DB.

At 100 TB-adjacent scale the snapshot should come from the warehouse's
bulk path (parquet export, S1) — JDBC parallel read is for bounded
dimension/state tables; cap ``numPartitions`` at what the database can
serve concurrently.

Sandbox honesty: no live Postgres exists in this container, but Spark
ships Derby — so the whole path (populate over JDBC, partitioned
snapshot back, stride queries, pushed predicates) runs END TO END against
an embedded Derby database (tests/test_jdbc_wiring.py, registry query
s6_jdbc_snapshot, hash-checked). Only the URL and driver class differ
from a Postgres deployment; no correctness claim is made for the network
transport itself.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def jdbc_options(
    url: str,
    table: str,
    user: str | None = None,
    password: str | None = None,
    partition_column: str | None = None,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    num_partitions: int | None = None,
    fetchsize: int = 10_000,
    driver: str | None = None,
) -> dict[str, str]:
    """Validated option dict for a (possibly partitioned) JDBC snapshot read.

    ``table`` may be a table name or a pushdown subquery alias
    (``"(SELECT ... ) AS t"``). Partitioned reads require all four of
    partition_column/lower_bound/upper_bound/num_partitions — Spark errors
    at runtime on a partial set, so fail fast here instead.
    """
    if not url.startswith("jdbc:"):
        raise ValueError(f"JDBC url must start with 'jdbc:', got {url!r}")
    part_opts = (partition_column, lower_bound, upper_bound, num_partitions)
    have = [o is not None for o in part_opts]
    if any(have) and not all(have):
        raise ValueError(
            "partitioned JDBC read needs ALL of partition_column, lower_bound, "
            "upper_bound, num_partitions (got a partial set)"
        )
    opts: dict[str, str] = {
        "url": url,
        "dbtable": table,
        "fetchsize": str(fetchsize),
    }
    if all(have):
        if int(num_partitions) < 1:
            raise ValueError("num_partitions must be >= 1")
        if int(lower_bound) >= int(upper_bound):
            raise ValueError("lower_bound must be < upper_bound")
        opts.update(
            partitionColumn=str(partition_column),
            lowerBound=str(lower_bound),
            upperBound=str(upper_bound),
            numPartitions=str(num_partitions),
        )
    if user is not None:
        opts["user"] = user
    if password is not None:
        opts["password"] = password
    if driver is not None:
        opts["driver"] = driver
    return opts


def jdbc_snapshot(spark: SparkSession, **kwargs) -> DataFrame:
    """S6: one-shot snapshot read. kwargs as in :func:`jdbc_options`.

    Returns the lazy DataFrame; the connection happens at action time.
    """
    return spark.read.format("jdbc").options(**jdbc_options(**kwargs)).load()
