"""Bucketed co-located joins: same results, no Exchange in the plan."""

from pyspark.sql import functions as F

from ez_cdc_spark.plans.assertions import plan_str
from ez_cdc_spark.sources.bucketing import bucketed_join, write_bucketed
from ez_cdc_spark.sources.tables import load_table


def test_bucketed_join_no_shuffle_and_same_result(spark, sf_smoke):
    li = load_table(spark, sf_smoke, "lineitem").select("l_orderkey", "l_quantity")
    o = load_table(spark, sf_smoke, "orders").select("o_orderkey", "o_orderpriority")
    write_bucketed(li, "b_lineitem", "l_orderkey", n_buckets=8)
    write_bucketed(
        o.withColumnRenamed("o_orderkey", "l_orderkey"), "b_orders", "l_orderkey", 8
    )
    threshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        # at smoke scale the dim is broadcastable, which would bypass the
        # bucketed path entirely; force SMJ to prove the co-location claim
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = bucketed_join(spark, "b_lineitem", "b_orders", ["l_orderkey"])
        p = plan_str(joined)
        assert "SortMergeJoin" in p, p[:2000]
        assert "Exchange hashpartitioning" not in p and "ShuffleExchange" not in p, (
            f"bucketed join still shuffles:\n{p[:2000]}"
        )

        # results identical to the plain (shuffling) join
        plain = li.join(
            o.withColumnRenamed("o_orderkey", "l_orderkey"), ["l_orderkey"]
        )
        agg = lambda df: sorted(
            map(
                tuple,
                df.groupBy("o_orderpriority")
                .agg(F.count("*").alias("n"), F.sum("l_quantity").alias("q"))
                .collect(),
            )
        )
        assert agg(joined) == agg(plain)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", threshold)
        spark.sql("DROP TABLE IF EXISTS b_lineitem")
        spark.sql("DROP TABLE IF EXISTS b_orders")


def test_bucketed_scan_reports_buckets(spark, sf_smoke):
    li = load_table(spark, sf_smoke, "lineitem").select("l_orderkey", "l_quantity")
    write_bucketed(li, "b_li_meta", "l_orderkey", n_buckets=4)
    try:
        p = plan_str(spark.table("b_li_meta").filter(F.col("l_orderkey") > 0))
        assert "Bucketed: true" in p or "SelectedBucketsCount" in p or "bucket" in p.lower()
    finally:
        spark.sql("DROP TABLE IF EXISTS b_li_meta")


def test_analyze_table_feeds_cbo_stats(spark, sf_smoke):
    from ez_cdc_spark.sources.stats import (
        analyze_table,
        enable_cbo,
        table_row_count_stat,
    )
    from ez_cdc_spark.sources.tables import load_table

    import shutil

    # a stale warehouse dir without a catalog entry (fresh in-memory catalog,
    # leftover location from a previous session) breaks saveAsTable
    spark.sql("DROP TABLE IF EXISTS stats_nation")
    shutil.rmtree("spark-warehouse/stats_nation", ignore_errors=True)
    n = load_table(spark, sf_smoke, "nation")
    n.write.mode("overwrite").format("parquet").saveAsTable("stats_nation")
    try:
        assert table_row_count_stat(spark, "stats_nation") is None
        enable_cbo(spark)
        analyze_table(spark, "stats_nation", columns=["n_nationkey", "n_regionkey"])
        assert table_row_count_stat(spark, "stats_nation") == n.count()
    finally:
        spark.sql("DROP TABLE IF EXISTS stats_nation")


def test_write_bucketed_qualified_name_rewrite(spark):
    """Qualified db.tbl names live under <wh>/<db>.db/<tbl>; the stale-
    location cleanup must resolve that via the catalog, so back-to-back
    overwrites of a qualified bucketed table succeed (the old
    join(warehouse, name) derivation missed the .db segment and the
    second write died on LOCATION_ALREADY_EXISTS)."""
    df = spark.createDataFrame([(1, "a"), (2, "b")], "k INT, v STRING")
    spark.sql("CREATE DATABASE IF NOT EXISTS bdb")
    try:
        write_bucketed(df, "bdb.bq_tbl", "k", n_buckets=2)
        write_bucketed(df, "bdb.bq_tbl", "k", n_buckets=2)  # rewrite over stale dir
        assert spark.table("bdb.bq_tbl").count() == 2
    finally:
        spark.sql("DROP TABLE IF EXISTS bdb.bq_tbl")
        spark.sql("DROP DATABASE IF EXISTS bdb")
