"""Projection / filter / predicate operators P1-P6 (SURVEY.md §2b).

Every filter here is expressed declaratively so Catalyst pushes it into the
parquet scan (plan-asserted in tests/test_plans.py) — at 100 TB these become
row-group skips, not post-scan filters.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ez_cdc_spark.queries import register
from ez_cdc_spark.queries._util import date_s, dec, t


@register(
    "p1_projection",
    oracle="""
SELECT l_orderkey, l_linenumber,
       CAST(CAST(l_quantity AS DECIMAL(12,2))
            * CAST(l_extendedprice AS DECIMAL(12,2)) AS DOUBLE) AS amt
FROM lineitem
WHERE l_orderkey <= 500
ORDER BY l_orderkey, l_linenumber
""",
    doc="P1: column projection with computed expression.",
)
def p1_projection(spark, sf_dir):
    return (
        t(spark, sf_dir, "lineitem")
        .filter(F.col("l_orderkey") <= 500)
        .select(
            "l_orderkey",
            "l_linenumber",
            (dec("l_quantity") * dec("l_extendedprice")).cast("double").alias("amt"),
        )
        .orderBy("l_orderkey", "l_linenumber")
    )


@register(
    "p2_filter_boolean",
    oracle="""
SELECT l_orderkey, l_linenumber, l_returnflag, CAST(l_quantity AS DOUBLE) AS qty
FROM lineitem
WHERE (l_quantity > 30 AND l_returnflag = 'R') OR (NOT l_linestatus = 'F' AND l_quantity < 5)
ORDER BY l_orderkey, l_linenumber
""",
    doc="P2: comparison + AND/OR/NOT filters.",
)
def p2_filter_boolean(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem")
    cond = ((F.col("l_quantity") > 30) & (F.col("l_returnflag") == "R")) | (
        (~(F.col("l_linestatus") == "F")) & (F.col("l_quantity") < 5)
    )
    return (
        li.filter(cond)
        .select(
            "l_orderkey",
            "l_linenumber",
            "l_returnflag",
            F.col("l_quantity").cast("double").alias("qty"),
        )
        .orderBy("l_orderkey", "l_linenumber")
    )


@register(
    "p3_in_between_null",
    oracle="""
SELECT o_orderkey, o_orderpriority, strftime(o_orderdate, '%Y-%m-%d') AS odate
FROM orders
WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
  AND o_orderdate BETWEEN TIMESTAMP '1996-01-01 00:00:00' AND TIMESTAMP '1996-12-31 00:00:00'
  AND NULLIF(o_orderstatus, 'X') IS NOT NULL
ORDER BY o_orderkey
""",
    doc="P3: IN / BETWEEN / IS NULL predicates.",
)
def p3_in_between_null(spark, sf_dir):
    o = t(spark, sf_dir, "orders")
    return (
        o.filter(
            F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
            & F.col("o_orderdate").between("1996-01-01", "1996-12-31")
            & F.nullif(F.col("o_orderstatus"), F.lit("X")).isNotNull()
        )
        .select("o_orderkey", "o_orderpriority", date_s("o_orderdate").alias("odate"))
        .orderBy("o_orderkey")
    )


@register(
    "p4_like_regex",
    oracle="""
SELECT p_partkey, p_type, p_name
FROM part
WHERE p_type LIKE '%ECON%' OR regexp_matches(p_name, '^(red|blue).*(bolt|gear)$')
ORDER BY p_partkey
""",
    doc=(
        "P4: LIKE and (portable-subset) regex predicates. r9: predicates "
        "re-declared to hit the fixture domain (p_type in ECONOMY/..., p_name "
        "'<color> <noun>') — the r1 BRASS/[0-9]$ pair matched nothing, so the "
        "driver hash compared two empty sets (vacuous). Each arm now matches "
        "independently at every SF (LIKE: 311 rows, regex: 113 at sf0.01)."
    ),
)
def p4_like_regex(spark, sf_dir):
    p = t(spark, sf_dir, "part")
    return (
        p.filter(F.col("p_type").like("%ECON%") | F.col("p_name").rlike("^(red|blue).*(bolt|gear)$"))
        .select("p_partkey", "p_type", "p_name")
        .orderBy("p_partkey")
    )


@register(
    "p5_case_when",
    oracle="""
SELECT CASE WHEN c_acctbal < 0 THEN 'negative'
            WHEN c_acctbal < 3000 THEN 'low'
            WHEN c_acctbal < 7000 THEN 'mid'
            ELSE 'high' END AS bal_band,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS total_bal
FROM customer
GROUP BY bal_band
ORDER BY bal_band
""",
    doc="P5: CASE WHEN banding histogram.",
)
def p5_case_when(spark, sf_dir):
    c = t(spark, sf_dir, "customer")
    band = (
        F.when(F.col("c_acctbal") < 0, "negative")
        .when(F.col("c_acctbal") < 3000, "low")
        .when(F.col("c_acctbal") < 7000, "mid")
        .otherwise("high")
        .alias("bal_band")
    )
    return (
        c.groupBy(band)
        .agg(
            F.count("*").alias("n"),
            F.sum(dec("c_acctbal")).cast("double").alias("total_bal"),
        )
        .orderBy("bal_band")
    )


@register(
    "p6_null_safe_eq",
    oracle="""
SELECT o_orderkey, o_orderstatus
FROM orders
WHERE NULLIF(o_orderstatus, 'P') IS NOT DISTINCT FROM NULL
ORDER BY o_orderkey
""",
    doc="P6: null-safe equality (<=> / IS NOT DISTINCT FROM).",
)
def p6_null_safe_eq(spark, sf_dir):
    o = t(spark, sf_dir, "orders")
    return (
        o.filter(F.nullif(F.col("o_orderstatus"), F.lit("P")).eqNullSafe(F.lit(None)))
        .select("o_orderkey", "o_orderstatus")
        .orderBy("o_orderkey")
    )


@register(
    "p7_null_semantics",
    oracle="""
WITH c AS (
  SELECT o_orderkey,
         NULLIF(o_orderstatus, 'O') AS status_n,
         NULLIF(o_orderpriority, '3-MEDIUM') AS prio_n
  FROM orders
)
SELECT
  CAST(COUNT(*) AS BIGINT)                                   AS n_rows,
  CAST(COUNT(status_n) AS BIGINT)                            AS n_status_nonnull,
  CAST(SUM(CASE WHEN status_n IS DISTINCT FROM prio_n
            THEN 1 ELSE 0 END) AS BIGINT)                    AS n_distinct_from,
  CAST(SUM(CASE WHEN status_n IS NOT DISTINCT FROM NULL
            THEN 1 ELSE 0 END) AS BIGINT)                    AS n_nullsafe_eq_null,
  CAST(SUM(CASE WHEN status_n = prio_n THEN 1 ELSE 0 END) AS BIGINT)
                                                             AS n_plain_eq,
  CAST(SUM(CASE WHEN COALESCE(status_n, prio_n, 'both-null') = 'both-null'
            THEN 1 ELSE 0 END) AS BIGINT)                    AS n_both_null
FROM c
""",
    doc="P7: three-valued-logic predicate semantics — the NULL corner the "
    "P-family's plain filters never touch, and a classic cross-engine "
    "divergence trap: NULLIF manufactures NULLs from fixture columns, "
    "then one aggregate row pins (a) IS DISTINCT FROM (null-safe "
    "inequality: NULL vs 'x' counts as different, NULL vs NULL does "
    "not), (b) Spark's <=> / eqNullSafe against a literal NULL ↔ "
    "DuckDB's IS NOT DISTINCT FROM NULL, (c) plain `=` whose UNKNOWN "
    "result makes the CASE fall through (the row where a naive "
    "count('x = y') silently drops null pairs — counted here so the "
    "difference n_distinct_from vs n_rows - n_plain_eq IS the "
    "null-pair mass), and (d) COALESCE chain fallback. Pure map-side "
    "single-pass aggregate; nothing but the final 1-row reduction.",
)
def p7_null_semantics(spark, sf_dir):
    o = t(spark, sf_dir, "orders")
    status_n = F.nullif(F.col("o_orderstatus"), F.lit("O"))
    prio_n = F.nullif(F.col("o_orderpriority"), F.lit("3-MEDIUM"))
    c = o.select(status_n.alias("status_n"), prio_n.alias("prio_n"))
    one = lambda cond: F.sum(F.when(cond, 1).otherwise(0)).cast("bigint")
    return c.agg(
        F.count("*").cast("bigint").alias("n_rows"),
        F.count("status_n").cast("bigint").alias("n_status_nonnull"),
        one(~F.col("status_n").eqNullSafe(F.col("prio_n"))).alias("n_distinct_from"),
        one(F.col("status_n").eqNullSafe(F.lit(None).cast("string"))).alias(
            "n_nullsafe_eq_null"
        ),
        one(F.col("status_n") == F.col("prio_n")).alias("n_plain_eq"),
        one(
            F.coalesce(F.col("status_n"), F.col("prio_n"), F.lit("both-null"))
            == "both-null"
        ).alias("n_both_null"),
    )
