"""Sort / limit / set operators O1-O5 (SURVEY.md §2b).

O1/O2 use Spark's range-partitioned global sort (sampled boundaries →
parallel sort, no single-task bottleneck at scale). Limit after orderBy is a
TakeOrderedAndProject — top-k without materializing the full sort.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ez_cdc_spark.queries import register
from ez_cdc_spark.queries._util import date_s, t


@register(
    "o1_global_sort",
    oracle="""
SELECT o_orderkey, o_orderstatus, strftime(o_orderdate, '%Y-%m-%d') AS odate,
       CAST(o_totalprice AS DOUBLE) AS totalprice
FROM orders
ORDER BY o_orderstatus DESC NULLS LAST, o_orderdate ASC NULLS FIRST, o_orderkey
""",
    doc="O1: global multi-key sort, asc/desc + nulls placement.",
)
def o1_global_sort(spark, sf_dir):
    o = t(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        "o_orderstatus",
        date_s("o_orderdate").alias("odate"),
        F.col("o_totalprice").cast("double").alias("totalprice"),
    ).orderBy(
        F.desc_nulls_last("o_orderstatus"),
        F.asc_nulls_first("odate"),
        F.asc("o_orderkey"),
    )


@register(
    "o2_limit_topk",
    oracle="""
SELECT o_orderkey, CAST(o_totalprice AS DOUBLE) AS totalprice
FROM orders
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 10
""",
    doc="O2: top-k via orderBy+limit (TakeOrderedAndProject), key tie-break.",
)
def o2_limit_topk(spark, sf_dir):
    o = t(spark, sf_dir, "orders")
    return (
        o.select("o_orderkey", F.col("o_totalprice").cast("double").alias("totalprice"))
        .orderBy(F.desc("totalprice"), F.asc("o_orderkey"))
        .limit(10)
    )


@register(
    "o3_union",
    oracle="""
WITH pre AS (SELECT l_orderkey, l_partkey FROM lineitem WHERE year(l_shipdate) < 1998),
     post AS (SELECT l_orderkey, l_partkey FROM lineitem WHERE year(l_shipdate) >= 1998)
SELECT 'all' AS which, CAST(COUNT(*) AS BIGINT) AS n
FROM (SELECT * FROM pre UNION ALL SELECT * FROM post)
UNION ALL
SELECT 'distinct' AS which, CAST(COUNT(*) AS BIGINT) AS n
FROM (SELECT * FROM pre UNION SELECT * FROM post)
ORDER BY which
""",
    doc="O3: unionByName all vs distinct, split/reunite round-trip.",
)
def o3_union(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem")
    pre = li.filter(F.year("l_shipdate") < 1998).select("l_orderkey", "l_partkey")
    post = li.filter(F.year("l_shipdate") >= 1998).select("l_orderkey", "l_partkey")
    all_cnt = pre.unionByName(post).agg(F.count("*").alias("n")).select(
        F.lit("all").alias("which"), "n"
    )
    dist_cnt = (
        pre.unionByName(post).distinct().agg(F.count("*").alias("n")).select(
            F.lit("distinct").alias("which"), "n"
        )
    )
    return all_cnt.unionByName(dist_cnt).orderBy("which")


@register(
    "o4_intersect_except",
    oracle="""
SELECT 'intersect' AS which, CAST(COUNT(*) AS BIGINT) AS n FROM (
    SELECT c_custkey AS k FROM customer
    INTERSECT
    SELECT o_custkey AS k FROM orders)
UNION ALL
SELECT 'except' AS which, CAST(COUNT(*) AS BIGINT) AS n FROM (
    SELECT c_custkey AS k FROM customer
    EXCEPT
    SELECT o_custkey AS k FROM orders)
UNION ALL
SELECT 'except_all' AS which, CAST(COUNT(*) AS BIGINT) AS n FROM (
    SELECT o_custkey AS k FROM orders
    EXCEPT ALL
    SELECT c_custkey AS k FROM customer)
ORDER BY which
""",
    doc="O4: intersect / except / exceptAll cardinalities.",
)
def o4_intersect_except(spark, sf_dir):
    c = t(spark, sf_dir, "customer").select(F.col("c_custkey").alias("k"))
    o = t(spark, sf_dir, "orders").select(F.col("o_custkey").alias("k"))
    rows = [
        c.intersect(o).agg(F.count("*").alias("n")).select(F.lit("intersect").alias("which"), "n"),
        # subtract == SQL set EXCEPT by construction (not by key uniqueness)
        c.subtract(o).agg(F.count("*").alias("n")).select(
            F.lit("except").alias("which"), "n"
        ),
        o.exceptAll(c).agg(F.count("*").alias("n")).select(
            F.lit("except_all").alias("which"), "n"
        ),
    ]
    out = rows[0]
    for r in rows[1:]:
        out = out.unionByName(r)
    return out.orderBy("which")


@register(
    "o5_dedup_deterministic",
    oracle="""
SELECT o_custkey, o_orderstatus,
       CAST(MIN(o_orderkey) AS BIGINT) AS first_orderkey,
       CAST(MIN(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS min_price
FROM orders
GROUP BY o_custkey, o_orderstatus
ORDER BY o_custkey, o_orderstatus
""",
    doc="O5: dropDuplicates declared in deterministic groupBy/min form (SURVEY §5.3).",
)
def o5_dedup_deterministic(spark, sf_dir):
    o = t(spark, sf_dir, "orders")
    return (
        o.groupBy("o_custkey", "o_orderstatus")
        .agg(
            F.min("o_orderkey").alias("first_orderkey"),
            F.min(F.col("o_totalprice").cast("decimal(12,2)")).cast("double").alias("min_price"),
        )
        .orderBy("o_custkey", "o_orderstatus")
    )


@register(
    "o2b_limit_offset",
    oracle="""
SELECT o_orderkey, CAST(o_totalprice AS DOUBLE) AS totalprice
FROM orders
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 10 OFFSET 20
""",
    doc="O2b: pagination — orderBy + offset + limit (rows 21-30 of the "
    "price ranking, total order via key tie-break).",
)
def o2b_limit_offset(spark, sf_dir):
    o = t(spark, sf_dir, "orders")
    return (
        o.select("o_orderkey", F.col("o_totalprice").cast("double").alias("totalprice"))
        .orderBy(F.desc("totalprice"), F.asc("o_orderkey"))
        .offset(20)
        .limit(10)
    )


@register(
    "o6_intersect_all_bag",
    oracle="""
SELECT k, CAST(COUNT(*) AS BIGINT) AS n FROM (
    SELECT o_custkey AS k FROM orders
    WHERE o_orderdate BETWEEN '1995-01-01' AND '1995-12-31'
    INTERSECT ALL
    SELECT o_custkey AS k FROM orders
    WHERE o_orderdate BETWEEN '1996-01-01' AND '1996-12-31')
GROUP BY k
ORDER BY k
""",
    doc="O6: INTERSECT ALL — BAG semantics (o4's exceptAll twin, the one "
    "multiset op the o-family still lacked): each customer's 1995 order "
    "multiset intersected with their 1996 one keeps min(multiplicity) "
    "copies per key — 'how many orders did the customer sustain "
    "year-over-year', which set INTERSECT (one row per key) cannot "
    "express. Verified at ROW level (per-key surviving multiplicities), "
    "not just cardinality. Spark's intersectAll plans the same shape a "
    "hand-written version would: per-side count aggregates joined on "
    "key with a generate of least(n_a, n_b) — one exchange per side, "
    "key-partitioned, no data-row window; the group-count on top folds "
    "the generated rows straight back (Catalyst eliminates nothing "
    "surprising; asserted cartesian-free).",
)
def o6_intersect_all_bag(spark, sf_dir):
    o = t(spark, sf_dir, "orders")
    y95 = o.filter(F.col("o_orderdate").between("1995-01-01", "1995-12-31")).select(
        F.col("o_custkey").alias("k")
    )
    y96 = o.filter(F.col("o_orderdate").between("1996-01-01", "1996-12-31")).select(
        F.col("o_custkey").alias("k")
    )
    return (
        y95.intersectAll(y96)
        .groupBy("k")
        .agg(F.count("*").cast("bigint").alias("n"))
        .orderBy("k")
    )
