"""Aggregation operators A1-A10 (SURVEY.md §2b).

All grouped aggregates are plain ``groupBy().agg`` — Catalyst plans them as
HashAggregate with a map-side partial, so at 100 TB the shuffle carries one
row per (partition × group), not per input row. Never ``collect`` inside.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ez_cdc_spark.queries import register
from ez_cdc_spark.queries._util import date_s, dec, dsum, o_dsum, t


@register(
    "a1_pricing_summary",
    oracle="""
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE)           AS sum_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE)      AS sum_base_price,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                * (1 - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE)   AS sum_disc_price,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                * (1 - CAST(l_discount AS DECIMAL(12,2)))
                * (1 + CAST(l_tax AS DECIMAL(12,2)))) AS DOUBLE)        AS sum_charge,
       CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*)      AS avg_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_price,
       CAST(COUNT(*) AS BIGINT) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
""",
    doc="A1 flagship: TPC-H Q1-style pricing summary (scan→filter→agg→sort).",
)
def a1_pricing_summary(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp")
    )
    disc_price = dec("l_extendedprice") * (F.lit(1) - dec("l_discount"))
    charge = disc_price * (F.lit(1) + dec("l_tax"))
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity").alias("sum_qty"),
            dsum("l_extendedprice").alias("sum_base_price"),
            F.sum(disc_price).cast("double").alias("sum_disc_price"),
            F.sum(charge).cast("double").alias("sum_charge"),
            (dsum("l_quantity") / F.count("*")).alias("avg_qty"),
            (dsum("l_extendedprice") / F.count("*")).alias("avg_price"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@register(
    "a2_global_agg",
    oracle="""
SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS total_price,
       CAST(MIN(l_orderkey) AS BIGINT) AS min_ok,
       CAST(MAX(l_orderkey) AS BIGINT) AS max_ok
FROM lineitem
""",
    doc="A2: global (no-group) aggregate.",
)
def a2_global_agg(spark, sf_dir):
    return t(spark, sf_dir, "lineitem").agg(
        F.count("*").alias("n_rows"),
        dsum("l_extendedprice").alias("total_price"),
        F.min("l_orderkey").alias("min_ok"),
        F.max("l_orderkey").alias("max_ok"),
    )


@register(
    "a3_count_distinct",
    oracle="""
SELECT c_mktsegment,
       CAST(COUNT(DISTINCT c_nationkey) AS BIGINT) AS n_nations,
       CAST(COUNT(*) AS BIGINT) AS n_customers
FROM customer
GROUP BY c_mktsegment
ORDER BY c_mktsegment
""",
    doc="A3: exact COUNT(DISTINCT) per group (expand+two-phase agg in Spark).",
)
def a3_count_distinct(spark, sf_dir):
    return (
        t(spark, sf_dir, "customer")
        .groupBy("c_mktsegment")
        .agg(
            F.countDistinct("c_nationkey").alias("n_nations"),
            F.count("*").alias("n_customers"),
        )
        .orderBy("c_mktsegment")
    )


@register(
    "a4_approx_count_distinct",
    oracle=None,  # HLL params differ from DuckDB → bench-only (SURVEY A4)
    doc="A4: approx_count_distinct; rows-only check, accuracy asserted in tests vs A3.",
)
def a4_approx_count_distinct(spark, sf_dir):
    return (
        t(spark, sf_dir, "lineitem")
        .agg(F.approx_count_distinct("l_orderkey", rsd=0.01).alias("approx_orders"))
    )


@register(
    "a5_rollup",
    oracle="""
SELECT COALESCE(n_name, '<ALL>') AS nation,
       COALESCE(c_mktsegment, '<ALL>') AS segment,
       CAST(GROUPING(n_name) * 2 + GROUPING(c_mktsegment) AS BIGINT) AS gid,
       CAST(COUNT(*) AS BIGINT) AS n_customers,
       CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS total_bal
FROM customer JOIN nation ON c_nationkey = n_nationkey
GROUP BY ROLLUP (n_name, c_mktsegment)
ORDER BY nation, segment, gid
""",
    doc="A5: rollup with GROUPING() disambiguator over customer⋈nation.",
)
def a5_rollup(spark, sf_dir):
    c = t(spark, sf_dir, "customer")
    n = t(spark, sf_dir, "nation")
    j = c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
    return (
        j.rollup("n_name", "c_mktsegment")
        .agg(
            (F.grouping("n_name") * 2 + F.grouping("c_mktsegment"))
            .cast("bigint")
            .alias("gid"),
            F.count("*").alias("n_customers"),
            dsum("c_acctbal").alias("total_bal"),
        )
        .select(
            F.coalesce("n_name", F.lit("<ALL>")).alias("nation"),
            F.coalesce("c_mktsegment", F.lit("<ALL>")).alias("segment"),
            "gid",
            "n_customers",
            "total_bal",
        )
        .orderBy("nation", "segment", "gid")
    )


@register(
    "a6_filtered_agg",
    oracle="""
SELECT strftime(date_trunc('month', l_shipdate), '%Y-%m') AS ship_month,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                * (1 - CAST(l_discount AS DECIMAL(12,2))))
            FILTER (WHERE p_type LIKE 'PROMO%') AS DOUBLE) AS promo_revenue,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                * (1 - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS total_revenue
FROM lineitem JOIN part ON l_partkey = p_partkey
GROUP BY ship_month
ORDER BY ship_month
""",
    doc="A6: conditional aggregation (promo revenue per month, TPC-H Q14-style).",
)
def a6_filtered_agg(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem")
    p = t(spark, sf_dir, "part")
    rev = dec("l_extendedprice") * (F.lit(1) - dec("l_discount"))
    j = li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
    return (
        j.groupBy(F.date_format(F.date_trunc("month", "l_shipdate"), "yyyy-MM").alias("ship_month"))
        .agg(
            F.sum(F.when(F.col("p_type").like("PROMO%"), rev)).cast("double").alias("promo_revenue"),
            F.sum(rev).cast("double").alias("total_revenue"),
        )
        .orderBy("ship_month")
    )


@register(
    "a7_ordered_collect",
    oracle="""
SELECT l_orderkey,
       array_to_string(list(CAST(l_linenumber AS BIGINT) ORDER BY l_linenumber), ',') AS line_numbers,
       array_to_string(list(CAST(CAST(l_quantity AS INT) AS BIGINT) ORDER BY CAST(l_quantity AS INT)), ',') AS quantities
FROM lineitem
WHERE l_orderkey <= 100
GROUP BY l_orderkey
ORDER BY l_orderkey
""",
    doc="A7: ordered collect_list rendered as a string (deterministic).",
)
def a7_ordered_collect(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") <= 100)
    return (
        li.groupBy("l_orderkey")
        .agg(
            F.array_join(
                F.sort_array(F.collect_list(F.col("l_linenumber").cast("bigint"))), ","
            ).alias("line_numbers"),
            F.array_join(
                F.sort_array(F.collect_list(F.col("l_quantity").cast("int").cast("bigint"))), ","
            ).alias("quantities"),
        )
        .orderBy("l_orderkey")
    )


@register(
    "a8_stats",
    oracle="""
SELECT l_returnflag,
       ROUND(stddev_samp(l_quantity), 4) AS sd_qty,
       ROUND(var_samp(l_quantity), 4) AS var_qty,
       ROUND(corr(l_quantity, l_extendedprice), 4) + 0.0 AS corr_qty_price,
       ROUND(covar_samp(l_quantity, l_extendedprice), 4) + 0.0 AS cov_qty_price
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
""",
    doc="A8: statistical aggregates, ROUND(,4) per float caveat (SURVEY §5.3).",
)
def a8_stats(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.round(F.stddev_samp("l_quantity"), 4).alias("sd_qty"),
            F.round(F.var_samp("l_quantity"), 4).alias("var_qty"),
            (F.round(F.corr("l_quantity", "l_extendedprice"), 4) + F.lit(0.0)).alias("corr_qty_price"),
            (F.round(F.covar_samp("l_quantity", "l_extendedprice"), 4) + F.lit(0.0)).alias("cov_qty_price"),
        )
        .orderBy("l_returnflag")
    )


@register(
    "a9_percentile",
    oracle="""
SELECT c_mktsegment,
       ROUND(quantile_cont(c_acctbal, 0.5), 4) AS median_bal,
       ROUND(quantile_cont(c_acctbal, 0.9), 4) AS p90_bal
FROM customer
GROUP BY c_mktsegment
ORDER BY c_mktsegment
""",
    doc="A9: exact interpolated percentile vs DuckDB quantile_cont.",
)
def a9_percentile(spark, sf_dir):
    c = t(spark, sf_dir, "customer")
    return (
        c.groupBy("c_mktsegment")
        .agg(
            F.round(F.percentile("c_acctbal", F.lit(0.5)), 4).alias("median_bal"),
            F.round(F.percentile("c_acctbal", F.lit(0.9)), 4).alias("p90_bal"),
        )
        .orderBy("c_mktsegment")
    )


@register(
    "a10_min_max_by",
    oracle="""
SELECT o_custkey,
       CAST(max_by(o_orderkey, o_totalprice + o_orderkey/1e9) AS BIGINT) AS best_order,
       CAST(min_by(o_orderkey, o_totalprice + o_orderkey/1e9) AS BIGINT) AS worst_order,
       strftime(MAX(o_orderdate), '%Y-%m-%d') AS last_order_date
FROM orders
GROUP BY o_custkey
ORDER BY o_custkey
""",
    doc="A10: min_by/max_by with a key-based tie-break folded into the ordering expr.",
)
def a10_min_max_by(spark, sf_dir):
    o = t(spark, sf_dir, "orders")
    # ties on o_totalprice broken deterministically by adding a key epsilon
    rank_expr = F.col("o_totalprice") + F.col("o_orderkey") / F.lit(1e9)
    return (
        o.groupBy("o_custkey")
        .agg(
            F.max_by("o_orderkey", rank_expr).alias("best_order"),
            F.min_by("o_orderkey", rank_expr).alias("worst_order"),
            date_s(F.max("o_orderdate")).alias("last_order_date"),
        )
        .orderBy("o_custkey")
    )


@register(
    "a5b_cube",
    oracle="""
SELECT COALESCE(n_name, '<ALL>') AS nation,
       COALESCE(c_mktsegment, '<ALL>') AS segment,
       CAST(GROUPING(n_name) * 2 + GROUPING(c_mktsegment) AS BIGINT) AS gid,
       CAST(COUNT(*) AS BIGINT) AS n_customers
FROM customer JOIN nation ON c_nationkey = n_nationkey
GROUP BY CUBE (n_name, c_mktsegment)
ORDER BY nation, segment, gid
""",
    doc="A5: cube — all 4 grouping combinations with GROUPING() ids.",
)
def a5b_cube(spark, sf_dir):
    c = t(spark, sf_dir, "customer")
    n = t(spark, sf_dir, "nation")
    j = c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
    return (
        j.cube("n_name", "c_mktsegment")
        .agg(
            (F.grouping("n_name") * 2 + F.grouping("c_mktsegment"))
            .cast("bigint")
            .alias("gid"),
            F.count("*").alias("n_customers"),
        )
        .select(
            F.coalesce("n_name", F.lit("<ALL>")).alias("nation"),
            F.coalesce("c_mktsegment", F.lit("<ALL>")).alias("segment"),
            "gid",
            "n_customers",
        )
        .orderBy("nation", "segment", "gid")
    )


@register(
    "a5c_grouping_sets",
    oracle="""
SELECT COALESCE(n_name, '<ALL>') AS nation,
       COALESCE(c_mktsegment, '<ALL>') AS segment,
       CAST(COUNT(*) AS BIGINT) AS n_customers
FROM customer JOIN nation ON c_nationkey = n_nationkey
GROUP BY GROUPING SETS ((n_name), (c_mktsegment))
ORDER BY nation, segment
""",
    doc="A5: explicit GROUPING SETS (per-nation and per-segment totals in "
    "one pass) via Spark SQL over temp views.",
)
def a5c_grouping_sets(spark, sf_dir):
    t(spark, sf_dir, "customer").createOrReplaceTempView("v_customer")
    t(spark, sf_dir, "nation").createOrReplaceTempView("v_nation")
    return spark.sql(
        """
        SELECT COALESCE(n_name, '<ALL>') AS nation,
               COALESCE(c_mktsegment, '<ALL>') AS segment,
               CAST(COUNT(*) AS BIGINT) AS n_customers
        FROM v_customer JOIN v_nation ON c_nationkey = n_nationkey
        GROUP BY GROUPING SETS ((n_name), (c_mktsegment))
        ORDER BY nation, segment
        """
    )


@register(
    "a5d_pivot",
    oracle="""
SELECT l_linestatus,
       CAST(SUM(CASE WHEN l_returnflag = 'A' THEN CAST(l_quantity AS DECIMAL(12,2)) END) AS DOUBLE) AS qty_A,
       CAST(SUM(CASE WHEN l_returnflag = 'N' THEN CAST(l_quantity AS DECIMAL(12,2)) END) AS DOUBLE) AS qty_N,
       CAST(SUM(CASE WHEN l_returnflag = 'R' THEN CAST(l_quantity AS DECIMAL(12,2)) END) AS DOUBLE) AS qty_R
FROM lineitem
GROUP BY l_linestatus
ORDER BY l_linestatus
""",
    doc="A5: pivot with an explicit value list (one shuffle, map-side "
    "combine — equivalent to conditional aggregation, which is the oracle "
    "form). Explicit values keep the plan static at any scale: no "
    "distinct-scan to discover columns.",
)
def a5d_pivot(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem")
    qty = F.col("l_quantity").cast("decimal(12,2)")
    piv = (
        li.groupBy("l_linestatus")
        .pivot("l_returnflag", ["A", "N", "R"])
        .agg(F.sum(qty))
    )
    return piv.select(
        "l_linestatus",
        F.col("A").cast("double").alias("qty_A"),
        F.col("N").cast("double").alias("qty_N"),
        F.col("R").cast("double").alias("qty_R"),
    ).orderBy("l_linestatus")


@register(
    "a5e_unpivot",
    oracle="""
SELECT l_linestatus, flag, qty FROM (
  SELECT l_linestatus, 'A' AS flag,
         CAST(SUM(CASE WHEN l_returnflag = 'A' THEN CAST(l_quantity AS DECIMAL(12,2)) END) AS DOUBLE) AS qty
  FROM lineitem GROUP BY l_linestatus
  UNION ALL
  SELECT l_linestatus, 'N',
         CAST(SUM(CASE WHEN l_returnflag = 'N' THEN CAST(l_quantity AS DECIMAL(12,2)) END) AS DOUBLE)
  FROM lineitem GROUP BY l_linestatus
  UNION ALL
  SELECT l_linestatus, 'R',
         CAST(SUM(CASE WHEN l_returnflag = 'R' THEN CAST(l_quantity AS DECIMAL(12,2)) END) AS DOUBLE)
  FROM lineitem GROUP BY l_linestatus
) WHERE qty IS NOT NULL
ORDER BY l_linestatus, flag
""",
    doc="A5: unpivot (wide → long) of the pivoted aggregate back to rows — "
    "a narrow per-row expand, no shuffle beyond the source agg.",
)
def a5e_unpivot(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem")
    qty = F.col("l_quantity").cast("decimal(12,2)")
    piv = (
        li.groupBy("l_linestatus")
        .pivot("l_returnflag", ["A", "N", "R"])
        .agg(F.sum(qty).cast("double"))
    )
    return (
        piv.unpivot("l_linestatus", ["A", "N", "R"], "flag", "qty")
        .filter(F.col("qty").isNotNull())
        .orderBy("l_linestatus", "flag")
    )


@register(
    "a8b_regression_aggs",
    oracle="""
SELECT l_returnflag,
       ROUND(regr_slope(CAST(l_extendedprice AS DOUBLE), CAST(l_quantity AS DOUBLE)), 6) + 0.0 AS slope,
       ROUND(regr_intercept(CAST(l_extendedprice AS DOUBLE), CAST(l_quantity AS DOUBLE)), 6) + 0.0 AS icept,
       ROUND(regr_r2(CAST(l_extendedprice AS DOUBLE), CAST(l_quantity AS DOUBLE)), 6) + 0.0 AS r2,
       CAST(regr_count(CAST(l_extendedprice AS DOUBLE), CAST(l_quantity AS DOUBLE)) AS BIGINT) AS n
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
""",
    doc="A8b: linear-regression aggregates (slope/intercept/r2/count) of "
    "price on quantity per returnflag; ROUND(,6) float rule (§5.3).",
)
def a8b_regression_aggs(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem")
    y = F.col("l_extendedprice").cast("double")
    x = F.col("l_quantity").cast("double")
    return (
        li.groupBy("l_returnflag")
        .agg(
            (F.round(F.regr_slope(y, x), 6) + F.lit(0.0)).alias("slope"),
            (F.round(F.regr_intercept(y, x), 6) + F.lit(0.0)).alias("icept"),
            (F.round(F.regr_r2(y, x), 6) + F.lit(0.0)).alias("r2"),
            F.regr_count(y, x).cast("bigint").alias("n"),
        )
        .orderBy("l_returnflag")
    )


@register(
    "a11_bool_aggs",
    oracle="""
SELECT o_orderpriority,
       CAST(count_if(o_totalprice > 100000) AS BIGINT) AS n_big,
       CAST(bool_and(o_totalprice > 0) AS INT) AS all_pos,
       CAST(bool_or(o_totalprice > 400000) AS INT) AS any_huge,
       CAST(MIN(o_orderkey) AS BIGINT) AS any_key
FROM orders
GROUP BY o_orderpriority
ORDER BY o_orderpriority
""",
    doc="A11: conditional/boolean aggregates (count_if, bool_and, bool_or); "
    "any_value declared in its deterministic MIN rewrite (§5.3 rule, as O5).",
)
def a11_bool_aggs(spark, sf_dir):
    o = t(spark, sf_dir, "orders")
    tp = F.col("o_totalprice")
    return (
        o.groupBy("o_orderpriority")
        .agg(
            F.count_if(tp > 100000).cast("bigint").alias("n_big"),
            F.bool_and(tp > 0).cast("int").alias("all_pos"),
            F.bool_or(tp > 400000).cast("int").alias("any_huge"),
            F.min("o_orderkey").cast("bigint").alias("any_key"),
        )
        .orderBy("o_orderpriority")
    )


@register(
    "a12_approx_percentile",
    oracle="""
SELECT c_mktsegment,
       quantile_disc(c_acctbal, 0.5) AS median_bal,
       quantile_disc(c_acctbal, 0.9) AS p90_bal
FROM customer
GROUP BY c_mktsegment
ORDER BY c_mktsegment
""",
    doc="A12: sketch-based percentile — the 100 TB path A9's exact sort "
    "can't take: approx_percentile's Greenwald-Khanna summary is "
    "fixed-size, mergeable, and single-pass (partial sketches combine "
    "map-side like any partial agg; no per-group sort, no wide shuffle "
    "of values). Rank error is bounded by n/accuracy; at accuracy 1e7 "
    "and driver-attest group sizes that bound is < 1, so the sketch "
    "degenerates to the exact DISCRETE quantile (an actual element) and "
    "DuckDB's quantile_disc is a true hash oracle — the same "
    "exact-mode-identity anchoring as x3c's n_probe=n_cells. The "
    "genuinely approximate regime (low accuracy) is pinned by the rank "
    "error-bound test in tests/test_scale_ops.py.",
)
def a12_approx_percentile(spark, sf_dir):
    c = t(spark, sf_dir, "customer")
    acc = F.lit(10_000_000)
    return (
        c.groupBy("c_mktsegment")
        .agg(
            F.approx_percentile("c_acctbal", F.lit(0.5), acc).alias("median_bal"),
            F.approx_percentile("c_acctbal", F.lit(0.9), acc).alias("p90_bal"),
        )
        .orderBy("c_mktsegment")
    )


@register(
    "a13_mode",
    oracle="""
WITH counts AS (
  SELECT o_orderstatus, o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n
  FROM orders GROUP BY o_orderstatus, o_orderpriority
), ranked AS (
  SELECT *, row_number() OVER (PARTITION BY o_orderstatus
                               ORDER BY n DESC, o_orderpriority) AS rn
  FROM counts
)
SELECT o_orderstatus, o_orderpriority AS mode_priority, n
FROM ranked WHERE rn = 1
ORDER BY o_orderstatus
""",
    doc="A13: deterministic MODE aggregate — most frequent value per group "
    "with an explicit tie-break (smallest value wins). Spark's built-in "
    "mode() and DuckDB's mode() both leave ties engine-defined, so the "
    "op is DECLARED in its deterministic rewritten form (the O5/A10 "
    "convention): a count rollup, then a row_number over the COUNTS "
    "table (group-cardinality rows, not data rows) — two partial-agg'd "
    "exchanges, and the window sorts value frequencies, never the fact "
    "table.",
)
def a13_mode(spark, sf_dir):
    from pyspark.sql import Window

    o = t(spark, sf_dir, "orders")
    counts = o.groupBy("o_orderstatus", "o_orderpriority").agg(
        F.count("*").cast("bigint").alias("n")
    )
    w = Window.partitionBy("o_orderstatus").orderBy(
        F.desc("n"), F.asc("o_orderpriority")
    )
    return (
        counts.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "o_orderstatus",
            F.col("o_orderpriority").alias("mode_priority"),
            "n",
        )
        .orderBy("o_orderstatus")
    )


@register(
    "a14_heavy_hitters",
    oracle=r"""
WITH tok AS (
  SELECT unnest(regexp_split_to_array(text, '\s+')) AS token FROM documents
), cnt AS (
  SELECT token, CAST(COUNT(*) AS BIGINT) AS est_count FROM tok GROUP BY token
), ranked AS (
  SELECT token, est_count,
         CAST(row_number() OVER (ORDER BY est_count DESC, token) AS BIGINT)
           AS rank
  FROM cnt
)
SELECT rank, token, est_count, CAST(0 AS BIGINT) AS err_bound
FROM ranked WHERE rank <= 20 ORDER BY rank
""",
    doc="A14: Misra-Gries heavy hitters (operators/sketches.py) — the "
    "bounded-memory answer to 'top tokens' when the VOCABULARY no longer "
    "fits an executor's hash aggregate: each partition keeps at most m "
    "counters whatever the stream length, partials merge by token, and "
    "the summed compression offsets bound every token's undercount "
    "(est <= true <= est + err). Registered in EXACT MODE (m = 2^22 "
    "exceeds any partition's distinct tokens, so nothing compresses, "
    "est == true, err == 0) against the exact DuckDB top-20 with "
    "(count desc, token) tie-break — a12's exact-mode-anchoring pattern; "
    "the m=64 sketch regime's guarantees (undercount bound, heavy-hitter "
    "survival) are property-pinned in tests/test_scale_ops.py. The "
    "global window runs over the MERGED SKETCH (<= m * partitions rows), "
    "never the token stream.",
)
def a14_heavy_hitters(spark, sf_dir):
    from ez_cdc_spark.operators.sketches import mg_topk

    d = t(spark, sf_dir, "documents")
    tokens = d.select(
        F.explode(F.split(F.col("text"), r"\s+")).alias("token")
    )
    return mg_topk(tokens, "token", m=1 << 22, k=20)


@register(
    "a15_weighted_percentile",
    oracle="""
WITH h AS (
  SELECT l_returnflag,
         CAST(CAST(l_quantity AS DECIMAL(12,2)) * 100 AS BIGINT) AS qc,
         CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100 AS BIGINT))
              AS BIGINT) AS w
  FROM lineitem GROUP BY 1, 2
), c AS (
  SELECT l_returnflag, qc, w,
         CAST(SUM(w) OVER (PARTITION BY l_returnflag ORDER BY qc
              ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum,
         CAST(SUM(w) OVER (PARTITION BY l_returnflag) AS BIGINT) AS tot
  FROM h
)
SELECT l_returnflag,
       CAST(MAX(tot) AS BIGINT) AS total_weight_cents,
       CAST(MIN(CASE WHEN cum * 100 >= 50 * tot THEN qc END) AS BIGINT)
         AS p50_qty_cents,
       CAST(MIN(CASE WHEN cum * 100 >= 90 * tot THEN qc END) AS BIGINT)
         AS p90_qty_cents
FROM c GROUP BY l_returnflag
ORDER BY l_returnflag
""",
    doc="A15: exact WEIGHTED percentile (revenue-weighted quantity p50/p90 "
    "per return flag) — 'half the revenue ships in lines of <= N units', "
    "the inventory/pricing form a9's row-weighted percentile can't "
    "answer. Pure integer pipeline end to end: quantities and weights "
    "become exact cents (DECIMAL*100 -> BIGINT), the corpus collapses to "
    "the per-(flag, quantity) weight histogram (one partial-agg'd "
    "exchange; window runs over histogram rows only — x22's rule), and "
    "the percentile fence is the integer cross-multiply cum*100 >= p*tot "
    "(no p/100 float, no interpolation ambiguity: lower-bound semantics, "
    "smallest value reaching the fence — PERCENTILE_DISC-style but "
    "weighted, which neither engine has built in). Zero floats anywhere "
    "=> no rounding discipline at all (SURVEY 5.3 fixed-point family).",
)
def a15_weighted_percentile(spark, sf_dir):
    from pyspark.sql import Window

    li = t(spark, sf_dir, "lineitem")
    qc = (dec("l_quantity") * 100).cast("bigint")
    wc = (dec("l_extendedprice") * 100).cast("bigint")
    h = (
        li.select(F.col("l_returnflag"), qc.alias("qc"), wc.alias("wc"))
        .groupBy("l_returnflag", "qc")
        .agg(F.sum("wc").cast("bigint").alias("w"))
    )
    wcum = Window.partitionBy("l_returnflag").orderBy("qc").rowsBetween(
        Window.unboundedPreceding, 0
    )
    wtot = Window.partitionBy("l_returnflag")
    c = h.select(
        "l_returnflag",
        "qc",
        F.sum("w").over(wcum).cast("bigint").alias("cum"),
        F.sum("w").over(wtot).cast("bigint").alias("tot"),
    )
    return (
        c.groupBy("l_returnflag")
        .agg(
            F.max("tot").cast("bigint").alias("total_weight_cents"),
            F.min(F.when(F.col("cum") * 100 >= 50 * F.col("tot"), F.col("qc")))
            .cast("bigint")
            .alias("p50_qty_cents"),
            F.min(F.when(F.col("cum") * 100 >= 90 * F.col("tot"), F.col("qc")))
            .cast("bigint")
            .alias("p90_qty_cents"),
        )
        .orderBy("l_returnflag")
    )


# alpha_128 = 0.7213 / (1 + 1.079/128), scaled to 1e7 and frozen as an exact
# integer constant so both engines evaluate the identical rational.
_HLL_ALPHA7 = 7152705
# numerator of the raw HLL estimator: alpha7 * m^2 * 2^26 (m = 128), a single
# exact BIGINT literal (7.86e18 < 2^63); the only float op in the whole query
# is ONE IEEE division of two bigint-cast doubles (deterministic, SURVEY 5.3
# rule 3 — bigint->double casts round-to-nearest identically in both engines).
_HLL_NUM = _HLL_ALPHA7 * 128 * 128 * (1 << 26)


@register(
    "a16_portable_hll",
    oracle=f"""
WITH h AS (
  SELECT o_orderpriority AS grp,
         CAST('0x' || substr(md5(CAST(o_custkey AS VARCHAR)), 1, 8) AS BIGINT)
           AS h32
  FROM orders
), b AS (
  SELECT grp, h32 // 33554432 AS bucket, h32 % 33554432 AS w FROM h
), r AS (
  SELECT grp, bucket,
         MAX(CASE WHEN w = 0 THEN 26 ELSE 26 - length(bin(w)) END) AS rho
  FROM b GROUP BY 1, 2
), z AS (
  SELECT grp,
         CAST(SUM(CAST(1 AS BIGINT) << (26 - rho))
              + (128 - COUNT(*)) * 67108864 AS BIGINT) AS z_scaled,
         CAST(COUNT(*) AS BIGINT) AS filled_buckets
  FROM r GROUP BY 1
)
SELECT grp, z_scaled, filled_buckets,
       CAST({_HLL_NUM} AS DOUBLE) / CAST(z_scaled * 10000000 AS DOUBLE)
         AS hll_estimate
FROM z ORDER BY grp
""",
    doc="A16: portable HyperLogLog distinct-count sketch (m = 128 buckets) "
    "whose ESTIMATE is bit-deterministic across engines — unlike a4's "
    "engine-native approx_count_distinct (declared no-oracle), every step "
    "here is integer arithmetic on the portable md5 hash: h32 = first 8 "
    "md5 hex chars, bucket = top 7 bits, rho = leading-zero rank of the "
    "remaining 25-bit word via length(bin(w)) (both engines render binary "
    "identically), registers = MAX(rho) per bucket, and the harmonic "
    "denominator is an exact BIGINT (sum of 1<<(26-rho) plus 2^26 per "
    "empty bucket). The estimate alpha*m^2/Z reduces to ONE IEEE division "
    "of two bigints with alpha frozen as the integer constant 7152705e-7 "
    "(raw estimator — no small/large-range correction; documented, and "
    "accuracy vs a3-exact is property-tested). 100 TB shape: this is the "
    "MERGEABLE sketch pattern — groupBy(grp, bucket).max(rho) partial-"
    "aggregates map-side, so the exchange carries at most m rows per "
    "(partition, group) whatever the corpus size, and unioning shards "
    "then re-MAXing registers merges sketches exactly (the property a4's "
    "opaque binary sketch has, now with engine-portable semantics).",
)
def a16_portable_hll(spark, sf_dir):
    od = t(spark, sf_dir, "orders")
    h32 = F.conv(F.substring(F.md5(F.col("o_custkey").cast("string")), 1, 8), 16, 10).cast(
        "long"
    )
    b = od.select(
        F.col("o_orderpriority").alias("grp"),
        h32.alias("h32"),
    ).select(
        "grp",
        F.expr("h32 div 33554432").alias("bucket"),
        (F.col("h32") % F.lit(33554432)).alias("w"),
    )
    r = b.groupBy("grp", "bucket").agg(
        F.max(
            F.when(F.col("w") == 0, F.lit(26)).otherwise(
                F.lit(26) - F.length(F.bin(F.col("w")))
            )
        ).alias("rho")
    )
    z = r.groupBy("grp").agg(
        (
            F.sum(F.expr("shiftleft(cast(1 as bigint), 26 - rho)"))
            + (F.lit(128) - F.count("*")) * F.lit(67108864)
        )
        .cast("bigint")
        .alias("z_scaled"),
        F.count("*").cast("bigint").alias("filled_buckets"),
    )
    return z.select(
        "grp",
        "z_scaled",
        "filled_buckets",
        (
            F.lit(_HLL_NUM).cast("double")
            / (F.col("z_scaled") * F.lit(10000000)).cast("double")
        ).alias("hll_estimate"),
    ).orderBy("grp")


@register(
    "a17_trimmed_mean",
    oracle="""
WITH h AS (
  SELECT l_returnflag,
         CAST(CAST(l_quantity AS DECIMAL(12,2)) * 100 AS BIGINT) AS qc,
         CAST(COUNT(*) AS BIGINT) AS cnt
  FROM lineitem GROUP BY 1, 2
), c AS (
  SELECT l_returnflag, qc, cnt,
         CAST(SUM(cnt) OVER (PARTITION BY l_returnflag ORDER BY qc
              ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum,
         CAST(SUM(cnt) OVER (PARTITION BY l_returnflag) AS BIGINT) AS tot
  FROM h
), k AS (
  SELECT *, tot // 10 AS lo, tot - tot // 10 AS hi FROM c
), inc AS (
  SELECT l_returnflag, tot, lo, hi, qc,
         GREATEST(LEAST(cum, hi) - GREATEST(cum - cnt, lo),
                  CAST(0 AS BIGINT)) AS m
  FROM k
)
SELECT l_returnflag,
       CAST(MAX(tot) AS BIGINT) AS n_rows,
       CAST(MAX(hi) - MAX(lo) AS BIGINT) AS n_kept,
       CAST(SUM(m * qc) AS BIGINT) AS kept_sum_cents,
       CAST(CAST(SUM(m * qc) AS DOUBLE) / CAST(MAX(hi) - MAX(lo) AS DOUBLE)
            AS DOUBLE) AS trimmed_mean_cents
FROM inc GROUP BY l_returnflag
ORDER BY l_returnflag
""",
    doc="A17: exact 10% trimmed mean — the robust location estimate between "
    "a9's median and a plain mean: per return flag, drop the lowest and "
    "highest floor(n/10) quantity observations by rank and average the "
    "middle 80%. No engine has it built in, and the naive form (sort + "
    "row_number + filter) puts a whole group through one task's sort at "
    "100 TB. Instead the a15/x22 histogram rule: the corpus collapses to "
    "per-(group, value) counts, the rank interval each VALUE occupies is "
    "[cum - cnt, cum) from one cumsum window over histogram rows only, "
    "and the kept multiplicity is the integer interval intersection "
    "m = max(0, min(cum, hi) - max(cum - cnt, lo)) — so trimming "
    "happens without ranking a single data row. Integer cents end to "
    "end; the only float is ONE IEEE division of two bigint-cast doubles "
    "(SURVEY 5.3 rule 3).",
)
def a17_trimmed_mean(spark, sf_dir):
    from pyspark.sql import Window

    li = t(spark, sf_dir, "lineitem")
    qc = (dec("l_quantity") * 100).cast("bigint")
    h = (
        li.select(F.col("l_returnflag"), qc.alias("qc"))
        .groupBy("l_returnflag", "qc")
        .agg(F.count("*").cast("bigint").alias("cnt"))
    )
    wcum = Window.partitionBy("l_returnflag").orderBy("qc").rowsBetween(
        Window.unboundedPreceding, 0
    )
    wtot = Window.partitionBy("l_returnflag")
    c = h.select(
        "l_returnflag",
        "qc",
        "cnt",
        F.sum("cnt").over(wcum).cast("bigint").alias("cum"),
        F.sum("cnt").over(wtot).cast("bigint").alias("tot"),
    )
    k = c.select(
        "*",
        F.expr("tot div 10").alias("lo"),
        (F.col("tot") - F.expr("tot div 10")).alias("hi"),
    )
    inc = k.select(
        "l_returnflag",
        "tot",
        "lo",
        "hi",
        "qc",
        F.greatest(
            F.least(F.col("cum"), F.col("hi"))
            - F.greatest(F.col("cum") - F.col("cnt"), F.col("lo")),
            F.lit(0).cast("bigint"),
        ).alias("m"),
    )
    return (
        inc.groupBy("l_returnflag")
        .agg(
            F.max("tot").cast("bigint").alias("n_rows"),
            (F.max("hi") - F.max("lo")).cast("bigint").alias("n_kept"),
            F.sum(F.col("m") * F.col("qc")).cast("bigint").alias("kept_sum_cents"),
            (
                F.sum(F.col("m") * F.col("qc")).cast("double")
                / (F.max("hi") - F.max("lo")).cast("double")
            ).alias("trimmed_mean_cents"),
        )
        .orderBy("l_returnflag")
    )


@register(
    "a18_weighted_trimmed_mean",
    oracle="""
WITH h AS (
  SELECT l_returnflag,
         CAST(CAST(l_quantity AS DECIMAL(12,2)) * 100 AS BIGINT) AS qc,
         CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100 AS BIGINT))
              AS BIGINT) AS w
  FROM lineitem GROUP BY 1, 2
), c AS (
  SELECT l_returnflag, qc, w,
         CAST(SUM(w) OVER (PARTITION BY l_returnflag ORDER BY qc
              ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum,
         CAST(SUM(w) OVER (PARTITION BY l_returnflag) AS BIGINT) AS tot
  FROM h
), k AS (
  SELECT *, tot // 10 AS lo, tot - tot // 10 AS hi FROM c
), inc AS (
  SELECT l_returnflag, tot, lo, hi, qc,
         GREATEST(LEAST(cum, hi) - GREATEST(cum - w, lo),
                  CAST(0 AS BIGINT)) AS mw
  FROM k
)
SELECT l_returnflag,
       CAST(MAX(tot) AS BIGINT) AS total_weight_cents,
       CAST(MAX(hi) - MAX(lo) AS BIGINT) AS kept_weight_cents,
       CAST(SUM(mw * qc) AS BIGINT) AS kept_wsum,
       CAST(CAST(SUM(mw * qc) AS DOUBLE)
            / CAST(MAX(hi) - MAX(lo) AS DOUBLE) AS DOUBLE)
         AS wtrimmed_mean_qty_cents
FROM inc GROUP BY l_returnflag
ORDER BY l_returnflag
""",
    doc="A18: exact WEIGHTED trimmed mean — a15 x a17 composed on the same "
    "weight histogram: per return flag, discard the lightest and heaviest "
    "10% of REVENUE WEIGHT (not of rows) along the quantity axis and "
    "take the weight-averaged quantity of the middle 80%. The robust "
    "'typical shipped quantity' where a17 would let one huge cheap line "
    "count as much as a million-dollar one. Same 100 TB shape as both "
    "parents: the corpus collapses map-side to the per-(flag, quantity) "
    "revenue-cents histogram, ONE cumsum window runs over histogram rows "
    "only, and each value's kept weight is the integer interval "
    "intersection mw = max(0, min(cum, hi) - max(cum - w, lo)) against "
    "the weight fences lo = tot//10, hi = tot - tot//10 — trimming "
    "happens without ranking a single data row, and partial weight at "
    "the fence boundary is kept exactly (fractional-value trimming, "
    "which no engine has built in). Integer cents end to end; the only "
    "float is ONE IEEE division of two bigint-cast doubles (SURVEY 5.3 "
    "rule 3).",
)
def a18_weighted_trimmed_mean(spark, sf_dir):
    from pyspark.sql import Window

    li = t(spark, sf_dir, "lineitem")
    qc = (dec("l_quantity") * 100).cast("bigint")
    wc = (dec("l_extendedprice") * 100).cast("bigint")
    h = (
        li.select(F.col("l_returnflag"), qc.alias("qc"), wc.alias("wc"))
        .groupBy("l_returnflag", "qc")
        .agg(F.sum("wc").cast("bigint").alias("w"))
    )
    wcum = Window.partitionBy("l_returnflag").orderBy("qc").rowsBetween(
        Window.unboundedPreceding, 0
    )
    wtot = Window.partitionBy("l_returnflag")
    c = h.select(
        "l_returnflag",
        "qc",
        "w",
        F.sum("w").over(wcum).cast("bigint").alias("cum"),
        F.sum("w").over(wtot).cast("bigint").alias("tot"),
    )
    k = c.select(
        "*",
        F.expr("tot div 10").alias("lo"),
        (F.col("tot") - F.expr("tot div 10")).alias("hi"),
    )
    inc = k.select(
        "l_returnflag",
        "tot",
        "lo",
        "hi",
        "qc",
        F.greatest(
            F.least(F.col("cum"), F.col("hi"))
            - F.greatest(F.col("cum") - F.col("w"), F.col("lo")),
            F.lit(0).cast("bigint"),
        ).alias("mw"),
    )
    return (
        inc.groupBy("l_returnflag")
        .agg(
            F.max("tot").cast("bigint").alias("total_weight_cents"),
            (F.max("hi") - F.max("lo")).cast("bigint").alias("kept_weight_cents"),
            F.sum(F.col("mw") * F.col("qc")).cast("bigint").alias("kept_wsum"),
            (
                F.sum(F.col("mw") * F.col("qc")).cast("double")
                / (F.max("hi") - F.max("lo")).cast("double")
            ).alias("wtrimmed_mean_qty_cents"),
        )
        .orderBy("l_returnflag")
    )


@register(
    "a19_weighted_mad",
    oracle="""
WITH h AS (
  SELECT l_returnflag,
         CAST(CAST(l_quantity AS DECIMAL(12,2)) * 100 AS BIGINT) AS qc,
         CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100 AS BIGINT))
              AS BIGINT) AS w
  FROM lineitem GROUP BY 1, 2
), c AS (
  SELECT l_returnflag, qc, w,
         CAST(SUM(w) OVER (PARTITION BY l_returnflag ORDER BY qc
              ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum,
         CAST(SUM(w) OVER (PARTITION BY l_returnflag) AS BIGINT) AS tot
  FROM h
), med AS (
  SELECT l_returnflag,
         CAST(MAX(tot) AS BIGINT) AS tot,
         CAST(MIN(CASE WHEN cum * 2 >= tot THEN qc END) AS BIGINT) AS wmed
  FROM c GROUP BY l_returnflag
), dh AS (
  SELECT h.l_returnflag, ABS(h.qc - med.wmed) AS dev,
         CAST(SUM(h.w) AS BIGINT) AS w
  FROM h JOIN med USING (l_returnflag)
  GROUP BY 1, 2
), dc AS (
  SELECT l_returnflag, dev, w,
         CAST(SUM(w) OVER (PARTITION BY l_returnflag ORDER BY dev
              ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum,
         CAST(SUM(w) OVER (PARTITION BY l_returnflag) AS BIGINT) AS tot
  FROM dh
)
SELECT med.l_returnflag,
       med.tot AS total_weight_cents,
       med.wmed AS wmedian_qty_cents,
       CAST(MIN(CASE WHEN dc.cum * 2 >= dc.tot THEN dc.dev END) AS BIGINT)
         AS wmad_qty_cents
FROM dc JOIN med USING (l_returnflag)
GROUP BY 1, 2, 3
ORDER BY med.l_returnflag
""",
    doc="A19: exact weighted median absolute deviation — the robust SCALE "
    "estimate completing the family (a15 weighted location quantiles, "
    "a17/a18 trimmed means, w12 rolling MAD): per return flag, the "
    "revenue-weighted median quantity, then the revenue-weighted median "
    "of |quantity - wmedian|. ZERO floats anywhere — both medians are "
    "weighted-lower-bound picks via the integer cross-multiply "
    "cum*2 >= tot (a15's fence at p=50), so no rounding discipline at "
    "all (SURVEY 5.3 fixed-point family). 100 TB shape: the corpus "
    "collapses ONCE to the per-(flag, value) weight histogram; the "
    "deviation pass re-aggregates HISTOGRAM rows (value-cardinality-"
    "bounded, never data rows) against the group-cardinality-sized "
    "median table (broadcast join); two cumsum windows run over "
    "histogram rows only.",
)
def a19_weighted_mad(spark, sf_dir):
    from pyspark.sql import Window

    li = t(spark, sf_dir, "lineitem")
    qc = (dec("l_quantity") * 100).cast("bigint")
    wc = (dec("l_extendedprice") * 100).cast("bigint")
    h = (
        li.select(F.col("l_returnflag"), qc.alias("qc"), wc.alias("wc"))
        .groupBy("l_returnflag", "qc")
        .agg(F.sum("wc").cast("bigint").alias("w"))
    )

    def fence_pick(df, val_col, out_col):
        wcum = Window.partitionBy("l_returnflag").orderBy(val_col).rowsBetween(
            Window.unboundedPreceding, 0
        )
        wtot = Window.partitionBy("l_returnflag")
        c = df.select(
            "l_returnflag",
            val_col,
            F.sum("w").over(wcum).cast("bigint").alias("cum"),
            F.sum("w").over(wtot).cast("bigint").alias("tot"),
        )
        return c.groupBy("l_returnflag").agg(
            F.max("tot").cast("bigint").alias("tot"),
            F.min(F.when(F.col("cum") * 2 >= F.col("tot"), F.col(val_col)))
            .cast("bigint")
            .alias(out_col),
        )

    med = fence_pick(h, "qc", "wmed")
    dh = (
        h.join(F.broadcast(med), "l_returnflag")
        .select(
            "l_returnflag",
            F.abs(F.col("qc") - F.col("wmed")).alias("dev"),
            "w",
        )
        .groupBy("l_returnflag", "dev")
        .agg(F.sum("w").cast("bigint").alias("w"))
    )
    mad = fence_pick(dh, "dev", "wmad").select("l_returnflag", "wmad")
    return (
        med.join(F.broadcast(mad), "l_returnflag")
        .select(
            "l_returnflag",
            F.col("tot").alias("total_weight_cents"),
            F.col("wmed").alias("wmedian_qty_cents"),
            F.col("wmad").alias("wmad_qty_cents"),
        )
        .orderBy("l_returnflag")
    )


@register(
    "a20_weighted_skew_kurtosis",
    oracle="""
WITH c AS (
  SELECT l_returnflag,
         CAST(CAST(l_quantity AS DECIMAL(12,2)) AS BIGINT) AS v,
         CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100 AS BIGINT)
           // 100000 AS w
  FROM lineitem
), s AS (
  SELECT l_returnflag,
         CAST(SUM(w) AS BIGINT)                 AS w_total,
         CAST(SUM(w * v) AS BIGINT)             AS s1,
         CAST(SUM(w * v * v) AS BIGINT)         AS s2,
         CAST(SUM(w * v * v * v) AS BIGINT)     AS s3,
         CAST(SUM(w * v * v * v * v) AS BIGINT) AS s4
  FROM c GROUP BY l_returnflag
), m AS (
  SELECT l_returnflag, w_total, s1, s2, s3, s4,
         CAST(w_total AS HUGEINT) * s2 - CAST(s1 AS HUGEINT) * s1 AS m2x,
         (CAST(w_total AS HUGEINT) * w_total) * s3
           - 3 * (CAST(w_total AS HUGEINT) * s1) * s2
           + 2 * ((CAST(s1 AS HUGEINT) * s1) * s1) AS m3x,
         ((CAST(w_total AS HUGEINT) * w_total) * w_total) * s4
           - 4 * (CAST(w_total AS HUGEINT) * w_total) * s1 * s3
           + 6 * CAST(w_total AS HUGEINT) * (CAST(s1 AS HUGEINT) * s1) * s2
           - 3 * (((CAST(s1 AS HUGEINT) * s1) * s1) * s1) AS m4x
  FROM s
), f AS (
  SELECT l_returnflag, w_total, s1, s2, s3, s4, m2x, m3x, m4x,
         CAST(w_total AS DOUBLE) AS wd, CAST(s1 AS DOUBLE) AS s1d,
         CAST(s2 AS DOUBLE) AS s2d, CAST(s3 AS DOUBLE) AS s3d,
         CAST(s4 AS DOUBLE) AS s4d
  FROM m
), g AS (
  SELECT l_returnflag, w_total, s1, s2, s3, s4, m2x, m3x, m4x,
         (wd * s2d) - (s1d * s1d) AS m2d,
         ((wd * wd) * s3d) - (((3.0 * wd) * s1d) * s2d)
           + ((2.0 * ((s1d * s1d) * s1d))) AS m3d,
         (((wd * wd) * wd) * s4d) - ((((4.0 * (wd * wd)) * s1d) * s3d))
           + ((((6.0 * wd) * (s1d * s1d)) * s2d))
           - ((3.0 * (((s1d * s1d) * s1d) * s1d))) AS m4d
  FROM f
)
SELECT l_returnflag, w_total, s1, s2, s3, s4,
       CAST(m2x AS VARCHAR) AS m2_exact,
       CAST(m3x AS VARCHAR) AS m3_exact,
       CAST(m4x AS VARCHAR) AS m4_exact,
       CASE WHEN m2d > 0 THEN m3d / (m2d * sqrt(m2d)) END AS skew,
       CASE WHEN m2d > 0 THEN ((m4d / m2d) / m2d) - 3.0 END AS kurt_excess
FROM g ORDER BY l_returnflag
""",
    doc="A20: exact weighted skewness and excess kurtosis per return flag — "
    "completes the robust-moments family (a15 percentile / a17-a18 "
    "trimmed means / a19 MAD share the weight-histogram collapse; the "
    "3rd/4th standardized moments need no histogram AT ALL): value = "
    "quantity units (integral 1..50), weight = the line's price in "
    "integer thousand-dollar units (cents div 100000 — sub-$1000 lines "
    "carry weight 0, a documented no-op in every sum). The whole corpus "
    "collapses in ONE partial-aggregated exchange to five exact BIGINT "
    "power sums per group (W, Σwv, Σwv², Σwv³, Σwv⁴ — each provably "
    "< 2^53 at fixture scales, so their double casts are EXACT); the "
    "central-moment combinations M2 = W·S2−S1², M3 = W²S3−3WS1S2+2S1³, "
    "M4 = W³S4−4W²S1S3+6WS1²S2−3S1⁴ are computed twice: bit-exact in "
    "128-bit integer arithmetic (Spark DECIMAL(38,0) / DuckDB HUGEINT, "
    "emitted as plain-digit strings — the discriminating columns; the "
    "k$ weight unit keeps every term under 10^37 through sf0.1 and "
    "weight rescaling is SEMANTICS-FREE since g1/g2 are weight-scale-"
    "invariant, the documented 100 TB knob), and again in pure IEEE "
    "double with a pinned parenthesization shared by both engines, "
    "feeding the classic W-free forms g1 = M3/M2^1.5 (rendered "
    "m3d/(m2d·sqrt(m2d))) and g2 = M4/M2² − 3 — every float op is an "
    "IEEE-determined function of exactly-representable inputs, so the "
    "doubles hash-match without any decimal→double cast of a >2^53 "
    "value. NULL when M2 = 0 (degenerate group).",
)
def a20_weighted_skew_kurtosis(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem")
    v = dec("l_quantity").cast("bigint")
    w = F.expr("cast(cast(l_extendedprice as decimal(12,2)) * 100 as bigint) div 100000")
    c = li.select("l_returnflag", v.alias("v"), w.alias("w"))
    s = c.groupBy("l_returnflag").agg(
        F.sum("w").cast("bigint").alias("w_total"),
        F.sum(F.col("w") * F.col("v")).cast("bigint").alias("s1"),
        F.sum(F.col("w") * F.col("v") * F.col("v")).cast("bigint").alias("s2"),
        F.sum(F.col("w") * F.col("v") * F.col("v") * F.col("v"))
        .cast("bigint")
        .alias("s3"),
        F.sum(F.col("w") * F.col("v") * F.col("v") * F.col("v") * F.col("v"))
        .cast("bigint")
        .alias("s4"),
    )
    D = "decimal(38,0)"
    wx = F.col("w_total").cast(D)
    s1x = F.col("s1").cast(D)
    s2x = F.col("s2").cast(D)
    s3x = F.col("s3").cast(D)
    s4x = F.col("s4").cast(D)
    m2x = (wx * F.col("s2") - s1x * F.col("s1")).cast(D)
    m3x = (
        (wx * F.col("w_total")) * F.col("s3")
        - F.lit(3) * (wx * F.col("s1")) * F.col("s2")
        + F.lit(2) * ((s1x * F.col("s1")) * F.col("s1"))
    ).cast(D)
    m4x = (
        ((wx * F.col("w_total")) * F.col("w_total")) * F.col("s4")
        - F.lit(4) * (wx * F.col("w_total")) * F.col("s1") * F.col("s3")
        + F.lit(6) * wx * (s1x * F.col("s1")) * F.col("s2")
        - F.lit(3) * (((s1x * F.col("s1")) * F.col("s1")) * F.col("s1"))
    ).cast(D)
    m = s.select(
        "l_returnflag", "w_total", "s1", "s2", "s3", "s4",
        m2x.alias("m2x"), m3x.alias("m3x"), m4x.alias("m4x"),
    )
    wd = F.col("w_total").cast("double")
    s1d = F.col("s1").cast("double")
    s2d = F.col("s2").cast("double")
    s3d = F.col("s3").cast("double")
    s4d = F.col("s4").cast("double")
    m2d = (wd * s2d) - (s1d * s1d)
    m3d = (
        ((wd * wd) * s3d)
        - (((F.lit(3.0) * wd) * s1d) * s2d)
        + (F.lit(2.0) * ((s1d * s1d) * s1d))
    )
    m4d = (
        (((wd * wd) * wd) * s4d)
        - (((F.lit(4.0) * (wd * wd)) * s1d) * s3d)
        + (((F.lit(6.0) * wd) * (s1d * s1d)) * s2d)
        - (F.lit(3.0) * (((s1d * s1d) * s1d) * s1d))
    )
    return (
        m.select(
            "l_returnflag", "w_total", "s1", "s2", "s3", "s4",
            F.col("m2x").cast("string").alias("m2_exact"),
            F.col("m3x").cast("string").alias("m3_exact"),
            F.col("m4x").cast("string").alias("m4_exact"),
            F.when(m2d > 0, m3d / (m2d * F.sqrt(m2d))).alias("skew"),
            F.when(m2d > 0, ((m4d / m2d) / m2d) - F.lit(3.0)).alias("kurt_excess"),
        )
        .orderBy("l_returnflag")
    )


@register(
    "a21_weighted_correlation",
    oracle="""
WITH c AS (
  SELECT l_returnflag,
         CAST(CAST(l_quantity AS DECIMAL(12,2)) AS BIGINT) AS x,
         CAST(CAST(l_discount AS DECIMAL(12,2)) * 100 AS BIGINT) AS y,
         CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100 AS BIGINT)
           // 100000 AS w
  FROM lineitem
), s AS (
  SELECT l_returnflag,
         CAST(SUM(w) AS BIGINT)         AS w_total,
         CAST(SUM(w * x) AS BIGINT)     AS sx,
         CAST(SUM(w * y) AS BIGINT)     AS sy,
         CAST(SUM(w * x * y) AS BIGINT) AS sxy,
         CAST(SUM(w * x * x) AS BIGINT) AS sxx,
         CAST(SUM(w * y * y) AS BIGINT) AS syy
  FROM c GROUP BY l_returnflag
), d AS (
  SELECT l_returnflag, w_total, sx, sy, sxy,
         CAST(w_total * sxy - sx * sy AS BIGINT) AS cov_num,
         CAST(w_total * sxx - sx * sx AS BIGINT) AS var_x,
         CAST(w_total * syy - sy * sy AS BIGINT) AS var_y
  FROM s
)
SELECT l_returnflag, w_total, cov_num, var_x, var_y,
       CAST(cov_num AS DOUBLE)
         / (CAST(w_total AS DOUBLE) * CAST(w_total AS DOUBLE)) AS wcov,
       CASE WHEN var_x > 0 AND var_y > 0
            THEN CAST(cov_num AS DOUBLE)
                 / sqrt(CAST(var_x AS DOUBLE) * CAST(var_y AS DOUBLE))
       END AS wcorr
FROM d ORDER BY l_returnflag
""",
    doc="A21: grouped weighted covariance/correlation — a20's cross-moment "
    "sibling (w14 gives the ROLLING unweighted form; a21 the GROUPED "
    "weighted one): does quantity co-move with discount within a return "
    "class, with each line weighted by its price mass (k$ units, a20's "
    "scale-invariance knob)? Six exact BIGINT power sums in ONE "
    "partial-aggregated exchange; cov_num = W·Σwxy − Σwx·Σwy and both "
    "variance terms are exact BIGINTs (≤ ~1e17 at sf0.1 — inside int64, "
    "beyond 2^53, so the float renders lean on the IEEE-mandated "
    "round-to-nearest int64→double cast both engines share rather than "
    "exact representability; the bigints themselves are the "
    "discriminating columns); wcov = num/W² (cov in unit·pct per unit "
    "weight²) and wcorr = num/sqrt(var_x·var_y), each a pinned-order "
    "IEEE composition. NULL correlation for a degenerate group.",
)
def a21_weighted_correlation(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem")
    x = dec("l_quantity").cast("bigint")
    y = (dec("l_discount") * 100).cast("bigint")
    w = F.expr("cast(cast(l_extendedprice as decimal(12,2)) * 100 as bigint) div 100000")
    c = li.select("l_returnflag", x.alias("x"), y.alias("y"), w.alias("w"))
    s = c.groupBy("l_returnflag").agg(
        F.sum("w").cast("bigint").alias("w_total"),
        F.sum(F.col("w") * F.col("x")).cast("bigint").alias("sx"),
        F.sum(F.col("w") * F.col("y")).cast("bigint").alias("sy"),
        F.sum(F.col("w") * F.col("x") * F.col("y")).cast("bigint").alias("sxy"),
        F.sum(F.col("w") * F.col("x") * F.col("x")).cast("bigint").alias("sxx"),
        F.sum(F.col("w") * F.col("y") * F.col("y")).cast("bigint").alias("syy"),
    )
    num = (F.col("w_total") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("bigint")
    vx = (F.col("w_total") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("bigint")
    vy = (F.col("w_total") * F.col("syy") - F.col("sy") * F.col("sy")).cast("bigint")
    d = s.select(
        "l_returnflag", "w_total",
        num.alias("cov_num"), vx.alias("var_x"), vy.alias("var_y"),
    )
    ok = (F.col("var_x") > 0) & (F.col("var_y") > 0)
    fnum = F.col("cov_num").cast("double")
    fw = F.col("w_total").cast("double")
    return d.select(
        "l_returnflag",
        "w_total",
        "cov_num",
        "var_x",
        "var_y",
        (fnum / (fw * fw)).alias("wcov"),
        F.when(
            ok,
            fnum / F.sqrt(F.col("var_x").cast("double") * F.col("var_y").cast("double")),
        ).alias("wcorr"),
    ).orderBy("l_returnflag")


@register(
    "x56_equidepth_bins",
    oracle="""
WITH c AS (
  SELECT CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100 AS BIGINT) AS v
  FROM lineitem
), h AS (
  SELECT v, CAST(COUNT(*) AS BIGINT) AS n FROM c GROUP BY v
), cum AS (
  SELECT v, n,
         CAST(SUM(n) OVER (ORDER BY v
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cm,
         CAST(SUM(n) OVER () AS BIGINT) AS tot
  FROM h
), b AS (
  SELECT MIN(CASE WHEN cm * 8 >= 1 * tot THEN v END) AS b1,
         MIN(CASE WHEN cm * 8 >= 2 * tot THEN v END) AS b2,
         MIN(CASE WHEN cm * 8 >= 3 * tot THEN v END) AS b3,
         MIN(CASE WHEN cm * 8 >= 4 * tot THEN v END) AS b4,
         MIN(CASE WHEN cm * 8 >= 5 * tot THEN v END) AS b5,
         MIN(CASE WHEN cm * 8 >= 6 * tot THEN v END) AS b6,
         MIN(CASE WHEN cm * 8 >= 7 * tot THEN v END) AS b7
  FROM cum
), tagged AS (
  SELECT h.v, h.n,
         CAST((CASE WHEN h.v > b.b1 THEN 1 ELSE 0 END)
            + (CASE WHEN h.v > b.b2 THEN 1 ELSE 0 END)
            + (CASE WHEN h.v > b.b3 THEN 1 ELSE 0 END)
            + (CASE WHEN h.v > b.b4 THEN 1 ELSE 0 END)
            + (CASE WHEN h.v > b.b5 THEN 1 ELSE 0 END)
            + (CASE WHEN h.v > b.b6 THEN 1 ELSE 0 END)
            + (CASE WHEN h.v > b.b7 THEN 1 ELSE 0 END) AS BIGINT) AS bucket
  FROM h, b
)
SELECT bucket,
       CAST(MIN(v) AS BIGINT) AS lo_cents,
       CAST(MAX(v) AS BIGINT) AS hi_cents,
       CAST(SUM(n) AS BIGINT) AS n_rows
FROM tagged GROUP BY bucket
ORDER BY bucket
""",
    doc="X56: equi-depth histogram (8 buckets over price cents) — a9's "
    "single-percentile pick generalized to the full boundary vector, the "
    "structure behind range-partition boundaries, skew diagnosis, and "
    "optimizer-style column statistics. All seven boundaries come from "
    "ONE conditional-min aggregate over the cumulated value histogram "
    "(a15's exact integer cross-multiply cm·8 >= i·tot — no floats, no "
    "percentile interpolation), the 1-row boundary table broadcast "
    "cross-joins back to histogram rows, and bucket_id = Σ [v > b_i] "
    "(strictly-greater so each boundary value closes its bucket: buckets "
    "are [lo, b_1], (b_1, b_2], ...). Duplicates never split across "
    "buckets (they share one histogram row), so depths are as equal as "
    "the duplicate mass allows — the exact-tie behavior sketches fudge. "
    "Scale: the corpus collapses ONCE to the value histogram; "
    "everything after touches histogram rows only.",
)
def x56_equidepth_bins(spark, sf_dir):
    from pyspark.sql import Window

    li = t(spark, sf_dir, "lineitem")
    v = (dec("l_extendedprice") * 100).cast("bigint")
    h = li.select(v.alias("v")).groupBy("v").agg(F.count("*").cast("bigint").alias("n"))
    wc = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    wt = Window.partitionBy()
    cum = h.select(
        "v",
        "n",
        F.sum("n").over(wc).cast("bigint").alias("cm"),
        F.sum("n").over(wt).cast("bigint").alias("tot"),
    )
    b = cum.agg(
        *[
            F.min(F.when(F.col("cm") * 8 >= i * F.col("tot"), F.col("v"))).alias(
                f"b{i}"
            )
            for i in range(1, 8)
        ]
    )
    bucket = sum(
        (F.col("v") > F.col(f"b{i}")).cast("int") for i in range(1, 8)
    ).cast("bigint")
    return (
        h.crossJoin(F.broadcast(b))
        .select("v", "n", bucket.alias("bucket"))
        .groupBy("bucket")
        .agg(
            F.min("v").cast("bigint").alias("lo_cents"),
            F.max("v").cast("bigint").alias("hi_cents"),
            F.sum("n").cast("bigint").alias("n_rows"),
        )
        .orderBy("bucket")
    )


@register(
    "a22_count_min_sketch",
    oracle="""
WITH j4 AS (
  SELECT unnest(range(4)) AS row_id
), cells AS (
  SELECT j4.row_id,
         CAST('0x' || substr(md5(CAST(j4.row_id AS VARCHAR) || ':' ||
              CAST(l_partkey AS VARCHAR)), 1, 8) AS BIGINT) % 512 AS bucket
  FROM lineitem, j4
), sketch AS (
  SELECT row_id, bucket, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM cells GROUP BY 1, 2
), truth AS (
  SELECT l_partkey, CAST(COUNT(*) AS BIGINT) AS true_cnt
  FROM lineitem GROUP BY 1
), probes AS (
  SELECT * FROM truth ORDER BY true_cnt DESC, l_partkey LIMIT 10
), pc AS (
  SELECT p.l_partkey, p.true_cnt, j4.row_id,
         CAST('0x' || substr(md5(CAST(j4.row_id AS VARCHAR) || ':' ||
              CAST(p.l_partkey AS VARCHAR)), 1, 8) AS BIGINT) % 512 AS bucket
  FROM probes p, j4
)
SELECT pc.l_partkey, pc.true_cnt,
       CAST(MIN(s.cnt) AS BIGINT) AS cms_est,
       CAST(MIN(s.cnt) - pc.true_cnt AS BIGINT) AS overestimate
FROM pc JOIN sketch s USING (row_id, bucket)
GROUP BY pc.l_partkey, pc.true_cnt
ORDER BY pc.true_cnt DESC, pc.l_partkey
""",
    doc="A22: portable count-min sketch — the POINT-FREQUENCY member that "
    "completes the mergeable-sketch family (A14 Misra-Gries = top-k "
    "membership, A16 HLL = distinct count, A12 GK = rank; CMS answers "
    "'how often did THIS key occur' for keys chosen after the scan, "
    "which MG cannot once a key falls off its m counters). Depth 4 x "
    "width 512: each l_partkey increments one bucket per row via the "
    "a16 portable-hash discipline (first 8 md5 hex chars of 'j:key' -> "
    "BIGINT % 512), so every cell count is exact integer arithmetic on "
    "both engines. The estimate for a probe key is MIN over its 4 "
    "cells; probes are the true top-10 keys (deterministic "
    "count-desc/key tie-break), and the output carries true_cnt next "
    "to cms_est with the signed overestimate — CMS never "
    "underestimates, property-tested. 100 TB shape: the d*w=2048-cell "
    "sketch is the ONLY thing the exchange carries (groupBy(row,bucket) "
    "partial-aggregates map-side to <=2048 rows per partition whatever "
    "the corpus size), sketches from shards merge by cell-wise SUM "
    "(the CRDT property MG needs care for), and the probe join "
    "broadcasts the sketch. The exact `truth` side exists only as the "
    "audited baseline the sketch is judged against.",
)
def a22_count_min_sketch(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem")
    width, depth = 512, 4

    def bucket(j, key_col):
        h = F.conv(
            F.substring(
                F.md5(F.concat_ws(":", F.lit(str(j)), key_col)), 1, 8
            ),
            16,
            10,
        ).cast("long")
        return h % width

    key = F.col("l_partkey").cast("string")
    cells = li.select(
        F.posexplode(F.array(*[bucket(j, key) for j in range(depth)])).alias(
            "row_id", "bucket"
        )
    )
    sketch = cells.groupBy("row_id", "bucket").agg(
        F.count("*").cast("bigint").alias("cnt")
    )
    truth = li.groupBy("l_partkey").agg(
        F.count("*").cast("bigint").alias("true_cnt")
    )
    probes = truth.orderBy(F.desc("true_cnt"), F.asc("l_partkey")).limit(10)
    probe_cells = probes.select(
        "l_partkey",
        "true_cnt",
        F.posexplode(
            F.array(*[bucket(j, F.col("l_partkey").cast("string")) for j in range(depth)])
        ).alias("row_id", "bucket"),
    )
    return (
        probe_cells.join(F.broadcast(sketch), ["row_id", "bucket"])
        .groupBy("l_partkey", "true_cnt")
        .agg(F.min("cnt").cast("bigint").alias("cms_est"))
        .select(
            "l_partkey",
            "true_cnt",
            "cms_est",
            (F.col("cms_est") - F.col("true_cnt")).cast("bigint").alias("overestimate"),
        )
        .orderBy(F.desc("true_cnt"), F.asc("l_partkey"))
    )


@register(
    "a23_bitmap_distinct",
    oracle="""
WITH b AS (
  SELECT o_orderpriority AS grp,
         o_custkey // 32 AS word_idx,
         bit_or(CAST(1 AS BIGINT) << CAST(o_custkey % 32 AS INTEGER)) AS word
  FROM orders GROUP BY 1, 2
)
SELECT grp,
       CAST(COUNT(*) AS BIGINT) AS n_words,
       CAST(SUM(bit_count(word)) AS BIGINT) AS n_distinct
FROM b GROUP BY grp ORDER BY grp
""",
    doc="A23: exact distinct count as a MERGEABLE BITMAP — the dense-int-key "
    "exact companion to a16's HLL estimate (same question as a3, "
    "different structure): each customer key sets bit (key mod 32) of "
    "word (key div 32), bit_or collapses a group's keys into one BIGINT "
    "word per 32-key block, and the distinct count is the popcount sum "
    "(bit_count) over words — the roaring-bitmap idea reduced to its "
    "Spark-native core. Unlike CMS/HLL this is EXACT, and unlike "
    "count(distinct) it is a two-level partial aggregate with no "
    "expand/distinct shuffle of raw keys: the exchange carries at most "
    "keyspace/32 words per group whatever the row count, shards merge "
    "by cell-wise OR (idempotent — duplicate-INSENSITIVE where a22's "
    "SUM merge is duplicate-additive; the 10x exact-duplicate corpus "
    "reproduces the output bit-for-bit, property-tested), and at 100 TB "
    "the word count is bounded by the KEY DOMAIN, not the data: 2^31 "
    "keys fit 8 GB of words spread across the cluster. 32-bit words "
    "keep 1<<bit inside positive int64 on both engines (bit 63 would "
    "wrap signed).",
)
def a23_bitmap_distinct(spark, sf_dir):
    od = t(spark, sf_dir, "orders")
    words = (
        od.select(
            F.col("o_orderpriority").alias("grp"),
            F.expr("o_custkey div 32").alias("word_idx"),
            F.expr(
                "shiftleft(cast(1 as bigint), cast(o_custkey % 32 as int))"
            ).alias("bit"),
        )
        .groupBy("grp", "word_idx")
        .agg(F.bit_or("bit").alias("word"))
    )
    return (
        words.groupBy("grp")
        .agg(
            F.count("*").cast("bigint").alias("n_words"),
            F.sum(F.bit_count("word")).cast("bigint").alias("n_distinct"),
        )
        .orderBy("grp")
    )


@register(
    "a24_hdr_rank_sketch",
    oracle="""
WITH c AS (
  SELECT l_returnflag,
         CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100 AS BIGINT) AS cents
  FROM lineitem
), b AS (
  SELECT l_returnflag,
         (cents >> GREATEST(LENGTH(bin(cents)) - 8, 0))
           << GREATEST(LENGTH(bin(cents)) - 8, 0) AS lb
  FROM c
), hist AS (
  SELECT l_returnflag, lb, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM b GROUP BY l_returnflag, lb
), cum AS (
  SELECT l_returnflag, lb, cnt,
         SUM(cnt) OVER (PARTITION BY l_returnflag ORDER BY lb) AS cum,
         SUM(cnt) OVER (PARTITION BY l_returnflag) AS n,
         COUNT(*) OVER (PARTITION BY l_returnflag) AS n_buckets
  FROM hist
), qs(q_label, q_num, q_den) AS (
  VALUES ('p25', 1, 4), ('p50', 2, 4), ('p75', 3, 4), ('p90', 9, 10)
)
SELECT l_returnflag, q_label,
       CAST(MIN(lb) AS BIGINT) AS est_cents,
       CAST(MAX(n) AS BIGINT) AS n,
       CAST(MAX(n_buckets) AS BIGINT) AS n_buckets
FROM cum CROSS JOIN qs
WHERE cum >= (n * q_num + q_den - 1) // q_den
GROUP BY l_returnflag, q_label
ORDER BY l_returnflag, q_label
""",
    doc="A24: portable mergeable rank/quantile sketch (r11 verdict #7) — "
    "the cross-engine rank column the sketch family lacked (A12's GK "
    "summary is engine-native, registered exact-mode only). Shape: the "
    "HDR-histogram / DDSketch family (public: Tene's HdrHistogram; "
    "Masson et al., DDSketch VLDB'19) made INTEGER-EXACT so both engines "
    "agree bit-for-bit: each price in cents maps to the bucket obtained "
    "by zeroing all but its top 8 significant bits — bucket key = "
    "shiftleft(shiftright(cents, msb-8), msb-8) with msb = "
    "length(bin(cents)), i.e. a base-2 exponent bucket with 7 sub-bits, "
    "guaranteeing relative value error <= 2^-7 (<0.8%) A PRIORI (the "
    "true q-quantile lies in the picked bucket, whose width is < lb/128) "
    "— no sampling, no probability, no IEEE log whose rounding could "
    "flip a boundary. The sketch is trivially mergeable (bucket counts "
    "ADD — partition/day/shard sketches union by groupBy-sum, the a16 "
    "register discipline applied to ranks; pinned by a property test "
    "that also checks the error bound against an independent Python "
    "exact quantile). Quantile read-out: cumulative bucket counts in "
    "lb order, pick min lb with cum >= ceil(q*n) — all ceil/division "
    "in exact integer arithmetic (q rational). 100 TB shape: ONE "
    "map-side-combinable exchange of <= groups x 57*128 bucket rows "
    "(input-size-free, like a16/a22/a23); the window/read-out runs on "
    "the bucket table, never the data.",
)
def a24_hdr_rank_sketch(spark, sf_dir):
    from pyspark.sql import Window

    li = t(spark, sf_dir, "lineitem").select(
        "l_returnflag",
        (dec("l_extendedprice") * 100).cast("bigint").alias("cents"),
    )
    shift = "GREATEST(LENGTH(bin(cents)) - 8, 0)"
    hist = (
        li.withColumn("lb", F.expr(f"shiftleft(shiftright(cents, {shift}), {shift})"))
        .groupBy("l_returnflag", "lb")
        .agg(F.count("*").cast("bigint").alias("cnt"))
    )
    wg = Window.partitionBy("l_returnflag")
    cum = hist.select(
        "l_returnflag",
        "lb",
        F.sum("cnt").over(wg.orderBy("lb")).alias("cum"),
        F.sum("cnt").over(wg).alias("n"),
        F.count("*").over(wg).alias("n_buckets"),
    )
    qs = spark.createDataFrame(
        [("p25", 1, 4), ("p50", 2, 4), ("p75", 3, 4), ("p90", 9, 10)],
        "q_label string, q_num int, q_den int",
    )
    return (
        cum.crossJoin(F.broadcast(qs))
        .filter(F.col("cum") >= F.expr("(n * q_num + q_den - 1) DIV q_den"))
        .groupBy("l_returnflag", "q_label")
        .agg(
            F.min("lb").cast("bigint").alias("est_cents"),
            F.max("n").cast("bigint").alias("n"),
            F.max("n_buckets").cast("bigint").alias("n_buckets"),
        )
        .orderBy("l_returnflag", "q_label")
    )


@register(
    "a25_spacesaving_topk",
    oracle=r"""
WITH tok AS (
  SELECT unnest(regexp_split_to_array(text, '\s+')) AS token FROM documents
), cnt AS (
  SELECT token, CAST(COUNT(*) AS BIGINT) AS n FROM tok GROUP BY token
), ranked AS (
  SELECT token, n,
         CAST(row_number() OVER (ORDER BY n DESC, token) AS BIGINT) AS rank
  FROM cnt
), rival AS (
  SELECT COALESCE(MAX(CASE WHEN rank = 21 THEN n END), CAST(0 AS BIGINT))
           AS rival_n
  FROM ranked
)
SELECT rank, token, n AS est_count, CAST(0 AS BIGINT) AS err_bound,
       n AS lo_bound, n > (SELECT rival_n FROM rival) AS guaranteed
FROM ranked WHERE rank <= 20 ORDER BY rank
""",
    doc="A25: SpaceSaving heavy hitters (operators/sketches.py:ss_topk) — "
    "the heavy-hitter column's closing member beside a14's Misra-Gries, "
    "run over the SAME token stream deliberately so the two summaries' "
    "estimates are directly comparable. Where MG underestimates with one "
    "global offset, SpaceSaving OVERestimates with PER-ITEM error: a new "
    "token at capacity replaces the minimum-count item inheriting its "
    "count (est = mu + c, err = mu), so every summarized token carries a "
    "certified interval [est - err, est] ∋ true, and each top-k row gets "
    "the Metwally GUARANTEED flag — provably in the true top-k when its "
    "lower bound strictly beats every rival's upper bound (the (k+1)-th "
    "merged est, or Σ mu_p for tokens absent from every partition "
    "summary). Partition summaries merge by the mergeable-summaries rule "
    "(absent partition contributes (mu_p, mu_p)) as one token-keyed "
    "aggregate over sketch-sized rows + a broadcast Σ mu_p. Registered "
    "in EXACT MODE (m = 2^22 exceeds any partition's distinct tokens: "
    "no evictions, every mu_p = 0, est == true, err == 0, and the "
    "guaranteed flag degenerates to count > count_(k+1)) against the "
    "exact DuckDB top-20 with (count desc, token) tie-break; the m=64 "
    "eviction regime's guarantees (overestimate interval, absent <= mu, "
    "N/m survival, merge-rule validity) are property-pinned in "
    "tests/test_properties.py. The global window runs over the MERGED "
    "SKETCH (<= m * partitions rows), never the token stream.",
)
def a25_spacesaving_topk(spark, sf_dir):
    from ez_cdc_spark.operators.sketches import ss_topk

    d = t(spark, sf_dir, "documents")
    tokens = d.select(
        F.explode(F.split(F.col("text"), r"\s+")).alias("token")
    )
    return ss_topk(tokens, "token", m=1 << 22, k=20)


@register(
    "a4b_approx_distinct_anchor",
    oracle="""
SELECT CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS exact_orders,
       TRUE AS within_5pct
FROM lineitem
""",
    doc="A4b: DRIVER-VISIBLE anchor for a4 (r15 verdict 'what's wrong' #2 "
    "— the approximate op's exactness evidence lived only in pytest; this "
    "query makes the CORRECTNESS artifact itself prove it): one row with "
    "the EXACT distinct count and the boolean "
    "|approx - exact| / exact <= 0.05 computed engine-side from Spark's "
    "HLL++ at rsd=0.01. The oracle states the exact count and literal "
    "TRUE declaratively, so hash-green holds iff the sketch's estimate "
    "is within the declared 5% envelope of the true value — if the HLL "
    "ever drifts, the driver records the mismatch, no pytest needed. "
    "(a4 itself stays rows-only: DuckDB's approx_count_distinct uses "
    "different HLL parameters, so estimate-vs-estimate can never "
    "hash-match — SURVEY A4.)",
)
def a4b_approx_distinct_anchor(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem")
    # Optimization r19 (guide §2.3, measured): one agg combining a true
    # DISTINCT aggregate with approx_count_distinct makes Catalyst's
    # distinct-rewrite compute the PARTIAL HLL PER KEY GROUP — at
    # rsd=0.01 that is 1,638 sketch words (~13 KB) materialized for
    # every distinct l_orderkey before the final merge, a 1,640-column
    # intermediate the plan never needs (measured 9 s vs 2.1+2.7 s at
    # sf0.1; the ratio worsens with distinct-key count, so at 100 TB the
    # combined form is quadratic-ish in the wrong place). Compute the two
    # single-row aggregates independently and join them — identical
    # values, two clean two-phase plans.
    exact = li.agg(F.countDistinct("l_orderkey").alias("exact_orders"))
    approx = li.agg(
        F.approx_count_distinct("l_orderkey", rsd=0.01).alias("approx")
    )
    agg = exact.crossJoin(approx)
    return agg.select(
        F.col("exact_orders").cast("bigint").alias("exact_orders"),
        (
            F.abs(F.col("approx") - F.col("exact_orders"))
            / F.col("exact_orders")
            <= F.lit(0.05)
        ).alias("within_5pct"),
    )
