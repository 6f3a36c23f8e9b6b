"""Join operators J1-J9 (SURVEY.md §2b). J10/J11 (stream joins) live in
streaming_equiv.py.

Scale notes per operator are in each docstring; the common rules:
  * dims (region/nation/supplier/part/customer) are broadcast — no shuffle
    of the fact table for dim joins;
  * fact-fact joins (orders⋈lineitem) shuffle on the join key once — at
    100 TB this is the unavoidable shuffle, kept single by chaining joins on
    the same key where possible;
  * the theta/range joins are pre-filtered to equi-join + residual predicate
    form, so Catalyst plans SortMergeJoin/BHJ with a post-filter, never a
    cartesian.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ez_cdc_spark.operators.asof import asof_join
from ez_cdc_spark.operators.skew import salted_join
from ez_cdc_spark.queries import register
from ez_cdc_spark.queries._util import date_s, dec, t


@register(
    "j1_inner_revenue_per_nation",
    oracle="""
SELECT n_name,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                * (1 - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS revenue,
       CAST(COUNT(*) AS BIGINT) AS n_items
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON o_orderkey = l_orderkey
JOIN nation   ON c_nationkey = n_nationkey
GROUP BY n_name
ORDER BY n_name
""",
    doc="J1: customer⋈orders⋈lineitem⋈nation revenue rollup (SMJ on facts, BHJ on dims).",
)
def j1_inner_revenue_per_nation(spark, sf_dir):
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders")
    li = t(spark, sf_dir, "lineitem")
    n = t(spark, sf_dir, "nation")
    rev = dec("l_extendedprice") * (F.lit(1) - dec("l_discount"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(F.sum(rev).cast("double").alias("revenue"), F.count("*").alias("n_items"))
        .orderBy("n_name")
    )


@register(
    "j2_broadcast_dim_join",
    oracle="""
SELECT r_name, n_name, CAST(COUNT(*) AS BIGINT) AS n_customers
FROM customer
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name, n_name
ORDER BY r_name, n_name
""",
    doc="J2: explicit broadcast join on region/nation; plan asserted broadcast in tests.",
)
def j2_broadcast_dim_join(spark, sf_dir):
    c = t(spark, sf_dir, "customer")
    n = t(spark, sf_dir, "nation")
    r = t(spark, sf_dir, "region")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(F.count("*").alias("n_customers"))
        .orderBy("r_name", "n_name")
    )


@register(
    "j3_left_outer_zero_orders",
    oracle="""
SELECT c_custkey, c_name, CAST(COUNT(o_orderkey) AS BIGINT) AS n_orders
FROM customer
LEFT JOIN orders ON c_custkey = o_custkey
GROUP BY c_custkey, c_name
ORDER BY c_custkey
""",
    doc="J3: left outer join — customers keep a row even with zero orders.",
)
def j3_left_outer_zero_orders(spark, sf_dir):
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey", "c_name")
        .agg(F.count("o_orderkey").alias("n_orders"))
        .orderBy("c_custkey")
    )


@register(
    "j4_left_semi",
    oracle="""
SELECT c_custkey, c_mktsegment
FROM customer c
WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
ORDER BY c_custkey
""",
    doc="J4: left semi join ↔ WHERE EXISTS.",
)
def j4_left_semi(spark, sf_dir):
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "leftsemi")
        .select("c_custkey", "c_mktsegment")
        .orderBy("c_custkey")
    )


@register(
    "j5_left_anti",
    oracle="""
SELECT c_custkey, c_mktsegment
FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_orderpriority = '1-URGENT')
ORDER BY c_custkey
""",
    doc=(
        "J5: left anti join ↔ WHERE NOT EXISTS. r9: anti-joins against the "
        "URGENT-order subset (customers with no urgent order) — the r1 form "
        "anti-joined all orders, and every fixture customer has >=1 order, so "
        "the driver hash compared two empty sets (vacuous). 203 survivors at "
        "sf0.01; non-empty at every SF. The filter lands on the build side "
        "before the anti join, so it also exercises pushdown-under-anti."
    ),
)
def j5_left_anti(spark, sf_dir):
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders").filter(F.col("o_orderpriority") == "1-URGENT")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "leftanti")
        .select("c_custkey", "c_mktsegment")
        .orderBy("c_custkey")
    )


@register(
    "j6_theta_join",
    oracle="""
SELECT p_partkey, l_orderkey, l_linenumber,
       CAST(l_extendedprice AS DOUBLE) AS price,
       CAST(p_retailprice AS DOUBLE) AS retail
FROM part JOIN lineitem
  ON l_partkey = p_partkey AND l_extendedprice > 2 * p_retailprice
ORDER BY p_partkey, l_orderkey, l_linenumber
""",
    doc="J6: theta join = equi key + residual non-equi predicate (no cartesian).",
)
def j6_theta_join(spark, sf_dir):
    p = t(spark, sf_dir, "part")
    li = t(spark, sf_dir, "lineitem")
    return (
        li.join(
            F.broadcast(p),
            (li.l_partkey == p.p_partkey)
            & (li.l_extendedprice > 2 * p.p_retailprice),
        )
        .select(
            "p_partkey",
            "l_orderkey",
            "l_linenumber",
            F.col("l_extendedprice").cast("double").alias("price"),
            F.col("p_retailprice").cast("double").alias("retail"),
        )
        .orderBy("p_partkey", "l_orderkey", "l_linenumber")
    )


@register(
    "j7_range_join",
    oracle="""
SELECT a.event_id AS eid_a, b.event_id AS eid_b, a.user_id,
       CAST(date_diff('second', a.ts, b.ts) AS BIGINT) AS gap_s
FROM events a JOIN events b
  ON a.user_id = b.user_id
 AND b.event_id > a.event_id
 AND b.ts >= a.ts AND b.ts <= a.ts + INTERVAL 5 MINUTE
ORDER BY eid_a, eid_b
""",
    doc="J7: range/interval self-join — equi on user_id, residual time-band predicate.",
)
def j7_range_join(spark, sf_dir):
    e = t(spark, sf_dir, "events")
    a = e.select(
        F.col("event_id").alias("eid_a"),
        F.col("user_id"),
        F.col("ts").alias("ts_a"),
    )
    b = e.select(
        F.col("event_id").alias("eid_b"),
        F.col("user_id").alias("user_b"),
        F.col("ts").alias("ts_b"),
    )
    return (
        a.join(
            b,
            (a.user_id == b.user_b)
            & (F.col("eid_b") > F.col("eid_a"))
            & (F.col("ts_b") >= F.col("ts_a"))
            & (F.col("ts_b") <= F.col("ts_a") + F.expr("INTERVAL 5 MINUTES")),
        )
        .select(
            "eid_a",
            "eid_b",
            "user_id",
            (F.unix_timestamp("ts_b") - F.unix_timestamp("ts_a")).alias("gap_s"),
        )
        .orderBy("eid_a", "eid_b")
    )


@register(
    "j8_asof_join",
    oracle="""
SELECT p.event_id, p.user_id, strftime(p.ts, '%Y-%m-%d %H:%M:%S') AS pts,
       c.click_id AS r_event_id, CAST(c.value AS DOUBLE) AS r_value
FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase') p
ASOF LEFT JOIN (
    SELECT user_id, ts, max_by(event_id, event_id) AS click_id,
           max_by(value, event_id) AS value
    FROM events WHERE event_type = 'click' GROUP BY user_id, ts
) c ON p.user_id = c.user_id AND p.ts >= c.ts
ORDER BY p.event_id
""",
    doc="J8: as-of join (custom union+window op, operators/asof.py) ↔ DuckDB ASOF JOIN.",
)
def j8_asof_join(spark, sf_dir):
    e = t(spark, sf_dir, "events")
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    # dedupe right side to unique (user_id, ts): max event_id wins — keeps
    # tie semantics identical to the DuckDB oracle's pre-aggregation
    clicks = (
        e.filter(F.col("event_type") == "click")
        .groupBy("user_id", "ts")
        .agg(
            F.max_by("event_id", "event_id").alias("event_id"),
            F.max_by("value", "event_id").alias("value"),
        )
    )
    joined = asof_join(
        purchases, clicks, on="ts", by="user_id", value_cols=["event_id", "value"]
    )
    return joined.select(
        "event_id",
        "user_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("pts"),
        F.col("r_event_id"),
        F.col("r_value").cast("double").alias("r_value"),
    ).orderBy("event_id")


@register(
    "j9_cross_join",
    oracle="""
SELECT r_name, n_name
FROM region CROSS JOIN nation
ORDER BY r_name, n_name
""",
    doc="J9: guarded cross join (tiny dims only).",
)
def j9_cross_join(spark, sf_dir):
    r = t(spark, sf_dir, "region")
    n = t(spark, sf_dir, "nation")
    return r.crossJoin(n).select("r_name", "n_name").orderBy("r_name", "n_name")


@register(
    "j12_salted_join",
    oracle="""
SELECT o.o_orderpriority AS priority,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS revenue
FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
GROUP BY priority
ORDER BY priority
""",
    doc="J12: skew-salted equi-join — big side scattered across 16 salt "
    "values, small side replicated; hash-identical to the plain join "
    "(operators/skew.py), so the oracle is the unsalted SQL.",
)
def j12_salted_join(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem").select("l_orderkey", "l_extendedprice")
    o = t(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_orderpriority"
    )
    joined = salted_join(li, o, on=["l_orderkey"], salt=16)
    return (
        joined.groupBy(F.col("o_orderpriority").alias("priority"))
        .agg(
            F.count("*").alias("n"),
            F.sum(dec("l_extendedprice")).cast("double").alias("revenue"),
        )
        .orderBy("priority")
    )


@register(
    "j3b_full_outer",
    oracle="""
SELECT COALESCE(a.k, b.k) AS k,
       CAST(a.n_orders AS BIGINT) AS n_orders,
       CAST(b.n_events AS BIGINT) AS n_events
FROM (SELECT o_custkey AS k, COUNT(*) AS n_orders FROM orders GROUP BY o_custkey) a
FULL JOIN (SELECT user_id AS k, COUNT(*) AS n_events FROM events GROUP BY user_id) b
  ON a.k = b.k
ORDER BY k
""",
    doc="J3b: full outer join over partially-overlapping key sets (order "
    "customers vs event users) — NULL side-counts where a key exists on "
    "only one side.",
)
def j3b_full_outer(spark, sf_dir):
    o = t(spark, sf_dir, "orders")
    e = t(spark, sf_dir, "events")
    a = o.groupBy(F.col("o_custkey").alias("ka")).agg(
        F.count("*").cast("bigint").alias("n_orders")
    )
    b = e.groupBy(F.col("user_id").alias("kb")).agg(
        F.count("*").cast("bigint").alias("n_events")
    )
    return (
        a.join(b, a.ka == b.kb, "full")
        .select(
            F.coalesce(F.col("ka"), F.col("kb")).alias("k"),
            "n_orders",
            "n_events",
        )
        .orderBy("k")
    )


@register(
    "j13_bucketed_join",
    oracle="""
SELECT o_orderstatus,
       CAST(COUNT(*) AS BIGINT) AS n_items,
       CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY o_orderstatus
ORDER BY o_orderstatus
""",
    doc="J13: co-located fact-fact join over SAME-BUCKETED catalog tables — "
    "both sides written bucketBy(orderkey), so the sort-merge join runs "
    "with NO Exchange on either side (asserted in tests): the 100 TB "
    "pre-partitioning strategy, pay the shuffle once at write time. The "
    "only runtime shuffle left is the 3-group status aggregate.",
)
def j13_bucketed_join(spark, sf_dir):
    from ez_cdc_spark.sources.bucketing import bucketed_join, write_bucketed

    li = t(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("k"), "l_quantity"
    )
    o = t(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("k"), "o_orderstatus"
    )
    write_bucketed(li, "j13_lineitem_b", "k")
    write_bucketed(o, "j13_orders_b", "k")
    j = bucketed_join(spark, "j13_lineitem_b", "j13_orders_b", ["k"], force_smj=True)
    return (
        j.groupBy("o_orderstatus")
        .agg(
            F.count("*").alias("n_items"),
            F.sum(dec("l_quantity")).cast("double").alias("sum_qty"),
        )
        .orderBy("o_orderstatus")
    )


@register(
    "j14_interval_bin_join",
    oracle="""
SELECT a.event_id AS eid_a, b.event_id AS eid_b,
       CAST(date_diff('second', a.ts, b.ts) AS BIGINT) AS gap_s
FROM events a JOIN events b
  ON a.event_type = 'signup' AND b.event_type = 'error'
 AND b.ts >= a.ts AND b.ts <= a.ts + INTERVAL 1 MINUTE
ORDER BY eid_a, eid_b
""",
    doc="J14: interval join with NO equi key (every error event inside any "
    "signup's 1-minute window, across all users) — the join shape Spark "
    "degenerates to a broadcast-nested-loop/cartesian on, and the one "
    "place a naive plan dies at 100 TB (|A|x|B| comparisons). The scale "
    "technique: BIN BUCKETING — intervals explode to the fixed-width time "
    "bins they cover (window length = bin width => at most 2 bins per "
    "interval), points map to exactly one bin, and the join becomes a "
    "hash equi-join on bin id + residual range filter. Each pair can meet "
    "in at most one bin (the point side has one bin), so no dedup pass. "
    "Cost: O(|A| + |B|) shuffled rows on a high-cardinality key (one bin "
    "per minute of timeline) instead of |A|x|B| comparisons; plan "
    "asserted cartesian-free in tests/test_plans.py. Second-truncated "
    "bin edges are conservative (bins align to whole minutes), the "
    "residual compares full-precision timestamps.",
)
def j14_interval_bin_join(spark, sf_dir):
    e = t(spark, sf_dir, "events")
    bin_s = 60  # bin width == interval length: each interval spans <= 2 bins
    a = e.filter(F.col("event_type") == "signup").select(
        F.col("event_id").alias("eid_a"), F.col("ts").alias("ts_a")
    )
    b = e.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("eid_b"), F.col("ts").alias("ts_b")
    )
    lo = F.floor(F.unix_timestamp("ts_a") / bin_s).cast("long")
    hi = F.floor((F.unix_timestamp("ts_a") + bin_s) / bin_s).cast("long")
    a_bins = a.withColumn("bin", F.explode(F.sequence(lo, hi)))
    b_bins = b.withColumn(
        "bin", F.floor(F.unix_timestamp("ts_b") / bin_s).cast("long")
    )
    return (
        a_bins.join(b_bins, "bin")
        .filter(
            (F.col("ts_b") >= F.col("ts_a"))
            & (F.col("ts_b") <= F.col("ts_a") + F.expr("INTERVAL 1 MINUTES"))
        )
        .select(
            "eid_a",
            "eid_b",
            (F.unix_timestamp("ts_b") - F.unix_timestamp("ts_a")).alias("gap_s"),
        )
        .orderBy("eid_a", "eid_b")
    )


@register(
    "j15_asof_tolerance",
    oracle="""
SELECT p.event_id, p.user_id, strftime(p.ts, '%Y-%m-%d %H:%M:%S') AS pts,
       CASE WHEN date_diff('second', c.ts, p.ts) <= 600
            THEN c.click_id END AS r_event_id,
       CASE WHEN date_diff('second', c.ts, p.ts) <= 600
            THEN CAST(c.value AS DOUBLE) END AS r_value,
       CASE WHEN date_diff('second', c.ts, p.ts) <= 600
            THEN CAST(date_diff('second', c.ts, p.ts) AS BIGINT) END AS gap_s
FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase') p
ASOF LEFT JOIN (
    SELECT user_id, ts, max_by(event_id, event_id) AS click_id,
           max_by(value, event_id) AS value
    FROM events WHERE event_type = 'click' GROUP BY user_id, ts
) c ON p.user_id = c.user_id AND p.ts >= c.ts
ORDER BY p.event_id
""",
    doc="J15: as-of join WITH TOLERANCE (pandas merge_asof's `tolerance`, "
    "kdb wj's window bound — the max-staleness guard J8 lacks): each "
    "purchase takes the most recent prior click of the same user ONLY if "
    "it is at most 10 minutes old; staler matches degrade to NULL, "
    "because a quote/feature that old is semantically missing, not "
    "usable. Same union+LOCF single-exchange strategy as J8 "
    "(operators/asof.py — zero join nodes): the right row's OWN "
    "timestamp rides along in the LOCF struct, and the staleness test "
    "is a map-side post-filter on (left.ts - matched.ts), which is "
    "exactly how a tolerance generalizes the as-of without touching the "
    "window: the match is still 'latest prior', tolerance only decides "
    "whether it is USED. Oracle: DuckDB ASOF LEFT JOIN + the same CASE.",
)
def j15_asof_tolerance(spark, sf_dir):
    e = t(spark, sf_dir, "events")
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    clicks = (
        e.filter(F.col("event_type") == "click")
        .groupBy("user_id", "ts")
        .agg(
            F.max_by("event_id", "event_id").alias("event_id"),
            F.max_by("value", "event_id").alias("value"),
        )
        .withColumn("rts", F.col("ts"))
    )
    joined = asof_join(
        purchases, clicks, on="ts", by="user_id",
        value_cols=["rts", "event_id", "value"],
    )
    gap = F.unix_timestamp("ts") - F.unix_timestamp("r_rts")
    fresh = gap <= 600
    return joined.select(
        "event_id",
        "user_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("pts"),
        F.when(fresh, F.col("r_event_id")).alias("r_event_id"),
        F.when(fresh, F.col("r_value").cast("double")).alias("r_value"),
        F.when(fresh, gap.cast("bigint")).alias("gap_s"),
    ).orderBy("event_id")


@register(
    "j16_grid_proximity_join",
    oracle="""
WITH c AS (
  SELECT c_custkey,
         CAST('0x' || substr(md5('gx:' || CAST(c_custkey AS VARCHAR)), 1, 8)
              AS BIGINT) % 1000 AS x,
         CAST('0x' || substr(md5('gy:' || CAST(c_custkey AS VARCHAR)), 1, 8)
              AS BIGINT) % 1000 AS y
  FROM customer
), s AS (
  SELECT s_suppkey,
         CAST('0x' || substr(md5('sx:' || CAST(s_suppkey AS VARCHAR)), 1, 8)
              AS BIGINT) % 1000 AS x,
         CAST('0x' || substr(md5('sy:' || CAST(s_suppkey AS VARCHAR)), 1, 8)
              AS BIGINT) % 1000 AS y
  FROM supplier
)
SELECT c.c_custkey, s.s_suppkey,
       CAST(GREATEST(ABS(c.x - s.x), ABS(c.y - s.y)) AS BIGINT) AS cheb_dist
FROM c JOIN s
  ON ABS(c.x - s.x) <= 50 AND ABS(c.y - s.y) <= 50
ORDER BY c_custkey, s_suppkey
""",
    doc="J16: spatial proximity join via grid bucketing — all (customer, "
    "supplier) pairs within Chebyshev distance 50 on a deterministic "
    "1000x1000 integer plane (coordinates synthesized by the portable "
    "md5 hash so both engines see identical geometry; stands in for any "
    "lat/lon-binned geo join). The naive form is a pure theta join "
    "(quadratic — the DuckDB oracle runs exactly that, so the oracle "
    "INDEPENDENTLY verifies the bucketing logic); the engine instead "
    "bins both sides into cells of size d = 50 and explodes the smaller "
    "side into its 3x3 neighbor cells, turning the distance predicate "
    "into an EQUI-join on (cell_x, cell_y) + a map-side exact distance "
    "post-filter — cell size = radius guarantees every qualifying pair "
    "differs by at most one cell per axis, so candidates are complete. "
    "Plan-asserted cartesian-free (no BNLJ/CartesianProduct). 100 TB "
    "shape: the j14 bin-bucket recipe in two dimensions — pair "
    "generation shuffles on cell keys whose density is bounded by the "
    "data's spatial distribution (9x replication of the smaller side "
    "only), never materializing the N x M cross.",
)
def j16_grid_proximity_join(spark, sf_dir):
    def phash(prefix: str, key: str) -> F.Column:
        return (
            F.conv(
                F.substring(
                    F.md5(F.concat(F.lit(prefix), F.col(key).cast("string"))), 1, 8
                ),
                16,
                10,
            ).cast("long")
            % 1000
        )

    d = 50
    c = t(spark, sf_dir, "customer").select(
        "c_custkey",
        phash("gx:", "c_custkey").alias("x"),
        phash("gy:", "c_custkey").alias("y"),
    )
    s = t(spark, sf_dir, "supplier").select(
        "s_suppkey",
        phash("sx:", "s_suppkey").alias("x"),
        phash("sy:", "s_suppkey").alias("y"),
    )
    # Bin the big side once; explode the smaller side into its 3x3 neighbor
    # cells so the equi-join on (cx, cy) sees every candidate cell pair.
    cb = c.select(
        "c_custkey",
        F.col("x").alias("cx_pt"),
        F.col("y").alias("cy_pt"),
        F.expr(f"x div {d}").alias("cx"),
        F.expr(f"y div {d}").alias("cy"),
    )
    off = F.sequence(F.lit(-1), F.lit(1))
    sb = (
        s.select(
            "s_suppkey",
            F.col("x").alias("sx_pt"),
            F.col("y").alias("sy_pt"),
            F.expr(f"x div {d}").alias("scx"),
            F.expr(f"y div {d}").alias("scy"),
        )
        .withColumn("dx", F.explode(off))
        .withColumn("dy", F.explode(off))
        .select(
            "s_suppkey",
            "sx_pt",
            "sy_pt",
            (F.col("scx") + F.col("dx")).alias("cx"),
            (F.col("scy") + F.col("dy")).alias("cy"),
        )
    )
    return (
        cb.join(sb, ["cx", "cy"])
        .filter(
            (F.abs(F.col("cx_pt") - F.col("sx_pt")) <= d)
            & (F.abs(F.col("cy_pt") - F.col("sy_pt")) <= d)
        )
        .select(
            "c_custkey",
            "s_suppkey",
            F.greatest(
                F.abs(F.col("cx_pt") - F.col("sx_pt")),
                F.abs(F.col("cy_pt") - F.col("sy_pt")),
            )
            .cast("bigint")
            .alias("cheb_dist"),
        )
        .orderBy("c_custkey", "s_suppkey")
    )


def _j17_bloom_plan(spark, sf_dir):
    """The lazy j17 plan; correct under ANY conf, but the registered entry
    executes it with runtime Bloom-filter injection active (see j17).
    Split out so tests/test_plans.py can explain() it inside the same
    conf scope and assert might_contain/bloom_filter_agg are present."""
    li = t(spark, sf_dir, "lineitem")
    od = t(spark, sf_dir, "orders").filter(F.col("o_orderpriority") == "1-URGENT")
    return (
        li.join(od, li["l_orderkey"] == od["o_orderkey"])
        .groupBy("l_returnflag")
        .agg(
            F.count("*").cast("bigint").alias("n_lines"),
            F.sum((dec("l_extendedprice") * 100).cast("bigint"))
            .cast("bigint")
            .alias("revenue_cents"),
        )
    )


# Conf scope for j17: thresholds that let the injection rule fire on the
# small fixture. At 100 TB the DEFAULTS already fire (application side
# > 10 GB, creation side < 100 MB); only the test scale needs overrides.
_J17_CONFS = {
    # the fixture fact scan is far below the 10 GB application-side default
    "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
    # a broadcastable creation side suppresses injection (BHJ already
    # prunes); force the shuffle-join regime the rule exists for
    "spark.sql.autoBroadcastJoinThreshold": "-1",
}


@register(
    "j17_bloom_pruned_join",
    oracle="""
SELECT l_returnflag,
       CAST(COUNT(*) AS BIGINT) AS n_lines,
       CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100 AS BIGINT))
            AS BIGINT) AS revenue_cents
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE o_orderpriority = '1-URGENT'
GROUP BY l_returnflag
ORDER BY l_returnflag
""",
    doc="J17: runtime Bloom-filter-pruned shuffle join — the ROW-level "
    "sibling of s16's partition-level DPP, and the third member of the "
    "scan-avoidance family (static pushdown -> DPP -> runtime semi-join "
    "reduction): Catalyst's InjectRuntimeFilter builds a Bloom filter "
    "over the selective dimension side's join keys (bloom_filter_agg "
    "subquery) and injects might_contain(xxhash64(l_orderkey)) into the "
    "fact scan's filter, so ~4/5 of fact rows die AT THE SCAN instead of "
    "riding the shuffle to the join. At 100 TB this converts the "
    "unavoidable fact-fact exchange from O(fact) to O(matching rows) — "
    "the single biggest shuffle reducer Spark owns that no hand-written "
    "plan expresses. The op executes under a try/finally conf scope "
    "(fixture-scale thresholds; 100 TB defaults fire on their own) and "
    "materializes via localCheckpoint inside it, so the session's other "
    "queries never see the overrides; the filter is semantics-free, so "
    "the oracle is the plain join — agreement proves pruning lost "
    "nothing. Plan shape asserted in tests/test_plans.py.",
)
def j17_bloom_pruned_join(spark, sf_dir):
    old = {k: spark.conf.get(k, None) for k in _J17_CONFS}
    try:
        for k, v in _J17_CONFS.items():
            spark.conf.set(k, v)
        # materialize while the injection confs are live — the checkpointed
        # blocks are the 3-row aggregate, and the bloom-pruned plan is what
        # actually executed
        df = _j17_bloom_plan(spark, sf_dir).localCheckpoint(eager=True)
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
    return df.orderBy("l_returnflag")


@register(
    "j18_range_anti_join",
    oracle="""
SELECT p.event_id, p.user_id,
       strftime(p.ts, '%Y-%m-%d %H:%M:%S') AS ts_s,
       CAST(p.value AS DOUBLE) AS value
FROM events p
WHERE p.event_type = 'purchase'
  AND NOT EXISTS (
    SELECT 1 FROM events e
    WHERE e.event_type = 'error'
      AND e.ts >= p.ts - INTERVAL 5 MINUTES
      AND e.ts <= p.ts
  )
ORDER BY p.event_id
""",
    doc="J18: range ANTI-join with NO equi key — purchases during a "
    "system-wide quiet period (no error event, from ANY user, in the "
    "preceding 5 minutes): the attribution/exclusion shape ('discard "
    "conversions during incidents') whose naive plan is a broadcast-"
    "nested-loop ANTI over |P|x|E| comparisons — the anti twin of J14's "
    "problem, and worse, because Spark cannot even hash-partition a "
    "NOT-EXISTS range predicate. Scale path: the MATCH set is computed "
    "with J14's bin bucketing (bin width = window length 300 s, so each "
    "purchase interval explodes to exactly 2 bins and each error maps "
    "to 1; a hash equi-join on bin + residual range filter finds every "
    "violating pair in O(|P|+|E|) shuffled rows), matched purchase ids "
    "dedupe (one purchase can meet many errors), and the final step is "
    "a plain equi LEFT ANTI on event_id. Cartesian-free plan-asserted; "
    "bin edges truncate conservatively, the residual compares "
    "full-precision timestamps (j14's discipline).",
)
def j18_range_anti_join(spark, sf_dir):
    e = t(spark, sf_dir, "events")
    bin_s = 300
    p = e.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "value"
    )
    er = e.filter(F.col("event_type") == "error").select(F.col("ts").alias("ts_e"))
    lo = F.floor((F.unix_timestamp("ts") - bin_s) / bin_s).cast("long")
    hi = F.floor(F.unix_timestamp("ts") / bin_s).cast("long")
    p_bins = p.select("event_id", "ts", F.explode(F.sequence(lo, hi)).alias("bin"))
    e_bins = er.withColumn("bin", F.floor(F.unix_timestamp("ts_e") / bin_s).cast("long"))
    matched = (
        p_bins.join(e_bins, "bin")
        .filter(
            (F.col("ts_e") >= F.col("ts") - F.expr("INTERVAL 5 MINUTES"))
            & (F.col("ts_e") <= F.col("ts"))
        )
        .select("event_id")
        .distinct()
    )
    return (
        p.join(matched, "event_id", "leftanti")
        .select(
            "event_id",
            "user_id",
            F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts_s"),
            F.col("value").cast("double").alias("value"),
        )
        .orderBy("event_id")
    )


@register(
    "j19_correlated_subqueries",
    oracle="""
SELECT o.o_orderkey,
       CAST(o.o_custkey AS BIGINT) AS o_custkey,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM lineitem l
        WHERE l.l_orderkey = o.o_orderkey) AS n_items,
       (SELECT CAST(MAX(CAST(l.l_extendedprice AS DECIMAL(12,2))) AS DOUBLE)
        FROM lineitem l WHERE l.l_orderkey = o.o_orderkey) AS max_price,
       CAST(CASE WHEN EXISTS (SELECT 1 FROM lineitem l
                              WHERE l.l_orderkey = o.o_orderkey
                                AND l.l_returnflag = 'R')
                 THEN 1 ELSE 0 END AS INT) AS has_return
FROM orders o
WHERE o.o_orderdate >= TIMESTAMP '1997-06-01 00:00:00'
ORDER BY o.o_orderkey
""",
    doc="J19: correlated-subquery DECORRELATION — the SQL surface the "
    "DataFrame join rows (j1-j18) never exercise: two correlated scalar "
    "subqueries (COUNT and MAX per outer row) plus a correlated EXISTS, "
    "written as a user would write them. Executing them as written "
    "would be O(|orders| x |lineitem|) nested-loop re-scans; the engine "
    "contract is Catalyst's DecorrelateInnerQuery/RewriteCorrelated"
    "ScalarSubquery pipeline rewriting all three into key-partitioned "
    "aggregate + outer-join plans — plan-asserted: >= 2 equi-joins, "
    "zero cartesian/nested-loop nodes, so the 100 TB cost is three "
    "hash-keyed exchanges, not quadratic probing (the same class of "
    "silent rewrite as J17's bloom injection: the user writes intent, "
    "the optimizer owns the strategy). Semantics pinned cross-engine: "
    "COUNT over an empty correlation is 0 (not NULL — the classic "
    "COUNT-bug case decorrelation must preserve), MAX over it is NULL, "
    "EXISTS rendered as INT for portable stringification. DuckDB runs "
    "the IDENTICAL SQL text through its own decorrelator, so agreement "
    "checks the rewrite's semantics, not a shared implementation.",
)
def j19_correlated_subqueries(spark, sf_dir):
    t(spark, sf_dir, "orders").createOrReplaceTempView("j19_orders")
    t(spark, sf_dir, "lineitem").createOrReplaceTempView("j19_lineitem")
    return spark.sql(
        """
SELECT o.o_orderkey,
       CAST(o.o_custkey AS BIGINT) AS o_custkey,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM j19_lineitem l
        WHERE l.l_orderkey = o.o_orderkey) AS n_items,
       (SELECT CAST(MAX(CAST(l.l_extendedprice AS DECIMAL(12,2))) AS DOUBLE)
        FROM j19_lineitem l WHERE l.l_orderkey = o.o_orderkey) AS max_price,
       CAST(CASE WHEN EXISTS (SELECT 1 FROM j19_lineitem l
                              WHERE l.l_orderkey = o.o_orderkey
                                AND l.l_returnflag = 'R')
                 THEN 1 ELSE 0 END AS INT) AS has_return
FROM j19_orders o
WHERE o.o_orderdate >= TIMESTAMP '1997-06-01 00:00:00'
ORDER BY o.o_orderkey
"""
    )


@register(
    "j20_not_in_null_aware",
    oracle="""
WITH probe AS (
  SELECT DISTINCT CAST(user_id AS BIGINT) AS uid FROM events
  WHERE event_type = 'error'
), probe_null AS (
  SELECT CASE WHEN uid % 97 = 0 THEN NULL ELSE uid END AS uid FROM probe
)
SELECT 'not_in_clean' AS variant, CAST(COUNT(*) AS BIGINT) AS n
FROM customer WHERE c_custkey NOT IN (SELECT uid FROM probe)
UNION ALL
SELECT 'not_in_with_null', CAST(COUNT(*) AS BIGINT)
FROM customer WHERE c_custkey NOT IN (SELECT uid FROM probe_null)
UNION ALL
SELECT 'not_exists_with_null', CAST(COUNT(*) AS BIGINT)
FROM customer c WHERE NOT EXISTS (
  SELECT 1 FROM probe_null p WHERE p.uid = c.c_custkey)
ORDER BY variant
""",
    doc="J20: NULL-AWARE anti join — SQL's most notorious semantics trap "
    "pinned as a three-variant contract: NOT IN over a NULL-free "
    "subquery behaves like the plain anti join (j5), NOT IN over a "
    "subquery CONTAINING a NULL returns ZERO rows (x <> NULL is "
    "UNKNOWN, so no row can prove membership-absence — three-valued "
    "logic, P7's rule surfacing inside a join), while NOT EXISTS over "
    "the same null-bearing set ignores the NULL and returns the anti "
    "set — the rewrite every SQL linter tells users to make, here "
    "quantified exactly. Engine contract: a naive null-aware plan is a "
    "BroadcastNestedLoopJoin over |probe| comparisons per row; Spark's "
    "single-column optimization plans it as a BroadcastHashJoin with "
    "isNullAware=true (one hash probe + one null flag — plan-asserted), "
    "and the NULL-free / NOT EXISTS variants stay ordinary LeftAnti "
    "hash joins. At 100 TB the fact side never shuffles: all three "
    "probe sets are distinct-key dims that broadcast. DuckDB evaluates "
    "the IDENTICAL SQL through its own MARK-join machinery — agreement "
    "checks the three-valued-logic semantics, not a shared plan.",
)
def j20_not_in_null_aware(spark, sf_dir):
    t(spark, sf_dir, "customer").createOrReplaceTempView("j20_customer")
    t(spark, sf_dir, "events").createOrReplaceTempView("j20_events")
    return spark.sql(
        """
WITH probe AS (
  SELECT DISTINCT CAST(user_id AS BIGINT) AS uid FROM j20_events
  WHERE event_type = 'error'
), probe_null AS (
  SELECT CASE WHEN uid % 97 = 0 THEN NULL ELSE uid END AS uid FROM probe
)
SELECT 'not_in_clean' AS variant, CAST(COUNT(*) AS BIGINT) AS n
FROM j20_customer WHERE c_custkey NOT IN (SELECT uid FROM probe)
UNION ALL
SELECT 'not_in_with_null', CAST(COUNT(*) AS BIGINT)
FROM j20_customer WHERE c_custkey NOT IN (SELECT uid FROM probe_null)
UNION ALL
SELECT 'not_exists_with_null', CAST(COUNT(*) AS BIGINT)
FROM j20_customer c WHERE NOT EXISTS (
  SELECT 1 FROM probe_null p WHERE p.uid = c.c_custkey)
ORDER BY variant
"""
    )
