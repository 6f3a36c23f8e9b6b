"""Window-function operators W1-W5 (SURVEY.md §2b).

Window ops shuffle once on the partition key then run as a streaming pass
per partition — the 100 TB concern is partition-key cardinality vs skew:
these all partition on high-cardinality keys (custkey/user_id/brand), never
a global Window.orderBy without partitionBy (which would single-task).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ez_cdc_spark.queries import register
from ez_cdc_spark.queries._util import date_s, dec, t


@register(
    "w1_ranking",
    oracle="""
SELECT o_custkey, o_orderkey,
       CAST(row_number()   OVER w AS BIGINT) AS rn,
       CAST(rank()         OVER w AS BIGINT) AS rnk,
       CAST(dense_rank()   OVER w AS BIGINT) AS drnk,
       CAST(ntile(4)       OVER w AS BIGINT) AS quartile,
       ROUND(percent_rank() OVER w, 6) AS prank,
       ROUND(cume_dist()    OVER w, 6) AS cdist
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)
ORDER BY o_custkey, rn
""",
    doc="W1: ranking family over (custkey, price desc) with total tie-break.",
)
def w1_ranking(spark, sf_dir):
    o = t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), "o_orderkey")
    return (
        o.select(
            "o_custkey",
            "o_orderkey",
            F.row_number().over(w).cast("bigint").alias("rn"),
            F.rank().over(w).cast("bigint").alias("rnk"),
            F.dense_rank().over(w).cast("bigint").alias("drnk"),
            F.ntile(4).over(w).cast("bigint").alias("quartile"),
            F.round(F.percent_rank().over(w), 6).alias("prank"),
            F.round(F.cume_dist().over(w), 6).alias("cdist"),
        )
        .orderBy("o_custkey", "rn")
    )


@register(
    "w2_lag_lead",
    oracle="""
SELECT user_id, event_id,
       CAST(value AS DOUBLE) AS value,
       CAST(lag(value)  OVER w AS DOUBLE) AS prev_value,
       CAST(lead(value) OVER w AS DOUBLE) AS next_value,
       CAST(value - lag(value) OVER w AS DOUBLE) AS delta
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
ORDER BY user_id, event_id
""",
    doc="W2: lag/lead offsets per user ordered by event time.",
)
def w2_lag_lead(spark, sf_dir):
    e = t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        e.select(
            "user_id",
            "event_id",
            F.col("value").cast("double").alias("value"),
            F.lag("value").over(w).cast("double").alias("prev_value"),
            F.lead("value").over(w).cast("double").alias("next_value"),
            (F.col("value") - F.lag("value").over(w)).cast("double").alias("delta"),
        )
        .orderBy("user_id", "event_id")
    )


@register(
    "w3_running_agg",
    oracle="""
SELECT o_custkey, o_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS odate,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2)))
            OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
           AS running_spend
FROM orders
ORDER BY o_custkey, o_orderkey
""",
    doc="W3: running decimal sum per customer (rows frame).",
)
def w3_running_agg(spark, sf_dir):
    o = t(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        o.select(
            "o_custkey",
            "o_orderkey",
            date_s("o_orderdate").alias("odate"),
            F.sum(dec("o_totalprice")).over(w).cast("double").alias("running_spend"),
        )
        .orderBy("o_custkey", "o_orderkey")
    )


@register(
    "w4_sliding_range",
    oracle="""
SELECT user_id, event_id,
       CAST(COUNT(*) OVER (PARTITION BY user_id ORDER BY epoch(ts)
                           RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW) AS BIGINT)
           AS events_last_hour
FROM events
ORDER BY user_id, event_id
""",
    doc="W4: 1-hour trailing count per user via RANGE frame on epoch seconds.",
)
def w4_sliding_range(spark, sf_dir):
    e = t(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_timestamp("ts"))
        .rangeBetween(-3600, 0)
    )
    return (
        e.select(
            "user_id",
            "event_id",
            F.count("*").over(w).cast("bigint").alias("events_last_hour"),
        )
        .orderBy("user_id", "event_id")
    )


@register(
    "w5_topk_per_group",
    oracle="""
SELECT p_brand, p_partkey, revenue FROM (
  SELECT p_brand, p_partkey,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                  * (1 - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS revenue,
         row_number() OVER (
             PARTITION BY p_brand
             ORDER BY SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                          * (1 - CAST(l_discount AS DECIMAL(12,2)))) DESC, p_partkey
         ) AS rn
  FROM lineitem JOIN part ON l_partkey = p_partkey
  GROUP BY p_brand, p_partkey
) WHERE rn <= 3
ORDER BY p_brand, p_partkey
""",
    doc="W5: top-3 parts by revenue per brand (agg → window rank → filter).",
)
def w5_topk_per_group(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem")
    p = t(spark, sf_dir, "part")
    rev = dec("l_extendedprice") * (F.lit(1) - dec("l_discount"))
    per_part = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("p_brand", "p_partkey")
        .agg(F.sum(rev).alias("rev_dec"))
    )
    w = Window.partitionBy("p_brand").orderBy(F.desc("rev_dec"), "p_partkey")
    return (
        per_part.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("p_brand", "p_partkey", F.col("rev_dec").cast("double").alias("revenue"))
        .orderBy("p_brand", "p_partkey")
    )


@register(
    "w6_locf_gap_fill",
    oracle="""
SELECT event_id, user_id,
       CAST(last_value(CASE WHEN event_type <> 'view'
                       THEN CAST(value AS DECIMAL(12,2)) END IGNORE NULLS)
         OVER (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS locf
FROM events
WHERE user_id < 50
ORDER BY event_id
""",
    doc="W6: last-observation-carried-forward gap fill — 'view' rows have "
    "no reading, so each row carries the latest non-null value per user "
    "(last_value ignoreNulls over a running frame, (ts, event_id) total "
    "order). The standard time-series imputation op. The carried value is "
    "cast to DOUBLE on BOTH sides: a bare DECIMAL output renders as "
    "decimal.Decimal('81.10') from Spark but float 81.1 from DuckDB's "
    "pandas conversion, failing the driver's string hash even when every "
    "value is numerically identical (r2 post-mortem; w3 convention).",
)
def w6_locf_gap_fill(spark, sf_dir):
    e = t(spark, sf_dir, "events").filter(F.col("user_id") < 50)
    reading = F.when(F.col("event_type") != "view", dec("value"))
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return e.select(
        "event_id",
        "user_id",
        F.last(reading, ignorenulls=True).over(w).cast("double").alias("locf"),
    ).orderBy("event_id")


@register(
    "w7_time_weighted_avg",
    oracle="""
WITH seq AS (
  SELECT user_id,
         CAST(value AS DECIMAL(12,2)) AS v,
         epoch_us(ts) AS t_us,
         LEAD(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS next_us
  FROM events WHERE user_id < 100
), seg AS (
  SELECT user_id, v, next_us - t_us AS dur_us
  FROM seq WHERE next_us IS NOT NULL
)
SELECT user_id,
       CAST(COUNT(*) AS BIGINT) AS n_segments,
       CAST(SUM(dur_us) AS BIGINT) AS total_us,
       ROUND(CAST(SUM(v * dur_us) AS DOUBLE)
             / NULLIF(CAST(SUM(dur_us) AS DOUBLE), 0), 6) AS twa
FROM seg
GROUP BY user_id
ORDER BY user_id
""",
    doc="W7: time-weighted average — each reading holds until the user's "
    "next event, so the mean weights every value by its holding duration "
    "(sum(v·dt)/sum(dt)): the standard sensor/position/time-series "
    "summary that a row-count average gets wrong under irregular "
    "sampling. One lead() window per user then a per-user aggregate — "
    "the same single keyed shuffle any sessionization pays. Exactness: "
    "value is DECIMAL(12,2) and duration integer micros, so every "
    "product and both sums are exact (order-free); the final division is "
    "ROUND(,6)-rendered because the engines' DECIMAL(38,2)->DOUBLE casts "
    "of the huge exact sums can differ by 1 ulp (unlike w3's small "
    "decimals).",
)
def w7_time_weighted_avg(spark, sf_dir):
    e = t(spark, sf_dir, "events").filter(F.col("user_id") < 100)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    t_us = F.unix_micros(F.col("ts"))
    seq = e.select(
        "user_id",
        dec("value").alias("v"),
        t_us.alias("t_us"),
        F.lead(t_us).over(w).alias("next_us"),
    )
    seg = seq.filter(F.col("next_us").isNotNull()).select(
        "user_id", "v", (F.col("next_us") - F.col("t_us")).alias("dur_us")
    )
    return (
        seg.groupBy("user_id")
        .agg(
            F.count("*").cast("bigint").alias("n_segments"),
            F.sum("dur_us").cast("bigint").alias("total_us"),
            # NULLIF guard: a user whose surviving events all share one
            # timestamp has total_us = 0, and Spark/DuckDB disagree on
            # double x/0 (NULL vs IEEE) — both engines emit NULL here.
            F.round(
                F.sum(F.col("v") * F.col("dur_us")).cast("double")
                / F.nullif(F.sum("dur_us").cast("double"), F.lit(0.0)),
                6,
            ).alias("twa"),
        )
        .orderBy("user_id")
    )


@register(
    "w8_funnel_conversion",
    oracle="""
WITH s AS (
  SELECT user_id,
         MIN(CASE WHEN event_type = 'signup' THEN epoch_us(ts) END) AS signup_us
  FROM events GROUP BY user_id
), j AS (
  SELECT e.user_id, COUNT(*) AS n_events, MIN(s.signup_us) AS signup_us,
         MIN(CASE WHEN e.event_type = 'purchase'
                   AND epoch_us(e.ts) >= s.signup_us
              THEN epoch_us(e.ts) END) AS convert_us
  FROM events e JOIN s ON s.user_id = e.user_id
  GROUP BY e.user_id
)
SELECT user_id,
       CAST(n_events AS BIGINT) AS n_events,
       CAST(signup_us AS BIGINT) AS signup_us,
       CAST(convert_us AS BIGINT) AS convert_us,
       CAST(convert_us - signup_us AS BIGINT) AS time_to_convert_us,
       CAST(CASE WHEN convert_us IS NOT NULL THEN 1 ELSE 0 END AS INT)
         AS converted
FROM j ORDER BY user_id
""",
    doc="W8: funnel conversion — per user, the earliest signup and the "
    "earliest purchase AT OR AFTER it (the ordered two-step funnel; a "
    "purchase before signup doesn't convert), with time-to-convert. The "
    "signup anchor is a per-user window min computed in the SAME "
    "user-keyed exchange the final aggregate uses — one shuffle total, "
    "no self-join (the oracle states it as the equivalent "
    "aggregate-then-join). Times stay integer micros end to end, so "
    "every comparison and the subtraction are exact on both engines. "
    "Users who never sign up report NULL anchor and can't convert.",
)
def w8_funnel_conversion(spark, sf_dir):
    e = t(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts"))
    w = Window.partitionBy("user_id")
    e2 = e.withColumn(
        "signup_us", F.min(F.when(F.col("event_type") == "signup", us)).over(w)
    )
    return (
        e2.groupBy("user_id")
        .agg(
            F.count("*").cast("bigint").alias("n_events"),
            F.min("signup_us").cast("bigint").alias("signup_us"),
            F.min(
                F.when(
                    (F.col("event_type") == "purchase") & (us >= F.col("signup_us")),
                    us,
                )
            )
            .cast("bigint")
            .alias("convert_us"),
        )
        .select(
            "user_id",
            "n_events",
            "signup_us",
            "convert_us",
            (F.col("convert_us") - F.col("signup_us"))
            .cast("bigint")
            .alias("time_to_convert_us"),
            F.col("convert_us").isNotNull().cast("int").alias("converted"),
        )
        .orderBy("user_id")
    )


@register(
    "w9_linear_interpolate",
    oracle="""
WITH base AS (
  SELECT event_id, user_id, ts, epoch_us(ts) AS tm,
         CASE WHEN event_type <> 'view'
              THEN CAST(value AS DECIMAL(12,2)) END AS reading
  FROM events WHERE user_id < 50
), w AS (
  SELECT *,
    last_value(reading IGNORE NULLS) OVER wb AS v0,
    last_value(CASE WHEN reading IS NOT NULL THEN tm END IGNORE NULLS)
      OVER wb AS t0,
    first_value(reading IGNORE NULLS) OVER wf AS v1,
    first_value(CASE WHEN reading IS NOT NULL THEN tm END IGNORE NULLS)
      OVER wf AS t1
  FROM base
  WINDOW wb AS (PARTITION BY user_id ORDER BY ts, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
         wf AS (PARTITION BY user_id ORDER BY ts, event_id
                ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
)
SELECT event_id, user_id,
  CASE WHEN reading IS NOT NULL THEN CAST(reading AS DOUBLE)
       WHEN v0 IS NULL THEN CAST(v1 AS DOUBLE)
       WHEN v1 IS NULL THEN CAST(v0 AS DOUBLE)
       WHEN t1 = t0 THEN CAST(v0 AS DOUBLE)
       ELSE ROUND(CAST(v0 AS DOUBLE)
            + (CAST(v1 AS DOUBLE) - CAST(v0 AS DOUBLE))
              * (CAST(tm - t0 AS DOUBLE) / CAST(t1 - t0 AS DOUBLE)), 6)
  END AS v_interp
FROM w
ORDER BY event_id
""",
    doc="W9: linear-interpolation gap fill — W6 LOCF's companion: missing "
    "readings ('view' rows) take the time-weighted value between the "
    "nearest non-null neighbors, v0 + (v1-v0)*(t-t0)/(t1-t0); leading/"
    "trailing gaps degrade to backfill/LOCF; a t1=t0 tie (same-microsecond "
    "neighbors) takes v0 on both engines. Both neighbor lookups are "
    "window passes over the SAME (user, ts, event_id) partitioning and "
    "sort — Catalyst stacks the two frame directions on one exchange + "
    "one sort, so the op costs exactly what W6 costs. Readings are exact "
    "decimals, times integer micros; the interpolated branch is one "
    "identically-parenthesized double expression ROUND(,6)-rendered, the "
    "non-interpolated branches exact-decimal casts.",
)
def w9_linear_interpolate(spark, sf_dir):
    e = t(spark, sf_dir, "events").filter(F.col("user_id") < 50)
    reading = F.when(F.col("event_type") != "view", dec("value"))
    tmic = F.unix_micros(F.col("ts"))
    w_back = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_fwd = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    v0 = F.last(reading, ignorenulls=True).over(w_back)
    t0 = F.last(F.when(reading.isNotNull(), tmic), ignorenulls=True).over(w_back)
    v1 = F.first(reading, ignorenulls=True).over(w_fwd)
    t1 = F.first(F.when(reading.isNotNull(), tmic), ignorenulls=True).over(w_fwd)
    v0d, v1d = v0.cast("double"), v1.cast("double")
    ratio = (tmic - t0).cast("double") / (t1 - t0).cast("double")
    v_interp = (
        F.when(reading.isNotNull(), reading.cast("double"))
        .when(v0.isNull(), v1d)
        .when(v1.isNull(), v0d)
        .when(t1 == t0, v0d)
        .otherwise(F.round(v0d + (v1d - v0d) * ratio, 6))
    )
    return e.select(
        "event_id", "user_id", v_interp.alias("v_interp")
    ).orderBy("event_id")


@register(
    "w10_sessionize",
    oracle="""
WITH marked AS (
  SELECT user_id, ts, event_id, CAST(value AS DECIMAL(12,2)) AS v,
         CASE WHEN lag(ts) OVER w IS NULL
                   OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 21600000000
              THEN 1 ELSE 0 END AS new_sess
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), numbered AS (
  SELECT *, SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS UNBOUNDED PRECEDING) AS session_no
  FROM marked
)
SELECT CAST(user_id AS BIGINT) AS user_id,
       CAST(session_no AS BIGINT) AS session_no,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       strftime(MIN(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
       CAST((epoch_us(MAX(ts)) - epoch_us(MIN(ts))) // 1000000 AS BIGINT)
         AS duration_s,
       CAST(SUM(v) AS DOUBLE) AS total_value
FROM numbered
GROUP BY user_id, session_no
ORDER BY user_id, session_no
""",
    doc="W10: gap-based batch sessionization — the batch companion to T4's "
    "session windows: a new session opens when a user's inter-event gap "
    "exceeds 6 h (or at their first event), sessions numbered per user by "
    "a running sum of the gap marks, then per-session count/start/"
    "duration/value rollup. Plan: ONE user-keyed exchange total — the lag "
    "test and the running sum share the (user, ts, event_id) sort, and "
    "the (user_id, session_no) groupBy's ClusteredDistribution is "
    "satisfied by the existing hash(user_id) partitioning (group keys are "
    "a superset), so Catalyst inserts no second shuffle; plan-asserted in "
    "tests. At 100 TB this scales with user cardinality — sessions are "
    "contiguous runs inside an already-sorted partition, and the rollup "
    "collapses them before anything else moves.",
)
def w10_sessionize(spark, sf_dir):
    e = t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    tmic = F.unix_micros(F.col("ts"))
    gap_us = 21600 * 1_000_000  # 6 h session gap
    new_sess = F.when(
        F.lag("ts").over(w).isNull()
        | (tmic - F.unix_micros(F.lag("ts").over(w)) > gap_us),
        1,
    ).otherwise(0)
    numbered = e.select(
        "user_id", "ts", "event_id", dec("value").alias("v"),
        new_sess.alias("new_sess"),
    ).withColumn(
        "session_no",
        F.sum("new_sess").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return (
        numbered.groupBy("user_id", F.col("session_no").cast("bigint").alias("session_no"))
        .agg(
            F.count("*").cast("bigint").alias("n_events"),
            F.date_format(F.min("ts"), "yyyy-MM-dd HH:mm:ss").alias("session_start"),
            (
                (F.unix_micros(F.max("ts")) - F.unix_micros(F.min("ts")))
                / F.lit(1_000_000)
            )
            .cast("bigint")
            .alias("duration_s"),
            F.sum("v").cast("double").alias("total_value"),
        )
        .orderBy("user_id", "session_no")
    )


@register(
    "w11_integer_ewma",
    oracle="""
WITH c AS (
  SELECT user_id, ts, event_id,
         CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT) AS cents
  FROM events
)
SELECT user_id,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(list_reduce(list(cents ORDER BY ts, event_id),
                        (a, b) -> (a + b) // 2) AS BIGINT) AS ewma_cents
FROM c GROUP BY user_id
ORDER BY user_id
""",
    doc="W11: exponential smoothing (EWMA, alpha = 1/2) per user over their "
    "event-value series — the time-series recurrence class (anomaly "
    "baselines, engagement decay) that plain window frames cannot "
    "express: s_t depends multiplicatively on s_{t-1}, not on a frame "
    "aggregate. Determinism recipe: SURVEY 5.3 fixed-point applied to a "
    "RECURRENCE — values become exact integer cents (DECIMAL*100), "
    "alpha = 1/2 makes each step s = (s_prev + c) >> 1 (operands "
    "non-negative, so shift == floor-div == DuckDB //), seeded with the "
    "first element (list_reduce's no-init fold == Spark's "
    "started-flag struct fold), total order pinned by (ts, event_id). "
    "Plan: ONE user-keyed exchange; the per-user series is collected as "
    "a sorted array and folded by a JVM higher-order function — no UDF, "
    "no per-row Python; per-user state is the array (bounded by per-user "
    "event counts; at 100 TB cap the frame with a time horizon the same "
    "way t5b bounds dedup state).",
)
def w11_integer_ewma(spark, sf_dir):
    e = t(spark, sf_dir, "events")
    cents = (dec("value") * 100).cast("bigint")
    seq = F.array_sort(
        F.collect_list(F.struct("ts", "event_id", cents.alias("cents")))
    )
    fold = F.aggregate(
        F.transform(seq, lambda s: s["cents"]),
        F.struct(
            F.lit(False).alias("started"), F.lit(0).cast("bigint").alias("s")
        ),
        lambda acc, x: F.struct(
            F.lit(True).alias("started"),
            F.when(acc["started"], F.shiftright(acc["s"] + x, 1))
            .otherwise(x)
            .alias("s"),
        ),
        lambda acc: acc["s"],
    )
    return (
        e.groupBy("user_id")
        .agg(
            F.count("*").cast("bigint").alias("n_events"),
            fold.cast("bigint").alias("ewma_cents"),
        )
        .orderBy("user_id")
    )


@register(
    "w12_rolling_mad_outlier",
    oracle="""
WITH c AS (
  SELECT user_id, ts, event_id,
         CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT) AS cents
  FROM events
), f AS (
  SELECT user_id, ts, event_id, cents,
         list_sort(list(cents) OVER w) AS arr
  FROM c
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
), m AS (
  SELECT *, CAST(len(arr) AS BIGINT) AS n, arr[(len(arr)+1)//2] AS med FROM f
), d AS (
  SELECT *,
         list_sort(list_transform(arr, x -> abs(x - med)))[(n+1)//2] AS mad
  FROM m
)
SELECT event_id, user_id, strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_s,
       cents, n AS frame_n, CAST(med AS BIGINT) AS med_cents,
       CAST(mad AS BIGINT) AS mad_cents
FROM d
WHERE n >= 5 AND abs(cents - med) > 3 * mad
ORDER BY event_id
""",
    doc="W12: rolling robust outlier detection — each event compared to the "
    "median and MAD (median absolute deviation) of its user's trailing "
    "7-event frame; |x - med| > 3*MAD with a minimum frame fill of 5 "
    "flags the spike. The robust (median-based) form survives the heavy "
    "tails that make rolling mean/stddev self-masking, and the whole "
    "pipeline is exact integer cents: lower-median = sorted[(n+1)//2] "
    "(1-indexed, PERCENTILE_DISC-style — no interpolation float), MAD is "
    "the lower-median of integer |x - med|, and the 3*MAD fence is an "
    "integer compare; zero rounding discipline needed (SURVEY 5.3 "
    "fixed-point family). Plan: ONE user-keyed exchange carries the "
    "frame window; the per-row state is the bounded 7-element frame "
    "array sorted by a JVM HOF (array_sort/transform — no UDF), so "
    "per-task memory is O(frame), not O(user history), at any scale.",
)
def w12_rolling_mad_outlier(spark, sf_dir):
    from pyspark.sql import Window

    e = t(spark, sf_dir, "events")
    cents = (dec("value") * 100).cast("bigint")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-6, 0)
    )
    arr = F.array_sort(F.collect_list(cents).over(w))
    f = e.select(
        "event_id",
        "user_id",
        "ts",
        cents.alias("cents"),
        arr.alias("arr"),
    )
    n = F.size("arr").cast("bigint")
    lower_med_idx = ((F.size("arr") + 1) / 2).cast("int")
    m = f.select(
        "*",
        n.alias("n"),
        F.element_at("arr", lower_med_idx).alias("med"),
    )
    devs = F.array_sort(
        F.transform(F.col("arr"), lambda x: F.abs(x - F.col("med")))
    )
    d = m.select("*", F.element_at(devs, lower_med_idx).alias("mad"))
    return (
        d.filter(
            (F.col("n") >= 5)
            & (F.abs(F.col("cents") - F.col("med")) > 3 * F.col("mad"))
        )
        .select(
            "event_id",
            "user_id",
            F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts_s"),
            "cents",
            F.col("n").alias("frame_n"),
            F.col("med").cast("bigint").alias("med_cents"),
            F.col("mad").cast("bigint").alias("mad_cents"),
        )
        .orderBy("event_id")
    )


# Fixed x-origin for w13's regression sums: 2020-01-01T00:00:00Z. The slope
# statistic n*Sxy - Sx*Sy / n*Sxx - Sx^2 is invariant under x -> x - c, so
# any constant works; anchoring near the data epoch keeps |x| ~ 1e8 s and
# every intermediate (n*Sxx <= 7 * 7 * (3e8)^2 ~ 4e18) inside BIGINT with no
# per-frame min() pass. Both engines floor positive sub-second epochs the
# same way (Spark unix_timestamp truncates; DuckDB epoch_us // 1000000).
_W13_EPOCH0 = 1577836800


@register(
    "w13_rolling_regression_slope",
    oracle=f"""
WITH c AS (
  SELECT user_id, ts, event_id,
         epoch_us(ts) // 1000000 - {_W13_EPOCH0} AS x,
         CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT) AS y
  FROM events
), s AS (
  SELECT user_id, ts, event_id, x, y,
         CAST(COUNT(*)   OVER w AS BIGINT) AS n,
         CAST(SUM(x)     OVER w AS BIGINT) AS sx,
         CAST(SUM(y)     OVER w AS BIGINT) AS sy,
         CAST(SUM(x * y) OVER w AS BIGINT) AS sxy,
         CAST(SUM(x * x) OVER w AS BIGINT) AS sxx
  FROM c
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
)
SELECT event_id, user_id, strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_s,
       CAST(n AS BIGINT) AS frame_n,
       CAST(n * sxy - sx * sy AS BIGINT) AS slope_num,
       CAST(n * sxx - sx * sx AS BIGINT) AS slope_den,
       CASE WHEN n * sxx - sx * sx > 0
            THEN CAST(CAST(n * sxy - sx * sy AS DOUBLE)
                      / CAST(n * sxx - sx * sx AS DOUBLE) AS DOUBLE)
       END AS slope_cents_per_s
FROM s
WHERE n >= 5
ORDER BY event_id
""",
    doc="W13: rolling linear-regression slope — per-user trend of event value "
    "over TIME across the trailing 7-event frame (the trend-detection "
    "counterpart of w12's level-outlier fence; a8b's regression family "
    "meets w12's frame machinery). All five sufficient statistics (n, "
    "Sx, Sy, Sxy, Sxx) are plain integer window SUMs over the same frame "
    "— no frame array, no HOF — because the OLS slope (n*Sxy - Sx*Sy) / "
    "(n*Sxx - Sx^2) is shift-invariant in x, so x anchors to a fixed "
    "epoch constant instead of a per-frame min and the whole pipeline "
    "stays exact BIGINT; the slope itself is ONE IEEE division of two "
    "bigint-cast doubles (SURVEY 5.3 rule 3), NULL when the frame's "
    "timestamps are all equal (den = 0). Plan: ONE user-keyed exchange "
    "carries all five window sums in a single WindowExec pass; per-task "
    "state is O(frame); nothing joins, nothing ranks data rows globally.",
)
def w13_rolling_regression_slope(spark, sf_dir):
    e = t(spark, sf_dir, "events")
    x = (F.unix_timestamp("ts") - F.lit(_W13_EPOCH0)).cast("bigint")
    y = (dec("value") * 100).cast("bigint")
    c = e.select("user_id", "ts", "event_id", x.alias("x"), y.alias("y"))
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-6, 0)
    )
    s = c.select(
        "event_id",
        "user_id",
        "ts",
        F.count("*").over(w).cast("bigint").alias("n"),
        F.sum("x").over(w).cast("bigint").alias("sx"),
        F.sum("y").over(w).cast("bigint").alias("sy"),
        F.sum(F.col("x") * F.col("y")).over(w).cast("bigint").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).over(w).cast("bigint").alias("sxx"),
    )
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    den = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    return (
        s.filter(F.col("n") >= 5)
        .select(
            "event_id",
            "user_id",
            F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts_s"),
            F.col("n").alias("frame_n"),
            num.cast("bigint").alias("slope_num"),
            den.cast("bigint").alias("slope_den"),
            F.when(den > 0, num.cast("double") / den.cast("double")).alias(
                "slope_cents_per_s"
            ),
        )
        .orderBy("event_id")
    )


@register(
    "w14_rolling_correlation",
    oracle=f"""
WITH c AS (
  SELECT user_id, ts, event_id,
         epoch_us(ts) // 1000000 - {_W13_EPOCH0} AS x,
         CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT) AS y
  FROM events
), s AS (
  SELECT user_id, ts, event_id,
         CAST(COUNT(*)   OVER w AS BIGINT) AS n,
         CAST(SUM(x)     OVER w AS BIGINT) AS sx,
         CAST(SUM(y)     OVER w AS BIGINT) AS sy,
         CAST(SUM(x * y) OVER w AS BIGINT) AS sxy,
         CAST(SUM(x * x) OVER w AS BIGINT) AS sxx,
         CAST(SUM(y * y) OVER w AS BIGINT) AS syy
  FROM c
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
), d AS (
  SELECT user_id, ts, event_id, n,
         CAST(n * sxy - sx * sy AS BIGINT) AS r_num,
         CAST(n * sxx - sx * sx AS BIGINT) AS r_den_x,
         CAST(n * syy - sy * sy AS BIGINT) AS r_den_y
  FROM s WHERE n >= 5
)
SELECT event_id, user_id, strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_s,
       CAST(n AS BIGINT) AS frame_n, r_num, r_den_x, r_den_y,
       CASE WHEN r_den_x > 0 AND r_den_y > 0
            THEN (CAST(r_num AS DOUBLE) / CAST(r_den_x AS DOUBLE))
                 * (CAST(r_num AS DOUBLE) / CAST(r_den_y AS DOUBLE))
       END AS r2,
       CASE WHEN r_den_x > 0 AND r_den_y > 0
            THEN CAST(r_num AS DOUBLE)
                 / sqrt(CAST(r_den_x AS DOUBLE) * CAST(r_den_y AS DOUBLE))
       END AS r
FROM d
ORDER BY event_id
""",
    doc="W14: rolling Pearson correlation and R² of value vs TIME over the "
    "trailing 7-event frame — w13's slope answers 'how fast is it "
    "trending'; w14 answers 'how LINEAR is the trend' (the goodness-of-"
    "fit gate an alerting rule needs before trusting the slope). Adds "
    "Syy as a sixth integer window SUM in the SAME single WindowExec "
    "pass — still one user-keyed exchange, no frame array, no HOF. The "
    "three sufficient terms r_num = n·Sxy−Sx·Sy, r_den_x = n·Sxx−Sx², "
    "r_den_y = n·Syy−Sy² are emitted as EXACT BIGINTs (the "
    "discriminating columns; r² = r_num²/(r_den_x·r_den_y) as a "
    "rational). The float renderings use only IEEE-determined ops on "
    "exactly-representable inputs: each term is < 2^53 whenever the "
    "frame spans < ~10 months (n ≤ 7 caps n²·var; event telemetry "
    "frames span hours), so bigint→double is exact and r2 = "
    "(num/dx)·(num/dy) is two IEEE divides + one multiply, r = "
    "num/sqrt(dx·dy) one multiply + sqrt + divide — bit-identical on "
    "both engines with no 128-bit arithmetic anywhere. NULL when either "
    "variance term is 0 (all-equal timestamps or values). Same "
    "degenerate-frame guard as w13 (n >= 5).",
)
def w14_rolling_correlation(spark, sf_dir):
    e = t(spark, sf_dir, "events")
    x = (F.unix_timestamp("ts") - F.lit(_W13_EPOCH0)).cast("bigint")
    y = (dec("value") * 100).cast("bigint")
    c = e.select("user_id", "ts", "event_id", x.alias("x"), y.alias("y"))
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-6, 0)
    )
    s = c.select(
        "event_id",
        "user_id",
        "ts",
        F.count("*").over(w).cast("bigint").alias("n"),
        F.sum("x").over(w).cast("bigint").alias("sx"),
        F.sum("y").over(w).cast("bigint").alias("sy"),
        F.sum(F.col("x") * F.col("y")).over(w).cast("bigint").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).over(w).cast("bigint").alias("sxx"),
        F.sum(F.col("y") * F.col("y")).over(w).cast("bigint").alias("syy"),
    )
    num = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("bigint")
    dx = (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("bigint")
    dy = (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")).cast("bigint")
    d = s.filter(F.col("n") >= 5).select(
        "event_id",
        "user_id",
        "ts",
        F.col("n").alias("frame_n"),
        num.alias("r_num"),
        dx.alias("r_den_x"),
        dy.alias("r_den_y"),
    )
    ok = (F.col("r_den_x") > 0) & (F.col("r_den_y") > 0)
    fnum = F.col("r_num").cast("double")
    fdx = F.col("r_den_x").cast("double")
    fdy = F.col("r_den_y").cast("double")
    return d.select(
        "event_id",
        "user_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts_s"),
        "frame_n",
        "r_num",
        "r_den_x",
        "r_den_y",
        F.when(ok, (fnum / fdx) * (fnum / fdy)).alias("r2"),
        F.when(ok, fnum / F.sqrt(fdx * fdy)).alias("r"),
    ).orderBy("event_id")


@register(
    "w15_cusum_drift",
    oracle="""
WITH c AS (
  SELECT user_id, ts, event_id,
         CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT) AS cents
  FROM events
), base AS (
  SELECT user_id, ts, event_id, cents,
         FIRST_VALUE(cents) OVER w AS cfirst,
         ROW_NUMBER() OVER w AS rn,
         CAST(SUM(cents) OVER w AS BIGINT) AS csum
  FROM c
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
), pre AS (
  SELECT user_id, ts, event_id,
         CAST(csum - rn * cfirst AS BIGINT) AS p
  FROM base
), run AS (
  SELECT user_id, ts, event_id, p,
         CAST(MIN(p) OVER (PARTITION BY user_id ORDER BY ts, event_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           AS runmin
  FROM pre
)
SELECT event_id, user_id, strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_s,
       CAST(p - least(CAST(0 AS BIGINT), runmin) AS BIGINT) AS cusum_cents,
       CAST(CASE WHEN p - least(CAST(0 AS BIGINT), runmin) >= 500000
                 THEN 1 ELSE 0 END AS INT) AS is_drift
FROM run
ORDER BY event_id
""",
    doc="W15: per-user CUSUM drift statistic — the classic change-point "
    "detector s_k = max(0, s_{k-1} + (c_k − c_first)) that flags a "
    "SUSTAINED shift in a user's value level (w12 flags single outliers; "
    "w11/t19 track the smoothed level; CUSUM accumulates small "
    "persistent drifts none of them alert on). The recurrence is "
    "nonlinear (the max(0,·) clamp), so it looks like a fold — but it "
    "has a CLOSED WINDOW FORM: with d_i = c_i − c_first and prefix "
    "P_k = Σd_i, s_k = P_k − min(0, min_{j<=k} P_j), because the clamp "
    "just resets the best lower anchor. That identity turns the "
    "order-sensitive fold into two plain window passes over ONE "
    "user-keyed exchange (no HOF, no collected array, no "
    "applyInPandasWithState) — the Spark-first shape: P_k itself avoids "
    "a nested-window reference via P = cumsum(cents) − rn·cfirst, so "
    "pass 1 computes first_value/row_number/cumsum in a single Window "
    "node and pass 2 takes the running min (same partitioning and "
    "ordering — Catalyst reuses the exchange AND the sort). All integer "
    "cents; drift threshold 5000.00 is an exact integer compare; the "
    "naive-recurrence equivalence is property-tested row-for-row.",
)
def w15_cusum_drift(spark, sf_dir):
    e = t(spark, sf_dir, "events")
    cents = (dec("value") * 100).cast("bigint")
    c = e.select("user_id", "ts", "event_id", cents.alias("cents"))
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    base = c.select(
        "user_id",
        "ts",
        "event_id",
        F.first("cents").over(w).alias("cfirst"),
        F.row_number().over(
            Window.partitionBy("user_id").orderBy("ts", "event_id")
        ).alias("rn"),
        F.sum("cents").over(w).cast("bigint").alias("csum"),
    )
    pre = base.select(
        "user_id",
        "ts",
        "event_id",
        (F.col("csum") - F.col("rn") * F.col("cfirst")).cast("bigint").alias("p"),
    )
    run = pre.select(
        "user_id",
        "ts",
        "event_id",
        "p",
        F.min("p").over(w).cast("bigint").alias("runmin"),
    )
    s = (F.col("p") - F.least(F.lit(0).cast("bigint"), F.col("runmin"))).cast("bigint")
    return run.select(
        "event_id",
        "user_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts_s"),
        s.alias("cusum_cents"),
        (s >= 500000).cast("int").alias("is_drift"),
    ).orderBy("event_id")


@register(
    "w16_rolling_distinct",
    oracle="""
SELECT event_id, user_id, strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_s,
       CAST(len(list_distinct(list(event_type) OVER w)) AS BIGINT)
         AS n_distinct_types,
       CAST(len(list(event_type) OVER w) AS BIGINT) AS frame_n
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
ORDER BY event_id
""",
    doc="W16: rolling DISTINCT count — how many distinct event types a "
    "user's trailing 7-event frame touches (the behavioral-diversity "
    "signal: 1 = repetitive/bot-like, 5 = exploring): COUNT(DISTINCT) "
    "is the one aggregate SQL window frames famously refuse "
    "(non-decomposable over sliding frames), so engines either "
    "re-aggregate per frame or punt; here the frame is a bounded "
    "collect_list over w12's machinery and the dedup is a JVM HOF "
    "(array_distinct + size) — per-row cost O(frame), exact, no "
    "approximation, and the whole thing rides the standard ONE "
    "user-keyed exchange with a single Window node (plan-asserted). At "
    "100 TB the frame bound (7) is the contract: state per row is the "
    "frame array, never the user's history.",
)
def w16_rolling_distinct(spark, sf_dir):
    e = t(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-6, 0)
    )
    frame = F.collect_list("event_type").over(w)
    return e.select(
        "event_id",
        "user_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts_s"),
        F.size(F.array_distinct(frame)).cast("bigint").alias("n_distinct_types"),
        F.size(frame).cast("bigint").alias("frame_n"),
    ).orderBy("event_id")


@register(
    "w17_timedecay_ewma",
    oracle="""
WITH c AS (
  SELECT user_id, event_id,
         epoch_us(ts) // 1000000 AS e,
         CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT) AS cents
  FROM events
)
SELECT user_id,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(
         list_reduce(
           list(struct_pack(e := e, c := cents, y := cents)
                ORDER BY e, event_id),
           (a, b) -> struct_pack(
             e := b.e, c := b.c,
             y := b.c + (600 * a.y) // (600 + (b.e - a.e)))
         ).y AS BIGINT) AS decayed_cents
FROM c GROUP BY user_id ORDER BY user_id
""",
    doc="W17: time-decay EWMA over IRREGULAR gaps — w11's recurrence with a "
    "decay that depends on the actual inter-event interval (w11's "
    "alpha=1/2 treats a 1-second and a 1-week gap identically; real "
    "engagement/anomaly baselines must not). Each step multiplies the "
    "running state by tau/(tau + dt) (tau = 600 s): a HYPERBOLIC decay "
    "chosen over exp(-dt/tau) deliberately — it is a RATIONAL function "
    "of integer seconds, so the whole recurrence stays in exact BIGINT "
    "arithmetic (y' = c + (600*y) div (600+dt), floor division of "
    "non-negative ints) with zero libm calls, where exp() would differ "
    "in the last ulp between the JVM and DuckDB and poison every later "
    "step of the fold (the SURVEY 5.3 fixed-point discipline applied to "
    "a TIME-VARYING recurrence; w11 = constant-decay special case). "
    "Same-timestamp ties (dt=0) decay by exactly 1 — pure accumulation. "
    "The integer quotient is computed UDF-free inside the fold as "
    "(n - n%d)/d: the adjusted numerator is exactly divisible, both "
    "operands stay under 2^53, so the IEEE division is exact and the "
    "bigint cast lossless. Plan: ONE user-keyed exchange; the series "
    "folds via JVM HOFs (array_sort + aggregate) exactly like "
    "w11/w12 — per-user state is the collected series (bounded by "
    "per-user event counts; at 100 TB a time-horizon filter bounds it "
    "the way t5b bounds dedup state).",
)
def w17_timedecay_ewma(spark, sf_dir):
    e = t(spark, sf_dir, "events")
    cents = (dec("value") * 100).cast("bigint")
    seq = F.array_sort(
        F.collect_list(
            F.struct(
                F.col("ts").cast("long").alias("e"),
                F.col("event_id").alias("event_id"),
                cents.alias("c"),
            )
        )
    )

    def step(acc, x):
        num = F.lit(600).cast("bigint") * acc["y"]
        den = F.lit(600).cast("bigint") + (x["e"] - acc["e"])
        q = ((num - num % den) / den).cast("bigint")
        return F.struct(
            F.lit(True).alias("started"),
            x["e"].alias("e"),
            F.when(acc["started"], x["c"] + q).otherwise(x["c"]).alias("y"),
        )

    fold = F.aggregate(
        seq,
        F.struct(
            F.lit(False).alias("started"),
            F.lit(0).cast("bigint").alias("e"),
            F.lit(0).cast("bigint").alias("y"),
        ),
        step,
        lambda acc: acc["y"],
    )
    return (
        e.groupBy("user_id")
        .agg(
            F.count("*").cast("bigint").alias("n_events"),
            fold.cast("bigint").alias("decayed_cents"),
        )
        .orderBy("user_id")
    )


@register(
    "w18_rolling_mode",
    oracle="""
WITH f AS (
  SELECT event_id, user_id, ts,
         list(event_type) OVER w AS arr
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
), m AS (
  SELECT event_id, user_id, ts, arr,
         list_max(list_transform(list_distinct(arr),
             x -> len(list_filter(arr, y -> y = x)))) AS mode_cnt
  FROM f
)
SELECT event_id, user_id, strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_s,
       list_min(list_filter(list_distinct(arr),
           x -> len(list_filter(arr, y -> y = x)) = mode_cnt)) AS mode_type,
       CAST(mode_cnt AS BIGINT) AS mode_cnt,
       CAST(len(arr) AS BIGINT) AS frame_n
FROM m ORDER BY event_id
""",
    doc="W18: rolling heavy hitter — each event's dominant event type over "
    "its user's trailing 7-event frame (the frame-local analog of a13's "
    "grouped deterministic mode: 'what is this user doing RIGHT NOW', "
    "where a13 answers 'overall'). Mode is the aggregate window frames "
    "refuse even harder than w16's COUNT(DISTINCT) — non-decomposable "
    "AND value-valued — solved exactly over the bounded frame array "
    "with JVM HOFs only: count per distinct element via filter/size "
    "(O(k^2) for k <= 7 distinct values — constant work, no "
    "sort-within-frame), max count, then the LEXICOGRAPHICALLY "
    "SMALLEST element among those achieving it (array_min over the "
    "argmax set) — the a13 tie-break, bit-deterministic on both "
    "engines with zero float involvement. Implementation note: a "
    "struct-accumulator list_reduce run-length fold was the first "
    "draft, but DuckDB 1.0.0 miscomputes struct folds over "
    "WINDOW-produced lists (cross-row state leakage, reproduced and "
    "documented in SURVEY §5) — the filter-count formulation sidesteps "
    "the bug and is branch-free anyway. Plan: ONE user-keyed exchange, "
    "one Window node; per-row state is the 7-element frame, never the "
    "user's history (the w12/w16 scale contract).",
)
def w18_rolling_mode(spark, sf_dir):
    e = t(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-6, 0)
    )
    # project the frame ONCE before fanning out into HOFs (the x53/t21
    # CollapseProject lesson: inlined window exprs re-evaluate per use)
    base = e.select(
        "event_id",
        "user_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts_s"),
        F.collect_list("event_type").over(w).alias("arr"),
    )
    cnt_of = lambda x: F.size(F.filter(F.col("arr"), lambda y: y == x))  # noqa: E731
    withcnt = base.select(
        "event_id",
        "user_id",
        "ts_s",
        "arr",
        F.array_max(
            F.transform(F.array_distinct("arr"), cnt_of)
        ).alias("mode_cnt_i"),
    )
    return withcnt.select(
        "event_id",
        "user_id",
        "ts_s",
        F.array_min(
            F.filter(
                F.array_distinct("arr"),
                lambda x: cnt_of(x) == F.col("mode_cnt_i"),
            )
        ).alias("mode_type"),
        F.col("mode_cnt_i").cast("bigint").alias("mode_cnt"),
        F.size("arr").cast("bigint").alias("frame_n"),
    ).orderBy("event_id")


@register(
    "w19_rolling_drawdown",
    oracle="""
WITH c AS (
  SELECT user_id, ts, event_id,
         CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT) AS cents
  FROM events
), b AS (
  SELECT user_id, ts, event_id, cents,
         CAST(MAX(cents) OVER w AS BIGINT) AS peak_cents
  FROM c
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
), d AS (
  SELECT user_id, ts, event_id, cents, peak_cents,
         CAST(peak_cents - cents AS BIGINT) AS dd_cents
  FROM b
)
SELECT event_id, user_id, strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_s,
       cents, peak_cents, dd_cents,
       CAST(MAX(dd_cents) OVER (PARTITION BY user_id ORDER BY ts, event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         AS mdd_cents
FROM d
ORDER BY event_id
""",
    doc="W19: per-user running maximum drawdown — the risk/degradation "
    "statistic completing the running-extremum family (w15 = CUSUM level "
    "SHIFT; w19 = worst peak-to-trough DECLINE to date, the quantity "
    "risk desks and SLO dashboards track): peak_k = max(c_1..c_k), "
    "dd_k = peak_k − c_k, mdd_k = max(dd_1..dd_k). The nested-window "
    "reference (a running max OVER another running max's result) is "
    "w15's trick in max form: two plain window passes sharing the SAME "
    "partitioning and ordering, so Catalyst plans ONE user-keyed "
    "exchange + one sort and stacks both Window nodes on it "
    "(plan-asserted ≤ 2 Window nodes, no join, no HOF/array state). All "
    "integer cents end to end — max/subtract never leave BIGINT, so "
    "there is no rounding discipline at all. At 100 TB: per-user series "
    "ride one exchange; state per row is O(1) (the two running maxes), "
    "never the frame or the history.",
)
def w19_rolling_drawdown(spark, sf_dir):
    e = t(spark, sf_dir, "events")
    cents = (dec("value") * 100).cast("bigint")
    c = e.select("user_id", "ts", "event_id", cents.alias("cents"))
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    b = c.select(
        "user_id",
        "ts",
        "event_id",
        "cents",
        F.max("cents").over(w).cast("bigint").alias("peak_cents"),
    )
    d = b.withColumn(
        "dd_cents", (F.col("peak_cents") - F.col("cents")).cast("bigint")
    )
    return d.select(
        "event_id",
        "user_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts_s"),
        "cents",
        "peak_cents",
        "dd_cents",
        F.max("dd_cents").over(w).cast("bigint").alias("mdd_cents"),
    ).orderBy("event_id")


@register(
    "w20_ohlc_bars",
    oracle="""
WITH b AS (
  SELECT user_id,
         strftime(to_timestamp(CAST(floor(epoch(ts) / 1800) * 1800 AS BIGINT)),
                  '%Y-%m-%d %H:%M:%S') AS wstart,
         CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT) AS cents,
         CAST(json_extract(props, '$.k') AS BIGINT) AS vol,
         CAST(epoch_us(ts) AS HUGEINT) * 100000000000000::HUGEINT
           + (CAST(CAST(value AS DECIMAL(12,2)) * 100 AS HUGEINT)
              + 2000000000000::HUGEINT) AS ordv
  FROM events
)
SELECT user_id, wstart,
       CAST(MIN(ordv) % 100000000000000::HUGEINT - 2000000000000 AS BIGINT)
         AS open_cents,
       CAST(MAX(cents) AS BIGINT) AS high_cents,
       CAST(MIN(cents) AS BIGINT) AS low_cents,
       CAST(MAX(ordv) % 100000000000000::HUGEINT - 2000000000000 AS BIGINT)
         AS close_cents,
       CASE WHEN SUM(vol) > 0
            THEN CAST(SUM(cents * vol) AS DOUBLE) / CAST(SUM(vol) AS DOUBLE)
            ELSE NULL END AS vwap_cents,
       CAST(SUM(vol) AS BIGINT) AS volume,
       CAST(COUNT(*) AS BIGINT) AS n_events
FROM b
GROUP BY user_id, wstart
ORDER BY user_id, wstart
""",
    doc="W20: per-(user, 30-min bucket) OHLC downsample bars — the telemetry "
    "resample primitive beside w7's time-weighted average (shared "
    "expression: operators/resample.py, run as a stream by t28). "
    "Open/close are "
    "arg-extrema via ONE numeric encoding: ordv = epoch_micros * 10^14 + "
    "(cents + 2e12), a DECIMAL(38,0)-class integer ordered by (time, "
    "price). Neither F.min_by (declarative struct buffer) nor a string "
    "min/max key is hash-aggregable — both force the ENTIRE aggregate "
    "into SortAggregate, a full map-side sort of the input at 100 TB — "
    "but decimal agg buffers ARE UnsafeRow-mutable, so the numeric "
    "encoding keeps the whole bar aggregate in one HashAggregate pass "
    "(plan-asserted: no SortAggregate, no Window, one keyed exchange). "
    "Determinism under ties needs no event_id: if two events share (user, "
    "bucket, microsecond), min ordv falls through to the smaller CENTS — "
    "and since open/close only report cents, equal-cents duplicates are "
    "interchangeable, so the result is total-order deterministic cross-"
    "engine by construction. Extraction is ordv % 10^14 - 2e12 (the +2e12 "
    "offset keeps the payload field sign-free for cents in +-10^12; "
    "Spark side uses exact DECIMAL(20,0)*DECIMAL(15,0)->DECIMAL(36,0) "
    "widening, DuckDB side HUGEINT — both exact integer arithmetic). "
    "VWAP: pv = SUM(cents*k), v = SUM(k) are exact BIGINTs, vwap = the "
    "single IEEE division of two exact integers (§5.3 rule 3), NULL-"
    "guarded for all-zero-volume bars (props.k is 0 for ~1% of events). "
    "At 100 TB: bar state is O(1) per (user, bucket) — eight running "
    "scalars, never the row set; the same expression runs under a "
    "watermark as a streaming bar builder (t2\'s shape).",
)
def w20_ohlc_bars(spark, sf_dir):
    from ez_cdc_spark.operators.resample import ohlc_bars

    e = t(spark, sf_dir, "events")
    return ohlc_bars(e, "30 minutes").orderBy("user_id", "wstart")


@register(
    "w21_ohlc_bar_anomaly",
    oracle="""
WITH b AS (
  SELECT user_id,
         strftime(to_timestamp(CAST(floor(epoch(ts) / 1800) * 1800 AS BIGINT)),
                  '%Y-%m-%d %H:%M:%S') AS wstart,
         CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT) AS cents,
         CAST(epoch_us(ts) AS HUGEINT) * 100000000000000::HUGEINT
           + (CAST(CAST(value AS DECIMAL(12,2)) * 100 AS HUGEINT)
              + 2000000000000::HUGEINT) AS ordv
  FROM events
), bars AS (
  SELECT user_id, wstart,
         CAST(MAX(ordv) % 100000000000000::HUGEINT - 2000000000000 AS BIGINT)
           AS close_cents
  FROM b GROUP BY user_id, wstart
), f AS (
  SELECT user_id, wstart, close_cents,
         list_sort(list(close_cents) OVER w) AS arr
  FROM bars
  WINDOW w AS (PARTITION BY user_id ORDER BY wstart
               ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
), m AS (
  SELECT *, CAST(len(arr) AS BIGINT) AS n, arr[(len(arr)+1)//2] AS med FROM f
), d AS (
  SELECT *,
         list_sort(list_transform(arr, x -> abs(x - med)))[(n+1)//2] AS mad
  FROM m
)
SELECT user_id, wstart, close_cents, n AS frame_n,
       CAST(med AS BIGINT) AS med_cents, CAST(mad AS BIGINT) AS mad_cents
FROM d
WHERE n >= 5 AND abs(close_cents - med) > 3 * mad
ORDER BY user_id, wstart
""",
    doc="W21: per-user anomaly detection on OHLC bars — the resample->detect "
    "pipeline end to end in ONE plan (r11 verdict #8): w20's bar builder "
    "(operators/resample.py, the shared batch/stream expression) feeds "
    "w12's robust median/MAD fence, applied to each bar's CLOSE against "
    "the user's trailing 7-bar frame (|close - med| > 3*MAD, minimum "
    "frame fill 5). Detecting on bars instead of raw events is the "
    "production telemetry shape: the bar layer compresses each (user, "
    "30 min) to O(1) state FIRST, so the window layer ranks bars-per-user "
    "(~2 orders of magnitude fewer rows), and the median/MAD fence keeps "
    "the heavy-tail robustness w12 pinned (a mean/stddev fence is "
    "self-masked by the very spike it hunts). Exact integer cents "
    "throughout — lower-median indexing (PERCENTILE_DISC-style, no "
    "interpolation float), integer 3*MAD compare; bar ordering within "
    "user is the wstart STRING, whose yyyy-MM-dd HH:mm:ss rendering "
    "orders chronologically on both engines. Plan-asserted: exactly TWO "
    "keyed exchanges — the bar HashAggregate's (user, bucket) partial "
    "agg and the user-keyed frame window — no SortAggregate, no UDF. At "
    "100 TB the first exchange carries eight scalars per (user, bucket) "
    "and the second one row per BAR: the detect layer's cost is bar "
    "count, never event count.",
)
def w21_ohlc_bar_anomaly(spark, sf_dir):
    from pyspark.sql import Window

    from ez_cdc_spark.operators.resample import ohlc_bars

    e = t(spark, sf_dir, "events")
    bars = ohlc_bars(e, "30 minutes").select("user_id", "wstart", "close_cents")
    w = Window.partitionBy("user_id").orderBy("wstart").rowsBetween(-6, 0)
    f = bars.select(
        "user_id",
        "wstart",
        "close_cents",
        F.array_sort(F.collect_list("close_cents").over(w)).alias("arr"),
    )
    lower_med_idx = ((F.size("arr") + 1) / 2).cast("int")
    m = f.select(
        "*",
        F.size("arr").cast("bigint").alias("n"),
        F.element_at("arr", lower_med_idx).alias("med"),
    )
    devs = F.array_sort(F.transform(F.col("arr"), lambda x: F.abs(x - F.col("med"))))
    d = m.select("*", F.element_at(devs, lower_med_idx).alias("mad"))
    return (
        d.filter(
            (F.col("n") >= 5)
            & (F.abs(F.col("close_cents") - F.col("med")) > 3 * F.col("mad"))
        )
        .select(
            "user_id",
            "wstart",
            "close_cents",
            F.col("n").alias("frame_n"),
            F.col("med").cast("bigint").alias("med_cents"),
            F.col("mad").cast("bigint").alias("mad_cents"),
        )
        .orderBy("user_id", "wstart")
    )
