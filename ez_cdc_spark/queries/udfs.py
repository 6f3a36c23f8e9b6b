"""UDF surface U1-U5 (SURVEY.md §2b). U6 (stateful) lives with streaming.

U1 exists for parity/completeness; the engine's rule is UDFs stay OUT of hot
paths (SURVEY §4.2) — U2/U3/U4 are the Arrow-vectorized forms that are
acceptable at scale.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import functions as F
from pyspark.sql.types import StringType

from ez_cdc_spark.queries import register
from ez_cdc_spark.queries._util import t


@register(
    "u1_scalar_udf",
    oracle="""
SELECT c_custkey, c_name || ':' || CAST(c_nationkey AS VARCHAR) AS tagged
FROM customer
ORDER BY c_custkey
""",
    doc="U1: row-at-a-time Python UDF (string tagging) — parity vs SQL concat.",
)
def u1_scalar_udf(spark, sf_dir):
    tag = F.udf(lambda name, nk: f"{name}:{nk}", StringType())
    return (
        t(spark, sf_dir, "customer")
        .select("c_custkey", tag("c_name", "c_nationkey").alias("tagged"))
        .orderBy("c_custkey")
    )


@register(
    "u2_pandas_udf",
    oracle="""
SELECT c_custkey, c_name || ':' || CAST(c_nationkey AS VARCHAR) AS tagged
FROM customer
ORDER BY c_custkey
""",
    doc="U2: Arrow-vectorized pandas UDF computing the same expression as U1.",
)
def u2_pandas_udf(spark, sf_dir):
    @F.pandas_udf(StringType())
    def tag(name: pd.Series, nk: pd.Series) -> pd.Series:
        return name + ":" + nk.astype(str)

    return (
        t(spark, sf_dir, "customer")
        .select("c_custkey", tag("c_name", "c_nationkey").alias("tagged"))
        .orderBy("c_custkey")
    )


@register(
    "u3_grouped_map",
    oracle="""
SELECT c_custkey, c_mktsegment,
       ROUND((c_acctbal - AVG(c_acctbal) OVER (PARTITION BY c_mktsegment))
             / stddev_samp(c_acctbal) OVER (PARTITION BY c_mktsegment), 4) AS zscore
FROM customer
ORDER BY c_custkey
""",
    doc="U3: applyInPandas per-group z-score ↔ SQL window expression.",
)
def u3_grouped_map(spark, sf_dir):
    c = t(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment", "c_acctbal")

    def normalize(pdf: pd.DataFrame) -> pd.DataFrame:
        bal = pdf["c_acctbal"]
        z = (bal - bal.mean()) / bal.std(ddof=1)
        return pd.DataFrame(
            {
                "c_custkey": pdf["c_custkey"],
                "c_mktsegment": pdf["c_mktsegment"],
                "zscore": z.round(4),
            }
        )

    return (
        c.groupBy("c_mktsegment")
        .applyInPandas(normalize, "c_custkey long, c_mktsegment string, zscore double")
        .orderBy("c_custkey")
    )


@register(
    "u4_grouped_agg_udf",
    oracle="""
SELECT l_returnflag,
       ROUND(SUM(l_extendedprice * l_quantity) / SUM(l_quantity), 4) AS weighted_price
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
""",
    doc="U4: GROUPED_AGG pandas UDF weighted mean ↔ SQL expression (ROUND 4).",
)
def u4_grouped_agg_udf(spark, sf_dir):
    @F.pandas_udf("double")
    def wmean(price: pd.Series, qty: pd.Series) -> float:
        return float((price * qty).sum() / qty.sum())

    li = t(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(F.round(wmean("l_extendedprice", "l_quantity"), 4).alias("weighted_price"))
        .orderBy("l_returnflag")
    )


@register(
    "u5_udtf",
    oracle="""
SELECT o_orderkey, CAST(unnest(generate_series(1, o_orderkey % 3 + 1)) AS BIGINT) AS i
FROM orders
WHERE o_orderkey <= 100
ORDER BY o_orderkey, i
""",
    doc="U5: Python UDTF expanding ranges (one row per 1..n) ↔ unnest(generate_series).",
)
def u5_udtf(spark, sf_dir):
    from pyspark.sql.functions import udtf

    @udtf(returnType="o_orderkey bigint, i bigint")
    class ExpandRange:
        def eval(self, key: int, n: int):
            for i in range(1, n + 1):
                yield key, i

    o = t(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 100)
    ExpandRange_registered = ExpandRange  # local UDTF usable via DataFrame API
    return (
        o.select("o_orderkey", (F.col("o_orderkey") % 3 + 1).alias("n"))
        .lateralJoin(
            ExpandRange_registered(
                F.col("o_orderkey").outer(), F.col("n").outer()
            ).alias("ex")
        )
        .select(F.col("ex.o_orderkey").alias("o_orderkey"), F.col("ex.i").alias("i"))
        .orderBy("o_orderkey", "i")
    )


@register(
    "u7_map_in_arrow",
    oracle="""
WITH v AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings
), m AS (
  SELECT vec_id, v, list_max(list_transform(v, x -> abs(x))) AS mx FROM v
), q AS (
  SELECT vec_id, CAST(len(v) AS INT) AS n_dims,
         CASE WHEN mx > 0
              THEN list_transform(v, x -> CAST(floor(x * (127.0 / mx) + 0.5)
                                               AS BIGINT))
              ELSE list_transform(v, x -> CAST(0 AS BIGINT)) END AS codes
  FROM m
)
SELECT vec_id, n_dims,
       CAST(COALESCE(list_sum(codes), 0) AS BIGINT) AS q_sum,
       CAST(COALESCE(list_min(codes), 0) AS BIGINT) AS q_min,
       CAST(COALESCE(list_max(codes), 0) AS BIGINT) AS q_max
FROM q ORDER BY vec_id
""",
    doc="U7: mapInArrow — the lowest-overhead Python extension point: the "
    "executor hands RAW Arrow RecordBatches to Python (no pandas "
    "conversion, no per-column Series materialization, unlike U2/U3's "
    "pandas path), and numpy works directly on the flattened list buffer. "
    "Computes x6d's symmetric int8 quantization (identical float "
    "evaluation shape: one divide for the scale, one multiply, explicit "
    "half-up floor — bit-identical across engines) over variable-length "
    "vectors via offset-vectorized reduceat — no per-row Python loop — "
    "and returns integer-exact per-vector summaries (sum/min/max of "
    "codes), so the oracle check needs no float rounding at all. "
    "Map-side only: no shuffle, BinaryType/list buffers stay in Arrow "
    "from executor to Python and back.",
)
def u7_map_in_arrow(spark, sf_dir):
    def quantize(batches):
        import numpy as np
        import pyarrow as pa

        for b in batches:
            ids = b.column("vec_id").to_numpy(zero_copy_only=False)
            la = b.column("embedding")
            lengths = np.asarray(la.value_lengths(), dtype=np.int64)
            flat = np.asarray(la.flatten(), dtype=np.float64)
            starts = np.zeros(len(lengths), dtype=np.int64)
            np.cumsum(lengths[:-1], out=starts[1:])
            # Zero-length vectors: an unclamped reduceat start equal to
            # len(flat) raises IndexError (empty LAST vector), and an
            # empty middle vector's segment would borrow the next
            # vector's first element. Reduce over the NON-EMPTY starts
            # only (empty vectors occupy zero flat elements, so
            # consecutive non-empty starts exactly delimit non-empty
            # vectors) and scatter back; empty segments get the defined
            # summary (mx=0.0, q_* = 0 — the oracle COALESCEs its
            # empty-list NULLs to the same 0).
            nonempty = lengths > 0
            ne_starts = starts[nonempty]
            mx = np.zeros(len(lengths), dtype=np.float64)
            if len(ne_starts):
                mx[nonempty] = np.maximum.reduceat(np.abs(flat), ne_starts)
            scale = np.where(mx > 0, np.divide(127.0, mx, where=mx > 0), 0.0)
            codes = np.floor(flat * np.repeat(scale, lengths) + 0.5)
            codes = np.where(np.repeat(mx > 0, lengths), codes, 0.0).astype(
                np.int64
            )
            zeros = np.zeros(len(lengths), dtype=np.int64)
            q_sum, q_min, q_max = zeros, zeros.copy(), zeros.copy()
            if len(ne_starts):
                q_sum[nonempty] = np.add.reduceat(codes, ne_starts)
                q_min[nonempty] = np.minimum.reduceat(codes, ne_starts)
                q_max[nonempty] = np.maximum.reduceat(codes, ne_starts)
            yield pa.RecordBatch.from_pydict(
                {
                    "vec_id": pa.array(ids, type=pa.int64()),
                    "n_dims": pa.array(lengths.astype(np.int32), type=pa.int32()),
                    "q_sum": pa.array(q_sum, type=pa.int64()),
                    "q_min": pa.array(q_min, type=pa.int64()),
                    "q_max": pa.array(q_max, type=pa.int64()),
                }
            )

    e = t(spark, sf_dir, "embeddings").select(
        F.col("vec_id").cast("bigint").alias("vec_id"), "embedding"
    )
    out = e.mapInArrow(
        quantize,
        schema="vec_id bigint, n_dims int, q_sum bigint, q_min bigint, q_max bigint",
    )
    return out.orderBy("vec_id")


@register(
    "u8_cogroup_asof",
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
    doc="U8: FlatMapCoGroupsInPandas — the one pandas-UDF entry point the "
    "U-family still lacked (u1-u5 scalar/grouped, u6 stateful, u7 "
    "mapInArrow): groupBy(user).cogroup(groupBy(user)).applyInPandas "
    "aligns BOTH sides of a key in one Python call, the escape hatch "
    "for per-key merge logic no built-in join expresses. Exercised on "
    "J8's as-of semantics (purchase ← latest prior click) so the custom "
    "path is anchored by the SAME DuckDB ASOF JOIN oracle as the "
    "engine's union+LOCF operator — two independent implementations, "
    "one hash. Determinism discipline: timestamps cross the Arrow "
    "boundary as unix_micros BIGINTs and the rendered pts string is "
    "produced JVM-side AFTER the cogroup (r10: the string was pruned "
    "from the Arrow exchange entirely — j15's render-post-join rule — "
    "so no pandas datetime/session-TZ conversion can drift and the "
    "exchange carries integers only); the per-user scan is a vectorized "
    "numpy searchsorted, not a Python row loop, and the merge body is "
    "numpy-argsort-only (r10: no per-group DataFrame.sort_values "
    "copies, direct IntegerArray mask construction — worth ~10% of the "
    "query; the remaining price is the entry point itself, priced in "
    "README). Scale: one exchange per side on the cogroup key; per-task "
    "memory is one user's rows (the same contract as u6); tie-dedupe of "
    "the right side happens Spark-side (max_by per (user, ts)) to keep "
    "the pandas step pure.",
)
def u8_cogroup_asof(spark, sf_dir):
    import numpy as np
    from pandas.arrays import IntegerArray

    e = t(spark, sf_dir, "events")
    p = e.filter(F.col("event_type") == "purchase").select(
        "event_id",
        "user_id",
        F.unix_micros(F.col("ts")).alias("tus"),
    )
    c = (
        e.filter(F.col("event_type") == "click")
        .groupBy("user_id", "ts")
        .agg(
            F.max_by("event_id", "event_id").alias("c_event_id"),
            F.max_by("value", "event_id").alias("c_value"),
        )
        .select(
            "user_id",
            F.unix_micros(F.col("ts")).alias("tus"),
            "c_event_id",
            F.col("c_value").cast("double").alias("c_value"),
        )
    )

    empty = pd.DataFrame(
        {
            "event_id": pd.array([], dtype="Int64"),
            "user_id": pd.array([], dtype="Int64"),
            "tus": pd.array([], dtype="Int64"),
            "r_event_id": pd.array([], dtype="Int64"),
            "r_value": pd.array([], dtype="float64"),
        }
    )

    def merge(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        lt = left["tus"].to_numpy()
        n = len(lt)
        if n == 0:
            return empty
        # argsort the raw arrays instead of DataFrame.sort_values: the
        # frames here are tiny (~13 rows) and the per-call fixed cost of
        # two frame copies dominated the merge body (~10% of the query
        # at sf0.1, measured).
        lo = np.argsort(lt, kind="stable")
        lt = lt[lo]
        rt = right["tus"].to_numpy()
        ro = np.argsort(rt, kind="stable")
        rt = rt[ro]
        idx = np.searchsorted(rt, lt, side="right") - 1
        hit = idx >= 0
        safe = np.where(hit, idx, 0)  # gather index; misses masked below
        if len(rt):
            eid_g = right["c_event_id"].to_numpy()[ro][safe]
            val_g = right["c_value"].to_numpy()[ro][safe]
        else:
            eid_g = np.zeros(n, dtype="int64")
            val_g = np.full(n, np.nan)
        return pd.DataFrame(
            {
                "event_id": left["event_id"].to_numpy()[lo],
                "user_id": left["user_id"].to_numpy()[lo],
                "tus": lt,
                "r_event_id": IntegerArray(
                    np.where(hit, eid_g, 0).astype("int64"), ~hit
                ),
                "r_value": np.where(hit, val_g, np.nan),
            },
            copy=False,
        )

    out = (
        p.groupBy("user_id")
        .cogroup(c.groupBy("user_id"))
        .applyInPandas(
            merge,
            schema="event_id bigint, user_id bigint, tus bigint, "
            "r_event_id bigint, r_value double",
        )
    )
    return out.select(
        "event_id",
        "user_id",
        F.date_format(F.timestamp_micros("tus"), "yyyy-MM-dd HH:mm:ss").alias(
            "pts"
        ),
        "r_event_id",
        "r_value",
    ).orderBy("event_id")
