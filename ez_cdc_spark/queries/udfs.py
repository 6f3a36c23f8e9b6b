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
