"""As-of join (SURVEY.md J8) — an operator Spark lacks natively.

Spark-first implementation: union-tag both sides, one window pass with
``last(..., ignorenulls)`` over rows ordered by (time, side). This is a
single shuffle on the key column — no per-row lookups, no cross product —
so it scales linearly: at 100 TB both sides shuffle once on ``by`` and the
window is a streaming pass within each key partition.

Semantics match DuckDB ``ASOF JOIN`` (match the greatest right.ts <= left.ts
per key): right-side rows sort BEFORE left-side rows at equal timestamps.

Reference parity note: the reference has no as-of join (its only dataflow is
the CDC consumer, /root/reference/python/cdc_test/main.py); this operator is
part of the declared engine surface (SURVEY.md §2b).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: str,
    value_cols: list[str],
    strict: bool = False,
    right_tiebreak: str | None = None,
) -> DataFrame:
    """For each left row, attach the most recent right row with
    right[on] <= left[on] (or < if ``strict``) within the same ``by`` key.

    ``right_tiebreak``: column on the right side that deterministically picks
    a winner among right rows sharing (by, on) — the max tiebreak wins.
    Returns all left columns plus ``value_cols`` from right (null when no
    prior right row exists).
    """
    lcols = left.columns
    # side=0 sorts right before left at equal ts => '<=' semantics;
    # strict mode sorts right after left at equal ts => '<' semantics.
    right_side = 1 if strict else 0
    left_side = 1 - right_side

    tb = F.col(right_tiebreak) if right_tiebreak else F.lit(0)
    r = right.select(
        F.col(by).alias("__by"),
        F.col(on).alias("__t"),
        F.lit(right_side).alias("__side"),
        tb.cast("long").alias("__tb"),
        F.struct(*[F.col(c) for c in value_cols]).alias("__rv"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols],
    )
    l = left.select(
        F.col(by).alias("__by"),
        F.col(on).alias("__t"),
        F.lit(left_side).alias("__side"),
        F.lit(0).cast("long").alias("__tb"),
        F.lit(None).cast(r.schema["__rv"].dataType).alias("__rv"),
        *lcols,
    )
    w = (
        Window.partitionBy("__by")
        .orderBy("__t", "__side", "__tb")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    tagged = r.unionByName(l).withColumn(
        "__matched", F.last("__rv", ignorenulls=True).over(w)
    )
    out = tagged.filter(F.col("__side") == left_side).select(
        *lcols, *[F.col(f"__matched.{c}").alias(f"r_{c}") for c in value_cols]
    )
    return out
