"""OHLC bar resampling (W20 batch / T28 streaming — one shared expression).

Open/close are arg-extrema WITHOUT min_by: ordv = epoch_micros * 10^14 +
(cents + 2e12) encodes (time, price) as one exact decimal integer. Neither
F.min_by (declarative struct buffer) nor a string extremum key is
UnsafeRow-mutable — either silently forces the ENTIRE aggregate into
SortAggregate, a full map-side sort of the input at 100 TB — but decimal
agg buffers ARE mutable, so this encoding keeps the whole bar in one
HashAggregate pass (batch) and in ordinary streaming aggregation state
(streaming: the same eight running scalars per open window, merged by
min/max/sum — associative and at-least-once safe under complete-mode
replay). Ties need no event_id: equal-microsecond ties fall through to
CENTS, and since open/close report cents, equal-cents duplicates are
interchangeable — deterministic by construction on both paths.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

_PAYLOAD_MOD = 100_000_000_000_000  # 10^14: payload field width
_PAYLOAD_OFF = 2_000_000_000_000  # keeps cents in +-1e12 sign-free
# Epoch-micros shift keeping the whole ordv non-negative: `%` is a
# sign-following remainder on BOTH engines, so a negative dividend (pre-1970
# ts) would decode garbage payloads consistently-but-wrongly. +1e16 µs covers
# every timestamp after ~1653-02-10 (and through ~2286 within decimal(20,0));
# the shift is a constant multiple of _PAYLOAD_MOD, so decode and ordering
# are bit-identical for post-1970 data — no oracle change.
_EPOCH_SHIFT = 10_000_000_000_000_000  # 10^16 µs


def ohlc_bars(events: DataFrame, window: str = "30 minutes") -> DataFrame:
    """Per (user_id, time bucket) open/high/low/close + integer-cents VWAP.

    Works identically on a batch DataFrame and a streaming one (groupBy +
    F.window is supported in both); callers order/sink the result.
    VWAP = SUM(cents*k)/SUM(k): two exact BIGINT sums, ONE IEEE division
    (§5.3 rule 3), NULL for zero-volume bars.
    """
    cents = F.col("value").cast("decimal(12,2)") * 100
    cents = cents.cast("bigint")
    vol = F.get_json_object("props", "$.k").cast("bigint")
    ordv = (
        (F.unix_micros(F.col("ts")) + F.lit(_EPOCH_SHIFT)).cast("decimal(20,0)")
        * F.lit(_PAYLOAD_MOD).cast("decimal(15,0)")
        + (cents + F.lit(_PAYLOAD_OFF)).cast("decimal(14,0)")
    )
    base = events.select(
        "user_id",
        "ts",
        cents.alias("cents"),
        vol.alias("vol"),
        ordv.alias("ordv"),
    )

    def payload(c):
        return (c % F.lit(_PAYLOAD_MOD) - F.lit(_PAYLOAD_OFF)).cast("bigint")

    return (
        base.groupBy("user_id", F.window("ts", window).alias("w"))
        .agg(
            F.min("ordv").alias("open_v"),
            F.max("cents").alias("high_c"),
            F.min("cents").alias("low_c"),
            F.max("ordv").alias("close_v"),
            F.sum(F.col("cents") * F.col("vol")).alias("pv"),
            F.sum("vol").alias("v"),
            F.count("*").alias("n"),
        )
        .select(
            "user_id",
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias("wstart"),
            payload(F.col("open_v")).alias("open_cents"),
            F.col("high_c").cast("bigint").alias("high_cents"),
            F.col("low_c").cast("bigint").alias("low_cents"),
            payload(F.col("close_v")).alias("close_cents"),
            F.when(
                F.col("v") > 0, F.col("pv").cast("double") / F.col("v").cast("double")
            ).alias("vwap_cents"),
            F.col("v").cast("bigint").alias("volume"),
            F.col("n").cast("bigint").alias("n_events"),
        )
    )
