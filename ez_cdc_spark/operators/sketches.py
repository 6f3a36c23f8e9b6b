"""Bounded-memory frequency sketches (SURVEY.md §2b A14).

Misra-Gries heavy hitters: each partition keeps at most `m` counters over an
arbitrarily large token stream, partial summaries merge by token, and the
total compression offset bounds the undercount — the classic mergeable
deterministic sketch (Misra & Gries 1982; the batch-compress form is
Metwally et al.'s space-saving merge). This is A1/x14's 100 TB escape hatch
when the *vocabulary itself* no longer fits an executor's hash aggregate:
state is O(m) per partition regardless of stream length, and the output is
O(m · partitions) rows instead of O(vocab).

Guarantees (pinned in tests/test_scale_ops.py):
  * est <= true count, and true - est <= err (the summed compression
    offsets) for EVERY token, sketched or not;
  * every token with true count > err is present in the merged sketch —
    with per-partition stream length N_p and capacity m, err <= Σ N_p/(m+1),
    so true heavy hitters always survive.
  * with m >= distinct tokens per partition nothing ever compresses:
    est == true and err == 0 — the exact mode that anchors the DuckDB
    oracle (a12's exact-mode-anchoring pattern).
"""

from __future__ import annotations

import sys
from collections import Counter
from collections.abc import Iterator

import pandas as pd

from pyspark import cloudpickle
from pyspark.sql import DataFrame

# mg_fold is called from inside the mapInPandas closure. Under an external
# driver (attestation harness: repo on the DRIVER's sys.path only), Python
# workers cannot import ez_cdc_spark, so a by-REFERENCE pickle of a
# module-level function crashes deserialization on the executor — caught by
# the /verify driver simulation. Opt this module into cloudpickle's
# by-value serialization (multimodal.py's convention); transitive
# references are stdlib-only (collections.Counter).
cloudpickle.register_pickle_by_value(sys.modules[__name__])

PARTIAL_SCHEMA = "token string, est bigint, err bigint"


def mg_fold(cnt: Counter, offset: int, batch: dict, m: int) -> tuple[Counter, int]:
    """One Misra-Gries merge-and-compress step: add a batch's exact counts,
    then if more than m counters survive, subtract the (m+1)-th largest
    value from all and drop non-positives. Pure function (property-tested
    directly in tests/test_properties.py); mg_partials drives it per Arrow
    batch. Ships BY VALUE into executor closures via the module
    registration below."""
    for tok, c in batch.items():
        cnt[tok] += int(c)
    if len(cnt) > m:
        vals = sorted(cnt.values(), reverse=True)
        sub = vals[m]  # (m+1)-th largest: <= m survive
        offset += sub
        cnt = Counter({t: c - sub for t, c in cnt.items() if c > sub})
    return cnt, offset


def mg_partials(tokens: DataFrame, col: str, m: int) -> DataFrame:
    """Per-partition Misra-Gries summaries over `tokens[col]`.

    Emits up to m (token, est, 0) rows per partition plus one
    (NULL, 0, offset) row carrying the partition's accumulated compression
    offset. Arrow-batched: each batch is counted vectorized
    (pandas value_counts) before the merge-and-compress step touches the
    bounded counter map.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cnt: Counter = Counter()
        offset = 0
        for pdf in batches:
            cnt, offset = mg_fold(
                cnt, offset, pdf[col].value_counts().to_dict(), m
            )
        out = pd.DataFrame(
            {
                "token": list(cnt.keys()) + [None],
                "est": [int(v) for v in cnt.values()] + [0],
                "err": [0] * len(cnt) + [offset],
            }
        )
        yield out.astype({"est": "int64", "err": "int64"})

    return tokens.mapInPandas(run, schema=PARTIAL_SCHEMA)


def mg_topk(tokens: DataFrame, col: str, m: int, k: int) -> DataFrame:
    """Merged heavy-hitter top-k with deterministic (count desc, token)
    tie-break and a global undercount bound attached to every row.

    Plan: mapInPandas partials (map-side, O(m) rows out per partition) →
    one token-keyed aggregate over sketch-sized rows → a global window over
    the merged sketch (≤ m·partitions rows, never the stream) → the 1-row
    err total broadcast onto the k winners.
    """
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    # Both consumers (token merge + err total) branch off the partials;
    # without pinning, each branch would re-run the full corpus pass.
    # The partials are sketch-sized (<= (m+1) rows per partition), so an
    # eager localCheckpoint pays one corpus scan and materializes a tiny
    # table (x19's pin-the-expensive-stage-once pattern).
    parts = mg_partials(tokens, col, m).localCheckpoint(eager=True)
    merged = (
        parts.filter(F.col("token").isNotNull())
        .groupBy("token")
        .agg(F.sum("est").cast("bigint").alias("est_count"))
    )
    err_total = parts.agg(F.sum("err").cast("bigint").alias("err_bound"))
    w = Window.orderBy(F.desc("est_count"), F.asc("token"))
    return (
        merged.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= k)
        .join(F.broadcast(err_total))
        .select("rank", "token", "est_count", "err_bound")
        .orderBy("rank")
    )
