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

from collections import Counter
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame

PARTIAL_SCHEMA = "token string, est bigint, err bigint"


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
            for tok, c in pdf[col].value_counts().items():
                cnt[tok] += int(c)
            if len(cnt) > m:
                vals = sorted(cnt.values(), reverse=True)
                sub = vals[m]  # (m+1)-th largest: <= m survive
                offset += sub
                cnt = Counter(
                    {t: c - sub for t, c in cnt.items() if c > sub}
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
