"""Bounded-memory frequency sketches (SURVEY.md §2b A14, A25).

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

SpaceSaving heavy hitters (A25, Metwally et al. 2005 "Efficient Computation
of Frequent and Top-k Elements in Data Streams"): the other classic
bounded-memory summary, with the guarantees MG can't give — per-item
OVERestimates with per-item error, so every summarized token carries a
certified interval [est - err, est] ∋ true, and a top-k row can be flagged
GUARANTEED (provably in the true top-k) when its lower bound beats every
rival's upper bound. A new token arriving at capacity replaces the
minimum-count item, INHERITING its count (est = mu + c, err = mu) — the
overestimate the interval accounts for. Per-partition invariants (pinned
in tests/test_properties.py):
  * est >= true >= est - err for every summarized token;
  * an absent token's true count <= mu (the summary's minimum est once at
    capacity; 0 while never full);
  * mu <= N/m, so every token with true count > N/m is summarized.
Partition summaries merge by the mergeable-summaries rule (Agarwal et al.
2012): a token absent from a partition's summary contributes that
partition's (mu_p, mu_p) to its (est, err) — keeping BOTH bounds valid
after the sum — implemented as one token-keyed aggregate over sketch-sized
rows plus a broadcast 1-row Σ mu_p. With m >= per-partition distincts
nothing evicts, every mu_p = 0, est == true, err == 0 — the exact mode
that anchors the DuckDB oracle, including the guaranteed flag
(lower bound > max(est of rank k+1, Σ mu_p))."""

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


SS_PARTIAL_SCHEMA = "token string, est bigint, err bigint, mu bigint"


def ss_fold(
    state: dict, heap: list, batch: dict, m: int
) -> tuple[dict, list]:
    """One SpaceSaving step over a batch's exact counts: present tokens add
    their count; new tokens insert exactly while the summary has room, and
    at capacity replace the deterministic minimum — smallest (count, token)
    — inheriting its count as the overestimate error. Batch tokens fold in
    sorted order so the summary is a deterministic function of the
    partition's batch sequence. ``state`` maps token -> [est, err]; ``heap``
    is a lazy min-heap of (est, token) entries (stale entries carry an est
    below the token's current one — counts only grow while present, and a
    re-inserted token's inherited est exceeds anything it held before, so
    entry-est == current-est identifies the live entry). Pure in/out for
    the property tests; ss_partials drives it per Arrow batch."""
    import heapq

    for tok in sorted(batch):
        c = int(batch[tok])
        if tok in state:
            state[tok][0] += c
            heapq.heappush(heap, (state[tok][0], tok))
        elif len(state) < m:
            state[tok] = [c, 0]
            heapq.heappush(heap, (c, tok))
        else:
            while True:
                mu, mu_tok = heap[0]
                if mu_tok in state and state[mu_tok][0] == mu:
                    break
                heapq.heappop(heap)  # stale
            heapq.heappop(heap)
            del state[mu_tok]
            state[tok] = [mu + c, mu]
            heapq.heappush(heap, (mu + c, tok))
    return state, heap


def ss_mu(state: dict, m: int) -> int:
    """The summary's absent-token bound: the minimum est once the summary
    is at capacity (an evicted/absent token's true count cannot exceed it),
    0 while the summary never filled (absent then means never seen)."""
    if len(state) < m:
        return 0
    return min(v[0] for v in state.values())


def ss_partials(tokens: DataFrame, col: str, m: int) -> DataFrame:
    """Per-partition SpaceSaving summaries over ``tokens[col]``.

    Emits up to m (token, est, err, mu_p) rows per partition plus one
    (NULL, 0, 0, mu_p) marker row so the merge can charge this partition's
    absent-token bound to tokens it never summarized. Arrow-batched: each
    batch is counted vectorized (pandas value_counts) before the fold
    touches the bounded counter map."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        state: dict = {}
        heap: list = []
        for pdf in batches:
            state, heap = ss_fold(
                state, heap, pdf[col].value_counts().to_dict(), m
            )
        mu = ss_mu(state, m)
        out = pd.DataFrame(
            {
                "token": list(state.keys()) + [None],
                "est": [int(v[0]) for v in state.values()] + [0],
                "err": [int(v[1]) for v in state.values()] + [0],
                "mu": [mu] * (len(state) + 1),
            }
        )
        yield out.astype({"est": "int64", "err": "int64", "mu": "int64"})

    return tokens.mapInPandas(run, schema=SS_PARTIAL_SCHEMA)


def ss_topk(tokens: DataFrame, col: str, m: int, k: int) -> DataFrame:
    """Merged SpaceSaving top-k with deterministic (est desc, token)
    tie-break, per-row certified bounds, and the guaranteed-top-k flag.

    Merge rule (mergeable summaries): per token, sum (est_p, err_p) over
    partitions holding it and add mu_p for each partition that doesn't —
    computed as one token-keyed aggregate over sketch-sized rows plus a
    broadcast Σ mu_p (never a per-partition join). A row is GUARANTEED in
    the true top-k when its lower bound (est - err) strictly beats every
    rival's upper bound: the (k+1)-th merged est, or Σ mu_p for tokens
    absent from every summary — whichever is larger.

    Plan: mapInPandas partials (O(m) rows out per partition) → one
    token-keyed aggregate over ≤ m·partitions rows → a global window over
    the merged sketch → two broadcast 1-row dims (Σ mu_p, rival bound).
    """
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    # Both consumers (token merge + mu total) branch off the partials;
    # pin the corpus pass once (a14's localCheckpoint pattern).
    parts = ss_partials(tokens, col, m).localCheckpoint(eager=True)
    mu_total = parts.filter(F.col("token").isNull()).agg(
        F.sum("mu").cast("bigint").alias("mu_total")
    )
    merged = (
        parts.filter(F.col("token").isNotNull())
        .groupBy("token")
        .agg(
            F.sum("est").cast("bigint").alias("est_present"),
            F.sum("err").cast("bigint").alias("err_present"),
            F.sum("mu").cast("bigint").alias("mu_present"),
        )
        .join(F.broadcast(mu_total))
        .select(
            "token",
            (F.col("est_present") + F.col("mu_total") - F.col("mu_present"))
            .cast("bigint")
            .alias("est_count"),
            (F.col("err_present") + F.col("mu_total") - F.col("mu_present"))
            .cast("bigint")
            .alias("err_bound"),
            "mu_total",
        )
    )
    w = Window.orderBy(F.desc("est_count"), F.asc("token"))
    ranked = merged.withColumn("rank", F.row_number().over(w).cast("bigint"))
    rival = ranked.agg(
        F.max(F.when(F.col("rank") == k + 1, F.col("est_count")))
        .cast("bigint")
        .alias("rival_est")
    )
    return (
        ranked.filter(F.col("rank") <= k)
        .join(F.broadcast(rival))
        .select(
            "rank",
            "token",
            "est_count",
            "err_bound",
            (F.col("est_count") - F.col("err_bound"))
            .cast("bigint")
            .alias("lo_bound"),
            (
                (F.col("est_count") - F.col("err_bound"))
                > F.greatest(F.coalesce(F.col("rival_est"), F.lit(0)), F.col("mu_total"))
            ).alias("guaranteed"),
        )
        .orderBy("rank")
    )
