"""Query registry: the SURVEY.md §2b operator surface.

Each query is registered once with (a) a Spark callable ``(spark, sf_dir) ->
DataFrame`` and (b) its DuckDB oracle SQL (or None for non-SQL-expressible
ops, which get a weaker rows-only check). ``__spark_entry__.py`` exposes the
registry to the correctness driver.

Determinism rules applied everywhere (SURVEY.md §5.3):
  * total ORDER BY over output columns,
  * monetary doubles CAST to DECIMAL(12,2) before aggregation, final
    aggregates rendered as ROUND(..., k) cast to DOUBLE (bit-identical on
    both engines because the pre-round arithmetic is exact decimal),
  * session TZ pinned UTC; dates rendered as 'yyyy-MM-dd' strings,
  * no nondeterministic row-picks (dropDuplicates declared as groupBy/min).
"""

from __future__ import annotations

import json
import pathlib
from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

_REPO_ROOT = pathlib.Path(__file__).resolve().parents[2]

# Queries whose implementation or oracle changed since their last driver
# attestation: treat as unattested so the driver re-checks them first.
# The contract is strict — ANY change to either side re-attests, including
# oracle edits argued to be value-preserving on the fixture (round 3 skipped
# the string_split -> regexp_split oracle rewrite on that argument; the r3
# advice correctly flagged that the argument holds only while fixture text
# stays single-spaced, so the carve-out is gone and the affected queries
# whose last attestation predates the rewrite re-attest now).
# Cleared each round once the re-attestation lands (r2 set x2/x2c/x2d/x4c
# and r3's x2c both came back hash-green; leaving entries here would burn
# slots of the ~50-per-round driver cap every round).
# (r5's 35-entry timestamp-loader batch + x12 all came back hash-green in
# CORRECTNESS_r05.json, so the set was cleared at the start of round 6.
# Entries are added in the same commit as the change they cover.)
# (r6's 6-entry batch — x19, x11, x24, w7, x6e, s11 — all came back
# hash-green in CORRECTNESS_r06.json, so the set was cleared at the start of
# round 7. Round-7 entries are added below in the same commit as the change
# they cover.)
_REATTEST: set[str] = {
    # r7: T15 landed log now lsn-deduped across batches (anti-join vs
    # already-landed lsns) + metadata-probe table-existence check.
    "t15_jdbc_cdc_sink",
    # r7: shared CC cache key now includes a corpus file fingerprint.
    "x11_neardup_clusters",
    "x24_cluster_canonical",
    # r7: tombstone exclusion promoted out of the query into read_scd2.
    "t14_scd2_maintenance",
    # r7: file sizing now via the Hadoop FileSystem API (portable schemes).
    "s12_small_file_compaction",
    # r7: x5b now decodes REAL BMP payloads (new oracle: 4x3x first-16 sum).
    "x5b_resize",
    # r7: negative-zero normalization (ROUND + 0.0) on signed float
    # outputs — a tiny negative mean renders -0.0 in DuckDB vs 0.0 in
    # Spark (observed on x6 at sf0.001); both engines patched identically.
    "x6_centroids",
    "a8_stats",
    "a8b_regression_aggs",
}

# Tie-break within the unattested group (driver attests ~50 entries/round):
# negative floats to the front, positive yields its slot to the next round.
# Round 7: the r6 rotation covered the p/w/o/f/s families (registration-order
# front), so without ranks the same fresh families would rotate again while
# the r1-vintage attestations (a-set, j-set, x1-x6 core — untouched since
# CORRECTNESS_r01) go on aging. The ranks below order the ATTESTED group by
# staleness: r1 vintage first, then x2d (r2), then the r3 families — so the
# ~35-40 slots left after the round-7 re-attest batch land on the stalest
# attestations first.
_RANK: dict[str, int] = {
    # last attested in CORRECTNESS_r01 (33 queries)
    **{
        name: -40
        for name in (
            "a2_global_agg", "a3_count_distinct", "a4_approx_count_distinct",
            "a5_rollup", "a5b_cube", "a5c_grouping_sets", "a5d_pivot",
            "a5e_unpivot", "a7_ordered_collect", "a8_stats",
            "a8b_regression_aggs", "a9_percentile", "a11_bool_aggs",
            "j1_inner_revenue_per_nation", "j2_broadcast_dim_join",
            "j3_left_outer_zero_orders", "j3b_full_outer", "j4_left_semi",
            "j5_left_anti", "j6_theta_join", "j9_cross_join",
            "j12_salted_join", "x1_exact_dedup", "x2b_ngram_jaccard",
            "x3_cosine_topk", "x3b_blocked_topk", "x3c_ivf_topk",
            "x5_multimodal", "x5c_frame_sample", "x6_centroids",
            "x6b_norms", "x6c_pairwise_dist",
        )
    },
    # last attested r2
    "x2d_embedding_neardup": -35,
    # last attested r3 (16 queries)
    **{
        name: -30
        for name in (
            "j13_bucketed_join", "x10_corpus_pipeline",
            "x13_repetition_metrics", "x14_token_histogram",
            "x15_shard_shuffle", "x16_snapshot_diff", "x2c_simhash",
            "x2e_lsh_embedding_neardup", "x2f_incremental_dedup",
            "x3d_quantized_topk", "x6d_quantize_int8", "x7_stratified_sample",
            "x7b_weighted_mix", "x7c_temperature_upsample",
            "x8_sequence_packing", "x9_pii_scrub",
        )
    },
}


@dataclass
class QuerySpec:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # DuckDB SQL, or None -> rows-only check
    doc: str = ""


REGISTRY: dict[str, QuerySpec] = {}


def register(name: str, oracle: str | None, doc: str = ""):
    """Decorator: add a query to the registry."""

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        REGISTRY[name] = QuerySpec(name=name, fn=fn, oracle=oracle, doc=doc or (fn.__doc__ or ""))
        return fn

    return deco


def _attested() -> set[str]:
    """Query names already green in a past driver CORRECTNESS_r*.json run.

    The correctness driver attests at most ~50 registry entries per round
    (CORRECTNESS_r01.json ends at entry 50 of 101), so ``load_all`` floats
    not-yet-attested queries to the front of the registry. A query counts as
    attested once a past round recorded hash_match=true (or a declared
    no-oracle rows-only check), unless listed in ``_REATTEST``.
    """
    seen: set[str] = set()
    for path in sorted(_REPO_ROOT.glob("CORRECTNESS_r*.json")):
        try:
            rows = json.loads(path.read_text())
        except (OSError, ValueError):
            continue
        if not isinstance(rows, dict):
            continue
        for name, row in rows.items():
            if not isinstance(row, dict):
                continue
            hash_ok = row.get("hash_match") is True
            rows_only_ok = row.get("err") == "no_oracle" and row.get("spark_rows") is not None
            if hash_ok or rows_only_ok:
                seen.add(name)
    return seen - _REATTEST


def load_all() -> dict[str, QuerySpec]:
    """Import every query module (side effect: fills REGISTRY).

    Import order puts cheap batch modules before streaming ones, and the
    final ordering floats driver-unattested queries to the front (stable
    within each group), so a capped driver run attests fresh surface.
    """
    from ez_cdc_spark.queries import (  # noqa: F401
        projection,
        windows,
        setops,
        scalar_functions,
        sources_sinks,
        udfs,
        streaming_equiv,
        aggregation,
        extensions,
        joins,
        pipeline_ops,
        cdc_analytics,
    )

    attested = _attested()
    ordered = sorted(  # stable: registration order breaks remaining ties
        REGISTRY, key=lambda name: (name in attested, _RANK.get(name, 0))
    )
    specs = {name: REGISTRY[name] for name in ordered}
    REGISTRY.clear()
    REGISTRY.update(specs)
    return REGISTRY
