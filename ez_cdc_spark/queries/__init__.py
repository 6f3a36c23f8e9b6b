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
# round 7.)
# (r7's 9-entry batch — t15, x11, x24, t14, s12, x5b, x6, a8, a8b — all came
# back hash-green in CORRECTNESS_r07.json, so the set was cleared at the
# start of round 8. Round-8 entries are added below in the same commit as
# the change they cover.)
_REATTEST: set[str] = {
    # r8: u7's empty-vector aggregates hardened (zero-length reduceat
    # segments defined instead of borrowing the next vector / raising).
    "u7_map_in_arrow",
    # r8: quantize16_sql now BIGINT-promotes before * 65536 (oracle edit —
    # value-preserving at small SF but the contract re-attests any change).
    "s15_zorder_cluster",
    # r8: t16's fold extracted into the m-parameterized mg_stream_counts
    # (the compressing regime now runs the REAL streaming path in tests);
    # the update stream additionally carries the offset column.
    "t16_streaming_heavy_hitters",
    # r8: x40's per-doc gram counts now derive from the checkpointed
    # exploded rows instead of re-running the gram HOF (value-identical —
    # |dg rows per doc| == size(distinct grams) — but the contract
    # re-attests any implementation change; ~4x warm speedup at sf0.1).
    "x40_ngram_containment",
}

# Tie-break within the unattested group (driver attests ~50 entries/round):
# negative floats to the front, positive yields its slot to the next round.
# Round 8: the r7 rotation drained the a-set and x1–x6 core, leaving 26
# stale attestations — the j-set (r1 vintage: the driver hasn't looked at
# any join since CORRECTNESS_r01), x2d (r2), and the r3 families. The ranks
# below order the ATTESTED group by staleness so the slots left after the
# round-8 new queries + re-attest batch land on those 26 first; after this
# round no query's latest attestation should predate r4.
_RANK: dict[str, int] = {
    # last attested in CORRECTNESS_r01 (9 queries: the join family)
    **{
        name: -40
        for name in (
            "j1_inner_revenue_per_nation", "j2_broadcast_dim_join",
            "j3_left_outer_zero_orders", "j3b_full_outer", "j4_left_semi",
            "j5_left_anti", "j6_theta_join", "j9_cross_join",
            "j12_salted_join",
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
