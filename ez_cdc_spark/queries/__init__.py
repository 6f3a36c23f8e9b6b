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
_REATTEST: set[str] = {
    # Round 5: the driver regenerated /root/testdata between rounds with a
    # new timestamp encoding (TIMESTAMP(NANOS) -> TIMESTAMP(MICROS,
    # isAdjustedToUTC=false), which Spark 4 reads as TIMESTAMP_NTZ), and
    # load_table grew an NTZ->LTZ normalization to absorb it
    # (sources/tables.py:_normalize_timestamps). Every query that consumes a
    # timestamp column (events.ts, o_orderdate, l_shipdate) re-attests under
    # the new loader; queries over timestamp-free tables (documents,
    # embeddings, region/nation/...) are untouched by the change and keep
    # their prior attestation. The r4 batch (x2/x4*/x17) came back
    # hash-green, so those entries are cleared.
    "a1_pricing_summary",
    "a6_filtered_agg",
    "a10_min_max_by",
    "j7_range_join",
    "j8_asof_join",
    "j10_stream_static",
    "j11_stream_stream",
    "j11b_stream_stream_outer",
    "p3_in_between_null",
    "f_datetime",
    "f_datetime2",
    "o1_global_sort",
    "o3_union",
    "s1_parquet_scan",
    "s5_stream_replay",
    "s7_partitioned_parquet_sink",
    "s10b_python_stream_source",
    "t1_watermark_append",
    "t2_tumbling_window",
    "t3_sliding_window",
    "t4_session_window",
    "t4b_session_window_dynamic",
    "t5_stream_dedup",
    "t5b_dedup_within_watermark",
    "t6_stateful",
    "t7_late_data",
    "t8_output_modes",
    "t9_cdc_upsert",
    "t9b_snapshot_stream",
    "t11_streaming_curation",
    "w2_lag_lead",
    "w3_running_agg",
    "w4_sliding_range",
    "w6_locf_gap_fill",
    # r5: implementation changed — gram generation widened off the
    # single-file scan (value-preserving, but the strict contract re-attests)
    "x12_contamination",
}

# Tie-break within the unattested group (driver attests ~50 entries/round):
# negative floats to the front, positive yields its slot to the next round.
# The 34-query timestamp re-attest batch fits inside one round's cap with
# ~16 slots left for normal rotation, so no entries are needed.
_RANK: dict[str, int] = {}


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
    )

    attested = _attested()
    ordered = sorted(  # stable: registration order breaks remaining ties
        REGISTRY, key=lambda name: (name in attested, _RANK.get(name, 0))
    )
    specs = {name: REGISTRY[name] for name in ordered}
    REGISTRY.clear()
    REGISTRY.update(specs)
    return REGISTRY
