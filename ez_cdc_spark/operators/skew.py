"""Skew-resilient joins via key salting (SURVEY.md §4.2 shuffle rules).

AQE's skew-join split handles most skew at runtime, but it only splits
oversized SORT-MERGE partitions of already-materialized shuffle files; a
hot key that is 30% of a 100 TB fact table still funnels through few tasks
before AQE can react, and AQE cannot split a hot BUILD side. Explicit
salting removes the hot spot at plan time: replicate the small side R ways,
scatter the big side uniformly across the R replicas, join on
(key, salt) — every task gets ~1/R of the hot key. Results are exactly the
join results (each big-side row meets each matching small-side row exactly
once), so the operator stays oracle-checkable against a plain SQL join.

Cost model: small side shuffles R× its size; big side shuffles 1×. Choose
R ≈ (hot-key rows) / (target partition rows); R=8..64 covers most skew.

The reference has no joins at all (its only dataflow is the CDC consumer,
/root/reference/python/cdc_test/main.py); this is part of the declared
engine surface (SURVEY.md §2b) for 100 TB operation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SALT = "__salt"


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: list[str],
    how: str = "inner",
    salt: int = 16,
) -> DataFrame:
    """Equi-join with the big side's hot keys scattered across ``salt``
    sub-partitions and the small side replicated to match.

    Exactly equivalent to ``big.join(small, on, how)`` for ``inner`` and
    ``left`` joins (each big row keeps exactly one salt value; each small
    row exists once per salt value, so matches pair up exactly once).
    """
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    # Scatter by a content hash, not by row position: monotonically_
    # increasing_id depends on partition layout and is not stable across
    # task retries (shuffle-input recomputation could re-salt rows between
    # attempts). xxhash64 over the row is deterministic per row content, so
    # retries reproduce the same salt. Two refinements:
    #   * map-typed columns are excluded — Spark disallows hashing MapType
    #     (HASH_MAP_TYPE AnalysisException), and a map's payload diversity
    #     is almost always mirrored by the row's other columns;
    #   * input_file_name() is mixed in (deterministic per row for
    #     file-scan-backed frames, empty string otherwise), so even rows
    #     whose hashable columns are fully identical scatter across files.
    # Residual: identical rows within one file share a salt. If the big
    # side is projected to nothing but the join key, that means one salt
    # per hot key — keep a differing payload column (or the source file
    # spread) in the frame when salting; that precondition is the cost of
    # retry-stable salting.
    from pyspark.sql.types import MapType

    hashable = [
        F.col(f.name) for f in big.schema.fields if not isinstance(f.dataType, MapType)
    ]
    big_s = big.withColumn(
        SALT,
        F.pmod(F.xxhash64(*hashable, F.input_file_name()), F.lit(salt)).cast("int"),
    )
    replicas = F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
    small_s = small.withColumn(SALT, replicas)
    return big_s.join(small_s, on + [SALT], how).drop(SALT)
