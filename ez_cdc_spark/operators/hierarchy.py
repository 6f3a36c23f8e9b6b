"""Hierarchy flattening via pointer doubling (recursive-CTE stand-in).

Spark has no WITH RECURSIVE; the naive port walks one parent edge per
join — O(depth) sequential shuffles. Pointer doubling self-joins the
state on (my ancestor == your id) so the covered distance doubles each
round: ``rounds`` rounds resolve any depth <= 2**rounds. Roots are their
own fixpoint (anc=self, d=0, s=0), so converged rows pass through later
rounds unchanged — no convergence test, bit-deterministic, all-BIGINT.

At 100 TB: each round is one slim equi-join over 4-column state rows
(never the node payload), localCheckpoint truncates lineage so plan
depth stays O(1) per round, and a depth-2^30 pathology still needs only
30 rounds. Reference parity note: the reference (a 5-container CDC demo,
python/cdc_test/main.py) has no query engine at all; this operator is
part of the declared north-star extension surface (SURVEY.md §2b X60).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pointer_double_flatten(edges: DataFrame, rounds: int = 5) -> DataFrame:
    """Resolve each node's root over ``edges(id, parent)`` (parent NULL
    at roots). Returns (id, anc, d, s): after ``rounds`` doubling rounds,
    for any node whose depth <= 2**rounds, ``anc`` is its root, ``d`` its
    depth, and ``s`` the BIGINT sum of its strict ancestors' ids. Deeper
    nodes return their distance-2**rounds ancestor instead — callers pin
    the depth bound (x60's property test asserts the fixture margin and
    the boundary behavior both ways).
    """
    state = edges.select(
        "id",
        F.coalesce("parent", "id").alias("anc"),
        F.when(F.col("parent").isNull(), F.lit(0))
        .otherwise(F.lit(1))
        .cast("bigint")
        .alias("d"),
        F.coalesce("parent", F.lit(0)).cast("bigint").alias("s"),
    ).localCheckpoint(eager=True)
    for _ in range(rounds):
        a, b = state.alias("a"), state.alias("b")
        state = (
            a.join(b, F.col("a.anc") == F.col("b.id"))
            .select(
                F.col("a.id").alias("id"),
                F.col("b.anc").alias("anc"),
                (F.col("a.d") + F.col("b.d")).alias("d"),
                (F.col("a.s") + F.col("b.s")).alias("s"),
            )
            .localCheckpoint(eager=True)
        )
    return state
