"""S39 CHECK-constraint-gated commits.

Pins the s39 docstring's contracts: refusal leaves zero trace (no
reservation, no pointer move), SQL CHECK null semantics, the carry matrix
across every manifest producer, alter add/drop validation, and composition
with S38 branches (a constrained branch merge is gated too).
"""

import os
import shutil

import pytest
from pyspark.sql.types import StringType, StructField

from ez_cdc_spark.sources.manifest import (
    ConstraintViolationError,
    alter_constraints,
    compact,
    compact_mor,
    create_branch,
    current_generation,
    evolve_schema,
    fast_forward,
    merge_cow,
    merge_mor,
    publish,
    publish_append,
    read_committed,
    read_manifest,
    read_mor,
    restore,
)

SCRATCH = "/tmp/ez_cdc_test_constraints"
CHECKS = {"k_nonneg": "k IS NOT NULL AND k >= 0", "v_even": "v % 2 = 0"}


def _table(spark, name, constraints=CHECKS, n=100):
    d = os.path.join(SCRATCH, name)
    shutil.rmtree(d, ignore_errors=True)
    df = spark.range(n).selectExpr("id AS k", "id * 2 AS v")
    publish(
        df.repartitionByRange(4, "k").sortWithinPartitions("k"),
        d,
        generation=1,
        stats_columns=["k"],
        constraints=constraints,
    )
    return d


def _batch(spark, lo, hi, v_expr="id * 2", op="u", seq=1):
    return spark.range(lo, hi).selectExpr(
        "id AS k", f"{v_expr} AS v", f"'{op}' AS op", f"{seq} AS seq"
    )


def test_violating_publish_is_refused_at_creation(spark):
    d = os.path.join(SCRATCH, "badcreate")
    shutil.rmtree(d, ignore_errors=True)
    bad = spark.range(10).selectExpr("id - 5 AS k", "id * 2 AS v")
    with pytest.raises(ConstraintViolationError, match="k_nonneg.*5"):
        publish(bad, d, generation=1, constraints=CHECKS)
    assert current_generation(d) is None


def test_refusal_leaves_zero_trace(spark):
    d = _table(spark, "zerotrace")
    bad = spark.range(100, 105).selectExpr("id AS k", "id * 2 + 1 AS v")
    with pytest.raises(ConstraintViolationError, match="v_even"):
        publish_append(bad, d, generation=2)
    assert current_generation(d) == 1
    # no reservation burned, no staged data dir
    assert not any(
        m.startswith(".reserve") for m in os.listdir(os.path.join(d, "_manifests"))
    )
    assert not os.path.isdir(os.path.join(d, "data", "gen-2"))
    # the freed number commits cleanly afterwards
    publish_append(spark.range(100, 105).selectExpr("id AS k", "id*2 AS v"), d, 2)
    assert current_generation(d) == 2


def test_merge_gates_post_image_not_deletes(spark):
    d = _table(spark, "postimage")
    with pytest.raises(ConstraintViolationError):
        merge_cow(spark, d, _batch(spark, 0, 5, "id * 2 + 1"), key_col="k", generation=2)
    # a delete-only batch has no post-image to validate — it commits even
    # though its payload columns are NULL
    dels = spark.range(0, 5).selectExpr(
        "id AS k", "CAST(NULL AS BIGINT) AS v", "'d' AS op", "1 AS seq"
    )
    merge_cow(spark, d, dels, key_col="k", generation=2)
    assert read_committed(spark, d).count() == 95


def test_null_semantics_are_sql_check(spark):
    """Only FALSE violates: a NULL expression result passes (standard SQL
    CHECK, Delta's contract) — rejecting nulls takes an explicit IS NOT
    NULL, which k_nonneg declares and v_even deliberately does not."""
    d = _table(spark, "nullsem")
    null_v = spark.range(100, 103).selectExpr("id AS k", "CAST(NULL AS BIGINT) AS v")
    publish_append(null_v, d, generation=2)  # v_even(NULL) = unknown -> passes
    null_k = spark.sql("SELECT CAST(NULL AS BIGINT) AS k, CAST(2 AS BIGINT) AS v")
    with pytest.raises(ConstraintViolationError, match="k_nonneg"):
        publish_append(null_k, d, generation=3)


def test_empty_batch_passes(spark):
    d = _table(spark, "emptybatch")
    empty = spark.range(0).selectExpr("id AS k", "id * 2 AS v")
    publish_append(empty, d, generation=2)
    assert current_generation(d) == 2


def test_carry_matrix(spark):
    """Constraints survive every producer: append, merge, compact, evolve,
    restore — and keep gating after each."""
    d = _table(spark, "carry")
    publish_append(spark.range(100, 110).selectExpr("id AS k", "id*2 AS v"), d, 2)
    merge_cow(spark, d, _batch(spark, 0, 3, "id * 100"), key_col="k", generation=3)
    compact(spark, d, 4, target_files=2)
    evolve_schema(d, 5, [StructField("note", StringType(), True)])
    restore(d, 6, as_of_generation=4)
    for g in (2, 3, 4, 5, 6):
        assert read_manifest(d, as_of_generation=g).get("constraints") == CHECKS, g
    with pytest.raises(ConstraintViolationError):
        merge_cow(spark, d, _batch(spark, 0, 3, "id * 2 + 1"), key_col="k", generation=7)


def test_mor_gate_and_fold_carry(spark):
    d = _table(spark, "morgate")
    with pytest.raises(ConstraintViolationError):
        merge_mor(spark, d, _batch(spark, 0, 5, "id * 2 + 1"), key_col="k", generation=2)
    merge_mor(spark, d, _batch(spark, 0, 5, "id * 100"), key_col="k", generation=2)
    assert read_manifest(d).get("constraints") == CHECKS
    compact_mor(spark, d, 3, target_files=2)
    assert read_manifest(d).get("constraints") == CHECKS
    assert read_committed(spark, d).filter("k < 5 AND v = k * 100").count() == 5


def test_alter_constraints(spark):
    d = _table(spark, "alter")
    # adding a constraint existing data violates is refused
    with pytest.raises(ConstraintViolationError, match="k_small"):
        alter_constraints(spark, d, 2, add={"k_small": "k < 50"})
    assert current_generation(d) == 1
    # drop + add-valid commit as metadata
    alter_constraints(spark, d, 2, drop=["v_even"])
    assert read_manifest(d).get("constraints") == {"k_nonneg": CHECKS["k_nonneg"]}
    publish_append(spark.range(100, 103).selectExpr("id AS k", "id*2+1 AS v"), d, 3)
    with pytest.raises(KeyError):
        alter_constraints(spark, d, 4, drop=["ghost"])
    with pytest.raises(ValueError, match="already exist"):
        alter_constraints(spark, d, 4, add={"k_nonneg": "k >= 0"})
    # adding over a MOR generation validates the RESOLVED state
    merge_mor(spark, d, _batch(spark, 0, 2, "id * 6"), key_col="k", generation=4)
    alter_constraints(spark, d, 5, add={"v_bound": "v < 10000"})
    assert read_manifest(d).get("constraints").keys() == {"k_nonneg", "v_bound"}
    assert read_mor(spark, d).count() == 103


def test_constraints_clear_with_empty_dict(spark):
    d = _table(spark, "clear")
    df = spark.range(50).selectExpr("id - 25 AS k", "id AS v")  # violates both
    publish(df, d, generation=2, constraints={})
    assert read_manifest(d).get("constraints") is None
    publish_append(spark.range(5).selectExpr("id - 3 AS k", "id AS v"), d, 3)


def test_wap_composition(spark):
    """A constrained table's branch writers are gated too, and the
    constraints ride the fast-forward back to main."""
    d = _table(spark, "wap")
    create_branch(d, "b")
    with pytest.raises(ConstraintViolationError):
        publish_append(
            spark.range(100, 105).selectExpr("id AS k", "id*2+1 AS v"),
            d,
            2,
            ref="b",
        )
    publish_append(
        spark.range(100, 105).selectExpr("id AS k", "id*2 AS v"), d, 2, ref="b"
    )
    fast_forward(d, "b")
    assert read_manifest(d).get("constraints") == CHECKS
    with pytest.raises(ConstraintViolationError):
        merge_cow(spark, d, _batch(spark, 0, 3, "id*2+1"), key_col="k", generation=3)
