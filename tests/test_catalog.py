"""S41 catalog-level multi-table transactions.

Pins the s41 docstring's contracts: all-or-nothing visibility across
tables, catalog CAS, ghost-generation refusal, version time travel,
init refusal, and the gc retention interplay.
"""

import os
import shutil

import pytest

from ez_cdc_spark.sources import catalog as C
from ez_cdc_spark.sources.manifest import (
    CommitConflictError,
    current_generation,
    gc,
    publish,
    publish_append,
    vacuum,
)

SCRATCH = "/tmp/ez_cdc_test_catalog"


def _cat(spark, name):
    cd = os.path.join(SCRATCH, name)
    shutil.rmtree(cd, ignore_errors=True)
    C.init(cd)
    publish(spark.range(100).selectExpr("id AS k", "id*2 AS v"), C.table_dir(cd, "a"), 1)
    publish(spark.range(50).selectExpr("id AS k", "id*10 AS w"), C.table_dir(cd, "b"), 1)
    C.commit(cd, {"a": 1, "b": 1})
    return cd


def test_mid_transaction_reader_sees_all_or_nothing(spark):
    cd = _cat(spark, "atomic")
    v = C.current_version(cd)
    # table a's OWN chain advances — the transaction is half done
    publish_append(
        spark.range(100, 120).selectExpr("id AS k", "id*2 AS v"),
        C.table_dir(cd, "a"),
        2,
    )
    assert current_generation(C.table_dir(cd, "a")) == 2
    # a catalog reader still sees the COMMITTED pair, not the half-state
    assert C.read_table(spark, cd, "a").count() == 100
    assert C.read_table(spark, cd, "b").count() == 50
    publish_append(
        spark.range(50, 60).selectExpr("id AS k", "id*10 AS w"),
        C.table_dir(cd, "b"),
        2,
    )
    C.commit(cd, {"a": 2, "b": 2})
    assert C.read_table(spark, cd, "a").count() == 120
    assert C.read_table(spark, cd, "b").count() == 60
    # time travel to the pre-transaction version gives the OLD pair whole
    assert C.read_table(spark, cd, "a", version=v).count() == 100
    assert C.read_table(spark, cd, "b", version=v).count() == 50


def test_catalog_cas_and_ghost_refusals(spark):
    cd = _cat(spark, "cas")
    v = C.current_version(cd)
    publish_append(
        spark.range(100, 105).selectExpr("id AS k", "id*2 AS v"),
        C.table_dir(cd, "a"),
        2,
    )
    C.commit(cd, {"a": 2})
    # a transaction derived from the stale version is rejected
    with pytest.raises(CommitConflictError):
        C.commit(cd, {"b": 1}, expected_version=v)
    # naming a generation with no committed manifest refuses up front
    with pytest.raises(FileNotFoundError, match="no committed manifest"):
        C.commit(cd, {"a": 99})
    # unnamed tables carry forward across commits
    assert C.snapshot(cd)["tables"] == {"a": 2, "b": 1}


def test_init_refuses_existing_and_names_validate(spark):
    cd = _cat(spark, "init")
    with pytest.raises(FileExistsError):
        C.init(cd)
    with pytest.raises(ValueError, match="invalid table name"):
        C.table_dir(cd, "../escape")
    with pytest.raises(KeyError):
        C.read_table(spark, cd, "ghost")


def test_gc_retention_interplay(spark):
    """A catalog version naming an OLD table generation must survive
    table-level gc when its generations are passed through — and the
    counterfactual: an unprotected gc reclaims it and the catalog read
    dangles loudly."""
    cd = _cat(spark, "retain")
    publish_append(
        spark.range(100, 110).selectExpr("id AS k", "id*2 AS v"),
        C.table_dir(cd, "a"),
        2,
    )
    publish_append(
        spark.range(50, 55).selectExpr("id AS k", "id*10 AS w"),
        C.table_dir(cd, "b"),
        2,
    )
    C.commit(cd, {"a": 2, "b": 2})
    old_v = 2  # the {'a': 1, 'b': 1} version

    prot = C.protected_generations(cd)
    assert prot == {"a": {1, 2}, "b": {1, 2}}
    gc(C.table_dir(cd, "a"), older_than_s=0.0, keep_generations=prot["a"])
    vacuum(C.table_dir(cd, "a"), older_than_s=0.0)
    assert C.read_table(spark, cd, "a", version=old_v).count() == 100

    # counterfactual on b: unprotected gc reclaims gen-1, the old catalog
    # version dangles loudly instead of serving wrong data
    gc(C.table_dir(cd, "b"), older_than_s=0.0)
    with pytest.raises(FileNotFoundError):
        C.read_table(spark, cd, "b", version=old_v).count()

    # retained-window protection: keeping only the newest version frees
    # the old generations
    prot1 = C.protected_generations(cd, retain_versions=1)
    assert prot1 == {"a": {2}, "b": {2}}


def _catalog_writer(args):
    """Module-level worker: land ``n_commits`` catalog transactions
    against one catalog, re-deriving from the committed version on every
    conflict — the s33 cross-process CAS witness one level up."""
    catalog_dir, writer_id, n_commits = args
    import sys

    sys.path.insert(0, "/root/repo")
    from ez_cdc_spark.sources import catalog as C
    from ez_cdc_spark.sources.manifest import CommitConflictError

    committed, conflicts, done = [], 0, 0
    while done < n_commits:
        v = C.current_version(catalog_dir)
        try:
            snap = C.commit(
                catalog_dir,
                {},
                expected_version=v,
                txn={"tag": f"w{writer_id}", "n": done},
            )
            committed.append(snap["version"])
            done += 1
        except CommitConflictError:
            conflicts += 1
            if conflicts > 5000:
                raise RuntimeError("livelock")
    return writer_id, committed, conflicts


def test_catalog_cas_serializes_across_processes(spark):
    """4 OS processes land 6 catalog transactions each: all 24 versions
    distinct and gap-free above the bootstrap, every writer's final
    watermark survives in the tip snapshot (the txns fold is
    last-writer-wins PER TAG, never across tags), and every version file
    is readable — no torn snapshots."""
    import multiprocessing as mp
    import os
    import shutil

    cd = os.path.join(SCRATCH, "xproc")
    shutil.rmtree(cd, ignore_errors=True)
    C.init(cd)
    v0 = C.current_version(cd)

    ctx = mp.get_context("spawn")
    with ctx.Pool(4) as pool:
        results = pool.map(_catalog_writer, [(cd, w, 6) for w in range(4)])
    all_versions = [v for _, vs, _ in results for v in vs]
    assert len(all_versions) == 24 and len(set(all_versions)) == 24
    assert sorted(all_versions) == list(range(v0 + 1, v0 + 25))
    assert C.current_version(cd) == v0 + 24
    tip = C.snapshot(cd)
    for w in range(4):
        assert C.txn_watermark(tip, f"w{w}") == {"n": 5}, tip.get("txns")
    for v in range(v0, v0 + 25):
        assert C.snapshot(cd, v)["version"] == v


# ----- S45: catalog-scope foreign keys -----


def _fk_cat(spark, name):
    """parent 'dim' (keys 0..49), child 'fact' referencing only 0..49."""
    cd = os.path.join(SCRATCH, name)
    shutil.rmtree(cd, ignore_errors=True)
    C.init(cd)
    publish(
        spark.range(50).selectExpr("id AS pk", "id*10 AS attr"),
        C.table_dir(cd, "dim"), 1,
    )
    publish(
        spark.range(200).selectExpr("id AS row_id", "id % 50 AS ref"),
        C.table_dir(cd, "fact"), 1,
    )
    C.commit(cd, {"dim": 1, "fact": 1})
    return cd


FK = {"child": "fact", "fk": "ref", "parent": "dim", "pk": "pk"}


def test_fk_declaration_validates_existing_state(spark):
    from ez_cdc_spark.sources.manifest import ConstraintViolationError

    cd = _fk_cat(spark, "fk_decl")
    snap = C.alter_foreign_keys(spark, cd, add=[FK])
    assert snap["foreign_keys"] == [FK]
    # a catalog whose child already dangles refuses the declaration
    cd2 = _fk_cat(spark, "fk_decl_bad")
    publish(
        spark.range(200).selectExpr("id AS row_id", "id AS ref"),  # 50..199 dangle
        C.table_dir(cd2, "fact"), 2,
    )
    C.commit(cd2, {"fact": 2})
    with pytest.raises(ConstraintViolationError, match="dangling"):
        C.alter_foreign_keys(spark, cd2, add=[FK])


def test_fk_gates_child_and_parent_sides(spark):
    from ez_cdc_spark.sources.manifest import ConstraintViolationError

    cd = _fk_cat(spark, "fk_gate")
    C.alter_foreign_keys(spark, cd, add=[FK])
    v = C.current_version(cd)
    # child insert with dangling refs refuses
    publish_append(
        spark.range(200, 210).selectExpr("id AS row_id", "id AS ref"),
        C.table_dir(cd, "fact"), 2,
    )
    with pytest.raises(ConstraintViolationError):
        C.commit(cd, {"fact": 2}, spark=spark)
    # parent shrink that drops referenced keys refuses
    publish(
        spark.range(10).selectExpr("id AS pk", "id*10 AS attr"),
        C.table_dir(cd, "dim"), 2,
    )
    with pytest.raises(ConstraintViolationError):
        C.commit(cd, {"dim": 2}, spark=spark)
    assert C.current_version(cd) == v
    # an FK commit without a session refuses loudly instead of skipping
    with pytest.raises(ValueError, match="pass spark="):
        C.commit(cd, {"dim": 2})
    # a valid parent EXTENSION commits (keys 0..59 cover refs 0..49)
    publish(
        spark.range(60).selectExpr("id AS pk", "id*10 AS attr"),
        C.table_dir(cd, "dim"), 3,
    )
    C.commit(cd, {"dim": 3}, spark=spark)
    assert C.read_table(spark, cd, "dim").count() == 60


def test_fk_untouched_tables_pay_nothing(spark):
    cd = _fk_cat(spark, "fk_free")
    C.alter_foreign_keys(spark, cd, add=[FK])
    publish(
        spark.range(5).selectExpr("id AS x"), C.table_dir(cd, "other"), 1
    )
    # no spark needed: the transaction touches neither FK side
    C.commit(cd, {"other": 1})
    assert C.read_table(spark, cd, "other").count() == 5


def test_fk_carry_drop_and_rollback(spark):
    cd = _fk_cat(spark, "fk_roll")
    C.alter_foreign_keys(spark, cd, add=[FK])
    v_fk = C.current_version(cd)
    C.alter_foreign_keys(spark, cd, drop=[FK])
    assert "foreign_keys" not in C.snapshot(cd)
    # NULL child refs pass (SQL FK semantics) once redeclared
    C.alter_foreign_keys(spark, cd, add=[FK])
    publish_append(
        spark.range(1).selectExpr("id + 1000 AS row_id", "CAST(NULL AS LONG) AS ref"),
        C.table_dir(cd, "fact"), 2,
    )
    C.commit(cd, {"fact": 2}, spark=spark)
    # rollback to the no-FK era restores that era's declarations
    C.rollback(cd, v_fk - 1)
    assert "foreign_keys" not in C.snapshot(cd)
    assert C.snapshot(cd, v_fk)["foreign_keys"] == [FK]  # history intact


# ----- S46: versioned views -----


def test_views_declare_read_and_travel(spark):
    cd = _fk_cat(spark, "views_basic")
    C.alter_views(
        spark, cd,
        add={"fact_per_dim": (
            "SELECT d.pk AS pk, CAST(COUNT(*) AS BIGINT) AS n "
            "FROM {fact} f JOIN {dim} d ON f.ref = d.pk GROUP BY d.pk"
        )},
    )
    v1 = C.current_version(cd)
    assert C.read_view(spark, cd, "fact_per_dim").count() == 50
    # shrink fact through a transaction; the pinned read must not follow
    publish(
        spark.range(100).selectExpr("id AS row_id", "id % 10 AS ref"),
        C.table_dir(cd, "fact"), 2,
    )
    C.commit(cd, {"fact": 2})
    assert C.read_view(spark, cd, "fact_per_dim").count() == 10
    assert C.read_view(spark, cd, "fact_per_dim", version=v1).count() == 50
    # laziness hazard pinned: a PINNED df collected AFTER a later commit
    # still serves its version (no temp-view mutation)
    pinned = C.read_view(spark, cd, "fact_per_dim", version=v1)
    publish(
        spark.range(20).selectExpr("id AS row_id", "id % 5 AS ref"),
        C.table_dir(cd, "fact"), 3,
    )
    C.commit(cd, {"fact": 3})
    assert pinned.count() == 50


def test_views_validate_eagerly_and_drop(spark):
    cd = _fk_cat(spark, "views_valid")
    with pytest.raises(KeyError, match="not tables"):
        C.alter_views(spark, cd, add={"bad": "SELECT * FROM {ghost}"})
    with pytest.raises(Exception):  # analysis error: no such column
        C.alter_views(spark, cd, add={"bad": "SELECT nope FROM {dim}"})
    with pytest.raises(ValueError, match="at least one catalog table"):
        C.alter_views(spark, cd, add={"bad": "SELECT 1 AS one"})
    assert "views" not in C.snapshot(cd)  # refusals left nothing behind
    C.alter_views(spark, cd, add={"v": "SELECT COUNT(*) AS n FROM {dim}"})
    C.alter_views(spark, cd, drop=["v"])
    assert "views" not in C.snapshot(cd)
    with pytest.raises(KeyError, match="not in catalog"):
        C.read_view(spark, cd, "v")


def test_views_rollback_restores_declarations(spark):
    cd = _fk_cat(spark, "views_roll")
    v_before = C.current_version(cd)
    C.alter_views(spark, cd, add={"v": "SELECT COUNT(*) AS n FROM {dim}"})
    C.rollback(cd, v_before)
    assert "views" not in C.snapshot(cd)
    # and rolling FORWARD to the view era brings it back
    C.rollback(cd, v_before + 1)
    assert "v" in C.snapshot(cd)["views"]
    assert C.read_view(spark, cd, "v").first()["n"] == 50


def test_expire_versions_lifecycle(spark):
    cd = _fk_cat(spark, "expire")  # v1 init, v2 tables
    for g in (2, 3, 4):
        publish(
            spark.range(g).selectExpr("id AS pk", "id AS attr"),
            C.table_dir(cd, "dim"), g,
        )
        C.commit(cd, {"dim": g})  # v3, v4, v5
    assert C.current_version(cd) == 5
    expired = C.expire_versions(cd, retain_versions=2)
    assert expired == [1, 2, 3]
    # current + retained still read; expired targets refuse loudly
    assert C.read_table(spark, cd, "dim").count() == 4
    assert C.read_table(spark, cd, "dim", version=4).count() == 3
    with pytest.raises(FileNotFoundError):
        C.snapshot(cd, 2)
    with pytest.raises(FileNotFoundError):
        C.rollback(cd, 2)
    # generations only expired versions named become gc-reclaimable
    from ez_cdc_spark.sources.manifest import gc as table_gc

    prot = C.protected_generations(cd)["dim"]
    assert prot == {3, 4}
    table_gc(C.table_dir(cd, "dim"), 0.0, keep_generations=prot)
    assert C.read_table(spark, cd, "dim", version=4).count() == 3  # retained survives
    with pytest.raises(Exception):
        C.expire_versions(cd, retain_versions=0)
