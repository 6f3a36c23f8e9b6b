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
