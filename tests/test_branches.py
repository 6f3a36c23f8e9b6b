"""S38 branches + write-audit-publish (manifest refs).

Pins the contracts the s38 docstring claims: branch isolation from main,
ref-relative CAS, fast-forward divergence refusal, gc root protection of
live refs, abandon reclaim after drop, and txn-watermark carry through a
branch's commits into the fast-forwarded main state.
"""

import os
import shutil

import pytest
from pyspark.sql import functions as F

from ez_cdc_spark.sources.manifest import (
    CommitConflictError,
    branch_head,
    create_branch,
    current_generation,
    drop_branch,
    fast_forward,
    gc,
    list_branches,
    merge_cow,
    publish,
    publish_append,
    read_committed,
    read_manifest,
    txn_watermark,
    vacuum,
)

SCRATCH = "/tmp/ez_cdc_test_branches"


def _table(spark, name, n=200):
    d = os.path.join(SCRATCH, name)
    shutil.rmtree(d, ignore_errors=True)
    df = spark.range(n).selectExpr("id AS k", "id * 2 AS v")
    publish(
        df.repartitionByRange(4, "k").sortWithinPartitions("k"),
        d,
        generation=1,
        stats_columns=["k"],
    )
    return d


def _batch(spark, lo, hi, op="u", seq=1):
    return spark.range(lo, hi).selectExpr(
        "id AS k", "id * 100 AS v", f"'{op}' AS op", f"{seq} AS seq"
    )


def test_branch_commits_are_invisible_to_main(spark):
    d = _table(spark, "iso")
    create_branch(d, "b")
    publish_append(spark.range(200, 250).selectExpr("id AS k", "id*2 AS v"), d, 2, ref="b")
    merge_cow(spark, d, _batch(spark, 0, 10), key_col="k", generation=3, ref="b")
    assert current_generation(d) == 1
    assert read_committed(spark, d).count() == 200
    # untouched main rows keep their values — no branch write leaked
    assert read_committed(spark, d).filter("k < 10 AND v <> k * 2").count() == 0
    branch = read_committed(spark, d, ref="b")
    assert branch.count() == 250
    assert branch.filter("k < 10 AND v = k * 100").count() == 10


def test_fast_forward_publishes_and_drops(spark):
    d = _table(spark, "ff")
    create_branch(d, "b")
    publish_append(spark.range(200, 260).selectExpr("id AS k", "id*2 AS v"), d, 2, ref="b")
    man = fast_forward(d, "b")
    assert man["generation"] == 2
    assert current_generation(d) == 2
    assert read_committed(spark, d).count() == 260
    assert list_branches(d) == {}


def test_fast_forward_refuses_divergence(spark):
    d = _table(spark, "diverge")
    create_branch(d, "b")
    publish_append(spark.range(200, 210).selectExpr("id AS k", "id*2 AS v"), d, 2, ref="b")
    # main advances after the branch was cut
    publish_append(spark.range(300, 310).selectExpr("id AS k", "id*2 AS v"), d, 3)
    with pytest.raises(CommitConflictError, match="fast-forward rejected"):
        fast_forward(d, "b")
    # main unharmed, branch still live for re-cut/merge handling
    assert current_generation(d) == 3
    assert branch_head(d, "b")["current"] == "gen-2.json"


def test_fast_forward_keep_rebases(spark):
    d = _table(spark, "keep")
    create_branch(d, "b")
    publish_append(spark.range(200, 210).selectExpr("id AS k", "id*2 AS v"), d, 2, ref="b")
    fast_forward(d, "b", drop=False)
    assert branch_head(d, "b") == {"current": "gen-2.json", "base": 2}
    # further branch commits fast-forward again from the new base
    publish_append(spark.range(210, 220).selectExpr("id AS k", "id*2 AS v"), d, 3, ref="b")
    fast_forward(d, "b", drop=False)
    assert current_generation(d) == 3


def test_branch_cas_is_ref_relative(spark):
    """Two writers on the SAME branch conflict on the branch pointer; a
    branch writer and a main writer never conflict with each other."""
    d = _table(spark, "cas")
    create_branch(d, "b")
    # main commit does not disturb the branch writer's expected parent
    publish_append(spark.range(300, 305).selectExpr("id AS k", "id*2 AS v"), d, 2)
    publish_append(spark.range(200, 205).selectExpr("id AS k", "id*2 AS v"), d, 3, ref="b")
    assert current_generation(d, "b") == 3
    assert current_generation(d) == 2
    # a stale branch writer (derived before gen-3 landed) is rejected
    from ez_cdc_spark.sources.manifest import _commit_manifest

    stale = dict(read_manifest(d, ref="b"))
    stale["generation"] = 4
    with pytest.raises(CommitConflictError):
        _commit_manifest(d, 4, stale, expected_parent=1, ref="b")


def test_gc_protects_live_branch_head(spark):
    d = _table(spark, "gcroot")
    create_branch(d, "b")
    publish_append(spark.range(200, 240).selectExpr("id AS k", "id*2 AS v"), d, 2, ref="b")
    merge_cow(spark, d, _batch(spark, 0, 5), key_col="k", generation=3, ref="b")
    gc(d, older_than_s=0.0)
    vacuum(d, older_than_s=0.0)
    # head survives whole: 200 base + 40 appended, 5 rewritten
    branch = read_committed(spark, d, ref="b")
    assert branch.count() == 240
    assert branch.filter("k < 5 AND v = k * 100").count() == 5
    # main unharmed too
    assert read_committed(spark, d).count() == 200


def test_dropped_branch_is_reclaimed(spark):
    d = _table(spark, "reclaim")
    create_branch(d, "b")
    publish_append(spark.range(200, 240).selectExpr("id AS k", "id*2 AS v"), d, 2, ref="b")
    drop_branch(d, "b")
    deleted = gc(d, older_than_s=0.0)
    vacuum(d, older_than_s=0.0)
    assert any("gen-2" in p for p in deleted)
    with pytest.raises(FileNotFoundError):
        read_manifest(d, ref="b")
    # the abandoned generation's data is gone from disk
    assert not os.path.isdir(os.path.join(d, "data", "gen-2"))
    assert read_committed(spark, d).count() == 200


def test_create_branch_refusals(spark):
    d = _table(spark, "refuse")
    create_branch(d, "b")
    with pytest.raises(FileExistsError):
        create_branch(d, "b")
    with pytest.raises(FileNotFoundError):
        create_branch(d, "ghost", from_generation=99)
    with pytest.raises(ValueError, match="invalid branch name"):
        create_branch(d, "../escape")
    with pytest.raises(ValueError, match="invalid branch name"):
        create_branch(d, ".hidden")


def test_commit_to_dropped_branch_is_rejected(spark):
    d = _table(spark, "droprace")
    create_branch(d, "b")
    # the writer derived from the branch head; the branch vanishes before
    # its pointer swap — the commit must not resurrect the ref
    drop_branch(d, "b")
    with pytest.raises((CommitConflictError, FileNotFoundError)):
        publish_append(
            spark.range(200, 205).selectExpr("id AS k", "id*2 AS v"), d, 2, ref="b"
        )
    assert "b" not in list_branches(d)


def test_txn_watermarks_carry_through_wap(spark):
    """A tagged branch merge's watermark must survive the fast-forward —
    the WAP path is still the multi-writer txns contract (ADVICE r15)."""
    d = _table(spark, "txncarry")
    publish_append(
        spark.range(200, 205).selectExpr("id AS k", "id*2 AS v"), d, 2
    )
    create_branch(d, "b")
    merge_cow(
        spark,
        d,
        _batch(spark, 0, 5),
        key_col="k",
        generation=3,
        ref="b",
        txn={"tag": "nightly-sink", "batch_id": 7},
    )
    fast_forward(d, "b")
    man = read_manifest(d)
    assert txn_watermark(man, "nightly-sink") == {"batch_id": 7}


def test_branch_generation_numbers_stay_globally_unique(spark):
    d = _table(spark, "unique")
    create_branch(d, "b")
    publish_append(spark.range(200, 205).selectExpr("id AS k", "id*2 AS v"), d, 2, ref="b")
    # main cannot reuse the branch's number: the manifest space is shared
    with pytest.raises(FileExistsError):
        publish_append(spark.range(300, 305).selectExpr("id AS k", "id*2 AS v"), d, 2)
    publish_append(spark.range(300, 305).selectExpr("id AS k", "id*2 AS v"), d, 3)
    assert current_generation(d) == 3
    assert current_generation(d, "b") == 2


def _branch_writer(args):
    """Module-level worker (spawn targets must be picklable): commit
    ``n_commits`` trivial manifests against ONE shared branch ref,
    re-deriving from the branch head on every conflict. Pure filesystem —
    the ref-relative CAS must serialize across PROCESS boundaries."""
    table_dir, writer_id, n_commits = args
    import sys

    sys.path.insert(0, "/root/repo")
    from ez_cdc_spark.sources.manifest import (
        CommitConflictError,
        _commit_manifest,
        current_generation,
        read_manifest,
    )

    committed, conflicts, done, gen = [], 0, 0, 0
    while done < n_commits:
        cur = current_generation(table_dir, "shared")
        gen = max((cur or 0) + 1, gen + 1)
        man = {
            "generation": gen,
            "files": [],
            "n_files": 0,
            "schema": read_manifest(table_dir, ref="shared")["schema"],
            "test_writer": writer_id,
            "test_parent": cur,
        }
        try:
            _commit_manifest(table_dir, gen, man, expected_parent=cur, ref="shared")
            committed.append(gen)
            done += 1
        except (CommitConflictError, FileExistsError):
            conflicts += 1
            if conflicts > 5000:
                raise RuntimeError("livelock")
    return writer_id, committed, conflicts


def _wap_racer(args):
    """Race ONLY the publish step: the branch was cut and staged by the
    parent, all four from the SAME base — whatever the interleaving,
    the ref-base divergence check must admit exactly ONE publisher."""
    table_dir, writer_id = args
    import sys

    sys.path.insert(0, "/root/repo")
    from ez_cdc_spark.sources.manifest import (
        CommitConflictError,
        branch_head,
        fast_forward,
        _gen_of,
    )

    name = f"racer-{writer_id}"
    gen = _gen_of(branch_head(table_dir, name)["current"])
    try:
        fast_forward(table_dir, name)
        return writer_id, "published", gen
    except CommitConflictError:
        return writer_id, "refused", gen


def test_branch_cas_serializes_across_processes(spark):
    """The s33 cross-process witness on a REF: 4 OS processes land 6
    commits each on one shared branch — all 24 generations distinct, the
    branch's recorded parent chain is one strict line, and MAIN's pointer
    never moved."""
    import multiprocessing as mp

    from ez_cdc_spark.sources.manifest import read_manifest

    d = _table(spark, "xproc")
    create_branch(d, "shared")
    ctx = mp.get_context("spawn")
    with ctx.Pool(4) as pool:
        results = pool.map(_branch_writer, [(d, w, 6) for w in range(4)])
    all_gens = [g for _, gens, _ in results for g in gens]
    assert len(all_gens) == 24 and len(set(all_gens)) == 24
    assert current_generation(d) == 1  # main untouched by branch traffic
    assert current_generation(d, "shared") == max(all_gens)
    chain = {
        g: read_manifest(d, as_of_generation=g)["test_parent"]
        for g in sorted(all_gens)
    }
    gens_sorted = [1] + sorted(all_gens)
    for prev, cur in zip(gens_sorted, gens_sorted[1:]):
        assert chain[cur] == prev, (cur, chain[cur], prev)


def test_fast_forward_admits_exactly_one_publisher_across_processes(spark):
    """4 branches staged from the SAME base, 4 processes race
    fast_forward: exactly ONE publishes; the refused branches survive
    intact for re-cut."""
    import multiprocessing as mp

    d = _table(spark, "wapracers")
    for w in range(4):
        name = f"racer-{w}"
        create_branch(d, name)  # all cut from base generation 1
        publish_append(
            spark.range(200 + w * 10, 205 + w * 10).selectExpr(
                "id AS k", "id*2 AS v"
            ),
            d,
            2 + w,
            ref=name,
        )
    ctx = mp.get_context("spawn")
    with ctx.Pool(4) as pool:
        results = pool.map(_wap_racer, [(d, w) for w in range(4)])
    published = [r for r in results if r[1] == "published"]
    refused = [r for r in results if r[1] == "refused"]
    assert len(published) == 1 and len(refused) == 3, results
    assert current_generation(d) == published[0][2]
    # refused branches still live, heads intact
    for w, _, gen in refused:
        assert branch_head(d, f"racer-{w}")["current"] == f"gen-{gen}.json"


def test_branch_restore_rewinds_head_only(spark):
    """r16: restore(ref=...) — the mid-WAP rewind: a staging branch that
    failed its audit on the LAST commit rewinds to the last good one and
    continues; main never sees any of it, and the rewound branch still
    fast-forwards."""
    from ez_cdc_spark.sources.manifest import restore

    d = _table(spark, "brrestore")
    create_branch(d, "wap")
    publish_append(
        spark.range(200, 260).selectExpr("id AS k", "id*2 AS v"), d, 2, ref="wap"
    )
    publish_append(
        spark.range(900, 910).selectExpr("id AS k", "id*2 AS v"), d, 3, ref="wap"
    )  # the bad batch the audit catches
    restore(d, 4, as_of_generation=2, ref="wap")
    assert branch_head(d, "wap")["current"] == "gen-4.json"
    got = sorted(
        r["k"] for r in read_committed(spark, d, ref="wap").collect()
    )
    assert got == list(range(260))  # bad batch rewound away
    # main untouched throughout, then the audited state publishes
    assert read_committed(spark, d).count() == 200
    fast_forward(d, "wap")
    assert sorted(r["k"] for r in read_committed(spark, d).collect()) == list(
        range(260)
    )
    # a no-op branch restore refuses like main's
    import pytest as _pytest

    create_branch(d, "wap2")
    with _pytest.raises(ValueError, match="already the committed state"):
        restore(d, 5, as_of_generation=4, ref="wap2")


def _branch_creator(args):
    """Module-level worker: race create_branch on one shared name —
    O_CREAT|O_EXCL must admit exactly one creator per name, across
    interpreters, not just threads."""
    table_dir, writer_id = args
    import sys

    sys.path.insert(0, "/root/repo")
    from ez_cdc_spark.sources.manifest import create_branch

    try:
        create_branch(table_dir, "contested")
        return writer_id, "created"
    except FileExistsError:
        return writer_id, "refused"


def test_create_branch_admits_one_creator_across_processes(spark):
    """r17 verdict #5's third leg: 4 OS processes race create_branch on
    ONE name — exactly one wins (O_CREAT|O_EXCL is the witness), the
    losers get the named refusal, and the surviving ref is intact and
    immediately usable for a branch commit."""
    import multiprocessing as mp

    from ez_cdc_spark.sources.manifest import branch_head

    d = _table(spark, "createrace")
    ctx = mp.get_context("spawn")
    with ctx.Pool(4) as pool:
        results = pool.map(_branch_creator, [(d, w) for w in range(4)])
    created = [r for r in results if r[1] == "created"]
    refused = [r for r in results if r[1] == "refused"]
    assert len(created) == 1 and len(refused) == 3, results
    head = branch_head(d, "contested")
    assert head["current"] == "gen-1.json" and head["base"] == 1
    publish_append(
        spark.range(500, 510).selectExpr("id AS k", "id*2 AS v"),
        d, 2, ref="contested",
    )
    assert current_generation(d, "contested") == 2
    assert current_generation(d) == 1  # main untouched
