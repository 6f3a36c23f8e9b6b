"""Multi-writer replay-watermark carry (ADVICE r15).

The manifest's per-tag ``txns`` map is the Delta ``txn`` action's
appId -> version table: N independent tagged writers sharing one table
each keep their own replay watermark across each other's commits. These
tests pin the fold/carry contract across EVERY commit path — publish,
publish_partitioned, merge_cow, publish_append, compact, compact_partial,
evolve_schema — plus the legacy single-slot upgrade and the tag
normalization between the two storage forms.

Reference parity: the reference's consumer (python/cdc_test/main.py:47-53)
relies on Kafka consumer-group offsets for replay positioning; the engine
analog is the committed watermark, which must survive OTHER writers'
commits exactly like a consumer group's offsets survive other groups'.
"""

import json
import os
import tempfile

import pytest
from pyspark.sql import functions as F  # noqa: N812
from pyspark.sql.types import LongType, StructField

from ez_cdc_spark.sources.manifest import (
    _fold_txns,
    _manifest_path,
    _txns_of,
    compact,
    compact_partial,
    evolve_schema,
    merge_cow,
    publish,
    publish_append,
    publish_partitioned,
    read_committed,
    read_manifest,
    txn_watermark,
)


def _table(spark, n=40):
    return spark.range(n).select(
        F.col("id"), (F.col("id") % 7).cast("string").alias("val")
    )


def _changes(spark, ids, batch_seq=100):
    rows = [(int(i), f"new{i}", "u", batch_seq + k) for k, i in enumerate(ids)]
    return spark.createDataFrame(rows, "id bigint, val string, op string, seq bigint")


def test_fold_and_watermark_tag_normalization():
    # fold coerces tags with str(); lookup must match on both storage forms
    folded = _fold_txns(None, {"tag": 7, "batch_id": 3})
    assert folded == {"7": {"batch_id": 3}}
    man = {"txns": folded}
    assert txn_watermark(man, 7) == {"batch_id": 3}  # int tag vs str key
    assert txn_watermark(man, "7") == {"batch_id": 3}
    # legacy single-slot fallback normalizes the same way
    legacy = {"txn": {"tag": 7, "batch_id": 5}}
    assert txn_watermark(legacy, 7) == {"batch_id": 5}
    assert txn_watermark(legacy, "7") == {"batch_id": 5}
    assert txn_watermark(legacy, "8") is None
    # the folded map wins over a stale single slot for the same tag
    both = {"txn": {"tag": "a", "batch_id": 1}, "txns": {"a": {"batch_id": 9}}}
    assert txn_watermark(both, "a") == {"batch_id": 9}
    # parent map carries forward untouched tags
    f2 = _fold_txns({"a": {"batch_id": 2}}, {"tag": "b", "batch_id": 4})
    assert f2 == {"a": {"batch_id": 2}, "b": {"batch_id": 4}}
    assert _fold_txns(None, None) is None
    assert _txns_of(None) is None
    assert _txns_of({"txn": {"tag": "a", "batch_id": 2}}) == {"a": {"batch_id": 2}}


def test_txns_survive_every_commit_path(spark):
    """The lifecycle walk ADVICE r15 asked for: writer A's watermark must
    be resolvable after writer B's merge, an append, a full compact, a
    partial compact, and a schema evolution — none of which A performed."""
    td = tempfile.mkdtemp(prefix="txns_lifecycle_")
    publish(
        _table(spark),
        td,
        1,
        stats_columns=["id"],
        txn={"tag": "writerA", "batch_id": 3},
    )
    man = read_manifest(td)
    assert txn_watermark(man, "writerA") == {"batch_id": 3}

    # another writer's merge must fold, not erase (the high ADVICE item:
    # merge is the primary CDC sink commit path)
    merge_cow(
        spark, td, _changes(spark, [1, 2]), "id", 2,
        txn={"tag": "writerB", "batch_id": 7},
    )
    man = read_manifest(td)
    assert txn_watermark(man, "writerA") == {"batch_id": 3}
    assert txn_watermark(man, "writerB") == {"batch_id": 7}

    # append carries the map by reference
    batch = spark.createDataFrame([(1000, "x")], "id bigint, val string")
    publish_append(batch, td, 3)
    man = read_manifest(td)
    assert txn_watermark(man, "writerA") == {"batch_id": 3}
    assert txn_watermark(man, "writerB") == {"batch_id": 7}

    # full compact re-publishes: the map must thread through
    compact(spark, td, 4, target_files=1)
    man = read_manifest(td)
    assert txn_watermark(man, "writerA") == {"batch_id": 3}
    assert txn_watermark(man, "writerB") == {"batch_id": 7}

    # grow a small-file tail, then partial-compact it
    publish_append(
        spark.createDataFrame([(2000, "y")], "id bigint, val string"), td, 5
    )
    publish_append(
        spark.createDataFrame([(3000, "z")], "id bigint, val string"), td, 6
    )
    compact_partial(spark, td, 7, max_file_bytes=1 << 30, target_files=1)
    man = read_manifest(td)
    assert txn_watermark(man, "writerA") == {"batch_id": 3}
    assert txn_watermark(man, "writerB") == {"batch_id": 7}

    # schema evolution carries by reference too
    evolve_schema(td, 8, [StructField("extra", LongType(), True)])
    man = read_manifest(td)
    assert txn_watermark(man, "writerA") == {"batch_id": 3}
    assert txn_watermark(man, "writerB") == {"batch_id": 7}

    # and a further tagged merge still folds on top of all of it
    merge_cow(
        spark,
        td,
        _changes(spark, [3]).withColumn("extra", F.lit(None).cast("bigint")),
        "id",
        9,
        txn={"tag": "writerA", "batch_id": 4},
    )
    man = read_manifest(td)
    assert txn_watermark(man, "writerA") == {"batch_id": 4}  # advanced
    assert txn_watermark(man, "writerB") == {"batch_id": 7}  # intact
    # data stayed coherent through the walk
    assert read_committed(spark, td).count() == 40 + 3


def test_publish_defaults_fold_input_to_parent_map(spark):
    """The medium ADVICE item: a tagged publish over an existing table
    must not silently drop other writers' watermarks; txns={} is the
    explicit reset."""
    td = tempfile.mkdtemp(prefix="txns_publish_default_")
    publish(_table(spark), td, 1, txn={"tag": "a", "batch_id": 1})
    publish(_table(spark, 10), td, 2, txn={"tag": "b", "batch_id": 2})
    man = read_manifest(td)
    assert txn_watermark(man, "a") == {"batch_id": 1}
    assert txn_watermark(man, "b") == {"batch_id": 2}
    # explicit reset: a truncate-style rewrite that invalidates history
    publish(_table(spark, 5), td, 3, txn={"tag": "c", "batch_id": 0}, txns={})
    man = read_manifest(td)
    assert txn_watermark(man, "a") is None
    assert txn_watermark(man, "b") is None
    assert txn_watermark(man, "c") == {"batch_id": 0}

    # partitioned publish defaults identically
    td2 = tempfile.mkdtemp(prefix="txns_publish_part_default_")
    pdf = _table(spark).withColumn("p", (F.col("id") % 2).cast("string"))
    publish_partitioned(pdf, td2, 1, "p", txn={"tag": "a", "batch_id": 5})
    publish_partitioned(pdf, td2, 2, "p", txn={"tag": "b", "batch_id": 6})
    man = read_manifest(td2)
    assert txn_watermark(man, "a") == {"batch_id": 5}
    assert txn_watermark(man, "b") == {"batch_id": 6}


def test_legacy_single_slot_upgrades_losslessly(spark):
    """A table whose last commit predates the txns map (single-slot txn
    only, simulated by stripping the map from the committed manifest)
    must not lose that writer's watermark when a differently-tagged
    writer commits on top."""
    td = tempfile.mkdtemp(prefix="txns_legacy_upgrade_")
    publish(_table(spark), td, 1, stats_columns=["id"],
            txn={"tag": "old_sink", "batch_id": 11})
    # simulate the pre-map on-disk form: legacy slot only
    mpath = _manifest_path(td, 1)
    man = json.load(open(mpath))
    man.pop("txns", None)
    os.chmod(mpath, 0o644)
    tmp = mpath + ".tmp"
    json.dump(man, open(tmp, "w"))
    os.replace(tmp, mpath)
    assert "txns" not in read_manifest(td)
    assert txn_watermark(read_manifest(td), "old_sink") == {"batch_id": 11}

    # merge by a NEW writer: the legacy slot must seed the folded map
    merge_cow(spark, td, _changes(spark, [0]), "id", 2,
              txn={"tag": "new_sink", "batch_id": 0})
    man2 = read_manifest(td)
    assert txn_watermark(man2, "old_sink") == {"batch_id": 11}
    assert txn_watermark(man2, "new_sink") == {"batch_id": 0}

    # compact over a legacy-only manifest seeds too
    td3 = tempfile.mkdtemp(prefix="txns_legacy_compact_")
    publish(_table(spark), td3, 1, txn={"tag": "s", "batch_id": 2})
    mpath3 = _manifest_path(td3, 1)
    m3 = json.load(open(mpath3))
    m3.pop("txns", None)
    tmp3 = mpath3 + ".tmp"
    json.dump(m3, open(tmp3, "w"))
    os.replace(tmp3, mpath3)
    compact(spark, td3, 2, target_files=1)
    assert txn_watermark(read_manifest(td3), "s") == {"batch_id": 2}


def test_sink_replay_skip_resolves_through_map(spark):
    """End-to-end shape of the low ADVICE item: after ANOTHER tagged
    writer commits last, the first sink's batch-skip decision (via
    txn_watermark) still sees its own watermark — the single-slot read
    this replaces would have returned -1 and re-applied the batch."""
    td = tempfile.mkdtemp(prefix="txns_skip_")
    publish(_table(spark), td, 1, stats_columns=["id"])
    merge_cow(spark, td, _changes(spark, [1]), "id", 2,
              txn={"tag": "cdc_sink", "batch_id": 5})
    merge_cow(spark, td, _changes(spark, [2]), "id", 3,
              txn={"tag": "backfill", "batch_id": 0})
    man = read_manifest(td)
    # the legacy single slot now names the OTHER writer…
    assert man["txn"]["tag"] == "backfill"
    # …but the sink's skip check resolves its own watermark regardless
    wm = txn_watermark(man, "cdc_sink") or {}
    assert wm.get("batch_id", -1) == 5
    assert 5 <= wm["batch_id"]  # batch 5 would be skipped, 6 would apply


if __name__ == "__main__":
    pytest.main([__file__, "-x", "-q"])
