"""S40 rename/drop column evolution (epoch-mapped name mapping).

Pins the s40 docstring's contracts: the two silent-corruption guards
(pre-rename files must keep their values; a re-added dropped name must
read NULL), metadata-only commits, stats rekey, time travel across schema
shapes, era folding via compact, the writer matrix, and the refusal set.
"""

import os
import shutil

import pytest
from pyspark.sql.types import LongType, StringType, StructField

from ez_cdc_spark.sources.manifest import (
    alter_constraints,
    compact,
    compact_partial,
    drop_column,
    evolve_schema,
    merge_cow,
    merge_mor,
    pruned_files,
    publish,
    publish_append,
    publish_partitioned,
    read_committed,
    read_manifest,
    rename_column,
    restore,
)

SCRATCH = "/tmp/ez_cdc_test_rename_drop"


def _table(spark, name, n=100):
    d = os.path.join(SCRATCH, name)
    shutil.rmtree(d, ignore_errors=True)
    df = spark.range(n).selectExpr("id AS k", "id * 2 AS v", "id * 3 AS w")
    publish(
        df.repartitionByRange(4, "k").sortWithinPartitions("k"),
        d,
        generation=1,
        stats_columns=["k", "v"],
    )
    return d


def _batch(spark, lo, hi, cols="id AS k, id * 100 AS val, id * 3 AS w"):
    return spark.range(lo, hi).selectExpr(
        *[c.strip() for c in cols.split(",")], "'u' AS op", "1 AS seq"
    )


def test_rename_is_metadata_only_and_preserves_values(spark):
    d = _table(spark, "meta")
    m1 = read_manifest(d)
    rename_column(d, 2, "v", "val")
    m2 = read_manifest(d)
    # zero data I/O: identical file list, no new data dir
    assert m2["files"] == m1["files"]
    assert not os.path.isdir(os.path.join(d, "data", "gen-2"))
    # corruption guard 1: pre-rename files keep their VALUES under the
    # new logical name (a plain name-based read would NULL-fill here)
    r = read_committed(spark, d)
    assert r.columns == ["k", "val", "w"]
    assert r.filter("val <> k * 2").count() == 0
    assert r.filter("val IS NULL").count() == 0


def test_drop_then_readd_reads_null_not_old_bytes(spark):
    d = _table(spark, "resurrect")
    drop_column(d, 2, "w")
    assert read_committed(spark, d).columns == ["k", "v"]
    evolve_schema(d, 3, [StructField("w", LongType(), True)])
    r = read_committed(spark, d)
    # corruption guard 2: the old files physically CONTAIN w = k*3 — the
    # era boundary must force NULL instead of resurrecting those bytes
    assert r.filter("w IS NOT NULL").count() == 0
    # and rows written AFTER the re-add carry their real values
    publish_append(
        spark.range(100, 105).selectExpr("id AS k", "id*2 AS v", "id*9 AS w"), d, 4
    )
    r = read_committed(spark, d)
    assert r.filter("w IS NOT NULL").count() == 5
    assert r.filter("k >= 100 AND w <> k * 9").count() == 0


def test_stats_rekey_keeps_pruning(spark):
    d = _table(spark, "stats")
    rename_column(d, 2, "k", "key")
    man = read_manifest(d)
    for per in man["stats"].values():
        assert "key" in per and "k" not in per
    kept = pruned_files(d, "key", 0, 10)
    assert 0 < len(kept) < man["n_files"]
    # the renamed key column still merges with stats pruning intact
    ch = spark.range(3).selectExpr(
        "id AS key", "id * 100 AS v", "id * 3 AS w", "'u' AS op", "1 AS seq"
    )
    merged = merge_cow(spark, d, ch, key_col="key", generation=3)
    assert merged["merge"]["rewritten_files"] < merged["merge"]["carried_files"] + \
        merged["merge"]["rewritten_files"]
    r = read_committed(spark, d)
    assert sorted(x["v"] for x in r.filter("key < 3").collect()) == [0, 100, 200]


def test_time_travel_reads_each_schema_shape(spark):
    d = _table(spark, "travel")
    rename_column(d, 2, "v", "val")
    drop_column(d, 3, "w")
    assert read_committed(spark, d, as_of_generation=1).columns == ["k", "v", "w"]
    assert read_committed(spark, d, as_of_generation=2).columns == ["k", "val", "w"]
    assert read_committed(spark, d, as_of_generation=3).columns == ["k", "val"]
    # restore to the pre-rename generation restores the OLD shape whole
    restore(d, 4, as_of_generation=1)
    r = read_committed(spark, d)
    assert r.columns == ["k", "v", "w"] and r.filter("v <> k * 2").count() == 0


def test_compact_folds_eras_away(spark):
    d = _table(spark, "fold")
    rename_column(d, 2, "v", "val")
    publish_append(
        spark.range(100, 110).selectExpr("id AS k", "id*2 AS val", "id*3 AS w"), d, 3
    )
    assert read_manifest(d).get("epoch_maps")
    compact(spark, d, 4, target_files=2)
    man = read_manifest(d)
    assert "epoch_maps" not in man and "file_epochs" not in man
    r = read_committed(spark, d)
    assert r.count() == 110 and r.filter("val <> k * 2").count() == 0


def test_partial_compaction_carries_eras(spark):
    d = _table(spark, "partial")
    rename_column(d, 2, "v", "val")
    publish_append(
        spark.range(100, 110).selectExpr("id AS k", "id*2 AS val", "id*3 AS w"), d, 3
    )
    compact_partial(spark, d, 4, max_file_bytes=1 << 30, target_files=2)
    man = read_manifest(d)
    # rewritten files joined the current era; the map machinery survives
    assert man.get("epoch_maps") and set(man["file_epochs"]) == set(man["files"])
    r = read_committed(spark, d)
    assert r.count() == 110 and r.filter("val <> k * 2").count() == 0


def test_refusals(spark):
    d = _table(spark, "refuse")
    with pytest.raises(ValueError, match="no such column"):
        rename_column(d, 2, "ghost", "x")
    with pytest.raises(ValueError, match="already exists"):
        rename_column(d, 2, "v", "W")  # case-insensitive collision
    with pytest.raises(ValueError, match="no such column"):
        drop_column(d, 2, "ghost")
    # constraint-referencing column refuses rename and drop
    alter_constraints(spark, d, 2, add={"v_even": "v % 2 = 0"})
    with pytest.raises(ValueError, match="constraint 'v_even' references"):
        rename_column(d, 3, "v", "val")
    with pytest.raises(ValueError, match="constraint 'v_even' references"):
        drop_column(d, 3, "v")
    alter_constraints(spark, d, 3, drop=["v_even"])
    # last column refuses
    drop_column(d, 4, "v")
    drop_column(d, 5, "w")
    with pytest.raises(ValueError, match="last column"):
        drop_column(d, 6, "k")
    # the PARTITION COLUMN itself refuses (its name IS the directory
    # layout); data columns on partitioned generations evolve fine
    dp = os.path.join(SCRATCH, "refusepart")
    shutil.rmtree(dp, ignore_errors=True)
    publish_partitioned(
        spark.range(20).selectExpr("id AS k", "CAST(id % 3 AS STRING) AS p"),
        dp,
        generation=1,
        partition_col="p",
    )
    with pytest.raises(ValueError, match="partition column"):
        rename_column(dp, 2, "p", "bucket")
    with pytest.raises(ValueError, match="partition column"):
        drop_column(dp, 2, "p")


def test_partitioned_data_columns_evolve(spark):
    """Scope lift: rename/drop of DATA columns on a partitioned
    generation — the epoch read groups by (era, generation dir) with
    basePath anchoring, so partition reconstruction, pruning, appends
    under new names, and cross-era merges all keep working."""
    from ez_cdc_spark.sources.manifest import read_committed_partitions

    d = os.path.join(SCRATCH, "partevolve")
    shutil.rmtree(d, ignore_errors=True)
    publish_partitioned(
        spark.range(200).selectExpr(
            "id AS k", "id*2 AS v", "CAST(id % 4 AS STRING) AS p"
        ),
        d,
        generation=1,
        partition_col="p",
        stats_columns=["k"],
    )
    rename_column(d, 2, "v", "val")
    r = read_committed(spark, d)
    assert r.columns == ["k", "val", "p"]
    assert r.filter("val <> k * 2").count() == 0
    publish_append(
        spark.range(200, 220).selectExpr(
            "id AS k", "id*2 AS val", "CAST(id % 4 AS STRING) AS p"
        ),
        d,
        3,
    )
    ch = spark.range(5).selectExpr(
        "id AS k", "id*999 AS val", "CAST(id % 4 AS STRING) AS p",
        "'u' AS op", "1 AS seq",
    )
    merge_cow(spark, d, ch, key_col="k", generation=4)
    r = read_committed(spark, d)
    assert r.count() == 220
    assert sorted(x["val"] for x in r.filter("k < 5").collect()) == [
        0, 999, 1998, 2997, 3996,
    ]
    # manifest-level partition pruning still resolves across eras
    rp = read_committed_partitions(spark, d, ["2"])
    assert rp.count() == 55 and rp.columns == ["k", "val", "p"]
    # drop a data column, partition survives
    drop_column(d, 5, "val")
    assert read_committed(spark, d).columns == ["k", "p"]


def test_merge_mor_on_epoch_tables(spark):
    """S40×S36 (r16 scope lift): MOR commits compose with rename/drop —
    the resolve lifts every era to the logical plane before the
    anti-join, new upsert files tag with the current era, and compact_mor
    folds both the log and the era history away."""
    from ez_cdc_spark.sources.manifest import compact_mor, read_mor

    d = _table(spark, "morepoch")
    rename_column(d, 2, "v", "val")
    drop_column(d, 3, "w")
    # update k=5, delete k=7, insert k=1000 — all on CURRENT names
    ch = spark.createDataFrame(
        [(5, 999, "u", 1), (7, 0, "d", 1), (1000, 123, "c", 1)],
        "k long, val long, op string, seq long",
    )
    merge_mor(spark, d, ch, key_col="k", generation=4)
    got = sorted((r["k"], r["val"]) for r in read_mor(spark, d).collect())
    exp = sorted(
        [(i, i * 2) for i in range(100) if i not in (5, 7)]
        + [(5, 999), (1000, 123)]
    )
    assert got == exp
    man = read_manifest(d)
    assert man["epoch_maps"] and man["delete_files"]
    # new upsert files carry the CURRENT era tag
    new_rels = [r for r in man["files"] if man["file_epochs"][r] == man["epoch"]]
    assert new_rels and man["epoch"] == 2
    # fold: one identity-epoch COW generation, log and eras gone
    compact_mor(spark, d, 5)
    man = read_manifest(d)
    assert not man.get("epoch_maps") and not man.get("delete_files")
    got = sorted((r["k"], r["val"]) for r in read_committed(spark, d).collect())
    assert got == exp


def test_merge_mor_kills_key_renamed_in_old_era(spark):
    """A key column renamed in an OLDER era: delete entries on the new
    logical name must still kill the old era's physically-differently-
    named rows (the logical-plane join contract)."""
    from ez_cdc_spark.sources.manifest import read_mor

    d = _table(spark, "morepochkey")
    rename_column(d, 2, "k", "kk")
    ch = spark.createDataFrame(
        [(3, 777, "u", 1), (4, 0, "d", 1)], "kk long, val long, op string, seq long"
    )
    rename_column(d, 3, "v", "val")
    merge_mor(
        spark,
        d,
        ch.selectExpr("kk", "val", "CAST(NULL AS LONG) AS w", "op", "seq"),
        key_col="kk",
        generation=4,
    )
    got = sorted((r["kk"], r["val"]) for r in read_mor(spark, d).collect())
    exp = sorted([(i, i * 2) for i in range(100) if i not in (3, 4)] + [(3, 777)])
    assert got == exp


def test_rename_still_refuses_pending_mor_log(spark):
    """The safety the epoch lift RELIES on: rename/drop refuse while a
    delete log is pending, so a pending delete file's key name can never
    drift from the schema's (delete files are read unmapped)."""
    d2 = _table(spark, "morrefuse2")
    merge_mor(
        spark,
        d2,
        spark.range(3).selectExpr(
            "id AS k", "id*7 AS v", "id*3 AS w", "'u' AS op", "1 AS seq"
        ),
        key_col="k",
        generation=2,
    )
    with pytest.raises(ValueError, match="merge-on-read"):
        rename_column(d2, 3, "v", "val")
    with pytest.raises(ValueError, match="merge-on-read"):
        drop_column(d2, 3, "w")


def test_widened_merge_type_is_refused(spark):
    """The hazard s40 exposed, now guarded at the writer: a change batch
    whose table column carries a WIDER type than the stored schema would
    stage files every reader then chokes on."""
    d = _table(spark, "widen")
    wide = spark.range(3).selectExpr(
        "id AS k",
        "CAST(id AS DECIMAL(13,2)) AS v",  # table stores LONG
        "id * 3 AS w",
        "'u' AS op",
        "1 AS seq",
    )
    with pytest.raises(ValueError, match="types must match"):
        merge_cow(spark, d, wide, key_col="k", generation=2)
    assert read_manifest(d)["generation"] == 1
