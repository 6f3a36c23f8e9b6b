"""Manifest-committed atomic multi-partition publish (S25).

The lakehouse atomicity primitive over plain parquet, without a table
format — the gap left between S7 (partitioned sink) and S18 (dynamic
partition overwrite): those are atomic only per-task, so a reader racing a
multi-partition rewrite can see a torn mix of generations, and an aborted
job leaves half-written partitions visible. Delta/Iceberg close this with a
transaction log; S25 closes it with the minimal two-phase protocol those
formats are built on:

    table_dir/
      data/gen-<g>/part-*.parquet    staged data files (NEVER read directly)
      _manifests/gen-<g>.json        immutable: exact file list + row count
      _MANIFEST                      pointer file: one atomic swap commits

* ``publish`` stages the generation's files, writes the generation manifest,
  then commits by atomically replacing the ``_MANIFEST`` pointer
  (``os.replace`` — an atomic rename on POSIX; object stores would use a
  conditional PUT, HDFS a rename, same shape).
* Readers resolve ONLY through the pointer: ``_MANIFEST`` -> generation
  manifest -> explicit file list. Files not named by the committed manifest
  do not exist as far as readers are concerned, so a crash or abort at ANY
  point before the pointer swap is invisible, and concurrent readers see
  exactly one generation — never a mix.
* ``stage_only`` is the deliberately-aborted write used by tests: data files
  land on disk, no manifest, no swap.

Scale note: the manifest holds file PATHS (O(files), not O(rows)) and the
reader hands Spark an explicit file list — partition pruning and column
pruning behave exactly as with a directory scan, but listing cost is one
small JSON read instead of a recursive directory walk (the same reason real
table formats scale past directory listings at 100 TB).
"""

from __future__ import annotations

import json
import os
import uuid

from pyspark.sql import DataFrame, SparkSession

_POINTER = "_MANIFEST"


def _stage_dir(table_dir: str, generation: int) -> str:
    return os.path.join(table_dir, "data", f"gen-{generation}")


def stage_only(df: DataFrame, table_dir: str, generation: int) -> list[str]:
    """Write a generation's data files WITHOUT committing them (the abort /
    crash case). Returns the staged file paths."""
    stage = _stage_dir(table_dir, generation)
    df.write.mode("overwrite").parquet(stage)
    return sorted(
        os.path.join(stage, f)
        for f in os.listdir(stage)
        if f.endswith(".parquet") and not f.startswith((".", "_"))
    )


def publish(df: DataFrame, table_dir: str, generation: int) -> dict:
    """Two-phase atomic publish: stage files, write the generation manifest,
    swap the pointer. Readers flip from the previous generation to this one
    in one atomic step; nothing in between is observable."""
    files = stage_only(df, table_dir, generation)
    mdir = os.path.join(table_dir, "_manifests")
    os.makedirs(mdir, exist_ok=True)
    manifest = {
        "generation": generation,
        "files": [os.path.relpath(f, table_dir) for f in files],
        "n_files": len(files),
    }
    mname = f"gen-{generation}.json"
    mtmp = os.path.join(mdir, f".{mname}.{uuid.uuid4().hex}.tmp")
    with open(mtmp, "w") as fh:
        json.dump(manifest, fh)
        fh.flush()
        os.fsync(fh.fileno())
    os.replace(mtmp, os.path.join(mdir, mname))

    ptmp = os.path.join(table_dir, f".{_POINTER}.{uuid.uuid4().hex}.tmp")
    with open(ptmp, "w") as fh:
        json.dump({"current": mname}, fh)
        fh.flush()
        os.fsync(fh.fileno())
    os.replace(ptmp, os.path.join(table_dir, _POINTER))  # THE commit point
    return manifest


def committed_files(table_dir: str) -> list[str]:
    """Resolve pointer -> manifest -> absolute file list (no directory walk)."""
    with open(os.path.join(table_dir, _POINTER)) as fh:
        pointer = json.load(fh)
    with open(os.path.join(table_dir, "_manifests", pointer["current"])) as fh:
        manifest = json.load(fh)
    return [os.path.join(table_dir, rel) for rel in manifest["files"]]


def read_committed(spark: SparkSession, table_dir: str) -> DataFrame:
    """Read exactly the committed generation — staged/aborted/superseded
    files in data/ are never touched."""
    return spark.read.parquet(*committed_files(table_dir))


def compact(
    spark: SparkSession, table_dir: str, generation: int, target_files: int = 1
) -> dict:
    """S26: generation compaction under the SAME atomic protocol — the
    maintenance op real table formats run (Delta OPTIMIZE / Iceberg
    rewrite_data_files): read exactly the committed file list, rewrite it
    as ``target_files`` larger files, publish the rewrite as a NEW
    generation with the one-pointer-swap commit. Readers racing the
    compaction see either the old generation or the new one — never a mix,
    never a partial rewrite — and the superseded small files stay on disk
    (invisible) until garbage collection. Content is untouched by
    construction: the input is the committed generation itself."""
    df = read_committed(spark, table_dir).coalesce(target_files)
    return publish(df, table_dir, generation)


def gc(table_dir: str) -> list[str]:
    """Garbage-collect unreferenced generations: delete every data/gen-*
    directory and _manifests/gen-*.json NOT named by the current pointer.
    Safe by construction — the committed generation is resolved FIRST and
    exempted, so a reader that resolved the pointer before the GC ran is
    only at risk if it raced the PREVIOUS commit (the standard table-format
    caveat: retain superseded generations for the maximum reader lifetime
    before collecting; a production deployment would add an age threshold
    here, which the sandbox's synchronous tests don't need). Returns the
    deleted paths."""
    import shutil

    keep = {os.path.dirname(f) for f in committed_files(table_dir)}
    with open(os.path.join(table_dir, _POINTER)) as fh:
        keep_manifest = json.load(fh)["current"]
    deleted: list[str] = []
    data_root = os.path.join(table_dir, "data")
    if os.path.isdir(data_root):
        for d in sorted(os.listdir(data_root)):
            full = os.path.join(data_root, d)
            if full not in keep:
                shutil.rmtree(full)
                deleted.append(full)
    mdir = os.path.join(table_dir, "_manifests")
    if os.path.isdir(mdir):
        for m in sorted(os.listdir(mdir)):
            if m != keep_manifest:
                os.remove(os.path.join(mdir, m))
                deleted.append(os.path.join(mdir, m))
    return deleted
