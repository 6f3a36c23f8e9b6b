"""Custom Python data source (Spark 4 `pyspark.sql.datasource` API).

A deterministic CDC-envelope generator source ("envelopegen") — the
Spark-native analog of standing up the reference's whole
Postgres→Debezium→Kafka rig just to get change events into a test
(docker-compose.yml:1-72): here the engine itself serves synthetic
envelopes as a first-class `spark.read.format(...)` source with proper
partition splits, so generation scales out like any other scan.

Row formula (pure function of the row index i, so any split of the index
space yields identical data):
    id    = i % 200          (the envelope key space)
    op    = ('c','u','d')[i % 3]
    lsn   = i
    value = (i * 7) % 1000

This is a replay/test source, not a hot-path operator: per-row Python is
fine here because the source exists to feed correctness rigs; the
production path stays the Kafka/parquet scan.

The classes are defined INSIDE the registration function: Spark ships the
DataSource to separate Python worker processes via cloudpickle, which
serializes locally-defined classes by value — so the source works even
when the driver's cwd/sys.path can't see the ez_cdc_spark package (an
external driver importing __spark_entry__ by path hits exactly that).
"""

from __future__ import annotations


def make_envelopegen_source(with_pushdown: bool = True):
    """Build the DataSource class (locally defined → pickled by value).

    A reader that implements pushFilters() hard-fails unless
    ``spark.sql.python.filterPushdown.enabled`` is true, so the
    no-pushdown variant exists for sessions where that conf can't be set
    (register_envelopegen picks).
    """
    from pyspark.sql.datasource import (
        DataSource,
        DataSourceReader,
        EqualTo,
        GreaterThan,
        GreaterThanOrEqual,
        InputPartition,
        LessThan,
        LessThanOrEqual,
        SimpleDataSourceStreamReader,
    )

    class _Split(InputPartition):
        def __init__(self, start: int, end: int):
            self.start = start
            self.end = end

    class EnvelopeGenReader(DataSourceReader):
        def __init__(self, options):
            self.n = int(options.get("n", 1000))
            self.parts = int(options.get("parts", 4))
            self.lo = 0  # generation range [lo, hi) after pushdown
            self.hi = self.n

        def _push_filters(self, filters):
            """Source-level pushdown (SURVEY §4.2): lsn == i by construction,
            so lsn range predicates clamp the generation range — rows outside
            it are never generated, the analog of parquet row-group pruning.
            Everything else is returned for Spark to evaluate."""
            for f in filters:
                if getattr(f, "attribute", None) == ("lsn",):
                    if isinstance(f, GreaterThan):
                        self.lo = max(self.lo, int(f.value) + 1)
                        continue
                    if isinstance(f, GreaterThanOrEqual):
                        self.lo = max(self.lo, int(f.value))
                        continue
                    if isinstance(f, LessThan):
                        self.hi = min(self.hi, int(f.value))
                        continue
                    if isinstance(f, LessThanOrEqual):
                        self.hi = min(self.hi, int(f.value) + 1)
                        continue
                    if isinstance(f, EqualTo):
                        self.lo = max(self.lo, int(f.value))
                        self.hi = min(self.hi, int(f.value) + 1)
                        continue
                yield f

        if with_pushdown:
            pushFilters = _push_filters

        def partitions(self):
            lo, hi = self.lo, max(self.lo, self.hi)
            step = max(1, (hi - lo + self.parts - 1) // self.parts)
            return [_Split(s, min(s + step, hi)) for s in range(lo, hi, step)]

        def read(self, partition):
            for i in range(partition.start, partition.end):
                yield (i % 200, ("c", "u", "d")[i % 3], i, (i * 7) % 1000)

    class EnvelopeGenStreamReader(SimpleDataSourceStreamReader):
        """Streaming variant: the offset is the next row index; each
        micro-batch serves up to batch_size rows until n is exhausted —
        a Kafka-shaped replay entirely inside the engine. read()/
        readBetweenOffsets() share one generator so crash-replay of a
        committed range is bit-identical (the formula is pure)."""

        def __init__(self, options):
            self.n = int(options.get("n", 1000))
            self.batch_size = int(options.get("batch_size", 250))

        def initialOffset(self):
            return {"i": 0}

        def _rows(self, lo, hi):
            # iter over a concrete list, not a generator: the wrapper both
            # iterates AND pickles prefetched rows for crash replay, and a
            # list_iterator satisfies both (generators can't pickle, bare
            # lists aren't iterators)
            return iter(
                [
                    (i % 200, ("c", "u", "d")[i % 3], i, (i * 7) % 1000)
                    for i in range(lo, hi)
                ]
            )

        def read(self, start):
            lo = start["i"]
            hi = min(lo + self.batch_size, self.n)
            return self._rows(lo, hi), {"i": hi}

        def readBetweenOffsets(self, start, end):
            return self._rows(start["i"], end["i"])

    class EnvelopeGenSource(DataSource):
        @classmethod
        def name(cls) -> str:
            return "envelopegen"

        def schema(self) -> str:
            return "id INT, op STRING, lsn BIGINT, value BIGINT"

        def reader(self, schema) -> EnvelopeGenReader:
            return EnvelopeGenReader(self.options)

        def simpleStreamReader(self, schema) -> EnvelopeGenStreamReader:
            return EnvelopeGenStreamReader(self.options)

    return EnvelopeGenSource


def register_envelopegen(spark) -> None:
    """Idempotent registration of the envelopegen format. Enables source
    filter pushdown when the session allows the conf; otherwise registers
    the variant without pushFilters (which would hard-fail with the conf
    off)."""
    try:
        spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
        enabled = spark.conf.get("spark.sql.python.filterPushdown.enabled") == "true"
    except Exception:
        enabled = False
    spark.dataSource.register(make_envelopegen_source(with_pushdown=enabled))


def make_ezmanifest_source(with_pushdown: bool = True):
    """S43: the manifest lakehouse as a first-class ``spark.read.format``
    source — the API-completeness piece: a user (or plain SQL via
    CREATE TABLE ... USING) reads a committed manifest table without
    importing the engine, with time travel (``option('generation', g)``)
    and branch heads (``option('ref', name)``) as reader options.

    ``with_pushdown`` adds S28 file skipping THROUGH the public
    DataSource API: pushFilters (driver-side, at planning) clamps the
    split list by the manifest's per-file min/max stats — a predicate on
    a stats column drops whole files before Spark schedules a single
    task, the Iceberg scan-planning story surfaced through
    ``spark.read.format``. Safety is structural: every filter is handed
    BACK to Spark for full evaluation (pruning is advisory — a file kept
    conservatively still gets the predicate applied), and files without
    stats are always kept, so correctness never depends on stats
    coverage. Registration picks the variant per session conf (the s10
    rule: a pushFilters reader hard-fails when
    spark.sql.python.filterPushdown.enabled is off).

    Resolution happens DRIVER-side at planning (one JSON read — the same
    pointer→manifest→file-list walk as read_committed); each committed
    file becomes one input split, and ``read`` yields pyarrow
    RecordBatches straight from the parquet file — vectorized end to end,
    no per-row Python. Partitioned generations reconstruct the partition
    column from the manifest's per-file value map (a constant arrow
    column per split, cast to the stored type). Honest scoping: MOR
    generations refuse loudly (resolve via read_mor — a raw scan would
    resurrect killed rows) and rename/drop-evolved tables refuse (the
    epoch-mapped read owns the per-era name mapping); both match the
    engine's raw-consumer refusal class.

    Classes are locally defined so cloudpickle ships them BY VALUE to the
    Python workers (the s10 rule: an external driver's workers can't
    import ez_cdc_spark by path)."""
    import json as _json
    import os as _os

    from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition
    from pyspark.sql.types import StructType

    class _FileSplit(InputPartition):
        def __init__(self, path, pcol, pval, schema_json):
            self.path = path
            self.pcol = pcol
            self.pval = pval
            self.schema_json = schema_json

    def _resolve(options) -> dict:
        table_dir = options.get("path")
        if not table_dir:
            raise ValueError("ezmanifest needs option('path', <table_dir>)")
        gen = options.get("generation")
        ref = options.get("ref")
        if gen is not None:
            name = f"gen-{int(gen)}.json"
        else:
            pointer = (
                _os.path.join(table_dir, "_refs", ref)
                if ref
                else _os.path.join(table_dir, "_MANIFEST")
            )
            with open(pointer) as fh:
                name = _json.load(fh)["current"]
        with open(_os.path.join(table_dir, "_manifests", name)) as fh:
            man = _json.load(fh)
        if man.get("delete_files"):
            raise ValueError(
                "ezmanifest reads raw data files, but this generation is "
                "merge-on-read: resolve with read_mor or fold with "
                "compact_mor first"
            )
        if man.get("epoch_maps"):
            raise ValueError(
                "this table has rename/drop history (epoch maps): read it "
                "through read_committed, which owns the per-era name mapping"
            )
        return man

    class ManifestReader(DataSourceReader):
        def __init__(self, options):
            self.options = options
            self.man = _resolve(options)
            self.table_dir = options["path"]
            self.keep = list(self.man["files"])

        def _push_filters(self, filters):
            """Driver-side at planning: clamp the file list by the
            manifest's per-file stats. Every filter is yielded BACK so
            Spark evaluates all of them in full — this method only
            removes files that provably contain no matching row."""
            from pyspark.sql.datasource import (
                EqualTo,
                GreaterThan,
                GreaterThanOrEqual,
                LessThan,
                LessThanOrEqual,
            )

            # per-column [lo, hi] bounds implied by the pushed filters
            bounds: dict[str, list] = {}
            for f in filters:
                attr = getattr(f, "attribute", None)
                col = attr[0] if attr and len(attr) == 1 else None
                val = getattr(f, "value", None)
                if col is not None and isinstance(val, (int, float, str)):
                    lo, hi = bounds.setdefault(col, [None, None])
                    if isinstance(f, (GreaterThan, GreaterThanOrEqual)):
                        bounds[col][0] = val if lo is None else max(lo, val)
                    elif isinstance(f, (LessThan, LessThanOrEqual)):
                        bounds[col][1] = val if hi is None else min(hi, val)
                    elif isinstance(f, EqualTo):
                        bounds[col] = [val, val]
                yield f  # ALWAYS returned: pruning is advisory

            stats = self.man.get("stats") or {}
            kept = []
            for rel in self.man["files"]:
                per = stats.get(rel)
                drop = False
                if per:
                    for col, (lo, hi) in bounds.items():
                        rng = per.get(col)
                        if rng is None or rng[0] is None or rng[1] is None:
                            continue  # no stats for this column: keep
                        try:
                            if (hi is not None and rng[0] > hi) or (
                                lo is not None and rng[1] < lo
                            ):
                                drop = True
                                break
                        except TypeError:
                            continue  # incomparable types: keep (safe)
                if not drop:
                    kept.append(rel)
            self.keep = kept

        if with_pushdown:
            pushFilters = _push_filters

        def partitions(self):
            man = self.man
            pcol = man.get("partition_col")
            parts = man.get("partitions", {})
            schema_json = _json.dumps(man["schema"])
            return [
                _FileSplit(
                    _os.path.join(self.table_dir, rel),
                    pcol,
                    parts.get(rel) if pcol else None,
                    schema_json,
                )
                for rel in self.keep
            ]

        def read(self, split):
            import json as _j

            import pyarrow as pa
            import pyarrow.parquet as pq
            from pyspark.sql.pandas.types import to_arrow_schema
            from pyspark.sql.types import StructType as _ST

            logical = to_arrow_schema(_ST.fromJson(_j.loads(split.schema_json)))
            pf = pq.ParquetFile(split.path)
            for batch in pf.iter_batches():
                cols = []
                for field in logical:
                    if split.pcol is not None and field.name == split.pcol:
                        # partition value lives in the manifest map, not
                        # the file — a constant column at the stored type
                        cols.append(
                            pa.array([split.pval] * batch.num_rows).cast(
                                field.type
                            )
                        )
                    elif field.name in batch.schema.names:
                        cols.append(
                            batch.column(field.name).cast(field.type)
                        )
                    else:
                        # additive evolution: pre-evolution files lack the
                        # appended column — NULL-fill at the stored type
                        cols.append(pa.nulls(batch.num_rows, field.type))
                yield pa.RecordBatch.from_arrays(cols, schema=logical)

    class ManifestSource(DataSource):
        @classmethod
        def name(cls) -> str:
            return "ezmanifest"

        def schema(self):
            return StructType.fromJson(_resolve(self.options)["schema"])

        def reader(self, schema) -> ManifestReader:
            return ManifestReader(self.options)

    return ManifestSource


def register_ezmanifest(spark) -> None:
    """Idempotent registration of the ezmanifest format. Enables
    stats-based split pruning when the session allows Python source
    pushdown; otherwise registers the variant without pushFilters (which
    would hard-fail with the conf off — the s10 rule)."""
    try:
        spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
        enabled = spark.conf.get("spark.sql.python.filterPushdown.enabled") == "true"
    except Exception:
        enabled = False
    spark.dataSource.register(make_ezmanifest_source(with_pushdown=enabled))
