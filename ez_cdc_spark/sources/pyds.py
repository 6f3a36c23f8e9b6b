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
