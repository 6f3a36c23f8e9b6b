"""SparkSession factory.

One place that pins every conf the engine's determinism and scale story
depend on (SURVEY.md §5.3, §4.2). Tests and bench both come through here.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Confs that matter at 100 TB and are safe on local[32]:
#  - AQE on: runtime coalesce of shuffle partitions, skew-join splitting,
#    dynamic broadcast conversion — the scale-up story relies on it.
#  - Arrow on: every pandas UDF crosses JVM<->Python via Arrow batches.
#  - UTC session TZ: timestamp rendering must match the DuckDB oracle.
#  - shuffle.partitions: 32 locally; on a real cluster AQE coalesces from
#    a high initial number, so we set the initial high and let AQE shrink.
_BASE_CONF = {
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    "spark.sql.shuffle.partitions": "32",
    # r19: the merge/upsert hot paths persist() their micro-batch-resolved
    # frames (one execution instead of one per commit action). By default
    # Spark pins a cached plan's PRE-AQE output partitioning, so a tiny
    # cached batch materializes at the full shuffle width and a downstream
    # partitionBy write fans out into (width x partition-values) small
    # files per generation — measured +60% on t30b/t35b as file counts
    # compounded across commits. Let AQE coalesce cached plans too.
    "spark.sql.optimizer.canChangeCachedPlanOutputPartitioning": "true",
    # dims (region/nation/supplier/part/customer at small SF) broadcast freely
    "spark.sql.autoBroadcastJoinThreshold": "64MB",
    "spark.sql.parquet.filterPushdown": "true",
    # events.parquet carries TIMESTAMP(NANOS) which Spark has no type for;
    # read as long and convert in the loader (micros truncation == DuckDB)
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    # ANSI on: the Spark 4 default, and what the external correctness driver
    # runs the queries under — our own sessions must match. All engine
    # arithmetic is ANSI-safe by construction (e.g. the minhash permutations
    # bound a*h+b under 2^63 via the 31-bit modulus, operators/dedup.py).
    "spark.sql.ansi.enabled": "true",
    # Live-tail queries (t42-t45) poll q.lastProgress for the drain point:
    # the data batch, then one EMPTY batch proving the source is caught up.
    # Spark throttles idle-trigger progress events to one per 10 s by
    # default, so each drain sat ~10 s waiting for the REPORT of an
    # already-finished empty batch (measured: 3 drains ≈ 30 s of t42's
    # 47 s wall; batches themselves take ~1 s). Report idle progress
    # promptly instead — reporting cadence only, no execution change.
    "spark.sql.streaming.noDataProgressEventInterval": "250ms",
    "spark.ui.enabled": "false",
    "spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"),
}


def get_spark(app_name: str = "ez_cdc_spark", master: str | None = None) -> SparkSession:
    """Build (or fetch) the engine's SparkSession.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (env, default 32) when
    no session exists; on a cluster the caller passes its own master/URL.
    """
    builder = SparkSession.builder.appName(app_name)
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
        master = f"local[{cpus}]"
    builder = builder.master(master)
    for k, v in _BASE_CONF.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    apply_runtime_conf(spark)
    return spark


def apply_runtime_conf(spark: SparkSession) -> None:
    """Apply the runtime-settable confs to an externally created session.

    The correctness driver hands us its own SparkSession; determinism-critical
    confs (session TZ especially) must be (re)applied there too.
    """
    for k in (
        "spark.sql.session.timeZone",
        "spark.sql.adaptive.enabled",
        "spark.sql.execution.arrow.pyspark.enabled",
        "spark.sql.legacy.parquet.nanosAsLong",
        "spark.sql.streaming.noDataProgressEventInterval",
        "spark.sql.optimizer.canChangeCachedPlanOutputPartitioning",
    ):
        try:
            spark.conf.set(k, _BASE_CONF[k])
        except Exception:
            pass  # conf locked in this deployment; proceed with its value
