"""File-source replay rig (SURVEY.md S5, T10).

Streaming tests replay the events table (and derived CDC envelopes) through
``readStream.schema(...).json(dir)`` with ``trigger(availableNow=True)`` —
the deterministic stand-in for the Kafka source (S4): same DataFrame shape,
same watermark/window semantics, no broker dependency. The Kafka wiring
itself is in sources/kafka.py.

Values are written as DECIMAL(12,2) strings so the JSONL round-trip is
exact; timestamps round-trip at micros precision (Spark JSON ISO-8601).
"""

from __future__ import annotations

import hashlib
import os
import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ez_cdc_spark.sources.tables import load_table

_SCRATCH = os.path.join(tempfile.gettempdir(), "ez_cdc_spark_stream")

EVENTS_JSON_SCHEMA = (
    "event_id BIGINT, ts TIMESTAMP, user_id BIGINT, event_type STRING, "
    "value DECIMAL(12,2), props STRING"
)


def _dir_for(sf_dir: str, tag: str) -> str:
    key = hashlib.md5(f"{sf_dir}:{tag}".encode()).hexdigest()[:12]
    return os.path.join(_SCRATCH, f"{tag}-{key}")


def checkpoint_dir() -> str:
    """Fresh checkpoint per run — checkpoints are single-query-owned."""
    return os.path.join(_SCRATCH, "ckpt", uuid.uuid4().hex)


def _events_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "events").select(
        "event_id",
        "ts",
        "user_id",
        "event_type",
        F.col("value").cast("decimal(12,2)").alias("value"),
        "props",
    )


def events_jsonl(spark: SparkSession, sf_dir: str, n_files: int = 8) -> str:
    """Materialize events as a JSONL replay dir (idempotent per sf_dir)."""
    path = _dir_for(sf_dir, "events")
    marker = os.path.join(path, "_SUCCESS")
    if not os.path.exists(marker):
        _events_projection(spark, sf_dir).repartition(n_files).write.mode(
            "overwrite"
        ).json(path)
    return path


def events_parquet(spark: SparkSession, sf_dir: str, n_files: int = 8) -> str:
    """Materialize events as a parquet replay dir (idempotent per sf_dir).

    The dir key includes the replay schema so a layout change can never
    silently reuse a stale fixture from an older build.
    """
    path = _dir_for(sf_dir, f"events_pq-{hashlib.md5(EVENTS_JSON_SCHEMA.encode()).hexdigest()[:8]}")
    marker = os.path.join(path, "_SUCCESS")
    if not os.path.exists(marker):
        _events_projection(spark, sf_dir).repartition(n_files).write.mode(
            "overwrite"
        ).parquet(path)
    return path


def stream_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S5: file streaming source replaying the events table.

    Parquet-backed: per-event JSON parse was ~4x the whole-query cost at
    sf0.1 and contributes nothing to the streaming semantics under test.
    The JSONL path (events_jsonl) remains for wire-format parity tests and
    the envelope stream (cdc.stream_envelopes), which must exercise the
    reference's JSON envelope decode (R7).
    """
    path = events_parquet(spark, sf_dir)
    return spark.readStream.schema(EVENTS_JSON_SCHEMA).parquet(path)


def run_to_memory(stream_df: DataFrame, name: str, output_mode: str = "complete"):
    """T10: availableNow trigger → memory sink → return the result table.

    Deterministic: processes everything available, then stops.
    """
    spark = stream_df.sparkSession
    # Stateful ops create one state store per shuffle partition and AQE is
    # off in streaming; an external session's default (200) means 200 state
    # stores for a 32-core box. Pin to the actual parallelism — safe here
    # because every run uses a fresh checkpoint.
    try:
        spark.conf.set(
            "spark.sql.shuffle.partitions", str(spark.sparkContext.defaultParallelism)
        )
    except Exception:
        pass  # conf locked in this deployment; proceed with its value
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .option("checkpointLocation", checkpoint_dir())
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name)
