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


def events_jsonl(spark: SparkSession, sf_dir: str, n_files: int = 8) -> str:
    """Materialize events as a JSONL replay dir (idempotent per sf_dir)."""
    path = _dir_for(sf_dir, "events")
    marker = os.path.join(path, "_SUCCESS")
    if not os.path.exists(marker):
        ev = load_table(spark, sf_dir, "events").select(
            "event_id",
            "ts",
            "user_id",
            "event_type",
            F.col("value").cast("decimal(12,2)").alias("value"),
            "props",
        )
        ev.repartition(n_files).write.mode("overwrite").json(path)
    return path


def stream_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S5: file streaming source replaying the events table."""
    path = events_jsonl(spark, sf_dir)
    return spark.readStream.schema(EVENTS_JSON_SCHEMA).json(path)


def run_to_memory(stream_df: DataFrame, name: str, output_mode: str = "complete"):
    """T10: availableNow trigger → memory sink → return the result table.

    Deterministic: processes everything available, then stops.
    """
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .option("checkpointLocation", checkpoint_dir())
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return stream_df.sparkSession.table(name)
