"""Kafka source/sink wiring (SURVEY.md S4, S8, R5-R8).

The reference's consumer subscribes to ``cdctest.public.customers``, decodes
``bytes → utf-8 → json`` guarded by a null check, and reads the broker
append timestamp (/root/reference/python/cdc_test/main.py:12-14,39-45); the
producer side routes envelopes to ``<prefix>.<schema>.<table>`` keyed by PK
(/root/reference/debezium/customers_conf.json:11-12,
/root/reference/docker-compose.yml:36).

Spark-natively the wiring is two thin builders around
``readStream/writeStream.format("kafka")`` plus a PURE decode/encode layer
(`decode_envelopes` / `encode_envelopes`) that works on any DataFrame with
Kafka's column shape — so the full R6→R8 path is unit-testable with a
static DataFrame, no broker or kafka connector jar needed. The test rig
replays the same envelopes through a file source instead (S5,
streaming/replay.py); only these builders change when pointing at a real
cluster.

Scale notes (100 TB): parallelism = topic partitions; Debezium keys
messages by PK so per-key order survives N-partition topics (SURVEY §1.3).
``minPartitions`` can oversubscribe Spark tasks beyond topic partitions;
``startingOffsets`` is the streaming analog of predicate pushdown (R1).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ez_cdc_spark.streaming.cdc import ENVELOPE_JSON_SCHEMA


def topic_for(prefix: str, schema: str, table: str) -> str:
    """Debezium topic naming scheme <prefix>.<schema>.<table>
    (customers_conf.json:11, README.md:166-174)."""
    return f"{prefix}.{schema}.{table}"


def kafka_source(
    spark: SparkSession,
    brokers: str,
    topic: str,
    starting_offsets: str = "earliest",
    min_partitions: int | None = None,
    fail_on_data_loss: bool = False,
) -> DataFrame:
    """S4/R6: streaming scan of a CDC topic.

    Returns the raw Kafka-shaped stream (key/value BINARY, topic, partition,
    offset, timestamp, timestampType). Offsets are tracked by the query
    checkpoint, superseding the reference's consumer-group autocommit
    (main.py:52); broker retry is handled by the source (R10, main.py:17-35
    becomes config).
    """
    reader = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", brokers)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
        .option("failOnDataLoss", str(fail_on_data_loss).lower())
    )
    if min_partitions:
        reader = reader.option("minPartitions", str(min_partitions))
    return reader.load()


def decode_envelopes(kafka_df: DataFrame) -> DataFrame:
    """R7+R8: null-guard → utf-8 → JSON decode → envelope columns + broker
    timestamp.

    Mirrors main.py:42-45 (``if value: json.loads(msg.value.decode())`` plus
    ``msg.timestamp``) as pure column expressions: works identically on a
    streaming Kafka scan and on any static DataFrame with ``value BINARY,
    timestamp TIMESTAMP`` — the unit-test path.
    """
    return (
        kafka_df.filter(F.col("value").isNotNull())  # main.py:42 `if value:`
        .select(
            F.from_json(F.col("value").cast("string"), ENVELOPE_JSON_SCHEMA).alias("e"),
            F.col("timestamp").alias("broker_ts"),
        )
        .select("e.*", "broker_ts")
    )


def encode_envelopes(env: DataFrame, key_cols: list[str] | None = None) -> DataFrame:
    """R4/R5 producer side: envelope rows → Kafka key/value bytes.

    Key = JSON of the PK columns (Debezium keys by PK ⇒ per-key order on an
    N-partition topic); value = the full envelope JSON.
    """
    keys = key_cols or ["after.id"]
    return env.select(
        F.to_json(F.struct(*[F.col(c) for c in keys])).cast("binary").alias("key"),
        F.to_json(F.struct(*env.columns)).cast("binary").alias("value"),
    )


def kafka_sink(
    env: DataFrame,
    brokers: str,
    topic: str,
    checkpoint: str,
    key_cols: list[str] | None = None,
):
    """S8/R5: publish envelopes to a topic (returns the started query)."""
    return (
        encode_envelopes(env, key_cols)
        .writeStream.format("kafka")
        .option("kafka.bootstrap.servers", brokers)
        .option("topic", topic)
        .option("checkpointLocation", checkpoint)
        .start()
    )
