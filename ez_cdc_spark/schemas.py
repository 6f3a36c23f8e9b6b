"""Fixed schemas: the Debezium CDC envelope and the testdata tables.

Envelope structure observed in the reference's captured consumer logs
(/root/reference/README.md:331-332) for the table declared in
/root/reference/postgres/init.sql:2-10. ``REPLICA IDENTITY FULL``
(init.sql:10) means update/delete events carry the full before-image, so
``before`` is the same struct as ``after``.
"""

from __future__ import annotations

from pyspark.sql import types as T

# --- CDC envelope (reference §1.2) -------------------------------------------

# Row image of the captured table: customers(id serial PK, first_name,
# last_name, email TEXT) — init.sql:3-6. Wire schema: id int32 NOT NULL
# (default 0), TEXT columns nullable (README.md:331).
CUSTOMERS_ROW = T.StructType(
    [
        T.StructField("id", T.IntegerType(), nullable=False),
        T.StructField("first_name", T.StringType(), nullable=True),
        T.StructField("last_name", T.StringType(), nullable=True),
        T.StructField("email", T.StringType(), nullable=True),
    ]
)

SOURCE_STRUCT = T.StructType(
    [
        T.StructField("version", T.StringType()),
        T.StructField("connector", T.StringType()),
        T.StructField("name", T.StringType()),
        T.StructField("ts_ms", T.LongType()),
        # logical enum io.debezium.data.Enum: true,last,false,incremental
        T.StructField("snapshot", T.StringType()),
        T.StructField("db", T.StringType()),
        T.StructField("sequence", T.StringType()),  # JSON-encoded LSN pair
        T.StructField("schema", T.StringType()),
        T.StructField("table", T.StringType()),
        T.StructField("txId", T.LongType()),
        T.StructField("lsn", T.LongType()),
        T.StructField("xmin", T.LongType()),
    ]
)

TRANSACTION_STRUCT = T.StructType(
    [
        T.StructField("id", T.StringType()),
        T.StructField("total_order", T.LongType()),
        T.StructField("data_collection_order", T.LongType()),
    ]
)


def envelope_schema(row_schema: T.StructType = CUSTOMERS_ROW) -> T.StructType:
    """Debezium envelope for any captured table's row struct.

    op codes: 'c' insert, 'u' update, 'd' delete, 'r' snapshot read
    (snapshot enum evidence: README.md:331).
    """
    return T.StructType(
        [
            T.StructField("before", row_schema, nullable=True),
            T.StructField("after", row_schema, nullable=True),
            T.StructField("source", SOURCE_STRUCT, nullable=True),
            T.StructField("op", T.StringType(), nullable=False),
            T.StructField("ts_ms", T.LongType()),
            T.StructField("transaction", TRANSACTION_STRUCT, nullable=True),
            # sidecar: broker append time, read at main.py:45 in the reference
            T.StructField("kafka_timestamp", T.LongType(), nullable=True),
        ]
    )


ENVELOPE_SCHEMA = envelope_schema()

# --- testdata tables (FIXTURES.md) -------------------------------------------

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)
