"""ez_cdc_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of the `ez-cdc` reference (a Debezium/Kafka CDC
pipeline; see /root/reference/python/cdc_test/main.py), extended with the
SURVEY.md §2b relational/streaming/LLM-pipeline operator inventory.

Design principles (SURVEY.md §7):
  * DataFrame / Spark SQL first — Catalyst + Tungsten pick the physical plan.
  * No custom Catalyst rules; no RDDs; no driver-side collect loops.
  * Pandas UDFs (Arrow) only where built-ins can't express the semantics
    (as-of join fallback, embedding block-matmul, multimodal decode).
  * Every operator designed for 100 TB: broadcast small dims, partial aggs,
    bounded streaming state, partitioned sinks.
"""

__version__ = "0.1.0"

from ez_cdc_spark.session import get_spark  # noqa: F401
