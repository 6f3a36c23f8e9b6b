"""Query registry: the SURVEY.md §2b operator surface.

Each query is registered once with (a) a Spark callable ``(spark, sf_dir) ->
DataFrame`` and (b) its DuckDB oracle SQL (or None for non-SQL-expressible
ops, which get a weaker rows-only check). ``__spark_entry__.py`` exposes the
registry to the correctness driver.

Determinism rules applied everywhere (SURVEY.md §5.3):
  * total ORDER BY over output columns,
  * monetary doubles CAST to DECIMAL(12,2) before aggregation, final
    aggregates rendered as ROUND(..., k) cast to DOUBLE (bit-identical on
    both engines because the pre-round arithmetic is exact decimal),
  * session TZ pinned UTC; dates rendered as 'yyyy-MM-dd' strings,
  * no nondeterministic row-picks (dropDuplicates declared as groupBy/min).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass
class QuerySpec:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # DuckDB SQL, or None -> rows-only check
    doc: str = ""


REGISTRY: dict[str, QuerySpec] = {}


def register(name: str, oracle: str | None, doc: str = ""):
    """Decorator: add a query to the registry."""

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        REGISTRY[name] = QuerySpec(name=name, fn=fn, oracle=oracle, doc=doc or (fn.__doc__ or ""))
        return fn

    return deco


def load_all() -> dict[str, QuerySpec]:
    """Import every query module (side effect: fills REGISTRY)."""
    from ez_cdc_spark.queries import (  # noqa: F401
        aggregation,
        extensions,
        joins,
        projection,
        scalar_functions,
        setops,
        sources_sinks,
        streaming_equiv,
        udfs,
        windows,
    )

    return REGISTRY
