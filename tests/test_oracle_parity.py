"""t2 differential correctness (SURVEY.md §5.2): every registered query with
an oracle must hash-match DuckDB at sf0.01; oracle-less queries must at least
run and return a stable shape (t1 smoke)."""

import pytest

from ez_cdc_spark.harness.oracle import compare_query
from ez_cdc_spark.queries import load_all

ALL = sorted(load_all().keys())


@pytest.mark.parametrize("name", ALL)
def test_query_matches_oracle(spark, sf_dir, name):
    ok, detail = compare_query(spark, name, sf_dir)
    assert ok, f"{name} mismatch: {detail}"


def test_entry_smoke(spark, sf_smoke):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0 and len(df.columns) > 0
    assert set(e.oracle_sql()).issubset(set(e.queries()))
