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


def test_no_oracle_is_vacuous(sf_dir):
    """Every oracle must return >=1 row on the fixture (r8 verdict #1).

    Two empty result sets always hash-equal, so a 0-row oracle makes the
    driver's hash check vacuous — it proves nothing about the operator's
    semantics (j5/p4 were silently vacuous from r1 through r8 this way).
    DuckDB-only sweep, so a future fixture regeneration that hollows out a
    predicate domain fails fast here without burning a Spark run.
    """
    from ez_cdc_spark.harness.oracle import run_oracle
    from ez_cdc_spark.queries import REGISTRY

    vacuous = []
    for name in ALL:
        spec = REGISTRY[name]
        if spec.oracle is None:
            continue
        rows, _cols = run_oracle(spec.oracle, sf_dir)
        if len(rows) == 0:
            vacuous.append(name)
    assert not vacuous, f"0-row (vacuous) oracles on fixture: {vacuous}"


def test_entry_smoke(spark, sf_smoke):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0 and len(df.columns) > 0
    assert set(e.oracle_sql()).issubset(set(e.queries()))
