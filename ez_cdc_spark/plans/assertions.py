"""Plan-shape assertions (SURVEY.md §5.2 item 5, §4.2).

The 100 TB design rules are checkable on the physical plan string:
pushed filters reach the scan, dim joins broadcast, no cartesian products
sneak in, hot paths stay inside WholeStageCodegen. Tests assert these per
query so a regression in plan shape fails CI even while results stay right.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def plan_str(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def assert_pushed_filter(df: DataFrame, fragment: str = "") -> None:
    p = plan_str(df)
    assert "PushedFilters: [" in p, f"no pushed filters in plan:\n{p[:2000]}"
    if fragment:
        assert fragment in p, f"expected pushed filter {fragment!r} in plan"


def assert_broadcast_join(df: DataFrame) -> None:
    p = plan_str(df)
    assert "BroadcastHashJoin" in p, f"expected BroadcastHashJoin:\n{p[:2000]}"


def assert_no_cartesian(df: DataFrame) -> None:
    p = plan_str(df)
    assert "CartesianProduct" not in p, f"unexpected CartesianProduct:\n{p[:2000]}"


def assert_whole_stage_codegen(df: DataFrame) -> None:
    # formatted explain marks codegen stages with "[codegen id : N]"
    p = plan_str(df)
    assert "codegen id" in p, f"expected WholeStageCodegen spans:\n{p[:2000]}"
