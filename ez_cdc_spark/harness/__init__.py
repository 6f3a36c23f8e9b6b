from ez_cdc_spark.harness.oracle import compare_query, run_oracle  # noqa: F401
