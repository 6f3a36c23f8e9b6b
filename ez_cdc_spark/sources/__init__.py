from ez_cdc_spark.sources.tables import load_table, load_tables, register_views  # noqa: F401
