from diepy_spark.sources.registry import load_table, TABLES  # noqa: F401
