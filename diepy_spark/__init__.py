"""diepy_spark — a PySpark-native analytics engine with the capabilities of
the reference `3nth/diepy` (import/export/schema-inference utility), extended
with the relational query surface and LLM-data-pipeline operators documented
in SURVEY.md.

Design: everything is declared through the DataFrame / Spark SQL API so that
Catalyst/Tungsten/AQE choose physical strategies (pushdown, broadcast,
codegen). Python UDFs appear only where built-ins genuinely cannot express
the semantics, and then always as Arrow-vectorized Pandas UDFs.
"""

__version__ = "0.1.0"

from diepy_spark.session import get_spark, tune  # noqa: F401


def __getattr__(name):
    """Lazy top-level API: `diepy_spark.DiepyContext`, `parse_dbpath` —
    deferred so `import diepy_spark` stays cheap (no transitive pyspark
    submodule walk at import time)."""
    if name == "DiepyContext":
        from diepy_spark.context import DiepyContext

        return DiepyContext
    if name == "parse_dbpath":
        from diepy_spark.core.dbpath import parse_dbpath

        return parse_dbpath
    raise AttributeError(f"module 'diepy_spark' has no attribute {name!r}")
