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

from diepy_spark.session import get_spark  # noqa: F401
