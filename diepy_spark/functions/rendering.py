"""Export value rendering (reference `_cleanbool`, core.py:360-371).

Rendering rules applied as ONE declarative projection before any writer:
- bool → 1 / 0
- datetime → ISO-8601 (microseconds included only when non-zero, exactly
  like Python's datetime.isoformat())
- NULL passes through (the CSV writer renders it as empty)
- everything else → string

Pure built-in expressions: stays inside whole-stage codegen at any scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import BooleanType, DateType, TimestampNTZType, TimestampType


def iso_timestamp(col):
    """ISO-8601 with Python-isoformat micros semantics."""
    has_micros = (F.unix_micros(col.cast(TimestampType())) % 1_000_000) != 0
    return F.when(
        has_micros, F.date_format(col, "yyyy-MM-dd'T'HH:mm:ss.SSSSSS")
    ).otherwise(F.date_format(col, "yyyy-MM-dd'T'HH:mm:ss"))


def render_for_export(df: DataFrame) -> DataFrame:
    cols = []
    for f in df.schema.fields:
        c = F.col(f.name)
        if isinstance(f.dataType, BooleanType):
            expr = F.when(c.isNull(), None).otherwise(
                F.when(c, "1").otherwise("0")
            )
        elif isinstance(f.dataType, (TimestampType, TimestampNTZType)):
            expr = iso_timestamp(c)
        elif isinstance(f.dataType, DateType):
            expr = F.date_format(c, "yyyy-MM-dd")
        else:
            expr = c.cast("string")
        cols.append(expr.alias(f.name))
    return df.select(*cols)
