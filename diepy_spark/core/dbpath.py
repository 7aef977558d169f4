"""Dotted database-path parsing (reference: /root/reference/diepy/core.py:28-51).

Grammar: SERVER[.DATABASE[.SCHEMA[.TABLE]]] with empty-segment elision
(``SERVER...TABLE`` → schema/database None). Faithful quirks preserved:

- 2-part form is server+database, never server+table (quirk Q3 in SURVEY §8):
  ``diepy export SERVER.TABLE out.csv`` therefore fails upstream.
- In the 2-part form an empty second segment stays '' (not None); 3/4-part
  forms coerce empty database/schema to None.
- >4 parts: every field stays None (the reference's if/elif falls through).
"""

from __future__ import annotations

from typing import NamedTuple


class DbPath(NamedTuple):
    server: str | None
    database: str | None
    schema: str | None
    table: str | None


def parse_dbpath(dbpath: str) -> DbPath:
    parts = dbpath.split(".")
    n = len(parts)
    if n == 1:
        return DbPath(parts[0], None, None, None)
    if n == 2:
        return DbPath(parts[0], parts[1], None, None)
    if n == 3:
        return DbPath(parts[0], parts[1] or None, parts[2], None)
    if n == 4:
        return DbPath(parts[0], parts[1] or None, parts[2] or None, parts[3])
    return DbPath(None, None, None, None)
