"""Identifier canonicalization.

``to_id`` mirrors the reference's `toID` (lowercase, strip everything
outside [a-z0-9]) — `/root/reference/logs/src/config.ts:18-22`.  Two
forms: a Column expression (JVM-side, whole-stage codegen) and a plain
Python one for the oracle / UDF interiors.
"""

from __future__ import annotations

import re

from pyspark.sql import Column, functions as F

_ID_RE = re.compile(r"[^a-z0-9]+")


def to_id_py(s: str | None) -> str:
    if not s:
        return ""
    # fast path: already-canonical ids (the overwhelmingly common case
    # in the parse hot loop) skip the regex
    if s.isalnum() and s.islower() and s.isascii():
        return s
    return _ID_RE.sub("", s.lower())


def to_id(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_replace(F.lower(c), "[^a-z0-9]+", "")
