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

# raw string → id memo: the parse hot loop calls to_id_py ~100× per
# battle over a small vocabulary (species/items/natures/moves/names),
# so a dict hit replaces the isalnum/regex work almost always.  Bounded
# to keep a pathological unbounded-vocabulary stream from leaking.
_ID_CACHE: dict[str, str] = {}
_ID_CACHE_MAX = 200_000


def to_id_py(s: str | None) -> str:
    if not s:
        return ""
    v = _ID_CACHE.get(s)
    if v is not None:
        return v
    # already-canonical ids (the overwhelmingly common case in the
    # parse hot loop) skip the regex
    if s.isalnum() and s.islower() and s.isascii():
        v = s
    else:
        v = _ID_RE.sub("", s.lower())
    if len(_ID_CACHE) < _ID_CACHE_MAX:
        _ID_CACHE[s] = v
    return v


def to_id(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_replace(F.lower(c), "[^a-z0-9]+", "")
