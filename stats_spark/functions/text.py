"""Text-analysis column functions for training-data pipelines.

All JVM-side column expressions (no UDFs), with semantics chosen so the
DuckDB oracle can recompute them with the same primitives:

  token_count       whitespace tokens
  word_tokens       lower-cased whitespace split
  quality_score     length / punctuation / stopword-ratio composite
  lang_guess        deterministic n-gram-frequency heuristic
  shingles          w-word shingle array (dedup input)
  md5_long          first 15 hex chars of md5 → 60-bit integer (the
                    portable hash used by minhash/simhash: Spark
                    conv() == DuckDB ('0x'||…)::UBIGINT)
  doc_fingerprint   min md5-hash over 5-word shingles (1-perm minhash,
                    a winnowing-style document fingerprint)
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

STOPWORDS = ["the", "a", "of", "and", "to", "in", "is", "it"]

# character n-grams used by the language heuristic (deterministic, not
# a trained model): score(lang) = Σ occurrences of its marker grams
LANG_MARKERS = {
    "en": ["th", "he", "in"],
    "es": ["de", "la", "os"],
    "de": ["ei", "ch", "en"],
    "fr": ["le", "ou", "es"],
    "zh": ["zh", "ng", "ia"],
}


def word_tokens(col) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.split(F.trim(F.lower(c)), " +")


def token_count(col) -> Column:
    return F.size(word_tokens(col))


def stopword_ratio(col) -> Column:
    toks = word_tokens(col)
    stop = F.array(*[F.lit(s) for s in STOPWORDS])
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(stop, t)))
    return n_stop / F.greatest(F.size(toks), F.lit(1))


def punct_ratio(col) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    stripped = F.regexp_replace(c, "[a-zA-Z0-9 ]", "")
    return F.length(stripped) / F.greatest(F.length(c), F.lit(1))


def quality_score(col) -> Column:
    """Composite in [0,1]: length band + low punctuation + sane
    stopword ratio.  Plain arithmetic → SQL-replicable."""
    c = F.col(col) if isinstance(col, str) else col
    n = F.length(c)
    len_score = F.least(n / F.lit(200.0), F.lit(1.0))
    punct_score = F.greatest(F.lit(0.0), F.lit(1.0) - 4.0 * punct_ratio(c))
    stop = stopword_ratio(c)
    stop_score = F.when((stop >= 0.01) & (stop <= 0.5), 1.0).otherwise(0.5)
    return F.round((len_score + punct_score + stop_score) / 3.0, 6)


def lang_score(col, lang: str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    scores = [F.size(F.split(F.lower(c), m)) - 1 for m in LANG_MARKERS[lang]]
    out = scores[0]
    for s in scores[1:]:
        out = out + s
    return out


def lang_guess(col) -> Column:
    """argmax over marker-gram counts, lexicographic tiebreak — the
    same argmax is expressible in SQL as a greatest() cascade."""
    c = F.col(col) if isinstance(col, str) else col
    pairs = [F.struct(lang_score(c, lg).alias("s"), F.lit(lg).alias("l"))
             for lg in sorted(LANG_MARKERS)]
    # max_by with deterministic tiebreak: compare (score, reverse-lang)
    best = pairs[0]
    for p in pairs[1:]:
        best = F.when(p["s"] > best["s"], p).otherwise(best)
    return best["l"]


def shingles_from(toks, w: int = 3) -> Column:
    """Distinct w-word shingles from an ALREADY-MATERIALIZED token
    array column.  ``toks`` must be a plain column reference: an
    expression embedded here would re-evaluate once per shingle
    position inside the transform lambda (measured quadratic — a
    regex-split-per-position cost 6s for 5k docs)."""
    toks = F.col(toks) if isinstance(toks, str) else toks
    n = F.size(toks)
    idx = F.sequence(F.lit(1), F.greatest(n - (w - 1), F.lit(1)))
    return F.array_distinct(
        F.transform(idx, lambda i: F.concat_ws(" ", F.slice(toks, i, w))))


def shingles(col, w: int = 3) -> Column:
    """Distinct w-word shingles as strings joined by ' '.  Prefer
    projecting ``word_tokens`` into a column and using
    ``shingles_from`` in hot paths (see its docstring)."""
    return shingles_from(word_tokens(col), w)


def md5_long(col) -> Column:
    """60-bit integer from md5 — portable to DuckDB:
    ('0x' || substr(md5(x),1,15))::UBIGINT."""
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("long")


def doc_fingerprint_from(toks, w: int = 5) -> Column:
    """Fingerprint over a materialized token column (the fast path)."""
    sh = shingles_from(toks, w)
    return F.array_min(F.transform(sh, lambda s: md5_long(s)))


def doc_fingerprint(col, w: int = 5) -> Column:
    """Deterministic document fingerprint: minimum 60-bit md5 hash over
    w-word shingles (single-permutation minhash).  Hot paths should
    project word_tokens first and use doc_fingerprint_from."""
    sh = shingles(col, w)
    return F.array_min(F.transform(sh, lambda s: md5_long(s)))
