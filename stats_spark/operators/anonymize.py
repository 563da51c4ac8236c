"""Anonymization workflow (SURVEY §2.2 P9-P10, §2.3 F5-F6).

Spark restatement of the reference's `smogon/anon` job
(`workflows/smogon/anon.ts:82-145`, rewrite rules
`anon/src/index.ts:165-452`):

  sample_conversations   deterministic hash sampling — md5-based so the
                         decision is reproducible run-to-run AND
                         recomputable by the DuckDB oracle (the
                         reference seeds a Mulberry32 PRNG per
                         (format, day) for the same property,
                         logs/src/random.ts:19-32)
  anonymize_transcripts  per-line rewrite: salted md5 player names
                         (first 10 hex — anon/src/index.ts:446-452),
                         nickname idents hashed consistently within a
                         conversation, non-whitelisted line types
                         dropped.  Arrow-batched pandas UDF — the one
                         string-rewrite stage that is genuinely
                         per-line (P9).
  verify_no_leaks        P10: every output line tested against an
                         alternation pattern of the original names
                         (anon/src/index.ts:481-506); returns the
                         leaking rows (must be empty).
"""

from __future__ import annotations

import hashlib
import re
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F

from stats_spark.functions.text import md5_long

# line types preserved in anonymized output — everything else (chat,
# join/leave, timers, raw html...) is dropped, mirroring the
# reference's whitelist approach (anon/src/index.ts:165-412)
KEEP_TYPES = {
    "player", "teamsize", "start", "turn", "move", "switch", "drag",
    "replace", "faint", "win", "tie", "-enditem", "-damage", "-heal",
    "-status", "-boost", "-unboost", "cant", "-miss", "-crit",
}


def anon_name(name: str, salt: str) -> str:
    """X5: first 10 hex chars of md5(name + salt)."""
    return hashlib.md5((name + salt).encode()).hexdigest()[:10]


def sample_conversations(conversations: DataFrame, rate: float,
                         public_only: bool = False) -> DataFrame:
    """F5/F6: keep conv iff md5-hash bucket < rate — deterministic,
    partition-order independent (unlike df.sample)."""
    df = conversations
    if public_only and "roomid" in df.columns:
        df = df.filter(~F.col("roomid").endswith("pw"))
    bucket = F.pmod(md5_long("conv_id"), F.lit(1_000_000))
    return df.filter(bucket < int(rate * 1_000_000))


_IDENT_RE = re.compile(r"(p[12][a-d]?: )([^|]+)")


def anonymize_transcripts(transcripts: DataFrame, conversations: DataFrame,
                          salt: str) -> DataFrame:
    """P9: rewrite player names + nickname idents, drop chatter lines.

    Join carries (p1, p2) to the line side; the rewrite itself is an
    Arrow-batched pandas stage (the reference's per-line switch over
    message types, anon/src/index.ts:165-412)."""
    names = conversations.select("conv_id", "p1", "p2")
    joined = transcripts.join(names, "conv_id", "left")
    out_schema = ("conv_id string, turn_idx int, role string, text string, "
                  "tool string, ts timestamp")

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            texts = []
            keep = []
            for text, conv_id, p1, p2 in zip(pdf["text"], pdf["conv_id"],
                                             pdf["p1"], pdf["p2"]):
                parts = text.split("|")
                kind = parts[1] if len(parts) > 1 else ""
                if kind not in KEEP_TYPES:
                    keep.append(False)
                    texts.append(None)
                    continue
                if kind == "player" and len(parts) > 3:
                    parts[3] = anon_name(parts[3], salt)
                    text = "|".join(parts)
                elif kind == "win" and len(parts) > 2:
                    parts[2] = anon_name(parts[2], salt)
                    text = "|".join(parts)
                # nickname idents: consistent within a conversation
                text = _IDENT_RE.sub(
                    lambda m: m.group(1) + anon_name(m.group(2),
                                                     salt + conv_id)[:6],
                    text)
                keep.append(True)
                texts.append(text)
            pdf = pdf.assign(text=texts)[keep].reset_index(drop=True)
            yield pdf[["conv_id", "turn_idx", "role", "text", "tool", "ts"]]

    return joined.mapInPandas(fn, schema=out_schema)


def verify_no_leaks(anon: DataFrame, conversations: DataFrame) -> DataFrame:
    """P10 leak verifier: any anonymized line still containing one of
    the original player names is a leak.  Pattern is per-conversation
    (column-valued rlike), mirroring the reference's alternation regex
    over all original names."""
    names = conversations.select(
        "conv_id",
        F.concat(F.lit("\\b("),
                 F.regexp_replace(F.col("p1"), r"([.*+?^${}()|\[\]\\])", r"\\$1"),
                 F.lit("|"),
                 F.regexp_replace(F.col("p2"), r"([.*+?^${}()|\[\]\\])", r"\\$1"),
                 F.lit(")\\b")).alias("leak_pattern"))
    return (anon.join(names, "conv_id")
            .filter(F.expr("text rlike leak_pattern"))
            .select("conv_id", "turn_idx", "text"))
