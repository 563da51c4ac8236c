"""Driver contract for the spark-graft builder (PySpark target).

``entry``      — flagship smoke query on /root/testdata/sf0.001.
``queries``    — one entry per implemented operator (SURVEY.md §2 +
                 the training-data ops); each takes (spark, sf_dir).
``oracle_sql`` — DuckDB-equivalent ANSI SQL per query.  Transcript
                 queries read the committed deterministic t2 corpus via
                 read_parquet(); weighted aggregates use a portable
                 Cody-erf SQL expression (functions/sqlgen.py) so the
                 oracle recomputes the same doubles, rounded to 6dp on
                 both sides.  The one query with no oracle entry is
                 tr_anon_leaks (a planted-leak NEGATIVE test — its
                 value is that the verifier fires, not a row set);
                 the driver records a rows-only check for it.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, functions as F

REPO = os.path.dirname(os.path.abspath(__file__))
if REPO not in sys.path:  # make `stats_spark` importable however we're loaded
    sys.path.insert(0, REPO)

# ---------------------------------------------------------------------
# transcript corpus plumbing

T2_DIR = os.path.join(REPO, "data", "corpus_t2")
TR_GLOB = f"{T2_DIR}/transcripts.parquet/*/*.parquet"
CV_PATH = f"{T2_DIR}/conversations.parquet"
TR = f"read_parquet('{TR_GLOB}', hive_partitioning=1)"
CV = f"read_parquet('{CV_PATH}')"

CUTOFFS = [0, 1500, 1630, 1760]


def _corpus() -> dict:
    from stats_spark.datagen import corpus
    return corpus.ensure_corpus("t2")


def _parse_version() -> str:
    """Cache key covering everything that shapes the parsed battles:
    the parser + dims code and the corpus generation marker.  A stale
    cache from an older code version must never feed the driver gate."""
    import hashlib

    h = hashlib.md5()
    for rel in ("stats_spark/operators/parse.py",
                "stats_spark/functions/ids.py",
                "stats_spark/datagen/dims.py"):
        with open(os.path.join(REPO, rel), "rb") as f:
            h.update(f.read())
    marker = os.path.join(T2_DIR, "_DONE")
    if os.path.exists(marker):
        with open(marker, "rb") as f:
            h.update(f.read())
    return h.hexdigest()[:10]


def _battles(spark: SparkSession) -> DataFrame:
    """Parse once per (corpus, code version), cache as parquet (the S5
    checkpoint).  The path embeds a code+corpus hash so a parser change
    or regenerated corpus invalidates the cache automatically."""
    from stats_spark.operators.parse import parse_battles
    from stats_spark.sources import tables

    c = _corpus()
    path = os.path.join(T2_DIR, f"battles_cache_{_parse_version()}")
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        tr = tables.load_transcripts(spark, c)
        cv = tables.load_conversations(spark, c)
        parse_battles(tr, cv).write.mode("overwrite").parquet(path)
    # GC stale siblings from older code versions — exactly one battles
    # cache lives on disk at a time
    import shutil
    for d in os.listdir(T2_DIR):
        full = os.path.join(T2_DIR, d)
        if (d.startswith("battles_cache_") and full != path
                and os.path.isdir(full)):
            shutil.rmtree(full, ignore_errors=True)
    return spark.read.parquet(path)


def _frames(spark: SparkSession) -> dict:
    from stats_spark.plans import pipeline
    return pipeline.build_frames(spark, _battles(spark))


def _battles_glob() -> str:
    """DuckDB source for the parsed-battles checkpoint (S5).  The FSM
    outputs (matchups, leads) are not SQL-expressible, but their
    AGGREGATION is — the oracle consumes the checkpoint the way the
    reference's combine stage consumes its per-day checkpoints
    (logs/src/checkpoints.ts); the FSM itself is byte-parity-proven
    against the reference fixtures (tests/test_parity.py).  Builds the
    checkpoint if this process hasn't parsed yet (e.g. the driver
    evaluates oracle SQL before the Spark queries)."""
    path = os.path.join(T2_DIR, f"battles_cache_{_parse_version()}")
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        from stats_spark.session import get_spark
        _battles(get_spark("oracle-prep"))
    return f"read_parquet('{path}/*.parquet')"


def _dims():
    from stats_spark.datagen import dims
    return dims


def _accepted_sql() -> str:
    d = _dims()
    accepted = [f for f, *_ in d.FORMATS if d.accept_format(f)]
    return "(" + ", ".join(f"'{f}'" for f in accepted) + ")"


def _mega_case_sql(species: str, item: str) -> str:
    d = _dims()
    whens = "".join(
        f"WHEN {species} = '{sp}' AND {item} = '{it}' THEN '{mega}' "
        for (sp, it), (mega, _ab) in sorted(d.mega_dict().items()))
    return f"(CASE {whens}ELSE {species} END)"


def _species_in_sql() -> str:
    d = _dims()
    ids = sorted(d.species_table().species_id)
    return "(" + ", ".join(f"'{s}'" for s in ids) + ")"


def _canon_sql(col: str = "format") -> str:
    """J5 canonicalizeFormat as a CASE literal over the known format
    universe — the oracle twin of enrich.canonical_format_col().  The
    pipeline keys every aggregate by the canonical name
    (workflows/smogon/stats.ts:124-130), so the battle-checkpoint
    oracles re-key the same way."""
    d = _dims()
    return ("CASE " + col + " " + "".join(
        f"WHEN '{f}' THEN '{d.canonicalize_format(f)}' "
        for f, *_ in d.FORMATS if d.canonicalize_format(f) != f)
        + "ELSE " + col + " END")


def _rejects_cte() -> str:
    """conv_ids the parser quarantines (P8 subset reachable in the
    generated corpus: malformed move/switch lines, unknown species).
    Non-singles formats skip the matchup FSM entirely (parse.py:264-267,
    parser.ts:119), so line-level corruption never rejects there."""
    d = _dims()
    non_singles = "(" + ", ".join(
        f"'{f}'" for f in sorted(d.NON_SINGLES_FORMATS)) + ")"
    toid = ("regexp_replace(lower(string_split(string_split(text,'|')[4], ',')[1]),"
            " '[^a-z0-9]+', '', 'g')")
    return f"""
  rejects AS (
    SELECT DISTINCT conv_id FROM {TR}
    WHERE format NOT IN {non_singles}
      AND ((string_split(text,'|')[2] = 'move' AND len(string_split(text,'|')) < 4)
       OR (string_split(text,'|')[2] IN ('switch','drag','replace')
           AND (len(string_split(text,'|')) < 4
                OR {toid} NOT IN {_species_in_sql()})))
  )"""


def _nature_mult_sql(stat: str) -> str:
    d = _dims()
    plus = sorted(n for n, (p, _m) in d.NATURES.items() if p == stat)
    minus = sorted(n for n, (_p, m) in d.NATURES.items() if m == stat)
    return (f"(CASE WHEN nature IN ({', '.join(map(repr, plus))}) THEN 1.1 "
            f"WHEN nature IN ({', '.join(map(repr, minus))}) THEN 0.9 "
            f"ELSE 1.0 END)")


def _stat_sql(stat: str) -> str:
    """gen>=3 stat formula (functions/statcalc.calc_stat twin)."""
    core = (f"floor((2 * b_{stat} + iv_{stat} + floor(ev_{stat} / 4))"
            f" * level / 100)")
    if stat == "hp":
        return f"(CASE WHEN b_hp = 1 THEN 1 ELSE {core} + level + 10 END)"
    return f"floor(({core} + 5) * {_nature_mult_sql(stat)})"


def _ev_out_sql(stat: str) -> str:
    """statToEV round-trip (functions/statcalc.stat_to_ev twin)."""
    if stat == "hp":
        ev = (f"(ceil((stat_hp - level - 10) * 100 / level)"
              f" - 2 * b_hp - iv_hp) * 4")
        return f"(CASE WHEN b_hp = 1 THEN 0 ELSE greatest(0, {ev}) END)"
    n = _nature_mult_sql(stat)
    ev = (f"(ceil((ceil(stat_{stat} / {n}) - 5) * 100 / level)"
          f" - 2 * b_{stat} - iv_{stat}) * 4")
    return f"greatest(0, {ev})"


def _mega_ability_sql(species: str, item: str, ability: str) -> str:
    d = _dims()
    whens = "".join(
        f"WHEN {species} = '{sp}' AND {item} = '{it}' THEN '{ab}' "
        for (sp, it), (_mega, ab) in sorted(d.mega_dict().items()))
    return f"(CASE {whens}ELSE {ability} END)"


def _species_stats_values() -> str:
    d = _dims()
    return ", ".join(
        f"('{r.species_id}', {r.base_hp}, {r.base_atk}, {r.base_def}, "
        f"{r.base_spa}, {r.base_spd}, {r.base_spe})"
        for r in d.species_table().itertuples())


def _weighted_mons_cte() -> str:
    """CTE chain: accepted conversations → side rows → effective
    ratings → UNNEST(team) with mega rewrite → × cutoffs with erf
    weight.  Produces monsw(format, turns, cutoff, species, w)."""
    from stats_spark.functions import sqlgen

    side = """
  sides AS (
    SELECT conv_id, {canon} AS format, turns,
           CASE WHEN winner = p1 THEN 1 WHEN winner = p2 THEN -1 ELSE 0 END AS outcome,
           p1_rating_rpr AS rpr, p1_rating_rprd AS rprd, p1_team AS team
    FROM {cv} WHERE format IN {acc} AND conv_id NOT IN (SELECT conv_id FROM rejects)
    UNION ALL
    SELECT conv_id, {canon}, turns,
           CASE WHEN winner = p2 THEN 1 WHEN winner = p1 THEN -1 ELSE 0 END,
           p2_rating_rpr, p2_rating_rprd, p2_team
    FROM {cv} WHERE format IN {acc} AND conv_id NOT IN (SELECT conv_id FROM rejects)
  )""".format(cv=CV, acc=_accepted_sql(), canon=_canon_sql())
    eff = f"""
  eff AS (
    SELECT conv_id, format, turns,
           {sqlgen.effective_rpr_sql('rpr', 'rprd', 'outcome')} AS erpr,
           {sqlgen.effective_rprd_sql('rpr', 'rprd', 'outcome')} AS erprd,
           team
    FROM sides
  )"""
    mons = f"""
  mons AS (
    SELECT conv_id, format, turns, erpr, erprd,
           {_mega_case_sql('u.species', 'u.item')} AS species
    FROM (SELECT conv_id, format, turns, erpr, erprd, unnest(team) AS u FROM eff)
  )"""
    monsw = f"""
  monsw AS (
    SELECT m.*, c.cutoff,
           {sqlgen.weighting_sql('m.erpr', 'm.erprd', 'c.cutoff')} AS w
    FROM mons m CROSS JOIN (VALUES (0),(1500),(1630),(1760)) AS c(cutoff)
  )"""
    return ",".join([_rejects_cte(), side, eff, mons, monsw])


# ---------------------------------------------------------------------
# the queries


def entry(spark: SparkSession) -> DataFrame:
    """Flagship smoke: shipping-priority join-agg on sf0.001."""
    sf = "/root/testdata/sf0.001"
    cust = spark.read.parquet(f"{sf}/customer.parquet")
    orders = spark.read.parquet(f"{sf}/orders.parquet")
    li = spark.read.parquet(f"{sf}/lineitem.parquet")
    return (li.join(orders, li.l_orderkey == orders.o_orderkey)
            .join(F.broadcast(cust.filter(F.col("c_mktsegment") == "BUILDING")),
                  orders.o_custkey == cust.c_custkey)
            .groupBy("o_orderkey", "o_orderpriority")
            .agg(F.round(F.sum(li.l_extendedprice * (1 - li.l_discount)), 4)
                  .alias("revenue"))
            .orderBy(F.desc("revenue"), F.asc("o_orderkey"))
            .limit(20))


def _tpch(spark, sf_dir, name):
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


# ---- TPC-H-style operator checks ------------------------------------

def q1_pricing_summary(spark, sf_dir):
    li = _tpch(spark, sf_dir, "lineitem")
    return (li.filter(F.col("l_shipdate") <= "1998-09-02")
            .groupBy("l_returnflag", "l_linestatus")
            .agg(F.sum("l_quantity").alias("sum_qty"),
                 F.round(F.sum("l_extendedprice"), 4).alias("sum_base_price"),
                 F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4)
                  .alias("sum_disc_price"),
                 F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))
                               * (1 + F.col("l_tax"))), 4).alias("sum_charge"),
                 F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
                 F.round(F.avg("l_extendedprice"), 6).alias("avg_price"),
                 F.round(F.avg("l_discount"), 6).alias("avg_disc"),
                 F.count("*").alias("count_order")))


def q3_shipping_priority(spark, sf_dir):
    cust = _tpch(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING")
    orders = _tpch(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < "1998-01-01")
    li = _tpch(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > "1998-01-01")
    return (li.join(orders, li.l_orderkey == orders.o_orderkey)
            .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
            .groupBy("o_orderkey")
            .agg(F.round(F.sum(li.l_extendedprice * (1 - li.l_discount)), 4)
                  .alias("revenue"))
            .orderBy(F.desc("revenue"), F.asc("o_orderkey")).limit(10))


def q5_region_revenue(spark, sf_dir):
    r = _tpch(spark, sf_dir, "region")
    n = _tpch(spark, sf_dir, "nation")
    c = _tpch(spark, sf_dir, "customer")
    o = _tpch(spark, sf_dir, "orders")
    li = _tpch(spark, sf_dir, "lineitem")
    return (li.join(o, li.l_orderkey == o.o_orderkey)
            .join(c, o.o_custkey == c.c_custkey)
            .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
            .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
            .groupBy("r_name", "n_name")
            .agg(F.round(F.sum(li.l_extendedprice * (1 - li.l_discount)), 4)
                  .alias("revenue"),
                 F.count("*").alias("n_lineitems")))


def q_top_suppliers(spark, sf_dir):
    s = _tpch(spark, sf_dir, "supplier")
    li = _tpch(spark, sf_dir, "lineitem")
    return (li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
            .groupBy("s_suppkey", "s_name")
            .agg(F.round(F.sum(li.l_extendedprice * (1 - li.l_discount)), 4)
                  .alias("revenue"))
            .orderBy(F.desc("revenue"), F.asc("s_suppkey")).limit(10))


def q_part_type_share(spark, sf_dir):
    from pyspark.sql import Window
    p = _tpch(spark, sf_dir, "part")
    li = _tpch(spark, sf_dir, "lineitem")
    rev = (li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
           .groupBy("p_type")
           .agg(F.sum(li.l_extendedprice * (1 - li.l_discount)).alias("rev")))
    total = Window.partitionBy()
    return rev.select(
        "p_type", F.round("rev", 4).alias("revenue"),
        F.round(F.col("rev") * 100.0 / F.sum("rev").over(total), 6)
         .alias("share_pct"))


def q_events_hourly(spark, sf_dir):
    # NTZ read: hour bucketing is wall-clock like DuckDB's, whatever
    # time zone the harness session runs in (see q_events_sessions)
    ev = (spark.read.option("inferTimestampNTZ", "true")
          .parquet(os.path.join(sf_dir, "events.parquet")))
    return (ev.groupBy("event_type",
                       F.date_format(F.date_trunc("hour", "ts"),
                                     "yyyy-MM-dd HH:mm:ss").alias("hour"))
            .agg(F.count("*").alias("n"),
                 F.round(F.sum("value"), 6).alias("sum_value"),
                 F.round(F.avg("value"), 6).alias("avg_value")))


def q_events_sessions(spark, sf_dir):
    from pyspark.sql import Window
    # events.parquet stores naive timestamp[us].  Read it as
    # TIMESTAMP_NTZ so the session-gap arithmetic is wall-clock — the
    # exact naive micros DuckDB's epoch_us() sees — independent of the
    # harness session's time zone (incl. DST nonlinearity), WITHOUT
    # mutating any session conf (a global timeZone set here would leak
    # into every later query and make results order-dependent).
    ev = (spark.read.option("inferTimestampNTZ", "true")
          .parquet(os.path.join(sf_dir, "events.parquet")))
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.col("ts") - F.lag("ts").over(w)
    return (ev.withColumn(
                "new_session",
                F.when(F.lag("ts").over(w).isNull()
                       | (gap > F.expr("INTERVAL '1800' SECOND")), 1)
                 .otherwise(0))
            .groupBy("user_id")
            .agg(F.count("*").alias("n_events"),
                 F.sum("new_session").alias("n_sessions")))


# ---- documents: text analysis + dedup --------------------------------

def doc_stats(spark, sf_dir):
    from stats_spark.functions import text as T
    docs = _tpch(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        T.token_count("text").alias("n_tokens"),
        T.quality_score("text").alias("quality"),
        T.lang_guess("text").alias("lang_guess"),
        F.round(T.stopword_ratio("text"), 6).alias("stopword_ratio"))


def doc_lang_counts(spark, sf_dir):
    from stats_spark.functions import text as T
    docs = _tpch(spark, sf_dir, "documents")
    return (docs.select(T.lang_guess("text").alias("lang_guess"))
            .groupBy("lang_guess").agg(F.count("*").alias("n_docs")))


def doc_fingerprints(spark, sf_dir):
    from stats_spark.functions import text as T
    docs = _tpch(spark, sf_dir, "documents")
    return (docs.select("doc_id", T.word_tokens("text").alias("toks"))
            .select("doc_id",
                    T.doc_fingerprint_from("toks", 5).alias("fingerprint")))


def doc_dedup_exact(spark, sf_dir):
    from stats_spark.operators import dedup
    docs = _tpch(spark, sf_dir, "documents")
    # digest over the full text + a coarse prefix key so the query
    # returns non-trivial groups on an all-unique corpus
    prefix = F.concat_ws(" ", F.slice(F.split(F.lower("text"), " +"), 1, 3))
    groups = (docs.select(prefix.alias("prefix_key"), "doc_id")
              .groupBy("prefix_key")
              .agg(F.count("*").alias("n_docs"), F.min("doc_id").alias("keep_id"))
              .filter(F.col("n_docs") > 1))
    exact = dedup.exact_dups(docs).select(
        F.col("digest").alias("prefix_key"), "n_docs", "keep_id")
    return groups.unionByName(exact)


def doc_ngram_jaccard(spark, sf_dir):
    from stats_spark.operators import dedup
    docs = _tpch(spark, sf_dir, "documents")
    return dedup.ngram_jaccard_pairs(docs, threshold=0.30)


def doc_minhash_lsh(spark, sf_dir):
    from stats_spark.operators import dedup
    docs = _tpch(spark, sf_dir, "documents")
    return dedup.minhash_lsh_pairs(docs, k=16, band_rows=2)


def doc_simhash(spark, sf_dir):
    from stats_spark.operators import dedup
    docs = _tpch(spark, sf_dir, "documents")
    return dedup.simhash64(docs).withColumnRenamed("id", "doc_id")


# ---- embeddings: similarity search -----------------------------------

def emb_cosine_topk(spark, sf_dir):
    from stats_spark.operators import similarity
    emb = _tpch(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 20)
    return similarity.cosine_topk(emb, queries, k=5)


def emb_dup_pairs(spark, sf_dir):
    from stats_spark.operators import dedup
    emb = _tpch(spark, sf_dir, "embeddings")
    # synthetic embeddings top out at cosine ≈0.51 — 0.45 exercises the
    # operator with a non-trivial (but small) result set.  Candidates
    # come from multi-band hyperplane LSH (equi-join, never O(n²)); the
    # oracle reproduces the same seed-deterministic planes.
    return dedup.embedding_dup_pairs(emb, threshold=0.45)


def emb_ann_lsh(spark, sf_dir):
    from stats_spark.operators import similarity
    emb = _tpch(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 20)
    return similarity.ann_topk(emb, queries, k=5, n_planes=8)


def emb_ann_banded(spark, sf_dir):
    """Multi-band ANN (the recall-scalable v2 of emb_ann_lsh)."""
    from stats_spark.operators import similarity
    emb = _tpch(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 20)
    return similarity.ann_topk_banded(emb, queries, k=5, n_bands=8,
                                      planes_per_band=2)


def emb_ann_ivf(spark, sf_dir):
    """IVF ANN: k-means-trained coarse quantizer (one Lloyd round over
    a deterministic hash-ordered sample), disjoint inverted lists,
    nprobe-cell probing."""
    from stats_spark.operators import similarity
    emb = _tpch(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 20)
    return similarity.ann_topk_ivf(emb, queries, k=5, n_cells=16,
                                   nprobe=2, train_rounds=1)


# ---- multimodal plumbing (stubbed decode) -----------------------------

MEDIA_PATH = os.path.join(REPO, "data", "media_t1.parquet")


def mm_features(spark, sf_dir):
    """Arrow-batched mapInPandas feature extraction over opaque binary
    media payloads; decode itself is a disclosed deterministic stub
    (no codecs in this image) but n_bytes / digest / mean_byte are pure
    functions of the payload bytes — DuckDB-oracle-checked over the
    same committed parquet."""
    from stats_spark.operators import multimodal as MM
    media = spark.read.parquet(MM.ensure_media_parquet(MEDIA_PATH))
    return (MM.extract_features(media).drop("feat")
            .withColumn("mean_byte", F.round("mean_byte", 6)))


# ---- transcript pipeline queries --------------------------------------

def tr_line_type_counts(spark, sf_dir):
    from stats_spark.sources import tables
    tr = tables.load_transcripts(spark, _corpus())
    return (tr.groupBy("format",
                       F.split("text", "\\|").getItem(1).alias("line_type"))
            .agg(F.count("*").alias("n")))


def tr_turns_per_format(spark, sf_dir):
    from stats_spark.sources import tables
    cv = tables.load_conversations(spark, _corpus())
    return (cv.groupBy("format")
            .agg(F.count("*").alias("n_convs"),
                 F.round(F.avg("turns"), 6).alias("avg_turns"),
                 F.max("turns").alias("max_turns")))


def tr_player_wins(spark, sf_dir):
    b = _battles(spark).filter("error IS NULL")
    side = F.explode(F.array(
        F.struct(F.col("p1_name").alias("player"),
                 (F.col("winner") == "p1").cast("int").alias("win"),
                 (F.col("winner") == "tie").cast("int").alias("tie")),
        F.struct(F.col("p2_name").alias("player"),
                 (F.col("winner") == "p2").cast("int").alias("win"),
                 (F.col("winner") == "tie").cast("int").alias("tie"))))
    return (b.select(side.alias("s")).select("s.*")
            .groupBy("player")
            .agg(F.count("*").alias("games"), F.sum("win").alias("wins"),
                 F.sum("tie").alias("ties"))
            .orderBy(F.desc("games"), F.desc("wins"), F.asc("player"))
            .limit(100))


def tr_format_canon(spark, sf_dir):
    """J5 — canonicalizeFormat (util.ts:261-275) as a broadcast dim
    join: historical format names (pokebank*/oras*/*current/beta/
    smogondoubles…) re-key to their canonical formats before the
    group-by, exactly the rewrite the reference applies when merging
    report trees across eras."""
    from stats_spark.operators import enrich
    b = _battles(spark).filter("error IS NULL")
    fm = F.broadcast(enrich.dim_formats_df(spark)
                     .select("format", "canonical_format"))
    return (b.join(fm, "format")
            .groupBy("canonical_format")
            .agg(F.count("*").alias("n_battles"),
                 F.countDistinct("format").alias("n_source_formats"),
                 F.round(F.avg("turns"), 6).alias("avg_turns")))


def tr_rejects(spark, sf_dir):
    b = _battles(spark)
    return (b.filter("error IS NOT NULL")
            .groupBy("format").agg(F.count("*").alias("n_rejected")))


def tr_usage_weighted(spark, sf_dir):
    f = _frames(spark)
    return f["usage"].select(
        "format", "cutoff", "species", "raw_count",
        F.round("raw_weight", 6).alias("raw_weight"))


def tr_usage_report(spark, sf_dir):
    from pyspark.sql import Window
    f = _frames(spark)
    u = f["usage"].filter(F.col("cutoff") == 1630) \
        .withColumn("w6", F.round("usage_weighted", 6))
    tot = (u.groupBy("format")
           .agg(F.sum("usage_weighted").alias("total")))
    w = Window.partitionBy("format").orderBy(F.desc("w6"), F.asc("species"))
    return (u.join(tot, "format")
            .withColumn("rank", F.row_number().over(w))
            .select("format", "rank", "species",
                    F.col("w6").alias("usage_weighted"),
                    F.round(F.col("usage_weighted") * 100.0 / F.col("total"), 4)
                     .alias("usage_pct"))
            .filter(F.col("rank") <= 30))


def tr_leads_raw(spark, sf_dir):
    f = _frames(spark)
    return (f["leads"].filter(F.col("cutoff") == 0)
            .select("format", "species", "lead_raw"))


def tr_teammate_pairs(spark, sf_dir):
    f = _frames(spark)
    return (f["teammates"].filter((F.col("cutoff") == 0)
                                  & (F.col("species") < F.col("teammate")))
            .select("format", "species", "teammate", "raw"))


def tr_encounters(spark, sf_dir):
    f = _frames(spark)
    return f["encounters"].filter(F.col("cutoff") == 1500).select(
        "format", "species", "opponent",
        *[F.round(f"o{i}", 6).alias(f"o{i}") for i in range(13)])


def tr_moveset(spark, sf_dir):
    f = _frames(spark)
    return (f["moveset"].filter(F.col("cutoff") == 1630)
            .select("format", "species", "section", "key",
                    F.round("weight", 6).alias("weight"), "raw"))


def tr_metagame(spark, sf_dir):
    f = _frames(spark)
    return f["metagame"].select("format", "cutoff", "tag",
                                F.round("weight", 6).alias("weight"))


def tr_usage_by_tag(spark, sf_dir):
    """A13 single-pass tag fan-out (classifier-derived shards)."""
    f = _frames(spark)
    return (f["usage_tagged"].filter(F.col("cutoff") == 1500)
            .select("format", "tag", "species", "raw_count",
                    F.round("usage_weighted", 6).alias("usage_weighted")))


def tr_viability(spark, sf_dir):
    f = _frames(spark)
    return f["viability"].filter(F.col("cutoff") == 0).select(
        "format", "species", "n", "gxe_max", "gxe_p1", "gxe_p20")


def tr_anon_sample(spark, sf_dir):
    """F5 deterministic hash sampling at rate 0.25 — reproducible and
    oracle-recomputable (md5 bucket, not df.sample)."""
    from stats_spark.operators import anonymize as A
    from stats_spark.sources import tables
    cv = tables.load_conversations(spark, _corpus())
    return (A.sample_conversations(cv, 0.25)
            .groupBy("format").agg(F.count("*").alias("n_sampled")))


def tr_anon_leaks(spark, sf_dir):
    """P9+P10: anonymize the corpus, then leak-verify.  Returns one row
    per format with line counts and leaks (must be 0)."""
    from stats_spark.operators import anonymize as A
    from stats_spark.sources import tables
    tr = tables.load_transcripts(spark, _corpus())
    cv = tables.load_conversations(spark, _corpus())
    anon = A.anonymize_transcripts(tr, cv, salt="bench-salt")
    leaks = A.verify_no_leaks(anon, cv)
    fm = cv.select("conv_id", "format")
    out = (anon.join(fm, "conv_id")
           .groupBy("format").agg(F.count("*").alias("n_lines")))
    lk = (leaks.join(fm, "conv_id")
          .groupBy("format").agg(F.count("*").alias("n_leaks")))
    return (out.join(lk, "format", "left")
            .na.fill(0, ["n_leaks"])
            .select("format", "n_lines", "n_leaks"))


def tr_anon_public(spark, sf_dir):
    """F6 public-battle filter + F5 hash sampling: password rooms
    (roomid ending 'pw', anon/src/index.ts:95) are excluded before the
    deterministic md5-bucket sample."""
    from stats_spark.operators import anonymize as A
    from stats_spark.sources import tables
    cv = tables.load_conversations(spark, _corpus())
    return (A.sample_conversations(cv, 0.5, public_only=True)
            .groupBy("format").agg(F.count("*").alias("n_public")))


def tr_tier_update(spark, sf_dir):
    """W10 tier rise/drop ladder over month-bucketed weighted usage."""
    from stats_spark.plans import tiers
    b = _battles(spark)
    monthly = tiers.monthly_usage(b, cutoff=1630, n_months=3)
    return tiers.tier_update(tiers.combined_usage(monthly, n_months=3),
                             spark)


def tr_binary_db(spark, sf_dir):
    """S8 fixed-width binary battle rows (Binary.Log gen-1 layout,
    stats/BINARY.md:15-31, workflows/pkmn/db.ts): 77-byte ts/turns/
    end-type/ratings/teams records, encoded entirely JVM-side and
    returned as hex for the hash gate.  The corpus has no gen<=2
    formats, so the layout is exercised over all parsed battles; the
    byte offsets themselves are pinned by tests/test_binary_db.py."""
    from stats_spark.operators import binary_db
    b = _battles(spark).filter("error IS NULL")
    return binary_db.encode_logs(b, gen=1).select("conv_id", "ts_ms",
                                                  "row_hex")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        # scans/joins/aggs/windows over the driver tables
        "q1_pricing_summary": q1_pricing_summary,
        "q3_shipping_priority": q3_shipping_priority,
        "q5_region_revenue": q5_region_revenue,
        "q_top_suppliers": q_top_suppliers,
        "q_part_type_share": q_part_type_share,
        "q_events_hourly": q_events_hourly,
        "q_events_sessions": q_events_sessions,
        # text analysis / dedup / similarity
        "doc_stats": doc_stats,
        "doc_lang_counts": doc_lang_counts,
        "doc_fingerprints": doc_fingerprints,
        "doc_dedup_exact": doc_dedup_exact,
        "doc_ngram_jaccard": doc_ngram_jaccard,
        "doc_minhash_lsh": doc_minhash_lsh,
        "doc_simhash": doc_simhash,
        "emb_cosine_topk": emb_cosine_topk,
        "emb_dup_pairs": emb_dup_pairs,
        "emb_ann_lsh": emb_ann_lsh,
        "emb_ann_banded": emb_ann_banded,
        "emb_ann_ivf": emb_ann_ivf,
        "mm_features": mm_features,
        # transcript pipeline (parse → enrich → route → aggregate)
        "tr_line_type_counts": tr_line_type_counts,
        "tr_turns_per_format": tr_turns_per_format,
        "tr_player_wins": tr_player_wins,
        "tr_format_canon": tr_format_canon,
        "tr_rejects": tr_rejects,
        "tr_anon_sample": tr_anon_sample,
        "tr_anon_public": tr_anon_public,
        "tr_anon_leaks": tr_anon_leaks,
        "tr_usage_weighted": tr_usage_weighted,
        "tr_usage_report": tr_usage_report,
        "tr_leads_raw": tr_leads_raw,
        "tr_teammate_pairs": tr_teammate_pairs,
        "tr_tier_update": tr_tier_update,
        "tr_binary_db": tr_binary_db,
        "tr_encounters": tr_encounters,
        "tr_moveset": tr_moveset,
        "tr_metagame": tr_metagame,
        "tr_usage_by_tag": tr_usage_by_tag,
        "tr_viability": tr_viability,
    }


# ---------------------------------------------------------------------
# oracle SQL


def _doc_toks() -> str:
    return "string_split_regex(lower(trim(text)), ' +')"


def _shingles(w: int) -> str:
    toks = _doc_toks()
    return (f"list_distinct(list_transform("
            f"generate_series(1, greatest(len({toks}) - {w - 1}, 1)), "
            f"i -> array_to_string(({toks})[i:i+{w - 1}], ' ')))")


def _md5_long(x: str) -> str:
    return f"(('0x' || substr(md5({x}), 1, 15))::UBIGINT)"


def _lang_guess_sql() -> str:
    from stats_spark.functions.text import LANG_MARKERS
    expr = None
    for lg in sorted(LANG_MARKERS):
        score = " + ".join(
            f"(len(string_split(lower(text), '{m}')) - 1)"
            for m in LANG_MARKERS[lg])
        row = f"struct_pack(s := ({score}), l := '{lg}')"
        expr = row if expr is None else \
            f"(CASE WHEN ({row}).s > ({expr}).s THEN {row} ELSE {expr} END)"
    return f"({expr}).l"


def oracle_sql() -> dict[str, str]:
    _corpus()  # make sure the transcript parquet exists before DuckDB runs
    from stats_spark.functions.text import STOPWORDS

    acc = _accepted_sql()
    stop_in = "(" + ", ".join(f"'{s}'" for s in STOPWORDS) + ")"
    toks = _doc_toks()

    sql: dict[str, str] = {}

    sql["q1_pricing_summary"] = """
      SELECT l_returnflag, l_linestatus,
             sum(l_quantity) AS sum_qty,
             round(sum(l_extendedprice), 4) AS sum_base_price,
             round(sum(l_extendedprice * (1 - l_discount)), 4) AS sum_disc_price,
             round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 4) AS sum_charge,
             round(avg(l_quantity), 6) AS avg_qty,
             round(avg(l_extendedprice), 6) AS avg_price,
             round(avg(l_discount), 6) AS avg_disc,
             count(*) AS count_order
      FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
      GROUP BY 1, 2"""

    sql["q3_shipping_priority"] = """
      SELECT o_orderkey,
             round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue
      FROM customer JOIN orders ON o_custkey = c_custkey
                    JOIN lineitem ON l_orderkey = o_orderkey
      WHERE c_mktsegment = 'BUILDING'
        AND o_orderdate < TIMESTAMP '1998-01-01'
        AND l_shipdate  > TIMESTAMP '1998-01-01'
      GROUP BY 1 ORDER BY revenue DESC, o_orderkey ASC LIMIT 10"""

    sql["q5_region_revenue"] = """
      SELECT r_name, n_name,
             round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue,
             count(*) AS n_lineitems
      FROM region JOIN nation ON n_regionkey = r_regionkey
                  JOIN customer ON c_nationkey = n_nationkey
                  JOIN orders ON o_custkey = c_custkey
                  JOIN lineitem ON l_orderkey = o_orderkey
      GROUP BY 1, 2"""

    sql["q_top_suppliers"] = """
      SELECT s_suppkey, s_name,
             round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue
      FROM supplier JOIN lineitem ON l_suppkey = s_suppkey
      GROUP BY 1, 2 ORDER BY revenue DESC, s_suppkey ASC LIMIT 10"""

    sql["q_part_type_share"] = """
      WITH rev AS (
        SELECT p_type, sum(l_extendedprice * (1 - l_discount)) AS r
        FROM part JOIN lineitem ON l_partkey = p_partkey GROUP BY 1)
      SELECT p_type, round(r, 4) AS revenue,
             round(r * 100.0 / sum(r) OVER (), 6) AS share_pct
      FROM rev"""

    sql["q_events_hourly"] = """
      SELECT event_type,
             strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour,
             count(*) AS n,
             round(sum(value), 6) AS sum_value,
             round(avg(value), 6) AS avg_value
      FROM events GROUP BY 1, 2"""

    sql["q_events_sessions"] = """
      WITH g AS (
        SELECT user_id,
               CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER
                      (PARTITION BY user_id ORDER BY ts, event_id) > 1800000000
                    OR lag(ts) OVER
                      (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                    THEN 1 ELSE 0 END AS new_session
        FROM events)
      SELECT user_id, count(*) AS n_events,
             sum(new_session)::BIGINT AS n_sessions
      FROM g GROUP BY 1"""

    # documents --------------------------------------------------------
    sql["doc_stats"] = f"""
      SELECT doc_id,
             len({toks}) AS n_tokens,
             round((
               least(length(text) / 200.0, 1.0)
               + greatest(0.0, 1.0 - 4.0 *
                   (length(regexp_replace(text, '[a-zA-Z0-9 ]', '', 'g'))
                    / greatest(length(text), 1)))
               + (CASE WHEN
                    (len(list_filter({toks}, t -> t IN {stop_in}))
                     / greatest(len({toks}), 1)) BETWEEN 0.01 AND 0.5
                  THEN 1.0 ELSE 0.5 END)
             ) / 3.0, 6) AS quality,
             {_lang_guess_sql()} AS lang_guess,
             round(len(list_filter({toks}, t -> t IN {stop_in}))
                   / greatest(len({toks}), 1), 6) AS stopword_ratio
      FROM documents"""

    sql["doc_lang_counts"] = f"""
      SELECT {_lang_guess_sql()} AS lang_guess, count(*) AS n_docs
      FROM documents GROUP BY 1"""

    sql["doc_fingerprints"] = f"""
      SELECT doc_id,
             list_min(list_transform({_shingles(5)},
                                     s -> {_md5_long('s')}))::BIGINT AS fingerprint
      FROM documents"""

    sql["doc_dedup_exact"] = f"""
      WITH p AS (
        SELECT array_to_string(({toks})[1:3], ' ') AS prefix_key, doc_id
        FROM documents)
      SELECT prefix_key, count(*) AS n_docs, min(doc_id) AS keep_id
      FROM p GROUP BY 1 HAVING count(*) > 1
      UNION ALL
      SELECT md5(text) AS prefix_key, count(*) AS n_docs, min(doc_id) AS keep_id
      FROM documents GROUP BY md5(text) HAVING count(*) > 1"""

    sql["doc_ngram_jaccard"] = f"""
      WITH sh0 AS (
        SELECT doc_id AS id, unnest({_shingles(3)}) AS sh FROM documents),
      sh AS (  -- hot-shingle document-frequency cap (max_df=1000)
        SELECT id, sh FROM sh0
        WHERE sh IN (SELECT sh FROM sh0 GROUP BY sh HAVING count(*) <= 1000)),
      sizes AS (SELECT id, count(*) AS n FROM sh GROUP BY 1),
      inter AS (
        SELECT a.id AS id_a, b.id AS id_b, count(*) AS inter
        FROM sh a JOIN sh b ON a.sh = b.sh AND a.id < b.id
        GROUP BY 1, 2)
      SELECT id_a, id_b, inter, sa.n AS n_a, sb.n AS n_b,
             round(inter / (sa.n + sb.n - inter), 6) AS jaccard
      FROM inter JOIN sizes sa ON sa.id = id_a JOIN sizes sb ON sb.id = id_b
      WHERE round(inter / (sa.n + sb.n - inter), 6) >= 0.30"""

    # two 60-bit hashes per md5 digest (hex chars 1-15 and 17-31),
    # mirroring dedup.minhash_signature's halved-md5 scheme
    minhash_cols = ", ".join(
        f"min(('0x' || substr(md5(sh || '#{i // 2}'), "
        f"{1 if i % 2 == 0 else 17}, 15))::UBIGINT) AS h{i}"
        for i in range(16))
    band_structs = ", ".join(
        f"struct_pack(band := {bi}, key := h{bi * 2}::VARCHAR || '_' || h{bi * 2 + 1}::VARCHAR)"
        for bi in range(8))
    sql["doc_minhash_lsh"] = f"""
      WITH sh AS (
        SELECT doc_id AS id, unnest({_shingles(3)}) AS sh FROM documents),
      sig AS (SELECT id, {minhash_cols} FROM sh GROUP BY id),
      buckets AS (
        SELECT id, b.band AS band, b.key AS key
        FROM (SELECT id, unnest([{band_structs}]) AS b FROM sig))
      SELECT a.id AS id_a, b.id AS id_b, count(*) AS n_bands
      FROM buckets a JOIN buckets b
        ON a.band = b.band AND a.key = b.key AND a.id < b.id
      GROUP BY 1, 2"""

    sql["doc_simhash"] = f"""
      WITH t AS (
        SELECT doc_id AS id, {_md5_long('tok')}::BIGINT AS h
        FROM (SELECT doc_id, unnest(list_distinct({toks})) AS tok
              FROM documents)),
      bits AS (
        SELECT id, b,
               sum(CASE WHEN (h >> b) & 1 = 1 THEN 1 ELSE -1 END) AS v
        FROM t CROSS JOIN (SELECT unnest(generate_series(0, 59)) AS b)
        GROUP BY 1, 2)
      SELECT id AS doc_id,
             sum(CASE WHEN v > 0 THEN (1::BIGINT << b) ELSE 0 END)::BIGINT
               AS simhash
      FROM bits GROUP BY 1"""

    # embeddings -------------------------------------------------------
    dot = ("list_dot_product(list_transform(a.embedding, x -> x::DOUBLE), "
           "list_transform(b.embedding, x -> x::DOUBLE))")
    norm = lambda s: (f"sqrt(list_dot_product("  # noqa: E731
                      f"list_transform({s}.embedding, x -> x::DOUBLE), "
                      f"list_transform({s}.embedding, x -> x::DOUBLE)))")
    sql["emb_cosine_topk"] = f"""
      WITH scored AS (
        SELECT b.vec_id AS q_id, a.vec_id AS neighbor_id,
               round({dot} / ({norm('a')} * {norm('b')}), 6) AS cosine
        FROM embeddings a JOIN embeddings b
          ON b.vec_id < 20 AND a.vec_id <> b.vec_id)
      SELECT q_id, neighbor_id, cosine, rank FROM (
        SELECT *, row_number() OVER
          (PARTITION BY q_id ORDER BY cosine DESC, neighbor_id ASC) AS rank
        FROM scored)
      WHERE rank <= 5"""

    # mirror the Spark operator's multi-band hyperplane LSH gating: the
    # planes are seed-deterministic (similarity.band_planes), so DuckDB
    # recomputes the exact bucket keys and the exact candidate set
    from stats_spark.operators.similarity import band_planes as _bp
    tensor = _bp(8, 2, 64, 7)
    vdot = "list_dot_product(vec, [{lits}])"
    band_keys = []
    for bi in range(tensor.shape[0]):
        bits = " || ".join(
            "(CASE WHEN " + vdot.format(
                lits=", ".join(repr(float(x)) for x in p))
            + " >= 0 THEN '1' ELSE '0' END)"
            for p in tensor[bi])
        band_keys.append(f"struct_pack(band := {bi}, key := ({bits}))")
    sql["emb_dup_pairs"] = f"""
      WITH n AS (
        SELECT vec_id AS id,
               list_transform(embedding, x -> x::DOUBLE) AS vec
        FROM embeddings),
      nn AS (SELECT id, vec, sqrt(list_dot_product(vec, vec)) AS nrm FROM n),
      buckets AS (
        SELECT id, b.band AS band, b.key AS key
        FROM (SELECT id, unnest([{", ".join(band_keys)}]) AS b FROM nn)),
      cand AS (
        SELECT DISTINCT a.id AS id_a, b.id AS id_b
        FROM buckets a JOIN buckets b
          ON a.band = b.band AND a.key = b.key AND a.id < b.id)
      SELECT id_a, id_b,
             round(list_dot_product(x.vec, y.vec) / (x.nrm * y.nrm), 6)
               AS cosine
      FROM cand JOIN nn x ON x.id = id_a JOIN nn y ON y.id = id_b
      WHERE round(list_dot_product(x.vec, y.vec) / (x.nrm * y.nrm), 6)
            >= 0.45"""

    # multi-band ANN: same seed-deterministic band keys, query side is
    # vec_id < 20, candidates = any shared band bucket (deduped), then
    # the per-query top-k over rounded cosine
    sql["emb_ann_banded"] = f"""
      WITH n AS (
        SELECT vec_id AS id,
               list_transform(embedding, x -> x::DOUBLE) AS vec
        FROM embeddings),
      nn AS (SELECT id, vec, sqrt(list_dot_product(vec, vec)) AS nrm FROM n),
      buckets AS (
        SELECT id, b.band AS band, b.key AS key
        FROM (SELECT id, unnest([{", ".join(band_keys)}]) AS b FROM nn)),
      cand AS (
        SELECT DISTINCT q.id AS q_id, a.id AS nid
        FROM buckets q JOIN buckets a
          ON q.id < 20 AND a.band = q.band AND a.key = q.key
         AND a.id <> q.id),
      scored AS (
        SELECT q_id, nid AS neighbor_id,
               round(list_dot_product(y.vec, x.vec) / (y.nrm * x.nrm), 6)
                 AS cosine
        FROM cand JOIN nn x ON x.id = cand.q_id
                  JOIN nn y ON y.id = cand.nid)
      SELECT q_id, neighbor_id, cosine, rank FROM (
        SELECT *, row_number() OVER
          (PARTITION BY q_id ORDER BY cosine DESC, neighbor_id ASC) AS rank
        FROM scored)
      WHERE rank <= 5"""

    # LSH-bucketed ANN: the single-bucket hyperplane signature is
    # seed-deterministic (similarity._planes), so DuckDB reproduces the
    # exact buckets and the exact candidate set
    from stats_spark.operators.similarity import _planes
    pl = _planes(64, 8, 7)
    bits = " || ".join(
        "(CASE WHEN list_dot_product(vec, ["
        + ", ".join(repr(float(x)) for x in p)
        + "]) >= 0 THEN '1' ELSE '0' END)" for p in pl)
    sql["emb_ann_lsh"] = f"""
      WITH nn AS (
        SELECT vec_id AS id,
               list_transform(embedding, x -> x::DOUBLE) AS vec
        FROM embeddings),
      nb AS (
        SELECT id, vec, sqrt(list_dot_product(vec, vec)) AS nrm,
               ({bits}) AS bucket
        FROM nn),
      scored AS (
        SELECT q.id AS q_id, a.id AS neighbor_id,
               round(list_dot_product(a.vec, q.vec) / (a.nrm * q.nrm), 6)
                 AS cosine
        FROM nb a JOIN nb q
          ON q.id < 20 AND a.bucket = q.bucket AND a.id <> q.id)
      SELECT q_id, neighbor_id, cosine, rank FROM (
        SELECT *, row_number() OVER
          (PARTITION BY q_id ORDER BY cosine DESC, neighbor_id ASC) AS rank
        FROM scored)
      WHERE rank <= 5"""

    # IVF ANN: the coarse quantizer is k-means-trained
    # (similarity.train_ivf_centroids — one Lloyd round over the 1024
    # smallest-md5(id) sample, pure sequential float64 math).  The
    # oracle rebuilds the IDENTICAL ordered sample via DuckDB and runs
    # the same trainer, so the centroid literals inlined below are
    # bit-equal to what the Spark operator broadcasts; sequential
    # list_dot_product matches Spark's F.aggregate fold bit-for-bit, so
    # cell assignment, probing and scoring reproduce exactly.  Ties in
    # cell score go to the larger cell id (Spark's struct array_max).
    import duckdb as _dk
    from stats_spark.operators.similarity import train_ivf_centroids
    _sfdir = os.environ.get("SPARK_GRAFT_ORACLE_SF_DIR",
                            "/root/testdata/sf0.01")
    _sample = [list(r[0]) for r in _dk.sql(f"""
        SELECT list_transform(embedding, x -> x::DOUBLE)
        FROM read_parquet('{_sfdir}/embeddings.parquet')
        ORDER BY md5(vec_id::VARCHAR), vec_id LIMIT 1024""").fetchall()]
    _cents = train_ivf_centroids(_sample, 16, rounds=1)
    _cent_rows = ", ".join(
        "({}, [{}])".format(ci, ", ".join(repr(x) for x in c))
        for ci, c in _cents)
    sql["emb_ann_ivf"] = f"""
      WITH n AS (
        SELECT vec_id AS id,
               list_transform(embedding, x -> x::DOUBLE) AS vec
        FROM embeddings),
      nn AS (SELECT id, vec, sqrt(list_dot_product(vec, vec)) AS nrm FROM n),
      cents AS (
        SELECT * FROM (VALUES {_cent_rows}) AS c(cell, cvec)),
      assign AS (
        SELECT a.id, c.cell,
               row_number() OVER (PARTITION BY a.id
                 ORDER BY list_dot_product(a.vec, c.cvec) DESC,
                          c.cell DESC) AS rn
        FROM nn a CROSS JOIN cents c),
      cellof AS (SELECT id, cell FROM assign WHERE rn = 1),
      probes AS (
        SELECT q.id AS q_id, c.cell,
               row_number() OVER (PARTITION BY q.id
                 ORDER BY list_dot_product(q.vec, c.cvec) DESC,
                          c.cell DESC) AS rn
        FROM nn q CROSS JOIN cents c WHERE q.id < 20),
      scored AS (
        SELECT pr.q_id, co.id AS neighbor_id,
               round(list_dot_product(y.vec, x.vec) / (y.nrm * x.nrm), 6)
                 AS cosine
        FROM (SELECT q_id, cell FROM probes WHERE rn <= 2) pr
        JOIN cellof co ON co.cell = pr.cell
        JOIN nn x ON x.id = pr.q_id
        JOIN nn y ON y.id = co.id
        WHERE co.id <> pr.q_id)
      SELECT q_id, neighbor_id, cosine, rank FROM (
        SELECT *, row_number() OVER
          (PARTITION BY q_id ORDER BY cosine DESC, neighbor_id ASC) AS rank
        FROM scored)
      WHERE rank <= 5"""

    # transcripts ------------------------------------------------------
    sql["tr_line_type_counts"] = f"""
      SELECT format, string_split(text, '|')[2] AS line_type, count(*) AS n
      FROM {TR} GROUP BY 1, 2"""

    sql["tr_turns_per_format"] = f"""
      SELECT format, count(*) AS n_convs, round(avg(turns), 6) AS avg_turns,
             max(turns) AS max_turns
      FROM {CV} GROUP BY 1"""

    # group key is to_id(name) — the Spark side groups the parser's
    # normalized p1_name/p2_name (parse.py builds them with to_id_py);
    # winner comparison stays on the RAW name (the |win| line match)
    toid_p = "regexp_replace(lower({0}), '[^a-z0-9]+', '', 'g')"
    sql["tr_player_wins"] = f"""
      WITH {_rejects_cte()},
      s AS (
        SELECT {toid_p.format('p1')} AS player,
               CASE WHEN winner = p1 THEN 1 ELSE 0 END AS win,
               CASE WHEN winner <> p1 AND winner <> p2 THEN 1 ELSE 0 END AS tie
        FROM {CV} WHERE conv_id NOT IN (SELECT conv_id FROM rejects)
        UNION ALL
        SELECT {toid_p.format('p2')}, CASE WHEN winner = p2 THEN 1 ELSE 0 END,
               CASE WHEN winner <> p1 AND winner <> p2 THEN 1 ELSE 0 END
        FROM {CV} WHERE conv_id NOT IN (SELECT conv_id FROM rejects))
      SELECT player, count(*) AS games, sum(win)::BIGINT AS wins,
             sum(tie)::BIGINT AS ties
      FROM s GROUP BY 1
      ORDER BY games DESC, wins DESC, player ASC LIMIT 100"""

    sql["tr_rejects"] = f"""
      WITH {_rejects_cte()}
      SELECT c.format, count(*) AS n_rejected
      FROM {CV} c JOIN rejects r ON c.conv_id = r.conv_id
      GROUP BY 1"""

    # J5 canonical-format rewrite: the rule CONTENT is config (a pure
    # function over the known format universe, like the tier ladder) —
    # inline it as a CASE literal built from the same dims function
    d = _dims()
    canon_case = "CASE c.format " + "".join(
        f"WHEN '{f}' THEN '{d.canonicalize_format(f)}' "
        for f, *_ in d.FORMATS
        if d.canonicalize_format(f) != f) + "ELSE c.format END"
    sql["tr_format_canon"] = f"""
      WITH {_rejects_cte()}
      SELECT {canon_case} AS canonical_format,
             count(*) AS n_battles,
             count(DISTINCT c.format) AS n_source_formats,
             round(avg(c.turns), 6) AS avg_turns
      FROM {CV} c
      WHERE c.conv_id NOT IN (SELECT conv_id FROM rejects)
      GROUP BY 1"""

    sql["tr_anon_sample"] = f"""
      SELECT format, count(*) AS n_sampled
      FROM {CV}
      WHERE ('0x' || substr(md5(conv_id), 1, 15))::UBIGINT % 1000000 < 250000
      GROUP BY 1"""

    sql["tr_anon_public"] = f"""
      SELECT format, count(*) AS n_public
      FROM {CV}
      WHERE roomid NOT LIKE '%pw'
        AND ('0x' || substr(md5(conv_id), 1, 15))::UBIGINT % 1000000 < 500000
      GROUP BY 1"""

    sql["tr_usage_weighted"] = f"""
      WITH {_weighted_mons_cte()}
      SELECT format, cutoff, species, count(*) AS raw_count,
             round(sum(w), 6) AS raw_weight
      FROM monsw GROUP BY 1, 2, 3"""

    # extended with canonical names: the aggregates key/gate by the
    # CANONICAL format (see _canon_sql), and flags are consistent per
    # canonical group, so one superset serves raw and canonical sites
    _d = _dims()
    non_singles = "(" + ", ".join(
        f"'{f}'" for f in sorted(
            _d.NON_SINGLES_FORMATS
            | {_d.canonicalize_format(f)
               for f in _d.NON_SINGLES_FORMATS})) + ")"
    non_6v6 = "(" + ", ".join(
        f"'{f}'" for f in sorted(
            _d.NON_6V6_FORMATS
            | {_d.canonicalize_format(f)
               for f in _d.NON_6V6_FORMATS})) + ")"
    short = (f"(format NOT IN {non_6v6} AND (turns < 2 OR "
             f"(turns < 3 AND format NOT IN {non_singles})))")
    sql["tr_usage_report"] = f"""
      WITH {_weighted_mons_cte()},
      u AS (
        SELECT format, species,
               round(sum(CASE WHEN NOT {short} THEN w ELSE 0 END), 6) AS w6,
               sum(CASE WHEN NOT {short} THEN w ELSE 0 END) AS uw
        FROM monsw WHERE cutoff = 1630 GROUP BY 1, 2),
      tot AS (SELECT format, sum(uw) AS total FROM u GROUP BY 1)
      SELECT format, rank, species, usage_weighted, usage_pct FROM (
        SELECT u.format,
               row_number() OVER (PARTITION BY u.format
                                  ORDER BY w6 DESC, species ASC) AS rank,
               species, w6 AS usage_weighted,
               round(uw * 100.0 / total, 4) AS usage_pct
        FROM u JOIN tot ON u.format = tot.format)
      WHERE rank <= 30"""

    sql["tr_leads_raw"] = f"""
      WITH {_rejects_cte()},
      sw AS (
        SELECT conv_id, format, turn_idx,
               CASE WHEN string_split(text, '|')[3] LIKE 'p1%' THEN 'p1'
                    ELSE 'p2' END AS side,
               regexp_replace(lower(string_split(string_split(text,'|')[4], ',')[1]),
                              '[^a-z0-9]+', '', 'g') AS disp_id
        FROM {TR}
        WHERE string_split(text, '|')[2] = 'switch'
          AND conv_id NOT IN (SELECT conv_id FROM rejects)),
      first_sw AS (
        SELECT conv_id, format, side, disp_id FROM (
          SELECT *, row_number() OVER (PARTITION BY conv_id, side
                                       ORDER BY turn_idx) AS rn FROM sw)
        WHERE rn = 1),
      teams AS (
        SELECT conv_id, 'p1' AS side, generate_subscripts(p1_team, 1) AS slot,
               {_mega_case_sql('unnest(p1_team).species', 'unnest(p1_team).item')} AS species,
               turns
        FROM {CV}
        UNION ALL
        SELECT conv_id, 'p2', generate_subscripts(p2_team, 1),
               {_mega_case_sql('unnest(p2_team).species', 'unnest(p2_team).item')},
               turns
        FROM {CV}),
      resolved AS (
        SELECT f.conv_id, f.format, f.side, t.species, t.turns,
               row_number() OVER (PARTITION BY f.conv_id, f.side
                 ORDER BY CASE WHEN t.species = f.disp_id THEN 0 ELSE 1 END,
                          t.slot) AS rn
        FROM first_sw f JOIN teams t
          ON t.conv_id = f.conv_id AND t.side = f.side
         AND (t.species = f.disp_id OR t.species LIKE f.disp_id || '%'))
      SELECT {_canon_sql()} AS format, species, count(*) AS lead_raw
      FROM resolved
      WHERE rn = 1 AND format IN {acc}
        AND format NOT IN {non_singles}
        AND NOT {short}
      GROUP BY 1, 2"""

    from stats_spark.plans import tiers as _tiers
    from stats_spark.functions import sqlgen as _sg
    # current tiers (incl. the deterministic XBL overlay) and the BL
    # lists are CONFIG inputs to the ladder (the reference reads them
    # from gen data / Reports.BL) — inline them as literals
    tier_vals = ", ".join(
        f"('{s}', '{t}')" for s, t in sorted(_tiers.current_tiers().items()))
    ladder = _tiers.LADDER
    known = "(" + ", ".join(f"'{t}'" for t in _tiers.TIER_ORDER) + ")"
    tier_fmts = ", ".join(f"'{f}'" for f, _t, _b in ladder)
    rise = repr(_tiers.RISE)
    cascade = "CASE WHEN current_tier = 'Ubers' THEN 'Ubers' "
    tiers_seq = [t for _f, t, _b in ladder] + [_tiers.FLOOR]
    for i, (fmt, tier, _ban) in enumerate(ladder):
        lower = tiers_seq[i + 1]
        # ban tier of the DROP target, checked after this rung's
        # rise/drop and before the next rung's rise check — the exact
        # riseAndDrop(r, d, b) order (reports.ts:602-606, mirrored in
        # plans/tiers.py:tier_update)
        ban_below = (ladder[i + 1][2] if i + 1 < len(ladder)
                     else _tiers.FLOOR_BAN)
        cascade += f"WHEN u_{fmt} > {rise} THEN '{tier}' "
        cascade += (f"WHEN current_tier = '{tier}' THEN "
                    f"(CASE WHEN u_{fmt} < {rise} THEN '{lower}' "
                    f"ELSE '{tier}' END) ")
        if ban_below:
            cascade += (f"WHEN current_tier = '{ban_below}' "
                        f"THEN '{ban_below}' ")
    cascade += f"ELSE '{_tiers.FLOOR}' END"
    # BL-list override — fires only on TRUE floor fallthrough (current
    # tier already the floor, no rise), never on a drop-to-floor
    # (reports.ts:609-614; see plans/tiers.py:tier_update)
    bl_floor = sorted(_tiers.bl_sets().get(_tiers.FLOOR_BAN, ()))
    final = f"({cascade})"
    if bl_floor:
        members = ", ".join(f"'{s}'" for s in bl_floor)
        final = (f"(CASE WHEN current_tier = '{_tiers.FLOOR}' "
                 f"AND ({cascade}) = '{_tiers.FLOOR}' "
                 f"AND species IN ({members}) THEN '{_tiers.FLOOR_BAN}' "
                 f"ELSE {final} END)")
    # a species in NO usage report keeps its current tier
    # (reports.ts:584-587) — mirrors tier_update's has_usage guard
    final = (f"(CASE WHEN has_usage = 0 THEN current_tier "
             f"ELSE {final} END)")
    sql["tr_tier_update"] = f"""
      WITH {_rejects_cte()},
      sides AS (
        SELECT conv_id, format, turns,
               CASE WHEN winner = p1 THEN 1 WHEN winner = p2 THEN -1 ELSE 0 END AS outcome,
               p1_rating_rpr AS rpr, p1_rating_rprd AS rprd, p1_team AS team
        FROM {CV} WHERE format IN ({tier_fmts})
          AND conv_id NOT IN (SELECT conv_id FROM rejects)
        UNION ALL
        SELECT conv_id, format, turns,
               CASE WHEN winner = p2 THEN 1 WHEN winner = p1 THEN -1 ELSE 0 END,
               p2_rating_rpr, p2_rating_rprd, p2_team
        FROM {CV} WHERE format IN ({tier_fmts})
          AND conv_id NOT IN (SELECT conv_id FROM rejects)),
      mons AS (
        SELECT ('0x' || substr(md5(conv_id), 1, 15))::UBIGINT % 3 AS month,
               format, turns,
               {_sg.effective_rpr_sql('rpr', 'rprd', 'outcome')} AS erpr,
               {_sg.effective_rprd_sql('rpr', 'rprd', 'outcome')} AS erprd,
               {_mega_case_sql('u.species', 'u.item')} AS species
        FROM (SELECT conv_id, format, turns, outcome, rpr, rprd,
                     unnest(team) AS u FROM sides)),
      w AS (
        SELECT month, format, species,
               {_sg.weighting_sql('erpr', 'erprd', '1630')} AS w
        FROM mons WHERE NOT (turns < 2 OR turns < 3)),
      per AS (
        SELECT month, format, species, sum(w) AS sw FROM w GROUP BY 1, 2, 3),
      tot AS (
        SELECT month, format, greatest(1.0, sum(sw)) AS total
        FROM per GROUP BY 1, 2),
      monthly AS (
        -- the corpus has no suffixed formats, so one report per
        -- (month, rung): the n-weighted suffix merge in
        -- plans/tiers.py:monthly_usage reduces to this plain fraction
        SELECT per.month, per.format, species,
               sw / total * 6 AS usage_frac
        FROM per JOIN tot ON per.month = tot.month AND per.format = tot.format),
      combined AS (
        SELECT format, species, sum(usage_frac) / 3 AS usage
        FROM monthly GROUP BY 1, 2),
      pivoted AS (
        SELECT d.species,
               CASE WHEN d.tier IN {known} THEN d.tier ELSE '{_tiers.FLOOR}' END
                 AS current_tier,
               max(CASE WHEN c.species IS NOT NULL THEN 1 ELSE 0 END)
                 AS has_usage,
               {", ".join(
                   f"coalesce(max(CASE WHEN c.format = '{fmt}' THEN usage END), 0.0) AS u_{fmt}"
                   for fmt, _t, _b in ladder)}
        FROM (VALUES {tier_vals}) AS d(species, tier)
        LEFT JOIN combined c ON c.species = d.species
        GROUP BY 1, 2)
      SELECT species, current_tier,
             {final} AS updated_tier,
             {final} <> current_tier AS changed,
             {", ".join(f"round(u_{fmt}, 6) AS usage_{fmt}"
                        for fmt, _t, _b in ladder)}
      FROM pivoted"""

    # A4 moveset maps at cutoff 1630: the seven weighted key maps with
    # the SQL twins of the stat-calc/EV round-trip (spreads + stats
    # strings), mega species/ability rewrite, erf weights
    stats_cols = ", ".join(f"{_stat_sql(s)}::BIGINT AS stat_{s}"
                           for s in ["hp", "atk", "def", "spa", "spd", "spe"])
    ev_cols = " || '/' || ".join(
        f"({_ev_out_sql(s)})::BIGINT::VARCHAR"
        for s in ["hp", "atk", "def", "spa", "spd", "spe"])
    stat_str = " || '/' || ".join(
        f"stat_{s}::VARCHAR" for s in ["hp", "atk", "def", "spa", "spd",
                                       "spe"])
    sql["tr_moveset"] = f"""
      WITH {_rejects_cte()},
      sides AS (
        SELECT conv_id, {_canon_sql()} AS format,
               CASE WHEN winner = p1 THEN 1 WHEN winner = p2 THEN -1
                    ELSE 0 END AS outcome,
               p1_rating_rpr AS rpr, p1_rating_rprd AS rprd,
               p1_team AS team
        FROM {CV} WHERE format IN {acc}
          AND conv_id NOT IN (SELECT conv_id FROM rejects)
        UNION ALL
        SELECT conv_id, {_canon_sql()},
               CASE WHEN winner = p2 THEN 1 WHEN winner = p1 THEN -1
                    ELSE 0 END,
               p2_rating_rpr, p2_rating_rprd, p2_team
        FROM {CV} WHERE format IN {acc}
          AND conv_id NOT IN (SELECT conv_id FROM rejects)),
      mons0 AS (
        SELECT conv_id, format,
               {_sg.weighting_sql(
                   _sg.effective_rpr_sql('rpr', 'rprd', 'outcome'),
                   _sg.effective_rprd_sql('rpr', 'rprd', 'outcome'),
                   '1630')} AS w,
               {_mega_case_sql('u.species', 'u.item')} AS species,
               {_mega_ability_sql('u.species', 'u.item', 'u.ability')}
                 AS ability,
               u.item AS item, u.nature AS nature, u.moves AS moves,
               u.level AS level, u.happiness AS happiness,
               coalesce(u.tera_type, 'nothing') AS tera_type,
               u.ev_hp AS ev_hp, u.ev_atk AS ev_atk, u.ev_def AS ev_def,
               u.ev_spa AS ev_spa, u.ev_spd AS ev_spd, u.ev_spe AS ev_spe,
               u.iv_hp AS iv_hp, u.iv_atk AS iv_atk, u.iv_def AS iv_def,
               u.iv_spa AS iv_spa, u.iv_spd AS iv_spd, u.iv_spe AS iv_spe
        FROM (SELECT conv_id, format, outcome, rpr, rprd,
                     unnest(team) AS u FROM sides)),
      monsb AS (
        SELECT m.*, d.b_hp, d.b_atk, d.b_def, d.b_spa, d.b_spd, d.b_spe
        FROM mons0 m JOIN (VALUES {_species_stats_values()})
          AS d(species_id, b_hp, b_atk, b_def, b_spa, b_spd, b_spe)
          ON m.species = d.species_id),
      monss AS (SELECT *, {stats_cols} FROM monsb),
      monsf AS (
        SELECT *,
               upper(substr(nature, 1, 1)) || substr(nature, 2)
                 || ':' || {ev_cols} AS spread,
               {stat_str} AS stats_str
        FROM monss),
      kv AS (
        SELECT format, species, w, 'abilities' AS section,
               CASE WHEN ability = 'unknown' THEN 'illuminate'
                    ELSE ability END AS key FROM monsf
        UNION ALL
        SELECT format, species, w, 'items', item FROM monsf
        UNION ALL
        SELECT format, species, w, 'tera_types', tera_type FROM monsf
        UNION ALL
        SELECT format, species, w, 'happinesses', happiness::VARCHAR
        FROM monsf
        UNION ALL
        SELECT format, species, w, 'spreads', spread FROM monsf
        UNION ALL
        SELECT format, species, w, 'stats', stats_str FROM monsf
        UNION ALL
        SELECT format, species, w, 'moves', unnest(moves) FROM monsf)
      SELECT format, species, section, key,
             round(sum(w), 6) AS weight, count(*) AS raw
      FROM kv GROUP BY 1, 2, 3, 4"""

    # A10 metagame + A13 tag fan-out: the full classifier re-derived in
    # SQL (stat calc, stalliness modifiers, tag thresholds, monotype
    # fold) — functions/classifier_sql.py
    from stats_spark.functions import classifier_sql as _cs
    _body = _cs.classified_sides_body(
        CV, _rejects_cte(), acc, _mega_case_sql, _mega_ability_sql)
    _singles = f"(format NOT IN {non_singles})"
    _short = (f"(format NOT IN {non_6v6} AND (turns < 2 OR "
              f"(turns < 3 AND {_singles})))")
    _w_at = lambda cut: _sg.weighting_sql(  # noqa: E731
        _sg.effective_rpr_sql("rpr", "rprd", "outcome"),
        _sg.effective_rprd_sql("rpr", "rprd", "outcome"), cut)
    sql["tr_metagame"] = f"""
      WITH {_body}
      SELECT {_canon_sql()} AS format, c.cutoff AS cutoff, tag,
             round(sum({_w_at('c.cutoff')} * team_size), 6) AS weight
      FROM (SELECT format, turns, outcome, rpr, rprd, team_size,
                   unnest(tags) AS tag
            FROM side_class WHERE NOT {_short}) s
      CROSS JOIN (VALUES (0), (1500), (1630), (1760)) AS c(cutoff)
      GROUP BY 1, 2, 3"""

    sql["tr_usage_by_tag"] = f"""
      WITH {_body},
      tagged AS (
        SELECT m.format, m.species, m.turns, m.outcome, m.rpr, m.rprd,
               t.tag
        FROM cmonsf m JOIN (
          SELECT conv_id, side,
                 unnest(flatten([['total'], tags])) AS tag
          FROM side_class) t
          ON m.conv_id = t.conv_id AND m.side = t.side)
      SELECT {_canon_sql()} AS format, tag, species, count(*) AS raw_count,
             round(sum(CASE WHEN NOT {_short}
                            THEN {_w_at('1500')} ELSE 0.0 END), 6)
               AS usage_weighted
      FROM tagged GROUP BY 1, 2, 3"""

    # W6 viability: gxe = floor(100*victoryChance(rpr,rprd,1500,130)+0.5)
    # for PRESENT ratings; exact order statistics over per-player max
    _c = "(3.0 * ln(10.0) * ln(10.0) / ((400.0 * pi()) * (400.0 * pi())))"
    _vc = (f"(1.0 / (1.0 + pow(10.0, (1500.0 - rpr) / 400.0 / "
           f"sqrt(1.0 + {_c} * (rprd * rprd + 16900.0)))))")
    sql["tr_viability"] = f"""
      WITH {_rejects_cte()},
      sides AS (
        SELECT conv_id, {_canon_sql()} AS format,
               regexp_replace(lower(p1), '[^a-z0-9]+', '', 'g') AS player,
               p1_rating_rpr AS rpr, p1_rating_rprd AS rprd,
               p1_team AS team
        FROM {CV} WHERE format IN {acc}
          AND conv_id NOT IN (SELECT conv_id FROM rejects)
        UNION ALL
        SELECT conv_id, {_canon_sql()},
               regexp_replace(lower(p2), '[^a-z0-9]+', '', 'g'),
               p2_rating_rpr, p2_rating_rprd, p2_team
        FROM {CV} WHERE format IN {acc}
          AND conv_id NOT IN (SELECT conv_id FROM rejects)),
      mons AS (
        SELECT format, player,
               {_mega_case_sql('u.species', 'u.item')} AS species,
               CASE WHEN rpr IS NOT NULL AND rprd IS NOT NULL
                    THEN floor(100.0 * {_vc} + 0.5)::BIGINT END AS gxe
        FROM (SELECT conv_id, format, player, rpr, rprd,
                     unnest(team) AS u FROM sides)),
      uniq AS (
        SELECT format, species, player, max(gxe) AS g
        FROM mons GROUP BY 1, 2, 3
        HAVING max(gxe) IS NOT NULL),
      ranked AS (
        SELECT format, species, g,
               row_number() OVER (PARTITION BY format, species
                                  ORDER BY g DESC) AS rn,
               count(*) OVER (PARTITION BY format, species) AS n
        FROM uniq)
      SELECT format, species, n, max(g) AS gxe_max,
             coalesce(max(CASE WHEN rn = ceil(0.01 * n) THEN g END),
                      max(g)) AS gxe_p1,
             coalesce(max(CASE WHEN rn = ceil(0.2 * n) THEN g END),
                      max(g)) AS gxe_p20
      FROM ranked GROUP BY 1, 2, 3"""

    sql["tr_teammate_pairs"] = f"""
      WITH {_rejects_cte()},
      teams AS (
        SELECT conv_id, {_canon_sql()} AS format, turns, 'p1' AS side,
               generate_subscripts(p1_team, 1) AS slot,
               {_mega_case_sql('unnest(p1_team).species', 'unnest(p1_team).item')} AS species
        FROM {CV} WHERE format IN {acc}
          AND conv_id NOT IN (SELECT conv_id FROM rejects)
        UNION ALL
        SELECT conv_id, {_canon_sql()}, turns, 'p2',
               generate_subscripts(p2_team, 1),
               {_mega_case_sql('unnest(p2_team).species', 'unnest(p2_team).item')}
        FROM {CV} WHERE format IN {acc}
          AND conv_id NOT IN (SELECT conv_id FROM rejects))
      SELECT a.format,
             least(a.species, b.species) AS species,
             greatest(a.species, b.species) AS teammate,
             count(*) AS raw
      FROM teams a JOIN teams b
        ON a.conv_id = b.conv_id AND a.side = b.side AND a.slot < b.slot
      WHERE NOT (a.format NOT IN {non_6v6} AND (a.turns < 2 OR
                 (a.turns < 3 AND a.format NOT IN {non_singles})))
      GROUP BY 1, 2, 3"""

    # multimodal features — payload-derived fields only (the decode
    # stub's feat vector is dropped by the query): octet_length,
    # sha256-over-hex digest, exact float64 byte mean
    from stats_spark.operators.multimodal import ensure_media_parquet
    media_pq = ensure_media_parquet(MEDIA_PATH)
    sql["mm_features"] = f"""
      SELECT media_id, kind,
             octet_length(payload) AS n_bytes,
             substr(sha256(hex(payload)), 1, 16) AS digest,
             round(list_aggregate(list_transform(
                 range(1, octet_length(payload) + 1),
                 i -> ('0x' || substr(hex(payload), 2*i - 1, 2))::INT),
               'avg'), 6) AS mean_byte
      FROM read_parquet('{media_pq}')"""

    # A7/J7 encounters — the matchup list comes from the parsed-battles
    # checkpoint (FSM internals, byte-parity-proven separately); the
    # oracle independently recomputes the gates (accept/short/singles/
    # leads), the per-side erf weights, the min(w_p1, w_p2) battle
    # weight, the mirrored inverse-outcome projection and the 13-wide
    # pivot (stats.ts:186-199, 474-483)
    from stats_spark.operators.parse import INVERSE_OUTCOMES as _INV
    from stats_spark.functions import sqlgen as _sq
    inv_list = "[" + ", ".join(str(v) for v in _INV) + "]"

    def _w1500(pfx: str) -> str:
        out = (f"(CASE WHEN winner = 'tie' THEN 0 "
               f"WHEN winner = '{pfx}' THEN 1 ELSE -1 END)")
        rpr, rprd = f"{pfx}_rpr", f"{pfx}_rprd"
        return _sq.weighting_sql(_sq.effective_rpr_sql(rpr, rprd, out),
                                 _sq.effective_rprd_sql(rpr, rprd, out),
                                 "1500")

    sql["tr_encounters"] = f"""
      WITH b AS (
        SELECT {_canon_sql()} AS format, matchups,
               least({_w1500('p1')}, {_w1500('p2')}) AS w
        FROM {_battles_glob()}
        WHERE error IS NULL AND format IN {acc}
          AND lead_p1 IS NOT NULL AND lead_p2 IS NOT NULL
          AND lead_p1 <> 'empty' AND lead_p2 <> 'empty'
          AND format NOT IN {non_singles}
          AND NOT {short}),
      mu AS (SELECT format, w, unnest(matchups) AS m FROM b),
      both_dirs AS (
        SELECT format, w, m.a AS species, m.b AS opponent,
               m.outcome AS outcome FROM mu
        UNION ALL
        SELECT format, w, m.b, m.a, {inv_list}[m.outcome + 1] FROM mu)
      SELECT format, species, opponent,
        {", ".join(
            f"round(coalesce(sum(CASE WHEN outcome = {i} THEN w END), 0),"
            f" 6) AS o{i}" for i in range(13))}
      FROM both_dirs GROUP BY 1, 2, 3"""

    # S8 binary DB rows — byte-for-byte hex twin of
    # binary_db.encode_logs(gen=1): LE multi-byte fields emitted one
    # printf('%02x') byte at a time, winner block first, zero-padded
    # empty slots/moves, mega-canonical species ids
    from stats_spark.operators import binary_db as _bin

    def _le(expr: str, n: int) -> str:
        return " || ".join(f"printf('%02x', (({expr}) >> {8 * i}) & 255)"
                           for i in range(n))

    lk = _bin.lookups()
    spvals = ", ".join(f"('{s}', {n})"
                       for s, n in sorted(lk["species"].items()))
    mvvals = ", ".join(f"('{m}', {n})"
                       for m, n in sorted(lk["moves"].items()))
    rating = {
        1: ("CASE WHEN p1_rating_rpr IS NOT NULL THEN "
            f"{_le('CAST(round(p1_rating_rpr) AS BIGINT)', 2)}"
            " || printf('%02x', CAST(round(p1_rating_rprd) AS BIGINT)"
            " & 255) ELSE '000000' END"),
        2: ("CASE WHEN p2_rating_rpr IS NOT NULL THEN "
            f"{_le('CAST(round(p2_rating_rpr) AS BIGINT)', 2)}"
            " || printf('%02x', CAST(round(p2_rating_rprd) AS BIGINT)"
            " & 255) ELSE '000000' END"),
    }
    endhex = ("CASE WHEN winner IS NULL OR winner = '' OR winner = 'tie'"
              " THEN '01' ELSE '00' END")
    sql["tr_binary_db"] = f"""
      WITH {_rejects_cte()},
      spmap(species, num) AS (VALUES {spvals}),
      mvmap(move, num) AS (VALUES {mvvals}),
      b AS (
        SELECT conv_id, ts, turns, winner, p2, p1_team, p2_team,
               {rating[1]} AS r1hex, {rating[2]} AS r2hex,
               {endhex} AS ehex
        FROM {CV}
        WHERE conv_id NOT IN (SELECT conv_id FROM rejects)),
      slots AS (
        SELECT conv_id, s.side, i.slot,
               CASE WHEN s.side = 1 THEN p1_team[i.slot]
                    ELSE p2_team[i.slot] END AS mon
        FROM b, (SELECT 1 AS side UNION ALL SELECT 2) s,
             (SELECT unnest(range(1, 7)) AS slot) i),
      mon_moves AS (
        SELECT conv_id, side, slot, jj.j,
               struct_extract(mon, 'moves')[jj.j] AS move
        FROM slots, (SELECT unnest(range(1, 5)) AS j) jj),
      move_hex AS (
        SELECT conv_id, side, slot,
               string_agg(CASE WHEN mm.move IS NULL THEN '00'
                               ELSE printf('%02x', coalesce(mv.num, 0))
                          END, '' ORDER BY mm.j) AS mhex
        FROM mon_moves mm LEFT JOIN mvmap mv ON mv.move = mm.move
        GROUP BY 1, 2, 3),
      mon_hex AS (
        SELECT sl.conv_id, sl.side, sl.slot,
               CASE WHEN sl.mon IS NULL THEN '0000000000'
                    ELSE printf('%02x', coalesce(sp.num, 0)) || mh.mhex
               END AS hex
        FROM slots sl
        JOIN move_hex mh ON mh.conv_id = sl.conv_id
          AND mh.side = sl.side AND mh.slot = sl.slot
        LEFT JOIN spmap sp ON sp.species =
          {_mega_case_sql("struct_extract(sl.mon, 'species')",
                          "struct_extract(sl.mon, 'item')")}),
      team_hex AS (
        SELECT conv_id, side,
               string_agg(hex, '' ORDER BY slot) AS thex
        FROM mon_hex GROUP BY 1, 2)
      SELECT b.conv_id, epoch_ms(ts) AS ts_ms,
             {_le('epoch_ms(ts)', 8)} || {_le('turns', 2)} || ehex ||
             CASE WHEN winner = p2 THEN r2hex ELSE r1hex END ||
             CASE WHEN winner = p2 THEN r1hex ELSE r2hex END ||
             CASE WHEN winner = p2 THEN t2.thex ELSE t1.thex END ||
             CASE WHEN winner = p2 THEN t1.thex ELSE t2.thex END
               AS row_hex
      FROM b
      JOIN team_hex t1 ON t1.conv_id = b.conv_id AND t1.side = 1
      JOIN team_hex t2 ON t2.conv_id = b.conv_id AND t2.side = 2"""

    return sql
