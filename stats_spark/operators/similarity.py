"""Similarity search over an embedding column (array<float>).

  cosine_topk   exact brute-force top-k per query — the correctness
                baseline.  Queries are a small broadcast side; the
                corpus side streams, so the plan is a broadcast
                nested-loop scoring pass + per-query top-k window (no
                corpus shuffle until the tiny ranked result).
  lsh_buckets   random-hyperplane signatures (deterministic md5-seeded
                planes) — the scale path: candidate pairs share a
                bucket, turning O(n²) scoring into an equi-join.

Dot products use F.aggregate/zip_with (JVM higher-order functions) —
no Python in the scoring loop.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, functions as F


def dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0.0), lambda acc, v: acc + v)


def with_norm(emb: DataFrame, vec_col: str = "embedding",
              id_col: str = "vec_id") -> DataFrame:
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    return emb.select(F.col(id_col).alias("id"), v.alias("vec")) \
              .withColumn("norm", F.sqrt(dot(F.col("vec"), F.col("vec"))))


def cosine_topk(emb: DataFrame, queries: DataFrame, k: int = 5,
                vec_col: str = "embedding", id_col: str = "vec_id") -> DataFrame:
    """Exact top-k cosine neighbors for each query vector (self-matches
    excluded).  ``queries`` is expected to be small → broadcast."""
    from pyspark.sql import Window

    corpus = with_norm(emb, vec_col, id_col)
    q = with_norm(queries, vec_col, id_col).select(
        F.col("id").alias("q_id"), F.col("vec").alias("q_vec"),
        F.col("norm").alias("q_norm"))
    scored = (corpus.join(F.broadcast(q), F.col("id") != F.col("q_id"))
              .withColumn("cosine",
                          F.round(dot(F.col("vec"), F.col("q_vec"))
                                  / (F.col("norm") * F.col("q_norm")), 6)))
    w = Window.partitionBy("q_id").orderBy(F.desc("cosine"), F.asc("id"))
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("q_id", F.col("id").alias("neighbor_id"),
                    "cosine", "rank"))


def _planes(dim: int, n_planes: int, seed: int = 7) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, dim))


def lsh_buckets(emb: DataFrame, n_planes: int = 12, dim: int = 64,
                vec_col: str = "embedding", id_col: str = "vec_id",
                seed: int = 7) -> DataFrame:
    """Random-hyperplane LSH: sign bits of <v, plane_i> → bucket key.
    Planes are literal arrays (deterministic from the seed), so the
    signature is pure column math."""
    planes = _planes(dim, n_planes, seed)
    corpus = with_norm(emb, vec_col, id_col)
    bits = []
    for i, p in enumerate(planes):
        plane = F.array(*[F.lit(float(x)) for x in p])
        bits.append(F.when(dot(F.col("vec"), plane) >= 0, F.lit(1))
                     .otherwise(F.lit(0)).cast("string"))
    return corpus.withColumn("bucket", F.concat(*bits)).select("id", "bucket")


def band_planes(n_bands: int, band_planes: int, dim: int,
                seed: int = 7) -> np.ndarray:
    """Deterministic (n_bands, band_planes, dim) hyperplane tensor for
    multi-band LSH — seed-derived so an external oracle can reproduce
    the exact bucket keys."""
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_bands, band_planes, dim))


def lsh_band_buckets(emb: DataFrame, n_bands: int = 8, planes_per_band: int = 2,
                     dim: int = 64, vec_col: str = "embedding",
                     id_col: str = "vec_id", seed: int = 7) -> DataFrame:
    """Multi-band random-hyperplane LSH: per band, the bucket key is the
    concatenated sign bits of <v, plane_j>.  Vectors sharing ANY band
    bucket become candidates — recall grows with n_bands while each
    band's join stays selective (the minhash banding trick applied to
    cosine space).  Output: (id, vec, norm, band, key)."""
    tensor = band_planes(n_bands, planes_per_band, dim, seed)
    corpus = with_norm(emb, vec_col, id_col)
    bands = []
    for bi in range(n_bands):
        bits = []
        for p in tensor[bi]:
            plane = F.array(*[F.lit(float(x)) for x in p])
            bits.append(F.when(dot(F.col("vec"), plane) >= 0, F.lit("1"))
                         .otherwise(F.lit("0")))
        bands.append(F.struct(F.lit(bi).alias("band"),
                              F.concat(*bits).alias("key")))
    return (corpus.withColumn("b", F.explode(F.array(*bands)))
            .select("id", "vec", "norm",
                    F.col("b.band").alias("band"), F.col("b.key").alias("key")))


def ann_topk_banded(emb: DataFrame, queries: DataFrame, k: int = 5,
                    n_bands: int = 8, planes_per_band: int = 2,
                    dim: int = 64, vec_col: str = "embedding",
                    id_col: str = "vec_id", seed: int = 7) -> DataFrame:
    """Multi-band (multi-probe) ANN: a corpus vector is a candidate if
    it shares ANY band bucket with the query.  Recall grows with
    n_bands while each band's join stays selective — the fix for the
    single-signature ann_topk, whose recall collapses as n_planes
    grows (P[all n bits equal] ≈ (1-θ/π)^n).  Plan shape: per-band
    equi-join against the broadcast query buckets, cosine scored
    JVM-side, duplicates across bands collapsed by a (q_id, id)
    group-by, then the per-query top-k window."""
    from pyspark.sql import Window

    cb = lsh_band_buckets(emb, n_bands, planes_per_band, dim,
                          vec_col, id_col, seed)
    qb = (lsh_band_buckets(queries, n_bands, planes_per_band, dim,
                           vec_col, id_col, seed)
          .select(F.col("id").alias("q_id"), F.col("vec").alias("q_vec"),
                  F.col("norm").alias("q_norm"), "band", "key"))
    scored = (cb.join(F.broadcast(qb), ["band", "key"])
              .filter(F.col("id") != F.col("q_id"))
              .withColumn("cosine",
                          F.round(dot(F.col("vec"), F.col("q_vec"))
                                  / (F.col("norm") * F.col("q_norm")), 6))
              # the same (query, candidate) pair can match in several
              # bands — collapse before ranking (cosine is identical)
              .groupBy("q_id", "id").agg(F.first("cosine").alias("cosine")))
    w = Window.partitionBy("q_id").orderBy(F.desc("cosine"), F.asc("id"))
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("q_id", F.col("id").alias("neighbor_id"),
                    "cosine", "rank"))


def ivf_centroids(corpus: DataFrame, n_cells: int = 16) -> list:
    """Deterministic coarse quantizer for IVF: the ``n_cells`` corpus
    vectors with the smallest md5(id) digests, L2-normalized.  Real
    IVF trains k-means; the quantizer's quality affects only recall,
    never the algebra, and a hash-sampled quantizer is reproducible by
    an external SQL oracle.  Returns [(cell, [floats])] — tiny,
    collected to the driver and re-broadcast as literals."""
    rows = (corpus.withColumn("h", F.md5(F.col("id").cast("string")))
            .orderBy("h", "id").limit(n_cells)
            .select("vec", "norm").collect())
    return [(ci, [float(x) / r.norm for x in r.vec])
            for ci, r in enumerate(rows)]


def _cell_scores(vec_col, cents):
    """(score, cell) structs per centroid — array_max picks the best
    cell, ties to the larger cell id (struct comparison)."""
    return F.array(*[
        F.struct(dot(vec_col, F.array(*[F.lit(x) for x in c])).alias("s"),
                 F.lit(ci).alias("cell"))
        for ci, c in cents])


def ann_topk_ivf(emb: DataFrame, queries: DataFrame, k: int = 5,
                 n_cells: int = 16, nprobe: int = 2,
                 vec_col: str = "embedding",
                 id_col: str = "vec_id") -> DataFrame:
    """IVF-style ANN: assign every corpus vector to its best coarse
    cell (inverted lists), probe each query's ``nprobe`` best cells,
    score only those lists.  Scan cost drops to ~nprobe/n_cells of the
    corpus per query; cells are disjoint so no candidate dedup is
    needed.  At cluster scale the assignment is a write-side partition
    key (partitionBy(cell)) and probing prunes partitions."""
    from pyspark.sql import Window

    corpus = with_norm(emb, vec_col, id_col)
    cents = ivf_centroids(corpus, n_cells)
    assigned = corpus.withColumn(
        "cell", F.array_max(_cell_scores(F.col("vec"), cents))["cell"])
    q = with_norm(queries, vec_col, id_col).select(
        F.col("id").alias("q_id"), F.col("vec").alias("q_vec"),
        F.col("norm").alias("q_norm"))
    probes = (q.withColumn(
        "cell",
        F.explode(F.transform(
            F.slice(F.reverse(F.array_sort(
                _cell_scores(F.col("q_vec"), cents))), 1, nprobe),
            lambda x: x["cell"]))))
    scored = (assigned.join(F.broadcast(probes), "cell")
              .filter(F.col("id") != F.col("q_id"))
              .withColumn("cosine",
                          F.round(dot(F.col("vec"), F.col("q_vec"))
                                  / (F.col("norm") * F.col("q_norm")), 6)))
    w = Window.partitionBy("q_id").orderBy(F.desc("cosine"), F.asc("id"))
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("q_id", F.col("id").alias("neighbor_id"),
                    "cosine", "rank"))


def ann_topk(emb: DataFrame, queries: DataFrame, k: int = 5,
             n_planes: int = 8, dim: int = 64,
             vec_col: str = "embedding", id_col: str = "vec_id") -> DataFrame:
    """Approximate top-k: score only corpus vectors in the query's LSH
    bucket.  Recall < 1 by design; the scale path for 100 TB corpora."""
    from pyspark.sql import Window

    b = lsh_buckets(emb, n_planes, dim, vec_col, id_col)
    corpus = with_norm(emb, vec_col, id_col).join(b, "id")
    qb = lsh_buckets(queries, n_planes, dim, vec_col, id_col) \
        .withColumnRenamed("id", "q_id").withColumnRenamed("bucket", "q_bucket")
    q = (with_norm(queries, vec_col, id_col)
         .select(F.col("id").alias("q_id"), F.col("vec").alias("q_vec"),
                 F.col("norm").alias("q_norm"))
         .join(qb, "q_id"))
    scored = (corpus.join(F.broadcast(q),
                          (F.col("bucket") == F.col("q_bucket"))
                          & (F.col("id") != F.col("q_id")))
              .withColumn("cosine",
                          F.round(dot(F.col("vec"), F.col("q_vec"))
                                  / (F.col("norm") * F.col("q_norm")), 6)))
    w = Window.partitionBy("q_id").orderBy(F.desc("cosine"), F.asc("id"))
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("q_id", F.col("id").alias("neighbor_id"), "cosine", "rank"))
