"""Similarity search over embedding columns (array<float>).

Brute-force exact top-k as the baseline; random-hyperplane LSH
bucketing as the scale path (prunes the candidate set before the
exact re-rank).  Dot products are pure higher-order-function
expressions — JVM-side, no Python, no UDF.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def dot(a, b):
    # cast to double *before* multiplying: float32 arithmetic differs
    # between engines; double-everywhere keeps the oracle bit-exact
    return F.aggregate(F.zip_with(a, b,
                                  lambda x, y: x.cast("double") * y.cast("double")),
                       F.lit(0.0), lambda acc, v: acc + v)


def l2_norm(v):
    return F.sqrt(F.aggregate(
        F.transform(v, lambda x: x.cast("double") * x.cast("double")),
        F.lit(0.0), lambda acc, x: acc + x))


def l2_normalize(v):
    n = l2_norm(v)
    return F.transform(v, lambda x: x.cast("double") / n)


def hyperplane_weights(bits: int, dim: int, seed: int) -> list[list[float]]:
    """Deterministic ±1 hyperplane matrix from the portable hash
    (phash.h60_py) — computed once on the driver, shipped as plan
    literals.  No per-row hashing, no broadcast variable, and the
    DuckDB oracle embeds the identical literals."""
    from ..phash import h60_py
    return [[1.0 if h60_py(f"{seed}:{j}:{d}") % 2 == 1 else -1.0
             for d in range(dim)]
            for j in range(bits)]


def random_hyperplane_bucket(v, bits: int, seed: int, dim: int = 64):
    """Sign pattern of `bits` pseudo-random hyperplanes (sign-LSH).

    proj_j = <v, w_j> with w_j a ±1 literal array — pure codegen
    column arithmetic; the bucket function ships with the plan."""
    ws = hyperplane_weights(bits, dim, seed)

    def proj(j):
        s = F.aggregate(
            F.zip_with(v, F.slice(F.lit(ws[j]), 1, F.size(v)),
                       lambda x, w: x.cast("double") * w),
            F.lit(0.0), lambda acc, x: acc + x)
        return F.when(s >= 0, F.lit(1 << j).cast("long")).otherwise(F.lit(0).cast("long"))

    bucket = F.lit(0).cast("long")
    for j in range(bits):
        bucket = bucket + proj(j)
    return bucket


def ann_bruteforce(emb: DataFrame, queries: DataFrame, k: int = 10) -> DataFrame:
    """Exact cosine top-k: broadcast the query set (small side) against
    the corpus — one narrow pass over the corpus, partial top-k per
    partition via window rank after a shuffle on query_id only.

    At 100 TB corpus × few thousand queries this is the right plan:
    the corpus is never shuffled; only (query_id, score) pairs are.
    """
    q = queries.select(F.col("vec_id").alias("query_id"),
                       l2_normalize(F.col("embedding")).alias("qv"))
    c = emb.select(F.col("vec_id").alias("cand_id"),
                   l2_normalize(F.col("embedding")).alias("cv"))
    scored = (c.crossJoin(F.broadcast(q))
              .filter(F.col("cand_id") != F.col("query_id"))
              .withColumn("cosine", F.round(dot(F.col("qv"), F.col("cv")), 6)))
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("cand_id"))
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("query_id", "cand_id", "cosine", "rank"))


def ann_ivf(emb: DataFrame, queries: DataFrame, k: int = 10,
            n_centroids: int = 16, n_probe: int = 4) -> DataFrame:
    """IVF-style ANN: coarse quantization to centroid cells, queries
    probe only their `n_probe` nearest cells, exact cosine re-rank
    within the probed cells.

    Centroids are the first `n_centroids` corpus vectors (deterministic
    — replayable by the SQL oracle; swap in k-means output for better
    recall without touching the plan shape).  Scale: the corpus is
    scanned once to assign cells (broadcast centroid table, argmax in
    one pass), then shuffles only on cell id; queries broadcast.
    """
    cent = (emb.filter(F.col("vec_id") < n_centroids)
            .select(F.col("vec_id").alias("cell"),
                    l2_normalize(F.col("embedding")).alias("cv")))
    corpus = emb.select(F.col("vec_id").alias("cand_id"),
                        l2_normalize(F.col("embedding")).alias("v"))
    # assign: argmax-cosine cell per corpus vector (broadcast join +
    # max_by — no per-row loops, one shuffle on cand_id for the argmax)
    scored_cells = (corpus.crossJoin(F.broadcast(cent))
                    .withColumn("sim", F.round(dot(F.col("v"), F.col("cv")), 6)))
    assigned = (scored_cells.groupBy("cand_id")
                .agg(F.max_by("cell", F.struct(F.col("sim"), -F.col("cell")))
                     .alias("cell"),
                     F.first("v").alias("v")))
    q = queries.select(F.col("vec_id").alias("query_id"),
                       l2_normalize(F.col("embedding")).alias("qv"))
    q_cells = (q.crossJoin(F.broadcast(cent))
               .withColumn("sim", F.round(dot(F.col("qv"), F.col("cv")), 6)))
    wq = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("cell"))
    probes = (q_cells.withColumn("r", F.row_number().over(wq))
              .filter(F.col("r") <= n_probe)
              .select("query_id", "qv", "cell"))
    cand = (assigned.join(F.broadcast(probes), "cell")
            .filter(F.col("cand_id") != F.col("query_id"))
            .withColumn("cosine", F.round(dot(F.col("qv"), F.col("v")), 6)))
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("cand_id"))
    return (cand.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("query_id", "cand_id", "cosine", "rank"))


def ann_lsh(emb: DataFrame, queries: DataFrame, k: int = 10,
            bucket_bits: int = 6, seed: int = 7) -> DataFrame:
    """LSH-pruned ANN: candidates restricted to the query's hyperplane
    bucket, then exact cosine re-rank.  Trades recall for a ~2^bits
    reduction in scored candidates; the shuffle key is the bucket."""
    q = (queries.select(F.col("vec_id").alias("query_id"),
                        l2_normalize(F.col("embedding")).alias("qv"))
         .withColumn("bucket", random_hyperplane_bucket(F.col("qv"), bucket_bits, seed)))
    c = (emb.select(F.col("vec_id").alias("cand_id"),
                    l2_normalize(F.col("embedding")).alias("cv"))
         .withColumn("bucket", random_hyperplane_bucket(F.col("cv"), bucket_bits, seed)))
    scored = (c.join(F.broadcast(q), "bucket")
              .filter(F.col("cand_id") != F.col("query_id"))
              .withColumn("cosine", F.round(dot(F.col("qv"), F.col("cv")), 6)))
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("cand_id"))
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("query_id", "cand_id", "cosine", "rank"))
