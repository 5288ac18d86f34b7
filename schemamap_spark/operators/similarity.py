"""Similarity search over embedding columns (array<float>).

- cosine_topk: brute-force exact top-k — the correctness baseline. The query
  set is broadcast; each executor scans its slice of the corpus once and
  emits per-partition top-k via window ranking. All math is JVM-side
  (zip_with/aggregate in double precision).
- lsh_topk: random-hyperplane (signed random projection) LSH bucketing — the
  scale path. Vectors are bucketed by the sign pattern of `num_planes` fixed
  pseudo-random hyperplanes (deterministic, derived from xxhash64 of
  (plane, dim)); only same-bucket (or probing-neighbor) pairs are scored.
  Approximate: recall < 1 by construction; use cosine_topk to evaluate.
- ivf_topk: IVF-style two-stage search — kmeans-lite centroids picked as a
  deterministic sample, vectors assigned to nearest centroid (one pass),
  queries scored only against the `nprobe` nearest centroids' partitions.

At 100 TB: corpus stays partitioned, queries broadcast; no crossJoin of the
corpus with itself; bucket/centroid keys make the join shuffle-partitionable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _dot(a, b) -> F.Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a) -> F.Column:
    return F.sqrt(_dot(a, a))


def cosine(a, b) -> F.Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


def cosine_near_pairs(
    corpus: DataFrame,
    threshold: float = 0.45,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """All vector pairs with cosine >= threshold (embedding near-duplicate
    detection). Norms are precomputed per row — identical values to the
    per-pair formula (sqrt(dot(v,v)) is a pure function of v), so results
    stay bit-equal to the naive oracle while the pair loop does one dot
    instead of three. The smaller side is broadcast; at corpus×corpus scale
    swap the broadcast for LSH bucketing (lsh_topk) as candidate pruning."""
    from schemamap_spark.session import ensure_parallelism

    base = ensure_parallelism(corpus, id_col).select(
        F.col(id_col).alias("vid"), F.col(vec_col).alias("v")
    ).withColumn("nrm", _norm(F.col("v")))
    a = base.select(F.col("vid").alias("i"), F.col("v").alias("v_i"), F.col("nrm").alias("n_i"))
    b = base.select(F.col("vid").alias("j"), F.col("v").alias("v_j"), F.col("nrm").alias("n_j"))
    return (
        a.join(F.broadcast(b), F.col("i") < F.col("j"))
        .select(
            "i",
            "j",
            (_dot(F.col("v_i"), F.col("v_j")) / (F.col("n_i") * F.col("n_j"))).alias("sim"),
        )
        .filter(F.col("sim") >= threshold)
        .select("i", "j", F.round("sim", 6).alias("cosine_sim"))
        .orderBy("i", "j")
    )


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k cosine neighbors for every query vector (self excluded).

    Output: (query_id, neighbor_id, rank, cosine_sim round6)."""
    from schemamap_spark.session import ensure_parallelism

    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec")
    )
    c = ensure_parallelism(
        corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("c_vec")),
        "neighbor_id",
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            cosine(F.col("q_vec"), F.col("c_vec")).alias("sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), "neighbor_id")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", F.round("sim", 6).alias("cosine_sim"))
        .orderBy("query_id", "rank")
    )


def _plane_weight(plane: int, dim: int) -> F.Column:
    """Deterministic pseudo-random weight in [-1, 1) from xxhash64(plane,dim).
    pmod (not %) keeps the intermediate in [0, 10000) — signed % would span
    (-10000, 10000) and skew the distribution."""
    h = F.xxhash64(F.lit(plane), F.lit(dim))
    return F.pmod(h, F.lit(10_000)).cast("double") / F.lit(5_000.0) - F.lit(1.0)


def _bucket_expr(vec_col: str, num_planes: int, dims: int) -> F.Column:
    bits = []
    for p in range(num_planes):
        proj = None
        for d in range(dims):
            term = F.element_at(vec_col, d + 1).cast("double") * _plane_weight(p, d)
            proj = term if proj is None else proj + term
        bits.append(F.when(proj >= 0, F.lit(1)).otherwise(F.lit(0)) * F.lit(2**p))
    out = bits[0]
    for b in bits[1:]:
        out = out + b
    return out


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    num_planes: int = 8,
    dims: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: only candidates sharing the query's hyperplane-sign
    bucket are scored. Same output schema as cosine_topk."""
    from schemamap_spark.session import ensure_parallelism

    c = ensure_parallelism(corpus, id_col).select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("c_vec"),
        _bucket_expr(vec_col, num_planes, dims).alias("bucket"),
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("q_vec"),
        _bucket_expr(vec_col, num_planes, dims).alias("bucket"),
    )
    scored = (
        c.join(F.broadcast(q), "bucket")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id", cosine(F.col("q_vec"), F.col("c_vec")).alias("sim"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), "neighbor_id")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", F.round("sim", 6).alias("cosine_sim"))
        .orderBy("query_id", "rank")
    )


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    num_centroids: int = 16,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: str = "sample",
) -> DataFrame:
    """IVF-style ANN: centroids (deterministic sample, or k-means with
    centroids='kmeans') → nearest-centroid assignment → queries probe
    `nprobe` closest centroid partitions."""
    if centroids == "kmeans":
        from schemamap_spark.operators.clustering import kmeans_fit

        model = kmeans_fit(corpus, k=num_centroids, vec_col=vec_col)
        spark = corpus.sparkSession
        cent = spark.createDataFrame(
            [(i, [float(x) for x in c]) for i, c in enumerate(model.clusterCenters())],
            f"centroid_id long, cent_vec array<double>",
        )
    else:
        # collect the tiny centroid sample to the driver and rebuild it as a
        # literal frame: monotonically_increasing_id over a lazily re-evaluated
        # plan could assign DIFFERENT ids in the two assign() evaluations
        rows = (
            corpus.orderBy(id_col).limit(num_centroids).select(F.col(vec_col)).collect()
        )
        spark = corpus.sparkSession
        cent = spark.createDataFrame(
            [(i, [float(x) for x in r[0]]) for i, r in enumerate(rows)],
            "centroid_id long, cent_vec array<double>",
        )
    centb = F.broadcast(cent)

    def assign(df: DataFrame, idname: str, vecname: str, n: int) -> DataFrame:
        scored = df.crossJoin(centb).select(
            "*", cosine(F.col(vecname), F.col("cent_vec")).alias("cent_sim")
        )
        w = Window.partitionBy(idname).orderBy(F.desc("cent_sim"), "centroid_id")
        return (
            scored.withColumn("crank", F.row_number().over(w))
            .filter(F.col("crank") <= n)
            .drop("cent_vec", "cent_sim", "crank")
        )

    c = assign(
        corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("c_vec")),
        "neighbor_id", "c_vec", 1,
    )
    q = assign(
        queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec")),
        "query_id", "q_vec", nprobe,
    )
    scored = (
        c.join(F.broadcast(q), "centroid_id")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id", cosine(F.col("q_vec"), F.col("c_vec")).alias("sim"))
        .distinct()
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), "neighbor_id")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", F.round("sim", 6).alias("cosine_sim"))
        .orderBy("query_id", "rank")
    )
