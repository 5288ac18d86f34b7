"""Embedding clustering (k-means) and sketch-based distinct counting.

- kmeans_fit / kmeans_clusters: Spark ML KMeans over an array<float>
  embedding column (arrays → ml vectors via array_to_vector; fixed seed for
  reproducibility). Used both as a standalone clustering op for corpus
  curation and as the centroid source for IVF ANN routing.
- approx_ndv: HyperLogLog-sketch distinct counts (approx_count_distinct) —
  the constant-memory path for cardinality at 100 TB where exact
  count-distinct would shuffle the full key set.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def kmeans_fit(
    corpus: DataFrame,
    k: int = 16,
    vec_col: str = "embedding",
    seed: int = 42,
    max_iter: int = 20,
):
    """Fit KMeans on an array<float/double> column; returns the fitted model
    (model.clusterCenters() are numpy arrays)."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    from schemamap_spark.session import ensure_parallelism

    feat = ensure_parallelism(corpus).withColumn(
        "__features", array_to_vector(F.col(vec_col).cast("array<double>"))
    )
    km = KMeans(k=k, seed=seed, maxIter=max_iter, featuresCol="__features")
    return km.fit(feat)


def kmeans_clusters(
    corpus: DataFrame,
    k: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
) -> DataFrame:
    """Assign every vector to a cluster: (id, cluster_id)."""
    from pyspark.ml.functions import array_to_vector

    model = kmeans_fit(corpus, k, vec_col, seed)
    feat = corpus.withColumn(
        "__features", array_to_vector(F.col(vec_col).cast("array<double>"))
    )
    return (
        model.transform(feat)
        .select(F.col(id_col), F.col("prediction").alias("cluster_id"))
    )


def cluster_summary(corpus: DataFrame, k: int = 16, **kw) -> DataFrame:
    """Per-cluster sizes — the shape a curation pipeline reports."""
    assigned = kmeans_clusters(corpus, k, **kw)
    return (
        assigned.groupBy("cluster_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("cluster_id")
    )


def approx_ndv(df: DataFrame, cols: list[str], rsd: float = 0.02) -> DataFrame:
    """HLL-sketch distinct counts for each column, one pass, constant memory
    per sketch (rsd = target relative standard deviation)."""
    return df.agg(
        *[F.approx_count_distinct(c, rsd=rsd).alias(f"{c}_ndv") for c in cols]
    )


def approx_quantiles(
    df: DataFrame,
    col: str,
    probabilities: list[float] | None = None,
    relative_error: float = 0.01,
) -> DataFrame:
    """One-row frame of approximate quantiles via Spark's built-in
    Greenwald-Khanna sketch (`approx_percentile` with accuracy =
    1/relative_error) — mergeable partial sketches, one pass, no sort: the
    way to profile a 100 TB numeric column. Rank error is bounded by
    relative_error * N (asserted against exact percentile in tests)."""
    probabilities = probabilities or [0.25, 0.5, 0.75, 0.95, 0.99]
    if not all(0.0 <= p <= 1.0 for p in probabilities):
        raise ValueError(f"probabilities must be in [0,1]: {probabilities}")
    if not 0.0 < relative_error <= 0.5:
        raise ValueError(f"relative_error out of (0, 0.5]: {relative_error}")
    accuracy = max(1, int(round(1.0 / relative_error)))

    def _alias(p: float) -> str:
        # percent, dots/signs mangled to underscores so every legal p yields
        # a plain identifier: 0.5 -> p50, 0.999 -> p99_9, 1.0 -> p100
        return "p" + format(p * 100, "g").replace(".", "_").replace("-", "m")

    return df.agg(
        *[
            F.expr(f"approx_percentile({col}, {p!r}, {accuracy})").alias(_alias(p))
            for p in probabilities
        ]
    )
