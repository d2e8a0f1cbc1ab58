"""Embedding-column analytics: per-label centroids and norm statistics.

ANN/clustering pipelines need corpus-level vector statistics — class
centroids (the IVF coarse quantizer llm/similarity.py routes through
is exactly a centroid table) and norm distributions (catching
un-normalized or degenerate vectors before they poison a cosine
index).

Both operators reshape ``array<float>`` columns into (row, dim, value)
via ``posexplode`` and aggregate with built-ins — the dimension-major
layout partial-aggregates map-side and shuffles only (label, dim)
groups, never raw vectors, so the shuffle is |labels| * dims rows
regardless of corpus size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from stream_processing_test_spark.registry import register
from stream_processing_test_spark.tables import load

_CENTROID_ORACLE = """
WITH flat AS (
    SELECT label,
           generate_subscripts(embedding, 1) - 1 AS dim,
           unnest(embedding) AS x
    FROM embeddings
)
SELECT CAST(label AS INT) AS label,
       CAST(dim AS INT) AS dim,
       ROUND(AVG(CAST(x AS DOUBLE)), 4) AS centroid
FROM flat GROUP BY label, dim
"""


@register(
    "embedding_centroids", oracle=_CENTROID_ORACLE, survey_ops="§7-similarity,A8", tier=0
)
def embedding_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label mean vector, one row per (label, dim). The output IS
    an IVF coarse-quantizer codebook (labels as lists); emitting
    dimension-major rows keeps it oracle-comparable and
    partial-aggregatable."""
    emb = load(spark, sf_dir, "embeddings")
    return (
        emb.select(
            "label",
            F.posexplode(F.col("embedding").cast("array<double>")).alias(
                "dim", "x"
            ),
        )
        .groupBy("label", "dim")
        .agg(F.round(F.avg("x"), 4).alias("centroid"))
        .select(F.col("label").cast("int"), F.col("dim").cast("int"), "centroid")
    )


_NORM_ORACLE = """
WITH norms AS (
    SELECT label,
           sqrt(list_sum(list_transform(embedding,
                x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nrm
    FROM embeddings
)
SELECT CAST(label AS INT) AS label,
       CAST(COUNT(*) AS BIGINT) AS n_vectors,
       ROUND(AVG(nrm), 4) AS avg_norm,
       ROUND(MIN(nrm), 4) AS min_norm,
       ROUND(MAX(nrm), 4) AS max_norm
FROM norms GROUP BY label
"""


@register(
    "embedding_norm_stats", oracle=_NORM_ORACLE, survey_ops="§7-similarity,A8", tier=0
)
def embedding_norm_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L2-norm distribution per label: count, avg, min, max. The norm
    is one ``aggregate`` fold per row (JVM-side lambda, no Python);
    the groupBy on label is a 5-group shuffle of pre-aggregated
    partials."""
    emb = load(spark, sf_dir, "embeddings").select(
        "label", F.col("embedding").cast("array<double>").alias("v")
    )
    nrm = F.sqrt(
        F.aggregate("v", F.lit(0.0), lambda acc, x: acc + x * x)
    )
    return (
        emb.select("label", nrm.alias("nrm"))
        .groupBy("label")
        .agg(
            F.count("*").alias("n_vectors"),
            F.round(F.avg("nrm"), 4).alias("avg_norm"),
            F.round(F.min("nrm"), 4).alias("min_norm"),
            F.round(F.max("nrm"), 4).alias("max_norm"),
        )
        .select(
            F.col("label").cast("int"),
            "n_vectors",
            "avg_norm",
            "min_norm",
            "max_norm",
        )
    )
