"""Similarity search over the ``embeddings`` table (vec_id,
embedding: array<float>, label).

Two paths, mirroring the dedup ladder:

- **Brute-force cosine top-k** (oracle-checked): exact, all-pairs
  between a small query set and the corpus. JVM-side vector math
  (``aggregate``/``zip_with`` — no Python per row); the query set is
  broadcast so the corpus streams through one task wave with no
  shuffle. This is the correctness baseline and is the right plan
  whenever |queries| is small (the 100 TB case: corpus-partitioned,
  query-broadcast).
- **LSH-bucketed ANN** (rows-only): random-hyperplane signatures via a
  seeded numpy pandas_udf; candidates restricted to matching buckets —
  the scale path when |queries| is large. Quality is validated in
  pytest against the brute-force result (recall@k).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from stream_processing_test_spark.registry import register
from stream_processing_test_spark.session import finish_with
from stream_processing_test_spark.tables import load

TOP_K = 10
N_QUERIES = 5  # query set = vec_id < 5


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity between two double-array columns (JVM-side)."""
    return _dot(a, b) / (_norm(a) * _norm(b))


_BRUTE_ORACLE = f"""
WITH q AS (
    SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < {N_QUERIES}
), sims AS (
    SELECT q.query_id, e.vec_id AS neighbor_id,
           ROUND(list_cosine_similarity(
               list_transform(q.qv, x -> CAST(x AS DOUBLE)),
               list_transform(e.embedding, x -> CAST(x AS DOUBLE))), 4) AS cos_sim
    FROM q, embeddings e
    WHERE e.vec_id <> q.query_id
), ranked AS (
    SELECT *, ROW_NUMBER() OVER (
        PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id ASC) AS rk
    FROM sims
)
SELECT CAST(query_id AS BIGINT) AS query_id,
       CAST(neighbor_id AS BIGINT) AS neighbor_id,
       cos_sim,
       CAST(rk AS BIGINT) AS rk
FROM ranked WHERE rk <= {TOP_K}
"""


@register(
    "ann_cosine_topk", oracle=_BRUTE_ORACLE, survey_ops="§7-similarity,⊘rank", tier=0
)
def ann_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-k for a small query set.

    Determinism across engines: similarities are computed in double
    precision and ROUNDED to 4 decimals BEFORE ranking in both Spark
    and DuckDB, with neighbor_id as tie-break — float noise in the
    last ulp cannot reorder the top-k."""
    emb = load(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    q = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
    )
    sims = (
        emb.crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            F.round(cosine(F.col("qv"), F.col("v")), 4).alias("cos_sim"),
        )
    )
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        sims.withColumn("rk", F.row_number().over(w).cast("long"))
        .filter(F.col("rk") <= TOP_K)
    )


N_TABLES = 16  # independent LSH tables (OR-amplification: recall)
N_PLANES = 4  # hyperplanes per table (AND-amplification: precision)
EMBED_DIM = 64  # embeddings table vector width (FIXTURES.md §2)


def hyperplane_tables(
    emb: DataFrame,
    n_tables: int = N_TABLES,
    n_planes: int = N_PLANES,
    dim: int = EMBED_DIM,
    seed: int = 42,
) -> DataFrame:
    """(vec_id, v, table_id, bucket): each vector hashed into one bucket
    per LSH table via random-hyperplane sign signatures.

    Shared candidate-generation stage for ANN search
    (``ann_lsh_topk``) and embedding near-dup (``dedup_embedding_lsh``).
    The hyperplanes come from a fixed-seed numpy RandomState inside an
    Arrow-vectorized pandas_udf — deterministic across runs and
    executors; the only Python in the pipeline runs over Arrow batches,
    not rows. The udf is defined inside this function so it is pickled
    by value (no executor-side package import needed)."""
    from pyspark.sql.types import ArrayType, IntegerType

    @F.pandas_udf(ArrayType(IntegerType()))
    def buckets_of(vs: pd.Series) -> pd.Series:
        planes = np.random.RandomState(seed).standard_normal(
            (dim, n_tables * n_planes)
        )
        mat = np.stack(vs.to_numpy())  # (batch, dim)
        signs = ((mat @ planes) > 0).reshape(len(vs), n_tables, n_planes)
        weights = (1 << np.arange(n_planes)).astype(np.int64)
        buckets = (signs @ weights).astype(np.int32)  # (batch, tables)
        return pd.Series(list(buckets))

    return emb.withColumn("buckets", buckets_of("v")).select(
        "vec_id",
        "v",
        F.posexplode("buckets").alias("table_id", "bucket"),
    )


@register(
    "ann_lsh_topk", oracle=None, survey_ops="§7-similarity,LSH,pandas_udf", tier=0
)
def ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Random-hyperplane LSH ANN: N_TABLES independent sign-signature
    tables (N_PLANES planes → 2^N_PLANES buckets each); a pair is a
    candidate if it collides in ANY table; exact cosine re-rank within
    candidates.

    The hyperplanes come from a fixed-seed numpy RandomState inside an
    Arrow-vectorized pandas_udf — deterministic across runs, and the
    only Python in the pipeline runs over Arrow batches, not rows.

    Parameter choice is a recall/cost dial on the collision curve
    p_table = (1 - θ/π)^N_PLANES, recall = 1-(1-p_table)^N_TABLES.
    The defaults (16×4) target the *moderate*-similarity regime of the
    synthetic corpus (top-1 cosine ≈ 0.35 → θ/π ≈ 0.39 → per-table
    ≈ 0.13 → recall ≈ 0.89). A production embedding corpus with
    cos ≥ 0.8 near-dups would flip toward more planes / fewer tables
    (e.g. 8×8) for 256× candidate pruning at the same recall.
    Rows-only driver check; pytest measures recall@k against
    ``ann_cosine_topk``."""
    emb = load(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    # persisted: the query side and the corpus side of the bucket join
    # both consume this — without it the pandas_udf hashing runs twice.
    tables = hyperplane_tables(emb).persist()
    q = tables.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("v").alias("qv"),
        F.col("table_id").alias("qtable"),
        F.col("bucket").alias("qbucket"),
    )
    cand = (
        tables.join(
            F.broadcast(q),
            (F.col("table_id") == F.col("qtable"))
            & (F.col("bucket") == F.col("qbucket")),
            "inner",
        )
        .filter(F.col("vec_id") != F.col("query_id"))
        .select("query_id", F.col("vec_id").alias("neighbor_id"), "qv", "v")
        .distinct()
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine(F.col("qv"), F.col("v")), 4).alias("cos_sim"),
        )
    )
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id").asc()
    )
    result = (
        cand.withColumn("rk", F.row_number().over(w).cast("long"))
        .filter(F.col("rk") <= TOP_K)
    )
    return finish_with(result, tables)


# ---------------------------------------------------------------------------
# IVF (inverted-file) ANN — coarse quantizer + probed-list search
# ---------------------------------------------------------------------------

N_PROBE = 2  # coarse lists searched per query


@register(
    "ann_ivf_topk", oracle=None, survey_ops="§7-similarity,IVF", tier=0
)
def ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN: the corpus is pre-partitioned into inverted lists (the
    ``label`` column is the coarse assignment — in a from-scratch build
    it comes from one k-means pass), each list summarized by its
    centroid (element-wise mean). A query probes only the N_PROBE
    nearest centroids and exact-scores just those lists.

    Scale shape (the part that matters at 100 TB): the corpus is
    scanned once to build centroids (|lists| rows, broadcastable
    forever after); per-query work is |corpus| x nprobe / |lists|
    instead of |corpus|. The list join is an equi-join on the list id,
    so candidate generation is a broadcast join, not a crossJoin.
    All vector math stays JVM-side (aggregate/zip_with).

    Rows-only check (argmin routing isn't ANSI-SQL-friendly); pytest
    validates exact-scoring-within-probed-lists and the statistical
    recall floor against ``ann_cosine_topk``. Honest caveat: the
    driver's synthetic embeddings are near-orthogonal random vectors,
    so NO routing structure exists to exploit and measured recall sits
    at the fraction-of-corpus-searched floor; on a real corpus the
    same plan with k-means lists gives the usual IVF recall curve.
    """
    emb = load(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v"), "label"
    )

    # Element-wise mean per list: posexplode → (label, pos) avg →
    # re-assemble ordered array. One corpus scan, |lists|*dim rows out.
    centroids = (
        emb.select("label", F.posexplode("v").alias("pos", "x"))
        .groupBy("label", "pos")
        .agg(F.avg("x").alias("m"))
        .groupBy("label")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "m"))),
                lambda s: s["m"],
            ).alias("centroid")
        )
    )

    q = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
    )

    # Route each query to its N_PROBE nearest centroids.
    from pyspark.sql import Window

    w_route = Window.partitionBy("query_id").orderBy(
        F.col("c_sim").desc(), F.col("label").asc()
    )
    probed = (
        q.crossJoin(F.broadcast(centroids))
        .select(
            "query_id",
            "qv",
            "label",
            F.round(cosine(F.col("qv"), F.col("centroid")), 6).alias("c_sim"),
        )
        .withColumn("pr", F.row_number().over(w_route))
        .filter(F.col("pr") <= N_PROBE)
        .select("query_id", "qv", "label")
    )

    # Exact cosine over the probed lists only (equi-join on list id).
    sims = (
        emb.join(F.broadcast(probed), "label")
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            F.round(cosine(F.col("qv"), F.col("v")), 4).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        sims.withColumn("rk", F.row_number().over(w).cast("long"))
        .filter(F.col("rk") <= TOP_K)
    )
