"""Ladder A/B for VERDICT r16 item 8: embedding-LSH verify stage as the
shipped interpreted HOF fold vs an Arrow/numpy batch kernel, at the
vec_x16 (800k) rung where the candidate set is tens of millions.

Both arms share EVERYTHING up to the verify fold: the same
hyperplane_tables signature stage, the same bucket self-join candidate
set, the same two vector-fanback joins. Arm "hof" is the registered
embedding_lsh_pairs path verbatim; arm "arrow" swaps only the
per-pair cosine fold for a mapInArrow numpy kernel (einsum over the
joined batches). Timing-only experiment — the registered query is
unchanged; a switch would need the bit-exactness question (sequential
fold vs pairwise numpy summation at the round-4 boundary) settled
first.

Usage:
    python tools/elsh_verify_ab.py [--scratch DIR] [--rounds 2]
        [--n 800000]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def arrow_pairs(emb, n_tables: int, n_planes: int, threshold: float):
    """The embedding_lsh_pairs pipeline with the verify fold in numpy."""
    from pyspark.sql import functions as F

    from stream_processing_test_spark.llm.similarity import (
        _norm,
        hyperplane_tables,
    )
    from stream_processing_test_spark.session import finish_with

    embd = emb.select(
        "vec_id", F.col("v").cast("array<double>").alias("v")
    )
    tables = hyperplane_tables(
        embd, n_tables=n_tables, n_planes=n_planes
    ).persist()
    a = tables.select(F.col("vec_id").alias("doc_a"), "table_id", "bucket")
    b = tables.select(F.col("vec_id").alias("doc_b"), "table_id", "bucket")
    cand = (
        a.join(b, ["table_id", "bucket"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .dropDuplicates(["doc_a", "doc_b"])
    )
    va = emb.select(
        F.col("vec_id").alias("doc_a"),
        F.col("v").alias("va"),
        _norm(F.col("v").cast("array<double>")).alias("na"),
    )
    vb = emb.select(
        F.col("vec_id").alias("doc_b"),
        F.col("v").alias("vb"),
        _norm(F.col("v").cast("array<double>")).alias("nb"),
    )
    joined = cand.join(va, "doc_a").join(vb, "doc_b").select(
        "doc_a", "doc_b", "va", "vb", "na", "nb"
    )

    def fold(batches):
        import numpy as np
        import pyarrow as pa

        for batch in batches:
            n = batch.num_rows
            if n == 0:
                continue
            A = batch.column("va").values.to_numpy(
                zero_copy_only=False
            ).reshape(n, -1).astype("float64", copy=False)
            B = batch.column("vb").values.to_numpy(
                zero_copy_only=False
            ).reshape(n, -1).astype("float64", copy=False)
            na = batch.column("na").to_numpy(zero_copy_only=False)
            nb = batch.column("nb").to_numpy(zero_copy_only=False)
            cos = np.einsum("ij,ij->i", A, B) / (na * nb)
            yield pa.RecordBatch.from_arrays(
                [batch.column("doc_a"), batch.column("doc_b"), pa.array(cos)],
                ["doc_a", "doc_b", "raw_cos"],
            )

    pairs = joined.mapInArrow(
        fold, "doc_a BIGINT, doc_b BIGINT, raw_cos DOUBLE"
    )
    result = pairs.filter(F.col("raw_cos") >= threshold).select(
        "doc_a", "doc_b", F.round("raw_cos", 4).alias("cos_sim")
    )
    return finish_with(result, tables)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scratch", default="/tmp/spark_graft_scale_r17")
    ap.add_argument("--rounds", type=int, default=2)
    ap.add_argument("--n", type=int, default=800000)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    sys.argv = [sys.argv[0]]
    from tools.scale_stress import gen_vectors  # noqa: E402
    from stream_processing_test_spark.llm.dedup import embedding_lsh_pairs
    from stream_processing_test_spark.llm.similarity import auto_planes, auto_tables
    from stream_processing_test_spark.session import (
        get_spark,
        release_pinned_rdds,
    )

    tdir = os.path.join(args.scratch, f"vec_{args.n}")
    os.makedirs(tdir, exist_ok=True)
    spark = get_spark("elsh-verify-ab")
    spark.range(1000).count()
    meta = gen_vectors(tdir, args.n, 0.2)
    print("corpus:", json.dumps(meta)[:200], file=sys.stderr)

    emb = spark.read.parquet(os.path.join(tdir, "embeddings.parquet")).select(
        "vec_id", F.col("embedding").alias("v")
    )
    n = emb.count()
    planes = auto_planes(n, target_occupancy=16)
    tables = 8
    print(f"n={n} planes={planes} tables={tables}", file=sys.stderr)

    out = {"n": n, "planes": planes, "tables": tables, "arms": {}}
    samples = {"hof": [], "arrow": []}
    pair_counts = {}
    for r in range(args.rounds):
        for arm in ("hof", "arrow"):
            spark.catalog.clearCache()
            release_pinned_rdds(spark)
            t0 = time.time()
            if arm == "hof":
                res = embedding_lsh_pairs(
                    emb, n_tables=tables, n_planes=planes
                )
            else:
                from stream_processing_test_spark.llm.dedup import (
                    EMBED_COSINE_THRESHOLD,
                )

                res = arrow_pairs(
                    emb, tables, planes, threshold=EMBED_COSINE_THRESHOLD
                )
            dt = round(time.time() - t0, 2)
            samples[arm].append(dt)
            if r == 0:
                pair_counts[arm] = res.count()
            print(f"round {r} {arm}: {dt}s", file=sys.stderr)
    for arm in ("hof", "arrow"):
        out["arms"][arm] = {
            "samples": samples[arm],
            "min": min(samples[arm]),
            "pairs": pair_counts.get(arm),
        }
    print(json.dumps(out, indent=1))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
