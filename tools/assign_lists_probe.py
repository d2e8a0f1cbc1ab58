"""A/B/C-measure the IVF assignment pass implementations (the r11
decision record in llm/similarity.py cites this tool).

Three forms, one selection semantics (argmax round-6 cosine, ties to
the smaller list_id, zero-norm -> smallest trained id):

- ``crossjoin`` — the r6 form: broadcast crossJoin + max-struct;
  aggregate/zip_with HOF folds run INTERPRETED per (row x centroid).
- ``literal`` — the r10 form: the centroid matrix embedded as one
  giant selectExpr argmax. Whole-stage-codegen'd while janino can
  compile it; at k>=128 (dim 64) compilation FAILS (64 KiB method
  limits) and Spark silently falls back to the row-based path.
- ``arrow`` — the shipped form (``similarity._assign_arrow``):
  mapInPandas + vectorized numpy with the left-to-right dim fold.

The retired expression forms live HERE as frozen copies so the
measurement stays reproducible without keeping dead code in the
engine. Run ALONE (timing discipline):

    python tools/assign_lists_probe.py --n 1200000 --form arrow --ks 128,256

Prints one JSON line per (n, k) cell; the r11 measurements are pasted
into BENCH_NOTES.md §r11-assign-arrow.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def _assign_crossjoin_frozen(base, centroids):
    """r6 form, frozen verbatim at its r11 retirement (was
    similarity._assign_crossjoin)."""
    from pyspark.sql import functions as F

    from stream_processing_test_spark.llm.similarity import cosine

    scored = base.crossJoin(F.broadcast(centroids)).select(
        "vec_id",
        "v",
        F.struct(
            F.round(cosine(F.col("v"), F.col("centroid")), 6).alias("sim"),
            (-F.col("list_id")).alias("neg_id"),
        ).alias("cand"),
    )
    return scored.groupBy("vec_id").agg(
        F.first("v").alias("v"),
        (-F.max("cand")["neg_id"]).cast("int").alias("list_id"),
    )


def _assign_literal_frozen(base, cents):
    """r10 form, frozen verbatim at its r11 retirement (was
    similarity._assign_literal; the layering/rounding rationale lives
    in that function's git history)."""
    import math

    if not cents:
        return base.limit(0).selectExpr(
            "vec_id", "v", "CAST(0 AS INT) AS list_id"
        )
    dim = len(cents[0][1])
    k = len(cents)
    l1 = base.selectExpr(
        "vec_id",
        "v",
        *[f"element_at(v, {i + 1}) AS x{i}" for i in range(dim)],
    )
    nv = " + ".join(f"x{i} * x{i}" for i in range(dim))
    l2 = l1.selectExpr("*", f"sqrt({nv}) AS nv")
    key_texts = []
    for j, (_list_id, c) in enumerate(sorted(cents)):
        dot = " + ".join(f"x{i} * {c[i]!r}D" for i in range(dim))
        ncsq = None
        for ci in c:
            ncsq = ci * ci if ncsq is None else ncsq + ci * ci
        nc = math.sqrt(ncsq)
        sim = f"((({dot}) / (nv * {nc!r}D)))"
        key_texts.append(
            f"(CAST(floor(abs({sim}) * 1000000.0D + 0.5D) AS BIGINT)"
            f" * (CASE WHEN {sim} < 0D THEN -1 ELSE 1 END)"
            f" * {k} + {k - 1 - j})"
        )
    best = key_texts[0] if k == 1 else f"greatest({', '.join(key_texts)})"
    ids = [lid for lid, _ in sorted(cents)]
    id_arr = f"array({', '.join(str(i) for i in ids)})"
    return l2.selectExpr(
        "vec_id",
        "v",
        f"coalesce(element_at({id_arr},"
        f" CAST({k - 1} - pmod({best}, {k}) AS INT) + 1),"
        f" {ids[0]}) AS list_id",
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1_200_000)
    ap.add_argument("--dim", type=int, default=64)
    ap.add_argument("--repeats", type=int, default=2)
    ap.add_argument("--ks", type=str, default="128,256")
    ap.add_argument(
        "--form",
        choices=["literal", "arrow", "crossjoin"],
        default="arrow",
        help="which assignment implementation to time",
    )
    args = ap.parse_args()

    from stream_processing_test_spark.session import get_spark
    from stream_processing_test_spark.llm import similarity

    spark = get_spark(app_name="assign_lists_probe")
    # deterministic pseudo-random corpus, built JVM-side (no disk, no
    # collect): dim values in [-1, 1) keyed off (vec_id, position).
    # CAST to DOUBLE inside the lambda: the bare division is DECIMAL
    # arithmetic, and decimal x_i leaves inflate the literal form's
    # generated code ~10x (its compile cliff then hits at much
    # smaller k than the real array<double> corpus would).
    base = spark.range(args.n).selectExpr(
        "id AS vec_id",
        f"transform(sequence(1, {args.dim}), "
        "i -> (CAST(pmod(hash(id * 131 + i), 1000) AS DOUBLE) / 500.0)"
        " - 1.0) AS v",
    )
    rng = np.random.default_rng(7)
    results = []
    for k in [int(x) for x in args.ks.split(",")]:
        cents = [
            (j, [float(x) for x in rng.standard_normal(args.dim)])
            for j in range(k)
        ]
        build_walls, exec_walls = [], []
        for _ in range(args.repeats):
            t0 = time.time()
            if args.form == "literal":
                assigned = _assign_literal_frozen(base, cents)
            elif args.form == "arrow":
                assigned = similarity._assign_arrow(base, cents)
            else:
                cents_df = spark.createDataFrame(
                    cents, "list_id int, centroid array<double>"
                )
                assigned = _assign_crossjoin_frozen(base, cents_df)
            # force analysis (codegen happens at execution) without
            # executing: schema pulls the analyzed plan
            _ = assigned.schema
            t1 = time.time()
            # sum(list_id) — NOT count(*): a bare count would let the
            # optimizer prune the entire argmax expression off the plan
            row = assigned.selectExpr(
                "count(*) AS n", "sum(list_id) AS s"
            ).collect()[0]
            t2 = time.time()
            assert row["n"] == args.n and row["s"] is not None
            build_walls.append(round(t1 - t0, 2))
            exec_walls.append(round(t2 - t1, 2))
        row = {
            "n": args.n,
            "k": k,
            "form": args.form,
            "dim": args.dim,
            "plan_build_sec": min(build_walls),
            "exec_sec": min(exec_walls),
            "build_samples": build_walls,
            "exec_samples": exec_walls,
        }
        results.append(row)
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
