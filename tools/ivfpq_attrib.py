"""Stage-split the IVF-PQ composition's wall (VERDICT r11 item 3).

At vec_x40 (2 M vectors) ``ann_ivfpq_topk`` measured 61.6 s against
26.1 s for pure PQ and 11.2 s for pure IVF on the same corpus — 2.4×
its most expensive part with only 1.26 M scored code rows. This tool
attributes that wall: it replays ``pq.ivfpq_topk``'s internals as a
ladder of PREFIX plans (same calls, same order, same policies) and
times each prefix fresh (cache + pinned-RDD sweep between prefixes),
so consecutive diffs attribute each stage:

  count      — the n_rows probe (metadata-cheap scan)
  codebooks  — PQ trainer (hash-capped sample collect + driver Lloyd)
  kmeans     — IVF trainer (sample collect + driver Lloyd, k lists)
  assign     — the Arrow assignment pass materialized (since r12 the
               registered composition runs checkpoint=False; every
               prefix here replays that, so the diffs attribute the
               registered shape — the pre-fix checkpointed split is
               recorded in BENCH_NOTES §r12-ivfpq-attrib)
  encode     — pq_encode over the assignment output + code explode
  adc        — probed-list restriction + LUT join + integer group-sum
  full       — the registered tail (shortlist window, exact re-rank,
               top-k) = the whole query

Optional alternates (--alts) measure the fix hypotheses:
  fused      — ONE mapInPandas pass computing list_id AND the 16 PQ
               codes together (no wide checkpoint, no JVM encode over
               row-based input); timed to the same code-explode barrier
               as `encode`.
  skinny     — assignment checkpoint carries (vec_id, list_id) only;
               encode runs on the columnar parquet scan (pure-PQ shape)
               and list_id arrives by a corpus-scale shuffle join —
               the composition shape the docstring rejected, priced.

Run ALONE (timing discipline):

    python tools/ivfpq_attrib.py --tdir /tmp/spark_graft_scale/vec_x40 --repeats 2

Prints one JSON line; results go to BENCH_NOTES.md §r12-ivfpq-attrib.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402


def _load_emb(spark, tdir):
    from stream_processing_test_spark.tables import load

    return load(spark, tdir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )


def _queries(emb):
    from stream_processing_test_spark.llm.similarity import N_QUERIES

    return emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
    )


def _noop(df):
    df.write.format("noop").mode("overwrite").save()


def _sweep(spark):
    from stream_processing_test_spark.session import release_pinned_rdds

    spark.catalog.clearCache()
    release_pinned_rdds(spark)


def _prefix_walls(spark, tdir: str) -> dict[str, float]:
    """Each prefix timed FRESH; the stage cost is the diff to the
    previous prefix (identical upstream work cancels — trainers are
    deterministic, so every prefix rebuilds the same state)."""
    from stream_processing_test_spark.llm.pq import (
        _explode_codes,
        _query_luts,
        auto_rerank,
        pq_codebooks,
        pq_encode,
    )
    from stream_processing_test_spark.llm.similarity import (
        N_PROBE,
        auto_lists,
        kmeans_lists,
        route_queries,
    )
    from stream_processing_test_spark.registry import all_queries

    emb = _load_emb(spark, tdir)
    walls: dict[str, float] = {}

    def timed(name, fn):
        _sweep(spark)
        t0 = time.time()
        fn()
        walls[name] = round(time.time() - t0, 2)

    timed("count", lambda: emb.select("vec_id").count())

    def p_codebooks():
        n = emb.select("vec_id").count()
        pq_codebooks(emb, n_rows=n)

    timed("codebooks", p_codebooks)

    def p_kmeans():
        n = emb.select("vec_id").count()
        pq_codebooks(emb, n_rows=n)
        kmeans_lists(emb, k=auto_lists(n), n_rows=n, checkpoint=False)  # no materialize

    timed("kmeans", p_kmeans)

    def p_assign():
        n = emb.select("vec_id").count()
        pq_codebooks(emb, n_rows=n)
        assign, _ = kmeans_lists(
            emb, k=auto_lists(n), n_rows=n, checkpoint=False
        )
        _noop(assign)

    timed("assign", p_assign)

    def p_encode():
        n = emb.select("vec_id").count()
        rows = pq_codebooks(emb, n_rows=n)
        assign, _ = kmeans_lists(
            emb, k=auto_lists(n), n_rows=n, checkpoint=False
        )
        enc = pq_encode(assign, rows, carry=("list_id",))
        _noop(_explode_codes(enc, carry=("list_id",)))

    timed("encode", p_encode)

    def p_adc():
        n = emb.select("vec_id").count()
        rows = pq_codebooks(emb, n_rows=n)
        assign, centroids = kmeans_lists(
            emb, k=auto_lists(n), n_rows=n, checkpoint=False
        )
        enc = pq_encode(assign, rows, carry=("list_id",))
        codes = _explode_codes(enc, carry=("list_id",))
        qv = _queries(emb)
        lut = _query_luts(qv, rows)
        probed = route_queries(qv, centroids, N_PROBE)
        pairs = codes.join(F.broadcast(probed), "list_id").join(
            F.broadcast(lut), ["query_id", "s", "code"]
        )
        agg = (
            pairs.filter(F.col("vec_id") != F.col("query_id"))
            .groupBy("query_id", "vec_id")
            .agg(F.sum("ipart").alias("idot"), F.sum("cnsq").alias("insq"))
        )
        _noop(agg)

    timed("adc", p_adc)

    def p_full():
        fn = all_queries()["ann_ivfpq_topk"].fn
        _noop(fn(spark, tdir))

    timed("full", p_full)
    # consecutive diffs = per-stage attribution
    order = ["count", "codebooks", "kmeans", "assign", "encode", "adc", "full"]
    stages = {}
    prev = 0.0
    for name in order:
        stages[name] = round(walls[name] - prev, 2)
        prev = walls[name]
    return {"prefix_walls": walls, "stage_diffs": stages}


def _alt_fused(spark, tdir: str) -> float:
    """Hypothesis probe: ONE Arrow pass computing coarse list AND PQ
    codes (vectorized numpy), emitting the SKINNY (vec_id, list_id,
    c0..c15) index — no wide checkpoint, no JVM encode downstream of
    the Python workers. Wall timed to the same code-explode barrier as
    the `encode` prefix. Selection parity is NOT re-verified here (a
    measurement probe); landing it in the engine requires the
    pq_encode integer-key contract replayed in numpy."""
    from stream_processing_test_spark.llm.pq import (
        PQ_CODES,
        PQ_DSUB,
        PQ_SUBS,
        pq_codebooks,
    )
    from stream_processing_test_spark.llm.similarity import (
        auto_lists,
        kmeans_lists,
        train_sample,
    )

    emb = _load_emb(spark, tdir)
    _sweep(spark)
    t0 = time.time()
    n = emb.select("vec_id").count()
    rows = pq_codebooks(emb, n_rows=n)
    # train coarse centroids exactly like kmeans_lists, but keep the
    # assignment INSIDE the fused pass below
    from stream_processing_test_spark.llm.similarity import (
        IVF_ITERS,
        _lloyd_numpy,
    )

    train = train_sample(emb.select("vec_id", "v"), n_rows=n)
    cents = _lloyd_numpy(
        [(r["vec_id"], r["v"]) for r in train.collect()],
        k=auto_lists(n),
        iters=IVF_ITERS,
    )
    cs = sorted(cents)
    cent_ids = [lid for lid, _ in cs]
    cent_rows = [c for _, c in cs]
    by_sub: dict[int, list] = {}
    for s, code, centroid in rows:
        by_sub.setdefault(s, []).append((code, centroid))
    sub_cents = {
        s: [c for _, c in sorted(by_sub[s])] for s in sorted(by_sub)
    }

    def fused(batches):
        import numpy as np

        C = np.array(cent_rows, dtype=np.float64)
        ids_arr = np.array(cent_ids, dtype=np.int64)
        nc = np.sqrt((C * C).sum(axis=1))
        P = {
            s: np.array(m, dtype=np.float64) for s, m in sub_cents.items()
        }
        for pdf in batches:
            if not len(pdf):
                continue
            V = np.array(pdf["v"].tolist(), dtype=np.float64)
            sims = (V @ C.T) / (
                np.sqrt((V * V).sum(axis=1))[:, None] * nc[None, :]
            )
            lab = ids_arr[np.argmax(np.round(sims, 6), axis=1)]
            out = {"vec_id": pdf["vec_id"], "list_id": lab}
            for s, M in P.items():
                sub = V[:, s * PQ_DSUB : (s + 1) * PQ_DSUB]
                d2 = (
                    (sub * sub).sum(axis=1)[:, None]
                    - 2.0 * (sub @ M.T)
                    + (M * M).sum(axis=1)[None, :]
                )
                out[f"c{s}"] = np.argmin(d2, axis=1).astype("int32")
            import pandas as pd

            yield pd.DataFrame(out)

    schema = "vec_id bigint, list_id int, " + ", ".join(
        f"c{s} int" for s in range(PQ_SUBS)
    )
    enc = emb.select("vec_id", "v").mapInPandas(fused, schema=schema)
    stack = ", ".join(
        x for s in range(PQ_SUBS) for x in (str(s), f"c{s}")
    )
    codes = enc.selectExpr(
        "vec_id", "list_id", f"stack({PQ_SUBS}, {stack}) AS (s, code)"
    )
    _noop(codes)
    assert PQ_CODES  # silence unused-import linters
    return round(time.time() - t0, 2)


def _alt_skinny(spark, tdir: str) -> float:
    """Hypothesis probe: columnar-scan encode (pure-PQ shape) +
    corpus-scale shuffle join against a SKINNY (vec_id, list_id)
    assignment — the shape ivfpq_topk's docstring rejected. Timed to
    the code-explode barrier.

    ``checkpoint=False`` then localCheckpoint of the 2-column
    projection (r12 review finding): the default kmeans_lists
    checkpoint materializes the WIDE (vec_id, v, list_id) rows —
    ~1.1 GB at vec_x40 — which is precisely the write+read this
    alternative hypothesizes away; measuring it with the wide barrier
    inside overstates the skinny shape's cost."""
    from stream_processing_test_spark.llm.pq import (
        _explode_codes,
        pq_codebooks,
        pq_encode,
    )
    from stream_processing_test_spark.llm.similarity import (
        auto_lists,
        kmeans_lists,
    )

    emb = _load_emb(spark, tdir)
    _sweep(spark)
    t0 = time.time()
    n = emb.select("vec_id").count()
    rows = pq_codebooks(emb, n_rows=n)
    assign, _ = kmeans_lists(emb, k=auto_lists(n), n_rows=n, checkpoint=False)
    skinny = assign.select("vec_id", "list_id").localCheckpoint()
    enc = pq_encode(emb.select("vec_id", "v"), rows)
    codes = _explode_codes(enc).join(skinny, "vec_id")
    _noop(codes)
    return round(time.time() - t0, 2)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--tdir", default="/tmp/spark_graft_scale/vec_x40")
    ap.add_argument("--repeats", type=int, default=2)
    ap.add_argument(
        "--alts", default="", help="comma list from {fused,skinny}"
    )
    args = ap.parse_args()
    from stream_processing_test_spark.session import get_spark

    spark = get_spark("ivfpq-attrib")
    spark.range(1000).count()  # JIT warm
    # full-query warmup: JITs every op family (Arrow workers, janino
    # codegen, parquet reader) so the prefix ladder measures stages,
    # not first-execution constants (negative diffs otherwise)
    from stream_processing_test_spark.registry import all_queries

    _sweep(spark)
    _noop(all_queries()["ann_ivfpq_topk"].fn(spark, args.tdir))
    out: dict = {"tdir": args.tdir}
    runs = [_prefix_walls(spark, args.tdir) for _ in range(args.repeats)]
    # min-of-N per prefix, then re-diff (host throttle discipline)
    mins = {
        k: min(r["prefix_walls"][k] for r in runs)
        for k in runs[0]["prefix_walls"]
    }
    order = ["count", "codebooks", "kmeans", "assign", "encode", "adc", "full"]
    prev = 0.0
    stages = {}
    for name in order:
        stages[name] = round(mins[name] - prev, 2)
        prev = mins[name]
    out["prefix_walls_min"] = mins
    out["stage_diffs"] = stages
    out["runs"] = runs
    alts = {a for a in args.alts.split(",") if a}
    if "fused" in alts:
        out["alt_fused_to_codes_wall"] = min(
            _alt_fused(spark, args.tdir) for _ in range(args.repeats)
        )
    if "skinny" in alts:
        out["alt_skinny_to_codes_wall"] = min(
            _alt_skinny(spark, args.tdir) for _ in range(args.repeats)
        )
    print(json.dumps(out, separators=(",", ":")), flush=True)


if __name__ == "__main__":
    main()
