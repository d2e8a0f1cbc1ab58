"""Re-price the ANN qbatch decision surface with the auto-probe IVF
arm (VERDICT r14 item 2).

Protocol = §r14-qbatch's (min of ``--repeats``, noop-driven, all arms
on the same ``parallelize_narrow_scan``-widened frame), with one new
arm: ``ivfauto`` — ``ivf_topk`` at ``n_probe=auto_probe(auto_lists(n))``,
the fraction-pinned operating point ``ann_ivf_auto_probe`` registers.

Arms per tier (labeled-carry discipline, BENCH_NOTES §r15-qbatch):

- vec_x1 (50k), vec_x4 (200k): ALL arms fresh — these tiers hold the
  tight cells (50k x 64 is a near-three-way tie) where a carried
  number could flip a winner.
- vec_x40 (2M): ivf + ivfauto fresh; brute/pq cells CARRIED from r14
  (9.11/129.2 and 11.64/78.2 — the ivf family wins those cells by
  4-10x, beyond any observed session drift; the B=512 brute/pq skips
  are deterministic caps, not timings).

Usage:  python tools/qbatch_r15.py [--tiers vec_x1,vec_x4,vec_x40]
        [--repeats 2] [--out /tmp/qbatch_r15.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from tools.scale_stress import (  # noqa: E402
    TIERS,
    _reuse_or_gen,
    _vec_params,
    gen_vectors,
    vector_qbatch_run,
)

ARMS_BY_TIER = {
    "vec_x1": ("brute", "pq", "ivf", "ivfauto"),
    "vec_x4": ("brute", "pq", "ivf", "ivfauto"),
    "vec_x40": ("ivf", "ivfauto"),
}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--tiers", default="vec_x1,vec_x4,vec_x40")
    ap.add_argument("--repeats", type=int, default=2)
    ap.add_argument(
        "--scratch",
        default=os.environ.get(
            "SPARK_GRAFT_SCALE_DIR", "/tmp/spark_graft_scale"
        ),
    )
    ap.add_argument("--out", default="/tmp/qbatch_r15.json")
    args = ap.parse_args()

    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "48g")
    from stream_processing_test_spark.session import get_spark

    spark = get_spark("qbatch-r15")
    spark.range(1000).count()

    # JIT warm-up: one untimed pass of every arm family on a 2k-vector
    # corpus so codegen/JIT cost never lands inside a timed cell
    wdir = os.path.join(args.scratch, "warmup_vec")
    _reuse_or_gen(
        wdir, _vec_params(2_000, 0.2), lambda: gen_vectors(wdir, 2_000, 0.2)
    )
    vector_qbatch_run(spark, wdir, 1, batches=(5,))

    out: dict = {}
    for tier in args.tiers.split(","):
        n_vecs, dup = TIERS[tier]
        tdir = os.path.join(args.scratch, tier)
        _reuse_or_gen(
            tdir,
            _vec_params(n_vecs, dup),
            lambda: gen_vectors(tdir, n_vecs, dup),
        )
        out[tier] = vector_qbatch_run(
            spark, tdir, args.repeats, arms=ARMS_BY_TIER[tier]
        )
        print(f"[{tier}] done: {json.dumps(out[tier])}", flush=True)
        with open(args.out, "w") as f:
            json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
