"""r15 append/ivfprobe evidence runs (VERDICT r14 items 3, 5, 6).

Three arms, run sequentially on the cached vec_x40 scratch corpus:

- ``registered``: time the REGISTERED ``ann_index_append`` fn to
  completion at vec_x40 — the r15 windowed dispatch branch end-to-end
  (train + standing index + every window + union), the completing
  registered-path rung item 3 requires where r14 recorded a skip.
- ``windowed``: re-run ``vector_append_windowed_run`` with the new
  build-phase JIT warm-up, re-measuring the first-window cost item 5
  flags (r14: 176.5 s first vs 37.4 s steady).
- ``ivfprobe``: ``vector_ivfprobe_run`` at repeats=3 — item 6's
  protocol tightening for the auto rung's [7.67, 17.42] min-of-2
  spread.

Usage: python tools/append_r15.py [--arms registered,windowed,ivfprobe]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from tools.scale_stress import (  # noqa: E402
    release_pinned_rdds,
    vector_append_windowed_run,
    vector_ivfprobe_run,
)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--arms", default="registered,windowed,ivfprobe")
    ap.add_argument("--tier", default="vec_x40")
    ap.add_argument(
        "--scratch",
        default=os.environ.get(
            "SPARK_GRAFT_SCALE_DIR", "/tmp/spark_graft_scale"
        ),
    )
    ap.add_argument("--out", default="/tmp/append_r15.json")
    args = ap.parse_args()
    tdir = os.path.join(args.scratch, args.tier)

    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "48g")
    from stream_processing_test_spark.registry import all_queries
    from stream_processing_test_spark.session import get_spark

    spark = get_spark("append-r15")
    spark.range(1000).count()
    out: dict = {"tier": args.tier}
    arms = set(args.arms.split(","))

    if "registered" in arms:
        spec = all_queries()["ann_index_append"]
        t0 = time.time()
        res = spec.fn(spark, tdir)
        n = res.count()
        out["registered"] = {
            "wall_sec": round(time.time() - t0, 2),
            "rows": n,
        }
        print(f"[registered] {out['registered']}", flush=True)
        release_pinned_rdds(spark)
        with open(args.out, "w") as f:
            json.dump(out, f, indent=1)

    if "windowed" in arms:
        out["windowed"] = vector_append_windowed_run(spark, tdir)
        print(f"[windowed] {out['windowed']}", flush=True)
        release_pinned_rdds(spark)
        with open(args.out, "w") as f:
            json.dump(out, f, indent=1)

    if "ivfprobe" in arms:
        out["ivfprobe"] = vector_ivfprobe_run(spark, tdir, 3)
        print(f"[ivfprobe] {out['ivfprobe']}", flush=True)

    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
