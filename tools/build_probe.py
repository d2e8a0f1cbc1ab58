"""Per-query PLAN-BUILD cost probe: time ``fn(spark, sf_dir)`` alone
(no action) in a warm session, with ``finish_with`` patched to identity
so materializing idioms don't hide the lazy tail.

The py4j plan-build tax is driver wall that task metrics never see
(OPTIMIZATION_r16.md §py4j measured 1-10 ms per round trip on this
host); this probe ranks where it remains. Queries in
``PLAN_OPAQUE_QUERIES`` execute real jobs inside fn() (k-means loops,
CC loops, streaming sinks) — their number is build+execute and is
marked ``opaque`` in the output.

Usage:
    python tools/build_probe.py [sf_dir] [query1,query2,... | ALL] [rounds]

Prints one line per query: min/median build seconds across rounds
(round 1 is discarded as JIT warmup when rounds >= 3), opaque flag.
JSON summary on the last line.
"""

from __future__ import annotations

import json
import statistics
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def _patch_finish_with() -> None:
    import stream_processing_test_spark.session as S

    identity = lambda result, *cached: result  # noqa: E731
    S.finish_with = identity
    for mod_name, mod in list(sys.modules.items()):
        if mod_name.startswith("stream_processing_test_spark") and hasattr(
            mod, "finish_with"
        ):
            mod.finish_with = identity


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    which = sys.argv[2] if len(sys.argv) > 2 else "ALL"
    rounds = int(sys.argv[3]) if len(sys.argv) > 3 else 3

    import bench
    from stream_processing_test_spark.registry import (
        PLAN_OPAQUE_QUERIES,
        all_queries,
    )
    from stream_processing_test_spark.session import get_spark

    _patch_finish_with()
    spark = get_spark("build-probe")
    spark.range(1000).count()
    specs = all_queries()
    names = (
        list(bench.HEADLINE)
        if which == "ALL"
        else [n for n in which.split(",") if n]
    )

    samples: dict[str, list[float]] = {n: [] for n in names}
    for r in range(rounds):
        for name in names:
            spark.catalog.clearCache()
            t0 = time.time()
            specs[name].fn(spark, sf_dir)
            samples[name].append(round(time.time() - t0, 3))
    out = {}
    for name in names:
        ts = samples[name][1:] if rounds >= 3 else samples[name]
        out[name] = {
            "build_min": min(ts),
            "build_med": round(statistics.median(ts), 3),
            "opaque": name in PLAN_OPAQUE_QUERIES,
            "samples": samples[name],
        }
    for name, d in sorted(out.items(), key=lambda kv: -kv[1]["build_min"]):
        flag = " (opaque: includes fn()-internal jobs)" if d["opaque"] else ""
        print(
            f"{name:32s} build_min={d['build_min']:7.3f} "
            f"med={d['build_med']:7.3f}{flag}"
        )
    print("BUILDPROBE " + json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
