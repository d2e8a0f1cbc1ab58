"""Interleaved A/B benchmark between two checkouts of this repo.

Settles VERDICT r4 'What's wrong #4': the r4-vs-r2 common-subset wall-time
inflation needs per-query evidence from one pinned host, not prose. Run as:

    python tools/ab_bench.py <tree_a> <tree_b> [rounds]

Each tree is benchmarked in its own subprocess (same package name, different
code — they cannot share a session), alternating A,B,A,B,... so a CPU
throttle window cannot poison only one side. Each subprocess uses the tree's
own session factory (ANSI config etc. as shipped) and runs the five worst
common-subset ratios from VERDICT r4 with an identical warmup + noop-sink
protocol. Per-query min across rounds is compared; result JSON on stdout.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
from pathlib import Path

QUERIES = [
    q
    for q in os.environ.get(
        "AB_QUERIES",
        "session_windows,ann_lsh_topk,streaming_failure_streaks,"
        "sql_daily_event_summary,ann_cosine_topk",
    ).split(",")
    if q
]

CHILD = r"""
import json, os, sys, time
tree = sys.argv[1]
sys.path.insert(0, tree)
os.chdir(tree)
from stream_processing_test_spark.registry import all_queries
from stream_processing_test_spark.session import get_spark

sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
spark = get_spark("ab-bench")
spark.range(1000).count()
spark.read.parquet(os.path.join(sf_dir, "region.parquet")).write.format(
    "noop"
).mode("overwrite").save()
specs = all_queries()
out = {}
for name in json.loads(sys.argv[2]):
    spark.catalog.clearCache()
    t0 = time.time()
    specs[name].fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    out[name] = round(time.time() - t0, 3)
print("ABRESULT " + json.dumps(out))
"""


def run_tree(tree: str) -> dict[str, float]:
    proc = subprocess.run(
        [sys.executable, "-c", CHILD, tree, json.dumps(QUERIES)],
        capture_output=True,
        text=True,
        timeout=900,
    )
    for line in proc.stdout.splitlines():
        if line.startswith("ABRESULT "):
            return json.loads(line[len("ABRESULT "):])
    raise RuntimeError(
        f"no result from {tree}: rc={proc.returncode}\n{proc.stderr[-2000:]}"
    )


def main() -> None:
    tree_a, tree_b = sys.argv[1], sys.argv[2]
    rounds = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    samples: dict[str, dict[str, list[float]]] = {
        "a": {q: [] for q in QUERIES},
        "b": {q: [] for q in QUERIES},
    }
    for i in range(rounds):
        for side, tree in (("a", tree_a), ("b", tree_b)):
            res = run_tree(tree)
            for q, t in res.items():
                samples[side][q].append(t)
            print(f"round {i} {side} {res}", file=sys.stderr)
    result = {
        "tree_a": tree_a,
        "tree_b": tree_b,
        "rounds": rounds,
        "queries": {
            q: {
                "a_min": min(samples["a"][q]),
                "b_min": min(samples["b"][q]),
                "ratio_b_over_a": round(
                    min(samples["b"][q]) / max(min(samples["a"][q]), 1e-9), 3
                ),
                "a_samples": samples["a"][q],
                "b_samples": samples["b"][q],
            }
            for q in QUERIES
        },
    }
    print(json.dumps(result, indent=1))


if __name__ == "__main__":
    main()
