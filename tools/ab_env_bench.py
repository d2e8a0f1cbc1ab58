"""Interleaved A/B benchmark of ONE env-controlled session knob on the
same tree (VERDICT r16 items 3/7: isolate `SPARK_GRAFT_PREFER_SMJ` /
`SPARK_GRAFT_BYPASS_THRESHOLD` instead of A/B-ing them combined).

    python tools/ab_env_bench.py KEY=VAL_A KEY=VAL_B [rounds]

Environment:
    AB_QUERIES  comma-separated query names (required)

Protocol mirrors tools/ab_bench.py: each side runs in a fresh
subprocess (own JVM) with the same warmup + noop-sink loop, sides
alternate A,B,A,B,... so a throttle window cannot poison one side, and
per-query minima across rounds are compared. Result JSON on stdout.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
from pathlib import Path

REPO = str(Path(__file__).resolve().parent.parent)

CHILD = r"""
import json, os, sys, time
sys.path.insert(0, sys.argv[1])
os.chdir(sys.argv[1])
from stream_processing_test_spark.registry import all_queries
from stream_processing_test_spark.session import get_spark

sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
spark = get_spark("ab-env-bench")
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


def run_side(env_kv: str, queries: list[str]) -> dict[str, float]:
    key, _, val = env_kv.partition("=")
    env = dict(os.environ)
    env[key] = val
    proc = subprocess.run(
        [sys.executable, "-c", CHILD, REPO, json.dumps(queries)],
        capture_output=True,
        text=True,
        timeout=1800,
        env=env,
    )
    for line in proc.stdout.splitlines():
        if line.startswith("ABRESULT "):
            return json.loads(line[len("ABRESULT "):])
    raise RuntimeError(
        f"no result for {env_kv}: rc={proc.returncode}\n{proc.stderr[-2000:]}"
    )


def main() -> None:
    side_a, side_b = sys.argv[1], sys.argv[2]
    rounds = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    queries = [q for q in os.environ.get("AB_QUERIES", "").split(",") if q]
    if not queries:
        raise SystemExit("set AB_QUERIES=q1,q2,...")
    samples: dict[str, dict[str, list[float]]] = {
        "a": {q: [] for q in queries},
        "b": {q: [] for q in queries},
    }
    for i in range(rounds):
        for side, kv in (("a", side_a), ("b", side_b)):
            res = run_side(kv, queries)
            for q, t in res.items():
                samples[side][q].append(t)
            print(f"round {i} {side} {kv} {res}", file=sys.stderr)
    result = {
        "side_a": side_a,
        "side_b": side_b,
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
            for q in queries
        },
    }
    print(json.dumps(result, indent=1))


if __name__ == "__main__":
    main()
