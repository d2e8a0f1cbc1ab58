"""Benchmark harness (driver contract): run the headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and print ONE JSON line:
  {"metric": ..., "value": total_sec, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ...}

Each query is fully materialized through the noop sink (all partitions
computed, nothing collected to the driver) — measuring engine time,
not toPandas serialization.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from stream_processing_test_spark.registry import all_queries
from stream_processing_test_spark.session import get_spark

HEADLINE = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_region_revenue",
    "daily_scores",
    "per_source_rollup",
    "vendor_flow_stats",
    "failing_programs",
    "top_events_per_user",
    "asof_click_attribution",
    "range_join_error_context",
    "rolling_user_stats",
    "revenue_rollup",
    "props_json_stats",
    "q6_forecast_revenue",
    "q7_nation_trade_volume",
    "q8_market_share",
    "q9_product_profit",
    "q10_returned_items",
    "q13_order_count_distribution",
    "q2_min_cost_supplier",
    "q16_part_supplier_variety",
    "q21_blocking_suppliers",
    "stats_moments",
    "price_percentiles",
    "revenue_cube",
    "sql_daily_event_summary",
    "q18_large_orders",
    "users_without_big_purchase",
    "suppliers_with_bulk_items",
    "user_cardinality",
    "session_windows",
    "dedup_exact",
    "dedup_ngram_jaccard",
    "dedup_minhash_lsh",
    "ann_cosine_topk",
    "token_count",
    "doc_quality_score",
    "streaming_daily_scores",
    "streaming_failure_streaks",
    "dup_clusters",
    "doc_chunking",
    "tfidf_top_terms",
    "stratified_sample",
    "source_mixing",
    "embedding_centroids",
    "embedding_norm_stats",
    "dedup_simhash",
    "dedup_keep_canonical",
    "decontaminate_overlap",
    "corpus_curation_pipeline",
    "dedup_embedding_lsh",
    "ann_lsh_topk",
    "ann_ivf_topk",
    "lang_id_ngram",
    "day_close_trigger",
    "daily_report_pipeline",
    "attribute_rollup",
    "decayed_user_scores",
    "cohort_retention",
    "funnel_conversion",
    "user_value_percentiles",
    "skew_salted_rollup",
    "dup_clusters_star",
    "leakage_safe_split",
    # streaming_session_windows is oracle-checked but deliberately NOT a
    # headline query: its wall time is dominated by the sentinel-replay
    # rewrite (test harness, not engine work); streaming perf is
    # represented by streaming_daily_scores / streaming_failure_streaks.
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark("bench")
    specs = all_queries()

    # Warm the JVM/session so per-query numbers measure the queries,
    # not one-time class loading: a real parquet scan + noop write JITs
    # the reader, codegen, and committer paths (region is ~5 rows).
    spark.range(1000).count()
    spark.read.parquet(os.path.join(sf_dir, "region.parquet")).write.format(
        "noop"
    ).mode("overwrite").save()

    # min-of-N (default 3): this host shows 5-50x wall-clock swings
    # under CPU throttling, so a single sample is meaningless. Repeats
    # run as full rounds over the query list (temporally separated, so
    # one throttle window can't poison all samples of one query); the
    # per-query minimum is the best available estimate of true cost.
    repeats = int(os.environ.get("SPARK_GRAFT_BENCH_REPEATS", "3"))
    samples: dict[str, list[float]] = {name: [] for name in HEADLINE}
    for _ in range(repeats):
        for name in HEADLINE:
            fn = specs[name].fn
            spark.catalog.clearCache()  # each query pays for (only) its own caches
            t0 = time.time()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            samples[name].append(round(time.time() - t0, 3))

    timings = {name: min(ts) for name, ts in samples.items()}
    # per-query [min, median, max]: throttle noise shows up as a
    # median/max far above min, visible in the artifact itself
    spread = {
        name: [min(ts), round(statistics.median(ts), 3), max(ts)]
        for name, ts in samples.items()
    }
    total = round(sum(timings.values()), 3)
    sf_num = float(sf) if sf.replace(".", "").isdigit() else sf
    # Full detail to a committed side file: the driver's BENCH artifact
    # keeps only the last 2000 chars of stdout, so the printed line must
    # stay compact (timings only) or early queries' numbers are lost.
    detail = {
        "metric": "headline_queries_total_wall",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "spread": spread,
        "samples": samples,
        "repeats": repeats,
        "sf": sf_num,
    }
    try:
        Path(__file__).resolve().parent.joinpath("BENCH_DETAIL.json").write_text(
            json.dumps(detail, indent=1) + "\n"
        )
    except OSError:
        pass  # read-only checkout: the stdout line still carries the timings
    # Key order matters: the driver artifact keeps only the LAST 2000
    # chars of stdout, so the headline totals go at the END of the line
    # — if the queries map ever outgrows the cap, truncation eats early
    # per-query entries (recoverable from BENCH_DETAIL.json), never the
    # metric/value/sf summary.
    print(
        json.dumps(
            {
                "queries": timings,
                "metric": "headline_queries_total_wall",
                "unit": "sec",
                "sf": sf_num,
                "value": total,
            },
            separators=(",", ":"),
        )
    )


if __name__ == "__main__":
    main()
