"""Quality tests for the LLM-data-pipeline operators: the approximate
paths (MinHash LSH, SimHash, hyperplane-LSH ANN) validated against
their exact counterparts.
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from stream_processing_test_spark.registry import all_queries

SF = "/root/testdata/sf0.01"


def _q(name):
    return all_queries()[name]


def test_minhash_recall_against_exact_jaccard(spark):
    """Banded MinHash must recover (almost) every exact-Jaccard>=0.8
    pair — at the 8x4 banding s-curve, pairs at j>=0.9 collide with
    probability >1-1e-4."""
    exact = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in _q("dedup_ngram_jaccard").fn(spark, SF).collect()
    }
    approx = {
        (r["doc_a"], r["doc_b"]): r["est_jaccard"]
        for r in _q("dedup_minhash_lsh").fn(spark, SF).collect()
    }
    high = {p for p, j in exact.items() if j >= 0.9}
    assert high, "fixture should contain planted near-duplicates"
    recall = len(high & set(approx)) / len(high)
    assert recall >= 0.9, f"minhash recall {recall:.2f} over {len(high)} pairs"


def test_minhash_estimates_close_to_exact(spark):
    exact = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in _q("dedup_ngram_jaccard").fn(spark, SF).collect()
    }
    approx = {
        (r["doc_a"], r["doc_b"]): r["est_jaccard"]
        for r in _q("dedup_minhash_lsh").fn(spark, SF).collect()
    }
    common = set(exact) & set(approx)
    assert common
    for p in common:
        assert abs(exact[p] - approx[p]) < 0.25, (p, exact[p], approx[p])


def test_simhash_finds_near_duplicates(spark):
    """SimHash (hamming<=3) pairs should be a plausible near-dup set:
    non-empty on the planted-dup fixture and strongly overlapping the
    exact-Jaccard high-similarity pairs."""
    sim = {(r["doc_a"], r["doc_b"]) for r in _q("dedup_simhash").fn(spark, SF).collect()}
    exact = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in _q("dedup_ngram_jaccard").fn(spark, SF).collect()
    }
    assert sim
    overlap = sum(1 for p in sim if exact.get(p, 0) >= 0.5)
    assert overlap / len(sim) >= 0.8


def test_ann_lsh_recall_at_k(spark):
    brute = _q("ann_cosine_topk").fn(spark, SF).collect()
    lsh = _q("ann_lsh_topk").fn(spark, SF).collect()
    top3 = {
        (r["query_id"], r["neighbor_id"]) for r in brute if r["rk"] <= 3
    }
    got = {(r["query_id"], r["neighbor_id"]) for r in lsh}
    recall = len(top3 & got) / len(top3)
    assert recall >= 0.6, f"ANN recall@3 {recall:.2f}"


def test_multimodal_features_deterministic(spark):
    a = _q("multimodal_features").fn(spark, SF).collect()
    b = _q("multimodal_features").fn(spark, SF).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    assert {r["media_type"] for r in a} == {"image", "audio", "video"}
