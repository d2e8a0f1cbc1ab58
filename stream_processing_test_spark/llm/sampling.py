"""Deterministic corpus sampling and source mixing.

A 100 TB training-data pipeline never samples with ``rand()`` — a
resumable, auditable pipeline needs the SAME documents selected on
every run, on every executor, after every retry. The standard trick is
a hash gate: keep a row iff the first 16 bits of ``md5(key)`` fall
under ``rate * 2^16``. md5 is identical everywhere (unlike engine
hash() builtins), the decision is a pure per-row map (no shuffle, no
state), and the threshold is a 4-hex-char string compare — cheap and
whole-stage-codegen'd.

``stratified_sample`` applies per-language rates (downsample dominant
languages, keep the tail); ``source_mixing`` audits per-source target
weights vs achieved rates — the report a mixing step emits before a
training run.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from stream_processing_test_spark.registry import register
from stream_processing_test_spark.tables import load

# language -> sampling rate; threshold = hex(floor(rate * 0x10000))
LANG_RATES: dict[str, float] = {
    "en": 0.5,   # dominant language downsampled
    "zh": 0.2,
    "es": 0.2,
    "de": 0.2,
    "fr": 0.2,
}
DEFAULT_RATE = 0.1  # unknown languages: keep a trickle, never drop to 0

# source weights for the mixing audit (high-quality sources upweighted)
HIGH_QUALITY_SOURCES = tuple(f"src{i}" for i in range(10))
HQ_RATE, LQ_RATE = 0.75, 0.25


def _hex_threshold(rate: float) -> str:
    # rate >= 1.0 would format as the 5-char '10000', and the 4-char
    # lexicographic compare would then keep only ~6% (hashes starting
    # '0') — silently, and identically on Spark and oracle sides, so no
    # cross-check would ever catch it. Fail loudly instead; a keep-all
    # gate should skip the filter, not encode 100% as a threshold.
    if not 0.0 <= rate < 1.0:
        raise ValueError(f"sampling rate must be in [0, 1), got {rate}")
    return format(int(rate * 0x10000), "04x")


def hash_gate(key: Column) -> Column:
    """First 4 hex chars of md5(key) — uniform in [0, 0x10000); a row
    passes a rate by ``hash_gate(key) < _hex_threshold(rate)``
    (lexicographic compare on lowercase hex == numeric compare)."""
    return F.substring(F.md5(key.cast("string")), 1, 4)


_SAMPLE_CASE_SQL = "CASE lang " + " ".join(
    f"WHEN '{lang}' THEN '{_hex_threshold(rate)}'"
    for lang, rate in LANG_RATES.items()
) + f" ELSE '{_hex_threshold(DEFAULT_RATE)}' END"

_SAMPLE_ORACLE = f"""
SELECT CAST(doc_id AS BIGINT) AS doc_id, lang, source
FROM documents
WHERE substring(md5(CAST(doc_id AS VARCHAR)), 1, 4) < {_SAMPLE_CASE_SQL}
"""


def sample_keep_gate() -> Column:
    """Boolean expression: does this (doc_id, lang) row clear its
    language's deterministic sampling gate? Shared by the standalone
    ``stratified_sample`` query and the fused curation pipeline."""
    threshold = F.lit(_hex_threshold(DEFAULT_RATE))
    for lang, rate in LANG_RATES.items():
        threshold = F.when(
            F.col("lang") == lang, F.lit(_hex_threshold(rate))
        ).otherwise(threshold)
    return hash_gate(F.col("doc_id")) < threshold


@register(
    "stratified_sample", oracle=_SAMPLE_ORACLE, survey_ops="§7-text,P6,F12", tier=0
)
def stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language deterministic sample of ``documents``: keep a doc
    iff md5(doc_id)'s 16-bit prefix clears the language's rate. Pure
    map pass — filters push to the scan, no shuffle, and the kept set
    is bit-identical across runs/engines (the oracle recomputes it
    independently in DuckDB)."""
    docs = load(spark, sf_dir, "documents")
    return docs.filter(sample_keep_gate()).select("doc_id", "lang", "source")


_MIX_ORACLE = f"""
WITH gated AS (
    SELECT source,
           CASE WHEN source IN {HIGH_QUALITY_SOURCES} THEN {HQ_RATE} ELSE {LQ_RATE} END AS target_rate,
           substring(md5(CAST(doc_id AS VARCHAR)), 1, 4)
             < CASE WHEN source IN {HIGH_QUALITY_SOURCES}
                    THEN '{_hex_threshold(HQ_RATE)}'
                    ELSE '{_hex_threshold(LQ_RATE)}' END AS kept
    FROM documents
)
SELECT source,
       ROUND(ANY_VALUE(target_rate), 2) AS target_rate,
       CAST(COUNT(*) AS BIGINT) AS n_total,
       CAST(SUM(CASE WHEN kept THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       ROUND(SUM(CASE WHEN kept THEN 1 ELSE 0 END) / CAST(COUNT(*) AS DOUBLE), 4) AS achieved_rate
FROM gated GROUP BY source
"""


@register(
    "source_mixing", oracle=_MIX_ORACLE, survey_ops="§7-text,A1,A7", tier=0
)
def source_mixing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Source-mixing audit: per source, the target weight, total docs,
    docs the deterministic gate keeps, and the achieved rate. One
    map pass + one partial-aggregated groupBy on source."""
    docs = load(spark, sf_dir, "documents")
    is_hq = F.col("source").isin(*HIGH_QUALITY_SOURCES)
    target = F.when(is_hq, F.lit(HQ_RATE)).otherwise(F.lit(LQ_RATE))
    gate = F.when(
        is_hq,
        hash_gate(F.col("doc_id")) < _hex_threshold(HQ_RATE),
    ).otherwise(hash_gate(F.col("doc_id")) < _hex_threshold(LQ_RATE))
    return (
        docs.select("source", target.alias("target_rate"), gate.alias("kept"))
        .groupBy("source")
        .agg(
            F.round(F.any_value("target_rate"), 2).alias("target_rate"),
            F.count("*").alias("n_total"),
            F.sum(F.col("kept").cast("long")).alias("n_kept"),
            F.round(
                F.sum(F.col("kept").cast("long")) / F.count("*"), 4
            ).alias("achieved_rate"),
        )
    )


# Temperature for multilingual sampling weights: p_l ∝ n_l^ALPHA
# (Conneau & Lample 2019 §3.1 / XLM-R's alpha=0.3-0.7 band) —
# upsamples tail languages relative to raw token share.
SAMPLING_ALPHA = 0.7

_LANG_WEIGHTS_ORACLE = f"""
WITH per_lang AS (
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(len(regexp_split_to_array(trim(text), '\\s+'))) AS BIGINT) AS n_tokens
    FROM documents WHERE length(trim(text)) > 0
    GROUP BY lang
),
w AS (
    SELECT lang, n_docs, n_tokens,
           CAST(floor(pow(CAST(n_tokens AS DOUBLE), {SAMPLING_ALPHA}) * 1000000.0 + 0.5) AS BIGINT) AS weight_micro
    FROM per_lang
)
SELECT lang, n_docs, n_tokens, weight_micro,
       ROUND(CAST(weight_micro AS DOUBLE) / (SELECT SUM(weight_micro) FROM w), 6) AS sample_prob
FROM w
"""


@register(
    "lang_sampling_weights",
    oracle=_LANG_WEIGHTS_ORACLE,
    survey_ops="§7-text,A1,A7,F6",
    tier=0,
)
def lang_sampling_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-smoothed multilingual sampling weights: per
    language, raw doc/token counts and the normalized sampling
    probability ``p_l ∝ n_tokens^0.7`` a training run would draw
    with. The single transcendental (``pow``) is bridged by the
    repo's integer-micro discipline (bm25's idf treatment): both
    engines floor(pow·1e6 + 0.5) to an exact BIGINT, the
    normalizing sum is integer (order-free), and only the final
    ratio is a rounded double. Output is |langs| rows — the
    token-count agg underneath is one partial-aggregated scan."""
    docs = load(spark, sf_dir, "documents").filter(
        F.length(F.trim("text")) > 0
    )
    per_lang = docs.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.sum(F.size(F.split(F.trim(F.col("text")), r"\s+")).cast("long")).alias(
            "n_tokens"
        ),
    )
    w = per_lang.select(
        "lang",
        "n_docs",
        "n_tokens",
        F.floor(
            F.pow(F.col("n_tokens").cast("double"), F.lit(SAMPLING_ALPHA))
            * 1000000.0
            + 0.5
        )
        .cast("long")
        .alias("weight_micro"),
    )
    # |langs| rows: the scalar total broadcasts (a 1-row agg crossJoin,
    # the TPC-H scalar-subquery idiom used throughout operators/tpch.py)
    total = w.agg(F.sum("weight_micro").alias("w_total"))
    return w.crossJoin(F.broadcast(total)).select(
        "lang",
        "n_docs",
        "n_tokens",
        "weight_micro",
        F.round(
            F.col("weight_micro").cast("double") / F.col("w_total"), 6
        ).alias("sample_prob"),
    )


# Exact per-class quota (class-balanced subset): langs above the quota
# are cut to exactly TARGET_PER_CLASS docs, smaller langs keep
# everything. 64 splits the fixture non-trivially (sf0.01 per-lang
# counts 64-218).
TARGET_PER_CLASS = 64

_BALANCED_ORACLE = f"""
WITH ranked AS (
    SELECT doc_id, lang, source,
           ROW_NUMBER() OVER (
               PARTITION BY lang
               ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
    FROM documents
)
SELECT CAST(doc_id AS BIGINT) AS doc_id, lang, source,
       CAST(rk AS BIGINT) AS rk
FROM ranked WHERE rk <= {TARGET_PER_CLASS}
"""


@register(
    "class_balanced_sample",
    oracle=_BALANCED_ORACLE,
    survey_ops="§7-text,W1,A8",
    tier=0,
)
def class_balanced_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact per-class quota sampling: each language keeps its
    ``TARGET_PER_CLASS`` smallest-md5 documents — the class-balanced
    subset builder (eval sets, per-language probes, balanced
    fine-tuning mixes). Distinct from the RATE-based gates above:
    ``stratified_sample`` keeps a deterministic *fraction* (count
    drifts with corpus size); this keeps an exact *count* per class,
    and the md5 ordering makes the chosen set stable under corpus
    GROWTH in expectation-free fashion — a newly ingested doc only
    displaces the current rank-``TARGET_PER_CLASS`` member if its
    hash is smaller, never reshuffling the whole selection the way a
    rate re-fit would.

    Scale: one rank window per class. Quotas are small by purpose
    (the output is ``|classes| × TARGET_PER_CLASS`` rows), so at
    extreme per-class cardinality the deployment refinement is the
    standard two-pass cut — pre-filter on a hash prefix bound sized
    from approximate class counts, then rank only the survivors —
    same contract, same output (documented, not needed at any
    fixture/ladder size)."""
    docs = load(spark, sf_dir, "documents")
    from pyspark.sql import Window

    w = Window.partitionBy("lang").orderBy(
        F.md5(F.col("doc_id").cast("string")), F.col("doc_id")
    )
    return (
        docs.select(
            "doc_id",
            "lang",
            "source",
            F.row_number().over(w).cast("long").alias("rk"),
        )
        .filter(F.col("rk") <= TARGET_PER_CLASS)
    )
