"""Sequence packing and per-source quality calibration — the two
batch-assembly steps between corpus curation and the training run.

- **Sequence packing** (GPT-style): training consumes fixed-length
  token sequences, so the pipeline concatenates documents into a token
  stream and slices it every ``SEQ_LEN`` tokens; documents may span
  slice boundaries. The operator reports, per packed sequence, how
  many documents contribute, how many sit fully inside it, and its
  fill. Packing is SHARDED by construction — the stream restarts at
  every ``(source, doc_id DIV PACK_SHARD_DOCS)`` boundary — so the
  running-sum window partitions are bounded at ``PACK_SHARD_DOCS``
  rows no matter the corpus size: at 100 TB the cumulative sum never
  becomes a single global ordered window (the classic packing
  scale-trap); each shard packs independently and in parallel, which
  is exactly how production packers shard (each writer packs its own
  input split). Fixture doc_ids sit far below one shard, so the shard
  key is 0 there and the semantics reduce to plain per-source packing.
- **Quality calibration**: absolute quality thresholds drift across
  sources (a forum's median doc scores lower than an encyclopedia's),
  so production filters calibrate per source: keep a document iff its
  score clears its OWN source's quantile. Exact quantile via integer
  rank arithmetic — ``keep iff (rank-1)·4 >= (n-1)`` is the
  bottom-quartile cut with ZERO float comparison (both engines
  evaluate the same integers; no percent_rank double at the
  boundary).

Both are pure expression pipelines (whole-stage codegen, no Python)
with DuckDB oracle twins. The reference has no corpus operators
(SURVEY.md §2.9); these extend the engine per the §7 north star.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from stream_processing_test_spark.llm.text import (
    QUALITY_FEATS_CTE,
    quality_feature_exprs,
)
from stream_processing_test_spark.registry import register
from stream_processing_test_spark.tables import load

# Tokens per packed training sequence. Production values are 2k-8k;
# 256 splits the fixture corpus non-trivially (sf0.01: ~40-token docs,
# 25 docs/source -> ~4 sequences per source).
SEQ_LEN = 256

# Documents per packing shard: the running-sum window partition is
# (source, doc_id DIV PACK_SHARD_DOCS), so no partition ever holds
# more than this many rows — the knob that keeps the window's sort
# executor-local at any corpus size. 2^17 docs ≈ a few hundred MB of
# token counts per shard: far under executor memory, far over any
# fixture (where the key is constantly 0).
PACK_SHARD_DOCS = 1 << 17

_PACK_ORACLE = f"""
WITH toks AS (
    SELECT doc_id, source,
           CAST(doc_id // {PACK_SHARD_DOCS} AS BIGINT) AS pack_shard,
           CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS BIGINT) AS n_tok
    FROM documents WHERE length(trim(text)) > 0
),
cum AS (
    SELECT source, pack_shard, n_tok,
           CAST(SUM(n_tok) OVER (PARTITION BY source, pack_shard ORDER BY doc_id
                                 ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_end
    FROM toks
),
spans AS (
    SELECT source, pack_shard, cum_end, cum_end - n_tok AS cum_start,
           (cum_end - n_tok) // {SEQ_LEN} AS first_seq,
           (cum_end - 1) // {SEQ_LEN} AS last_seq
    FROM cum
),
x AS (
    SELECT source, pack_shard, cum_start, cum_end, first_seq, last_seq,
           unnest(generate_series(first_seq, last_seq)) AS seq_id
    FROM spans
),
agg AS (
    SELECT source, pack_shard, seq_id,
           COUNT(*) AS n_docs,
           SUM(CASE WHEN first_seq = last_seq THEN 1 ELSE 0 END) AS n_full_docs,
           SUM(LEAST(cum_end, (seq_id + 1) * {SEQ_LEN})
               - GREATEST(cum_start, seq_id * {SEQ_LEN})) AS n_tokens
    FROM x GROUP BY source, pack_shard, seq_id
)
SELECT source, CAST(pack_shard AS BIGINT) AS pack_shard,
       CAST(seq_id AS BIGINT) AS seq_id,
       CAST(n_docs AS BIGINT) AS n_docs,
       CAST(n_full_docs AS BIGINT) AS n_full_docs,
       CAST(n_tokens AS BIGINT) AS n_tokens,
       ROUND(CAST(n_tokens AS DOUBLE) / {SEQ_LEN}, 4) AS fill_frac
FROM agg
"""


@register(
    "sequence_pack",
    oracle=_PACK_ORACLE,
    survey_ops="§7-text,A1,A8,W2",
    tier=0,
)
def sequence_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy contiguous packing of the (source, shard)-ordered token
    stream into ``SEQ_LEN``-token training sequences; per-sequence
    document counts, boundary-crossing counts, and fill fraction.

    Plan shape: one pruned scan (doc_id, source, text), one shuffle on
    the bounded ``(source, pack_shard)`` window key, a map-side
    explode of each document's spanned-sequence range (a document
    spans ``1 + (n_tok-1)//SEQ_LEN`` sequences on average ≈ 1), and a
    partial-agg rollup on the same key prefix — the explode output is
    already co-partitioned by (source, pack_shard), so AQE keeps the
    final agg's exchange trivial. Whitespace tokenization matches
    ``token_count`` (llm/text.py) exactly; integer DIV throughout
    (non-negative operands, so Spark ``DIV`` == DuckDB ``//``)."""
    docs = load(spark, sf_dir, "documents").filter(
        F.length(F.trim("text")) > 0
    )
    n_tok = F.size(F.split(F.trim(F.col("text")), r"\s+")).cast("long")
    toks = docs.select(
        "doc_id",
        "source",
        F.expr(f"CAST(doc_id DIV {PACK_SHARD_DOCS} AS BIGINT)").alias(
            "pack_shard"
        ),
        n_tok.alias("n_tok"),
    )
    w = (
        Window.partitionBy("source", "pack_shard")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    spans = toks.select(
        "source",
        "pack_shard",
        F.sum("n_tok").over(w).alias("cum_end"),
        "n_tok",
    ).selectExpr(
        "source",
        "pack_shard",
        "cum_end",
        "cum_end - n_tok AS cum_start",
        f"(cum_end - n_tok) DIV {SEQ_LEN} AS first_seq",
        f"(cum_end - 1) DIV {SEQ_LEN} AS last_seq",
    )
    exploded = spans.select(
        "source",
        "pack_shard",
        "cum_start",
        "cum_end",
        "first_seq",
        "last_seq",
        F.explode(F.sequence("first_seq", "last_seq")).alias("seq_id"),
    )
    return (
        exploded.groupBy("source", "pack_shard", "seq_id")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(
                F.when(F.col("first_seq") == F.col("last_seq"), 1).otherwise(0)
            ).alias("n_full_docs"),
            F.sum(
                F.least(F.col("cum_end"), (F.col("seq_id") + 1) * SEQ_LEN)
                - F.greatest(F.col("cum_start"), F.col("seq_id") * SEQ_LEN)
            ).alias("n_tokens"),
        )
        .select(
            "source",
            "pack_shard",
            "seq_id",
            "n_docs",
            "n_full_docs",
            "n_tokens",
            F.round(F.col("n_tokens").cast("double") / SEQ_LEN, 4).alias(
                "fill_frac"
            ),
        )
    )


# Bottom-quartile cut: a document is kept iff (rank-1)*4 >= (n-1)
# within its source — the integer-exact form of percent_rank >= 0.25.
CALIB_QUARTILE_NUM = 1  # drop the bottom 1/4
CALIB_QUARTILE_DEN = 4

_CALIB_ORACLE = f"""
WITH {QUALITY_FEATS_CTE},
scored AS (
    SELECT doc_id, source,
           ROUND(CAST(n_stop AS DOUBLE) / n_tokens
                 - CAST(n_punct AS DOUBLE) / n_chars, 6) AS score
    FROM feats
),
ranked AS (
    SELECT doc_id, source, score,
           RANK() OVER (PARTITION BY source ORDER BY score, doc_id) AS rk,
           COUNT(*) OVER (PARTITION BY source) AS n
    FROM scored
)
SELECT source,
       CAST(n AS BIGINT) AS n_docs,
       CAST(SUM(CASE WHEN (rk - 1) * {CALIB_QUARTILE_DEN}
                     >= (n - 1) * {CALIB_QUARTILE_NUM} THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       ROUND(CAST(SUM(CASE WHEN (rk - 1) * {CALIB_QUARTILE_DEN}
                     >= (n - 1) * {CALIB_QUARTILE_NUM} THEN 1 ELSE 0 END) AS DOUBLE) / n, 4) AS kept_frac,
       MIN(CASE WHEN (rk - 1) * {CALIB_QUARTILE_DEN}
                >= (n - 1) * {CALIB_QUARTILE_NUM} THEN score END) AS threshold_score
FROM ranked
GROUP BY source, n
"""


@register(
    "quality_calibrated_filter",
    oracle=_CALIB_ORACLE,
    survey_ops="§7-text,A1,A7,W1",
    tier=0,
)
def quality_calibrated_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source quantile-calibrated quality gate: score every
    document (stopword ratio minus punctuation ratio — the continuous
    composite of ``doc_quality_score``'s gates), rank it WITHIN its
    source, and keep the top three quartiles. Emits the per-source
    audit a calibrated filter publishes before a run: corpus size,
    kept count/fraction, and the realized threshold score (the
    smallest kept score — the number a fixed-threshold filter would
    have needed per source).

    The quantile is exact, not approximate: ranks and counts are
    integers and the cut compares ``(rank-1)·4 >= (n-1)`` — replayed
    verbatim by the oracle, no percent_rank float at the boundary.
    Scale: one shuffle on source for the rank window (a 100 TB corpus
    has bounded sources; per-source rank at extreme skew would move
    to a two-pass histogram cut, same contract), then a partial-agg
    rollup on the window's own partitioning."""
    docs = load(spark, sf_dir, "documents").filter(
        F.length(F.trim("text")) > 0
    )
    feats = quality_feature_exprs()
    scored = docs.select(
        "doc_id",
        "source",
        F.round(
            feats["n_stop"].cast("double") / feats["n_tokens"]
            - feats["n_punct"].cast("double") / feats["n_chars"],
            6,
        ).alias("score"),
    )
    ranked = scored.select(
        "source",
        "score",
        F.rank()
        .over(Window.partitionBy("source").orderBy("score", "doc_id"))
        .alias("rk"),
        F.count("*").over(Window.partitionBy("source")).alias("n"),
    )
    kept = (F.col("rk") - 1) * CALIB_QUARTILE_DEN >= (
        F.col("n") - 1
    ) * CALIB_QUARTILE_NUM
    return (
        ranked.groupBy("source", "n")
        .agg(
            F.sum(F.when(kept, 1).otherwise(0)).alias("n_kept"),
            F.min(F.when(kept, F.col("score"))).alias("threshold_score"),
        )
        .select(
            "source",
            F.col("n").cast("long").alias("n_docs"),
            F.col("n_kept").cast("long").alias("n_kept"),
            F.round(
                F.col("n_kept").cast("double") / F.col("n"), 4
            ).alias("kept_frac"),
            "threshold_score",
        )
    )
