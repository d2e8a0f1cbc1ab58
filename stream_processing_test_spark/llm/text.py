"""Text-analysis operators over ``documents`` — the per-document
feature extraction stage of a training-data pipeline. All pure
expression pipelines (whole-stage codegen; zero Python), all
oracle-checked.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from stream_processing_test_spark.registry import register
from stream_processing_test_spark.tables import load

_TOKEN_ORACLE = """
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS INT) AS n_tokens,
       CAST(length(text) AS INT) AS n_chars,
       ROUND(CAST(length(text) AS DOUBLE) / len(regexp_split_to_array(trim(text), '\\s+')), 4) AS chars_per_token
FROM documents
WHERE length(trim(text)) > 0
"""


@register(
    "token_count", oracle=_TOKEN_ORACLE, survey_ops="§7-text,F5,F6", tier=0
)
def token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitespace token counting (the cheap proxy for BPE token
    budgeting in corpus triage). Identical split semantics both sides:
    trim, then split on runs of whitespace."""
    docs = load(spark, sf_dir, "documents")
    toks = F.split(F.trim(F.col("text")), r"\s+")
    return docs.filter(F.length(F.trim("text")) > 0).select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        F.length("text").cast("int").alias("n_chars"),
        F.round(F.length("text").cast("double") / F.size(toks), 4).alias(
            "chars_per_token"
        ),
    )


def _occurrences(col: Column, marker: str) -> Column:
    """Number of times ``marker`` occurs in ``col`` — computed by
    length difference (portable: identical in DuckDB SQL)."""
    return (
        (F.length(col) - F.length(F.replace(col, F.lit(marker), F.lit(""))))
        / len(marker)
    ).cast("int")


def _sql_occurrences(marker: str) -> str:
    return (
        f"CAST((length(text) - length(replace(text, '{marker}', ''))) / {len(marker)} AS INT)"
    )


# Marker tokens per "language" — the heuristic n-gram scorer. The
# synthetic corpus draws from one vocabulary, so the heuristic's
# *decision* is arbitrary; what matters (and is oracle-checked) is that
# the scoring + argmax-with-precedence semantics are deterministic.
LANG_MARKERS = {
    "en": "the",
    "es": "stream",
    "de": "window",
    "fr": "hash",
}

# Shared oracle fragments: the scored CTE and the argmax CASE are
# composed verbatim by BOTH the per-document lang_id_ngram oracle and
# the corpus-level lang_mismatch_audit oracle, so the two can never
# disagree on what "predicted language" means.
_LANG_SCORED_CTE = f"""scored AS (
    SELECT doc_id, lang AS labeled_lang, source,
           {_sql_occurrences('the')} AS m_en,
           {_sql_occurrences('stream')} AS m_es,
           {_sql_occurrences('window')} AS m_de,
           {_sql_occurrences('hash')} AS m_fr
    FROM documents
)"""
_LANG_PRED_CASE = """CASE WHEN m_en >= m_es AND m_en >= m_de AND m_en >= m_fr THEN 'en'
            WHEN m_es >= m_de AND m_es >= m_fr THEN 'es'
            WHEN m_de >= m_fr THEN 'de'
            ELSE 'fr' END"""

_LANG_ORACLE = f"""
WITH {_LANG_SCORED_CTE}
SELECT CAST(doc_id AS BIGINT) AS doc_id, labeled_lang,
       {_LANG_PRED_CASE} AS predicted_lang,
       CAST(m_en AS INT) AS m_en, CAST(m_es AS INT) AS m_es,
       CAST(m_de AS INT) AS m_de, CAST(m_fr AS INT) AS m_fr
FROM scored
"""


def lang_marker_counts() -> dict[str, Column]:
    """Per-language marker-occurrence expressions over ``text`` — the
    single Spark-side definition behind ``lang_id_ngram`` and
    ``lang_mismatch_audit`` (SQL twin: ``_LANG_SCORED_CTE``)."""
    t = F.col("text")
    return {k: _occurrences(t, v) for k, v in LANG_MARKERS.items()}


def predicted_lang_expr(m: dict[str, Column]) -> Column:
    """Argmax-with-precedence over the marker counts (en > es > de >
    fr on ties) — the Spark twin of ``_LANG_PRED_CASE``."""
    return (
        F.when(
            (m["en"] >= m["es"]) & (m["en"] >= m["de"]) & (m["en"] >= m["fr"]), "en"
        )
        .when((m["es"] >= m["de"]) & (m["es"] >= m["fr"]), "es")
        .when(m["de"] >= m["fr"], "de")
        .otherwise("fr")
    )


@register(
    "lang_id_ngram", oracle=_LANG_ORACLE, survey_ops="§7-text,F12", tier=0
)
def lang_id_ngram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic language ID: count marker-n-gram occurrences per
    language, argmax with fixed precedence (en > es > de > fr on
    ties). Pure string expressions — at corpus scale this is a
    single map-side pass, no shuffle."""
    docs = load(spark, sf_dir, "documents")
    m = lang_marker_counts()
    predicted = predicted_lang_expr(m)
    return docs.select(
        "doc_id",
        F.col("lang").alias("labeled_lang"),
        predicted.alias("predicted_lang"),
        m["en"].alias("m_en"),
        m["es"].alias("m_es"),
        m["de"].alias("m_de"),
        m["fr"].alias("m_fr"),
    )


_LANG_AUDIT_ORACLE = f"""
WITH {_LANG_SCORED_CTE},
pred AS (
    SELECT source, labeled_lang,
           {_LANG_PRED_CASE} AS predicted_lang
    FROM scored
)
SELECT source, labeled_lang,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(CASE WHEN predicted_lang <> labeled_lang THEN 1 ELSE 0 END) AS BIGINT) AS n_mismatch,
       ROUND(SUM(CASE WHEN predicted_lang <> labeled_lang THEN 1 ELSE 0 END) * 1.0 / COUNT(*), 4) AS mismatch_rate
FROM pred GROUP BY source, labeled_lang
"""


@register(
    "lang_mismatch_audit",
    oracle=_LANG_AUDIT_ORACLE,
    survey_ops="§7-text,A1,A7,F12",
    tier=0,
)
def lang_mismatch_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Label-vs-classifier language audit (the CCNet-style curation
    check): re-classify every document with the marker heuristic and
    report, per (source, labeled_lang), how often the classifier
    disagrees with the stored label — the signal that a source's
    language metadata is untrustworthy and its docs need re-routing
    before language-stratified sampling.

    Shares the marker-count and argmax expressions with
    ``lang_id_ngram`` (Spark: :func:`lang_marker_counts` /
    :func:`predicted_lang_expr`; SQL: ``_LANG_SCORED_CTE`` /
    ``_LANG_PRED_CASE``), so the audit can never drift from the
    classifier it audits.

    Plan shape at scale: one map pass (string expressions, no UDF)
    into a partial-aggregated groupBy on (source, labeled_lang) —
    output cardinality is |sources| × |langs|, so the shuffle moves
    combiner rows, not documents."""
    docs = load(spark, sf_dir, "documents")
    m = lang_marker_counts()
    mismatch = (predicted_lang_expr(m) != F.col("lang")).cast("long")
    return (
        docs.select(F.col("source"), F.col("lang").alias("labeled_lang"), mismatch.alias("mm"))
        .groupBy("source", "labeled_lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("mm").alias("n_mismatch"),
            F.round(F.sum("mm") / F.count("*"), 4).alias("mismatch_rate"),
        )
    )


# Reusable oracle fragments — the curation-pipeline oracle
# (llm/corpus.py) composes these verbatim so the gate can never drift
# from the standalone quality query.
QUALITY_FEATS_CTE = """feats AS (
    SELECT doc_id, source,
           CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS INT) AS n_tokens,
           CAST(length(text) AS INT) AS n_chars,
           CAST((length(text) - length(replace(text, ' ', ''))) AS INT) AS n_spaces,
           CAST((length(text) - length(replace(replace(replace(text, '.', ''), ',', ''), '!', ''))) AS INT) AS n_punct,
           CAST((length(text) - length(replace(text, 'the', ''))) / 3 AS INT) AS n_stop
    FROM documents WHERE length(trim(text)) > 0
)"""
QUALITY_PREDICATE = """(n_tokens BETWEEN 10 AND 1000)
            AND (CAST(n_punct AS DOUBLE) / n_chars) < 0.1
            AND (CAST(n_stop AS DOUBLE) / n_tokens) > 0.01"""

_QUALITY_ORACLE = f"""
WITH {QUALITY_FEATS_CTE}
SELECT CAST(doc_id AS BIGINT) AS doc_id, n_tokens, n_chars,
       ROUND(CAST(n_punct AS DOUBLE) / n_chars, 4) AS punct_ratio,
       ROUND(CAST(n_stop AS DOUBLE) / n_tokens, 4) AS stopword_ratio,
       CAST({QUALITY_PREDICATE} AS BOOLEAN) AS passes_quality
FROM feats
"""


def quality_feature_exprs() -> dict[str, "F.Column"]:
    """The RAW Gopher quality feature sub-expressions over ``text`` —
    the single definition behind :func:`quality_columns` (and thus
    ``doc_quality_score`` / ``corpus_curation_pipeline``) AND the
    per-source calibration in llm/packing.py. The SQL twin of each is
    a column of ``QUALITY_FEATS_CTE``; changing a feature means
    changing both, once, here."""
    t = F.col("text")
    return {
        "n_tokens": F.size(F.split(F.trim(t), r"\s+")),
        "n_chars": F.length(t),
        "n_punct": F.length(t)
        - F.length(
            F.replace(
                F.replace(F.replace(t, F.lit("."), F.lit("")), F.lit(","), F.lit("")),
                F.lit("!"),
                F.lit(""),
            )
        ),
        "n_stop": (
            (F.length(t) - F.length(F.replace(t, F.lit("the"), F.lit("")))) / 3
        ).cast("int"),
    }


def quality_columns() -> dict[str, "F.Column"]:
    """The Gopher-style quality feature expressions over a ``text``
    column, shared by the standalone ``doc_quality_score`` query and
    the fused ``corpus_curation_pipeline`` scan — expression-level
    reuse, so the composed pipeline can never drift from the
    oracle-checked stage."""
    feats = quality_feature_exprs()
    n_tokens, n_chars = feats["n_tokens"], feats["n_chars"]
    n_punct, n_stop = feats["n_punct"], feats["n_stop"]
    punct_ratio = n_punct.cast("double") / n_chars
    stop_ratio = n_stop.cast("double") / n_tokens
    return {
        "n_tokens": n_tokens,
        "n_chars": n_chars.cast("int"),
        "punct_ratio": F.round(punct_ratio, 4),
        "stopword_ratio": F.round(stop_ratio, 4),
        "passes_quality": (
            n_tokens.between(10, 1000) & (punct_ratio < 0.1) & (stop_ratio > 0.01)
        ),
    }


@register(
    "doc_quality_score", oracle=_QUALITY_ORACLE, survey_ops="§7-text,A7,F12", tier=0
)
def doc_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style quality gates: token-count band, punctuation
    ratio, stopword ratio → boolean pass. The exact thresholds are
    corpus policy; the operator shape (ratio features + band
    predicates, one map pass) is the production pattern."""
    docs = load(spark, sf_dir, "documents").filter(F.length(F.trim("text")) > 0)
    q = quality_columns()
    return docs.select(
        "doc_id", *[expr.alias(name) for name, expr in q.items()]
    )


_FP_ORACLE = """
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       md5(lower(trim(text))) AS fingerprint,
       substr(md5(lower(trim(text))), 1, 8) AS shard_key
FROM documents
"""


@register(
    "doc_fingerprint", oracle=_FP_ORACLE, survey_ops="§7-text,F10", tier=0
)
def doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Normalized content fingerprint (md5 of lower/trimmed text) plus
    a shard key prefix — the join/partition key for cross-corpus exact
    dedup at scale (hash keys distribute uniformly; no skew)."""
    docs = load(spark, sf_dir, "documents")
    fp = F.md5(F.lower(F.trim(F.col("text"))))
    return docs.select(
        "doc_id",
        fp.alias("fingerprint"),
        F.substring(fp, 1, 8).alias("shard_key"),
    )
