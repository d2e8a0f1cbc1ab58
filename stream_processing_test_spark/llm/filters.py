"""Corpus-hygiene filter operators over ``documents``: repetition
statistics, PII / blockword redaction, and duplicated-substring
coverage.

These are the cleaning passes a training-data pipeline runs between
ingestion and tokenization:

- **Repetition stats** (Gopher-style, Rae et al. 2021 §A1.1): documents
  dominated by a few tokens or repeated bigrams are low-quality
  (boilerplate, keyword stuffing, degenerate generations). Features:
  type-token ratio, top-unigram fraction, top-bigram fraction.
- **PII redaction**: regex masking of emails / phone numbers / IPv4
  addresses plus a dictionary blocklist (stand-in for a name
  gazetteer). Counts are computed on the raw text; the redacted text is
  emitted alongside.
- **Duplicated-substring coverage** (Lee et al. 2021 "Deduplicating
  Training Data Makes Language Models Better"): the fraction of a
  document's token 8-grams that occur more than once in the corpus —
  the per-document evidence behind exact-substring dedup.

All three are pure DataFrame expression pipelines (whole-stage
codegen; no Python in any plan) with DuckDB oracle twins. The
reference has no corpus operators at all (SURVEY.md §2.9 — its UDF
surface is empty); these extend the engine per the §7 north star.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from stream_processing_test_spark.llm.hashing import phash, phash_sql
from stream_processing_test_spark.registry import register
from stream_processing_test_spark.tables import load

# ---------------------------------------------------------------------------
# Repetition statistics (Gopher repetition rules)
# ---------------------------------------------------------------------------

# Thresholds split the synthetic corpus non-trivially (sf0.01: TTR
# spans 0.28-1.0 with median 0.46; top-unigram 0.05-0.30 median 0.09;
# top-bigram 0.01-0.17 median 0.03). Production values are corpus
# policy; the operator shape is what matters.
MIN_TTR = 0.3
MAX_TOP_TOKEN_FRAC = 0.2
MAX_TOP_BIGRAM_FRAC = 0.1

_REPETITION_ORACLE = f"""
WITH toks AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
uni AS (SELECT doc_id, unnest(w) AS tok FROM toks),
ucnt AS (SELECT doc_id, tok, COUNT(*) AS c FROM uni GROUP BY doc_id, tok),
ustat AS (
    SELECT doc_id, SUM(c) AS n_tokens, COUNT(*) AS distinct_tokens,
           MAX(c) AS top_c
    FROM ucnt GROUP BY doc_id
),
big AS (
    SELECT doc_id,
           unnest(list_transform(range(1, len(w)), i -> w[i] || ' ' || w[i+1])) AS bg
    FROM toks WHERE len(w) >= 2
),
bcnt AS (SELECT doc_id, bg, COUNT(*) AS c FROM big GROUP BY doc_id, bg),
bstat AS (SELECT doc_id, SUM(c) AS n_bigrams, MAX(c) AS top_bc FROM bcnt GROUP BY doc_id)
SELECT CAST(u.doc_id AS BIGINT) AS doc_id,
       CAST(u.n_tokens AS BIGINT) AS n_tokens,
       CAST(u.distinct_tokens AS BIGINT) AS distinct_tokens,
       ROUND(CAST(u.distinct_tokens AS DOUBLE) / u.n_tokens, 4) AS ttr,
       ROUND(CAST(u.top_c AS DOUBLE) / u.n_tokens, 4) AS top_token_frac,
       ROUND(CAST(b.top_bc AS DOUBLE) / b.n_bigrams, 4) AS top_bigram_frac,
       CAST(
           CAST(u.distinct_tokens AS DOUBLE) / u.n_tokens >= {MIN_TTR}
           AND CAST(u.top_c AS DOUBLE) / u.n_tokens < {MAX_TOP_TOKEN_FRAC}
           AND CAST(b.top_bc AS DOUBLE) / b.n_bigrams < {MAX_TOP_BIGRAM_FRAC}
       AS BOOLEAN) AS passes_repetition
FROM ustat u JOIN bstat b USING (doc_id)
"""


@register(
    "doc_repetition_stats",
    oracle=_REPETITION_ORACLE,
    survey_ops="§7-text,A1,A5,J1",
    tier=0,
)
def doc_repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition features + gate: type-token ratio,
    top-unigram fraction, top-bigram fraction (docs with ≥2 tokens).

    Plan shape at scale: two explode → partial-aggregated
    groupBy(doc_id, gram) → groupBy(doc_id) chains, joined on doc_id.
    Both shuffles key on doc_id-prefixed keys (uniform — doc_id is
    unique), and the per-doc gram counts map-side combine, so shuffle
    volume is Σ distinct grams per doc, not Σ tokens. The pass/fail
    predicates compare unrounded doubles; both engines do exact IEEE
    division of the same integers, so the booleans agree bit-for-bit.
    """
    docs = load(spark, sf_dir, "documents")
    w = F.split(F.col("text"), " ")

    uni = docs.select("doc_id", F.explode(w).alias("tok"))
    ucnt = uni.groupBy("doc_id", "tok").agg(F.count("*").alias("c"))
    ustat = ucnt.groupBy("doc_id").agg(
        F.sum("c").alias("n_tokens"),
        F.count("*").alias("distinct_tokens"),
        F.max("c").alias("top_c"),
    )

    bigrams = F.expr(
        "transform(sequence(0, size(w) - 2), i -> concat(w[i], ' ', w[i+1]))"
    )
    big = (
        docs.select("doc_id", w.alias("w"))
        .filter(F.size("w") >= 2)
        .select("doc_id", F.explode(bigrams).alias("bg"))
    )
    bcnt = big.groupBy("doc_id", "bg").agg(F.count("*").alias("c"))
    bstat = bcnt.groupBy("doc_id").agg(
        F.sum("c").alias("n_bigrams"), F.max("c").alias("top_bc")
    )

    ttr = F.col("distinct_tokens").cast("double") / F.col("n_tokens")
    top_tok = F.col("top_c").cast("double") / F.col("n_tokens")
    top_big = F.col("top_bc").cast("double") / F.col("n_bigrams")
    return ustat.join(bstat, "doc_id").select(
        "doc_id",
        "n_tokens",
        "distinct_tokens",
        F.round(ttr, 4).alias("ttr"),
        F.round(top_tok, 4).alias("top_token_frac"),
        F.round(top_big, 4).alias("top_bigram_frac"),
        (
            (ttr >= MIN_TTR)
            & (top_tok < MAX_TOP_TOKEN_FRAC)
            & (top_big < MAX_TOP_BIGRAM_FRAC)
        ).alias("passes_repetition"),
    )


# ---------------------------------------------------------------------------
# PII / blockword redaction
# ---------------------------------------------------------------------------

# Patterns restricted to syntax RE2 (DuckDB) and java.util.regex
# (Spark) evaluate identically: character classes, bounded repetition,
# \b word boundaries, alternation — no lookaround (RE2 has none).
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_RE = r"\+?[0-9][0-9 -]{7,}[0-9]"
IPV4_RE = r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b"
# Stand-in for a name gazetteer; these tokens occur in the synthetic
# vocabulary, so the redaction path is exercised for real (sf0.01:
# 455/500 docs contain at least one).
BLOCKWORDS = ("customer", "vector")
BLOCK_RE = r"\b(" + "|".join(BLOCKWORDS) + r")\b"

_REDACT_STEPS = (
    (EMAIL_RE, "[EMAIL]", "n_emails"),
    (PHONE_RE, "[PHONE]", "n_phones"),
    (IPV4_RE, "[IP]", "n_ips"),
    (BLOCK_RE, "[NAME]", "n_blockwords"),
)


def _sql_pat(pat: str) -> str:
    return pat.replace("'", "''")


_PII_ORACLE = (
    "SELECT CAST(doc_id AS BIGINT) AS doc_id,\n"
    + ",\n".join(
        f"       CAST(len(regexp_extract_all(text, '{_sql_pat(p)}')) AS INT) AS {alias}"
        for p, _, alias in _REDACT_STEPS
    )
    + ",\n       "
    + "".join("regexp_replace(" for _ in _REDACT_STEPS)
    + "text"
    + "".join(
        f", '{_sql_pat(p)}', '{repl}', 'g')" for p, repl, _ in _REDACT_STEPS
    )
    + " AS redacted_text\nFROM documents"
)


@register(
    "pii_redact", oracle=_PII_ORACLE, survey_ops="§7-text,F12,⊘regex", tier=0
)
def pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII + blockword redaction: per-pattern match counts (on the raw
    text, so counts are independent of redaction order) and the
    sequentially-redacted text (emails → phones → IPv4 → blocklist).

    A single map-side pass — regex evaluation fuses into the scan, no
    shuffle at any scale. The synthetic corpus contains no
    email/phone/IP shaped spans (those paths are pytest-exercised on
    crafted rows — see test_llm_ops.py); the blocklist fires on ~90%
    of documents, so the oracle checks a non-trivial redaction.
    """
    docs = load(spark, sf_dir, "documents")
    counts = [
        F.size(F.regexp_extract_all("text", F.lit(p), F.lit(0)))
        .cast("int")
        .alias(alias)
        for p, _, alias in _REDACT_STEPS
    ]
    redacted = F.col("text")
    for p, repl, _ in _REDACT_STEPS:
        redacted = F.regexp_replace(redacted, p, repl)
    return docs.select("doc_id", *counts, redacted.alias("redacted_text"))


# ---------------------------------------------------------------------------
# Duplicated-substring coverage (exact-substring dedup evidence)
# ---------------------------------------------------------------------------

SUBSTR_N = 8  # token n-gram width (Lee et al. use 50-token windows on
#               real corpora; 8 matches this corpus's 10-99-token docs)
DUP_COVERAGE_FLAG = 0.5  # flag docs with >= 50% duplicated positions

_SUBSTR_GRAM = "||' '||".join(f"w[i+{k}]" for k in range(SUBSTR_N))

_SUBSTR_ORACLE = f"""
WITH toks AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
pos AS (
    SELECT doc_id, w, unnest(range(1, len(w) - {SUBSTR_N - 2})) AS i
    FROM toks WHERE len(w) >= {SUBSTR_N}
),
grams AS (
    SELECT doc_id, {phash_sql(f"({_SUBSTR_GRAM})")} AS gh FROM pos
),
gc AS (SELECT gh, COUNT(*) AS c FROM grams GROUP BY gh)
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_grams,
       CAST(SUM(CASE WHEN gc.c > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_grams,
       ROUND(SUM(CASE WHEN gc.c > 1 THEN 1 ELSE 0 END) * 1.0 / COUNT(*), 4) AS dup_frac,
       CAST(SUM(CASE WHEN gc.c > 1 THEN 1 ELSE 0 END) * 1.0 / COUNT(*) >= {DUP_COVERAGE_FLAG}
            AS BOOLEAN) AS flagged
FROM grams JOIN gc USING (gh)
GROUP BY doc_id
"""


@register(
    "substring_dup_coverage",
    oracle=_SUBSTR_ORACLE,
    survey_ops="§7-dedup,A3,J1",
    tier=0,
)
def substring_dup_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document duplicated-substring coverage: the fraction of a
    document's token {SUBSTR_N}-gram positions whose n-gram occurs
    more than once corpus-wide (counting within-document repeats —
    exactly Lee et al.'s duplicate-span criterion at n-gram
    granularity). Documents shorter than {SUBSTR_N} tokens have no
    positions and are excluded.

    Scale shape: grams travel as portable 60-bit hashes
    (llm/hashing.py), never as strings — the explode emits
    (doc_id, int64) pairs, the global count is a partial-aggregated
    groupBy on the hash (uniform keys), and the coverage join is an
    equi-join on the same hash, so the count exchange is reused for
    the join side. No DF cap is applied — unlike candidate-pair
    generation (llm/dedup.py DF_MAX), coverage needs every position's
    verdict, and the join output stays 1 row per position (it never
    squares). A viral n-gram is a hot key for the count's combiner,
    not for the join (AQE skew-split handles the residual).
    """
    docs = load(spark, sf_dir, "documents")
    w = F.split(F.col("text"), " ")
    gram_expr = F.expr(
        f"transform(sequence(0, size(w) - {SUBSTR_N}), "
        f"i -> concat_ws(' ', slice(w, i + 1, {SUBSTR_N})))"
    )
    grams = (
        docs.select("doc_id", w.alias("w"))
        .filter(F.size("w") >= SUBSTR_N)
        .select("doc_id", F.explode(gram_expr).alias("g"))
        .select("doc_id", phash(F.col("g")).alias("gh"))
    )
    gc = grams.groupBy("gh").agg(F.count("*").alias("c"))
    dup = F.when(F.col("c") > 1, 1).otherwise(0)
    cov = (
        grams.join(gc, "gh")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_grams"),
            F.sum(dup).alias("n_dup_grams"),
        )
    )
    frac = F.col("n_dup_grams") / F.col("n_grams")
    return cov.select(
        "doc_id",
        "n_grams",
        "n_dup_grams",
        F.round(frac, 4).alias("dup_frac"),
        (frac >= DUP_COVERAGE_FLAG).alias("flagged"),
    )


# ---------------------------------------------------------------------------
# Duplicated-span removal (exact-substring dedup, the transform)
# ---------------------------------------------------------------------------

# Canonical-occurrence packing: doc_id * 2^20 + gram start position.
# The min over this single BIGINT is exact and order-free in both
# engines (no struct-min semantics to align); the contract is
# documents under 2^20 tokens (the corpus tops out near 10^2; a 100 TB
# deployment re-chunks longer docs far earlier than that for every
# other operator's sake too).
_SPAN_POS_SHIFT = 1 << 20

_SPAN_GRAM = "||' '||".join(f"w[i+{k + 1}]" for k in range(SUBSTR_N))

_SPAN_ORACLE = f"""
WITH toks AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
pos AS (
    SELECT doc_id, w, unnest(range(0, len(w) - {SUBSTR_N - 1})) AS i
    FROM toks WHERE len(w) >= {SUBSTR_N}
),
occ AS (
    SELECT doc_id, i, {phash_sql(f"({_SPAN_GRAM})")} AS gh FROM pos
),
gc AS (
    SELECT gh, COUNT(*) AS c,
           MIN(doc_id * {_SPAN_POS_SHIFT} + i) AS canon
    FROM occ GROUP BY gh
),
rem_occ AS (
    SELECT o.doc_id, o.i FROM occ o JOIN gc USING (gh)
    WHERE gc.c > 1 AND (o.doc_id * {_SPAN_POS_SHIFT} + o.i) <> gc.canon
),
rem_pos AS (
    SELECT DISTINCT doc_id,
           unnest(generate_series(i, i + {SUBSTR_N - 1})) AS p
    FROM rem_occ
),
tok_pos AS (
    SELECT doc_id, w[p + 1] AS tok, CAST(p AS BIGINT) AS p
    FROM (SELECT doc_id, w, unnest(range(0, len(w))) AS p FROM toks)
),
kept AS (
    SELECT tp.doc_id, tp.p, tp.tok
    FROM tok_pos tp LEFT JOIN rem_pos r
      ON r.doc_id = tp.doc_id AND r.p = tp.p
    WHERE r.doc_id IS NULL
),
agg AS (
    SELECT doc_id, COUNT(*) AS n_kept,
           string_agg(tok, ' ' ORDER BY p) AS cleaned_text
    FROM kept GROUP BY doc_id
)
SELECT CAST(t.doc_id AS BIGINT) AS doc_id,
       CAST(len(t.w) AS BIGINT) AS n_tokens,
       CAST(len(t.w) - COALESCE(a.n_kept, 0) AS BIGINT) AS n_removed,
       ROUND((len(t.w) - COALESCE(a.n_kept, 0)) * 1.0 / len(t.w), 4) AS frac_removed,
       COALESCE(a.cleaned_text, '') AS cleaned_text
FROM toks t LEFT JOIN agg a USING (doc_id)
"""


@register(
    "doc_span_dedup",
    oracle=_SPAN_ORACLE,
    survey_ops="§7-dedup,A2,J1,J2,F4",
    tier=0,
)
def doc_span_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-substring dedup as a TRANSFORM (Lee et al. 2021 §4):
    every occurrence of a corpus-duplicated token ``SUBSTR_N``-gram is
    removed from the text EXCEPT the canonical one (the corpus-wide
    smallest ``(doc_id, position)``), and each document's surviving
    tokens are re-concatenated in order. ``substring_dup_coverage``
    is the evidence side of this operator; this is the edit a
    pipeline actually applies before tokenization. Within-document
    repeats dedup too (the second occurrence in the same doc is
    non-canonical). A token goes when ANY duplicated gram occurrence
    covering it is non-canonical — canonical spans can therefore
    still lose tokens to OVERLAPPING non-canonical spans; that
    asymmetry is inherent to span-level dedup and deterministic here.

    Scale shape: grams travel as 60-bit hashes; the canonical pick is
    a plain partial-aggregated ``min`` over a packed BIGINT (no
    struct-min, no window over the gram key — a viral gram hits the
    combiner, not a single-partition sort); removed positions explode
    only from DUPLICATED occurrences (≤ SUBSTR_N rows each); the
    keep/drop decision is one anti-join on (doc_id, position); and
    the ordered reassembly sorts WITHIN each doc's collected row
    (array_sort of (pos, tok) structs — no global sort). Everything
    is linear in corpus positions.
    """
    from stream_processing_test_spark.session import (
        parallelize_narrow_scan,
    )

    docs = load(spark, sf_dir, "documents")
    w = F.split(F.col("text"), " ")
    # narrow-scan widen BEFORE the md5-per-gram map pass: the r6
    # under-partitioned-scan trap, measured HERE at both ends (x10 /
    # overbudget interleaved A/B, BENCH_NOTES §r11-span-rungs): at 2
    # scan files the widen is 3.7x (56 -> 15 s); at 17 files it is a
    # 6% LOSS (55.0 vs 51.7 s — the raw-doc exchange buys nothing the
    # 17 tasks don't already have). min_partitions = half the session
    # parallelism makes the call trigger only in the genuinely-narrow
    # regime and stay a no-op from half-width up (and always at real
    # scan widths).
    half = max(2, docs.sparkSession.sparkContext.defaultParallelism // 2)
    toks = parallelize_narrow_scan(
        docs.select("doc_id", w.alias("w")), min_partitions=half
    )
    gram_expr = F.expr(
        f"transform(sequence(0, size(w) - {SUBSTR_N}), "
        f"i -> concat_ws(' ', slice(w, i + 1, {SUBSTR_N})))"
    )
    occ = (
        toks.filter(F.size("w") >= SUBSTR_N)
        .select("doc_id", F.posexplode(gram_expr).alias("i", "g"))
        .select("doc_id", "i", phash(F.col("g")).alias("gh"))
    )
    # Contract guard (ADVICE r11): a position at or past the pack
    # shift would alias into another doc_id's key space and silently
    # corrupt canonical selection — fail loudly instead. The branch
    # rides the packing expression itself (an integer compare per
    # occurrence, nothing Catalyst can prune away as unused).
    packed = F.when(
        F.col("i") < _SPAN_POS_SHIFT,
        F.col("doc_id") * _SPAN_POS_SHIFT + F.col("i"),
    ).otherwise(
        F.raise_error(
            F.concat(
                F.lit(
                    "doc_span_dedup: document exceeds the "
                    f"{_SPAN_POS_SHIFT}-token packing contract (doc_id "
                ),
                F.col("doc_id").cast("string"),
                F.lit("); re-chunk long documents first"),
            )
        ).cast("long")
    )
    gc = occ.groupBy("gh").agg(
        F.count("*").alias("c"), F.min(packed).alias("canon")
    )
    rem_occ = occ.join(gc, "gh").filter(
        (F.col("c") > 1) & (packed != F.col("canon"))
    )
    # no distinct: left_anti keeps a left row iff NO right match
    # exists, so duplicate (doc_id, p) rows on the right are harmless
    # in both engines (the oracle's LEFT JOIN ... IS NULL likewise) —
    # deduplicating here would buy nothing but a full extra exchange
    rem_pos = rem_occ.select(
        "doc_id",
        F.explode(F.sequence(F.col("i"), F.col("i") + (SUBSTR_N - 1))).alias(
            "p"
        ),
    )
    tok_pos = toks.select(
        "doc_id", F.posexplode("w").alias("p", "tok")
    ).withColumn("p", F.col("p").cast("long"))
    kept = tok_pos.join(rem_pos, ["doc_id", "p"], "left_anti")
    agg = kept.groupBy("doc_id").agg(
        F.count("*").alias("n_kept"),
        F.expr(
            "array_join(transform(array_sort(collect_list(struct(p, tok))),"
            " x -> x.tok), ' ')"
        ).alias("cleaned_text"),
    )
    base = toks.select("doc_id", F.size("w").cast("long").alias("n_tokens"))
    return base.join(agg, "doc_id", "left").select(
        "doc_id",
        "n_tokens",
        (F.col("n_tokens") - F.coalesce(F.col("n_kept"), F.lit(0))).alias(
            "n_removed"
        ),
        F.round(
            (F.col("n_tokens") - F.coalesce(F.col("n_kept"), F.lit(0)))
            / F.col("n_tokens"),
            4,
        ).alias("frac_removed"),
        F.coalesce(F.col("cleaned_text"), F.lit("")).alias("cleaned_text"),
    )
