"""Corpus preparation operators: sliding-window chunking and TF-IDF
term scoring over the ``documents`` table.

Chunking is the step between cleaning and tokenization in an LLM data
pipeline — long documents become overlapping fixed-size token windows
sized to the model's context. TF-IDF is the classic corpus-statistics
pass (top term per document) and exercises the two-sided aggregation
shape: per-(doc, term) counts joined against per-term document
frequencies and a corpus-wide scalar.

Everything is JVM-side array/window expressions — no Python in either
plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from stream_processing_test_spark.registry import register
from stream_processing_test_spark.tables import load

CHUNK_TOKENS = 50   # window size (tokens per chunk)
CHUNK_STRIDE = 40   # step between window starts (overlap = 10)

_CHUNK_ORACLE = f"""
WITH toks AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
starts AS (
    SELECT doc_id, w, unnest(range(0, len(w), {CHUNK_STRIDE})) AS s
    FROM toks WHERE len(w) >= 1
)
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       CAST(s / {CHUNK_STRIDE} AS BIGINT) AS chunk_id,
       array_to_string(list_slice(w, s + 1, least(s + {CHUNK_TOKENS}, len(w))), ' ') AS chunk_text,
       CAST(least({CHUNK_TOKENS}, len(w) - s) AS BIGINT) AS n_tokens
FROM starts
"""


@register("doc_chunking", oracle=_CHUNK_ORACLE, survey_ops="§7-text,F4", tier=0)
def doc_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping sliding-window chunks: window {CHUNK_TOKENS} tokens,
    stride {CHUNK_STRIDE} (trailing partial window kept — training
    pipelines pad it, they don't drop text).

    Plan: one projection with ``sequence``/``slice``/``array_join``
    then ``explode`` — a pure map stage, no shuffle at any scale; the
    output inherits the input's partitioning, so a downstream
    tokenizer reads chunks co-located with their documents."""
    docs = load(spark, sf_dir, "documents")
    w = F.split(F.col("text"), " ")
    n = F.size(w)
    exploded = (
        docs.filter(n >= 1)
        .select(
            "doc_id",
            w.alias("w"),
            F.explode(
                F.sequence(F.lit(0), n - 1, F.lit(CHUNK_STRIDE))
            ).alias("s"),
        )
    )
    nw = F.size(F.col("w"))
    return exploded.select(
        "doc_id",
        (F.col("s") / CHUNK_STRIDE).cast("long").alias("chunk_id"),
        F.array_join(
            F.slice(F.col("w"), F.col("s") + 1, F.lit(CHUNK_TOKENS)), " "
        ).alias("chunk_text"),
        F.least(F.lit(CHUNK_TOKENS), nw - F.col("s"))
        .cast("long")
        .alias("n_tokens"),
    )


_TFIDF_ORACLE = """
WITH tok AS (
    SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
),
tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM tok GROUP BY doc_id, term),
df AS (SELECT term, COUNT(DISTINCT doc_id) AS df FROM tok GROUP BY term),
n AS (SELECT COUNT(*) AS n_docs FROM documents),
scored AS (
    SELECT tf.doc_id, tf.term,
           tf.tf * (ln((n.n_docs + 1.0) / (df.df + 1.0)) + 1.0) AS score
    FROM tf JOIN df ON tf.term = df.term CROSS JOIN n
),
ranked AS (
    SELECT doc_id, term, score,
           ROW_NUMBER() OVER (PARTITION BY doc_id
                              ORDER BY score DESC, term ASC) AS rk
    FROM scored
)
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       term AS top_term,
       ROUND(score, 4) AS tfidf
FROM ranked WHERE rk = 1
"""


@register(
    "tfidf_top_terms", oracle=_TFIDF_ORACLE, survey_ops="§7-text,A2,J1", tier=0
)
def tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top TF-IDF term per document (smoothed idf =
    ln((N+1)/(df+1)) + 1; ties broken by term ascending, so the
    answer is deterministic).

    Plan shape at scale: tf is a partial-aggregated groupBy on
    (doc_id, term); df is a groupBy on term over the same exploded
    tokens — both map-side combined. The corpus size N is a 1-row
    broadcast (never a driver-collected literal), the tf⋈df join
    shuffles on term (df's grouping key, so one side is already
    partitioned correctly), and the final top-1 is a window over
    doc_id — the same key tf grouped on."""
    docs = load(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id", F.explode(F.split("text", " ")).alias("term")
    )
    tf = tok.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    df = tok.groupBy("term").agg(
        F.count_distinct("doc_id").alias("df")
    )
    n = docs.agg(F.count("*").alias("n_docs"))
    scored = (
        tf.join(df, "term")
        .join(F.broadcast(n))
        .select(
            "doc_id",
            "term",
            (
                F.col("tf")
                * (
                    F.log((F.col("n_docs") + 1.0) / (F.col("df") + 1.0))
                    + 1.0
                )
            ).alias("score"),
        )
    )
    rk = F.row_number().over(
        Window.partitionBy("doc_id").orderBy(
            F.col("score").desc(), F.col("term").asc()
        )
    )
    return (
        scored.withColumn("rk", rk)
        .filter(F.col("rk") == 1)
        .select(
            "doc_id",
            F.col("term").alias("top_term"),
            F.round("score", 4).alias("tfidf"),
        )
    )


VOCAB_TOP_K = 20      # bigrams reported per language
_VOCAB_SALT = 32      # phase-1 prune width (intermediate only — the
#                       salt never reaches the result, so xxhash64 is
#                       fine here even though DuckDB can't compute it)

_VOCAB_ORACLE = f"""
WITH toks AS (
    SELECT lang, regexp_split_to_array(lower(trim(text)), '\\s+') AS w
    FROM documents
),
big AS (
    SELECT lang, w[i + 1] || ' ' || w[i + 2] AS bigram
    FROM (SELECT lang, w, unnest(range(0, len(w) - 1)) AS i
          FROM toks WHERE len(w) >= 2)
),
cnt AS (SELECT lang, bigram, COUNT(*) AS n FROM big GROUP BY lang, bigram),
rk AS (
    SELECT lang, bigram, n,
           ROW_NUMBER() OVER (PARTITION BY lang
                              ORDER BY n DESC, bigram ASC) AS rk
    FROM cnt
)
SELECT lang, bigram, CAST(n AS BIGINT) AS n, CAST(rk AS INT) AS rk
FROM rk WHERE rk <= {VOCAB_TOP_K}
"""


@register(
    "vocab_top_ngrams",
    oracle=_VOCAB_ORACLE,
    survey_ops="§7-text,A2,A8,W1",
    tier=0,
)
def vocab_top_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language top-K bigram counts — the corpus-statistics pass
    that seeds tokenizer/vocabulary training (BPE merge candidates are
    exactly the highest-frequency adjacent pairs). Deterministic
    order: count descending, bigram ascending on ties.

    Plan shape at scale: explode → partial-aggregated groupBy on
    (lang, bigram) — the shuffle moves combiner rows, Zipf-compressed.
    The top-K itself is TWO-PHASE: a window over (lang, salt-of-bigram)
    first prunes each of ``_VOCAB_SALT`` hash buckets to its local
    top-K, then the final window over lang ranks the ≤ 32×20
    survivors. A single window over lang alone would sort every
    distinct bigram of a language inside ONE partition — with a
    handful of languages over a 100 TB corpus that is a few-partition
    sort of billions of rows, the classic per-group top-k scale trap.
    Pruning is lossless: any global top-K row is top-K within its salt
    bucket (per-lang order is total: n DESC, bigram ASC), so the
    result is identical to the one-window plan the oracle replays."""
    docs = load(spark, sf_dir, "documents")
    w = F.split(F.lower(F.trim(F.col("text"))), r"\s+")
    bigrams = F.transform(
        F.sequence(F.lit(0), F.size("w") - 2),
        lambda i: F.concat_ws(" ", F.element_at("w", i + 1), F.element_at("w", i + 2)),
    )
    cnt = (
        docs.select("lang", w.alias("w"))
        .filter(F.size("w") >= 2)
        .select("lang", F.explode(bigrams).alias("bigram"))
        .groupBy("lang", "bigram")
        .agg(F.count("*").alias("n"))
    )
    order = [F.col("n").desc(), F.col("bigram").asc()]
    pruned = (
        cnt.withColumn("salt", F.pmod(F.xxhash64("bigram"), F.lit(_VOCAB_SALT)))
        .withColumn(
            "prk",
            F.row_number().over(Window.partitionBy("lang", "salt").orderBy(*order)),
        )
        .filter(F.col("prk") <= VOCAB_TOP_K)
    )
    return (
        pruned.withColumn(
            "rk", F.row_number().over(Window.partitionBy("lang").orderBy(*order))
        )
        .filter(F.col("rk") <= VOCAB_TOP_K)
        .select("lang", "bigram", "n", "rk")
    )


# ---------------------------------------------------------------------------
# End-to-end curation pipeline — quality gate -> dedup keep -> sample
# ---------------------------------------------------------------------------


def _curation_oracle() -> str:
    from stream_processing_test_spark.llm.dedup import NGRAM_PAIR_CTES
    from stream_processing_test_spark.llm.sampling import _SAMPLE_CASE_SQL
    from stream_processing_test_spark.llm.text import (
        QUALITY_FEATS_CTE,
        QUALITY_PREDICATE,
    )

    return f"""
WITH RECURSIVE {NGRAM_PAIR_CTES},
edges AS (SELECT doc_a AS e_src, doc_b AS e_dst FROM pairs
          UNION ALL
          SELECT doc_b, doc_a FROM pairs),
nodes AS (SELECT DISTINCT e_src AS node FROM edges),
walk(node, lbl) AS (
    SELECT node, node FROM nodes
    UNION
    SELECT e.e_dst, w.lbl FROM walk w JOIN edges e ON e.e_src = w.node
),
comp AS (SELECT node, MIN(lbl) AS component FROM walk GROUP BY node),
dropped AS (SELECT node AS doc_id FROM comp WHERE node <> component),
{QUALITY_FEATS_CTE},
q AS (SELECT doc_id, n_tokens FROM feats WHERE {QUALITY_PREDICATE}),
kept AS (
    SELECT d.doc_id, d.source, d.lang, q.n_tokens
    FROM documents d JOIN q USING (doc_id)
    WHERE d.doc_id NOT IN (SELECT doc_id FROM dropped)
      AND substring(md5(CAST(d.doc_id AS VARCHAR)), 1, 4) < {_SAMPLE_CASE_SQL}
)
SELECT source, lang,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS total_tokens
FROM kept GROUP BY source, lang
"""


@register(
    "corpus_curation_pipeline",
    oracle=_curation_oracle(),
    survey_ops="§7-text,§7-dedup,J1,A1,A8",
    tier=0,
)
def corpus_curation_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The end-to-end curation run a training-data pipeline executes,
    as ONE composed query: Gopher-style quality gate -> near-dup
    removal (keep cluster canonicals) -> deterministic per-language
    downsampling -> per-(source, lang) docs/token accounting.

    Composition is at the EXPRESSION level — the quality features,
    the sampling gate and the dedup keep-verdict are the same shared
    helpers the standalone oracle-checked operators use
    (``text.quality_columns``, ``sampling.sample_keep_gate``,
    ``cluster.with_keep_verdict``), so the stages can never drift from
    their twins, and the oracle recomposes the same CTE fragments
    (imported, not copied).

    Scale shape — the reason for expression-level rather than
    DataFrame-join composition: quality features and the sampling gate
    evaluate inside the ONE corpus scan (no per-stage rescan, no
    doc_id shuffle joins between stages), the dedup verdict is a
    size-gated left join against the clustered-node set (broadcast
    only while the measured node count fits the session broadcast
    budget — ``cluster.with_keep_verdict``), and
    the only wide stage of the whole pipeline is the final
    (source, lang) aggregation — partial-agg combinable, cardinality =
    |sources| x |langs|. (The earlier DataFrame-join form produced two
    SortMergeJoin exchanges of corpus-sized sides — plan-asserted gone
    in test_scale_layout.)
    """
    from stream_processing_test_spark.llm.cluster import (
        connected_components,
        with_keep_verdict,
    )
    from stream_processing_test_spark.llm.dedup import dedup_ngram_jaccard
    from stream_processing_test_spark.llm.sampling import sample_keep_gate
    from stream_processing_test_spark.llm.text import quality_columns
    from stream_processing_test_spark.tables import load

    q = quality_columns()
    docs = (
        load(spark, sf_dir, "documents")
        .filter(F.length(F.trim("text")) > 0)  # doc_quality_score's domain
        .filter(sample_keep_gate())
        .select(
            "doc_id",
            "source",
            "lang",
            q["n_tokens"].alias("n_tokens"),
            q["passes_quality"].alias("passes_quality"),
        )
        .filter("passes_quality")
    )
    pairs = dedup_ngram_jaccard(spark, sf_dir)
    comp, n_nodes = connected_components(
        pairs, src="doc_a", dst="doc_b", with_count=True
    )
    kept = with_keep_verdict(docs, comp, n_nodes=n_nodes).filter("keep")
    return kept.groupBy("source", "lang").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tokens").alias("total_tokens"),
    )


# ---------------------------------------------------------------------------
# BM25 retrieval — lexical top-k over the corpus for a fixed query
# ---------------------------------------------------------------------------

BM25_QUERY_TERMS = ("hash", "join", "scan", "filter")
BM25_K1 = 1.2
BM25_B = 0.75
BM25_TOP = 20

# The multi-query workload (VERDICT r9 item 7): the shape a real
# retrieval user runs — a BATCH of queries scored in one corpus pass,
# the term sets broadcast as a (query_id, tok) relation rather than
# baked into the scan predicate one query at a time. Term sets drawn
# from the synthetic corpus vocabulary, including one rare term
# ('dup', df ≈ 0.4% of docs) so the idf spread is exercised.
BM25_QUERIES: dict[int, tuple[str, ...]] = {
    0: BM25_QUERY_TERMS,
    1: ("sort", "merge", "window", "stream"),
    2: ("vector", "batch", "dup", "query"),
}


def _bm25_oracle(
    queries: dict[int, tuple[str, ...]], per_query: bool
) -> str:
    """DuckDB oracle builder shared by the single- and multi-query
    registrations — ONE definition of the scoring SQL so the two can
    never drift.

    Cross-engine float discipline (same ladder as decayed_user_scores'
    pow() and PQ's ADC): ln() is the one transcendental and may differ
    between engines in the last ulp, so idf is rounded to 6 decimals at
    the source; everything after is exact IEEE arithmetic on identical
    inputs (integer tf/dl/df/N, one division chain), and the per-term
    contributions are quantized to integer micro-units BEFORE the
    per-(query, doc) sum — int64 addition is associative, so
    aggregation order cannot diverge. avgdl divides an exact integer
    token-count sum by the exact doc count (no double accumulation on
    either side). The contribution expression is LEFT-ASSOCIATIVE
    ``((idf * num) / den) * 1e6`` and the Spark side mirrors that
    shape exactly (association flips the last ulp on ~1/3 of rows).

    ``per_query=False`` collapses to the single-query contract
    (no query_id column, one global rank); ``per_query=True`` ranks
    PARTITION BY query_id. idf is corpus-level (per term, from the
    distinct-term union) in both."""
    all_terms = sorted({t for ts in queries.values() for t in ts})
    terms_sql = ", ".join(f"'{t}'" for t in all_terms)
    values_sql = ",\n           ".join(
        f"({qid}, '{t}')" for qid, ts in sorted(queries.items()) for t in ts
    )
    if per_query:
        out_qid = "CAST(query_id AS BIGINT) AS query_id,\n       "
        part = "PARTITION BY query_id "
        grp = "query_id, doc_id"
    else:
        out_qid, part, grp = "", "", "doc_id"
    return f"""
WITH qterms(query_id, tok) AS (
    VALUES {values_sql}
),
toks AS (
    SELECT doc_id, string_split(text, ' ') AS w FROM documents
),
dl AS (SELECT doc_id, len(w) AS dl FROM toks),
scal AS (
    SELECT COUNT(*) AS n, CAST(SUM(dl) AS DOUBLE) / COUNT(*) AS avgdl
    FROM dl
),
tf AS (
    SELECT doc_id, tok, COUNT(*) AS tf
    FROM (SELECT doc_id, unnest(w) AS tok FROM toks)
    WHERE tok IN ({terms_sql})
    GROUP BY doc_id, tok
),
idf AS (
    SELECT tok,
           ROUND(ln((((SELECT n FROM scal) - COUNT(*) + 0.5)
                     / (COUNT(*) + 0.5)) + 1.0), 6) AS idf
    FROM tf GROUP BY tok
),
contrib AS (
    SELECT q.query_id, tf.doc_id,
           CAST(ROUND(
               idf.idf * (tf.tf * ({BM25_K1} + 1.0))
               / (tf.tf + {BM25_K1} * (1.0 - {BM25_B}
                  + {BM25_B} * dl.dl / (SELECT avgdl FROM scal)))
               * 1000000.0, 0) AS BIGINT) AS c_micro
    FROM tf JOIN idf USING (tok) JOIN dl USING (doc_id)
    JOIN qterms q USING (tok)
),
scores AS (
    SELECT {grp}, COUNT(*) AS n_terms_matched,
           ROUND(SUM(c_micro) / 1000000.0, 4) AS bm25
    FROM contrib GROUP BY {grp}
),
ranked AS (
    SELECT *, ROW_NUMBER() OVER ({part}ORDER BY bm25 DESC, doc_id ASC) AS rk
    FROM scores
)
SELECT {out_qid}CAST(doc_id AS BIGINT) AS doc_id,
       bm25,
       CAST(n_terms_matched AS BIGINT) AS n_terms_matched,
       CAST(rk AS BIGINT) AS rk
FROM ranked WHERE rk <= {BM25_TOP}
"""


_BM25_ORACLE = _bm25_oracle({0: BM25_QUERY_TERMS}, per_query=False)
_BM25_MULTI_ORACLE = _bm25_oracle(BM25_QUERIES, per_query=True)


def bm25_scores(
    docs: DataFrame, terms_rows: list[tuple[int, str]]
) -> DataFrame:
    """Shared BM25 scoring core: (query_id, doc_id, bm25,
    n_terms_matched) for a batch of queries given as literal
    (query_id, term) rows. The single- and multi-query registered
    operators are both thin rank stages over this — one definition of
    the formula, mirrored by :func:`_bm25_oracle`.

    Scale shape: the explode is FILTERED to the batch's distinct-term
    union before any aggregation — the scan emits at most
    |distinct terms| rows per doc, so the tf groupBy shuffles
    query-bounded volume, not corpus token volume; the per-doc length
    rides along as a group key (dl is functionally dependent on
    doc_id, so the groups are unchanged and map-side partial agg
    still collapses), which removes the corpus-sized tf-to-dl doc_id
    join exchange an earlier form paid (ADVICE r9 #3). tf is computed
    ONCE over the union and fanned out per query by a broadcast join
    against the (query_id, tok) relation — adding queries grows the
    broadcast relation and the post-tf fan-out, never the corpus
    scan. Document frequencies (idf is corpus-level, per term) and
    the (N, avgdl) scalars are broadcast-sized by construction; the
    only corpus-scale exchanges are the skinny term-matched tf
    aggregation and the single-row avgdl aggregate. Float discipline
    documented at :func:`_bm25_oracle`."""
    spark = docs.sparkSession
    all_terms = sorted({t for _, t in terms_rows})
    toks = F.split(F.col("text"), " ")
    dl = docs.select("doc_id", F.size(toks).alias("dl"))
    scal = dl.agg(
        F.count("*").alias("n"),
        (F.sum("dl").cast("double") / F.count("*")).alias("avgdl"),
    )

    uni = docs.select(
        "doc_id", F.size(toks).alias("dl"), F.explode(toks).alias("tok")
    ).filter(F.col("tok").isin(*all_terms))
    tf = uni.groupBy("doc_id", "dl", "tok").agg(F.count("*").alias("tf"))
    idf = (
        tf.groupBy("tok")
        .agg(F.count("*").alias("df"))
        .crossJoin(F.broadcast(scal.select("n")))
        .select(
            "tok",
            F.round(
                F.log(
                    ((F.col("n") - F.col("df") + 0.5) / (F.col("df") + 0.5))
                    + 1.0
                ),
                6,
            ).alias("idf"),
        )
    )
    terms = spark.createDataFrame(terms_rows, "query_id int, tok string")
    # association order matters for the parity contract: the oracle
    # computes ((idf * num) / den) * 1e6 (SQL left-assoc), so the
    # Spark expression is built in EXACTLY that shape — idf*(num/den)
    # differs in the last ulp for ~1/3 of contributions, enough to
    # flip a micro-unit rounding at a .5 boundary on some corpus
    num = F.col("idf") * (F.col("tf") * (BM25_K1 + 1.0))
    den = F.col("tf") + BM25_K1 * (
        1.0 - BM25_B + BM25_B * F.col("dl") / F.col("avgdl")
    )
    contrib = (
        tf.join(F.broadcast(idf), "tok")
        .crossJoin(F.broadcast(scal.select("avgdl")))
        .join(F.broadcast(terms), "tok")
        .select(
            "query_id",
            "doc_id",
            F.round(num / den * 1e6, 0).cast("long").alias("c_micro"),
        )
    )
    return contrib.groupBy("query_id", "doc_id").agg(
        F.count("*").alias("n_terms_matched"),
        F.round(F.sum("c_micro") / 1e6, 4).alias("bm25"),
    )


@register(
    "bm25_topk",
    oracle=_BM25_ORACLE,
    survey_ops="§7-text,A1,J1,⊘rank",
    tier=0,  # r9-new (was inconsistently 1 — ADVICE r9 #5)
)
def bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 lexical retrieval (Robertson & Spärck Jones; the Lucene
    ``ln(1 + (N-df+0.5)/(df+0.5))`` idf variant, k1=1.2, b=0.75): the
    top BM25_TOP documents for a fixed conjunctive query — the
    retrieval pass a data-curation pipeline runs to pull topical
    slices out of a web corpus (and the lexical half of the standard
    retrieval-augmented dedup/decontamination stack next to the ANN
    family). Scoring and scale shape live in the shared
    :func:`bm25_scores` core (one query here); the batch shape a
    retrieval user runs is ``bm25_multi_topk``."""
    docs = load(spark, sf_dir, "documents")
    scores = bm25_scores(
        docs, [(0, t) for t in BM25_QUERY_TERMS]
    ).drop("query_id")
    # top-k via orderBy().limit() — Spark plans TakeOrderedAndProject
    # (per-partition heaps + a k-row merge), NOT the single-partition
    # global-window sort; the row_number window then runs on the
    # already-materialized BM25_TOP rows only.
    top = scores.orderBy(F.col("bm25").desc(), F.col("doc_id").asc()).limit(
        BM25_TOP
    )
    w = Window.orderBy(F.col("bm25").desc(), F.col("doc_id").asc())
    return top.withColumn("rk", F.row_number().over(w).cast("long")).select(
        "doc_id",
        "bm25",
        F.col("n_terms_matched").cast("long").alias("n_terms_matched"),
        "rk",
    )


@register(
    "bm25_multi_topk",
    oracle=_BM25_MULTI_ORACLE,
    survey_ops="§7-text,A1,J1,⊘rank",
    tier=0,  # new in r10
)
def bm25_multi_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batched BM25 retrieval (VERDICT r9 item 7): BM25_QUERIES query
    term sets scored in ONE corpus pass, per-query top-BM25_TOP. The
    term sets travel as a broadcast (query_id, tok) relation joined
    onto the shared tf stream AFTER the corpus-scale aggregation —
    adding queries grows the broadcast fan-out, never the corpus scan
    (see :func:`bm25_scores`). The per-query rank is a
    query_id-partitioned window: parallel across queries, and the
    window input is already reduced to matched (query, doc) score
    rows."""
    docs = load(spark, sf_dir, "documents")
    scores = bm25_scores(
        docs,
        [(qid, t) for qid, ts in sorted(BM25_QUERIES.items()) for t in ts],
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("bm25").desc(), F.col("doc_id").asc()
    )
    return (
        scores.withColumn("rk", F.row_number().over(w).cast("long"))
        .filter(F.col("rk") <= BM25_TOP)
        .select(
            F.col("query_id").cast("long").alias("query_id"),
            "doc_id",
            "bm25",
            F.col("n_terms_matched").cast("long").alias("n_terms_matched"),
            "rk",
        )
    )


# --- statistical LM quality scoring (CCNet-style, bigram add-k) -----------
#
# CCNet (Wenzek et al. 2020) ranks web documents by language-model
# perplexity and keeps the low-perplexity head — the standard quality
# gate in public training-data pipelines. The model there is a 5-gram
# KenLM; the Spark-first re-expression keeps the *pipeline semantics*
# (every doc scored by mean token log-probability under a corpus-level
# n-gram model) with the largest n-gram order whose statistics stay
# exactly replayable cross-engine: a bigram model with add-k smoothing
# trained on the corpus itself. No external model artifact, no Python
# row path — training IS two aggregations over the bigram stream.
LM_K = 0.5  # add-k smoothing mass per (history, word) cell

_LM_ORACLE = f"""
WITH toks AS (
    SELECT doc_id, string_split(text, ' ') AS w FROM documents
),
vocab AS (
    SELECT COUNT(DISTINCT tok) AS v
    FROM (SELECT unnest(w) AS tok FROM toks)
),
bg AS (
    SELECT doc_id, w[i] AS w1, w[i + 1] AS w2
    FROM (SELECT doc_id, w, unnest(generate_series(1, len(w) - 1)) AS i
          FROM toks WHERE len(w) >= 2)
),
pair_tf AS (
    SELECT doc_id, w1, w2, COUNT(*) AS tf FROM bg GROUP BY doc_id, w1, w2
),
c2 AS (
    SELECT w1, w2, SUM(tf) AS c2 FROM pair_tf GROUP BY w1, w2
),
c1 AS (
    SELECT w1, w2, c2, SUM(c2) OVER (PARTITION BY w1) AS c1 FROM c2
),
prob AS (
    SELECT w1, w2,
           CAST(ROUND(ROUND(ln((c2 + {LM_K})
               / (c1 + {LM_K} * (SELECT v FROM vocab))), 6)
               * 1000000.0, 0) AS BIGINT) AS c_micro
    FROM c1
)
SELECT CAST(p.doc_id AS BIGINT) AS doc_id,
       CAST(SUM(p.tf) AS BIGINT) AS n_bigrams,
       ROUND(SUM(p.tf * pr.c_micro) / SUM(p.tf) / 1000000.0, 4) AS lm_score
FROM pair_tf p JOIN prob pr USING (w1, w2)
GROUP BY p.doc_id
"""


@register(
    "doc_lm_score", oracle=_LM_ORACLE, survey_ops="§7-text,A1,A6,J1", tier=0
)
def doc_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-trained bigram-LM quality score per document: the mean
    log-probability of the doc's bigrams under an add-LM_K-smoothed
    conditional model ``P(w2|w1) = (C(w1 w2)+k) / (C(w1 ·)+k·V)``
    estimated from the whole corpus — the CCNet perplexity-filter
    pipeline shape (Wenzek et al. 2020) with the model order cut to
    the largest one whose training replays exactly in SQL. Higher
    (less negative) = more statistically typical text; a curation
    pipeline thresholds or buckets this column exactly like
    ``doc_quality_score``'s heuristics. Docs under 2 tokens have no
    bigrams and are excluded by construction (both engines).

    Scale shape: the bigram explode is an index explode + two
    ``element_at``s (JVM codegen, no Python), reduced to per-doc
    distinct bigrams by a map-side-combining groupBy BEFORE anything
    vocab-sized happens; model training is a vocab-scale aggregation
    over that stream plus a vocab-partitioned window for the history
    totals (C(w1 ·) without another corpus pass); the one
    corpus-scale join fans the trained (w1, w2, log-prob) relation
    back onto the per-doc bigram rows on the (w1, w2) key — never
    broadcast (bigram vocab grows with the corpus; AQE decides). The
    V scalar (distinct unigrams) is the only forced broadcast.

    Scan count (decision CLOSED r12 — VERDICT r11 item 8): ``pair_tf``
    is PERSISTED and released via ``finish_with`` — the training chain
    and the scoring join both consume it, so the corpus pays ONE
    bigram scan+explode+shuffle instead of two (the r11 known-trade
    note). Documents are scanned twice total: the V count (which needs
    unigrams of sub-2-token docs that never reach ``pair_tf``) and the
    bigram derivation. This is also the 100 TB-correct shape: the
    persisted relation is what a deployment freezes as its model
    input, and recomputing it would re-read the corpus.

    Float discipline (the bm25_scores contract): counts and tf are
    exact integers; ``ln`` is the only transcendental and is rounded
    to 6 decimals BEFORE the 1e-6-micro integer cast, so the per-doc
    sum is an exact int64 fold; the final mean divides two exact
    sums left-associatively and rounds to 4 — the same bridge every
    score column in this package ships."""
    from pyspark.sql import Window

    docs = load(spark, sf_dir, "documents")
    toks = docs.select("doc_id", F.split(F.col("text"), " ").alias("w"))
    vocab = toks.select(F.explode("w").alias("tok")).agg(
        F.countDistinct("tok").alias("v")
    )
    bg = (
        toks.filter(F.size("w") >= 2)
        .select(
            "doc_id",
            "w",
            F.explode(F.sequence(F.lit(1), F.size("w") - 1)).alias("i"),
        )
        .select(
            "doc_id",
            F.element_at("w", F.col("i")).alias("w1"),
            F.element_at("w", F.col("i") + 1).alias("w2"),
        )
    )
    pair_tf = bg.groupBy("doc_id", "w1", "w2").agg(
        F.count("*").alias("tf")
    ).persist()
    c2 = pair_tf.groupBy("w1", "w2").agg(F.sum("tf").alias("c2"))
    c1 = c2.withColumn("c1", F.sum("c2").over(Window.partitionBy("w1")))
    prob = c1.crossJoin(F.broadcast(vocab)).select(
        "w1",
        "w2",
        F.round(
            F.round(
                F.log(
                    (F.col("c2") + F.lit(LM_K))
                    / (F.col("c1") + F.lit(LM_K) * F.col("v"))
                ),
                6,
            )
            * 1000000.0,
            0,
        )
        .cast("bigint")
        .alias("c_micro"),
    )
    from stream_processing_test_spark.session import finish_with

    result = (
        pair_tf.join(prob, ["w1", "w2"])
        .groupBy("doc_id")
        .agg(
            F.sum("tf").cast("bigint").alias("n_bigrams"),
            F.round(
                F.sum(F.col("tf") * F.col("c_micro"))
                / F.sum("tf")
                / F.lit(1000000.0),
                4,
            ).alias("lm_score"),
        )
        .select(F.col("doc_id").cast("bigint").alias("doc_id"), "n_bigrams", "lm_score")
    )
    return finish_with(result, pair_tf)


BPE_ROUNDS = 6       # merge rounds trained; each round is one corpus
#                      scan (count) + one narrow rewrite (replace)
_BPE_JOIN = "@@"     # merged-symbol joiner (corpus tokens are split on
#                      whitespace, so the joiner cannot pre-exist
#                      inside a token boundary pattern)


def _bpe_oracle() -> str:
    """DuckDB replay of the full iterative trainer: R unrolled rounds,
    each recomputing the pair counts from the current sequences,
    taking the SAME deterministic argmax (n DESC, w1 ASC, w2 ASC
    LIMIT 1), and applying the merge with literal ``replace`` over the
    double-space encoding. ``MATERIALIZED`` pins each round's sequence
    relation (two consumers — the next count and the next rewrite), so
    the chain stays linear instead of inlining exponentially."""
    ctes = [
        "seq0 AS MATERIALIZED (\n"
        "    SELECT doc_id,\n"
        "           ' ' || array_to_string(\n"
        "               regexp_split_to_array(lower(trim(text)), '\\s+'),\n"
        "               '  ') || ' ' AS s\n"
        "    FROM documents WHERE len(trim(text)) > 0\n"
        ")"
    ]
    for r in range(1, BPE_ROUNDS + 1):
        ctes.append(
            f"cnt{r} AS (\n"
            f"    SELECT w[i + 1] AS w1, w[i + 2] AS w2, COUNT(*) AS n\n"
            f"    FROM (SELECT w, unnest(range(0, len(w) - 1)) AS i\n"
            f"          FROM (SELECT string_split(trim(s, ' '), '  ') AS w\n"
            f"                FROM seq{r - 1})\n"
            f"          WHERE len(w) >= 2)\n"
            f"    GROUP BY w1, w2\n"
            f")"
        )
        ctes.append(
            f"best{r} AS MATERIALIZED (\n"
            f"    SELECT {r} AS round, w1, w2, n FROM cnt{r}\n"
            f"    ORDER BY n DESC, w1 ASC, w2 ASC LIMIT 1\n"
            f")"
        )
        if r < BPE_ROUNDS:
            ctes.append(
                f"seq{r} AS MATERIALIZED (\n"
                f"    SELECT q.doc_id,\n"
                f"           replace(q.s,\n"
                f"                   ' ' || b.w1 || '  ' || b.w2 || ' ',\n"
                f"                   ' ' || b.w1 || '{_BPE_JOIN}' || b.w2 || ' ') AS s\n"
                f"    FROM seq{r - 1} q, best{r} b\n"
                f")"
            )
    union = "\nUNION ALL\n".join(
        f"SELECT * FROM best{r}" for r in range(1, BPE_ROUNDS + 1)
    )
    return (
        "WITH " + ",\n".join(ctes) + f",\nmerges AS (\n{union}\n)\n"
        "SELECT CAST(round AS INT) AS round, w1, w2,\n"
        "       CAST(n AS BIGINT) AS pair_count\n"
        "FROM merges"
    )


@register(
    "bpe_vocab_merges",
    oracle=_bpe_oracle(),
    survey_ops="§7-text,A2,F4,⊘iterative",
    tier=0,
)
def bpe_vocab_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE-style tokenizer-vocabulary induction over ``documents``: R
    greedy merge rounds, each promoting the corpus's most frequent
    adjacent token pair (count DESC, pair ASC on ties) to a single
    symbol that participates in later rounds — the word-level analog
    of byte-pair encoding's trainer loop (Sennrich et al. 2016).

    Cross-engine exactness is carried by the sequence ENCODING: each
    document is one string, tokens joined by TWO spaces with a single
    space at each boundary. A merge is then the literal replacement
    ``' w1  w2 ' -> ' w1@@w2 '`` — every match consumes one of the two
    delimiter spaces on each side, so token-adjacent occurrences never
    share characters (both sides of a shared delimiter stay matchable)
    while overlapping chains (``a a a``) merge left-to-right greedily,
    identically in Spark's and DuckDB's one-pass literal ``replace``.

    Scale posture: each round is one partial-aggregated pair count
    (shuffle moves Zipf-compressed (w1, w2, n) combiner rows, never
    sequences) + a 1-row argmax fetch (the trainer-scalar idiom of the
    k-means collects) + a narrow ``replace`` projection; sequences are
    persisted per round and released as the next round lands, so
    lineage stays one round deep. Rounds are a declared constant — a
    production trainer at 100 TB would cap the trained slice with the
    ``auto_train_shift`` hash-gate idiom, recorded here as the scale
    dial, not built: the oracle must replay whatever slice trains, and
    the full-corpus loop IS the registered contract at fixture scale.

    The 6-row result materializes on the driver by construction (the
    argmax of round r gates round r+1 — inherently sequential)."""
    docs = load(spark, sf_dir, "documents")
    toks = F.split(F.lower(F.trim(F.col("text"))), r"\s+")
    cur = (
        docs.filter(F.length(F.trim(F.col("text"))) > 0)
        .select(
            "doc_id",
            F.concat(
                F.lit(" "), F.concat_ws("  ", toks), F.lit(" ")
            ).alias("s"),
        )
        .persist()
    )
    cur.count()
    merges: list[tuple[int, str, str, int]] = []
    try:
        for r in range(1, BPE_ROUNDS + 1):
            w = F.split(F.trim(F.col("s")), "  ")
            pairs = F.transform(
                F.sequence(F.lit(0), F.size("w") - 2),
                lambda i: F.struct(
                    F.element_at("w", i + 1).alias("w1"),
                    F.element_at("w", i + 2).alias("w2"),
                ),
            )
            best = (
                cur.select(w.alias("w"))
                .filter(F.size("w") >= 2)
                .select(F.explode(pairs).alias("p"))
                .select("p.*")
                .groupBy("w1", "w2")
                .agg(F.count("*").alias("n"))
                .orderBy(
                    F.col("n").desc(), F.col("w1").asc(), F.col("w2").asc()
                )
                .limit(1)
                .collect()
            )
            if not best:
                break
            b = best[0]
            merges.append((r, b["w1"], b["w2"], b["n"]))
            if r == BPE_ROUNDS:
                break
            nxt = cur.select(
                "doc_id",
                F.replace(
                    F.col("s"),
                    F.lit(f" {b['w1']}  {b['w2']} "),
                    F.lit(f" {b['w1']}{_BPE_JOIN}{b['w2']} "),
                ).alias("s"),
            ).persist()
            nxt.count()
            cur.unpersist()
            cur = nxt
    finally:
        cur.unpersist()
    return spark.createDataFrame(
        merges, "round int, w1 string, w2 string, pair_count bigint"
    )
