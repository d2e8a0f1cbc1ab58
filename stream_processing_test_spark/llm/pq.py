"""Product-quantization ANN (Jégou, Douze, Schmid, "Product
Quantization for Nearest Neighbor Search", TPAMI 2011) — the
memory-bandwidth scale path for similarity search.

Where IVF (llm/similarity.py) prunes WHICH vectors a query scores,
PQ shrinks WHAT is scored: each EMBED_DIM-float vector compresses to
PQ_SUBS small codes (here 16 × 4-bit codes = 8 bytes vs 256 bytes of
float32 — 32×), and queries score candidates from per-subspace
lookup tables over the codes alone (asymmetric distance computation,
ADC) without ever touching the original vectors; an exact re-rank
stage then rescores only the ADC shortlist (ADC+R, the paper's §VII —
measured on the isotropic fixture: pure ADC recall@10 ≈ 0.34, +rerank
0.98). At 100 TB the codes for a 100 B-vector corpus fit in ~800 GB —
RAM-resident on a modest cluster where the raw vectors (25 TB) are
not; production systems compose the two (IVF-PQ), which this engine
supports by construction (both stages are plain DataFrames keyed on
vec_id).

Everything is oracle-replayable with the same machinery the IVF path
established: codebook training is driver-local numpy over the
deterministic hash-sampled training set (bounded model state, not
data), every cross-engine float hazard is rounded at the source
(6-decimal half-up distances and means), and the ADC accumulation is
INTEGER (lookup-table entries quantized to 1e-6 units before the
per-pair sum) — integer addition is associative, so Spark's
arbitrary-order aggregation and DuckDB's scan-order SUM cannot
diverge even in the last bit.

The reference has no vector operators at all (SURVEY.md §2.9); this
extends the §7 north-star similarity family alongside
ann_cosine_topk / ann_lsh_topk / ann_ivf_topk.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from stream_processing_test_spark.llm.similarity import (
    EMBED_DIM,
    N_QUERIES,
    TOP_K,
    _dot,
    _norm,
    _train_shift_ctes,
)
from stream_processing_test_spark.registry import register
from stream_processing_test_spark.tables import load

PQ_SUBS = 16  # subspaces (M in the paper)
PQ_DSUB = EMBED_DIM // PQ_SUBS  # dims per subspace
PQ_CODES = 16  # codewords per subspace (4-bit codes)
PQ_ITERS = 2  # Lloyd passes per subspace (fixed — deterministic unroll)
PQ_RERANK = 100  # ADC shortlist FLOOR (the fixture regime's size)
PQ_RERANK_SHIFT = 7  # auto_rerank: shortlist = n >> 7 (≈0.78% of corpus)
PQ_RERANK_MAX = 65536  # auto_rerank clamp; past this (n > ~8.4 M), route
#                        ADC through IVF lists first (ann_ivfpq_topk) —
#                        growing a global shortlist further means the
#                        broadcast re-rank join carries |queries| × 64 k+
#                        rows and the ADC still scans every code row.
_MICRO = 1_000_000  # LUT quantum: 1e-6 units


# Squared-L2 convention, shared by ALL THREE replays (Spark encode,
# numpy trainer, DuckDB oracle): the FACTORED form
#
#     dist(x, c) = (xsq - 2.0 * dot) + csq
#
# where xsq = Σ x_i², dot = Σ x_i·c_i, csq = Σ c_i² each accumulate
# left-to-right across dims. Why factored instead of Σ(x-c)²: the 2.0
# multiply is exact in binary (no rounding), the three folds are the
# engines' shared left-to-right contract, AND on the Spark side xsq is
# computed ONCE per subspace and shared across all PQ_CODES candidate
# expressions — with the naive form every (x_i - c_i) subtree is
# duplicated per code and the literal codebook tree grows to ~9 000
# expression nodes, whose Catalyst ANALYSIS (not execution — the
# stage runs warm in 1.6 s at 200 k vectors) dominated the whole
# query's wall at fixture scale.


def auto_rerank(
    n_rows: int,
    floor: int = PQ_RERANK,
    shift: int = PQ_RERANK_SHIFT,
    cap: int = PQ_RERANK_MAX,
) -> int:
    """Hold-recall shortlist policy for ADC+R (VERDICT r9 item 1) —
    the PQ twin of ``similarity.auto_tables``: with a FIXED shortlist
    the re-ranked fraction rerank/n shrinks as the corpus grows and
    measured recall@10 decays 0.98 → 0.40 up the ladder, while the
    dial that buys it back is free at the wall (the exact re-rank
    touches only |queries| × rerank raw vectors — BENCH_NOTES.md
    §r9-pq-dial: rerank 1600 at 200 k = 0.92 recall at FLAT wall).

    The rule holds the fraction instead: ``rerank = n >> shift``
    (shift 7 ≈ 0.78% of the corpus — the measured 0.92-recall
    operating point at 200 k vectors, well above the declared 0.75
    floor), floored at the fixture regime's PQ_RERANK and clamped at
    PQ_RERANK_MAX (where the IVF-PQ composition takes over — see the
    constant's comment). Integer-exact (shift, max, min — no float),
    so the DuckDB oracle recomputes the identical rule from its own
    COUNT(*) (:func:`_rerank_cte`) and shortlists the identical rows
    at any corpus size. At fixture sizes (n <= 12 800) this resolves
    to the PQ_RERANK floor — fixture plans and hashes unchanged."""
    return min(max(floor, n_rows >> shift), cap)


def _rerank_cte(
    floor: int = PQ_RERANK,
    shift: int = PQ_RERANK_SHIFT,
    cap: int = PQ_RERANK_MAX,
) -> str:
    """DuckDB CTE ``rr(rerank)`` replaying :func:`auto_rerank` over the
    ``nv(n)`` corpus-count CTE that ``_train_shift_ctes`` already
    defines — same integer rule, same count, no float crosses the
    engine boundary."""
    return f"""rr AS (
    SELECT LEAST(GREATEST({floor}, n >> {shift}), {cap}) AS rerank FROM nv
)"""


def _pq_lloyd_numpy(
    id_vecs: list[tuple[int, list[float]]],
    n_subs: int = PQ_SUBS,
    n_codes: int = PQ_CODES,
    iters: int = PQ_ITERS,
) -> list[tuple[int, int, list[float]]]:
    """Driver-local PQ codebook training: an independent L2 k-means
    per subspace over the (bounded) training sample's subvectors.
    Returns rows (s, code, centroid[PQ_DSUB]).

    The determinism contract is :func:`similarity._lloyd_numpy`'s,
    transposed to L2: squared distances use the module's shared
    factored form (three left-to-right folds — see the convention
    comment above) and round to 6 decimals HALF-UP before every argmin
    (ties to the smaller code id); centroid means round to 6 decimals;
    seeds are the n_codes training vectors with the smallest
    (portable-hash, id) — the SAME ids in every subspace, since the
    hash is of the id; empty codes re-seed from the largest code's
    farthest members (rounded distance DESC, vec_id ASC; the i-th
    missing code takes the i-th farthest). The DuckDB oracle
    (:func:`_pq_oracle`) replays all of it as unrolled CTEs.
    """
    import numpy as np

    from stream_processing_test_spark.llm.hashing import phash_py

    if not id_vecs:
        return []
    ids = np.array([i for i, _ in id_vecs], dtype=np.int64)
    vecs = np.array([v for _, v in id_vecs], dtype=np.float64)
    m = vecs.shape[0]

    from stream_processing_test_spark.llm.hashing import round6_np as round6

    def seq_sq_l2(A: "np.ndarray", C: "np.ndarray") -> "np.ndarray":
        # (ma,d) x (mc,d) -> (ma,mc) squared L2 in the module's shared
        # FACTORED form: (xsq - 2.0*dot) + csq, each fold
        # left-to-right over d (vectorized across rows)
        d = A.shape[1]
        xsq = np.zeros(A.shape[0])
        dot = np.zeros((A.shape[0], C.shape[0]))
        csq = np.zeros(C.shape[0])
        for j in range(d):
            xsq = xsq + A[:, j] * A[:, j]
            dot = dot + A[:, j : j + 1] * C[None, :, j]
            csq = csq + C[:, j] * C[:, j]
        # clamp at 0: enforce the nonnegativity invariant the half-up
        # rounding bridges rely on (identical in encode + oracle)
        return np.maximum((xsq[:, None] - 2.0 * dot) + csq[None, :], 0.0)

    order = sorted(
        range(m), key=lambda i: (phash_py(str(int(ids[i]))), int(ids[i]))
    )
    out: list[tuple[int, int, list[float]]] = []
    for s in range(n_subs):
        sub = vecs[:, s * PQ_DSUB : (s + 1) * PQ_DSUB]
        cents: dict[int, "np.ndarray"] = {
            c: sub[order[c]].copy() for c in range(min(n_codes, m))
        }
        for _ in range(iters):
            clist = sorted(cents)
            D = round6(seq_sq_l2(sub, np.array([cents[c] for c in clist])))
            # argmin-first = smallest distance, ties to the smaller code
            lab = np.array(clist, dtype=np.int64)[np.argmin(D, axis=1)]
            new: dict[int, "np.ndarray"] = {}
            for c in clist:
                members = sub[lab == c]
                if len(members):
                    new[c] = round6(
                        np.add.reduce(members, axis=0) / len(members)
                    )
            missing = [c for c in range(n_codes) if c not in new]
            if missing:
                big = min(new, key=lambda c: (-int(np.sum(lab == c)), c))
                sel = np.flatnonzero(lab == big)
                d = round6(seq_sq_l2(sub[sel], new[big][None, :])[:, 0])
                far = sorted(
                    zip((-d).tolist(), ids[sel].tolist(), sel.tolist())
                )
                for r, c in enumerate(missing):
                    if r < len(far):
                        new[c] = sub[far[r][2]].copy()
            cents = new
        out.extend(
            (s, c, [float(x) for x in v]) for c, v in sorted(cents.items())
        )
    return out


def pq_codebooks(
    emb: DataFrame, n_rows: int | None = None
) -> list[tuple[int, int, list[float]]]:
    """Train the PQ codebooks on the deterministic hash sample
    (same ``auto_train_shift`` gate as the IVF quantizer — training
    cost is capped regardless of corpus size) and return the rows
    (s, code, centroid) driver-side: like the IVF centroids, the
    codebook is bounded model state, not data — it is embedded as
    literal expressions by :func:`pq_encode` and shipped as a small
    local relation for the query LUTs. ``n_rows`` forwards a corpus
    count the caller already probed (``pq_topk``'s auto_rerank probe)
    so the training gate does not re-count."""
    from stream_processing_test_spark.llm.similarity import train_sample

    train = train_sample(emb.select("vec_id", "v"), n_rows=n_rows)
    return _pq_lloyd_numpy([(r["vec_id"], r["v"]) for r in train.collect()])


def pq_encode(
    base: DataFrame,
    rows: list[tuple[int, int, list[float]]],
    carry: tuple[str, ...] = (),
) -> DataFrame:
    """Assign every vector its PQ_SUBS codes in a single MAP-ONLY pass:
    the (PQ_SUBS × PQ_CODES × PQ_DSUB)-double codebook is embedded as
    literal expressions and each subspace's argmin is a ``least()``
    over integer keys ``micro_distance * PQ_CODES + code`` — min
    distance first, ties to the smaller code, as pure long arithmetic
    (no struct/array allocation per row; distances are exact integer
    micro-units, the same quantum the ADC lookup tables use). The
    oracle and the numpy trainer order by ``ROUND(dist, 6)`` — the
    same selection, since dividing the micro integer by 1e6 is
    monotone and collision-free at these magnitudes (spacing 1e-6 vs
    ulp ~1e-14), and both integers are the identical half-up rounding
    of the identical double product ``dist * 1e6``. Zero
    shuffle, zero row amplification: the first registered form
    crossJoined the corpus against the 256-row codebook (256× rows,
    each carrying the 512-byte vector) and re-aggregated by vec_id —
    measured 30 s at 200 k vectors for arithmetic this pass runs
    inside the scan stage. The key packing is exact while
    micro-distance × PQ_CODES stays inside int64 — distances up to
    ~5.7e11, far beyond any normalized-embedding geometry.
    Output: (vec_id, *carry, c0..c{M-1}) — ``carry`` names extra
    ``base`` columns projected through untouched (the IVF-PQ
    composition threads ``list_id`` through the encode so codes come
    out list-tagged without a corpus-scale join)."""
    by_sub: dict[int, list[tuple[int, list[float]]]] = {}
    for s, code, centroid in rows:
        by_sub.setdefault(s, []).append((code, centroid))

    # Layered selectExpr projections built as SQL STRINGS, not Column
    # objects. Two measured reasons (sf0.1, 5 000 vectors):
    # (1) x_i and xsq_s are aliases referenced many times downstream;
    #     Catalyst's CollapseProject declines to inline a non-trivial
    #     multi-use alias, so the analyzed tree keeps ~3.5k SHARED
    #     nodes instead of ~9k duplicated ones (driver-side analysis
    #     was the first fixture-scale bottleneck).
    # (2) building the same tree with pyspark Column operators costs
    #     one py4j round-trip PER OPERATOR — 8.7 s of pure Python for
    #     this codebook before any Spark work; the string form is one
    #     JVM parse per layer (~ms). Double literals use repr() + 'D'
    #     (shortest round-trip repr parses back to the identical
    #     IEEE double; bare decimals would parse as DECIMAL).
    # floor(y + 0.5), not round(): round() evaluates through
    # BigDecimal (256 per row at this fan-out); floor is a plain
    # double op AND the literal twin of the numpy trainer's half-up
    # (distances are >= 0). The engines' half-up implementations
    # differ only at sub-ulp .5 boundaries — the same accepted bridge
    # as round6.
    subs = sorted(by_sub)
    l1 = base.selectExpr(
        "vec_id",
        *carry,
        *[f"element_at(v, {i + 1}) AS x{i}" for i in range(EMBED_DIM)],
    )
    xsq_exprs = []
    for s in subs:
        o = s * PQ_DSUB
        terms = " + ".join(f"x{o + i} * x{o + i}" for i in range(PQ_DSUB))
        xsq_exprs.append(f"({terms}) AS xsq{s}")
    l2 = l1.selectExpr("*", *xsq_exprs)

    key_exprs = []
    for s in subs:
        o = s * PQ_DSUB
        for code, centroid in sorted(by_sub[s]):
            dot = " + ".join(
                f"x{o + i} * {centroid[i]!r}D" for i in range(PQ_DSUB)
            )
            csq = None
            for ci in centroid:  # python-float fold == the engines'
                csq = ci * ci if csq is None else csq + ci * ci
            # greatest(·, 0): the factored form can go sub-ulp negative
            # via cancellation when x equals a centroid; the half-up
            # floor(y+0.5) below relies on nonnegativity, so the
            # invariant is ENFORCED identically in all three engines
            # (numpy trainer, this encode, the oracle's GREATEST).
            dist = f"greatest((xsq{s} - 2.0D * ({dot})) + {csq!r}D, 0D)"
            key_exprs.append(
                f"(CAST(floor({dist} * {_MICRO}.0D + 0.5D) AS BIGINT)"
                f" * {PQ_CODES} + {code}) AS k{s}_{code}"
            )
    l3 = l2.selectExpr("vec_id", *carry, *key_exprs)

    out_exprs = []
    for s in subs:
        ks = [f"k{s}_{code}" for code, _ in sorted(by_sub[s])]
        best = ks[0] if len(ks) == 1 else f"least({', '.join(ks)})"
        out_exprs.append(f"CAST({best} % {PQ_CODES} AS INT) AS c{s}")
    return l3.selectExpr("vec_id", *carry, *out_exprs)


def _seq_dot_sql(a: str, b: str, d: int) -> str:
    return (
        f"list_sum(list_transform(range({d}), i -> {a}[i+1] * {b}[i+1]))"
    )


def _seq_sq_l2_sql(a: str, b: str, d: int) -> str:
    """Squared L2 in the module's shared FACTORED form (see the
    convention comment at the top): (xsq - 2.0*dot) + csq, each a
    left-to-right list_sum fold; GREATEST-clamped at 0 like the numpy
    trainer and the Spark encode (nonnegativity enforced, not
    assumed)."""
    xsq = _seq_dot_sql(a, a, d)
    dot = _seq_dot_sql(a, b, d)
    csq = _seq_dot_sql(b, b, d)
    return f"GREATEST((({xsq} - 2.0 * {dot}) + {csq}), 0)"


def _pq_train_ctes(
    n_subs: int = PQ_SUBS,
    n_codes: int = PQ_CODES,
    iters: int = PQ_ITERS,
) -> tuple[str, str, str]:
    """The per-subspace PQ training/encode/LUT CTE chain shared by the
    pure-PQ oracle and the IVF-PQ composition's oracle: for each
    subspace, subtrain → seeds → ``iters`` × (assign → recompute →
    reseed) Lloyd over the ``train`` CTE → full-corpus ``enc{s}`` →
    per-query ``qlut{s}``. Returns ``(pieces_sql, codes_union,
    lut_union)`` — the UNIONs flatten the per-subspace relations into
    the (vec_id, s, code) code stream and the (query_id, s, code,
    ipart, cnsq) integer LUT the ADC stage consumes. The L2/argmin
    and integer-LUT specifics are documented at their Spark twins
    (:func:`pq_encode`, :func:`pq_topk`)."""
    d = PQ_DSUB

    def assign(name: str, sub_src: str, cents: str) -> str:
        dist = _seq_sq_l2_sql("e.sub", "c.centroid", d)
        return f"""{name} AS MATERIALIZED (
    SELECT vec_id, sub, code FROM (
        SELECT e.vec_id, e.sub, c.code,
               ROW_NUMBER() OVER (PARTITION BY e.vec_id
                   ORDER BY ROUND({dist}, 6) ASC, c.code ASC) AS rn
        FROM {sub_src} e CROSS JOIN {cents} c) WHERE rn = 1
)"""

    def recompute(name: str, assigned: str) -> str:
        return f"""{name} AS MATERIALIZED (
    SELECT code, list(m ORDER BY pos) AS centroid FROM (
        SELECT code, pos, ROUND(AVG(sub[pos+1]), 6) AS m
        FROM {assigned}, range({d}) rr(pos)
        GROUP BY code, pos)
    GROUP BY code
)"""

    def reseed(name: str, assigned: str, raw: str) -> str:
        dist = _seq_sq_l2_sql("a.sub", "c.centroid", d)
        return f"""{name}_rs AS (
    SELECT m.code, f.sub AS centroid
    FROM (SELECT t.code, ROW_NUMBER() OVER (ORDER BY t.code) AS r
          FROM range({n_codes}) t(code)
          WHERE t.code NOT IN (SELECT code FROM {raw})) m
    JOIN (SELECT a.vec_id, a.sub, ROW_NUMBER() OVER (
              ORDER BY ROUND({dist}, 6) DESC, a.vec_id ASC) AS r
          FROM {assigned} a
          JOIN (SELECT code FROM (SELECT code, COUNT(*) AS n
                                  FROM {assigned} GROUP BY code)
                ORDER BY n DESC, code ASC LIMIT 1) big
            ON a.code = big.code
          JOIN {raw} c ON c.code = a.code) f
      ON m.r = f.r
),
{name} AS MATERIALIZED (SELECT * FROM {raw} UNION ALL SELECT * FROM {name}_rs)"""

    pieces = []
    enc_names, lut_names = [], []
    for s in range(n_subs):
        lo, hi = s * d + 1, (s + 1) * d
        pieces.append(
            f"subtrain{s} AS MATERIALIZED (SELECT vec_id, v[{lo}:{hi}] AS sub FROM train)"
        )
        pieces.append(f"""seeds{s} AS (
    SELECT (ROW_NUMBER() OVER (ORDER BY h, vec_id) - 1) AS code, sub AS centroid
    FROM (SELECT vec_id, sub,
                 CAST('0x' || substr(md5(CAST(vec_id AS VARCHAR)), 1, 15) AS BIGINT) AS h
          FROM subtrain{s} ORDER BY h, vec_id LIMIT {n_codes})
)""")
        cents = f"seeds{s}"
        for i in range(iters):
            pieces.append(assign(f"assign{s}_{i}", f"subtrain{s}", cents))
            cents = f"cent{s}_{i + 1}"
            pieces.append(recompute(f"{cents}_raw", f"assign{s}_{i}"))
            pieces.append(reseed(cents, f"assign{s}_{i}", f"{cents}_raw"))
        pieces.append(
            f"subfull{s} AS MATERIALIZED (SELECT vec_id, v[{lo}:{hi}] AS sub FROM esig)"
        )
        pieces.append(assign(f"enc{s}", f"subfull{s}", cents))
        dot = _seq_dot_sql("q.sub", "c.centroid", d)
        nsq = _seq_dot_sql("c.centroid", "c.centroid", d)
        pieces.append(f"""qlut{s} AS (
    SELECT q.query_id, c.code,
           CAST(ROUND({dot} * {_MICRO}, 0) AS BIGINT) AS ipart,
           CAST(ROUND({nsq} * {_MICRO}, 0) AS BIGINT) AS cnsq
    FROM (SELECT vec_id AS query_id, v[{lo}:{hi}] AS sub FROM esig
          WHERE vec_id < {N_QUERIES}) q
    CROSS JOIN {cents} c
)""")
        enc_names.append(f"enc{s}")
        lut_names.append(f"qlut{s}")

    codes_union = "\nUNION ALL ".join(
        f"SELECT vec_id, {s} AS s, code FROM {enc_names[s]}"
        for s in range(n_subs)
    )
    lut_union = "\nUNION ALL ".join(
        f"SELECT query_id, {s} AS s, code, ipart, cnsq FROM {lut_names[s]}"
        for s in range(n_subs)
    )
    return ",\n".join(pieces), codes_union, lut_union


def _adc_tail_sql(rerank_bound: str, top_k: int) -> str:
    """The shared oracle tail after the ``adc(query_id, vec_id, idot,
    insq)`` CTE: approx-cosine reconstruction from the integer sums,
    shortlist (bounded by ``rerank_bound`` — a literal or a scalar
    subquery over the ``rr`` policy CTE), exact re-rank, final top-k
    projection. One definition for the pure-PQ and IVF-PQ oracles."""
    qn_fold = _seq_dot_sql("v", "v", EMBED_DIM)
    return f"""qn AS (
    SELECT vec_id AS query_id, sqrt({qn_fold}) AS n
    FROM esig WHERE vec_id < {N_QUERIES}
),
sims AS (
    SELECT a.query_id, a.vec_id AS neighbor_id,
           ROUND((a.idot / {_MICRO}.0)
                 / (qn.n * sqrt(a.insq / {_MICRO}.0)), 4) AS approx_cos
    FROM adc a JOIN qn USING (query_id)
),
shortlist AS (
    SELECT query_id, neighbor_id, approx_cos FROM (
        SELECT *, ROW_NUMBER() OVER (
            PARTITION BY query_id
            ORDER BY approx_cos DESC, neighbor_id ASC) AS ar
        FROM sims) WHERE ar <= {rerank_bound}
),
exact AS (
    SELECT s.query_id, s.neighbor_id, s.approx_cos,
           ROUND(list_cosine_similarity(q.v, e.v), 4) AS cos_sim
    FROM shortlist s
    JOIN esig e ON e.vec_id = s.neighbor_id
    JOIN (SELECT vec_id, v FROM esig WHERE vec_id < {N_QUERIES}) q
      ON q.vec_id = s.query_id
),
ranked AS (
    SELECT *, ROW_NUMBER() OVER (
        PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id ASC) AS rk
    FROM exact
)
SELECT CAST(query_id AS BIGINT) AS query_id,
       CAST(neighbor_id AS BIGINT) AS neighbor_id,
       cos_sim,
       approx_cos,
       CAST(rk AS BIGINT) AS rk
FROM ranked WHERE rk <= {top_k}"""


def _pq_oracle(
    n_subs: int = PQ_SUBS,
    n_codes: int = PQ_CODES,
    iters: int = PQ_ITERS,
    top_k: int = TOP_K,
    rerank: int | None = None,
) -> str:
    """DuckDB oracle replaying the WHOLE PQ pipeline — per-subspace
    codebook training (Lloyd unrolled into CTE pairs over the same
    hash-gated ``train`` CTE the Spark side samples:
    :func:`_pq_train_ctes`), full-corpus encoding, integer LUT
    construction, ADC scoring, top-k. Follows
    :func:`similarity._ivf_oracle`'s construction; the L2/argmin and
    integer-LUT specifics are documented at their Spark twins.
    ``rerank=None`` (the registered mode since r10) recomputes
    :func:`auto_rerank` from the oracle's own COUNT(*) via
    :func:`_rerank_cte` — the shortlist bound becomes a scalar
    subquery over that CTE, so the oracle replays the hold-recall
    policy at any corpus size."""
    if rerank is None:
        rr_cte, rerank_bound = f"{_rerank_cte()},\n", "(SELECT rerank FROM rr)"
    else:
        rr_cte, rerank_bound = "", str(rerank)
    pieces_sql, codes_union, lut_union = _pq_train_ctes(
        n_subs=n_subs, n_codes=n_codes, iters=iters
    )

    return f"""
WITH esig AS (
    SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
    FROM embeddings
),
{_train_shift_ctes()},
{rr_cte}{pieces_sql},
codes AS ({codes_union}),
lut AS ({lut_union}),
adc AS (
    SELECT l.query_id, codes.vec_id,
           SUM(l.ipart) AS idot, SUM(l.cnsq) AS insq
    FROM codes JOIN lut l USING (s, code)
    WHERE codes.vec_id <> l.query_id
    GROUP BY 1, 2
),
{_adc_tail_sql(rerank_bound, top_k)}
"""


def pq_topk(
    emb: DataFrame,
    queries: DataFrame,
    top_k: int = TOP_K,
    rerank: int | None = None,
) -> DataFrame:
    """ADC search core with exact re-ranking (ADC+R, Jégou et al.
    2011 §VII): codes + per-query integer lookup tables shortlist
    ``rerank`` candidates per query, then the original vectors score
    JUST the shortlist exactly. ``rerank=None`` (the registered mode)
    sizes the shortlist from a corpus count probe via
    :func:`auto_rerank` — the r10 hold-recall policy; an explicit int
    pins it (the scale harness's dial).

    ``emb`` is (vec_id, v); ``queries`` is (query_id, qv). The
    codebook trains on the hash-capped sample, the corpus encodes in
    one MAP-ONLY pass (:func:`pq_encode`), then ADC scoring touches
    ONLY the code stream: one broadcast join against the
    (queries × PQ_SUBS × PQ_CODES) integer lookup table and one keyed
    integer sum per (query, vector) — associative int64 addition, so
    aggregation order is immaterial to parity. (An earlier form
    chained PQ_SUBS separate broadcast joins via a withColumn loop:
    execution-equivalent, but each step re-analyzed a plan containing
    the full literal codebook tree — quadratic driver-side analysis
    that dominated the wall at fixture scale.) The re-rank stage is a
    BROADCAST semi-join of the (queries × rerank)-row shortlist back
    onto the corpus — the only stage that touches raw vectors after
    encoding, and it reads exactly |shortlist| of them. Exchanges
    after encoding: the ADC group-sum and the two per-query top-k
    windows."""
    # one metadata-cheap count probe feeds BOTH integer rules: the
    # auto_rerank shortlist policy and the training gate's
    # auto_train_shift (pq_codebooks forwards it to train_sample)
    n_rows = emb.select("vec_id").count()
    if rerank is None:
        rerank = auto_rerank(n_rows)
    rows = pq_codebooks(emb, n_rows=n_rows)
    if not rows:
        return _empty_topk(emb.sparkSession)
    enc = pq_encode(emb.select("vec_id", "v"), rows)
    codes = _explode_codes(enc)
    lut = _query_luts(queries, rows)

    # ONE broadcast join + ONE keyed integer sum (associative — Spark's
    # arbitrary merge order and DuckDB's scan order cannot diverge)
    pairs = codes.join(F.broadcast(lut), ["s", "code"])
    return _adc_rank(pairs, emb, queries, rerank, top_k)


def _empty_topk(spark: SparkSession) -> DataFrame:
    """The contract's empty result for an empty corpus (or a training
    gate that kept no rows): no codebook means no c{s} columns to
    project — return this instead of failing analysis (the same guard
    the IVF twin's _lloyd_numpy carries)."""
    return spark.createDataFrame(
        [],
        "query_id long, neighbor_id long, cos_sim double, "
        "approx_cos double, rk long",
    )


def _explode_codes(enc: DataFrame, carry: tuple[str, ...] = ()) -> DataFrame:
    """(vec_id, *carry, s, code) — the exact shape of the oracle's
    codes UNION, from :func:`pq_encode`'s wide (c0..c{M-1}) row."""
    return enc.select(
        "vec_id",
        *carry,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(s).alias("s"), F.col(f"c{s}").alias("code")
                    )
                    for s in range(PQ_SUBS)
                ]
            )
        ).alias("sc"),
    ).select(
        "vec_id", *carry, F.col("sc.s").alias("s"), F.col("sc.code").alias("code")
    )


def _query_luts(
    queries: DataFrame, rows: list[tuple[int, int, list[float]]]
) -> DataFrame:
    """The per-query integer ADC lookup table (query_id, s, code,
    ipart, cnsq): one broadcast crossJoin of the query set against the
    (PQ_SUBS × PQ_CODES)-row codebook relation."""
    codebook = queries.sparkSession.createDataFrame(
        rows, "s int, code int, centroid array<double>"
    )
    qsub = F.slice("qv", F.col("s") * PQ_DSUB + 1, PQ_DSUB)
    return queries.crossJoin(F.broadcast(codebook)).select(
        "query_id",
        "s",
        "code",
        F.round(_dot(qsub, F.col("centroid")) * _MICRO, 0)
        .cast("long")
        .alias("ipart"),
        F.round(_dot(F.col("centroid"), F.col("centroid")) * _MICRO, 0)
        .cast("long")
        .alias("cnsq"),
    )


def _adc_rank(
    pairs: DataFrame,
    emb: DataFrame,
    queries: DataFrame,
    rerank: int,
    top_k: int,
) -> DataFrame:
    """The shared ADC+R tail (Spark twin of :func:`_adc_tail_sql`):
    ``pairs`` is the pre-aggregation (query_id, vec_id, ipart, cnsq)
    stream — the pure-PQ path feeds codes ⋈ LUT, the IVF-PQ path
    feeds probed-list codes ⋈ LUT. One keyed integer sum, approx-cos
    reconstruction, per-query shortlist of ``rerank``, exact re-rank
    touching only |queries| × rerank raw vectors, top-k."""
    from pyspark.sql import Window

    from stream_processing_test_spark.llm.similarity import cosine

    qn = queries.select("query_id", _norm(F.col("qv")).alias("qn"))
    agg = (
        pairs.filter(F.col("vec_id") != F.col("query_id"))
        .groupBy("query_id", "vec_id")
        .agg(F.sum("ipart").alias("idot"), F.sum("cnsq").alias("insq"))
    )
    adc = agg.join(F.broadcast(qn), "query_id").select(
        "query_id",
        F.col("vec_id").alias("neighbor_id"),
        F.round(
            (F.col("idot") / F.lit(float(_MICRO)))
            / (F.col("qn") * F.sqrt(F.col("insq") / F.lit(float(_MICRO)))),
            4,
        ).alias("approx_cos"),
    )
    w_adc = Window.partitionBy("query_id").orderBy(
        F.col("approx_cos").desc(), F.col("neighbor_id").asc()
    )
    shortlist = (
        adc.withColumn("ar", F.row_number().over(w_adc))
        .filter(F.col("ar") <= rerank)
        .select("query_id", "neighbor_id", "approx_cos")
    )
    exact = (
        emb.select(F.col("vec_id").alias("neighbor_id"), "v")
        .join(F.broadcast(shortlist), "neighbor_id")
        .join(F.broadcast(queries), "query_id")
        .select(
            "query_id",
            "neighbor_id",
            "approx_cos",
            F.round(cosine(F.col("qv"), F.col("v")), 4).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        exact.withColumn("rk", F.row_number().over(w).cast("long"))
        .filter(F.col("rk") <= top_k)
        .select("query_id", "neighbor_id", "cos_sim", "approx_cos", "rk")
    )


def ivfpq_topk(
    emb: DataFrame,
    queries: DataFrame,
    n_probe: int | None = None,
    top_k: int = TOP_K,
    rerank: int | None = None,
    n_lists: int | None = None,
) -> DataFrame:
    """IVF-PQ composition (Jégou et al. 2011 §V — IVFADC): the
    ≥100 M-vector architecture both module docstrings name. The IVF
    coarse quantizer routes each query to its n_probe nearest lists,
    ADC scores ONLY those lists' CODES (never raw vectors), and the
    exact re-rank reads only |queries| × rerank raw rows — so the two
    unbounded costs of the constituent operators are both bounded:
    pure PQ's ADC scan of every code row shrinks to the probed
    fraction, and pure IVF's raw-vector read of probed lists shrinks
    to 8-byte code rows plus the shortlist.

    Defaults are the policy rules: ``n_lists`` from
    :func:`similarity.auto_lists` (lists ≈ sqrt(n/C), so probed code
    rows grow as sqrt(n) — the sublinearity the ladder measures),
    ``rerank`` from :func:`auto_rerank` (the r10 hold-recall
    shortlist), ``n_probe`` = similarity.N_PROBE (the documented
    constant — recall on structureless corpora is floored at the
    fraction searched, exactly as ``ann_ivf_topk`` documents; routing
    gain needs corpus structure and is pytest-pinned there).

    Scale shape: ONE corpus assignment scan (broadcast trained
    centroids), ONE map-only encode pass over the assignment output
    (list_id rides the encode via ``pq_encode(carry=...)`` — no
    corpus-scale code⋈list join), then the ADC group-sum over the
    probed fraction and the two per-query top-k windows. Both
    trainers run driver-local on the shared hash-capped sample."""
    from stream_processing_test_spark.llm.similarity import (
        N_PROBE,
        auto_lists,
        kmeans_lists,
        route_queries,
    )

    if n_probe is None:
        n_probe = N_PROBE
    n_rows = emb.select("vec_id").count()
    if rerank is None:
        rerank = auto_rerank(n_rows)
    if n_lists is None:
        n_lists = auto_lists(n_rows)
    rows = pq_codebooks(emb, n_rows=n_rows)
    if not rows:
        return _empty_topk(emb.sparkSession)
    # checkpoint=False: the assignment's ONLY consumer here is the
    # encode pass below (the rerank tail re-reads `emb`, not the
    # assignment), so the index materialization is pure overhead —
    # the r12 attribution measured the wide-row checkpoint as part of
    # the dominant stage of the 2M-vector wall.
    assign, centroids = kmeans_lists(
        emb, k=n_lists, n_rows=n_rows, checkpoint=False
    )
    enc = pq_encode(assign, rows, carry=("list_id",))
    codes = _explode_codes(enc, carry=("list_id",))
    lut = _query_luts(queries, rows)

    probed = route_queries(queries, centroids, n_probe)
    # list restriction FIRST (broadcast (query, list) pairs), then the
    # LUT keyed on (query_id, s, code) — the group-sum input is the
    # probed fraction of the code stream, not all of it
    pairs = codes.join(F.broadcast(probed), "list_id").join(
        F.broadcast(lut), ["query_id", "s", "code"]
    )
    return _adc_rank(pairs, emb, queries, rerank, top_k)


def _ivfpq_oracle(top_k: int = TOP_K, n_probe: int | None = None) -> str:
    """DuckDB oracle for the IVF-PQ composition: the IVF Lloyd chain
    in DYNAMIC-list mode (``_ivf_lloyd_ctes(n_lists=None)`` bounded by
    the ``nl`` CTE replaying :func:`similarity.auto_lists`) + the PQ
    training/encode/LUT chain (:func:`_pq_train_ctes`) + the probed
    ADC join + the shared shortlist/re-rank tail with the ``rr``
    auto_rerank bound. Both policy rules and the training gate are
    recomputed from the oracle's own COUNT(*) — the whole composition
    replays at any corpus size."""
    from stream_processing_test_spark.llm.similarity import (
        N_PROBE,
        _ivf_lloyd_ctes,
        auto_lists_ctes,
    )

    if n_probe is None:
        n_probe = N_PROBE
    lloyd, cents = _ivf_lloyd_ctes(n_lists=None)
    pieces_sql, codes_union, lut_union = _pq_train_ctes()

    return f"""
WITH esig AS (
    SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
    FROM embeddings
),
{_train_shift_ctes()},
{_rerank_cte()},
{auto_lists_ctes()},
{lloyd},
{pieces_sql},
pcodes AS ({codes_union}),
codes AS (
    SELECT p.vec_id, a.list_id, p.s, p.code
    FROM pcodes p JOIN assign_final a USING (vec_id)
),
lut AS ({lut_union}),
q AS (SELECT vec_id AS query_id, v AS qv FROM esig WHERE vec_id < {N_QUERIES}),
probed AS (
    SELECT query_id, list_id FROM (
        SELECT q.query_id, c.list_id,
               ROW_NUMBER() OVER (PARTITION BY q.query_id
                   ORDER BY ROUND(list_cosine_similarity(q.qv, c.centroid), 6) DESC,
                            c.list_id ASC) AS pr
        FROM q CROSS JOIN {cents} c) WHERE pr <= {n_probe}
),
adc AS (
    SELECT l.query_id, codes.vec_id,
           SUM(l.ipart) AS idot, SUM(l.cnsq) AS insq
    FROM codes
    JOIN probed p ON p.list_id = codes.list_id
    JOIN lut l ON l.query_id = p.query_id
              AND l.s = codes.s AND l.code = codes.code
    WHERE codes.vec_id <> l.query_id
    GROUP BY 1, 2
),
{_adc_tail_sql("(SELECT rerank FROM rr)", top_k)}
"""


@register(
    "ann_ivfpq_topk",
    oracle=_ivfpq_oracle(),
    survey_ops="§7-similarity,IVF,PQ",
    tier=0,  # new in r10
)
def ann_ivfpq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ ANN over the embeddings table: auto-sized coarse lists
    route each query to N_PROBE lists, 16×4-bit PQ codes ADC-score
    only those lists, and the auto_rerank shortlist is exactly
    re-ranked. See :func:`ivfpq_topk` for the composition's scale
    story and the policy defaults."""
    emb = load(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    q = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
    )
    return ivfpq_topk(emb, q)


@register(
    "ann_pq_topk",
    oracle=_pq_oracle(),
    survey_ops="§7-similarity,PQ",
    tier=0,  # r9-new (was inconsistently 1 — ADVICE r9 #5)
)
def ann_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization ANN over the embeddings table: 16×4-bit
    codes per vector, asymmetric-distance (ADC) cosine scoring from
    integer lookup tables, per-query top-k with the shortlist sized by
    the :func:`auto_rerank` hold-recall policy (declared floor:
    recall@10 >= 0.75 on the ladder corpora; the oracle replays the
    rule from its own COUNT(*)). See the module docstring for the
    compression/scale story and the oracle-parity design (driver-local
    bounded training, 6-decimal rounding bridges, associative integer
    ADC)."""
    emb = load(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    q = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
    )
    return pq_topk(emb, q)
