"""Corpus-curation catalog queries: repetition, decontamination, BM25.

Three operator families a pretraining-data pipeline runs corpus-wide,
beyond the per-document text suite in ``plans/text.py``:

- **Repetition metrics** (Gopher-style): fraction of n-gram occurrences
  captured by the most frequent n-gram and by any repeated n-gram —
  the signals used to drop boilerplate/degenerate documents.
- **Benchmark decontamination**: flag training documents sharing any
  5-gram with a held-out evaluation set — the standard guard against
  test-set leakage into a training corpus.
- **BM25 retrieval**: rank documents for a fixed term query using exact
  integer statistics and a fixed-shape floating-point expression.

Determinism notes (hash-exact across Spark and DuckDB):

- Ratios are single divisions of exact integers (correctly rounded,
  order-free). The BM25 score is a *fixed* expression tree over exact
  integer inputs — every +, *, / is an IEEE-754 correctly-rounded op
  applied in the same order on both engines, so the result is
  bit-exact without any SUM-over-rows of doubles. DuckDB numeric
  literals default to DECIMAL, so every fractional literal in the
  oracle SQL is explicitly cast to DOUBLE.
- BM25's IDF is the rational Robertson form (2(N-df)+1)/(2df+1)
  *without* the log: ln() is libm-dependent (last-ulp drift across
  engines breaks hash comparison) while the rational is a monotone
  per-term transform computed exactly — same determinism choice as
  ``tfidf_top_terms``.

Scale shape: repetition metrics are pure per-row lambda work (no
shuffle at all; the O(L²) in-row count is bounded by document length,
not corpus size). Decontamination broadcasts the *benchmark* n-gram
set — eval suites are tiny and fixed while the training corpus is the
100 TB side, so the scan streams map-side with one per-doc aggregate.
BM25 broadcasts a one-row global-stats frame and ends in
TakeOrderedAndProject (per-partition top-k, then k×partitions rows to
the driver-side heap — never a global sort).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..sources.tables import load_spread
from .registry import QueryCatalog
from .text import (
    QUALITY_MAX_AVG_LEN,
    QUALITY_MAX_TOKENS,
    QUALITY_MIN_AVG_LEN,
    QUALITY_MIN_TOKENS,
    STOPWORDS,
    _STOP_SQL,
)

CATALOG = QueryCatalog()


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_spread(spark, sf_dir, "documents")


def _tokens(df: DataFrame) -> DataFrame:
    return df.withColumn("tokens", F.split(F.col("text"), " "))


# --------------------------------------------------------------------------
# Gopher-style repetition metrics
# --------------------------------------------------------------------------

#: Documents whose most frequent bigram exceeds this share of all bigram
#: occurrences are flagged (Gopher §A1.1 uses 0.20 for top-2-grams).
TOP_BIGRAM_MAX_FRAC = 0.20
#: Max fraction of trigram occurrences belonging to any repeated trigram.
DUP_TRIGRAM_MAX_FRAC = 0.30


@CATALOG.add(
    "doc_repetition_metrics",
    f"""
    WITH t AS (
        SELECT doc_id, string_split(text, ' ') AS tk
        FROM documents
        WHERE len(string_split(text, ' ')) >= 3
    ),
    g AS (
        SELECT doc_id,
               list_transform(range(1, len(tk)),
                              i -> tk[i] || ' ' || tk[i+1]) AS g2,
               list_transform(range(1, len(tk) - 1),
                              i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2])
                   AS g3
        FROM t
    )
    SELECT doc_id,
           CAST(len(g2) AS BIGINT) AS n_bigrams,
           CAST(list_max(list_transform(list_distinct(g2),
                    x -> len(list_filter(g2, y -> y = x)))) AS DOUBLE)
               / len(g2) AS top_bigram_frac,
           CAST(len(list_filter(g3,
                    x -> len(list_filter(g3, y -> y = x)) >= 2)) AS DOUBLE)
               / len(g3) AS dup_trigram_frac,
           (CAST(list_max(list_transform(list_distinct(g2),
                     x -> len(list_filter(g2, y -> y = x)))) AS DOUBLE)
                / len(g2) <= {TOP_BIGRAM_MAX_FRAC}::DOUBLE)
           AND (CAST(len(list_filter(g3,
                     x -> len(list_filter(g3, y -> y = x)) >= 2)) AS DOUBLE)
                / len(g3) <= {DUP_TRIGRAM_MAX_FRAC}::DOUBLE)
               AS passes_repetition
    FROM g
    """,
    doc="Gopher-style repetition filters: share of bigram occurrences "
    "captured by the document's most frequent bigram, and share of "
    "trigram occurrences belonging to any trigram appearing twice or "
    "more. Both are in-row lambda folds over the n-gram arrays — zero "
    "shuffle, embarrassingly parallel at 100 TB; the O(L²) distinct× "
    "filter count is bounded by document length (L ≈ tens of tokens), "
    "not corpus size. Ratios are exact-integer divisions; thresholds "
    "mirror Gopher's boilerplate gates.",
    tags=("text", "filter"),
)
def doc_repetition_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _tokens(_docs(spark, sf_dir)).filter(F.size("tokens") >= 3)
    d = d.withColumn("g2", F.expr(_BIGRAM_EXPR)).withColumn(
        "g3",
        F.expr(
            "transform(sequence(0, size(tokens)-3),"
            " i -> concat_ws(' ', tokens[i], tokens[i+1], tokens[i+2]))"
        ),
    )
    top_big = F.array_max(
        F.transform(
            F.array_distinct("g2"),
            lambda x: F.size(F.filter("g2", lambda y: y == x)),
        )
    )
    dup_tri = F.size(
        F.filter(
            "g3",
            lambda x: F.size(F.filter("g3", lambda y: y == x)) >= 2,
        )
    )
    top_frac = top_big.cast("double") / F.size("g2")
    dup_frac = dup_tri.cast("double") / F.size("g3")
    return d.select(
        "doc_id",
        # bigint to match the oracle's DuckDB len() (the file's own
        # cross-engine type convention; review r06)
        F.size("g2").cast("bigint").alias("n_bigrams"),
        top_frac.alias("top_bigram_frac"),
        dup_frac.alias("dup_trigram_frac"),
        (
            (top_frac <= F.lit(TOP_BIGRAM_MAX_FRAC))
            & (dup_frac <= F.lit(DUP_TRIGRAM_MAX_FRAC))
        ).alias("passes_repetition"),
    )


# --------------------------------------------------------------------------
# Benchmark decontamination (n-gram overlap against a held-out set)
# --------------------------------------------------------------------------

#: n-gram order for contamination matching (13 is common for exact-match
#: decontamination of LLM eval suites; 5 suits this corpus's short docs).
DECONTAM_N = 5
#: Deterministic pseudo eval-set membership: doc_id % this == 0 (~6%).
DECONTAM_BENCH_MOD = 17


@CATALOG.add(
    "decontaminate_ngram_overlap",
    f"""
    WITH t AS (
        SELECT doc_id,
               list_distinct(list_transform(
                   range(1, len(string_split(text, ' ')) - {DECONTAM_N - 2}),
                   i -> string_split(text, ' ')[i] || ' ' ||
                        string_split(text, ' ')[i+1] || ' ' ||
                        string_split(text, ' ')[i+2] || ' ' ||
                        string_split(text, ' ')[i+3] || ' ' ||
                        string_split(text, ' ')[i+4])) AS g5
        FROM documents
        WHERE len(string_split(text, ' ')) >= {DECONTAM_N}
    ),
    bench AS (
        SELECT DISTINCT unnest(g5) AS gram
        FROM t WHERE doc_id % {DECONTAM_BENCH_MOD} = 0
    ),
    cand AS (
        SELECT doc_id, unnest(g5) AS gram
        FROM t WHERE doc_id % {DECONTAM_BENCH_MOD} <> 0
    )
    SELECT cand.doc_id,
           COUNT(*) AS n_grams,
           COUNT(bench.gram) AS n_shared,
           COUNT(bench.gram) > 0 AS contaminated
    FROM cand LEFT JOIN bench USING (gram)
    GROUP BY cand.doc_id
    """,
    doc=f"Test-set decontamination: flag every training document that "
    f"shares any {DECONTAM_N}-gram with the held-out benchmark slice "
    f"(deterministically doc_id % {DECONTAM_BENCH_MOD} = 0, standing in "
    "for an eval suite). The benchmark n-gram set is explicitly "
    "broadcast — eval suites are megabytes while the training corpus "
    "is the 100 TB side — so contamination checking is a map-side "
    "hash probe plus one per-doc aggregate; no shuffle of the corpus "
    "against itself. Per-doc distinct n-grams fold in-row "
    "(array_distinct) before the explode, bounding the joined row "
    "count at sum of per-doc distinct grams.",
    tags=("text", "dedup", "join"),
)
def decontaminate_ngram_overlap(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    n = DECONTAM_N
    d = _tokens(_docs(spark, sf_dir)).filter(F.size("tokens") >= n)
    # n-grams are HASHED to int64 (multi-arg xxhash64 over the n tokens
    # — no concat, no string allocation, no token-boundary aliasing)
    # instead of materialized as strings: the output is per-doc COUNTS,
    # so only gram identity matters, and 64-bit collisions are
    # negligible at any corpus size (p ~ n_cand*n_bench/2^64). The
    # broadcast set becomes 8 bytes/gram instead of ~40. The string
    # oracle in DuckDB is unchanged — counts agree by construction.
    grams = F.expr(
        f"array_distinct(transform(sequence(0, size(tokens)-{n}), i -> "
        "xxhash64("
        + ", ".join(f"tokens[i+{j}]" for j in range(n))
        + ")))"
    )
    d = d.select("doc_id", grams.alias("g5"))
    # explode_outer, NOT explode: plain explode generates an implicit
    # `size(g5) > 0` predicate that Catalyst pushes below the spread
    # repartition with the g5 alias INLINED — the whole n-gram
    # construction then runs twice per row, inside the (row-group-bound,
    # possibly single-task) scan stage. g5 is never empty here
    # (size(tokens) >= n guarantees >= 1 gram), so outer == inner
    # semantically, and the expensive projection stays after the
    # repartition, computed once, on all cores.
    bench = (
        d.filter(F.col("doc_id") % DECONTAM_BENCH_MOD == 0)
        .select(F.explode_outer("g5").alias("gram"))
        .distinct()
        .withColumn("hit", F.lit(1))
    )
    cand = d.filter(F.col("doc_id") % DECONTAM_BENCH_MOD != 0).select(
        "doc_id", F.explode_outer("g5").alias("gram")
    )
    joined = cand.join(F.broadcast(bench), "gram", "left")
    return joined.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_grams"),
        F.count("hit").alias("n_shared"),
        (F.count("hit") > 0).alias("contaminated"),
    )


# --------------------------------------------------------------------------
# BM25 retrieval (fixed term query, exact-integer statistics)
# --------------------------------------------------------------------------

#: The fixed retrieval query; terms all occur in the corpus vocabulary.
BM25_TERMS = ("spark", "table", "join")
BM25_TOP_K = 20
_K1 = 1.2
_B = 0.75


@CATALOG.add(
    "bm25_topk",
    f"""
    WITH t AS (
        SELECT doc_id,
               string_split(text, ' ') AS tk,
               len(string_split(text, ' ')) AS dl
        FROM documents
    ),
    tf AS (
        SELECT doc_id, dl,
               len(list_filter(tk, x -> x = '{BM25_TERMS[0]}')) AS tf0,
               len(list_filter(tk, x -> x = '{BM25_TERMS[1]}')) AS tf1,
               len(list_filter(tk, x -> x = '{BM25_TERMS[2]}')) AS tf2
        FROM t
    ),
    stats AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(dl) AS BIGINT) AS sumdl,
               CAST(SUM(CASE WHEN tf0 > 0 THEN 1 ELSE 0 END) AS BIGINT)
                   AS df0,
               CAST(SUM(CASE WHEN tf1 > 0 THEN 1 ELSE 0 END) AS BIGINT)
                   AS df1,
               CAST(SUM(CASE WHEN tf2 > 0 THEN 1 ELSE 0 END) AS BIGINT)
                   AS df2
        FROM tf
    ),
    scored AS (
        SELECT doc_id, dl, tf0, tf1, tf2,
               (
                 (CAST(2*(n-df0)+1 AS DOUBLE) / CAST(2*df0+1 AS DOUBLE))
                 * ((CAST(tf0 AS DOUBLE) * {1.0 + _K1}::DOUBLE)
                    / (CAST(tf0 AS DOUBLE)
                       + {_K1}::DOUBLE * ({1.0 - _B}::DOUBLE
                           + {_B}::DOUBLE * (CAST(dl * n AS DOUBLE)
                                             / CAST(sumdl AS DOUBLE)))))
                 +
                 (CAST(2*(n-df1)+1 AS DOUBLE) / CAST(2*df1+1 AS DOUBLE))
                 * ((CAST(tf1 AS DOUBLE) * {1.0 + _K1}::DOUBLE)
                    / (CAST(tf1 AS DOUBLE)
                       + {_K1}::DOUBLE * ({1.0 - _B}::DOUBLE
                           + {_B}::DOUBLE * (CAST(dl * n AS DOUBLE)
                                             / CAST(sumdl AS DOUBLE)))))
               )
               +
               (CAST(2*(n-df2)+1 AS DOUBLE) / CAST(2*df2+1 AS DOUBLE))
               * ((CAST(tf2 AS DOUBLE) * {1.0 + _K1}::DOUBLE)
                  / (CAST(tf2 AS DOUBLE)
                     + {_K1}::DOUBLE * ({1.0 - _B}::DOUBLE
                         + {_B}::DOUBLE * (CAST(dl * n AS DOUBLE)
                                           / CAST(sumdl AS DOUBLE)))))
               AS score
        FROM tf CROSS JOIN stats
    )
    SELECT doc_id, dl, tf0, tf1, tf2, score
    FROM scored
    ORDER BY score DESC, doc_id
    LIMIT {BM25_TOP_K}
    """,
    doc=f"BM25 top-{BM25_TOP_K} retrieval for the fixed query "
    f"{BM25_TERMS} (k1={_K1}, b={_B}). Per-term IDF is the rational "
    "Robertson numerator (2(N-df)+1)/(2df+1) without ln() — a monotone "
    "per-term transform computed by one exact-integer division, chosen "
    "because libm log drift across engines breaks hash comparison. "
    "The score is a fixed expression tree over exact integers (tf, dl, "
    "N, Σdl, df): identical op order on both engines ⇒ bit-identical "
    "doubles, no row-order-dependent double SUM anywhere. Plan: one "
    "tiny global-stats aggregate broadcast to the scan (stats row is "
    "O(1)), per-row in-row tf folds, then TakeOrderedAndProject — "
    "per-partition heaps, k·partitions rows to the driver, never a "
    "global sort. Ties break on doc_id so the top-k set is unique.",
    tags=("text", "topk"),
)
def bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    # ``tf`` feeds two branches (the 1-row global stats and the scored
    # join side); Spark does not dedupe common subplans, so the
    # unpersisted plan ran the scan+tokenize+per-term-count chain
    # TWICE per execution (r16 scan audit: 2 documents scans — the
    # r08 corpus_filter_funnel defect class). The cached frame is 5
    # numeric columns per doc — tiny next to the text it replaces —
    # so one pass + cache wins at every scale; the top-k result is
    # detached (localCheckpoint) so the cache releases before return.
    tf = _bm25_tf(spark, sf_dir).persist()
    tf.count()
    try:
        # Eager detach: the top-k is BM25_TOP_K rows, so checkpointing
        # it costs nothing and lets the tf cache release immediately
        # instead of leaking across the bench session.
        return _bm25_score_topk(tf).localCheckpoint(eager=True)
    finally:
        tf.unpersist(False)


def _bm25_tf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lazy per-doc (doc_id, dl, tf0..tf2) frame — one corpus pass."""
    d = _tokens(_docs(spark, sf_dir)).withColumn("dl", F.size("tokens"))

    # NB: a two-parameter lambda would be called as (element, index) by
    # F.filter — bind the term via a closure, not a default argument.
    def _eq(term: str):
        return lambda x: x == F.lit(term)

    tf_cols = [
        F.size(F.filter("tokens", _eq(t))).alias(f"tf{i}")
        for i, t in enumerate(BM25_TERMS)
    ]
    return d.select("doc_id", "dl", *tf_cols)


def _bm25_score_topk(tf: DataFrame) -> DataFrame:
    stats = tf.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("dl").cast("long").alias("sumdl"),
        *[
            F.sum(
                F.when(F.col(f"tf{i}") > 0, 1).otherwise(0)
            ).cast("long").alias(f"df{i}")
            for i in range(len(BM25_TERMS))
        ],
    )
    scored = tf.crossJoin(F.broadcast(stats))

    # Mirror the oracle's expression tree exactly: same operand order,
    # same casts, so every intermediate double is bit-identical.
    dl_norm = (F.col("dl") * F.col("n")).cast("double") / F.col(
        "sumdl"
    ).cast("double")

    def term_score(i: int):
        tf_d = F.col(f"tf{i}").cast("double")
        df = F.col(f"df{i}")
        idf = (
            (F.lit(2) * (F.col("n") - df) + F.lit(1)).cast("double")
            / (F.lit(2) * df + F.lit(1)).cast("double")
        )
        w = (tf_d * F.lit(1.0 + _K1)) / (
            tf_d
            + F.lit(_K1) * (F.lit(1.0 - _B) + F.lit(_B) * dl_norm)
        )
        return idf * w

    score = (term_score(0) + term_score(1)) + term_score(2)
    return (
        scored.select(
            "doc_id", "dl", "tf0", "tf1", "tf2", score.alias("score")
        )
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(BM25_TOP_K)
    )


# --------------------------------------------------------------------------
# Bigram language-model fluency score (quality filtering)
# --------------------------------------------------------------------------

#: Trusted-slice membership for LM training: doc_id % this == 0 (~14%).
LM_TRAIN_MOD = 7
#: Transition probabilities are carried as exact per-mille integers.
LM_SCALE = 1000


@CATALOG.add(
    "doc_bigram_lm_score",
    f"""
    WITH t AS (
        SELECT doc_id, string_split(text, ' ') AS tk
        FROM documents
        WHERE len(string_split(text, ' ')) >= 2
    ),
    bg AS (
        SELECT doc_id,
               unnest(list_transform(range(1, len(tk)),
                      i -> {{'w1': tk[i], 'w2': tk[i+1]}})) AS b
        FROM t
    ),
    flat AS (SELECT doc_id, b.w1 AS w1, b.w2 AS w2 FROM bg),
    c12 AS (
        SELECT w1, w2, COUNT(*) AS c12 FROM flat
        WHERE doc_id % {LM_TRAIN_MOD} = 0 GROUP BY w1, w2
    ),
    c1 AS (
        SELECT w1, CAST(SUM(c12) AS BIGINT) AS c1
        FROM c12 GROUP BY w1
    ),
    model AS (
        SELECT w1, w2, (c12 * {LM_SCALE}) // c1 AS term
        FROM c12 JOIN c1 USING (w1)
    )
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_bigrams,
           CAST(COUNT(term) AS BIGINT) AS n_known,
           CAST(COALESCE(SUM(term), 0) AS BIGINT) AS score_sum,
           CAST(COALESCE(SUM(term), 0) AS DOUBLE) / COUNT(*)
               AS avg_transition_milli
    FROM flat LEFT JOIN model USING (w1, w2)
    WHERE doc_id % {LM_TRAIN_MOD} <> 0
    GROUP BY doc_id
    """,
    doc="Language-model fluency scoring (the KenLM-style quality gate "
    "of CCNet/Gopher pipelines, in exact arithmetic): train a bigram "
    f"model on the trusted slice (doc_id % {LM_TRAIN_MOD} = 0, standing "
    "in for Wikipedia/books), then score every other document by its "
    "average transition probability. Determinism: log-probs are "
    "libm-dependent, so each transition is the exact integer "
    f"floor((c12 * {LM_SCALE}) / c1) — per-mille P(w2|w1) — and the "
    "per-doc aggregate is an exact int SUM plus ONE final division. "
    "Unseen bigrams contribute 0 (n_known tracks coverage). Plan: the "
    "model is two hash-aggregates over the trusted slice joined once; "
    "the scoring join is left-equi on (w1, w2) with AQE free to "
    "broadcast (sf0.1) or shuffle (a 100 TB trusted slice's bigram "
    "table outgrows broadcast; an equi-shuffle join on uniformly "
    "hash-distributed token pairs is the right fallback shape). "
    "explode_outer throughout — see SCALE.md on the explode-pushdown "
    "trap.",
    tags=("text", "corpus", "join"),
)
def doc_bigram_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _tokens(_docs(spark, sf_dir)).filter(F.size("tokens") >= 2)
    bigrams = F.expr(
        "transform(sequence(0, size(tokens)-2),"
        " i -> struct(tokens[i] as w1, tokens[i+1] as w2))"
    )
    flat = d.select(
        "doc_id", F.explode_outer(bigrams).alias("b")
    ).select("doc_id", "b.w1", "b.w2")
    train = flat.filter(F.col("doc_id") % LM_TRAIN_MOD == 0)
    # ONE pass over the trusted slice builds the bigram table; it is
    # eagerly materialized (localCheckpoint — distributed, sized by the
    # trusted slice's bigram vocabulary, not the corpus) because c1,
    # and then the model join, would otherwise each re-run the
    # tokenize→bigram→aggregate subtree: Spark does not share common
    # subplans across join branches. c1 folds FROM c12 (sum over w2),
    # never rescanning the corpus.
    c12 = (
        train.groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("c12"))
        .localCheckpoint(eager=True)
    )
    c1 = c12.groupBy("w1").agg(F.sum("c12").alias("c1"))
    model = c12.join(c1, "w1").select(
        "w1", "w2", F.expr(f"(c12 * {LM_SCALE}) div c1").alias("term")
    )
    cand = flat.filter(F.col("doc_id") % LM_TRAIN_MOD != 0)
    joined = cand.join(model, ["w1", "w2"], "left")
    return joined.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        F.count("term").alias("n_known"),
        F.sum(F.coalesce(F.col("term"), F.lit(0))).alias("score_sum"),
        (
            F.sum(F.coalesce(F.col("term"), F.lit(0))).cast("double")
            / F.count(F.lit(1))
        ).alias("avg_transition_milli"),
    )


# --------------------------------------------------------------------------
# DSIR-style importance weights (domain-targeted data selection)
# --------------------------------------------------------------------------

#: Feature-hash buckets for the unigram importance model. 256 keeps the
#: model O(1)-broadcastable at ANY corpus size — that is the point of
#: hashed features (DSIR, Xie et al. 2023): model size is fixed by the
#: bucket count, not the vocabulary.
DSIR_BUCKETS = 256
#: Per-bucket rates are exact parts-per-million integers.
DSIR_PPM = 1_000_000


@CATALOG.add(
    "doc_importance_weights",
    f"""
    WITH tok AS (
        SELECT doc_id,
               ('0x' || substr(md5(unnest(string_split(text, ' '))), 1, 15))
                   ::BIGINT % {DSIR_BUCKETS} AS bucket
        FROM documents
    ),
    tgt AS (
        SELECT bucket, COUNT(*) AS c FROM tok
        WHERE doc_id % {LM_TRAIN_MOD} = 0 GROUP BY bucket
    ),
    raw AS (
        SELECT bucket, COUNT(*) AS c FROM tok
        WHERE doc_id % {LM_TRAIN_MOD} <> 0 GROUP BY bucket
    ),
    totals AS (
        SELECT (SELECT SUM(c) FROM tgt) AS tt, (SELECT SUM(c) FROM raw) AS rt
    ),
    model AS (
        SELECT bucket,
               ((CAST(tgt.c AS HUGEINT) * {DSIR_PPM} // tt)
                    * {LM_SCALE})
                   // ((CAST(raw.c AS HUGEINT) * {DSIR_PPM} // rt) + 1)
                   AS term
        FROM tgt JOIN raw USING (bucket) CROSS JOIN totals
    )
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_tokens,
           CAST(COALESCE(SUM(term), 0) AS BIGINT) AS weight_sum,
           CAST(COALESCE(SUM(term), 0) AS DOUBLE) / COUNT(*)
               AS mean_ratio_milli
    FROM tok LEFT JOIN model USING (bucket)
    WHERE doc_id % {LM_TRAIN_MOD} <> 0
    GROUP BY doc_id
    """,
    doc="Importance weighting for domain-targeted data selection (DSIR, "
    "Xie et al. 2023 — hashed n-gram features): unigrams hash into "
    f"{DSIR_BUCKETS} buckets (md5-prefix, engine-portable), the trusted "
    f"slice (doc_id % {LM_TRAIN_MOD} = 0) defines the target bucket "
    "distribution, the rest defines the raw distribution, and each "
    "document scores the sum over its tokens of the target/raw rate "
    "ratio for the token's bucket. Determinism & overflow: rates are "
    "exact ppm integers floor((c * 1e6) / total) — bounded by 1e6 "
    "regardless of corpus size, so the ratio arithmetic never "
    "overflows int64 at ANY scale — and the per-doc aggregate is an "
    "exact int SUM plus one final division (no logs: same rationale "
    "as the BM25 rational IDF). Plan: the model is "
    f"{DSIR_BUCKETS} rows — explicitly broadcast, O(1) forever (the "
    "fixed bucket count is the DSIR trick); scoring is a map-side "
    "probe plus one per-doc hash-aggregate, linear at 100 TB.",
    tags=("text", "corpus", "join"),
)
def doc_importance_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _tokens(_docs(spark, sf_dir))
    tok = d.select(
        "doc_id", F.explode_outer("tokens").alias("token")
    ).select(
        "doc_id",
        F.expr(
            f"cast(conv(substr(md5(token), 1, 15), 16, 10) as bigint)"
            f" % {DSIR_BUCKETS}"
        ).alias("bucket"),
    )
    # ONE corpus pass builds BOTH bucket distributions (conditional
    # counts in a single aggregate); the 256-row result materializes
    # eagerly so totals / model derive from it without re-scanning —
    # four lazy branches over `tok` would tokenize the corpus 4x.
    counts = (
        tok.groupBy("bucket")
        .agg(
            F.sum(
                F.when(F.col("doc_id") % LM_TRAIN_MOD == 0, 1).otherwise(0)
            ).alias("tc"),
            F.sum(
                F.when(F.col("doc_id") % LM_TRAIN_MOD != 0, 1).otherwise(0)
            ).alias("rc"),
        )
        .localCheckpoint(eager=True)
    )
    totals = counts.agg(
        F.sum("tc").alias("tt"), F.sum("rc").alias("rt")
    )
    model = (
        counts.filter((F.col("tc") > 0) & (F.col("rc") > 0))
        .crossJoin(F.broadcast(totals))
        .select(
            "bucket",
            # tc/rc are corpus-wide per-bucket token counts: tc*1e6
            # wraps BIGINT past ~9e12 tokens (a 100 TB corpus holds
            # ~2.5e13) — carry the ppm products in decimal(38,0)/
            # HUGEINT from the first multiplication (r06 self-audit,
            # value_outliers_exact ADVICE class). The div results are
            # <=1e6 and <=1e9, back in bigint range.
            F.expr(
                f"((cast(tc as decimal(38,0)) * {DSIR_PPM} div tt)"
                f" * {LM_SCALE})"
                f" div ((cast(rc as decimal(38,0)) * {DSIR_PPM} div rt)"
                " + 1)"
            ).alias("term"),
        )
    )
    cand = tok.filter(F.col("doc_id") % LM_TRAIN_MOD != 0)
    joined = cand.join(F.broadcast(model), "bucket", "left")
    return joined.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.sum(F.coalesce(F.col("term"), F.lit(0))).alias("weight_sum"),
        (
            F.sum(F.coalesce(F.col("term"), F.lit(0))).cast("double")
            / F.count(F.lit(1))
        ).alias("mean_ratio_milli"),
    )


# --------------------------------------------------------------------------
# Exact duplicated-span detection (substring-level dedup signal)
# --------------------------------------------------------------------------

#: Token-window length for span duplication (Lee et al. 2022 use 50-BPE
#: suffix-array matches; 20 whitespace tokens suits this corpus's
#: 10-99-token documents).
SPAN_TOKENS = 20


@CATALOG.add(
    "doc_duplicated_spans",
    f"""
    WITH t AS (
        SELECT doc_id, string_split(text, ' ') AS tk
        FROM documents
        WHERE len(string_split(text, ' ')) >= {SPAN_TOKENS}
    ),
    w AS (
        SELECT doc_id,
               unnest(list_transform(
                   range(1, len(tk) - {SPAN_TOKENS} + 2),
                   i -> array_to_string(tk[i:i + {SPAN_TOKENS} - 1], ' ')))
                   AS gram
        FROM t
    ),
    c AS (
        SELECT gram, COUNT(DISTINCT doc_id) AS nd
        FROM w GROUP BY gram
    )
    SELECT w.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_windows,
           CAST(SUM(CASE WHEN c.nd >= 2 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_shared_windows,
           CAST(SUM(CASE WHEN c.nd >= 2 THEN 1 ELSE 0 END) AS DOUBLE)
               / COUNT(*) AS shared_fraction
    FROM w JOIN c USING (gram)
    GROUP BY w.doc_id
    """,
    doc="Substring-level duplication signal (Lee et al. 2022, "
    "'Deduplicating Training Data Makes Language Models Better' — the "
    f"ExactSubstr criterion approximated with fixed {SPAN_TOKENS}-token "
    "windows instead of suffix arrays, which do not distribute): every "
    "token position opens a window, windows are hashed (xxhash64 over "
    "the token-array slice — no string materialization; the DuckDB "
    "oracle builds the strings and compares COUNTS only), and a window "
    "whose hash occurs in ≥2 distinct documents marks a cross-document "
    "duplicated span. Output per doc: window count, shared-window "
    "count, shared fraction (one exact division). Plan: explode ≈ "
    "tokens-per-doc rows, ONE hash-shuffle on the window hash (uniform "
    "by construction) for the distinct-doc count, then an equi-join "
    "back — both sides partitioned by the same key from the same "
    "shuffle, and AQE handles any hot boilerplate span. Linear at "
    "100 TB; the window length is the recall/precision knob.",
    tags=("text", "dedup", "join"),
)
def doc_duplicated_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    n = SPAN_TOKENS
    d = _tokens(_docs(spark, sf_dir)).filter(F.size("tokens") >= n)
    windows = F.expr(
        f"transform(sequence(0, size(tokens)-{n}),"
        f" i -> xxhash64(slice(tokens, i + 1, {n})))"
    )
    w = d.select(
        "doc_id", F.explode_outer(windows).alias("whash")
    )
    c = w.groupBy("whash").agg(
        F.countDistinct("doc_id").alias("nd")
    )
    joined = w.join(c, "whash")
    shared = F.sum(F.when(F.col("nd") >= 2, 1).otherwise(0))
    return joined.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_windows"),
        shared.alias("n_shared_windows"),
        (shared.cast("double") / F.count(F.lit(1))).alias(
            "shared_fraction"
        ),
    )


# --------------------------------------------------------------------------
# Filter-funnel attrition report (quality gates applied as a cascade)
# --------------------------------------------------------------------------

#: Cascade order: each document is charged to the FIRST gate it fails.
FUNNEL_STAGES = ("length", "mean_word_len", "stopwords", "repetition")

#: Guarded bigram-array expression over a `tokens` column — shared by
#: doc_repetition_metrics and corpus_filter_funnel. The guard is
#: load-bearing: sequence(0, size-2) for a 1-token doc is the
#: DESCENDING [0,-1], whose lambda indexes tokens[1] out of bounds
#: and ABORTS the job under ANSI mode (review r06, reproduced —
#: hidden only because the fixtures have no short docs; the funnel
#: cannot pre-filter short docs since gate 1 must charge them).
_BIGRAM_EXPR = (
    "if(size(tokens) >= 2,"
    " transform(sequence(0, size(tokens)-2),"
    " i -> concat_ws(' ', tokens[i], tokens[i+1])),"
    " array())"
)


@CATALOG.add(
    "corpus_filter_funnel",
    f"""
    WITH t AS (
        SELECT doc_id, text, string_split(text, ' ') AS tk
        FROM documents
    ),
    g AS (
        SELECT doc_id,
               len(tk) BETWEEN {QUALITY_MIN_TOKENS}
                   AND {QUALITY_MAX_TOKENS} AS g1,
               CAST(length(text) - (len(tk) - 1) AS DOUBLE) / len(tk)
                   BETWEEN {QUALITY_MIN_AVG_LEN}
                       AND {QUALITY_MAX_AVG_LEN} AS g2,
               len(list_filter(tk, x -> x IN {_STOP_SQL})) > 0 AS g3,
               (CAST(list_max(list_transform(
                        list_distinct(list_transform(range(1, len(tk)),
                            i -> tk[i] || ' ' || tk[i+1])),
                        x -> len(list_filter(
                            list_transform(range(1, len(tk)),
                                i -> tk[i] || ' ' || tk[i+1]),
                            y -> y = x)))) AS DOUBLE)
                    / (len(tk) - 1)) <= {TOP_BIGRAM_MAX_FRAC}::DOUBLE
                   AS g4
        FROM t
    ),
    f AS (
        SELECT CASE WHEN NOT g1 THEN 1
                    WHEN NOT g2 THEN 2
                    WHEN NOT g3 THEN 3
                    WHEN NOT g4 THEN 4
                    ELSE 5 END AS failed_idx
        FROM g
    ),
    counts AS (
        SELECT failed_idx, COUNT(*) AS n FROM f GROUP BY 1
    ),
    stages AS (
        SELECT * FROM (VALUES
            (1, 'length'), (2, 'mean_word_len'),
            (3, 'stopwords'), (4, 'repetition')) s(idx, stage)
    ),
    agg AS (
        SELECT s.idx, s.stage, COALESCE(c.n, 0) AS n_failed,
               (SELECT SUM(n) FROM counts) AS total
        FROM stages s LEFT JOIN counts c ON s.idx = c.failed_idx
    )
    SELECT CAST(idx AS INTEGER) AS stage_idx, stage,
           CAST(n_failed AS BIGINT) AS n_failed,
           CAST(total - SUM(n_failed) OVER (ORDER BY idx) AS BIGINT)
               AS n_surviving,
           CAST(total - SUM(n_failed) OVER (ORDER BY idx) AS DOUBLE)
               * 100 / total AS pct_surviving
    FROM agg
    """,
    doc="Filter-funnel attrition report: the quality gates every "
    "pretraining pipeline applies (token-count bounds, mean-word-length "
    "bounds, stopword presence, top-bigram repetition — the same "
    "thresholds as doc_quality_scores / doc_repetition_metrics) "
    "evaluated as an ORDERED cascade, charging each document to the "
    "first gate it fails. One scan computes all gate booleans per row "
    "(the bigram ARRAY materializes per row as a named column — the "
    "price of reliable CSE — but the O(L²) distinct-x-filter fold "
    "inside the CASE branch only runs for docs surviving the cheap "
    "gates, production's cheap-to-expensive ordering), one tiny "
    "aggregation on the 5-value "
    "failed-stage key, and the cumulative-survivor window runs over "
    "the 4-row post-aggregate table. The output is the curation "
    "dashboard number: documents failing each gate and surviving each "
    "prefix, the report that decides threshold tuning before a 100 TB "
    "filtering run is committed.",
    tags=("text", "filter", "agg"),
)
def corpus_filter_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    # Materialize the bigram array as a named column so the distinct×
    # filter fold reads ONE computed array — inlined, the g2 expression
    # appears twice in the projection and higher-order exprs are not
    # reliably CSE'd.
    d = _tokens(_docs(spark, sf_dir)).withColumn(
        "g2", F.expr(_BIGRAM_EXPR)
    )
    n = F.size("tokens")
    avg_len = (F.length("text") - (n - 1)).cast("double") / n
    stop_hits = F.size(F.filter("tokens", lambda x: x.isin(*STOPWORDS)))
    top_frac = F.array_max(
        F.transform(
            F.array_distinct("g2"),
            lambda x: F.size(F.filter("g2", lambda y: y == x)),
        )
    ).cast("double") / (n - 1)
    failed_idx = (
        F.when(~n.between(QUALITY_MIN_TOKENS, QUALITY_MAX_TOKENS), 1)
        .when(~avg_len.between(QUALITY_MIN_AVG_LEN, QUALITY_MAX_AVG_LEN), 2)
        .when(~(stop_hits > 0), 3)
        .when(~(top_frac <= TOP_BIGRAM_MAX_FRAC), 4)
        .otherwise(5)
    )
    counts = (
        d.select(failed_idx.alias("failed_idx"))
        .groupBy("failed_idx")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    # Include a synthetic idx-5 "survived" stage row so the TOTAL can
    # be derived from this one joined frame with a full-frame window —
    # the previous shape referenced `counts` twice (stage join + total
    # crossJoin) and Spark duplicates unpersisted subtrees per
    # reference, so the O(L²) per-row funnel evaluation ran TWICE per
    # execution (r07 bench: 1.14 -> 2.06 s min-of-passes with 2x the
    # host-drift sensitivity). One reference = one documents scan.
    stages = counts.sparkSession.createDataFrame(
        [(i + 1, s) for i, s in enumerate(FUNNEL_STAGES)]
        + [(len(FUNNEL_STAGES) + 1, "survived")],
        "idx INT, stage STRING",
    )
    agg = (
        F.broadcast(stages)
        .join(counts, stages.idx == counts.failed_idx, "left")
        .select(
            "idx",
            "stage",
            F.coalesce(F.col("n"), F.lit(0)).alias("n_failed"),
        )
    )
    w_all = Window.partitionBy().rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    w = Window.orderBy("idx").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    total = F.sum("n_failed").over(w_all)
    surviving = total - F.sum("n_failed").over(w)
    return (
        agg.select(
            F.col("idx").cast("int").alias("stage_idx"),
            "stage",
            F.col("n_failed").cast("bigint").alias("n_failed"),
            surviving.cast("bigint").alias("n_surviving"),
            (surviving.cast("double") * 100 / total).alias(
                "pct_surviving"
            ),
        )
        .filter(F.col("stage_idx") <= len(FUNNEL_STAGES))
    )


# --------------------------------------------------------------------------
# Corpus-relative quality gate (self-normalizing threshold)
# --------------------------------------------------------------------------


@CATALOG.add(
    "corpus_relative_quality_filter",
    """
    WITH t AS (
        SELECT doc_id, string_split(text, ' ') AS tk FROM documents
    ),
    scored AS (
        SELECT doc_id,
               CAST(len(list_distinct(tk)) AS BIGINT) * 1000
                   // len(tk) AS uniq_permille,
               CAST(len(tk) AS BIGINT) AS n_tokens
        FROM t
    ),
    stats AS (
        SELECT SUM(uniq_permille) AS s, COUNT(*) AS n FROM scored
    )
    SELECT doc_id, uniq_permille, n_tokens,
           uniq_permille * (SELECT n FROM stats)
               >= (SELECT s FROM stats) AS above_corpus_mean
    FROM scored
    """,
    doc="Self-normalizing quality gate: keep documents whose "
    "uniqueness score (distinct-token per-mille — an exact integer, "
    "so the corpus SUM is order-free) is at or above the CORPUS MEAN. "
    "Fixed thresholds (doc_quality_scores) go stale as the corpus "
    "shifts; a corpus-relative threshold re-centers every run. The "
    "comparison is cross-multiplied (score·n ≥ Σscores) to stay in "
    "exact integers — no mean division, no float drift. Plan shape: "
    "one scan computes scores, a one-row global aggregate broadcasts "
    "back over the same scores (the BM25/DSIR corpus-stats pattern) — "
    "two passes over a cached scan at 100 TB, or one pass + a "
    "pre-computed stats row in incremental operation.",
    tags=("text", "filter", "agg"),
)
def corpus_relative_quality_filter(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    d = _tokens(_docs(spark, sf_dir))
    scored = d.select(
        "doc_id",
        (
            F.size(F.array_distinct("tokens")).cast("bigint")
            * 1000
        ).alias("u1000"),
        F.size("tokens").cast("bigint").alias("n_tokens"),
    ).select(
        "doc_id",
        F.expr("u1000 div n_tokens").alias("uniq_permille"),
        "n_tokens",
    )
    stats = scored.agg(
        F.sum("uniq_permille").alias("s"),
        F.count(F.lit(1)).alias("n"),
    )
    return scored.crossJoin(F.broadcast(stats)).select(
        "doc_id",
        "uniq_permille",
        "n_tokens",
        (F.col("uniq_permille") * F.col("n") >= F.col("s")).alias(
            "above_corpus_mean"
        ),
    )


# --------------------------------------------------------------------------
# ExactSubstr REMOVAL (keep-first span dedup + text reassembly)
# --------------------------------------------------------------------------


@CATALOG.add(
    "exact_substr_removal",
    f"""
    WITH t AS (
        SELECT doc_id, string_split(text, ' ') AS tk FROM documents
    ),
    w AS (
        SELECT doc_id, i - 1 AS pos,
               md5(array_to_string(tk[i:i + {SPAN_TOKENS} - 1], ' '))
                   AS gh
        FROM t, unnest(range(1, len(tk) - {SPAN_TOKENS} + 2)) AS u(i)
        WHERE len(tk) >= {SPAN_TOKENS}
    ),
    o AS (
        SELECT doc_id, pos,
               ROW_NUMBER() OVER (
                   PARTITION BY gh ORDER BY doc_id, pos) AS rn
        FROM w
    ),
    cov AS (
        SELECT DISTINCT doc_id, pos + u.j AS tpos
        FROM o, unnest(range(0, {SPAN_TOKENS})) AS u(j)
        WHERE rn >= 2
    ),
    tok AS (
        SELECT doc_id, i - 1 AS tpos, tk[i] AS token
        FROM t, unnest(range(1, len(tk) + 1)) AS u(i)
    ),
    kept AS (
        SELECT tok.doc_id, tok.tpos, tok.token
        FROM tok
        WHERE NOT EXISTS (
            SELECT 1 FROM cov
            WHERE cov.doc_id = tok.doc_id AND cov.tpos = tok.tpos
        )
    ),
    rebuilt AS (
        SELECT doc_id,
               COUNT(*) AS n_kept,
               md5(string_agg(token, ' ' ORDER BY tpos)) AS cleaned_hash
        FROM kept GROUP BY doc_id
    )
    SELECT t.doc_id,
           CAST(len(t.tk) AS BIGINT) AS n_tokens,
           CAST(len(t.tk) - COALESCE(r.n_kept, 0) AS BIGINT)
               AS n_removed,
           COALESCE(r.cleaned_hash, md5('')) AS cleaned_hash
    FROM t LEFT JOIN rebuilt r USING (doc_id)
    """,
    doc="ExactSubstr REMOVAL (Lee et al. 2022): where "
    "doc_duplicated_spans only *detects* cross-document duplicated "
    f"{SPAN_TOKENS}-token windows, this operator performs the actual "
    "dedup edit — every duplicated window occurrence except the "
    "globally FIRST (ordered by doc_id, then position; a total order, "
    "so the edit is deterministic under any partitioning) has its "
    "token range removed, and each document's surviving tokens are "
    "reassembled in position order (emitted as md5 so the driver "
    "compares the exact cleaned bytes at bounded size). The window "
    "key is 128-bit (two salted xxhash64s; the oracle's md5 is also "
    "128-bit) because the edit is destructive — a key collision "
    "deletes an unrelated span, so the 64-bit birthday bound at 1e13 "
    "windows is not acceptable here the way it is for detect-only "
    "spans. Plan: windows "
    "explode ≈ one row per token; ONE hash-shuffle on the window hash "
    "ranks occurrences (rn >= 2 alone marks duplicates — a second row "
    "implies a multi-row partition); removed ranges re-explode to "
    "covered positions and "
    "LEFT-join the token stream on (doc_id, position) as a covered "
    "flag; reassembly is ONE groupBy doc_id over the flagged stream "
    "(sort_array(collect_list) of the kept tokens, count(*) for the "
    "total) — state bounded by "
    "document length, never corpus size, and the per-doc token count "
    "rides the same aggregate instead of a third corpus scan. Linear at 100 TB: suffix "
    "arrays (the paper's exact tool) do not distribute, but "
    "fixed-length windows lose only matches shorter than the window "
    "and shuffle uniformly by construction; a hot boilerplate span is "
    "one big rank group, handled by AQE skew splitting on the "
    "explode side and bounded rank state on the window side.",
    tags=("text", "dedup", "join"),
)
def exact_substr_removal(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    n = SPAN_TOKENS
    t = _tokens(_docs(spark, sf_dir)).select("doc_id", "tokens")
    # Window occurrences: (doc_id, pos, 128-bit key of the n-token
    # slice) — a struct of TWO differently-salted xxhash64s, not one
    # 64-bit hash (ADVICE r05: this operator performs a destructive
    # edit, and at ~1e13 windows a single 64-bit key has millions of
    # expected birthday collisions, each silently deleting an
    # unrelated span; 128 bits pushes the expected collision count to
    # ~1e-12). The salt is the FIRST hash argument: Spark's multi-arg
    # xxhash64 chains arguments through one running 64-bit state, so
    # a TRAILING salt would make h2 = XXH64(salt, seed=h1) — a pure
    # function of h1, adding zero collision resistance. Salt-first
    # changes the state before the slice is absorbed, so h1/h2
    # collide independently. No per-window string materialization
    # (the oracle builds md5 strings — also 128-bit; only equality
    # is compared within each engine, values never reach the output).
    spans = F.expr(
        f"transform(sequence(0, size(tokens)-{n}),"
        f" i -> struct(i AS pos, struct("
        f"xxhash64(slice(tokens, i + 1, {n})) AS h1,"
        f" xxhash64('salt2', slice(tokens, i + 1, {n})) AS h2) AS gh))"
    )
    w = (
        t.filter(F.size("tokens") >= n)
        .select("doc_id", F.explode_outer(spans).alias("s"))
        .select("doc_id", F.col("s.pos").alias("pos"), F.col("s.gh").alias("gh"))
    )
    occ_w = Window.partitionBy("gh").orderBy("doc_id", "pos")
    # rn >= 2 alone identifies every non-first occurrence (a second
    # row in a partition implies the partition has >= 2 rows), so no
    # COUNT(*) OVER companion is needed — one less window aggregate
    # in the widest post-shuffle stage (review r06).
    o = w.select(
        "doc_id",
        "pos",
        F.row_number().over(occ_w).alias("rn"),
    )
    cov = (
        o.filter(F.col("rn") >= 2)
        .select(
            "doc_id",
            F.explode(
                F.sequence(F.col("pos"), F.col("pos") + F.lit(n - 1))
            ).alias("tpos"),
        )
        .distinct()
    )
    tok = t.select(
        "doc_id",
        F.posexplode_outer("tokens").alias("tpos", "token"),
    )
    # LEFT join (covered rows flagged) instead of the old anti-join:
    # the SAME aggregate that rebuilds the cleaned text then also
    # counts each document's TOTAL tokens, so the third documents
    # scan (per-doc token counts) and the corpus-wide doc_id
    # SortMergeJoin that re-attached it are both gone (guide §2.4;
    # VERDICT r16 task 6 — this beats the suggested extra aggregate:
    # the count folds into the aggregate the rebuild already runs).
    # ``cov`` is distinct (doc_id, tpos), so the left join cannot
    # duplicate token rows; collect_list skips the NULL structs the
    # otherwise-less WHEN emits for covered positions, and an
    # all-covered document yields an empty list -> md5('') — exactly
    # the oracle's COALESCE for its absent ``rebuilt`` row. tokens is
    # never empty (split >= 1 element), so every doc_id aggregates.
    kept_tok = F.when(
        F.col("__cov").isNull(), F.struct("tpos", "token")
    )
    marked = tok.join(
        cov.withColumn("__cov", F.lit(True)), ["doc_id", "tpos"], "left"
    )
    return (
        marked.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_total"),
            F.sort_array(F.collect_list(kept_tok)).alias("kept"),
        )
        .select(
            "doc_id",
            F.col("n_total").cast("bigint").alias("n_tokens"),
            (F.col("n_total") - F.size("kept"))
            .cast("bigint")
            .alias("n_removed"),
            F.md5(
                F.array_join(
                    F.transform("kept", lambda s: s["token"]), " "
                )
            ).alias("cleaned_hash"),
        )
    )
