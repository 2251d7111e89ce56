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
           len(g2) AS n_bigrams,
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
    d = d.withColumn(
        "g2",
        F.expr(
            "transform(sequence(0, size(tokens)-2),"
            " i -> concat_ws(' ', tokens[i], tokens[i+1]))"
        ),
    ).withColumn(
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
        F.size("g2").alias("n_bigrams"),
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
    grams = F.expr(
        f"array_distinct(transform(sequence(0, size(tokens)-{n}), i -> "
        "concat_ws(' ', "
        + ", ".join(f"tokens[i+{j}]" for j in range(n))
        + ")))"
    )
    d = d.select("doc_id", grams.alias("g5"))
    bench = (
        d.filter(F.col("doc_id") % DECONTAM_BENCH_MOD == 0)
        .select(F.explode("g5").alias("gram"))
        .distinct()
        .withColumn("hit", F.lit(1))
    )
    cand = d.filter(F.col("doc_id") % DECONTAM_BENCH_MOD != 0).select(
        "doc_id", F.explode("g5").alias("gram")
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
    d = _tokens(_docs(spark, sf_dir)).withColumn("dl", F.size("tokens"))

    # NB: a two-parameter lambda would be called as (element, index) by
    # F.filter — bind the term via a closure, not a default argument.
    def _eq(term: str):
        return lambda x: x == F.lit(term)

    tf_cols = [
        F.size(F.filter("tokens", _eq(t))).alias(f"tf{i}")
        for i, t in enumerate(BM25_TERMS)
    ]
    tf = d.select("doc_id", "dl", *tf_cols)
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
