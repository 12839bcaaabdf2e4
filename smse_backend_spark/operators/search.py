"""BM25 top-k retrieval — scan mode (index-free) plus the oracle-SQL builder.

Scan mode is the M0 semantics anchor: tokenize -> per-(doc,term) tf ->
df/avgdl stats -> BM25 column algebra -> distributed top-k
(``TakeOrderedAndProject``). It replaces the reference's per-query pgvector
full scan (``smse_backend/services/search.py:97-110`` — which has no ANN
index: exact scan + ORDER BY + LIMIT per query); the segment index in
``smse_backend_spark.index`` is the scale path, and MUST stay rank-identical
to this scorer (regression-tested).

The ``lang`` filter mirrors the reference's modality predicate
(``services/search.py:106``): it restricts the candidate corpus, and corpus
statistics (N, avgdl, df) are computed over the restricted set.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from smse_backend_spark import DEFAULT_TOP_K
from smse_backend_spark.functions.bm25 import (
    bm25_term_score_col,
    bm25_term_score_sql,
    idf_col,
    idf_sql,
)
from smse_backend_spark.functions.tokenizer import (
    doc_len_col,
    tokenize_col,
    tokenize_duckdb_sql,
    tokenize_py,
)


def query_terms(query_text: str) -> list[str]:
    """Unique query terms, sorted — BM25 uses set semantics over the query."""
    return sorted(set(tokenize_py(query_text)))


def bm25_topk_scan(
    corpus: DataFrame,
    query_text: str,
    k: int = DEFAULT_TOP_K,
    lang: str | None = None,
) -> DataFrame:
    """Exact BM25 top-k over a corpus DataFrame with a ``content`` column.

    Returns (doc_id, score) — score rounded to 6 dp for cross-engine hash
    stability; ORDER is (score desc, doc_id asc) and the plan's top is
    ``TakeOrderedAndProject`` (no global sort materialization).
    """
    terms = query_terms(query_text)
    if lang is not None:
        corpus = corpus.filter(F.col("lang") == lang)
    if not terms:
        return corpus.select(
            F.col("doc_id"), F.lit(0.0).alias("score")
        ).limit(0)

    docs = corpus.select("doc_id", doc_len_col("content").alias("doc_len"),
                         tokenize_col("content").alias("toks"))
    n_docs, avgdl = docs.agg(
        F.count(F.lit(1)).cast("double"), F.avg("doc_len")
    ).first()
    if not n_docs:
        return corpus.select(F.col("doc_id"), F.lit(0.0).alias("score")).limit(0)

    tf = (
        docs.select("doc_id", "doc_len", F.explode("toks").alias("term"))
        .filter(F.col("term").isin(terms))
        .groupBy("doc_id", "doc_len", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    # df per query term over the candidate corpus; tiny (<= |q| rows) -> broadcast
    df_t = tf.groupBy("term").agg(F.count(F.lit(1)).cast("double").alias("df"))
    scored = (
        tf.join(F.broadcast(df_t), "term")
        .withColumn("idf", idf_col(F.col("df"), n_docs))
        .withColumn(
            "contrib",
            bm25_term_score_col(F.col("tf"), F.col("idf"), F.col("doc_len"), float(avgdl)),
        )
        .groupBy("doc_id")
        .agg(F.round(F.sum("contrib"), 6).alias("score"))
    )
    return scored.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)


def bm25_scan_oracle_sql(
    query_text: str,
    k: int = DEFAULT_TOP_K,
    lang: str | None = None,
    table: str = "documents",
    content_col: str = "text",
    exclude_where: str | None = None,
) -> str:
    """DuckDB SQL computing the identical result (same tokenizer, same math).

    ``exclude_where``: doc predicate applied AFTER stats/df are computed —
    the soft-delete twin (tombstoned docs keep counting into global BM25
    stats, Lucene-style, but cannot appear in results). For a physically
    deleted corpus pass a filtered subquery as ``table`` instead, which
    recomputes stats over the survivors."""
    terms = query_terms(query_text)
    if not terms:
        return f"SELECT doc_id, 0.0 AS score FROM {table} WHERE false"
    in_list = ", ".join("'" + t.replace("'", "''") + "'" for t in terms)
    where_lang = f"WHERE lang = '{lang}'" if lang is not None else ""
    toks = tokenize_duckdb_sql(content_col)
    score = bm25_term_score_sql(
        "tf.tf", idf_sql("dfq.df", "stats.n"), "tf.doc_len", "stats.avgdl"
    )
    return f"""
WITH docs AS (
  SELECT doc_id, {toks} AS toks FROM {table} {where_lang}
),
dl AS (
  SELECT doc_id, toks, len(toks)::BIGINT AS doc_len FROM docs
),
stats AS (
  SELECT count(*)::DOUBLE AS n, avg(doc_len) AS avgdl FROM dl
),
tok AS (
  SELECT doc_id, doc_len, unnest(toks) AS term FROM dl
),
tf AS (
  SELECT doc_id, doc_len, term, count(*)::BIGINT AS tf
  FROM tok WHERE term IN ({in_list})
  GROUP BY doc_id, doc_len, term
),
dfq AS (
  SELECT term, count(*)::DOUBLE AS df FROM tf GROUP BY term
)
SELECT tf.doc_id AS doc_id, round(sum({score}), 6) AS score
FROM tf JOIN dfq USING (term) CROSS JOIN stats
{f"WHERE {exclude_where}" if exclude_where else ""}
GROUP BY tf.doc_id
ORDER BY score DESC, doc_id ASC
LIMIT {k}
"""


def bm25_phrase_oracle_sql(
    phrase_text: str,
    k: int = DEFAULT_TOP_K,
    lang: str | None = None,
    table: str = "documents",
    content_col: str = "text",
) -> str:
    """DuckDB twin of ``InvertedIndex.phrase_topk``: phrase tf counted by
    scanning each doc's token list for consecutive matches; phrase df
    (docs with >=1 occurrence) drives a single idf."""
    from smse_backend_spark.functions.tokenizer import tokenize_py

    terms = tokenize_py(phrase_text)
    if not terms:
        return f"SELECT doc_id, 0.0 AS score FROM {table} WHERE false"
    L = len(terms)
    cond = " AND ".join(
        f"toks[i + {j}] = '" + t.replace("'", "''") + "'"
        for j, t in enumerate(terms)
    )
    where_lang = f"WHERE lang = '{lang}'" if lang is not None else ""
    toks = tokenize_duckdb_sql(content_col)
    score = bm25_term_score_sql(
        "h.ptf", idf_sql("dfp.df", "stats.n"), "h.doc_len", "stats.avgdl"
    )
    return f"""
WITH docs AS (
  SELECT doc_id, {toks} AS toks FROM {table} {where_lang}
),
dl AS (
  SELECT doc_id, toks, len(toks)::BIGINT AS doc_len FROM docs
),
stats AS (
  SELECT count(*)::DOUBLE AS n, avg(doc_len) AS avgdl FROM dl
),
pm AS (
  SELECT doc_id, doc_len,
         CASE WHEN doc_len < {L} THEN 0 ELSE
           len(list_filter(generate_series(1, len(toks) - {L - 1}),
                           i -> {cond}))
         END::BIGINT AS ptf
  FROM dl
),
h AS (SELECT doc_id, doc_len, ptf FROM pm WHERE ptf > 0),
dfp AS (SELECT count(*)::DOUBLE AS df FROM h)
SELECT h.doc_id AS doc_id, round({score}, 6) AS score
FROM h CROSS JOIN dfp CROSS JOIN stats
ORDER BY score DESC, doc_id ASC
LIMIT {k}
"""


def bm25_fuzzy_oracle_sql(
    term: str,
    max_edits: int = 1,
    k: int = DEFAULT_TOP_K,
    lang: str | None = None,
    max_expansions: int = 64,
    table: str = "documents",
    content_col: str = "text",
) -> str:
    """DuckDB twin of ``InvertedIndex.bm25_topk_fuzzy``: the expansion set
    (terms within Levenshtein distance ``max_edits``, ranked df desc /
    term asc, capped) is derived from the corpus itself — identical to the
    index dictionary by construction — then scored as the OR of the
    expanded terms. DuckDB's ``levenshtein`` computes the same
    unit-cost metric as Spark's expression and the driver-side DP."""
    toks = query_terms(term)
    if len(toks) != 1:
        raise ValueError(f"fuzzy oracle takes exactly one term, got {toks!r}")
    esc = toks[0].replace("'", "''")
    where_lang = f"WHERE lang = '{lang}'" if lang is not None else ""
    toksql = tokenize_duckdb_sql(content_col)
    score = bm25_term_score_sql(
        "tf.tf", idf_sql("dfq.df", "stats.n"), "tf.doc_len", "stats.avgdl"
    )
    return f"""
WITH docs AS (
  SELECT doc_id, {toksql} AS toks FROM {table} {where_lang}
),
dl AS (
  SELECT doc_id, toks, len(toks)::BIGINT AS doc_len FROM docs
),
stats AS (
  SELECT count(*)::DOUBLE AS n, avg(doc_len) AS avgdl FROM dl
),
tok AS (
  SELECT doc_id, doc_len, unnest(toks) AS term FROM dl
),
exp AS (
  SELECT term FROM (
    SELECT term, count(DISTINCT doc_id) AS df
    FROM tok WHERE levenshtein(term, '{esc}') <= {max_edits} GROUP BY term
  ) ORDER BY df DESC, term ASC LIMIT {max_expansions}
),
tf AS (
  SELECT doc_id, doc_len, term, count(*)::BIGINT AS tf
  FROM tok JOIN exp USING (term)
  GROUP BY doc_id, doc_len, term
),
dfq AS (
  SELECT term, count(*)::DOUBLE AS df FROM tf GROUP BY term
)
SELECT tf.doc_id AS doc_id, round(sum({score}), 6) AS score
FROM tf JOIN dfq USING (term) CROSS JOIN stats
GROUP BY tf.doc_id
ORDER BY score DESC, doc_id ASC
LIMIT {k}
"""


def bm25_prefix_oracle_sql(
    prefix: str,
    k: int = DEFAULT_TOP_K,
    lang: str | None = None,
    max_expansions: int = 64,
    table: str = "documents",
    content_col: str = "text",
) -> str:
    """DuckDB twin of ``InvertedIndex.bm25_topk_prefix``: the expansion set
    (terms starting with the prefix, ranked df desc / term asc, capped) is
    derived from the corpus itself — identical to the index dictionary by
    construction — then scored as the OR of the expanded terms."""
    esc = prefix.replace("'", "''")
    where_lang = f"WHERE lang = '{lang}'" if lang is not None else ""
    toks = tokenize_duckdb_sql(content_col)
    score = bm25_term_score_sql(
        "tf.tf", idf_sql("dfq.df", "stats.n"), "tf.doc_len", "stats.avgdl"
    )
    return f"""
WITH docs AS (
  SELECT doc_id, {toks} AS toks FROM {table} {where_lang}
),
dl AS (
  SELECT doc_id, toks, len(toks)::BIGINT AS doc_len FROM docs
),
stats AS (
  SELECT count(*)::DOUBLE AS n, avg(doc_len) AS avgdl FROM dl
),
tok AS (
  SELECT doc_id, doc_len, unnest(toks) AS term FROM dl
),
exp AS (
  SELECT term FROM (
    SELECT term, count(DISTINCT doc_id) AS df
    FROM tok WHERE starts_with(term, '{esc}') GROUP BY term
  ) ORDER BY df DESC, term ASC LIMIT {max_expansions}
),
tf AS (
  SELECT doc_id, doc_len, term, count(*)::BIGINT AS tf
  FROM tok JOIN exp USING (term)
  GROUP BY doc_id, doc_len, term
),
dfq AS (
  SELECT term, count(*)::DOUBLE AS df FROM tf GROUP BY term
)
SELECT tf.doc_id AS doc_id, round(sum({score}), 6) AS score
FROM tf JOIN dfq USING (term) CROSS JOIN stats
GROUP BY tf.doc_id
ORDER BY score DESC, doc_id ASC
LIMIT {k}
"""
