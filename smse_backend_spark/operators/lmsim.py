"""Dirichlet-smoothed language-model similarity (Zhai & Lafferty 2001) —
the standard alternative ranking function to BM25 (Lucene ships it as
``LMDirichletSimilarity``; Elasticsearch exposes it as the ``LMDirichlet``
per-field similarity).

Per matched (doc, term):

    p(t|C)  = (cf_t + 1) / (T + 1)          cf = collection frequency,
                                            T  = total tokens in corpus
    contrib = ln(1 + tf / (mu * p(t|C))) + ln(mu / (dl + mu))

clamped at >= 0 per term (Lucene's rule — a term cannot subtract), summed
over the query's matched terms. Determinism discipline: ``mu * p`` is one
identically-parenthesized double expression from integer counts on both
engines, each per-term contribution is floor-half-up quantized to 1e-6
BEFORE the clamp and the sum, so the aggregate is an order-independent
integer sum (the ``bigram_pmi`` ln-parity precedent covers the per-row
logarithms).

Scale shape (scan): one tokenize pass, per-(doc,term) tf restricted to the
query's terms, cf/T as tiny broadcast frames, ``TakeOrderedAndProject``
top-k — identical to the BM25 scan plan. The index path in
``index/query.py`` serves the same math from posting blocks + the
dictionary's cf column without touching the corpus.

Reference analog: the reference ranks by a single fixed similarity
(pgvector cosine, ``smse_backend/services/search.py:97-110``); a
pluggable second similarity is the Lucene-parity feature its search core
lacks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from smse_backend_spark import DEFAULT_TOP_K
from smse_backend_spark.functions.tokenizer import (
    doc_len_col,
    tokenize_col,
    tokenize_duckdb_sql,
)
from smse_backend_spark.operators.search import query_terms

DEFAULT_MU = 2000.0


def lm_contrib_col(tf_col, dl_col, mup_col, mu: float):
    """The per-(doc,term) quantized clamped contribution as a Column —
    written symbol-for-symbol like the SQL twin's expression."""
    raw = F.log(F.lit(1.0) + tf_col.cast("double") / mup_col) + F.log(
        F.lit(float(mu)) / (dl_col.cast("double") + F.lit(float(mu)))
    )
    return F.greatest(
        F.floor(raw * F.lit(1e6) + F.lit(0.5)).cast("long"), F.lit(0).cast("long")
    )


def lm_dirichlet_scan(
    corpus: DataFrame,
    query_text: str,
    k: int = DEFAULT_TOP_K,
    lang: str | None = None,
    mu: float = DEFAULT_MU,
) -> DataFrame:
    """Exact LM-Dirichlet top-k over a corpus DataFrame with a ``content``
    column. Returns (doc_id, score); order (score desc, doc_id asc)."""
    terms = query_terms(query_text)
    if lang is not None:
        corpus = corpus.filter(F.col("lang") == lang)
    empty = corpus.select(
        F.col("doc_id"), F.lit(0.0).alias("score")
    ).limit(0)
    if not terms:
        return empty

    docs = corpus.select(
        "doc_id",
        doc_len_col("content").alias("doc_len"),
        tokenize_col("content").alias("toks"),
    )
    tot = docs.agg(F.sum("doc_len")).first()[0]
    if not tot:
        return empty
    t_plus_1 = float(tot) + 1.0

    tf = (
        docs.select("doc_id", "doc_len", F.explode("toks").alias("term"))
        .filter(F.col("term").isin(terms))
        .groupBy("doc_id", "doc_len", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    # collection frequency per query term == sum of tf over its matched
    # docs (every occurrence is in some matched doc) -> tiny broadcast
    mup = (
        tf.groupBy("term")
        .agg(F.sum("tf").cast("double").alias("cf"))
        .select(
            "term",
            (F.lit(float(mu)) * ((F.col("cf") + F.lit(1.0)) / F.lit(t_plus_1)))
            .alias("mup"),
        )
    )
    return (
        tf.join(F.broadcast(mup), "term")
        .withColumn(
            "cq", lm_contrib_col(F.col("tf"), F.col("doc_len"), F.col("mup"), mu)
        )
        .groupBy("doc_id")
        .agg((F.sum("cq").cast("double") / F.lit(1e6)).alias("score"))
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(k)
    )


def lm_dirichlet_oracle_sql(
    query_text: str,
    k: int = DEFAULT_TOP_K,
    lang: str | None = None,
    mu: float = DEFAULT_MU,
    table: str = "documents",
    content_col: str = "text",
) -> str:
    """DuckDB twin: same tokenizer, same identically-parenthesized math,
    same per-term quantize-then-clamp-then-integer-sum."""
    terms = query_terms(query_text)
    if not terms:
        return f"SELECT doc_id, 0.0 AS score FROM {table} WHERE false"
    in_list = ", ".join("'" + t.replace("'", "''") + "'" for t in terms)
    where_lang = f"WHERE lang = '{lang}'" if lang is not None else ""
    toks = tokenize_duckdb_sql(content_col)
    m = repr(float(mu))
    contrib = (
        f"ln(1.0 + (tf.tf::DOUBLE / mup.mup)) + "
        f"ln({m} / (tf.doc_len::DOUBLE + {m}))"
    )
    return f"""
WITH docs AS (
  SELECT doc_id, {toks} AS toks FROM {table} {where_lang}
),
dl AS (
  SELECT doc_id, toks, len(toks)::BIGINT AS doc_len FROM docs
),
stats AS (
  SELECT sum(doc_len)::DOUBLE AS t FROM dl
),
tok AS (
  SELECT doc_id, doc_len, unnest(toks) AS term FROM dl
),
tf AS (
  SELECT doc_id, doc_len, term, count(*)::BIGINT AS tf
  FROM tok WHERE term IN ({in_list})
  GROUP BY doc_id, doc_len, term
),
cfq AS (
  SELECT term, sum(tf)::DOUBLE AS cf FROM tf GROUP BY term
),
mup AS (
  SELECT term, {m} * ((cf + 1.0) / (stats.t + 1.0)) AS mup
  FROM cfq CROSS JOIN stats
)
SELECT tf.doc_id AS doc_id,
       (sum(greatest(floor(({contrib}) * 1e6 + 0.5)::BIGINT, 0))::DOUBLE
        / 1e6) AS score
FROM tf JOIN mup USING (term)
GROUP BY tf.doc_id
ORDER BY score DESC, doc_id ASC
LIMIT {k}
"""
