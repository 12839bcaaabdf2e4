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
    min_match: int | None = None,
) -> DataFrame:
    """Exact BM25 top-k over a corpus DataFrame with a ``content`` column.

    Returns (doc_id, score) — score rounded to 6 dp for cross-engine hash
    stability; ORDER is (score desc, doc_id asc) and the plan's top is
    ``TakeOrderedAndProject`` (no global sort materialization).

    ``min_match``: docs must match at least this many distinct query terms
    (Lucene minimumNumberShouldMatch — a filter, never a rescore); the
    default keeps OR semantics.
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
        .agg(
            F.round(F.sum("contrib"), 6).alias("score"),
            F.count(F.lit(1)).alias("nmatch"),
        )
    )
    if min_match is not None:
        scored = scored.filter(F.col("nmatch") >= min_match)
    return (
        scored.select("doc_id", "score")
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(k)
    )


def multi_field_bm25_scan(
    corpus: DataFrame,
    query_text: str,
    field_weights: dict[str, float] | None = None,
    k: int = DEFAULT_TOP_K,
    lang: str | None = None,
) -> DataFrame:
    """Fielded BM25 (Lucene multi-field query with per-field boosts): each
    field is scored as its own BM25 space — field-local df, avgdl, and
    doc_len — and a doc's total is the weighted sum of its per-field
    scores. The code-search shape: a hit in ``path`` (file/symbol name)
    usually deserves a higher boost than one in ``content``.

    Plan: ONE corpus scan — the fields stack into an exploded
    (doc_id, field, toks) frame, so adding fields adds no extra scans;
    per-(field, term) df stays tiny and broadcasts; the weighted sum is
    a single aggregation with a ``TakeOrderedAndProject`` top.
    """
    if field_weights is None:
        field_weights = {"content": 1.0, "path": 2.0}
    terms = query_terms(query_text)
    if lang is not None:
        corpus = corpus.filter(F.col("lang") == lang)
    if not terms or not field_weights:
        return corpus.select("doc_id", F.lit(0.0).alias("score")).limit(0)
    fields = sorted(field_weights)
    stacked = F.array(*[
        F.struct(
            F.lit(f).alias("field"),
            tokenize_col(f).alias("toks"),
            doc_len_col(f).alias("doc_len"),
        )
        for f in fields
    ])
    base = corpus.select("doc_id", F.explode(stacked).alias("x")).select(
        "doc_id", "x.field", "x.toks", "x.doc_len"
    )
    stats = {
        r["field"]: (float(r["n"]), float(r["avgdl"]))
        for r in base.groupBy("field")
        .agg(F.count(F.lit(1)).alias("n"), F.avg("doc_len").alias("avgdl"))
        .collect()
    }
    if not stats:
        return corpus.select("doc_id", F.lit(0.0).alias("score")).limit(0)
    n_docs = next(iter(stats.values()))[0]  # identical across fields
    avgdl_c = F.coalesce(
        *[F.when(F.col("field") == f, F.lit(a)) for f, (_n, a) in stats.items()]
    )
    w_c = F.coalesce(
        *[
            F.when(F.col("field") == f, F.lit(float(field_weights[f])))
            for f in fields
        ]
    )
    tf = (
        base.select("doc_id", "field", "doc_len", F.explode("toks").alias("term"))
        .filter(F.col("term").isin(terms))
        .groupBy("doc_id", "field", "doc_len", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    df_t = tf.groupBy("field", "term").agg(
        F.count(F.lit(1)).cast("double").alias("df")
    )
    return (
        tf.join(F.broadcast(df_t), ["field", "term"])
        .withColumn("idf", idf_col(F.col("df"), n_docs))
        .withColumn(
            "contrib",
            w_c
            * bm25_term_score_col(
                F.col("tf"), F.col("idf"), F.col("doc_len"), avgdl_c
            ),
        )
        .groupBy("doc_id")
        .agg(F.round(F.sum("contrib"), 6).alias("score"))
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(k)
    )


def corpus_path_sql() -> str:
    """The synthesized ``path`` column as DuckDB SQL — the exact twin of
    the expression in :func:`smse_backend_spark.corpus.load_corpus`."""
    from smse_backend_spark.corpus import LANG_EXT

    whens = " ".join(f"WHEN '{lg}' THEN '{ex}'" for lg, ex in sorted(LANG_EXT.items()))
    ext = f"(CASE lang {whens} ELSE 'txt' END)"
    return (
        "('src/m' || (doc_id % 50)::VARCHAR || '/f' || doc_id::VARCHAR "
        f"|| '.' || {ext})"
    )


def multi_field_oracle_sql(
    query_text: str,
    field_weights: dict[str, float] | None = None,
    k: int = DEFAULT_TOP_K,
    lang: str | None = None,
    table: str = "documents",
    content_col: str = "text",
) -> str:
    """DuckDB twin of :func:`multi_field_bm25_scan` over the synthesized
    corpus fields (``content`` = text, ``path`` = the deterministic path
    expression). Per-field BM25 spaces, weighted sum, same rounding."""
    if field_weights is None:
        field_weights = {"content": 1.0, "path": 2.0}
    terms = query_terms(query_text)
    if not terms or not field_weights:
        return f"SELECT doc_id, 0.0 AS score FROM {table} WHERE false"
    field_expr = {"content": content_col, "path": corpus_path_sql()}
    unknown = set(field_weights) - set(field_expr)
    if unknown:
        raise ValueError(f"oracle has no SQL source for fields {sorted(unknown)}")
    in_list = ", ".join("'" + t.replace("'", "''") + "'" for t in terms)
    where_lang = f"WHERE lang = '{lang}'" if lang is not None else ""
    branches = "\n  UNION ALL\n".join(
        f"SELECT doc_id, '{f}' AS field, "
        f"{tokenize_duckdb_sql(field_expr[f])} AS toks FROM {table} {where_lang}"
        for f in sorted(field_weights)
    )
    wvals = ", ".join(
        f"('{f}', {float(w)!r})" for f, w in sorted(field_weights.items())
    )
    score = bm25_term_score_sql(
        "tf.tf", idf_sql("dfq.df", "stats.n"), "tf.doc_len", "stats.avgdl"
    )
    return f"""
WITH base AS (
  {branches}
),
dl AS (
  SELECT doc_id, field, toks, len(toks)::BIGINT AS doc_len FROM base
),
stats AS (
  SELECT field, count(*)::DOUBLE AS n, avg(doc_len) AS avgdl
  FROM dl GROUP BY field
),
tok AS (
  SELECT doc_id, field, doc_len, unnest(toks) AS term FROM dl
),
tf AS (
  SELECT doc_id, field, doc_len, term, count(*)::BIGINT AS tf
  FROM tok WHERE term IN ({in_list})
  GROUP BY doc_id, field, doc_len, term
),
dfq AS (
  SELECT field, term, count(*)::DOUBLE AS df FROM tf GROUP BY field, term
),
w AS (SELECT * FROM (VALUES {wvals}) AS w(field, wt))
SELECT tf.doc_id AS doc_id, round(sum(w.wt * ({score})), 6) AS score
FROM tf
JOIN dfq USING (field, term)
JOIN stats USING (field)
JOIN w USING (field)
GROUP BY tf.doc_id
ORDER BY score DESC, doc_id ASC
LIMIT {k}
"""


def bm25_scan_oracle_sql(
    query_text: str,
    k: int = DEFAULT_TOP_K,
    lang: str | None = None,
    table: str = "documents",
    content_col: str = "text",
    exclude_where: str | None = None,
    min_match: int | None = None,
) -> str:
    """DuckDB SQL computing the identical result (same tokenizer, same math).

    ``exclude_where``: doc predicate applied AFTER stats/df are computed —
    the soft-delete twin (tombstoned docs keep counting into global BM25
    stats, Lucene-style, but cannot appear in results). For a physically
    deleted corpus pass a filtered subquery as ``table`` instead, which
    recomputes stats over the survivors.

    ``min_match``: HAVING >= this many matched distinct terms per doc
    (the minimum-should-match / conjunctive twin; scoring unchanged)."""
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
{f"HAVING count(*) >= {min_match}" if min_match is not None else ""}
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

def bm25_regex_oracle_sql(
    pattern: str,
    k: int = DEFAULT_TOP_K,
    lang: str | None = None,
    max_expansions: int = 64,
    table: str = "documents",
    content_col: str = "text",
) -> str:
    """DuckDB twin of ``InvertedIndex.bm25_topk_regex``: the expansion set
    (dictionary terms fully matching the pattern, ranked df desc / term
    asc, capped) is derived from the corpus itself, then OR-scored.
    Patterns must stay in the RE2-compatible subset (see
    ``InvertedIndex.expand_regex``)."""
    esc = pattern.replace("'", "''")
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
    FROM tok WHERE regexp_full_match(term, '{esc}') GROUP BY term
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


def hit_count_oracle_sql(
    query_text: str,
    lang: str | None = None,
    table: str = "documents",
    content_col: str = "text",
) -> str:
    """DuckDB twin of ``InvertedIndex.count_matches``: distinct docs
    containing >= 1 query term."""
    terms = query_terms(query_text)
    if not terms:
        return "SELECT 0::BIGINT AS n_hits"
    in_list = ", ".join("'" + t.replace("'", "''") + "'" for t in terms)
    where_lang = f"WHERE lang = '{lang}'" if lang is not None else ""
    toks = tokenize_duckdb_sql(content_col)
    return f"""
WITH docs AS (
  SELECT doc_id, {toks} AS toks FROM {table} {where_lang}
),
tok AS (
  SELECT doc_id, unnest(toks) AS term FROM docs
)
SELECT count(DISTINCT doc_id)::BIGINT AS n_hits
FROM tok WHERE term IN ({in_list})
"""


def facet_counts_oracle_sql(
    query_text: str,
    facet_cols: tuple[tuple[str, str], ...] = (("lang", "lang"), ("source", "repo")),
    lang: str | None = None,
    table: str = "documents",
    content_col: str = "text",
) -> str:
    """DuckDB twin of ``InvertedIndex.facet_counts``: doc counts per facet
    value combination over the query's OR match set. ``facet_cols`` is a
    tuple of (documents-table column, output alias) pairs — the aliases
    must match the engine-side corpus column names (``source`` -> ``repo``
    under the corpus mapping in :mod:`smse_backend_spark.corpus`)."""
    terms = query_terms(query_text)
    in_list = ", ".join("'" + t.replace("'", "''") + "'" for t in terms)
    where_lang = f"WHERE lang = '{lang}'" if lang is not None else ""
    toks = tokenize_duckdb_sql(content_col)
    fsel = ", ".join(f"d.{c} AS {a}" for c, a in facet_cols)
    fgrp = ", ".join(f"d.{c}" for c, _a in facet_cols)
    ford = ", ".join(f"{a} ASC" for _c, a in facet_cols)
    return f"""
WITH docs AS (
  SELECT doc_id, {toks} AS toks FROM {table} {where_lang}
),
tok AS (
  SELECT doc_id, unnest(toks) AS term FROM docs
),
m AS (
  SELECT DISTINCT doc_id FROM tok WHERE term IN ({in_list})
)
SELECT {fsel}, count(*)::BIGINT AS n_docs
FROM {table} d JOIN m USING (doc_id)
GROUP BY {fgrp}
ORDER BY n_docs DESC, {ford}
"""


def more_like_this_oracle_sql(
    doc_id: int,
    k: int = DEFAULT_TOP_K,
    max_terms: int = 8,
    lang: str | None = None,
    table: str = "documents",
    content_col: str = "text",
) -> str:
    """DuckDB twin of ``InvertedIndex.more_like_this``: select the source
    doc's top ``max_terms`` terms by 6dp-floored tf*idf (weight desc, term
    asc), score them as an OR query, exclude the source doc. The floored
    rounding (``floor(x*1e6+0.5)/1e6``) is written identically on both
    sides — exact cross-engine tie behavior in the term ranking."""
    where_lang = f"WHERE lang = '{lang}'" if lang is not None else ""
    toksql = tokenize_duckdb_sql(content_col)
    sel_idf = idf_sql("dfall.df", "stats.n")
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
src AS (
  SELECT term, count(*)::BIGINT AS tf FROM tok
  WHERE doc_id = {doc_id} GROUP BY term
),
dfall AS (
  SELECT term, count(DISTINCT doc_id)::DOUBLE AS df FROM tok
  WHERE term IN (SELECT term FROM src) GROUP BY term
),
sel AS (
  SELECT s.term
  FROM src s JOIN dfall USING (term) CROSS JOIN stats
  ORDER BY floor(s.tf * {sel_idf} * 1e6 + 0.5) / 1e6 DESC, s.term ASC
  LIMIT {max_terms}
),
tf AS (
  SELECT doc_id, doc_len, term, count(*)::BIGINT AS tf
  FROM tok JOIN sel USING (term)
  GROUP BY doc_id, doc_len, term
),
dfq AS (
  SELECT term, count(*)::DOUBLE AS df FROM tf GROUP BY term
)
SELECT tf.doc_id AS doc_id, round(sum({score}), 6) AS score
FROM tf JOIN dfq USING (term) CROSS JOIN stats
WHERE tf.doc_id != {doc_id}
GROUP BY tf.doc_id
ORDER BY score DESC, doc_id ASC
LIMIT {k}
"""


def near_oracle_sql(
    query_text: str,
    window: int,
    k: int = DEFAULT_TOP_K,
    lang: str | None = None,
    table: str = "documents",
    content_col: str = "text",
) -> str:
    """DuckDB twin of ``InvertedIndex.near_topk``: docs where every distinct
    query term occurs and some choice of one occurrence per term spans at
    most ``window`` tokens; scored as the conjunctive BM25 sum (global df,
    full doc tf) restricted to the proximity match set."""
    terms = query_terms(query_text)
    if not terms:
        return f"SELECT doc_id, 0.0 AS score FROM {table} WHERE false"
    in_list = ", ".join("'" + t.replace("'", "''") + "'" for t in terms)
    where_lang = f"WHERE lang = '{lang}'" if lang is not None else ""
    toksql = tokenize_duckdb_sql(content_col)
    score = bm25_term_score_sql(
        "tf.tf", idf_sql("dfq.df", "stats.n"), "tf.doc_len", "stats.avgdl"
    )
    pos_ctes = ",\n".join(
        f"""p{i} AS (
  SELECT doc_id, unnest(list_filter(generate_series(1, len(toks)),
                                    j -> toks[j] = '{t.replace("'", "''")}')) AS p
  FROM dl
)"""
        for i, t in enumerate(terms)
    )
    join_chain = " ".join(f"JOIN p{i} USING (doc_id)" for i in range(1, len(terms)))
    ps = ", ".join(f"p{i}.p" for i in range(len(terms)))
    win = (
        f"greatest({ps}) - least({ps}) <= {window}"
        if len(terms) > 1
        else "TRUE"
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
tf AS (
  SELECT doc_id, doc_len, term, count(*)::BIGINT AS tf
  FROM tok WHERE term IN ({in_list})
  GROUP BY doc_id, doc_len, term
),
dfq AS (
  SELECT term, count(*)::DOUBLE AS df FROM tf GROUP BY term
),
{pos_ctes},
m AS (
  SELECT DISTINCT p0.doc_id FROM p0 {join_chain} WHERE {win}
)
SELECT tf.doc_id AS doc_id, round(sum({score}), 6) AS score
FROM tf JOIN dfq USING (term) CROSS JOIN stats JOIN m ON tf.doc_id = m.doc_id
GROUP BY tf.doc_id
ORDER BY score DESC, doc_id ASC
LIMIT {k}
"""


def suggest_oracle_sql(
    term: str,
    max_edits: int = 2,
    n: int = 10,
    lang: str | None = None,
    table: str = "documents",
    content_col: str = "text",
) -> str:
    """DuckDB twin of ``InvertedIndex.suggest``: corpus-derived dictionary
    terms within Levenshtein ``max_edits``, ranked (dist asc, df desc,
    term asc), capped."""
    toks = query_terms(term)
    if len(toks) != 1:
        raise ValueError(f"suggest oracle takes exactly one term, got {toks!r}")
    esc = toks[0].replace("'", "''")
    where_lang = f"WHERE lang = '{lang}'" if lang is not None else ""
    toksql = tokenize_duckdb_sql(content_col)
    return f"""
WITH docs AS (
  SELECT doc_id, {toksql} AS toks FROM {table} {where_lang}
),
tok AS (
  SELECT doc_id, unnest(toks) AS term FROM docs
),
dict AS (
  SELECT term, count(DISTINCT doc_id)::BIGINT AS df FROM tok GROUP BY term
)
SELECT term, df, levenshtein(term, '{esc}')::INT AS dist
FROM dict
WHERE levenshtein(term, '{esc}') <= {max_edits}
ORDER BY dist ASC, df DESC, term ASC
LIMIT {n}
"""

def highlight_snippets(
    corpus: DataFrame,
    topk: DataFrame,
    query_text: str,
    window: int = 3,
    lang: str | None = None,
) -> DataFrame:
    """Attach a highlighted token-window snippet to each top-k hit:
    (doc_id, score, snippet) — the search-results display shape.

    Snippet rule (deterministic on both engines): among the query terms
    present in the doc, pick the rarest (corpus df asc, term asc); the
    snippet is the token window ``[p-window, p+window]`` around that
    term's FIRST occurrence, with every occurrence of the term inside the
    window wrapped in ``<em>`` tags.

    Plan: the tiny top-k side broadcasts into the corpus join, the corpus
    scan reads only (doc_id, content), and everything after tokenization
    is JVM Column algebra (array_position / slice / transform) — no UDF.
    """
    terms = query_terms(query_text)
    if lang is not None:
        corpus = corpus.filter(F.col("lang") == lang)
    toks_df = corpus.select("doc_id", tokenize_col("content").alias("toks"))
    if not terms:
        return topk.select("doc_id", "score", F.lit(None).cast("string").alias("snippet")).limit(0)
    dfs = {
        r["term"]: r["df"]
        for r in toks_df.select(
            F.explode(F.array_distinct("toks")).alias("term")
        )
        .filter(F.col("term").isin(terms))
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("df"))
        .collect()
    }
    ordered = sorted((t for t in terms if t in dfs), key=lambda t: (dfs[t], t))
    if not ordered:
        return topk.select(
            "doc_id", "score", F.lit(None).cast("string").alias("snippet")
        ).limit(0)
    chosen = F.coalesce(
        *[
            F.when(F.array_contains("toks", t), F.lit(t))
            for t in ordered
        ]
    )
    joined = toks_df.join(F.broadcast(topk), "doc_id").withColumn("pick", chosen)
    p = F.array_position("toks", F.col("pick"))
    lo = F.greatest(F.lit(1), p - window)
    length = p + window - lo + 1
    win = F.slice("toks", lo, length)
    snippet = F.array_join(
        F.transform(
            win,
            lambda x: F.when(
                x == F.col("pick"), F.concat(F.lit("<em>"), x, F.lit("</em>"))
            ).otherwise(x),
        ),
        " ",
    )
    return (
        joined.select("doc_id", "score", snippet.alias("snippet"))
        .orderBy(F.desc("score"), F.asc("doc_id"))
    )


def highlight_snippets_oracle_sql(
    query_text: str,
    k: int = DEFAULT_TOP_K,
    window: int = 3,
    lang: str | None = None,
    table: str = "documents",
    content_col: str = "text",
) -> str:
    """DuckDB twin of ``highlight_snippets`` over the scan top-k: same
    rarest-term pick (df asc, term asc), same first-occurrence token
    window, same <em> marking."""
    terms = query_terms(query_text)
    if not terms:
        return f"SELECT doc_id, 0.0 AS score, NULL AS snippet FROM {table} WHERE false"
    in_list = ", ".join("'" + t.replace("'", "''") + "'" for t in terms)
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
tf AS (
  SELECT doc_id, doc_len, term, count(*)::BIGINT AS tf
  FROM tok WHERE term IN ({in_list})
  GROUP BY doc_id, doc_len, term
),
dfq AS (
  SELECT term, count(*)::DOUBLE AS df FROM tf GROUP BY term
),
topk AS (
  SELECT tf.doc_id AS doc_id, round(sum({score}), 6) AS score
  FROM tf JOIN dfq USING (term) CROSS JOIN stats
  GROUP BY tf.doc_id
  ORDER BY score DESC, doc_id ASC
  LIMIT {k}
),
pick AS (
  SELECT doc_id, term,
         row_number() OVER (PARTITION BY doc_id ORDER BY df ASC, term ASC) AS rn
  FROM tf JOIN dfq USING (term)
),
snip AS (
  SELECT t.doc_id, t.score, p.term,
         list_position(d.toks, p.term) AS pos, d.toks
  FROM topk t JOIN pick p ON t.doc_id = p.doc_id AND p.rn = 1
  JOIN dl d ON d.doc_id = t.doc_id
)
SELECT doc_id, score,
       array_to_string(
         list_transform(
           toks[greatest(1, pos - {window}) : pos + {window}],
           x -> CASE WHEN x = term THEN '<em>' || x || '</em>' ELSE x END
         ), ' '
       ) AS snippet
FROM snip
ORDER BY score DESC, doc_id ASC
"""


def explain_scores_oracle_sql(
    query_text: str,
    k: int = DEFAULT_TOP_K,
    lang: str | None = None,
    table: str = "documents",
    content_col: str = "text",
) -> str:
    """DuckDB twin of ``InvertedIndex.explain_scores``: per-(doc, term)
    BM25 contribution rows for the top-k docs, idf/contrib floored-half-
    rounded to 6dp identically on both engines."""
    terms = query_terms(query_text)
    if not terms:
        return (
            "SELECT doc_id, '' AS term, 0::BIGINT AS tf, 0.0 AS idf, "
            f"0.0 AS contrib, 0.0 AS score FROM {table} WHERE false"
        )
    in_list = ", ".join("'" + t.replace("'", "''") + "'" for t in terms)
    where_lang = f"WHERE lang = '{lang}'" if lang is not None else ""
    toksql = tokenize_duckdb_sql(content_col)
    idf = idf_sql("dfq.df", "stats.n")
    score = bm25_term_score_sql("tf.tf", idf, "tf.doc_len", "stats.avgdl")
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
tf AS (
  SELECT doc_id, doc_len, term, count(*)::BIGINT AS tf
  FROM tok WHERE term IN ({in_list})
  GROUP BY doc_id, doc_len, term
),
dfq AS (
  SELECT term, count(*)::DOUBLE AS df FROM tf GROUP BY term
),
c AS (
  SELECT tf.doc_id AS doc_id, tf.term AS term, tf.tf AS tf,
         {idf} AS idf, {score} AS contrib
  FROM tf JOIN dfq USING (term) CROSS JOIN stats
),
tot AS (
  SELECT doc_id, round(sum(contrib), 6) AS score
  FROM c GROUP BY doc_id
  ORDER BY score DESC, doc_id ASC
  LIMIT {k}
)
SELECT c.doc_id AS doc_id, c.term AS term, c.tf AS tf,
       floor(c.idf * 1e6 + 0.5) / 1e6 AS idf,
       floor(c.contrib * 1e6 + 0.5) / 1e6 AS contrib,
       t.score AS score
FROM c JOIN tot t USING (doc_id)
ORDER BY score DESC, doc_id ASC, term ASC
"""


def bm25_synonyms_oracle_sql(
    groups: list[list[str] | str],
    k: int = DEFAULT_TOP_K,
    lang: str | None = None,
    table: str = "documents",
    content_col: str = "text",
) -> str:
    """DuckDB twin of ``InvertedIndex.bm25_topk_synonyms``: each group is
    one pseudo-term — tf summed over the group per doc, idf from the MAX
    per-term df in the group (Lucene SynonymQuery's blended docFreq)."""
    norm: list[list[str]] = []
    for g in groups:
        raws = g if isinstance(g, (list, tuple)) else [g]
        terms = sorted({t for raw in raws for t in query_terms(raw)})
        if terms:
            norm.append(terms)
    flat = [t for g in norm for t in g]
    if len(flat) != len(set(flat)):
        raise ValueError(f"synonym groups must be disjoint, got {norm!r}")
    if not flat:
        return f"SELECT doc_id, 0.0 AS score FROM {table} WHERE false"
    in_list = ", ".join("'" + t.replace("'", "''") + "'" for t in flat)
    gvals = ", ".join(
        f"('{t.replace(chr(39), chr(39) * 2)}', {gi})"
        for gi, g in enumerate(norm)
        for t in g
    )
    where_lang = f"WHERE lang = '{lang}'" if lang is not None else ""
    toksql = tokenize_duckdb_sql(content_col)
    score = bm25_term_score_sql(
        "gtf.tf", idf_sql("gdf.df", "stats.n"), "gtf.doc_len", "stats.avgdl"
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
tf AS (
  SELECT doc_id, doc_len, term, count(*)::BIGINT AS tf
  FROM tok WHERE term IN ({in_list})
  GROUP BY doc_id, doc_len, term
),
gmap AS (SELECT * FROM (VALUES {gvals}) AS g(term, gid)),
dft AS (
  SELECT term, count(*)::DOUBLE AS df FROM tf GROUP BY term
),
gdf AS (
  SELECT gid, max(df) AS df FROM dft JOIN gmap USING (term) GROUP BY gid
),
gtf AS (
  SELECT doc_id, doc_len, gid, sum(tf)::BIGINT AS tf
  FROM tf JOIN gmap USING (term)
  GROUP BY doc_id, doc_len, gid
)
SELECT gtf.doc_id AS doc_id, round(sum({score}), 6) AS score
FROM gtf JOIN gdf USING (gid) CROSS JOIN stats
GROUP BY gtf.doc_id
ORDER BY score DESC, doc_id ASC
LIMIT {k}
"""


def bm25_boost_case_sql(boosts: dict[str, float]) -> str:
    """SQL CASE expression mapping a term to its boost (1.0 default)."""
    whens = " ".join(
        f"WHEN '{t}' THEN {float(w)!r}" for t, w in sorted(boosts.items())
    )
    return f"(CASE term {whens} ELSE 1.0 END)"


def bm25_boosted_oracle_sql(
    boosts: dict[str, float],
    k: int = DEFAULT_TOP_K,
    lang: str | None = None,
    table: str = "documents",
    content_col: str = "text",
) -> str:
    """DuckDB twin of ``InvertedIndex.bm25_topk_boosted``: per-term boost
    multiplies the term's BM25 contribution (Lucene ``term^boost``)."""
    terms = sorted({t for raw in boosts for t in query_terms(raw)})
    if not terms:
        return f"SELECT doc_id, 0.0 AS score FROM {table} WHERE false"
    in_list = ", ".join("'" + t.replace("'", "''") + "'" for t in terms)
    where_lang = f"WHERE lang = '{lang}'" if lang is not None else ""
    toksql = tokenize_duckdb_sql(content_col)
    boost = bm25_boost_case_sql(
        {t: w for raw, w in boosts.items() for t in query_terms(raw)}
    )
    # boost*idf is grouped FIRST — the engine scales the idf dict before
    # scoring, so the oracle must associate identically for 6dp parity
    score = bm25_term_score_sql(
        "tf.tf",
        f"({boost} * {idf_sql('dfq.df', 'stats.n')})",
        "tf.doc_len",
        "stats.avgdl",
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
GROUP BY tf.doc_id
ORDER BY score DESC, doc_id ASC
LIMIT {k}
"""
