"""Text-analysis operators for training-data curation: token/char stats,
quality scoring, language-ID heuristic, document fingerprinting.

All pure Column algebra (JVM codegen, no UDF) with DuckDB oracle twins —
these run as full-corpus map passes at 10^12 rows, so staying inside
whole-stage codegen matters more here than anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from smse_backend_spark.functions.tokenizer import tokenize_col, tokenize_duckdb_sql

# top corpus terms double as the "stopword" set for quality ratios
STOPWORDS = ["the", "a", "of", "to", "and", "is", "in", "it", "for", "on"]

# marker terms per language for the n-gram/stopword language-ID heuristic
LANG_MARKERS = {
    "en": ["the", "fast", "small", "slow"],
    "de": ["der", "die", "das", "und"],
    "es": ["el", "la", "los", "que"],
    "fr": ["le", "la", "les", "et"],
    "zh": ["de", "shi", "bu", "le"],
}


def token_stats(docs: DataFrame) -> DataFrame:
    """(doc_id, n_tokens, n_chars, avg_token_len, stopword_ratio)."""
    toks = tokenize_col(F.col("text"))
    n_tok = F.size(toks)
    stop_n = F.size(F.filter(toks, lambda t: t.isin(STOPWORDS)))
    return docs.select(
        "doc_id",
        n_tok.cast("long").alias("n_tokens"),
        F.length("text").cast("long").alias("n_chars"),
        F.when(n_tok > 0, F.round(
            F.aggregate(toks, F.lit(0), lambda acc, t: acc + F.length(t)).cast("double") / n_tok, 6
        )).otherwise(F.lit(0.0)).alias("avg_token_len"),
        F.when(n_tok > 0, F.round(stop_n.cast("double") / n_tok, 6))
        .otherwise(F.lit(0.0)).alias("stopword_ratio"),
    )


def token_stats_sql() -> str:
    toks = tokenize_duckdb_sql("text")
    stops = ", ".join(f"'{s}'" for s in STOPWORDS)
    return f"""
WITH tok AS (SELECT doc_id, text, {toks} AS t FROM documents)
SELECT doc_id,
       len(t) AS n_tokens,
       length(text) AS n_chars,
       CASE WHEN len(t) > 0 THEN
         round(list_sum(list_transform(t, x -> length(x)))::DOUBLE / len(t), 6)
       ELSE 0.0 END AS avg_token_len,
       CASE WHEN len(t) > 0 THEN
         round(len(list_filter(t, x -> x IN ({stops})))::DOUBLE / len(t), 6)
       ELSE 0.0 END AS stopword_ratio
FROM tok
"""


def quality_scores(docs: DataFrame, min_score: float = 0.0) -> DataFrame:
    """Composite curation score in [0,1]: length sweet-spot x lexical
    diversity x stopword sanity. Deterministic column math, no model."""
    toks = tokenize_col(F.col("text"))
    n_tok = F.size(toks)
    diversity = F.when(n_tok > 0, F.size(F.array_distinct(toks)).cast("double") / n_tok).otherwise(0.0)
    length_score = F.least(n_tok.cast("double") / 32.0, F.lit(1.0))
    stop_ratio = F.when(
        n_tok > 0,
        F.size(F.filter(toks, lambda t: t.isin(STOPWORDS))).cast("double") / n_tok,
    ).otherwise(0.0)
    stop_score = F.lit(1.0) - F.least(stop_ratio * 2, F.lit(1.0))
    raw = length_score * diversity * (F.lit(0.5) + stop_score / 2)
    # explicit floor(x*1e6+0.5)/1e6 instead of round(): Spark's round()
    # HALF_UPs the shortest decimal print of the double while DuckDB
    # rounds the binary value — at an exact .xxxxxx5 boundary they differ
    # by 1 ulp. This form is identical double math in both engines.
    score = F.floor(raw * 1e6 + F.lit(0.5)) / 1e6
    return docs.select("doc_id", score.alias("quality")).filter(F.col("quality") >= min_score)


def quality_scores_sql(min_score: float = 0.0) -> str:
    toks = tokenize_duckdb_sql("text")
    stops = ", ".join(f"'{s}'" for s in STOPWORDS)
    return f"""
WITH tok AS (SELECT doc_id, {toks} AS t FROM documents),
m AS (
  SELECT doc_id, len(t) AS n,
         CASE WHEN len(t) > 0 THEN len(list_distinct(t))::DOUBLE / len(t) ELSE 0.0 END AS diversity,
         least(len(t)::DOUBLE / 32.0, 1.0) AS length_score,
         CASE WHEN len(t) > 0 THEN len(list_filter(t, x -> x IN ({stops})))::DOUBLE / len(t) ELSE 0.0 END AS stop_ratio
  FROM tok
)
SELECT doc_id,
       floor(length_score * diversity * (0.5 + (1.0 - least(stop_ratio * 2, 1.0)) / 2) * 1000000 + 0.5) / 1000000 AS quality
FROM m
WHERE floor(length_score * diversity * (0.5 + (1.0 - least(stop_ratio * 2, 1.0)) / 2) * 1000000 + 0.5) / 1000000 >= {min_score}
"""


def lang_id(docs: DataFrame) -> DataFrame:
    """Marker-term language-ID heuristic: count marker hits per language,
    argmax with fixed language-order tie-break; no hits -> 'und'."""
    toks = tokenize_col(F.col("text"))
    langs = sorted(LANG_MARKERS)
    counts = {
        lg: F.size(F.filter(toks, lambda t: t.isin(LANG_MARKERS[lg]))) for lg in langs
    }
    best = F.lit("und")
    best_n = F.lit(0)
    # iterate in fixed order; strict > keeps the earlier language on ties
    for lg in langs:
        is_better = counts[lg] > best_n
        best = F.when(is_better, F.lit(lg)).otherwise(best)
        best_n = F.greatest(best_n, counts[lg])
    return docs.select("doc_id", F.col("lang").alias("declared_lang"), best.alias("predicted_lang"))


def lang_id_sql() -> str:
    toks = tokenize_duckdb_sql("text")
    langs = sorted(LANG_MARKERS)
    cols = ", ".join(
        "len(list_filter(t, x -> x IN ({}))) AS c_{}".format(
            ", ".join(f"'{m}'" for m in LANG_MARKERS[lg]), lg
        )
        for lg in langs
    )
    # same fixed-order strict-> argmax as the Column version
    pick = "'und'"
    best = "0"
    for lg in langs:
        pick = f"CASE WHEN c_{lg} > {best} THEN '{lg}' ELSE {pick} END"
        best = f"greatest({best}, c_{lg})"
    return f"""
WITH tok AS (SELECT doc_id, lang, {toks} AS t FROM documents),
c AS (SELECT doc_id, lang, {cols} FROM tok)
SELECT doc_id, lang AS declared_lang, {pick} AS predicted_lang FROM c
"""


def doc_fingerprint(docs: DataFrame) -> DataFrame:
    """Normalization fingerprint: sha256 over the canonical token stream —
    robust to whitespace/case/punctuation differences (near-dup precursor)."""
    norm = F.concat_ws(" ", tokenize_col(F.col("text")))
    return docs.select("doc_id", F.sha2(norm, 256).alias("fingerprint"))


def doc_fingerprint_sql() -> str:
    toks = tokenize_duckdb_sql("text")
    return f"""
SELECT doc_id, sha256(array_to_string({toks}, ' ')) AS fingerprint
FROM documents
"""


def auto_stopwords(docs: DataFrame, df_ratio: float = 0.4, k: int = 20) -> DataFrame:
    """Corpus-derived stopword detection: terms present in more than
    ``df_ratio`` of documents, ranked by document frequency — the data-
    driven replacement for a hand-curated list when a training corpus
    changes domain. Output (term, df, ratio) by (df desc, term asc).

    Scale shape: one doc-frequency aggregation over distinct (doc, term)
    pairs; output is bounded by the vocabulary above the ratio cut.
    """
    n_docs = docs.count()
    toks = docs.select(
        "doc_id",
        F.explode(F.array_distinct(tokenize_col(F.col("text")))).alias("term"),
    )
    return (
        toks.groupBy("term")
        .agg(F.count(F.lit(1)).alias("df"))
        .withColumn("ratio", F.round(F.col("df").cast("double") / F.lit(float(n_docs)), 6))
        .filter(F.col("ratio") > df_ratio)
        .select("term", "df", "ratio")
        .orderBy(F.desc("df"), F.asc("term"))
        .limit(k)
    )


def auto_stopwords_sql(df_ratio: float = 0.4, k: int = 20) -> str:
    toks = tokenize_duckdb_sql("text")
    return f"""
WITH dl AS (SELECT doc_id, {toks} AS t FROM documents),
tok AS (SELECT DISTINCT doc_id, unnest(t) AS term FROM dl),
n AS (SELECT count(*)::DOUBLE AS n_docs FROM dl),
d AS (SELECT term, count(*)::BIGINT AS df FROM tok GROUP BY term)
SELECT term, df, round(df::DOUBLE / n.n_docs, 6) AS ratio
FROM d CROSS JOIN n
WHERE round(df::DOUBLE / n.n_docs, 6) > {df_ratio!r}
ORDER BY df DESC, term ASC
LIMIT {k}
"""


def tfidf_vectors(docs: DataFrame, max_doc_id: int = 100) -> DataFrame:
    """Sparse tf-idf feature export for downstream ML (the classic
    ``tf * ln(N/df)`` weighting, NOT the BM25 search score): one row per
    (doc, term) with the raw tf and the rounded weight, for docs below
    ``max_doc_id`` (bounds the contract output; remove the filter for a
    full-corpus export — the plan is identical).

    Stats (N, df) always come from the FULL corpus; the doc_id cut only
    bounds which docs' vectors are emitted.
    """
    toks = docs.select(
        "doc_id", F.explode(tokenize_col(F.col("text"))).alias("term")
    )
    n_docs = docs.count()
    tf = toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    df_t = tf.groupBy("term").agg(F.count(F.lit(1)).cast("double").alias("df"))
    return (
        tf.filter(F.col("doc_id") < max_doc_id)
        .join(df_t, "term")
        .select(
            "doc_id", "term", "tf",
            F.round(
                F.col("tf").cast("double")
                * F.log(F.lit(float(n_docs)) / F.col("df")), 6
            ).alias("weight"),
        )
        .orderBy("doc_id", "term")
    )


def tfidf_vectors_sql(max_doc_id: int = 100) -> str:
    toks = tokenize_duckdb_sql("text")
    return f"""
WITH dl AS (SELECT doc_id, {toks} AS t FROM documents),
n AS (SELECT count(*)::DOUBLE AS n_docs FROM dl),
tok AS (SELECT doc_id, unnest(t) AS term FROM dl),
tf AS (SELECT doc_id, term, count(*)::BIGINT AS tf FROM tok GROUP BY doc_id, term),
dfq AS (SELECT term, count(*)::DOUBLE AS df FROM tf GROUP BY term)
SELECT tf.doc_id AS doc_id, tf.term AS term, tf.tf AS tf,
       round(tf.tf::DOUBLE * ln(n.n_docs / dfq.df), 6) AS weight
FROM tf JOIN dfq USING (term) CROSS JOIN n
WHERE tf.doc_id < {max_doc_id}
ORDER BY doc_id, term
"""


def top_bigrams(docs: DataFrame, k: int = 20) -> DataFrame:
    """(bigram, n): the corpus's k most frequent adjacent token pairs —
    the n-gram statistic feeding tokenizer/BPE training and n-gram LM
    smoothing. Deterministic total order: (n desc, bigram asc).

    Scale shape: pairs are built in-row (zip of the token array with its
    tail — JVM ``transform``, no UDF), exploded, and counted with map-side
    partial aggregation; the wide exchange carries (bigram, partial n)
    only. Top-k is a TakeOrderedAndProject.
    """
    toks = tokenize_col(F.col("text"))
    pairs = F.when(
        F.size(toks) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - 1),
            lambda i: F.concat_ws(
                " ", F.element_at(toks, i), F.element_at(toks, i + 1)
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return (
        docs.select(F.explode(pairs).alias("bigram"))
        .groupBy("bigram")
        .agg(F.count("*").cast("long").alias("n"))
        .orderBy(F.desc("n"), F.asc("bigram"))
        .limit(k)
    )


def top_bigrams_sql(k: int = 20, table: str = "documents") -> str:
    toks = tokenize_duckdb_sql("text")
    return f"""
WITH t AS (SELECT {toks} AS toks FROM {table}),
p AS (
  SELECT toks[i] || ' ' || toks[i + 1] AS bigram
  FROM t, unnest(range(1, len(toks))) AS u(i)
  WHERE len(toks) >= 2
)
SELECT bigram, count(*)::BIGINT AS n FROM p
GROUP BY bigram ORDER BY n DESC, bigram ASC LIMIT {k}
"""
