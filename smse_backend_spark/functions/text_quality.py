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
