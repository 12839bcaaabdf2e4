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


def repetition_stats(docs: DataFrame) -> DataFrame:
    """Gopher-style repetition quality signals (Rae et al. 2021 §A1.1),
    re-expressed over the code tokenizer: per doc, the fraction of tokens
    claimed by the most frequent unigram, the fraction of bigram slots
    claimed by the most frequent bigram, and the fraction of trigram
    occurrences that are duplicated within the doc. High values flag
    boilerplate/generated text for curation cuts.

    Scale shape: ONE corpus scan builds tagged 1/2/3-gram arrays in-row
    (JVM ``transform``, no UDF), one explode + (doc_id, gram) partial-agg
    count, one (doc_id) agg — the same two-shuffle shape as tf-idf, never
    quadratic in doc length. Zero-token docs come back as all-zero rows
    via the final left join on the narrow doc_id projection.
    """
    toks = tokenize_col(F.col("text"))
    uni = F.transform(toks, lambda t: F.concat(F.lit("u "), t))
    big = F.when(
        F.size(toks) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - 1),
            lambda i: F.concat_ws(
                " ", F.lit("b"), F.element_at(toks, i), F.element_at(toks, i + 1)
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    tri = F.when(
        F.size(toks) >= 3,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - 2),
            lambda i: F.concat_ws(
                " ", F.lit("t"), F.element_at(toks, i),
                F.element_at(toks, i + 1), F.element_at(toks, i + 2),
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    cnt = (
        docs.select("doc_id", F.explode(F.concat(uni, big, tri)).alias("g"))
        .groupBy("doc_id", "g")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    is_u = F.col("g").startswith("u ")
    is_b = F.col("g").startswith("b ")
    is_t = F.col("g").startswith("t ")
    agg = cnt.groupBy("doc_id").agg(
        F.sum(F.when(is_u, F.col("n"))).alias("n_uni"),
        F.max(F.when(is_u, F.col("n"))).alias("max_uni"),
        F.sum(F.when(is_b, F.col("n"))).alias("n_big"),
        F.max(F.when(is_b, F.col("n"))).alias("max_big"),
        F.sum(F.when(is_t, F.col("n"))).alias("n_tri"),
        F.sum(F.when(is_t & (F.col("n") > 1), F.col("n"))).alias("dup_tri"),
    )

    def frac(num, den):
        return F.coalesce(
            F.floor(num.cast("double") / den.cast("double") * 1e6 + F.lit(0.5)) / 1e6,
            F.lit(0.0),
        )

    return (
        docs.select("doc_id")
        .join(agg, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("n_uni"), F.lit(0)).cast("long").alias("n_tokens"),
            frac(F.col("max_uni"), F.col("n_uni")).alias("top_unigram_frac"),
            frac(F.col("max_big"), F.col("n_big")).alias("top_bigram_frac"),
            frac(F.coalesce(F.col("dup_tri"), F.lit(0)), F.col("n_tri")).alias(
                "dup_trigram_frac"
            ),
        )
    )


def repetition_stats_sql(table: str = "documents") -> str:
    toks = tokenize_duckdb_sql("text")
    return f"""
WITH tok AS (SELECT doc_id, {toks} AS t FROM {table}),
g AS (
  SELECT doc_id, 'u ' || unnest(t) AS g FROM tok
  UNION ALL
  SELECT doc_id, 'b ' || t[i] || ' ' || t[i + 1] AS g
  FROM tok, unnest(range(1, len(t))) AS u(i) WHERE len(t) >= 2
  UNION ALL
  SELECT doc_id, 't ' || t[i] || ' ' || t[i + 1] || ' ' || t[i + 2] AS g
  FROM tok, unnest(range(1, len(t) - 1)) AS u(i) WHERE len(t) >= 3
),
c AS (SELECT doc_id, g, count(*)::BIGINT AS n FROM g GROUP BY doc_id, g),
a AS (
  SELECT doc_id,
         sum(CASE WHEN g LIKE 'u %' THEN n END) AS n_uni,
         max(CASE WHEN g LIKE 'u %' THEN n END) AS max_uni,
         sum(CASE WHEN g LIKE 'b %' THEN n END) AS n_big,
         max(CASE WHEN g LIKE 'b %' THEN n END) AS max_big,
         sum(CASE WHEN g LIKE 't %' THEN n END) AS n_tri,
         sum(CASE WHEN g LIKE 't %' AND n > 1 THEN n END) AS dup_tri
  FROM c GROUP BY doc_id
)
SELECT d.doc_id AS doc_id,
       coalesce(a.n_uni, 0)::BIGINT AS n_tokens,
       coalesce(floor(a.max_uni::DOUBLE / a.n_uni::DOUBLE * 1e6 + 0.5) / 1e6, 0.0)
         AS top_unigram_frac,
       coalesce(floor(a.max_big::DOUBLE / a.n_big::DOUBLE * 1e6 + 0.5) / 1e6, 0.0)
         AS top_bigram_frac,
       coalesce(floor(coalesce(a.dup_tri, 0)::DOUBLE / a.n_tri::DOUBLE * 1e6 + 0.5) / 1e6, 0.0)
         AS dup_trigram_frac
FROM {table} d LEFT JOIN a USING (doc_id)
"""


def lm_unigram_scores(docs: DataFrame) -> DataFrame:
    """(doc_id, n_tokens, nll): per-doc mean negative log-likelihood in
    nats under the corpus's own unigram LM — the model-free stand-in for
    perplexity filtering (a doc of globally-rare tokens scores high, rote
    boilerplate scores low).

    Cross-engine determinism: each DISTINCT term's surprisal
    ``ln(total_cf / cf)`` is quantized ONCE to integer micro-nats, so the
    per-doc accumulation is an integer sum (order-free — double addition
    is non-associative and Spark/DuckDB aggregate in different orders);
    the single float division happens at the end. Same discipline as
    ``chunk_hash_embed``.

    Scale shape: one (doc, term) tf aggregation, a broadcast-sized term
    weight table joined back, one per-doc integer sum.
    """
    tf = (
        docs.select("doc_id", F.explode(tokenize_col(F.col("text"))).alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    cf = tf.groupBy("term").agg(F.sum("tf").alias("cf"))
    total = cf.agg(F.sum("cf")).first()[0] or 0
    w = cf.select(
        "term",
        F.floor(
            F.log(F.lit(float(total)) / F.col("cf").cast("double")) * 1e6 + F.lit(0.5)
        ).cast("long").alias("w_micro"),
    )
    per_doc = (
        tf.join(F.broadcast(w), "term")
        .groupBy("doc_id")
        .agg(F.sum(F.col("tf") * F.col("w_micro")).alias("s"),
             F.sum("tf").alias("n"))
    )
    return (
        docs.select("doc_id")
        .join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("n"), F.lit(0)).cast("long").alias("n_tokens"),
            F.coalesce(
                F.floor(F.col("s").cast("double") / F.col("n").cast("double")
                        + F.lit(0.5)) / 1e6,
                F.lit(0.0),
            ).alias("nll"),
        )
    )


def lm_unigram_scores_sql(table: str = "documents") -> str:
    toks = tokenize_duckdb_sql("text")
    return f"""
WITH tok AS (SELECT doc_id, unnest({toks}) AS term FROM {table}),
tf AS (SELECT doc_id, term, count(*)::BIGINT AS tf FROM tok GROUP BY doc_id, term),
cf AS (SELECT term, sum(tf)::BIGINT AS cf FROM tf GROUP BY term),
tot AS (SELECT sum(cf)::DOUBLE AS total FROM cf),
w AS (
  SELECT term, floor(ln(tot.total / cf::DOUBLE) * 1e6 + 0.5)::BIGINT AS w_micro
  FROM cf CROSS JOIN tot
),
p AS (
  SELECT tf.doc_id AS doc_id, sum(tf.tf * w.w_micro)::BIGINT AS s,
         sum(tf.tf)::BIGINT AS n
  FROM tf JOIN w USING (term) GROUP BY tf.doc_id
)
SELECT d.doc_id AS doc_id,
       coalesce(p.n, 0)::BIGINT AS n_tokens,
       coalesce(floor(p.s::DOUBLE / p.n::DOUBLE + 0.5) / 1e6, 0.0) AS nll
FROM {table} d LEFT JOIN p USING (doc_id)
"""


def bigram_pmi(docs: DataFrame, min_count: int = 5, k: int = 30) -> DataFrame:
    """(bigram, n, pmi): the k adjacent token pairs with the highest
    pointwise mutual information ``ln(p(ab) / (p(a) p(b)))`` among pairs
    seen at least ``min_count`` times — the classic collocation detector
    (Church & Hanks 1990) feeding phrase mining / tokenizer merges.

    Determinism: pmi is computed as ONE identically-parenthesized double
    expression from integer counts on both engines — no float
    accumulation anywhere. Total order (pmi desc, bigram asc).

    Scale shape: two count aggregations (unigrams; adjacent pairs built
    in-row), the unigram table joined back twice broadcast, then a
    TakeOrderedAndProject — vocabulary-bounded, never corpus-bounded.
    """
    toks = tokenize_col(F.col("text"))
    pairs = F.when(
        F.size(toks) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - 1),
            lambda i: F.struct(
                F.element_at(toks, i).alias("a"),
                F.element_at(toks, i + 1).alias("b"),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<a:string,b:string>>"))
    bg = (
        docs.select(F.explode(pairs).alias("p"))
        .select(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    ug = (
        docs.select(F.explode(toks).alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("cn"))
    )
    t1 = ug.agg(F.sum("cn")).first()[0] or 0
    t2 = bg.agg(F.sum("n")).first()[0] or 0
    ua = ug.select(F.col("term").alias("a"), F.col("cn").alias("ca"))
    ub = ug.select(F.col("term").alias("b"), F.col("cn").alias("cb"))
    # one identically-parenthesized double expression on both engines:
    # ((n * t1) * t1) / (((t2 * ca) * cb))
    pmi = F.log(
        (F.col("n").cast("double") * F.lit(float(t1)) * F.lit(float(t1)))
        / (F.lit(float(t2)) * F.col("ca").cast("double") * F.col("cb").cast("double"))
    )
    return (
        bg.filter(F.col("n") >= min_count)
        .join(F.broadcast(ua), "a")
        .join(F.broadcast(ub), "b")
        .select(
            F.concat_ws(" ", "a", "b").alias("bigram"),
            F.col("n").cast("long").alias("n"),
            (F.floor(pmi * 1e6 + F.lit(0.5)) / 1e6).alias("pmi"),
        )
        .orderBy(F.desc("pmi"), F.asc("bigram"))
        .limit(k)
    )


def bigram_pmi_sql(min_count: int = 5, k: int = 30, table: str = "documents") -> str:
    toks = tokenize_duckdb_sql("text")
    return f"""
WITH tok AS (SELECT {toks} AS t FROM {table}),
bg AS (
  SELECT t[i] AS a, t[i + 1] AS b, count(*)::BIGINT AS n
  FROM tok, unnest(range(1, len(t))) AS u(i)
  WHERE len(t) >= 2 GROUP BY 1, 2
),
ug AS (
  SELECT term, count(*)::BIGINT AS cn
  FROM (SELECT unnest(t) AS term FROM tok) GROUP BY term
),
t1 AS (SELECT sum(cn)::DOUBLE AS v FROM ug),
t2 AS (SELECT sum(n)::DOUBLE AS v FROM bg)
SELECT bg.a || ' ' || bg.b AS bigram, bg.n AS n,
       floor(ln(((bg.n::DOUBLE * t1.v) * t1.v)
                / ((t2.v * ua.cn::DOUBLE) * ub.cn::DOUBLE)) * 1e6 + 0.5) / 1e6 AS pmi
FROM bg JOIN ug ua ON ua.term = bg.a
        JOIN ug ub ON ub.term = bg.b
        CROSS JOIN t1 CROSS JOIN t2
WHERE bg.n >= {min_count}
ORDER BY pmi DESC, bigram ASC LIMIT {k}
"""


def span_dedup_coverage(docs: DataFrame, n: int = 8) -> DataFrame:
    """(doc_id, n_tokens, covered, frac): per doc, how many token
    positions sit inside at least one ``n``-token gram that ALSO occurs in
    a different document — the coverage statistic behind substring-level
    training-data dedup (Lee et al. 2021, "Deduplicating Training Data
    Makes Language Models Better"): docs with high coverage are cut or
    trimmed rather than exact-dup'd.

    Scale shape: grams are built in-row (JVM ``transform``+``slice``),
    the cross-doc test is one (gram -> distinct-doc count) aggregation —
    at 10^12 rows you'd hash the gram first so ~40-byte hashes shuffle
    instead of gram text (same trick as ``dedup.py``); covered positions
    are a bounded x``n`` explode of only the SHARED gram hits, then a
    per-doc distinct count.
    """
    toks = tokenize_col(F.col("text"))
    grams = F.when(
        F.size(toks) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - (n - 1)),
            lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    g = docs.select(
        "doc_id", F.posexplode(grams).alias("p0", "gram")
    ).select("doc_id", (F.col("p0") + 1).alias("start"), "gram")
    shared = (
        g.groupBy("gram")
        .agg(F.count_distinct("doc_id").alias("nd"))
        .filter(F.col("nd") >= 2)
        .select("gram")
    )
    covered = (
        g.join(shared, "gram", "left_semi")
        .select("doc_id", F.explode(F.sequence(F.col("start"), F.col("start") + (n - 1))).alias("pos"))
        .groupBy("doc_id")
        .agg(F.count_distinct("pos").alias("covered"))
    )
    lens = docs.select("doc_id", F.size(toks).cast("long").alias("n_tokens"))
    return lens.join(covered, "doc_id", "left").select(
        "doc_id",
        "n_tokens",
        F.coalesce(F.col("covered"), F.lit(0)).cast("long").alias("covered"),
        F.coalesce(
            F.floor(
                F.col("covered").cast("double") / F.col("n_tokens").cast("double")
                * 1e6 + F.lit(0.5)
            ) / 1e6,
            F.lit(0.0),
        ).alias("frac"),
    )


def span_dedup_coverage_sql(n: int = 8, table: str = "documents") -> str:
    toks = tokenize_duckdb_sql("text")
    return f"""
WITH tok AS (SELECT doc_id, {toks} AS t FROM {table}),
g AS (
  SELECT doc_id, i AS start, array_to_string(t[i : i + {n - 1}], ' ') AS gram
  FROM tok, unnest(range(1, len(t) - {n - 2})) AS u(i)
  WHERE len(t) >= {n}
),
shared AS (
  SELECT gram FROM g GROUP BY gram HAVING count(DISTINCT doc_id) >= 2
),
cov AS (
  SELECT doc_id, count(DISTINCT pos) AS covered
  FROM (
    SELECT g.doc_id AS doc_id, unnest(generate_series(g.start, g.start + {n - 1})) AS pos
    FROM g JOIN shared USING (gram)
  ) GROUP BY doc_id
)
SELECT tok.doc_id AS doc_id, len(tok.t)::BIGINT AS n_tokens,
       coalesce(cov.covered, 0)::BIGINT AS covered,
       coalesce(floor(cov.covered::DOUBLE / len(tok.t)::DOUBLE * 1e6 + 0.5) / 1e6, 0.0)
         AS frac
FROM tok LEFT JOIN cov USING (doc_id)
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

def textrank_keywords(
    docs: DataFrame,
    k: int = 20,
    iters: int = 5,
    damping: float = 0.85,
    lang: str | None = None,
) -> DataFrame:
    """Corpus-level TextRank keyword extraction (Mihalcea & Tarau 2004):
    PageRank over the undirected adjacent-token co-occurrence graph,
    weighted by bigram count —

        PR'(v) = (1 - d) + d * sum_u  PR(u) * w(u,v) / wdeg(u)

    run ``iters`` fixed iterations from PR = 1.0, quantizing each
    iteration's scores to 1e-9 with the shared half-up floor formula so
    every iteration's INPUT is bit-identical across engines (the
    dup-clusters discipline: deterministic fixpoint loops quantize
    between rounds). Returns the top-k (term, score) by (score desc,
    term asc).

    Scale shape: the edge list is vocabulary-bounded, NOT corpus-bounded
    — one tokenize pass builds (a, b, n) counts with map-side partial
    aggregation, the union with the reversed direction doubles rows but
    not the shuffle class, and each iteration is one broadcast-scale
    join + groupBy over edges. Isolated tokens (single-token docs) never
    enter the graph on either engine. On a real cluster, checkpoint the
    rank frame every few iterations to truncate lineage (the
    ``dup_clusters`` note applies verbatim).
    """
    src = docs if lang is None else docs.filter(F.col("lang") == lang)
    toks = tokenize_col(F.col("text"))
    pairs = F.when(
        F.size(toks) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - 1),
            lambda i: F.struct(
                F.element_at(toks, i).alias("a"),
                F.element_at(toks, i + 1).alias("b"),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<a:string,b:string>>"))
    bg = (
        src.select(F.explode(pairs).alias("p"))
        .select(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
        .groupBy("a", "b")
        .agg(F.count("*").cast("double").alias("n"))
    )
    edges = (
        bg.select("a", "b", "n")
        .unionByName(bg.select(F.col("b").alias("a"), F.col("a").alias("b"), "n"))
        .groupBy("a", "b")
        .agg(F.sum("n").alias("w"))
        .cache()
    )
    deg = edges.groupBy("a").agg(F.sum("w").alias("wdeg"))
    pr = deg.select(F.col("a").alias("term"), F.lit(1.0).alias("pr"))
    d = float(damping)
    for _ in range(int(iters)):
        contrib = (
            edges.join(pr, edges["a"] == pr["term"])
            .join(deg, "a")
            .select(
                F.col("b").alias("term"),
                (F.col("pr") * F.col("w") / F.col("wdeg")).alias("c"),
            )
        )
        nxt = contrib.groupBy("term").agg(
            (F.lit(1.0 - d) + F.lit(d) * F.sum("c")).alias("raw")
        )
        pr = nxt.select(
            "term",
            (F.floor(F.col("raw") * F.lit(1e9) + F.lit(0.5)) / F.lit(1e9))
            .alias("pr"),
        )
    return (
        pr.select("term", F.col("pr").alias("score"))
        .orderBy(F.desc("score"), F.asc("term"))
        .limit(k)
    )


def textrank_keywords_sql(
    k: int = 20,
    iters: int = 5,
    damping: float = 0.85,
    lang: str | None = None,
    table: str = "documents",
) -> str:
    """DuckDB twin of :func:`textrank_keywords`: the same undirected
    weighted bigram graph and ``iters`` unrolled PageRank iterations with
    the identical 1e-9 quantization between rounds."""
    toks = tokenize_duckdb_sql("text")
    where_lang = f"WHERE lang = '{lang}'" if lang is not None else ""
    d = float(damping)
    prev = "pr0"
    iter_ctes = []
    for i in range(1, int(iters) + 1):
        iter_ctes.append(f"""pr{i} AS (
  SELECT e.b AS term,
         floor(({1.0 - d!r} + {d!r} * sum(p.pr * e.w / g.wdeg)) * 1e9 + 0.5)
           / 1e9 AS pr
  FROM edges e JOIN {prev} p ON p.term = e.a JOIN deg g ON g.a = e.a
  GROUP BY e.b
)""")
        prev = f"pr{i}"
    chain = ",\n".join(iter_ctes)
    return f"""
WITH t AS (SELECT {toks} AS toks FROM {table} {where_lang}),
p AS (
  SELECT toks[i] AS a, toks[i + 1] AS b
  FROM t, unnest(range(1, len(toks))) AS u(i)
  WHERE len(toks) >= 2
),
bg AS (SELECT a, b, count(*)::DOUBLE AS n FROM p GROUP BY a, b),
edges AS (
  SELECT a, b, sum(n) AS w FROM (
    SELECT a, b, n FROM bg
    UNION ALL
    SELECT b AS a, a AS b, n FROM bg
  ) GROUP BY a, b
),
deg AS (SELECT a, sum(w) AS wdeg FROM edges GROUP BY a),
pr0 AS (SELECT a AS term, 1.0 AS pr FROM deg),
{chain}
SELECT term, pr AS score FROM {prev}
ORDER BY score DESC, term ASC
LIMIT {k}
"""


def gopher_filter(
    docs: DataFrame,
    min_tokens: int = 8,
    max_tokens: int = 10_000,
    min_mean_len: int = 2,
    max_mean_len: int = 10,
    min_stop_pct: int = 6,
    max_top_unigram_pct: int = 20,
) -> DataFrame:
    """The Gopher quality rules (Rae et al. 2021 §A1.1) as one composite
    curation gate, adapted to the code tokenizer: a doc PASSES iff

    1. token count in [min_tokens, max_tokens];
    2. mean token length in [min_mean_len, max_mean_len];
    3. stopword fraction >= min_stop_pct %  (symbol soup filter);
    4. most-frequent-unigram fraction <= max_top_unigram_pct %
       (boilerplate/generated-text filter).

    Returns the FAILING docs (the audit view a curation run reviews) as
    (doc_id, n_tokens, len_ok, mean_len_ok, stop_ok, rep_ok) ordered by
    doc_id. Every rule is an INTEGER cross-multiplication (e.g.
    ``stop_n * 100 >= 6 * n_tok``) — no float ratios, so the DuckDB twin
    is exact by construction and thresholds behave identically at any
    scale.

    Scale shape: one map-only projection (all four rules are per-row
    Column algebra over the token array; the top-unigram count is
    O(distinct x tokens) per row — bounded by doc length, never a
    shuffle), then a pushed-down filter. At 10^12 docs this is the
    cheapest possible full-corpus gate: scan-bandwidth-bound, zero
    shuffle, and the emitted set is only the rejects.
    """
    toks = tokenize_col(F.col("text"))
    n = F.size(toks).cast("long")
    sum_len = F.aggregate(
        toks, F.lit(0), lambda acc, t: acc + F.length(t)
    ).cast("long")
    stop_n = F.size(F.filter(toks, lambda t: t.isin(STOPWORDS))).cast("long")
    top_uni = F.when(n > 0, F.array_max(
        F.transform(
            F.array_distinct(toks),
            lambda d: F.size(F.filter(toks, lambda x: x == d)),
        )
    ).cast("long")).otherwise(F.lit(0))
    len_ok = (n >= int(min_tokens)) & (n <= int(max_tokens))
    mean_len_ok = (sum_len >= int(min_mean_len) * n) & (
        sum_len <= int(max_mean_len) * n
    )
    stop_ok = stop_n * 100 >= int(min_stop_pct) * n
    rep_ok = top_uni * 100 <= int(max_top_unigram_pct) * n
    return (
        docs.select(
            "doc_id",
            n.alias("n_tokens"),
            len_ok.alias("len_ok"),
            mean_len_ok.alias("mean_len_ok"),
            stop_ok.alias("stop_ok"),
            rep_ok.alias("rep_ok"),
        )
        .filter(~(F.col("len_ok") & F.col("mean_len_ok")
                  & F.col("stop_ok") & F.col("rep_ok")))
        .orderBy("doc_id")
    )


def gopher_filter_sql(
    min_tokens: int = 8,
    max_tokens: int = 10_000,
    min_mean_len: int = 2,
    max_mean_len: int = 10,
    min_stop_pct: int = 6,
    max_top_unigram_pct: int = 20,
    table: str = "documents",
) -> str:
    """DuckDB twin of :func:`gopher_filter` (identical integer rules)."""
    toks = tokenize_duckdb_sql("text")
    stops = ", ".join(f"'{s}'" for s in STOPWORDS)
    return f"""
WITH tok AS (SELECT doc_id, {toks} AS t FROM {table}),
m AS (
  SELECT doc_id,
         len(t)::BIGINT AS n,
         coalesce(list_sum(list_transform(t, x -> length(x))), 0)::BIGINT
           AS sum_len,
         len(list_filter(t, x -> x IN ({stops})))::BIGINT AS stop_n,
         CASE WHEN len(t) > 0 THEN
           list_max(list_transform(list_distinct(t),
                    d -> len(list_filter(t, x -> x = d))))::BIGINT
         ELSE 0 END AS top_uni
  FROM tok
),
flags AS (
  SELECT doc_id, n AS n_tokens,
         (n >= {int(min_tokens)} AND n <= {int(max_tokens)}) AS len_ok,
         (sum_len >= {int(min_mean_len)} * n
          AND sum_len <= {int(max_mean_len)} * n) AS mean_len_ok,
         (stop_n * 100 >= {int(min_stop_pct)} * n) AS stop_ok,
         (top_uni * 100 <= {int(max_top_unigram_pct)} * n) AS rep_ok
  FROM m
)
SELECT doc_id, n_tokens, len_ok, mean_len_ok, stop_ok, rep_ok
FROM flags
WHERE NOT (len_ok AND mean_len_ok AND stop_ok AND rep_ok)
ORDER BY doc_id
"""


def ccnet_buckets(docs: DataFrame) -> DataFrame:
    """CCNet-style perplexity bucketing (Wenzek et al. 2020): docs split
    into ``head`` / ``middle`` / ``tail`` terciles of the per-doc LM
    score (here :func:`lm_unigram_scores`'s mean NLL standing in for the
    KenLM perplexity — same bucketing dataflow, model-free). ``head`` =
    most fluent (lowest NLL) third, the slice CCNet keeps by default.

    Returns (doc_id, nll, bucket) for every doc. The tercile thresholds
    are two EXACT interpolated quantiles of the nll column (the Spark
    ``percentile`` == DuckDB ``quantile_cont`` bit-parity precedent),
    computed once and applied as a map-only comparison — so the bucket
    pass is a single scan at any corpus size (the thresholds are driver
    scalars; no global sort or window).
    """
    s = lm_unigram_scores(docs)
    row = s.agg(
        F.percentile(F.col("nll"), F.lit(1 / 3)).alias("t1"),
        F.percentile(F.col("nll"), F.lit(2 / 3)).alias("t2"),
    ).first()
    t1, t2 = float(row["t1"]), float(row["t2"])
    bucket = (
        F.when(F.col("nll") <= F.lit(t1), F.lit("head"))
        .when(F.col("nll") <= F.lit(t2), F.lit("middle"))
        .otherwise(F.lit("tail"))
    )
    return s.select("doc_id", "nll", bucket.alias("bucket"))


def ccnet_buckets_sql(table: str = "documents") -> str:
    """DuckDB twin of :func:`ccnet_buckets`: same NLL, thresholds via
    ``quantile_cont`` at the same double fractions, same comparisons."""
    nll = lm_unigram_scores_sql(table)
    return f"""
WITH s AS ({nll}),
t AS (
  SELECT quantile_cont(nll, {1 / 3!r}) AS t1,
         quantile_cont(nll, {2 / 3!r}) AS t2
  FROM s
)
SELECT s.doc_id AS doc_id, s.nll AS nll,
       CASE WHEN s.nll <= t.t1 THEN 'head'
            WHEN s.nll <= t.t2 THEN 'middle'
            ELSE 'tail' END AS bucket
FROM s CROSS JOIN t
"""
