"""Corpus-statistics diagnostics for training-data analysis.

The WIMBD-class "what is in my corpus" measurements (Elazar et al. 2024)
that operate on the whole token stream rather than a query's match set:

* :func:`zipf_slope` — the log-log OLS slope of the term rank/frequency
  curve (Zipf's law exponent). Natural corpora sit near -1; a slope far
  from it flags synthetic or templated text — a standard data-quality
  screen before pretraining.
* :func:`heaps_vocab_growth` — distinct-vocabulary size after each
  prefix of the corpus (Heaps' law curve). How fast novelty decays
  drives dedup/mixing decisions: a flat tail says more of the same data
  adds nothing.

Exactness discipline: both reduce to integer counting plus a handful of
``ln`` calls quantized to 6 dp BEFORE any summation, so the OLS sums are
integer arithmetic and Spark/DuckDB agree bit-for-bit (no double
accumulation order anywhere).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from smse_backend_spark.functions.tokenizer import tokenize_col, tokenize_duckdb_sql
from smse_backend_spark.operators.dedup import _shingles_duckdb, shingles_col

_Q = 1e6


def _qlog(c):
    """floor(ln(x)*1e6 + 0.5) as long — the shared log quantizer."""
    return F.floor(F.log(c.cast("double")) * F.lit(_Q) + F.lit(0.5)).cast("long")


def zipf_slope(docs: DataFrame, k: int = 20, content_col: str = "text") -> DataFrame:
    """One row (n_terms, slope): the OLS slope of ln(count) on ln(rank)
    over the top-``k`` terms by collection frequency (rank 1 = most
    frequent, ties broken term asc). Zipf's law predicts slope ~ -1 on
    natural text.

    Exactness: ln(rank) and ln(count) are each quantized to 6 dp
    integers FIRST; the four OLS sums and the slope numerator /
    denominator are then pure int64 arithmetic (the 1e12 quantization
    factors cancel in the ratio), one double division at the end through
    the shared half-up floor. Magnitudes: qlog <= ~ln(10^18)*1e6 < 4.2e7,
    products < 1.8e15, k-term sums < 4e16 — no int64 overflow for any
    real k.

    Scale shape: the term-count partial aggregation is the only
    corpus-sized work; the top-k cut is TakeOrderedAndProject and the
    regression runs over ``k`` rows on a single metadata-sized partition.
    """
    per = (
        docs.select(F.explode(tokenize_col(F.col(content_col))).alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("term"))
        .limit(int(k))
    )
    ranked = per.withColumn(
        "rank",
        F.row_number().over(Window.orderBy(F.desc("cnt"), F.asc("term"))),
    ).select(
        _qlog(F.col("rank")).alias("xq"), _qlog(F.col("cnt")).alias("yq")
    )
    s = ranked.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("xq").cast("long").alias("sx"),
        F.sum("yq").cast("long").alias("sy"),
        F.sum(F.col("xq") * F.col("yq")).cast("long").alias("sxy"),
        F.sum(F.col("xq") * F.col("xq")).cast("long").alias("sxx"),
    )
    num = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
    den = (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
    slope = F.when(den == 0, F.lit(0.0)).otherwise(
        F.floor((num / den) * F.lit(_Q) + F.lit(0.5)) / F.lit(_Q)
    )
    return s.select(F.col("n").alias("n_terms"), slope.alias("slope"))


def zipf_slope_sql(
    k: int = 20, table: str = "documents", content_col: str = "text"
) -> str:
    """DuckDB twin of :func:`zipf_slope` — same quantize-then-integer-sum
    OLS, same tie-break, same final floor."""
    toks = tokenize_duckdb_sql(content_col)
    return f"""
WITH tok AS (
  SELECT unnest({toks}) AS term FROM {table}
),
per AS (
  SELECT term, count(*)::BIGINT AS cnt FROM tok GROUP BY term
  ORDER BY cnt DESC, term ASC LIMIT {int(k)}
),
ranked AS (
  SELECT floor(ln((row_number() OVER (ORDER BY cnt DESC, term ASC))::DOUBLE)
               * 1e6 + 0.5)::BIGINT AS xq,
         floor(ln(cnt::DOUBLE) * 1e6 + 0.5)::BIGINT AS yq
  FROM per
),
s AS (
  SELECT count(*)::BIGINT AS n, sum(xq)::BIGINT AS sx, sum(yq)::BIGINT AS sy,
         sum(xq * yq)::BIGINT AS sxy, sum(xq * xq)::BIGINT AS sxx
  FROM ranked
)
SELECT n AS n_terms,
       CASE WHEN (n * sxx - sx * sx) = 0 THEN 0.0
            ELSE floor(((n * sxy - sx * sy)::DOUBLE
                        / (n * sxx - sx * sx)::DOUBLE) * 1e6 + 0.5) / 1e6
       END AS slope
FROM s
"""


def heaps_vocab_growth(
    docs: DataFrame, n: int = 3, points: int = 10
) -> DataFrame:
    """Heaps'-law curve: for each of ``points`` equal prefixes of the
    corpus (by doc_id — "after ingesting every doc with doc_id < k"),
    the number of distinct word ``n``-gram shingles seen so far.
    Returns (n_docs, vocab) ordered by prefix — a monotone curve whose
    flattening rate is the novelty-decay signal.

    Scale shape: the distinct (shingle, doc) explode plus a per-shingle
    ``min(doc_id)`` — the index build's shuffle unit with a map-side-
    combined min. First-seen rows then bucket into <= ``points`` cells
    (a when-chain on integer thresholds) and the running sum is a window
    over ``points`` rows — metadata-sized at any corpus scale. Doc-id
    prefixes (not row positions) keep the semantics total-order-free:
    no global row numbering is ever computed.
    """
    n_docs = docs.count()
    ts = sorted({math.ceil(n_docs * i / points) for i in range(1, points + 1)})
    # spread the tokenize+shingle stage across the executor width — a
    # single-file corpus arrives as one input split and serializes this
    # stage on one core otherwise. Result-invariant.
    par = docs.sparkSession.sparkContext.defaultParallelism
    sh = docs.repartition(par, "doc_id").select(
        "doc_id", F.explode(shingles_col(F.col("text"), n)).alias("g")
    )
    first = sh.groupBy("g").agg(F.min("doc_id").alias("first_doc"))
    bucket = F.lit(None).cast("long")
    for t in reversed(ts):
        bucket = F.when(F.col("first_doc") < t, F.lit(t)).otherwise(bucket)
    per_bucket = (
        first.select(bucket.alias("n_docs"))
        .groupBy("n_docs")
        .agg(F.count(F.lit(1)).cast("long").alias("added"))
    )
    frame = docs.sparkSession.createDataFrame(
        [(t,) for t in ts], "n_docs long"
    )
    w = Window.orderBy("n_docs").rowsBetween(Window.unboundedPreceding, 0)
    return (
        frame.join(per_bucket, "n_docs", "left")
        .select(
            "n_docs",
            F.sum(F.coalesce(F.col("added"), F.lit(0))).over(w)
            .cast("long").alias("vocab"),
        )
        .orderBy("n_docs")
    )


def heaps_vocab_growth_sql(
    n: int = 3, points: int = 10, table: str = "documents",
    content_col: str = "text",
) -> str:
    """DuckDB twin of :func:`heaps_vocab_growth` (same doc-id-prefix
    thresholds, derived from the same ceil rule in SQL)."""
    toks = tokenize_duckdb_sql(content_col)
    return f"""
WITH tok AS (
  SELECT doc_id, {toks} AS t FROM {table}
),
sh AS (
  SELECT doc_id, unnest({_shingles_duckdb(n)}) AS g FROM tok
),
first AS (
  SELECT g, min(doc_id) AS first_doc FROM sh GROUP BY g
),
nn AS (SELECT count(*)::BIGINT AS n_docs FROM {table}),
thresholds AS (
  SELECT DISTINCT ceil(nn.n_docs * i / {int(points)}.0)::BIGINT AS n_docs
  FROM nn, range(1, {int(points)} + 1) r(i)
),
added AS (
  SELECT t.n_docs, count(f.g)::BIGINT AS added
  FROM thresholds t
  LEFT JOIN first f
    ON f.first_doc < t.n_docs
   AND f.first_doc >= coalesce(
         (SELECT max(t2.n_docs) FROM thresholds t2 WHERE t2.n_docs < t.n_docs),
         0)
  GROUP BY t.n_docs
)
SELECT n_docs, sum(added) OVER (ORDER BY n_docs)::BIGINT AS vocab
FROM added
ORDER BY n_docs
"""
