"""Benchmark decontamination: flag training documents that share any
token n-gram with an evaluation set.

The standard LLM training-data hygiene step (n-gram collision against held
-out benchmarks, as popularized by the GPT-3 appendix / The Pile): a doc is
*contaminated* when any of its n-grams appears in the eval set's n-gram
universe. Here the eval set is carved deterministically out of the corpus
itself (``doc_id % eval_mod == 0``) so the check is self-contained at any
scale factor — no external data.

Scale shape: the eval n-gram universe is the SMALL side (benchmarks are
MBs, training corpora are TBs) — distinct-aggregated then **broadcast** to
a semi-join against the exploded training n-grams; count-distinct collapses
per doc with map-side partial aggregation. The only wide exchange is the
final per-doc groupBy (bounded by matching rows, which are rare by
construction). N-grams stay inside JVM Column algebra
(``transform``/``slice``/``array_join``) — no Python crossing.

Reference analog: the reference has no decontamination (it is a search
backend); this belongs to the training-data-pipeline suite the graft adds
as first-class scale operators (same family as operators/dedup.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from smse_backend_spark.functions.tokenizer import (
    tokenize_col,
    tokenize_duckdb_sql,
)


def _ngrams(toks, n: int):
    """Array of space-joined token n-grams (empty when len(toks) < n)."""
    return F.when(
        F.size(toks) >= n,
        F.transform(
            F.sequence(F.lit(0), F.size(toks) - n),
            lambda i: F.array_join(F.slice(toks, i + 1, n), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))


def decontaminate(
    docs: DataFrame, n: int = 8, eval_mod: int = 50
) -> DataFrame:
    """(doc_id, n_hits, contaminated) for every document.

    ``n_hits`` = number of DISTINCT n-grams of the doc that occur anywhere
    in the eval set (docs with ``doc_id % eval_mod == 0``); eval docs flag
    themselves by construction — exactly what a decontamination pass wants
    (they must not be trained on either).
    """
    grams = docs.select(
        "doc_id", _ngrams(tokenize_col(F.col("text")), n).alias("grams")
    )
    eval_grams = (
        grams.filter(F.col("doc_id") % eval_mod == 0)
        .select(F.explode("grams").alias("gram"))
        .distinct()
    )
    hits = (
        grams.select("doc_id", F.explode("grams").alias("gram"))
        .distinct()
        .join(F.broadcast(eval_grams), "gram", "left_semi")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_hits"))
    )
    return (
        docs.select("doc_id")
        .join(hits, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_hits", F.lit(0)).cast("long").alias("n_hits"),
            (F.coalesce("n_hits", F.lit(0)) > 0).alias("contaminated"),
        )
    )


def decontaminate_sql(
    n: int = 8, eval_mod: int = 50, table: str = "documents"
) -> str:
    """DuckDB twin of :func:`decontaminate`."""
    toks = tokenize_duckdb_sql("text")
    return f"""
WITH t AS (SELECT doc_id, {toks} AS toks FROM {table}),
g AS (
  SELECT doc_id,
         array_to_string(list_slice(toks, i, i + {n} - 1), ' ') AS gram
  FROM t, unnest(range(1, len(toks) - {n} + 2)) AS u(i)
  WHERE len(toks) >= {n}
),
e AS (SELECT DISTINCT gram FROM g WHERE doc_id % {eval_mod} = 0),
h AS (
  SELECT doc_id, count(DISTINCT gram) AS n_hits
  FROM g WHERE gram IN (SELECT gram FROM e)
  GROUP BY doc_id
)
SELECT d.doc_id,
       coalesce(h.n_hits, 0)::BIGINT AS n_hits,
       coalesce(h.n_hits, 0) > 0 AS contaminated
FROM {table} d LEFT JOIN h USING (doc_id)
"""
