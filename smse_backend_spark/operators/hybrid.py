"""Hybrid retrieval: BM25 (lexical) + embedding cosine (semantic), fused
with Reciprocal Rank Fusion.

The reference exposes the two retrieval modes as separate surfaces — text
goes through the search route's pgvector scan
(smse_backend/services/search.py:97-110, invoked from
routes/search.py:164-205), and this engine adds the indexed BM25 path; a
retrieval/RAG pipeline over the same corpus wants both signals for one
query. RRF (Cormack/Clarke/Buettcher, SIGIR 2009) is
the standard score-free fusion: ``rrf(d) = sum_l 1/(K + rank_l(d))`` —
immune to the incomparable score scales of BM25 vs cosine, deterministic,
and exactly SQL-replicable (ranks are total-ordered by
``(score desc, doc_id asc)`` on 6dp-rounded scores in both engines).

Scale shape: the heavy work stays in the underlying operators (indexed or
scan BM25, broadcast-query cosine scan); fusion itself sees only two
top-``k_each`` lists — a bounded full-outer join, trivially
single-partition (the ``Window.orderBy`` without partition is over
``k_each`` rows, not the corpus).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from smse_backend_spark.operators.search import bm25_scan_oracle_sql, bm25_topk_scan
from smse_backend_spark.operators.similarity import cosine_topk, cosine_topk_sql


def _rrf_contrib(rrf_k: int):
    return (F.lit(1.0) / (F.lit(rrf_k) + F.col("rn"))).alias("c")


def rrf_hybrid_topk(
    corpus: DataFrame,
    emb: DataFrame,
    query_text: str,
    query_vec_id: int,
    k: int = 10,
    k_each: int = 50,
    rrf_k: int = 60,
) -> DataFrame:
    """Top-k docs by RRF over (BM25 top-k_each) + (cosine top-k_each),
    joining the embedding's ``vec_id`` to ``doc_id``."""
    from pyspark.sql import Window

    w = Window.orderBy(F.desc("score"), F.asc("doc_id"))
    bm = (
        bm25_topk_scan(corpus, query_text, k_each)
        .withColumn("rn", F.row_number().over(w))
        .select("doc_id", _rrf_contrib(rrf_k).alias("c_bm25"))
    )
    cs = (
        cosine_topk(emb, query_vec_id, k_each)
        .select(F.col("vec_id").alias("doc_id"), "score")
        .withColumn("rn", F.row_number().over(w))
        .select("doc_id", _rrf_contrib(rrf_k).alias("c_cos"))
    )
    return (
        bm.join(cs, "doc_id", "full_outer")
        .na.fill(0.0, ["c_bm25", "c_cos"])
        .select(
            "doc_id",
            F.round(F.col("c_bm25") + F.col("c_cos"), 6).alias("rrf_score"),
        )
        .orderBy(F.desc("rrf_score"), F.asc("doc_id"))
        .limit(k)
    )


def rrf_hybrid_sql(
    query_text: str,
    query_vec_id: int,
    k: int = 10,
    k_each: int = 50,
    rrf_k: int = 60,
) -> str:
    """DuckDB twin: identical ranks (6dp-rounded scores, same tie order),
    identical double arithmetic (1.0::DOUBLE / (K + rank))."""
    bm25 = bm25_scan_oracle_sql(query_text, k_each)
    cos = cosine_topk_sql(query_vec_id, k_each)
    return f"""
WITH bm AS (SELECT * FROM ({bm25})),
cs AS (SELECT vec_id AS doc_id, score FROM ({cos})),
br AS (
  SELECT doc_id, 1.0::DOUBLE / ({rrf_k} + row_number()
         OVER (ORDER BY score DESC, doc_id ASC)) AS c
  FROM bm
),
cr AS (
  SELECT doc_id, 1.0::DOUBLE / ({rrf_k} + row_number()
         OVER (ORDER BY score DESC, doc_id ASC)) AS c
  FROM cs
)
SELECT COALESCE(br.doc_id, cr.doc_id) AS doc_id,
       round(COALESCE(br.c, 0) + COALESCE(cr.c, 0), 6) AS rrf_score
FROM br FULL OUTER JOIN cr ON br.doc_id = cr.doc_id
ORDER BY rrf_score DESC, doc_id ASC
LIMIT {k}
"""


def linear_hybrid_topk(
    corpus: DataFrame,
    emb: DataFrame,
    query_text: str,
    query_vec_id: int,
    k: int = 10,
    k_each: int = 50,
    alpha: float = 0.5,
) -> DataFrame:
    """The OTHER standard fusion: convex combination of min-max-normalized
    scores — ``alpha * norm(bm25) + (1-alpha) * norm(cosine)`` over each
    list's top-``k_each`` (the normalized linear combination Elastic's
    retrievers and Vespa rank profiles expose beside RRF). Score-aware
    where RRF is rank-only: a big lexical margin survives fusion instead
    of collapsing to a rank difference of one.

    Determinism: min/max come from each list's 6dp-rounded scores, the
    normalization and combination are identically-parenthesized double
    expressions on both engines, a constant list (max == min) normalizes
    to 1.0 by definition, and the fused value goes through the shared
    floor formula. Scale shape: fusion sees only two bounded lists (the
    min/max aggregates are over k_each rows, broadcast back)."""
    beta = 1.0 - float(alpha)

    def norm(df: DataFrame, out: str) -> DataFrame:
        stats = df.agg(F.min("score").alias("mn"), F.max("score").alias("mx"))
        return df.crossJoin(F.broadcast(stats)).select(
            "doc_id",
            F.when(F.col("mx") == F.col("mn"), F.lit(1.0))
            .otherwise(
                (F.col("score") - F.col("mn")) / (F.col("mx") - F.col("mn"))
            )
            .alias(out),
        )

    bm = norm(bm25_topk_scan(corpus, query_text, k_each), "nb")
    cs = norm(
        cosine_topk(emb, query_vec_id, k_each).select(
            F.col("vec_id").alias("doc_id"), "score"
        ),
        "nc",
    )
    return (
        bm.join(cs, "doc_id", "full_outer")
        .na.fill(0.0, ["nb", "nc"])
        .select(
            "doc_id",
            (
                F.floor(
                    (
                        F.lit(float(alpha)) * F.col("nb")
                        + F.lit(beta) * F.col("nc")
                    )
                    * 1e6
                    + F.lit(0.5)
                )
                / 1e6
            ).alias("score"),
        )
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(k)
    )


def linear_hybrid_sql(
    query_text: str,
    query_vec_id: int,
    k: int = 10,
    k_each: int = 50,
    alpha: float = 0.5,
) -> str:
    """DuckDB twin of :func:`linear_hybrid_topk` — identical min-max
    normalization, convex combination, and floor rounding."""
    a, b = repr(float(alpha)), repr(1.0 - float(alpha))
    bm25 = bm25_scan_oracle_sql(query_text, k_each)
    cos = cosine_topk_sql(query_vec_id, k_each)
    return f"""
WITH bm AS (SELECT * FROM ({bm25})),
cs AS (SELECT vec_id AS doc_id, score FROM ({cos})),
bs AS (SELECT min(score) AS mn, max(score) AS mx FROM bm),
ss AS (SELECT min(score) AS mn, max(score) AS mx FROM cs),
bn AS (
  SELECT doc_id, CASE WHEN bs.mx = bs.mn THEN 1.0
                      ELSE (score - bs.mn) / (bs.mx - bs.mn) END AS nb
  FROM bm CROSS JOIN bs
),
cn AS (
  SELECT doc_id, CASE WHEN ss.mx = ss.mn THEN 1.0
                      ELSE (score - ss.mn) / (ss.mx - ss.mn) END AS nc
  FROM cs CROSS JOIN ss
)
SELECT COALESCE(bn.doc_id, cn.doc_id) AS doc_id,
       floor(({a} * COALESCE(bn.nb, 0.0) + {b} * COALESCE(cn.nc, 0.0))
             * 1e6 + 0.5) / 1e6 AS score
FROM bn FULL OUTER JOIN cn ON bn.doc_id = cn.doc_id
ORDER BY score DESC, doc_id ASC
LIMIT {k}
"""
