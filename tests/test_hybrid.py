"""Hybrid BM25+cosine RRF fusion vs the DuckDB oracle, plus RRF sanity."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from smse_backend_spark.corpus import load_corpus
from smse_backend_spark.operators.hybrid import rrf_hybrid_sql, rrf_hybrid_topk
from smse_backend_spark.operators.similarity import load_embeddings


@pytest.fixture(scope="module")
def con(sf_smoke):
    c = duckdb.connect()
    for t in ("documents", "embeddings"):
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_smoke}/{t}.parquet'")
    return c


@pytest.mark.parametrize("q,qid,k", [
    ("hash join merge scan", 0, 10),
    ("the row data", 7, 15),
    ("window", 11, 10),
])
def test_rrf_hybrid_vs_duckdb(spark, sf_smoke, con, q, qid, k):
    corpus = load_corpus(spark, sf_smoke)
    emb = load_embeddings(spark, sf_smoke)
    got = [(r["doc_id"], r["rrf_score"])
           for r in rrf_hybrid_topk(corpus, emb, q, qid, k).collect()]
    want = con.execute(rrf_hybrid_sql(q, qid, k)).fetchall()
    assert got == [tuple(r) for r in want], (got[:3], want[:3])


def test_rrf_doc_in_both_lists_outranks_solo(spark, sf_smoke):
    """A doc present in BOTH top lists accumulates two reciprocal terms:
    the fused top-1 must score >= the best single-list contribution."""
    corpus = load_corpus(spark, sf_smoke)
    emb = load_embeddings(spark, sf_smoke)
    rows = rrf_hybrid_topk(corpus, emb, "hash join merge scan", 0, 10).collect()
    assert rows, "hybrid returned nothing"
    assert rows[0]["rrf_score"] >= round(1.0 / 61, 6)
    scores = [r["rrf_score"] for r in rows]
    assert scores == sorted(scores, reverse=True)


@pytest.mark.parametrize("q,qid,alpha", [
    ("hash join merge scan", 0, 0.7),
    ("the row data", 7, 0.5),
    ("window", 11, 1.0),
])
def test_linear_hybrid_vs_duckdb(spark, sf_smoke, con, q, qid, alpha):
    from smse_backend_spark.operators.hybrid import (
        linear_hybrid_sql,
        linear_hybrid_topk,
    )

    corpus = load_corpus(spark, sf_smoke)
    emb = load_embeddings(spark, sf_smoke)
    got = [(r["doc_id"], r["score"])
           for r in linear_hybrid_topk(corpus, emb, q, qid, 10,
                                       alpha=alpha).collect()]
    want = [tuple(r) for r in
            con.execute(linear_hybrid_sql(q, qid, 10, alpha=alpha)).fetchall()]
    assert got == want and len(got) == 10
    # every fused score lies in [0, 1] (convex combo of min-max-normed)
    assert all(0.0 <= s <= 1.0 for _d, s in got)


def test_linear_hybrid_alpha_one_is_pure_bm25_order(spark, sf_smoke):
    """alpha=1.0 must reproduce the BM25 ranking (normalization is
    monotone), with the cosine side contributing nothing."""
    from smse_backend_spark.operators.hybrid import linear_hybrid_topk
    from smse_backend_spark.operators.search import bm25_topk_scan

    corpus = load_corpus(spark, sf_smoke)
    emb = load_embeddings(spark, sf_smoke)
    q = "hash join merge scan"
    fused = [r["doc_id"] for r in
             linear_hybrid_topk(corpus, emb, q, 0, 10, alpha=1.0).collect()]
    pure = [r["doc_id"] for r in bm25_topk_scan(corpus, q, 10).collect()]
    assert fused == pure
