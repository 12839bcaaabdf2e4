"""Vector-search operators vs DuckDB oracles + the reference's only numeric
golden tests (multipart fusion, tests/test_routes/test_multipart_search.py:66-123
in /root/reference) replicated exactly."""

from __future__ import annotations

import duckdb
import numpy as np
import pytest
from pyspark.sql import functions as F

from smse_backend_spark.operators.similarity import (
    cosine_topk,
    cosine_topk_sql,
    fuse_multipart,
    fuse_multipart_sql,
    load_embeddings,
    multimodal_search,
    multimodal_search_sql,
)


@pytest.fixture(scope="module")
def emb(spark, sf_correct):
    e = load_embeddings(spark, sf_correct).cache()
    e.count()
    return e


@pytest.fixture(scope="module")
def con(sf_correct):
    c = duckdb.connect()
    c.execute(f"create view embeddings as select * from '{sf_correct}/embeddings.parquet'")
    return c


def _cmp(sdf, con, sql):
    got = sorted(map(tuple, sdf.collect()))
    want = sorted(map(tuple, con.execute(sql).fetchall()))
    assert got == want


@pytest.mark.parametrize(
    "qid,k,modality,user",
    [(0, 10, None, None), (7, 5, "text", None), (3, 30, "audio", None), (11, 10, None, 2)],
)
def test_cosine_topk_vs_duckdb(emb, con, qid, k, modality, user):
    _cmp(cosine_topk(emb, qid, k, modality, user), con, cosine_topk_sql(qid, k, modality, user))


@pytest.mark.parametrize("qid,qmod", [(0, "text"), (5, "audio"), (2, "image")])
def test_multimodal_search_vs_duckdb(emb, con, qid, qmod):
    _cmp(multimodal_search(emb, qid, qmod), con, multimodal_search_sql(qid, qmod))


def test_multimodal_threshold_actually_gates(emb):
    """With text->text 0.36, most random-vector hits must be filtered out."""
    ungated = cosine_topk(emb, 0, 90).count()
    gated = multimodal_search(emb, 0, "text", k=90, per_modality_limit=90).count()
    assert gated < ungated


@pytest.mark.parametrize("vec_ids", [[0], [0, 1, 2], [4, 9, 14]])
def test_fuse_multipart_vs_duckdb(emb, con, vec_ids):
    got = fuse_multipart(emb, vec_ids).collect()[0]
    want = con.execute(fuse_multipart_sql(vec_ids)).fetchone()
    assert got["primary_modality"] == want[1]
    assert got["fused"] == pytest.approx(list(want[0]), abs=1e-9)


# --- the reference's exact numeric fixtures (FIXTURES.md §5) ---------------

def _fuse_inline(spark, vectors, modalities):
    """Run the same fusion plan over an inline frame mirroring the reference
    unit tests (vec_id = part order, so first-seen == min(vec_id))."""
    rows = [(i, [float(x) for x in v], m) for i, (v, m) in enumerate(zip(vectors, modalities))]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>, modality string")
    out = fuse_multipart(df, list(range(len(rows)))).collect()
    return (out[0]["fused"], out[0]["primary_modality"]) if out else (None, None)


def test_fusion_single_vector_identity(spark):
    fused, mod = _fuse_inline(spark, [[1, 2, 3]], ["text"])
    assert fused == [1.0, 2.0, 3.0] and mod == "text"


def test_fusion_exact_mean_and_mode(spark):
    fused, mod = _fuse_inline(
        spark, [[1, 2, 3], [3, 4, 5], [5, 6, 7]], ["text", "image", "text"]
    )
    assert fused == [3.0, 4.0, 5.0] and mod == "text"


def test_fusion_mode_tie_first_seen_wins(spark):
    _, mod = _fuse_inline(spark, [[1, 2], [3, 4]], ["image", "text"])
    assert mod == "image"  # tie -> first-seen (services/embedding.py:86-92)


def test_fusion_empty_returns_no_row(spark):
    df = spark.createDataFrame([], "vec_id long, embedding array<float>, modality string")
    assert fuse_multipart(df, [0, 1]).collect() == []


def test_cosine_col_matches_numpy(spark):
    from smse_backend_spark.functions.vectors import cosine_col

    rng = np.random.default_rng(42)
    a, b = rng.random(64), rng.random(64)
    df = spark.createDataFrame(
        [([float(x) for x in a], [float(y) for y in b])], "a array<double>, b array<double>"
    )
    got = df.select(cosine_col(F.col("a"), F.col("b")).alias("c")).first()["c"]
    want = float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))
    assert got == pytest.approx(want, abs=1e-12)
