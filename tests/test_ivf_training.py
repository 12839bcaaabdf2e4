"""IVF centroid training (one deterministic Lloyd round).

Two claims:
1. Recall — on a planted-cluster corpus whose seeds are degenerate (both
   in one cluster), one Lloyd round separates the clusters and lifts
   recall@10 vs the untrained seeds (VERDICT r2 #4).
2. Exact oracle parity — the trained path is bit-replayable in DuckDB
   (integer-quantized means are order-independent).
"""

from __future__ import annotations

import duckdb
import numpy as np
import pytest
from pyspark.sql import functions as F

from smse_backend_spark.operators.ann import (
    brute_force_topk,
    ivf_topk,
    ivf_trained_topk_sql,
    train_ivf_centroids,
)

DIM = 8


@pytest.fixture(scope="module")
def planted(spark):
    """Clusters A (around e0) and B (around e1), 60 points each. BOTH
    seeds (vec_id 0, 1) sit in cluster A — the worst-case init: cluster B
    splits arbitrarily across the two lists, so an n_probe=1 query inside
    B misses the other half. One Lloyd round pulls centroid 1 onto B."""
    rng = np.random.default_rng(7)
    u = np.zeros(DIM); u[0] = 1.0
    v = np.zeros(DIM); v[1] = 1.0
    w = np.zeros(DIM); w[2] = 1.0
    rows = []
    s1 = u + 0.15 * w
    rows.append((0, [float(x) for x in u]))
    rows.append((1, [float(x) for x in s1 / np.linalg.norm(s1)]))
    vid = 2
    for _ in range(58):
        rows.append((vid, [float(x) for x in u + 0.05 * rng.standard_normal(DIM)]))
        vid += 1
    for _ in range(60):
        rows.append((vid, [float(x) for x in v + 0.05 * rng.standard_normal(DIM)]))
        vid += 1
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


@pytest.fixture(scope="module")
def b_query():
    q = np.zeros(DIM)
    q[1] = 1.0
    q[2] = 0.01
    return {999: [float(x) for x in q]}


def _recall(approx_df, exact_df):
    a = {(r["query_id"], r["vec_id"]) for r in approx_df.collect()}
    e = {(r["query_id"], r["vec_id"]) for r in exact_df.collect()}
    return len(a & e) / len(e)


def test_lloyd_round_improves_recall(planted, b_query):
    exact = brute_force_topk(planted, b_query, k=10)
    untrained = ivf_topk(planted, b_query, 10, n_centroids=2, n_probe=1)
    trained = ivf_topk(
        planted, b_query, 10, n_centroids=2, n_probe=1, train_iters=1
    )
    r0, r1 = _recall(untrained, exact), _recall(trained, exact)
    assert r0 < 1.0, "planted corpus must defeat the degenerate seeds"
    assert r1 == 1.0, f"one Lloyd round should recover cluster B: {r1}"
    assert r1 > r0


def test_trained_centroids_move_to_clusters(planted):
    _, c1 = train_ivf_centroids(planted, n_centroids=2, iters=1)
    # after training one centroid is dominated by dim 1 (cluster B)
    dom = [int(np.argmax(np.abs(c))) for c in c1]
    assert 0 in dom and 1 in dom, f"trained centroids not separated: {c1}"


def test_empty_list_keeps_seed(spark):
    # two identical seeds: every vector ties to the smaller c_id, list 1
    # is empty, so centroid 1 must survive as its seed
    rows = [(0, [1.0, 0.0]), (1, [1.0, 0.0]), (2, [0.9, 0.1])]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    _, c = train_ivf_centroids(emb, n_centroids=2, iters=1)
    assert c[1].tolist() == [1.0, 0.0]


def test_trained_matches_duckdb_oracle(spark, sf_smoke):
    emb = spark.read.parquet(f"{sf_smoke}/embeddings.parquet")
    qrows = emb.filter(F.col("vec_id").isin([0, 1, 2])).collect()
    queries = {r["vec_id"]: [float(x) for x in r["embedding"]] for r in qrows}
    got = sorted(
        map(
            tuple,
            ivf_topk(
                emb, queries, 10, n_centroids=16, n_probe=4, train_iters=1
            ).collect(),
        )
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM '{sf_smoke}/embeddings.parquet'"
    )
    want = sorted(
        map(
            tuple,
            con.execute(
                ivf_trained_topk_sql([0, 1, 2], dim=64, k=10,
                                     n_centroids=16, n_probe=4)
            ).fetchall(),
        )
    )
    assert got == want


def test_filtered_ivf_vs_oracle_and_predicate(spark, sf_smoke):
    """Filtered ANN: engine == DuckDB twin; every hit satisfies the
    predicate; hits are a sub-ranking of the unfiltered candidate set
    (pre-filter prunes candidates, never rescores)."""
    from smse_backend_spark.operators.ann import ivf_topk_sql

    emb = spark.read.parquet(f"{sf_smoke}/embeddings.parquet")
    qrows = {
        int(r["vec_id"]): [float(x) for x in r["embedding"]]
        for r in emb.filter(F.col("vec_id") < 3).collect()
    }
    got = sorted(tuple(r) for r in
                 ivf_topk(emb, qrows, 10, 16, 4, filter_label=3).collect())
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM '{sf_smoke}/embeddings.parquet'"
    )
    want = sorted(tuple(w) for w in con.execute(
        ivf_topk_sql([0, 1, 2], 10, 16, 4, filter_label=3)).fetchall())
    assert got == want and got
    labels = {
        int(r["vec_id"]): int(r["label"])
        for r in emb.select("vec_id", "label").collect()
    }
    assert all(labels[v] == 3 for _q, _rk, v, _s in got)
    # sub-ranking: each hit's score equals its unfiltered candidate score
    full = {(q, v): s for q, _rk, v, s in
            ivf_topk(emb, qrows, 10_000, 16, 4).collect()}
    assert all((q, v) in full and full[(q, v)] == s for q, _rk, v, s in got)


def test_mmr_vs_duckdb_and_diversity(spark, sf_smoke):
    from smse_backend_spark.operators.ann import mmr_oracle_sql, mmr_topk

    emb = spark.read.parquet(f"{sf_smoke}/embeddings.parquet")
    got = [tuple(r) for r in mmr_topk(emb, 0, 5, 20, 0.7, 0.3).collect()]
    con = duckdb.connect()
    con.execute(
        f"create view embeddings as select * from "
        f"'{sf_smoke}/embeddings.parquet'"
    )
    want = [tuple(w) for w in
            con.execute(mmr_oracle_sql(0, 5, 20, 0.7, 0.3)).fetchall()]
    assert got == want and len(got) == 5
    # ranks are 1..5, no repeats, query row excluded
    assert [r for r, _v, _s in got] == [1, 2, 3, 4, 5]
    picks = [v for _r, v, _s in got]
    assert len(set(picks)) == 5 and 0 not in picks
    # the first pick is the plain cosine argmax; later picks may diverge
    # from pure relevance order (that's the diversification)
    from smse_backend_spark.operators.ann import brute_force_topk as bf

    qv = emb.filter(F.col("vec_id") == 0).first()["embedding"]
    plain = [r["vec_id"] for r in
             bf(emb.filter(F.col("vec_id") != 0), {0: list(qv)}, 5).collect()]
    assert picks[0] == plain[0] and picks != plain
    # mmr=1.0 lambda degenerates to pure relevance
    pure = [tuple(r) for r in mmr_topk(emb, 0, 5, 20, 1.0, 0.0).collect()]
    assert [v for _r, v, _s in pure] == plain


def test_rescore_vs_duckdb_and_recall(spark, sf_smoke):
    """ES rescore_vector: sq8 oversample + exact re-rank == DuckDB twin;
    scores in the output are the EXACT cosines (phase-1 quantization
    error never reaches the result), and a larger oversample converges
    to the exact brute-force top-k."""
    from smse_backend_spark.operators.ann import (
        brute_force_topk,
        rescore_topk,
        rescore_topk_sql,
    )

    emb = spark.read.parquet(f"{sf_smoke}/embeddings.parquet")
    rows = emb.filter(F.col("vec_id").isin([0, 1, 2])).collect()
    qs = {r["vec_id"]: [float(x) for x in r["embedding"]] for r in rows}
    got = sorted(
        tuple(r) for r in rescore_topk(emb, qs, 10, oversample=3.0).collect()
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM "
        f"'{sf_smoke}/embeddings.parquet'"
    )
    want = sorted(
        tuple(w) for w in
        con.execute(rescore_topk_sql([0, 1, 2], 10, 3.0)).fetchall()
    )
    assert got == want and got
    # exact scores: every (query, vec, score) also appears in brute force
    exact = {(r["query_id"], r["vec_id"]): r["score"]
             for r in brute_force_topk(emb, qs, 10**6).collect()}
    for (q, _rk, v, s) in got:
        assert exact[(q, v)] == s
    # with oversample covering the whole corpus, rescore == brute force
    n = emb.count()
    full = sorted(tuple(r) for r in
                  rescore_topk(emb, qs, 10, oversample=n / 10).collect())
    bf = sorted(tuple(r) for r in brute_force_topk(emb, qs, 10).collect())
    assert full == bf


def test_maxsim_vs_duckdb_and_bounds(spark, sf_smoke):
    """MaxSim == DuckDB twin; the score is bounded by |Q| (each token's
    best cosine <= 1) and a doc containing a query vector verbatim gets
    that token's max = 1."""
    from smse_backend_spark.operators.ann import maxsim_topk, maxsim_topk_sql

    emb = spark.read.parquet(f"{sf_smoke}/embeddings.parquet")
    rows = emb.filter(F.col("vec_id").isin([0, 1, 2])).collect()
    qs = {r["vec_id"]: [float(x) for x in r["embedding"]] for r in rows}
    got = sorted(tuple(r) for r in maxsim_topk(emb, qs, 8, 10).collect())
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM "
        f"'{sf_smoke}/embeddings.parquet'"
    )
    want = sorted(tuple(w) for w in
                  con.execute(maxsim_topk_sql([0, 1, 2], 8, 10)).fetchall())
    assert got == want and got
    assert all(s <= 3.0 + 1e-9 for _d, s in got)
    # doc 0 holds vectors 0..7, i.e. ALL three query vectors verbatim:
    # every token's best cosine is exactly 1 -> score 3.0, rank 1
    top = maxsim_topk(emb, qs, 8, 10).collect()[0]
    assert top["doc_id"] == 0 and top["score"] == 3.0
