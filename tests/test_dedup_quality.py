"""Dedup + text-quality operators vs DuckDB oracles (sf0.001 for the
quadratic ones, sf0.01 for map-pass ones)."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from smse_backend_spark.functions import text_quality as Q
from smse_backend_spark.operators import dedup as D


@pytest.fixture(scope="module")
def docs_small(spark, sf_smoke):
    d = spark.read.parquet(f"{sf_smoke}/documents.parquet").cache()
    d.count()
    yield d
    # unpersist so the cached full-width relation doesn't get substituted
    # into later modules' plans (it would defeat column-pruning asserts)
    d.unpersist()


@pytest.fixture(scope="module")
def docs(spark, sf_correct):
    d = spark.read.parquet(f"{sf_correct}/documents.parquet").cache()
    d.count()
    yield d
    d.unpersist()


@pytest.fixture(scope="module")
def con_small(sf_smoke):
    c = duckdb.connect()
    c.execute(f"create view documents as select * from '{sf_smoke}/documents.parquet'")
    c.execute(f"create view embeddings as select * from '{sf_smoke}/embeddings.parquet'")
    return c


@pytest.fixture(scope="module")
def con(sf_correct):
    c = duckdb.connect()
    c.execute(f"create view documents as select * from '{sf_correct}/documents.parquet'")
    c.execute(f"create view embeddings as select * from '{sf_correct}/embeddings.parquet'")
    return c


def _cmp(sdf, con_, sql, allow_empty=False):
    got = sorted(map(tuple, sdf.collect()))
    want = sorted(map(tuple, con_.execute(sql).fetchall()))
    assert got == want
    if not allow_empty:
        assert len(got) > 0


def test_sha_int_parity(spark):
    """Spark conv(sha2) == DuckDB hex-cast == python int(hexdigest)."""
    import hashlib

    want = int(hashlib.sha256(b"abc").hexdigest()[:15], 16)
    got = spark.range(1).select(
        F.conv(F.substring(F.sha2(F.lit("abc"), 256), 1, 15), 16, 10).cast("long")
    ).first()[0]
    assert got == want == 839782156265856254


def test_exact_dup_groups(docs, con):
    _cmp(D.exact_dup_groups(docs), con, D.exact_dup_groups_sql(), allow_empty=True)


def test_dedup_exact(docs, con):
    _cmp(D.dedup_exact(docs), con, D.dedup_exact_sql())


def test_shingles_match_duckdb(docs_small, con_small):
    got = {
        r["doc_id"]: sorted(r["sh"])
        for r in docs_small.select("doc_id", D.shingles_col(F.col("text"), 3).alias("sh")).collect()
    }
    from smse_backend_spark.functions.tokenizer import tokenize_duckdb_sql

    want = {
        r[0]: sorted(r[1])
        for r in con_small.execute(
            f"SELECT doc_id, {D._shingles_duckdb(3)} FROM "
            f"(SELECT doc_id, {tokenize_duckdb_sql('text')} AS t FROM documents)"
        ).fetchall()
    }
    assert got == want


def test_ngram_jaccard_pairs(docs_small, con_small):
    _cmp(
        D.ngram_jaccard_pairs(docs_small, 3, 0.35),
        con_small,
        D.ngram_jaccard_pairs_sql(3, 0.35),
    )


def test_minhash_lsh_pairs(docs_small, con_small):
    _cmp(
        D.minhash_lsh_pairs(docs_small, 16, 4),
        con_small,
        D.minhash_lsh_pairs_sql(16, 4),
        allow_empty=True,
    )


def test_minhash_lsh_recall_vs_jaccard(docs_small):
    """LSH candidates must contain every truly-similar pair (high-j recall)."""
    true_pairs = {
        (r["doc_a"], r["doc_b"])
        for r in D.ngram_jaccard_pairs(docs_small, 3, 0.9).collect()
    }
    cand = {
        (r["doc_a"], r["doc_b"]) for r in D.minhash_lsh_pairs(docs_small, 16, 8).collect()
    }
    assert true_pairs <= cand


def test_embedding_near_dup(spark, sf_smoke, con_small):
    emb = spark.read.parquet(f"{sf_smoke}/embeddings.parquet")
    _cmp(D.embedding_near_dup(emb, 0.3), con_small, D.embedding_near_dup_sql(0.3))


def test_token_stats(docs, con):
    _cmp(Q.token_stats(docs), con, Q.token_stats_sql())


def test_quality_scores(docs, con):
    _cmp(Q.quality_scores(docs, 0.2), con, Q.quality_scores_sql(0.2))


def test_lang_id(docs, con):
    _cmp(Q.lang_id(docs), con, Q.lang_id_sql())


def test_doc_fingerprint(docs, con):
    _cmp(Q.doc_fingerprint(docs), con, Q.doc_fingerprint_sql())


def test_connected_components_min_label(spark):
    from smse_backend_spark.operators.dedup import connected_components

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (5, 3)], "doc_a long, doc_b long"
    )
    got = {r["doc_id"]: r["cluster_id"]
           for r in connected_components(pairs).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 5: 1, 10: 10, 11: 10}


def test_dup_clusters_vs_duckdb(spark, sf_smoke):
    import duckdb

    from smse_backend_spark.operators.dedup import dup_clusters, dup_clusters_sql

    docs = spark.read.parquet(f"{sf_smoke}/documents.parquet")
    got = sorted((r["doc_id"], r["cluster_id"])
                 for r in dup_clusters(docs, 16, 4).collect())
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{sf_smoke}/documents.parquet'"
    )
    want = sorted(map(tuple, con.execute(dup_clusters_sql(16, 4)).fetchall()))
    assert got == want
    # the survivor view is closed under representatives: every cluster_id
    # is itself a surviving doc_id
    reps = {c for _d, c in got}
    survivors = {d for d, c in got if d == c}
    assert reps <= survivors


def test_auto_stopwords_and_tfidf_vs_duckdb(spark, sf_smoke):
    """Corpus-derived stopwords and tf-idf export match their SQL twins;
    the ratio cut and the doc_id output cut behave as documented."""
    import duckdb

    from smse_backend_spark.functions.text_quality import (
        auto_stopwords,
        auto_stopwords_sql,
        tfidf_vectors,
        tfidf_vectors_sql,
    )

    docs = spark.read.parquet(f"{sf_smoke}/documents.parquet")
    con = duckdb.connect()
    con.execute(
        f"create view documents as select * from '{sf_smoke}/documents.parquet'"
    )
    got = [tuple(r) for r in auto_stopwords(docs, 0.4, 20).collect()]
    want = [tuple(w) for w in con.execute(auto_stopwords_sql(0.4, 20)).fetchall()]
    assert got == want
    assert all(ratio > 0.4 for _t, _d, ratio in got)

    got = [tuple(r) for r in tfidf_vectors(docs, 50).collect()]
    want = [tuple(w) for w in con.execute(tfidf_vectors_sql(50)).fetchall()]
    assert got == want
    assert got and all(d < 50 for d, *_ in got)
    # idf uses the FULL corpus: a universal term must get weight ~0 only
    # if df == N; spot-check weights are finite and non-negative-ish
    assert all(w == w for *_x, w in got)  # no NaNs


def test_substring_dup_pairs(docs, con):
    _cmp(
        D.substring_dup_pairs(docs, 8, 2, 20),
        con,
        D.substring_dup_pairs_sql(8, 2, 20),
    )
    rows = D.substring_dup_pairs(docs, 8, 2, 20).collect()
    assert rows and all(r["doc_a"] < r["doc_b"] for r in rows)
    shared = [r["n_shared"] for r in rows]
    assert shared == sorted(shared, reverse=True) and min(shared) >= 2
    # a longer window is strictly more selective: every 9-window pair at
    # the same threshold also shares >= 2 8-windows
    p9 = {(r["doc_a"], r["doc_b"]) for r in
          D.substring_dup_pairs(docs, 9, 2, 10**6).collect()}
    p8 = {(r["doc_a"], r["doc_b"]) for r in
          D.substring_dup_pairs(docs, 8, 2, 10**6).collect()}
    assert p9 <= p8
    # the hot-window cut matches the oracle's identical cut
    _cmp(
        D.substring_dup_pairs(docs, 8, 2, 20, max_df=5),
        con,
        D.substring_dup_pairs_sql(8, 2, 20, max_df=5),
        allow_empty=True,
    )


def test_categorize_text(docs, con):
    from smse_backend_spark.operators import aggregations as AG

    _cmp(
        AG.categorize_text(docs.withColumnRenamed("text", "content"), 4, 20),
        con,
        AG.categorize_text_sql(4, 20),
    )
    rows = AG.categorize_text(
        docs.withColumnRenamed("text", "content"), 4, 20
    ).collect()
    assert rows and all(len(r["category"].split(" ")) <= 4 for r in rows)
    counts = [r["doc_count"] for r in rows]
    assert counts == sorted(counts, reverse=True)


def test_ccnet_buckets(docs, con):
    """Perplexity terciles == DuckDB twin; buckets are ~equal thirds and
    head holds the lowest-NLL docs."""
    from smse_backend_spark.functions.text_quality import (
        ccnet_buckets,
        ccnet_buckets_sql,
    )

    _cmp(ccnet_buckets(docs), con, ccnet_buckets_sql())
    rows = ccnet_buckets(docs).collect()
    by = {}
    for r in rows:
        by.setdefault(r["bucket"], []).append(r["nll"])
    assert set(by) == {"head", "middle", "tail"}
    n = len(rows)
    for vals in by.values():
        assert n / 6 < len(vals) < n / 2  # roughly a third each
    assert max(by["head"]) <= min(by["tail"])
    assert max(by["head"]) <= max(by["middle"]) <= max(by["tail"])
