"""Round-3 curation additions: repetition stats, unigram-LM scoring,
bigram PMI, substring-dedup coverage, stratified sampling — each vs its
DuckDB oracle plus targeted semantic assertions on planted inputs."""

from __future__ import annotations

import math

import duckdb
import pytest

from smse_backend_spark.functions import text_quality as Q
from smse_backend_spark.operators import sampling as SA


@pytest.fixture(scope="module")
def docs(spark, sf_smoke):
    d = spark.read.parquet(f"{sf_smoke}/documents.parquet").cache()
    d.count()
    yield d
    # unpersist so the cached full-width relation doesn't get substituted
    # into later modules' plans (it would defeat column-pruning asserts)
    d.unpersist()


@pytest.fixture(scope="module")
def con(sf_smoke):
    c = duckdb.connect()
    c.execute(f"create view documents as select * from '{sf_smoke}/documents.parquet'")
    return c


def _cmp(sdf, con_, sql):
    got = sorted(map(tuple, sdf.collect()))
    want = sorted(map(tuple, con_.execute(sql).fetchall()))
    assert got == want
    assert len(got) > 0


def test_repetition_stats_oracle(docs, con):
    _cmp(Q.repetition_stats(docs), con, Q.repetition_stats_sql())


def test_repetition_stats_planted(spark):
    rows = [
        (0, "a a a a", "en", "s", 7),          # one token 4x: top_uni=1.0
        (1, "x y x y x y", "en", "s", 11),     # top bigram "x y" 3/5 slots
        (2, "", "en", "s", 0),                 # zero tokens -> all zeros
        (3, "p q r s t u v w", "en", "s", 15), # all distinct, no repetition
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string, source string, n_chars long")
    out = {r["doc_id"]: r for r in Q.repetition_stats(df).collect()}
    assert out[0]["top_unigram_frac"] == 1.0
    assert out[0]["dup_trigram_frac"] == 1.0  # "a a a" twice
    assert out[1]["top_bigram_frac"] == 0.6   # 3 of 5 bigram slots
    assert out[2] == (2, 0, 0.0, 0.0, 0.0)
    assert out[3]["top_unigram_frac"] == 0.125
    assert out[3]["dup_trigram_frac"] == 0.0


def test_lm_scores_oracle(docs, con):
    _cmp(Q.lm_unigram_scores(docs), con, Q.lm_unigram_scores_sql())


def test_lm_scores_semantics(spark):
    # corpus: 'common' 9x, 'rare' 1x -> total 10 tokens.
    rows = [(0, "common " * 9, "en", "s", 0), (1, "rare", "en", "s", 0)]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string, source string, n_chars long")
    out = {r["doc_id"]: r["nll"] for r in Q.lm_unigram_scores(df).collect()}
    # doc0 = ln(10/9), doc1 = ln(10/1), quantized to micro-nats
    assert out[0] == pytest.approx(math.log(10 / 9), abs=2e-6)
    assert out[1] == pytest.approx(math.log(10), abs=2e-6)
    assert out[1] > out[0]  # rare-token doc scores higher surprisal


def test_bigram_pmi_oracle(docs, con):
    _cmp(Q.bigram_pmi(docs, 5, 30), con, Q.bigram_pmi_sql(5, 30))


def test_bigram_pmi_collocation_wins(spark):
    # "foo bar" always adjacent; "baz"/"qux" frequent but independent
    text = " ".join(["foo bar"] * 6 + ["baz qux", "qux baz"] * 6)
    df = spark.createDataFrame(
        [(0, text, "en", "s", 0)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    top = Q.bigram_pmi(df, 5, 3).collect()
    assert top[0]["bigram"] == "foo bar"
    assert top[0]["pmi"] > 0


def test_span_dedup_oracle(docs, con):
    _cmp(Q.span_dedup_coverage(docs, 8), con, Q.span_dedup_coverage_sql(8))


def test_span_dedup_planted(spark):
    shared = "one two three four five six seven eight"  # exactly 8 tokens
    rows = [
        (0, shared + " tail0 a b c", "en", "s", 0),
        (1, "head1 zz " + shared, "en", "s", 0),
        (2, "totally different tokens here nine ten eleven twelve", "en", "s", 0),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string, source string, n_chars long")
    out = {r["doc_id"]: r for r in Q.span_dedup_coverage(df, 8).collect()}
    assert out[0]["covered"] == 8 and out[1]["covered"] == 8
    assert out[2]["covered"] == 0 and out[2]["frac"] == 0.0
    assert out[0]["frac"] == pytest.approx(8 / 12, abs=1e-6)


def test_stratified_sample_oracle(docs, con):
    _cmp(SA.stratified_sample(docs, 20), con, SA.stratified_sample_sql(20))


def test_stratified_sample_quota_and_stability(docs):
    out = SA.stratified_sample(docs, 5).collect()
    per = {}
    for r in out:
        per.setdefault(r["lang"], set()).add(r["doc_id"])
    n_langs = docs.select("lang").distinct().count()
    assert len(per) == n_langs
    assert all(len(v) <= 5 for v in per.values())
    # deterministic: same picks on a re-run and under a different layout
    again = SA.stratified_sample(docs.repartition(7), 5).collect()
    assert {(r["doc_id"], r["lang"]) for r in again} == {
        (r["doc_id"], r["lang"]) for r in out
    }


def test_textrank_oracle(docs, con):
    _cmp(Q.textrank_keywords(docs, 20, 5), con, Q.textrank_keywords_sql(20, 5))


def test_textrank_hub_ranks_first(spark):
    """A term adjacent to everything (the hub) must out-rank leaf terms;
    scores stay in PageRank's (1-d, ...) band and are 1e-9-quantized."""
    rows = [
        (1, "hub alpha hub beta hub gamma hub delta", "en"),
        (2, "alpha hub beta hub", "en"),
    ]
    d = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    got = [(r["term"], r["score"]) for r in Q.textrank_keywords(d, 10, 5).collect()]
    assert got[0][0] == "hub"
    assert all(s > 0.15 - 1e-12 for _t, s in got)
    assert all(abs(s * 1e9 - round(s * 1e9)) < 1e-3 for _t, s in got)


def test_gopher_filter_vs_duckdb(spark, sf_smoke):
    import duckdb

    from smse_backend_spark.functions.text_quality import (
        gopher_filter,
        gopher_filter_sql,
    )

    docs = spark.read.parquet(f"{sf_smoke}/documents.parquet")
    con = duckdb.connect()
    con.execute(
        f"create view documents as select * from '{sf_smoke}/documents.parquet'"
    )
    got = [tuple(r) for r in gopher_filter(docs).collect()]
    want = [tuple(w) for w in con.execute(gopher_filter_sql()).fetchall()]
    assert got == want
    n_docs = docs.count()
    # the gate bites but does not reject everything
    assert 0 < len(got) < n_docs
    # every emitted row fails at least one rule
    assert all(not (a and b and c and d) for _i, _n, a, b, c, d in got)
    # a stricter repetition cap rejects strictly more
    strict = gopher_filter(docs, max_top_unigram_pct=10).count()
    assert strict >= len(got)
