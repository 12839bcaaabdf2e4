"""Rank-identity golden tests: Spark scan-mode BM25 vs numpy oracle vs DuckDB.

This is the correctness gate the reference lacks (its suite mocks similarity
with random vectors and never asserts ranking — /root/reference/tests/
conftest.py:7-23). Exact doc_ids, scores to 1e-6.
"""

from __future__ import annotations

import duckdb
import pytest

from smse_backend_spark.corpus import load_corpus, verify_sha256_invariant
from smse_backend_spark.operators.search import bm25_scan_oracle_sql, bm25_topk_scan
from smse_backend_spark.oracle.bm25_numpy import bm25_topk_py

QUERIES = [
    ("hash join merge scan", None),
    ("window", None),
    ("the fast small slow", None),
    ("batch stream spark", "en"),
    ("nonexistentterm", None),
    ("", None),
    ("join join join", None),  # dup terms -> set semantics
    ("camelCaseQuery spark", None),
]


@pytest.fixture(scope="module")
def corpus(spark, sf_smoke):
    c = load_corpus(spark, sf_smoke).cache()
    c.count()
    return c


@pytest.fixture(scope="module")
def pydocs(corpus):
    return [(r["doc_id"], r["content"], r["lang"]) for r in corpus.collect()]


@pytest.mark.parametrize("query,lang", QUERIES)
def test_rank_identity_vs_numpy(corpus, pydocs, query, lang):
    docs = [(d, c) for d, c, lg in pydocs if lang is None or lg == lang]
    want = bm25_topk_py(docs, query, k=10)
    got = [(r["doc_id"], r["score"]) for r in bm25_topk_scan(corpus, query, 10, lang).collect()]
    assert [d for d, _ in got] == [d for d, _ in want]
    for (gd, gs), (wd, ws) in zip(got, want):
        assert gs == pytest.approx(ws, abs=1e-6)


@pytest.mark.parametrize("query,lang", QUERIES)
def test_rank_identity_vs_duckdb(corpus, sf_smoke, query, lang):
    con = duckdb.connect()
    con.execute(
        f"create view documents as select * from '{sf_smoke}/documents.parquet'"
    )
    want = con.execute(bm25_scan_oracle_sql(query, 10, lang)).fetchall()
    got = [(r["doc_id"], r["score"]) for r in bm25_topk_scan(corpus, query, 10, lang).collect()]
    assert [d for d, _ in got] == [d for d, _ in want]
    for (gd, gs), (wd, ws) in zip(got, want):
        assert gs == pytest.approx(ws, abs=1e-6)


@pytest.mark.parametrize(
    "query,weights,lang",
    [
        ("hash join merge scan", None, None),          # content-only hits
        ("py f42 hash join", {"content": 1.0, "path": 3.0}, None),  # cross-field
        ("src window", None, "en"),                    # path-saturating term + lang
        ("nonexistentterm", None, None),               # empty result
        ("", None, None),                              # empty query
    ],
)
def test_multi_field_vs_duckdb(corpus, sf_smoke, query, weights, lang):
    """Fielded BM25 (per-field df/avgdl spaces, weighted sum) == DuckDB twin."""
    from smse_backend_spark.operators.search import (
        multi_field_bm25_scan,
        multi_field_oracle_sql,
    )

    con = duckdb.connect()
    con.execute(
        f"create view documents as select * from '{sf_smoke}/documents.parquet'"
    )
    want = con.execute(multi_field_oracle_sql(query, weights, 10, lang)).fetchall()
    got = [
        (r["doc_id"], r["score"])
        for r in multi_field_bm25_scan(corpus, query, weights, 10, lang).collect()
    ]
    assert [d for d, _ in got] == [d for d, _ in want], (got, want)
    for (_gd, gs), (_wd, ws) in zip(got, want):
        assert gs == pytest.approx(ws, abs=1e-6)


def test_multi_field_scans_dont_grow_with_fields(corpus):
    """The fields stack into one exploded frame, so adding a field must
    not add a corpus scan to the plan."""
    from smse_backend_spark.operators.search import multi_field_bm25_scan

    def scan_count(weights):
        plan = (
            multi_field_bm25_scan(corpus, "hash src join", weights, 10)
            ._jdf.queryExecution().executedPlan().toString()
        )
        return plan.count("InMemoryTableScan") + plan.count("Scan parquet")

    assert scan_count({"content": 1.0, "path": 2.0}) == scan_count({"content": 1.0})


def _con(sf_smoke):
    con = duckdb.connect()
    con.execute(
        f"create view documents as select * from '{sf_smoke}/documents.parquet'"
    )
    return con


def test_stemmer_lockstep(corpus, sf_smoke):
    """stem_py == stem_duckdb_sql == stem_col on real corpus tokens and
    hand-picked suffix edge cases."""
    from smse_backend_spark.functions.tokenizer import (
        stem_duckdb_sql,
        stem_py,
    )

    edge = ["ties", "cities", "eies", "aies", "goes", "tables", "types",
            "trees", "bus", "class", "is", "as", "its", "was", "queries",
            "does", "uses", "s", "es", "ies", "x9s", "batches"]
    con = duckdb.connect()
    got = con.execute(
        f"SELECT {stem_duckdb_sql('?')}", [edge]
    ).fetchone()[0]
    assert got == [stem_py(t) for t in edge]


@pytest.mark.parametrize("query,lang", [
    ("tables scans windows merges", None),
    ("hash join merge scan", None),  # stemming a stem-free query = identity path
    ("queries batches", "en"),
])
def test_stemmed_bm25_vs_duckdb(corpus, sf_smoke, query, lang):
    got = [
        (r["doc_id"], r["score"])
        for r in bm25_topk_scan(corpus, query, 10, lang, stem=True).collect()
    ]
    want = _con(sf_smoke).execute(
        bm25_scan_oracle_sql(query, 10, lang, stem=True)
    ).fetchall()
    assert got == [tuple(w) for w in want]


def test_search_after_vs_duckdb_and_page_property(corpus, sf_smoke):
    """Page 2 == oracle, and page1 + page2 == top-2k of the scan."""
    from smse_backend_spark.operators.search import (
        bm25_search_after,
        search_after_oracle_sql,
    )

    q = "hash join merge scan"
    p2 = [(r["doc_id"], r["score"])
          for r in bm25_search_after(corpus, q, 10).collect()]
    want = _con(sf_smoke).execute(search_after_oracle_sql(q, 10)).fetchall()
    assert p2 == [tuple(w) for w in want]
    p1 = [(r["doc_id"], r["score"]) for r in bm25_topk_scan(corpus, q, 10).collect()]
    both = [(r["doc_id"], r["score"]) for r in bm25_topk_scan(corpus, q, 20).collect()]
    assert p1 + p2 == both
    # degenerate: match set smaller than a page -> empty page 2
    assert bm25_search_after(corpus, "nonexistentterm", 10).count() == 0


def test_collapse_vs_duckdb(corpus, sf_smoke):
    from smse_backend_spark.operators.search import (
        collapse_oracle_sql,
        collapse_topk,
    )

    q = "hash join merge scan"
    got = [tuple(r) for r in collapse_topk(corpus, q, 10, "repo").collect()]
    want = [tuple(w) for w in
            _con(sf_smoke).execute(collapse_oracle_sql(q, 10, "source")).fetchall()]
    assert got == want
    # one hit per group, by construction
    keys = [g for g, *_ in got]
    assert len(keys) == len(set(keys))


def test_facet_top_hits_vs_duckdb(corpus, sf_smoke):
    from smse_backend_spark.operators.search import (
        facet_top_hits,
        facet_top_hits_oracle_sql,
    )

    q = "hash join merge scan"
    got = [tuple(r) for r in facet_top_hits(corpus, q, "lang", 3).collect()]
    want = [tuple(w) for w in
            _con(sf_smoke).execute(facet_top_hits_oracle_sql(q, "lang", 3)).fetchall()]
    assert got == want
    assert all(rank <= 3 for _f, rank, *_ in got)


def test_dismax_vs_duckdb_and_sum_equivalence(corpus, sf_smoke):
    """dis_max == oracle; and with tie_breaker=1.0 it degenerates to the
    multi-field weighted sum (same rows, same scores)."""
    from smse_backend_spark.operators.search import (
        dis_max_bm25_scan,
        dis_max_oracle_sql,
        multi_field_bm25_scan,
    )

    q = "py f42 hash join"
    wts = {"content": 1.0, "path": 2.0}
    got = [(r["doc_id"], r["score"])
           for r in dis_max_bm25_scan(corpus, q, wts, 0.3, 10).collect()]
    want = _con(sf_smoke).execute(dis_max_oracle_sql(q, wts, 0.3, 10)).fetchall()
    assert got == [tuple(w) for w in want]

    tb1 = {(r["doc_id"], r["score"])
           for r in dis_max_bm25_scan(corpus, q, wts, 1.0, 10).collect()}
    ms = {(r["doc_id"], r["score"])
          for r in multi_field_bm25_scan(corpus, q, wts, 10).collect()}
    assert {d for d, _ in tb1} == {d for d, _ in ms}
    sc1 = dict(tb1)
    for d, s in ms:
        assert sc1[d] == pytest.approx(s, abs=2e-6)


def test_sha256_invariant(corpus):
    assert verify_sha256_invariant(corpus) == 0


def test_topk_is_take_ordered(corpus):
    plan = bm25_topk_scan(corpus, "hash join")._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan


def test_highlight_snippets_vs_oracle(corpus, sf_smoke):
    """highlight_snippets == DuckDB oracle: same rarest-term pick
    (df asc, term asc), same first-occurrence window, same <em> marks."""
    from smse_backend_spark.operators.search import (
        highlight_snippets,
        highlight_snippets_oracle_sql,
    )

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{sf_smoke}/documents.parquet'"
    )
    for q, k, w in [
        ("hash join merge scan", 10, 3),
        ("window", 5, 2),
        ("the row data", 10, 4),
        ("nonexistentterm", 10, 3),
    ]:
        topk = bm25_topk_scan(corpus, q, k)
        got = [tuple(r) for r in highlight_snippets(corpus, topk, q, window=w).collect()]
        want = [tuple(r) for r in
                con.execute(highlight_snippets_oracle_sql(q, k, window=w)).fetchall()]
        assert got == want, (q, k, w, got[:2], want[:2])


@pytest.mark.parametrize(
    "query,weights,lang",
    [
        ("py f42 hash join", None, None),            # terms split across fields
        ("hash join merge scan", None, None),        # content-only hits
        ("src window", {"content": 1.0, "path": 3.0}, "en"),
        ("nonexistentterm", None, None),
    ],
)
def test_cross_fields_vs_duckdb(corpus, sf_smoke, query, weights, lang):
    """cross_fields (blended df, per-term field max) == DuckDB twin."""
    from smse_backend_spark.operators.search import (
        cross_fields_bm25_scan,
        cross_fields_oracle_sql,
    )

    want = _con(sf_smoke).execute(
        cross_fields_oracle_sql(query, weights, 10, lang)).fetchall()
    got = [
        (r["doc_id"], r["score"])
        for r in cross_fields_bm25_scan(corpus, query, weights, 10, lang).collect()
    ]
    assert got == [tuple(w) for w in want], (got, want)


def test_cross_fields_is_term_centric(corpus, spark):
    """Semantics pin: a term matching BOTH fields contributes once (max)
    under cross_fields, twice (sum) under multi_field. On the real corpus
    no token overlaps content and path (the law is vacuous there — match
    sets must still agree), so the double-dip is pinned on a crafted
    frame where 'alpha' sits in both fields of doc 1 with equal
    field-local and blended df."""
    from smse_backend_spark.operators.search import (
        cross_fields_bm25_scan,
        multi_field_bm25_scan,
    )

    q = "py f42 hash join"
    wts = {"content": 1.0, "path": 2.0}
    cf = {r["doc_id"]: r["score"]
          for r in cross_fields_bm25_scan(corpus, q, wts, 10_000).collect()}
    mf = {r["doc_id"]: r["score"]
          for r in multi_field_bm25_scan(corpus, q, wts, 10_000).collect()}
    assert set(cf) == set(mf)  # same match set: a term anywhere matches

    tiny = spark.createDataFrame(
        [
            (1, "alpha beta pad pad", "alpha/x.py"),
            (2, "beta gamma pad pad", "delta/y.py"),
            (3, "gamma delta pad pad", "omega/z.py"),
        ],
        "doc_id long, content string, path string",
    )
    cf2 = {r["doc_id"]: r["score"]
           for r in cross_fields_bm25_scan(tiny, "alpha beta", wts, 10).collect()}
    mf2 = {r["doc_id"]: r["score"]
           for r in multi_field_bm25_scan(tiny, "alpha beta", wts, 10).collect()}
    assert cf2[1] < mf2[1] - 1e-9  # alpha double-dips only in the sum
    assert cf2[2] == pytest.approx(mf2[2], abs=2e-6)  # single-field hits agree


def test_multi_format_sources_are_rank_identical(spark, sf_smoke):
    """JSONL / CSV / ORC sources feed the identical corpus projection:
    same sha256 invariants, same BM25 top-k as the parquet path."""
    from smse_backend_spark.corpus import (
        SOURCE_FORMATS,
        load_corpus,
        load_corpus_from,
        verify_sha256_invariant,
    )
    from smse_backend_spark.operators.search import bm25_topk_scan

    base = load_corpus(spark, sf_smoke)
    want_rows = sorted(map(tuple, base.collect()))
    want_topk = [tuple(r) for r in
                 bm25_topk_scan(base, "hash join merge scan", 10).collect()]
    for fmt in SOURCE_FORMATS:
        c = load_corpus_from(spark, sf_smoke, fmt)
        assert sorted(map(tuple, c.collect())) == want_rows, fmt
        assert verify_sha256_invariant(c) == 0, fmt
        got = [tuple(r) for r in
               bm25_topk_scan(c, "hash join merge scan", 10).collect()]
        assert got == want_topk, fmt
