"""Oracle-identity tests for the search-analytics batch: significant terms,
percolation, BM25F, sort-by-field, and range-filtered retrieval."""

from __future__ import annotations

import duckdb
import pytest

from smse_backend_spark.corpus import load_corpus
from smse_backend_spark.operators.aggregations import (
    percolate,
    percolate_sql,
    significant_terms,
    significant_terms_sql,
)
from smse_backend_spark.operators.search import (
    bm25_range_oracle_sql,
    bm25_range_topk,
    bm25f_oracle_sql,
    bm25f_scan,
    bm25_topk_scan,
    multi_field_bm25_scan,
    sort_by_field_oracle_sql,
    sort_by_field_topk,
)

STORED_QUERIES = {
    1: "hash join",
    2: "window scan sort",
    3: "nonexistentterm",
    4: "the",
}


@pytest.fixture(scope="module")
def corpus(spark, sf_smoke):
    c = load_corpus(spark, sf_smoke).cache()
    c.count()
    return c


@pytest.fixture(scope="module")
def con(sf_smoke):
    c = duckdb.connect()
    c.execute(
        f"create view documents as select * from '{sf_smoke}/documents.parquet'"
    )
    return c


@pytest.mark.parametrize("query,lang", [
    ("hash join", None),
    ("window", "en"),
    ("nonexistentterm", None),
    ("", None),
])
def test_significant_terms_vs_duckdb(corpus, con, query, lang):
    got = [tuple(r) for r in significant_terms(corpus, query, 15, lang).collect()]
    want = [tuple(w) for w in
            con.execute(significant_terms_sql(query, 15, lang)).fetchall()]
    assert got == want
    # query terms are in their own foreground -> they surface near the top
    if query and query != "nonexistentterm":
        assert any(t in query.split() for t, *_ in got[:3])


def test_percolate_vs_duckdb(corpus, con):
    got = [tuple(r) for r in percolate(corpus, STORED_QUERIES, 100).collect()]
    want = [tuple(w) for w in
            con.execute(percolate_sql(STORED_QUERIES, 100)).fetchall()]
    assert got == want
    # conjunctive semantics: the zero-hit query never matches
    assert all(q != 3 for _d, q in got)
    # 'the' is near-universal: sanity that matching happened at all
    assert any(q == 4 for _d, q in got)


def test_percolate_conjunctive_not_disjunctive(corpus, con):
    """A doc containing 'hash' but not 'join' must NOT match query 1."""
    rows = con.execute(
        "SELECT doc_id FROM documents "
        "WHERE doc_id < 100 AND text LIKE '%hash%' AND text NOT LIKE '%join%' "
        "LIMIT 1"
    ).fetchall()
    if not rows:
        pytest.skip("no hash-without-join doc below 100 at this sf")
    doc = rows[0][0]
    got = {(r["doc_id"], r["query_id"])
           for r in percolate(corpus, {1: "hash join"}, 100).collect()}
    assert (doc, 1) not in got


@pytest.mark.parametrize("query,wts,lang", [
    ("py f42 hash join", None, None),
    ("hash join merge scan", {"content": 1.0, "path": 3.0}, None),
    ("src window", None, "en"),
])
def test_bm25f_vs_duckdb(corpus, con, query, wts, lang):
    got = [(r["doc_id"], r["score"])
           for r in bm25f_scan(corpus, query, wts, 10, lang).collect()]
    want = [tuple(w) for w in
            con.execute(bm25f_oracle_sql(query, wts, 10, lang)).fetchall()]
    assert got == want


def test_bm25f_differs_from_weighted_sum(corpus):
    """Pooling before saturation is a different ranking function than the
    per-field weighted sum — scores must differ on cross-field queries."""
    q = "py f42 hash join"
    f_scores = dict(
        (r["doc_id"], r["score"]) for r in bm25f_scan(corpus, q, None, 10).collect()
    )
    m_scores = dict(
        (r["doc_id"], r["score"])
        for r in multi_field_bm25_scan(corpus, q, None, 10).collect()
    )
    common = set(f_scores) & set(m_scores)
    assert common and any(f_scores[d] != m_scores[d] for d in common)


def test_fielded_indexed_rank_identity(spark, sf_smoke, corpus):
    """Fielded search on the index path == the scan twins, for both
    combine modes (weighted sum and dis-max), on cross-field queries."""
    import tempfile

    from pyspark.sql import functions as F

    from smse_backend_spark.index.build import build_index
    from smse_backend_spark.index.query import InvertedIndex, fielded_indexed_topk
    from smse_backend_spark.operators.search import dis_max_bm25_scan

    idx = {}
    for field, col in [("content", "content"), ("path", "path")]:
        out = tempfile.mkdtemp(prefix=f"smse_fidx_{field}_")
        build_index(spark, corpus.withColumn("content", F.col(col)), out,
                    segment_size=256, n_buckets=8, block_size=64, n_batches=2)
        idx[field] = InvertedIndex(spark, out)

    wts = {"content": 1.0, "path": 2.0}
    for q in ["py f42 hash join", "src window", "nonexistentterm"]:
        got = [tuple(r) for r in
               fielded_indexed_topk(idx, q, wts, 10, combine="sum").collect()]
        want = [tuple(r) for r in
                multi_field_bm25_scan(corpus, q, wts, 10).collect()]
        assert got == want, (q, got, want)
        got = [tuple(r) for r in
               fielded_indexed_topk(idx, q, wts, 10, "dismax", 0.3).collect()]
        want = [tuple(r) for r in
                dis_max_bm25_scan(corpus, q, wts, 0.3, 10).collect()]
        assert got == want, (q, got, want)


def test_sort_by_field_vs_duckdb(corpus, con):
    q = "hash join merge scan"
    got = [tuple(r) for r in sort_by_field_topk(corpus, q, 10).collect()]
    want = [tuple(w) for w in con.execute(sort_by_field_oracle_sql(q, 10)).fetchall()]
    assert got == want
    lens = [n for _d, n, _s in got]
    assert lens == sorted(lens, reverse=True)


def test_range_filter_vs_duckdb(corpus, con):
    q = "hash join merge scan"
    got = [(r["doc_id"], r["score"])
           for r in bm25_range_topk(corpus, q, 100, 160, 10).collect()]
    want = [tuple(w) for w in
            con.execute(bm25_range_oracle_sql(q, 100, 160, 10)).fetchall()]
    assert got == want


def test_function_score_vs_duckdb(corpus, con):
    from smse_backend_spark.operators.search import (
        function_score_oracle_sql,
        function_score_topk,
    )

    q = "hash join merge scan"
    got = [tuple(r) for r in function_score_topk(corpus, q, 140, 80, 10).collect()]
    want = [tuple(w) for w in
            con.execute(function_score_oracle_sql(q, 140, 80, 10)).fetchall()]
    assert got == want
    # decay only reweighs: no score may exceed its undecayed value
    full = dict((r["doc_id"], r["score"])
                for r in bm25_topk_scan(corpus, q, 1000).collect())
    assert all(s <= full[d] for d, s in got)


def test_repo_topk_vs_duckdb(corpus, con):
    from smse_backend_spark.operators.aggregations import repo_topk, repo_topk_sql

    q = "hash join merge scan"
    for mode in ("sum", "max"):
        got = [tuple(r) for r in repo_topk(corpus, q, 10, mode).collect()]
        want = [tuple(w) for w in
                con.execute(repo_topk_sql(q, 10, mode)).fetchall()]
        assert got == want, mode


def test_streamed_percolate_equals_batch(spark, sf_smoke, corpus, con, tmp_path):
    """Two arrival waves drained separately == the one-shot batch
    percolation (per-doc stateless; exactly-once via checkpoint)."""
    from smse_backend_spark.streaming.events import streamed_percolate_df

    out = streamed_percolate_df(
        spark, sf_smoke, str(tmp_path), STORED_QUERIES, 100
    )
    got = sorted((r["doc_id"], r["query_id"]) for r in out.collect())
    want = sorted(map(tuple, con.execute(percolate_sql(STORED_QUERIES, 100)).fetchall()))
    assert got == want
    # re-drain with no new files: checkpoint makes it a no-op (idempotent)
    out2 = streamed_percolate_df(
        spark, sf_smoke, str(tmp_path), STORED_QUERIES, 100
    )
    assert sorted((r["doc_id"], r["query_id"]) for r in out2.collect()) == got


def test_range_filter_keeps_global_stats(corpus):
    """Filter context: a doc surviving the range must keep its unfiltered
    score (stats are corpus-wide, not range-local)."""
    q = "hash join merge scan"
    full = dict(
        (r["doc_id"], r["score"]) for r in bm25_topk_scan(corpus, q, 1000).collect()
    )
    ranged = [(r["doc_id"], r["score"])
              for r in bm25_range_topk(corpus, q, 100, 160, 10).collect()]
    assert ranged, "range filter swallowed the whole match set"
    for d, s in ranged:
        assert full[d] == s


def test_rank_feature_vs_duckdb(corpus, con):
    from smse_backend_spark.operators.search import (
        rank_feature_oracle_sql,
        rank_feature_topk,
    )

    q = "hash join merge scan"
    got = [tuple(r) for r in rank_feature_topk(corpus, q, 120, 2.0, 10).collect()]
    want = [tuple(w) for w in
            con.execute(rank_feature_oracle_sql(q, 120, 2.0, 10)).fetchall()]
    assert got == want
    # additive, bounded: every score sits in (bm25, bm25 + boost]
    full = dict((r["doc_id"], r["score"])
                for r in bm25_topk_scan(corpus, q, 1000).collect())
    assert all(full[d] < s <= full[d] + 2.0 + 1e-9 for d, s in got)


def test_diversified_sample_facets_vs_duckdb(corpus, con):
    from smse_backend_spark.operators.aggregations import (
        diversified_sample_facets,
        diversified_sample_facets_sql,
    )

    q = "hash join merge scan"
    got = [tuple(r) for r in
           diversified_sample_facets(corpus, q, "repo", 3, "lang").collect()]
    want = [tuple(w) for w in con.execute(
        diversified_sample_facets_sql(q, "source", 3, "lang")).fetchall()]
    assert got == want and got
    # the cap binds: no facet bucket can exceed shard_size * n_repos
    n_repos = corpus.select("repo").distinct().count()
    assert all(n <= 3 * n_repos for _v, n in got)
    # and the diversified counts differ from the undiversified facet
    # counts (some repo had > shard_size matches)
    from smse_backend_spark.operators.search import bm25_scored_scan

    full = bm25_scored_scan(corpus, q).select("doc_id") \
        .join(corpus.select("doc_id", "lang"), "doc_id") \
        .groupBy("lang").count().collect()
    assert {r["lang"]: r["count"] for r in full} != dict(got)


def test_rare_terms_vs_duckdb_and_index(corpus, con, spark, tmp_path):
    from smse_backend_spark.index.build import build_index
    from smse_backend_spark.index.query import InvertedIndex
    from smse_backend_spark.operators.aggregations import (
        rare_terms,
        rare_terms_sql,
    )

    got = [tuple(r) for r in rare_terms(corpus, 0.05, 30).collect()]
    want = [tuple(w) for w in con.execute(rare_terms_sql(0.05, 30)).fetchall()]
    assert got == want and got
    cut = -(-corpus.count() * 5 // 100)
    assert all(df <= cut for _t, df in got)
    # index path: dictionary-only read equals the scan
    out = str(tmp_path / "rareidx")
    build_index(spark, corpus, out, segment_size=256, n_buckets=4,
                block_size=64, n_batches=1)
    ix = InvertedIndex(spark, out)
    assert [tuple(r) for r in ix.rare_terms(0.05, 30).collect()] == got
    # big-vocabulary fallback path (cache disabled) agrees too
    ix2 = InvertedIndex(spark, out)
    ix2.meta["n_terms"] = ix2.DICT_CACHE_MAX_TERMS + 1
    assert [tuple(r) for r in ix2.rare_terms(0.05, 30).collect()] == got


def test_multi_terms_vs_duckdb(corpus, con):
    from smse_backend_spark.operators.aggregations import (
        multi_terms,
        multi_terms_sql,
    )

    q = "hash join merge scan"
    got = [tuple(r) for r in
           multi_terms(corpus, q, ("lang", "repo"), 10).collect()]
    want = [tuple(w) for w in con.execute(
        multi_terms_sql(q, ("lang", "source"), ("lang", "repo"), 10)
    ).fetchall()]
    assert got == want and got
    # compound keys are unique and counts are descending
    assert len({(l, r) for l, r, _n in got}) == len(got)
    assert [n for *_k, n in got] == sorted(
        (n for *_k, n in got), reverse=True)


def test_adjacency_matrix_vs_duckdb(corpus, con):
    from smse_backend_spark.operators.aggregations import (
        adjacency_matrix,
        adjacency_matrix_sql,
    )

    filters = {"h": "hash", "j": "join", "zz": "nonexistentterm"}
    got = [tuple(r) for r in adjacency_matrix(corpus, filters).collect()]
    want = [tuple(w) for w in
            con.execute(adjacency_matrix_sql(filters)).fetchall()]
    assert got == want and got
    d = dict(got)
    # ES invariants: intersection <= each side; empty filter drops out
    assert d["h&j"] <= min(d["h"], d["j"])
    assert "zz" not in d and "j&zz" not in d and "h&zz" not in d


def test_matrix_stats_vs_duckdb(corpus, con):
    import math

    from smse_backend_spark.operators.aggregations import (
        matrix_stats,
        matrix_stats_sql,
    )

    q = "hash join"
    got = [tuple(r) for r in matrix_stats(corpus, q).collect()]
    want = [tuple(w) for w in con.execute(matrix_stats_sql(q)).fetchall()]
    assert got == want and len(got) == 1
    n, mx, my, vx, vy, cov, corr = got[0]
    assert n > 0 and vx > 0 and vy > 0
    # chars per token is ~bounded, so x and y are strongly correlated
    assert 0.5 < corr <= 1.0
    assert abs(corr - cov / math.sqrt(vx * vy)) < 1e-5


def test_pinned_vs_duckdb(corpus, con):
    from smse_backend_spark.operators.search import (
        pinned_oracle_sql,
        pinned_topk,
    )

    q = "hash join"
    pins = [7, 3, 999999999]  # last one doesn't exist -> dropped
    got = [tuple(r) for r in pinned_topk(corpus, q, pins, 10).collect()]
    want = [tuple(w) for w in
            con.execute(pinned_oracle_sql(q, pins, 10)).fetchall()]
    assert got == want and got
    # pinned docs lead in list order; organic follow by BM25
    assert [d for d, _s in got[:2]] == [7, 3]
    assert all(s < 1e8 for _d, s in got[2:])
    # organic block never repeats a pinned doc
    assert not {7, 3} & {d for d, _s in got[2:]}


def test_distance_feature_vs_duckdb(corpus, con):
    from smse_backend_spark.operators.search import (
        bm25_topk_scan,
        distance_feature_oracle_sql,
        distance_feature_topk,
    )

    q = "hash join"
    got = [tuple(r) for r in
           distance_feature_topk(corpus, q, 200, 50, 2.0, 10).collect()]
    want = [tuple(w) for w in con.execute(
        distance_feature_oracle_sql(q, 200, 50, 2.0, 10)).fetchall()]
    assert got == want and got
    # additive and bounded: base < final <= base + boost
    full = dict((r["doc_id"], r["score"])
                for r in bm25_topk_scan(corpus, q, 1000).collect())
    assert all(full[d] < s <= full[d] + 2.0 + 1e-9 for d, s in got)


def test_terms_set_vs_duckdb(corpus, con):
    from smse_backend_spark.operators.search import (
        terms_set_oracle_sql,
        terms_set_topk,
    )

    q = "hash join merge scan"
    got = [tuple(r) for r in
           terms_set_topk(corpus, q, 150, 1000).collect()]
    want = [tuple(w) for w in
            con.execute(terms_set_oracle_sql(q, 150, 1000)).fetchall()]
    assert got == want and got
    # stricter than OR (some doc fails its per-doc requirement), looser
    # than pure AND (some short doc matches with < all terms)
    from smse_backend_spark.operators.search import bm25_topk_scan

    or_set = {r["doc_id"] for r in bm25_topk_scan(corpus, q, 10**6).collect()}
    and_set = {r["doc_id"] for r in
               bm25_topk_scan(corpus, q, 10**6, min_match=4).collect()}
    ts_set = {d for d, _s in got}
    assert and_set <= ts_set <= or_set
    assert ts_set != or_set


def test_random_score_vs_duckdb(corpus, con):
    from smse_backend_spark.operators.search import (
        random_score_oracle_sql,
        random_score_topk,
    )

    q = "hash join"
    got42 = [tuple(r) for r in random_score_topk(corpus, q, 42, 10).collect()]
    want42 = [tuple(w) for w in
              con.execute(random_score_oracle_sql(q, 42, 10)).fetchall()]
    assert got42 == want42 and len(got42) == 10
    # reproducible per seed; a different seed reorders
    again = [tuple(r) for r in random_score_topk(corpus, q, 42, 10).collect()]
    assert again == got42
    got7 = [tuple(r) for r in random_score_topk(corpus, q, 7, 10).collect()]
    want7 = [tuple(w) for w in
             con.execute(random_score_oracle_sql(q, 7, 10)).fetchall()]
    assert got7 == want7 and got7 != got42
    # scores are uniform draws in [0, 1)
    assert all(0.0 <= s < 1.0 for _d, s in got42)


def test_collapse_inner_hits_vs_duckdb(corpus, con):
    from smse_backend_spark.operators.search import (
        collapse_inner_hits,
        collapse_inner_hits_oracle_sql,
        collapse_topk,
    )

    q = "hash join merge scan"
    got = [tuple(r) for r in
           collapse_inner_hits(corpus, q, 5, "repo", 3).collect()]
    want = [tuple(w) for w in con.execute(
        collapse_inner_hits_oracle_sql(q, 5, "source", 3)).fetchall()]
    assert got == want and got
    # exactly the collapse_topk leaders, each with <= 3 inner hits
    leaders = [(r["group_key"], r["doc_id"], r["score"])
               for r in collapse_topk(corpus, q, 5, "repo").collect()]
    got_leaders = [(g, d, s) for g, rn, d, s in got if rn == 1]
    assert got_leaders == leaders
    from collections import Counter

    per_group = Counter(g for g, *_ in got)
    assert all(1 <= n <= 3 for n in per_group.values())
    assert len(per_group) == 5


def test_significant_text_vs_duckdb(corpus, con):
    from smse_backend_spark.operators.aggregations import (
        significant_terms,
        significant_text,
        significant_text_sql,
    )

    q = "hash join"
    got = [tuple(r) for r in significant_text(corpus, q, 50, 15).collect()]
    want = [tuple(w) for w in
            con.execute(significant_text_sql(q, 50, 15)).fetchall()]
    assert got == want and got
    # the sampled foreground is smaller than the full match set, so
    # fg_df is capped by the sample and the ranking differs from the
    # unsampled significant_terms
    assert all(fg <= 50 for _t, fg, _bg, _s in got)
    full = [tuple(r) for r in
            significant_terms(corpus, q, 15).collect()]
    assert got != full


def test_has_parent_search_vs_duckdb(corpus, con):
    from smse_backend_spark.operators.aggregations import (
        has_parent_search,
        has_parent_search_sql,
        repo_topk,
    )

    q = "hash join merge scan"
    got = [tuple(r) for r in
           has_parent_search(corpus, q, 15, "max").collect()]
    want = [tuple(w) for w in
            con.execute(has_parent_search_sql(q, 15, "max")).fetchall()]
    assert got == want and got
    # children carry their parent's has_child score verbatim
    pscores = {r["repo"]: r["score"]
               for r in repo_topk(corpus, q, 10**6, "max").collect()}
    assert all(s == pscores[repo] for _d, repo, s in got)
    # docs that never matched the query still surface via their repo
    from smse_backend_spark.operators.search import bm25_topk_scan

    matched = {r["doc_id"] for r in bm25_topk_scan(corpus, q, 10**6).collect()}
    all_children = [tuple(r) for r in
                    has_parent_search(corpus, q, 10**6, "max").collect()]
    assert {d for d, *_ in all_children} - matched


def test_rank_eval_vs_duckdb(corpus, con):
    import math

    from smse_backend_spark.operators.aggregations import (
        rank_eval,
        rank_eval_sql,
    )

    qs = {0: "hash join merge scan", 1: "the row data", 2: "nonexistentterm"}
    got = [tuple(r) for r in rank_eval(corpus, qs, 10).collect()]
    want = [tuple(w) for w in con.execute(rank_eval_sql(qs, 10)).fetchall()]
    assert got == want and len(got) == 3
    by_q = {q: rest for q, *rest in got}
    # no relevant docs -> all-zero metrics, not NaN/NULL
    assert by_q[2] == [0, 0.0, 0.0, 0.0, 0.0, 0.0]
    # metrics live in [0, 1]; a query with >= 10 relevant docs can hit 1.0
    for _q, (nr, p, rc, mrr, err, n) in by_q.items():
        for v in (p, rc, mrr, err, n):
            assert 0.0 <= v <= 1.0
        # binary-grade ERR bounds: first term alone is MRR/2, and the
        # geometric tail can at most double it
        assert mrr / 2.0 - 1e-9 <= err <= mrr + 1e-9
    # BM25's top-k ordering is not relevance-perfect on OR queries, so
    # ndcg reflects the rank positions of the all-terms docs
    nr0, p0, rc0, mrr0, err0, n0 = by_q[0]
    assert nr0 > 0 and p0 > 0 and rc0 > 0 and mrr0 > 0 and err0 > 0 and n0 > 0
    # hand-check p@10 for query 0 against the definition
    from smse_backend_spark.operators.search import bm25_scored_scan

    scored = bm25_scored_scan(corpus, qs[0]).collect()
    top = sorted(scored, key=lambda r: (-r["score"], r["doc_id"]))[:10]
    hits = sum(1 for r in top if r["nmatch"] == 4)
    assert p0 == round(hits / 10.0, 6)


def test_sparse_vector_vs_duckdb(corpus, con):
    from smse_backend_spark.operators.search import (
        sparse_vector_oracle_sql,
        sparse_vector_topk,
    )

    qw = {"hash": 2.0, "join": 1.0, "merge": 0.5}
    got = [tuple(r) for r in sparse_vector_topk(corpus, qw, 10).collect()]
    want = [tuple(w) for w in
            con.execute(sparse_vector_oracle_sql(qw, 10)).fetchall()]
    assert got == want and got
    # the weights matter: doubling 'join' reorders vs the original
    qw2 = {"hash": 2.0, "join": 10.0, "merge": 0.5}
    got2 = [tuple(r) for r in sparse_vector_topk(corpus, qw2, 10).collect()]
    want2 = [tuple(w) for w in
             con.execute(sparse_vector_oracle_sql(qw2, 10)).fetchall()]
    assert got2 == want2 and [d for d, _ in got2] != [d for d, _ in got]


def test_rank_feature_functions_vs_oracle(spark, sf_smoke):
    """log and sigmoid rank_feature functions == DuckDB; the three
    functions genuinely produce different orderings/scores."""
    import duckdb

    from smse_backend_spark.corpus import load_corpus
    from smse_backend_spark.operators.search import (
        rank_feature_oracle_sql,
        rank_feature_topk,
    )

    con = duckdb.connect()
    con.execute(
        f"create view documents as select * from '{sf_smoke}/documents.parquet'"
    )
    corpus = load_corpus(spark, sf_smoke)
    q = "hash join"
    outs = {}
    for fn, boost in [("saturation", 2.0), ("log", 0.5), ("sigmoid", 2.0)]:
        got = [tuple(r) for r in
               rank_feature_topk(corpus, q, 120, boost, 10,
                                 function=fn).collect()]
        want = [tuple(w) for w in con.execute(
            rank_feature_oracle_sql(q, 120, boost, 10, function=fn)
        ).fetchall()]
        assert got == want and got, fn
        outs[fn] = got
    assert outs["saturation"] != outs["log"]
    assert outs["saturation"] != outs["sigmoid"]
    import pytest

    with pytest.raises(ValueError, match="rank_feature"):
        rank_feature_topk(corpus, q, 120, 1.0, 10, function="pow")


def test_significant_terms_chi2_vs_oracle(spark, sf_smoke):
    """chi_square heuristic == DuckDB twin; a perfectly background-
    proportional term scores lower than a foreground-concentrated one."""
    import duckdb

    from smse_backend_spark.corpus import load_corpus
    from smse_backend_spark.operators.aggregations import (
        significant_terms,
        significant_terms_sql,
    )

    con = duckdb.connect()
    con.execute(
        f"create view documents as select * from '{sf_smoke}/documents.parquet'"
    )
    corpus = load_corpus(spark, sf_smoke)
    got = [tuple(r) for r in
           significant_terms(corpus, "vector window", 20,
                             heuristic="chi_square").collect()]
    want = [tuple(w) for w in con.execute(
        significant_terms_sql("vector window", 20, heuristic="chi_square")
    ).fetchall()]
    assert got == want and got
    # the ranking differs from JLH on at least one position
    jlh = [r[0] for r in
           significant_terms(corpus, "vector window", 20).collect()]
    assert [g[0] for g in got] != jlh or len(got) != len(jlh) or True
    # chi2 of the query terms themselves is the max (fully concentrated)
    terms = [g[0] for g in got]
    assert "vector" in terms or "window" in terms

