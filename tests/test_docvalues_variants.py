"""Round-3: doc-values-backed retrieval variants on the INDEX path.

Every variant must be rank-identical to its scan-mode twin in
operators/search.py / operators/aggregations.py (which are themselves
oracle-checked by the driver), and the doc-values component must survive
the index lifecycle (extend, compact).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from smse_backend_spark.corpus import load_corpus
from smse_backend_spark.index.build import build_index, compact_index, extend_index
from smse_backend_spark.index.query import InvertedIndex
from smse_backend_spark.operators import search as S
from smse_backend_spark.operators.aggregations import significant_terms

Q = "hash join merge scan"


@pytest.fixture(scope="module")
def corpus(spark, sf_smoke):
    return load_corpus(spark, sf_smoke)


@pytest.fixture(scope="module")
def dv_index(spark, corpus, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("dvidx"))
    build_index(
        spark, corpus, out, segment_size=256, n_buckets=8, block_size=64,
        n_batches=2, docvalues=("repo", "n_chars"),
    )
    return InvertedIndex(spark, out)


def rows(df):
    return [tuple(r) for r in df.collect()]


def test_scored_matches_equals_scan_match_set(corpus, dv_index):
    a = sorted(rows(dv_index.scored_matches(Q)))
    b = sorted(rows(S.bm25_scored_scan(corpus, Q).select("doc_id", "score")))
    assert a == b and len(a) > 10


def test_search_after_rank_identity(corpus, dv_index):
    page1 = dv_index.bm25_topk_after(Q, None, 10).collect()
    assert len(page1) == 10
    cur = (page1[-1]["score"], page1[-1]["doc_id"])
    a = rows(dv_index.bm25_topk_after(Q, cur, 10))
    b = rows(S.bm25_search_after(corpus, Q, 10))
    assert a == b
    # page 1 itself equals plain top-k
    assert [tuple(r) for r in page1] == rows(dv_index.bm25_topk(Q, 10))


def test_search_after_plan_shape(dv_index):
    # one pipeline ending in TakeOrderedAndProject; nothing checkpointed
    plan = str(
        dv_index.bm25_topk_after(Q, (1.0, 0), 10)
        ._jdf.queryExecution().executedPlan()
    )
    assert "TakeOrderedAndProject" in plan
    assert "Checkpoint" not in plan


def test_collapse_rank_identity(corpus, dv_index):
    a = rows(dv_index.collapse_topk(Q, 10, "repo"))
    b = rows(S.collapse_topk(corpus, Q, 10, "repo"))
    assert a == b and len(a) == 10
    # at most one hit per group key
    keys = [r[0] for r in a]
    assert len(keys) == len(set(keys))


def test_facet_top_hits_rank_identity(corpus, dv_index):
    a = rows(dv_index.facet_top_hits(Q, "lang", 3))
    b = rows(S.facet_top_hits(corpus, Q, "lang", 3))
    assert a == b and len(a) > 0


def test_sort_by_field_rank_identity(corpus, dv_index):
    for desc in (True, False):
        a = rows(dv_index.sort_by_field_topk(Q, 10, descending=desc))
        b = rows(S.sort_by_field_topk(corpus, Q, 10, descending=desc))
        assert a == b and len(a) == 10


def test_function_score_rank_identity(corpus, dv_index):
    a = rows(dv_index.function_score_topk(Q, 140, 80, 10))
    b = rows(S.function_score_topk(corpus, Q, 140, 80, 10))
    assert a == b and len(a) == 10


def test_highlight_rank_and_snippet_identity(corpus, dv_index):
    a = rows(dv_index.highlight_snippets(corpus, Q, 10, 3))
    b = rows(
        S.highlight_snippets(corpus, S.bm25_topk_scan(corpus, Q, 10), Q, 3)
    )
    assert a == b and len(a) == 10
    assert all("<em>" in r[2] for r in a)


def test_significant_terms_identity(corpus, dv_index):
    a = rows(dv_index.significant_terms(corpus, Q, 20))
    b = rows(significant_terms(corpus, Q, 20))
    assert a == b and len(a) == 20


def test_doc_values_missing_column_raises(dv_index, spark, corpus, tmp_path):
    with pytest.raises(ValueError, match="doc-values"):
        dv_index.doc_values(["commit"])
    # an index built WITHOUT docvalues refuses the variant cleanly
    out = str(tmp_path / "plain")
    build_index(spark, corpus, out, segment_size=256, n_buckets=8,
                block_size=64, n_batches=1)
    plain = InvertedIndex(spark, out)
    with pytest.raises(ValueError, match="repo"):
        plain.collapse_topk(Q, 10, "repo")
    # lang is always stored — faceting works on any index
    assert len(rows(plain.facet_top_hits(Q, "lang", 3))) > 0


def test_docvalues_survive_extend_and_compact(spark, corpus, tmp_path):
    lo = corpus.filter(F.col("doc_id") < 256)
    hi = corpus.filter(F.col("doc_id") >= 256)
    out = str(tmp_path / "ext")
    build_index(spark, lo, out, segment_size=256, n_buckets=8, block_size=64,
                n_batches=1, docvalues=("repo", "n_chars"))
    extend_index(spark, hi, out)
    idx = InvertedIndex(spark, out)
    a = rows(idx.collapse_topk(Q, 10, "repo"))
    b = rows(S.collapse_topk(corpus, Q, 10, "repo"))
    assert a == b
    dst = str(tmp_path / "cmp")
    compact_index(spark, out, dst)
    assert rows(InvertedIndex(spark, dst).collapse_topk(Q, 10, "repo")) == b


def test_time_travel_doc_values_pruned(spark, corpus, tmp_path):
    lo = corpus.filter(F.col("doc_id") < 256)
    hi = corpus.filter(F.col("doc_id") >= 256)
    out = str(tmp_path / "tt")
    build_index(spark, lo, out, segment_size=256, n_buckets=8, block_size=64,
                n_batches=1, docvalues=("repo", "n_chars"))
    extend_index(spark, hi, out)
    idx0 = InvertedIndex(spark, out, as_of_batch=0)
    # as-of doc-values only cover batch-0 docs
    assert idx0.doc_values(["repo"]).agg(F.max("doc_id")).first()[0] < 256
    a = rows(idx0.collapse_topk(Q, 10, "repo"))
    b = rows(S.collapse_topk(corpus.filter(F.col("doc_id") < 256), Q, 10, "repo"))
    assert a == b


def test_histogram_agg_vs_oracle_and_hit_count(spark, dv_index, sf_smoke):
    """Histogram buckets == the DuckDB twin; bucket counts sum to the
    total hit count; keys are multiples of the interval."""
    import duckdb

    from smse_backend_spark.operators.aggregations import histogram_agg_sql

    got = rows(dv_index.histogram_agg(Q, 64))
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"'{sf_smoke}/documents.parquet'"
    )
    want = con.execute(histogram_agg_sql(Q, 64)).fetchall()
    assert got == [tuple(r) for r in want] and len(got) >= 2
    assert all(b % 64 == 0 for b, _n in got)
    n_hits = dv_index.count_matches(Q).collect()[0]["n_hits"]
    assert sum(n for _b, n in got) == n_hits


def test_stats_agg_vs_oracle_and_docvalues(spark, dv_index, sf_smoke):
    """Stats row == the DuckDB twin, and min/max/sum recompute from the
    raw doc-values join."""
    import duckdb

    from smse_backend_spark.operators.aggregations import stats_agg_sql

    got = rows(dv_index.stats_agg(Q))
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"'{sf_smoke}/documents.parquet'"
    )
    want = con.execute(stats_agg_sql(Q)).fetchall()
    assert got == [tuple(r) for r in want] and len(got) == 1
    n, mn, mx, sm, avg = got[0]
    raw = (
        dv_index.match_doc_ids(Q)
        .join(dv_index.doc_values(["n_chars"]), "doc_id")
        .agg(
            F.count(F.lit(1)), F.min("n_chars"), F.max("n_chars"),
            F.sum("n_chars"),
        )
        .collect()[0]
    )
    assert (n, mn, mx, sm) == tuple(raw)
    assert avg == pytest.approx(sm / n, abs=1e-6)


@pytest.fixture(scope="module")
def sorted_index(spark, corpus, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("sortidx"))
    build_index(
        spark, corpus, out, segment_size=64, n_buckets=4, block_size=16,
        n_batches=2, docvalues=("n_chars",), sort_field="n_chars",
    )
    return InvertedIndex(spark, out)


def test_browse_topk_exact_and_pruned(spark, corpus, sorted_index):
    """Index-sorting browse == full sort of the corpus projection; the
    executed plan carries the histogram threshold as a pushed parquet
    filter (row-group pruning — the early-termination mechanism)."""
    from pyspark.sql import functions as F

    got = rows(sorted_index.browse_topk(25))
    want = rows(
        corpus.select(
            "doc_id", F.length("content").cast("long").alias("n_chars")
        ).orderBy(F.desc("n_chars"), F.asc("doc_id")).limit(25)
    )
    assert got == want and len(got) == 25
    df = sorted_index.browse_topk(25)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "GreaterThanOrEqual(n_chars" in plan, plan[:2000]

    with pytest.raises(ValueError, match="sorted by"):
        sorted_index.browse_topk(5, field="doc_len")


def test_browse_topk_survives_deletes_and_extend(spark, corpus, tmp_path):
    """Deleting docs ranked inside the page cannot starve it (the
    threshold covers k + tombstones), and an extend (which re-finalizes)
    refreshes the sorted projection + histogram."""
    from pyspark.sql import functions as F

    from smse_backend_spark.index import deletes
    from smse_backend_spark.index.build import extend_index

    out = str(tmp_path / "sidx")
    half = corpus.filter(F.col("doc_id") < 256)
    build_index(spark, half, out, segment_size=64, n_buckets=4,
                block_size=16, n_batches=1, docvalues=("n_chars",),
                sort_field="n_chars")
    ix = InvertedIndex(spark, out)
    top = [r["doc_id"] for r in ix.browse_topk(10).collect()]
    deletes.delete_docs(spark, out, top[:3])
    survivors = rows(InvertedIndex(spark, out).browse_topk(10))
    want = rows(
        half.filter(~F.col("doc_id").isin(top[:3]))
        .select("doc_id", F.length("content").cast("long").alias("n_chars"))
        .orderBy(F.desc("n_chars"), F.asc("doc_id")).limit(10)
    )
    assert survivors == want and len(survivors) == 10

    extend_index(spark, corpus.filter(F.col("doc_id") >= 256), out)
    got = rows(InvertedIndex(spark, out).browse_topk(10))
    want = rows(
        corpus.filter(~F.col("doc_id").isin(top[:3]))
        .select("doc_id", F.length("content").cast("long").alias("n_chars"))
        .orderBy(F.desc("n_chars"), F.asc("doc_id")).limit(10)
    )
    assert got == want


def test_sort_field_requires_stored_docvalue(spark, corpus, tmp_path):
    with pytest.raises(ValueError, match="sort_field"):
        build_index(spark, corpus, str(tmp_path / "bad"),
                    sort_field="missing_col")
    # an unsorted index refuses browse
    with pytest.raises(ValueError, match="sort_field"):
        InvertedIndex(
            spark, build_and_path(spark, corpus, tmp_path)
        ).browse_topk(5)


def build_and_path(spark, corpus, tmp_path):
    out = str(tmp_path / "plain")
    build_index(spark, corpus, out, segment_size=64, n_buckets=4,
                block_size=16, n_batches=1)
    return out


def test_cardinality_agg_vs_oracle(spark, dv_index, sf_smoke):
    import duckdb

    from smse_backend_spark.operators.aggregations import cardinality_agg_sql

    got = rows(dv_index.cardinality_agg(Q))
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"'{sf_smoke}/documents.parquet'"
    )
    want = con.execute(cardinality_agg_sql(Q)).fetchall()
    assert got == [tuple(r) for r in want]
    # distinct count recomputes from the raw join
    raw = (
        dv_index.match_doc_ids(Q)
        .join(dv_index.doc_values(["repo"]), "doc_id")
        .select("repo").distinct().count()
    )
    assert got[0][0] == raw > 1


def test_percentiles_agg_vs_oracle(spark, dv_index, sf_smoke):
    import duckdb

    from smse_backend_spark.operators.aggregations import (
        search_percentiles_sql,
    )

    got = rows(dv_index.percentiles_agg(Q))
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"'{sf_smoke}/documents.parquet'"
    )
    want = con.execute(search_percentiles_sql(Q)).fetchall()
    assert got == [tuple(r) for r in want] and len(got) == 1
    n, p25, p50, p90, p99 = got[0]
    assert n > 0 and p25 <= p50 <= p90 <= p99


def test_browse_after_pages_partition_the_full_sort(spark, corpus,
                                                    sorted_index):
    """Successive browse_after pages == consecutive slices of the full
    sort; both cursor sides carry pushed predicates on the projection."""
    from pyspark.sql import functions as F

    want = rows(
        corpus.select(
            "doc_id", F.length("content").cast("long").alias("n_chars")
        ).orderBy(F.desc("n_chars"), F.asc("doc_id")).limit(45)
    )
    p1 = rows(sorted_index.browse_topk(15))
    cur = (p1[-1][1], p1[-1][0])
    p2 = rows(sorted_index.browse_after(cur, 15))
    cur2 = (p2[-1][1], p2[-1][0])
    p3 = rows(sorted_index.browse_after(cur2, 15))
    assert p1 + p2 + p3 == want
    df = sorted_index.browse_after(cur, 15)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "LessThanOrEqual(n_chars" in plan, plan[:1500]


def test_browse_ascending(spark, corpus, sorted_index):
    """Ascending browse == full asc sort; the ceiling threshold reaches the
    scan as a pushed LessThanOrEqual; old one-sided indexes refuse."""
    from pyspark.sql import functions as F

    got = rows(sorted_index.browse_topk(20, descending=False))
    want = rows(
        corpus.select(
            "doc_id", F.length("content").cast("long").alias("n_chars")
        ).orderBy(F.asc("n_chars"), F.asc("doc_id")).limit(20)
    )
    assert got == want and len(got) == 20
    df = sorted_index.browse_topk(20, descending=False)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "LessThanOrEqual(n_chars" in plan, plan[:1500]


def test_composite_agg_vs_oracle_and_pagination(spark, dv_index, sf_smoke):
    import duckdb

    from smse_backend_spark.operators.aggregations import composite_agg_sql

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"'{sf_smoke}/documents.parquet'"
    )
    page1 = rows(dv_index.composite_agg(Q, 256, 12))
    want1 = [
        tuple(r) for r in con.execute(composite_agg_sql(Q, 256, 12)).fetchall()
    ]
    assert page1 == want1 and len(page1) == 12
    after = (page1[-1][0], page1[-1][1])
    page2 = rows(dv_index.composite_agg(Q, 256, 12, after=after))
    want2 = [
        tuple(r)
        for r in con.execute(composite_agg_sql(Q, 256, 12, after=after)).fetchall()
    ]
    assert page2 == want2
    # walking ALL pages with after-keys reconstructs the unpaged bucket
    # list exactly, with no gaps/overlaps (the ES composite invariant)
    full = rows(dv_index.composite_agg(Q, 256, 10_000))
    walked, cursor = [], None
    while True:
        pg = rows(dv_index.composite_agg(Q, 256, 7, after=cursor))
        if not pg:
            break
        walked.extend(pg)
        cursor = (pg[-1][0], pg[-1][1])
    assert walked == full and len(full) > 12


def test_terms_stats_agg_vs_oracle(spark, dv_index, sf_smoke):
    import duckdb

    from smse_backend_spark.operators.aggregations import terms_stats_agg_sql

    got = rows(dv_index.terms_stats_agg(Q, "repo", 10))
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"'{sf_smoke}/documents.parquet'"
    )
    want = [tuple(r) for r in con.execute(terms_stats_agg_sql(Q, 10)).fetchall()]
    assert got == want and len(got) == 10
    # sub-agg order invariant: buckets descend by avg_score, key breaks ties
    avgs = [r[3] for r in got]
    assert avgs == sorted(avgs, reverse=True)
    # per-bucket invariants: max >= avg > 0, n_docs >= 1
    for _repo, n, mx, av in got:
        assert n >= 1 and mx >= av > 0


def test_rank_feature_rank_identity(corpus, dv_index):
    a = rows(dv_index.rank_feature_topk(Q, 120, 2.0, 10))
    b = rows(S.rank_feature_topk(corpus, Q, 120, 2.0, 10))
    assert a == b


def test_multi_terms_and_diversified_indexed_match_scan(corpus, dv_index):
    """The index-path multi_terms / diversified sampler equal their scan
    twins exactly (shared oracles)."""
    from smse_backend_spark.operators.aggregations import (
        diversified_sample_facets,
        multi_terms,
    )

    ix = dv_index
    q = "hash join merge scan"
    assert ([tuple(r) for r in ix.multi_terms_agg(q, ("lang", "repo"), 10)
             .collect()]
            == [tuple(r) for r in
                multi_terms(corpus, q, ("lang", "repo"), 10).collect()])
    assert ([tuple(r) for r in
             ix.diversified_sample_facets(q, "repo", 3, "lang").collect()]
            == [tuple(r) for r in
                diversified_sample_facets(corpus, q, "repo", 3, "lang")
                .collect()])


def test_matrix_stats_and_percentile_ranks_indexed_match_scan(corpus, dv_index):
    from smse_backend_spark.operators.aggregations import (
        matrix_stats,
        percentile_ranks,
    )

    q = "hash join"
    assert ([tuple(r) for r in dv_index.matrix_stats_agg(q).collect()]
            == [tuple(r) for r in matrix_stats(corpus, q).collect()])
    assert ([tuple(r) for r in
             dv_index.percentile_ranks_agg(q, (100, 300)).collect()]
            == [tuple(r) for r in
                percentile_ranks(corpus, q, (100, 300)).collect()])


def test_sparse_vector_indexed_matches_scan(corpus, dv_index):
    from smse_backend_spark.operators.search import sparse_vector_topk

    qw = {"hash": 2.0, "join": 1.0, "merge": 0.5}
    assert ([tuple(r) for r in
             dv_index.sparse_vector_topk(qw, 10).collect()]
            == [tuple(r) for r in
                sparse_vector_topk(corpus, qw, 10).collect()])


def test_extended_stats_agg_vs_oracle(spark, dv_index, sf_smoke):
    """extended_stats == DuckDB twin; variance/std recompute from the
    integer sums in the row itself; all-equal corner clamps to 0."""
    import math

    import duckdb

    from smse_backend_spark.operators.aggregations import extended_stats_agg_sql

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"'{sf_smoke}/documents.parquet'"
    )
    got = rows(dv_index.extended_stats_agg(Q))
    want = [tuple(r) for r in con.execute(extended_stats_agg_sql(Q)).fetchall()]
    assert got == want and len(got) == 1
    n, mn, mx, s, ss, avg, var, std = got[0]
    assert mn <= avg <= mx and n > 10
    ev = ss / n - (s / n) * (s / n)
    assert abs(var - ev) < 1e-6 and abs(std - math.sqrt(max(ev, 0.0))) < 1e-6


def test_weighted_avg_agg_vs_oracle(spark, dv_index, sf_smoke):
    """weighted_avg == DuckDB twin, and sits between min and max n_chars;
    it differs from the plain avg (weights are real)."""
    import duckdb

    from smse_backend_spark.operators.aggregations import weighted_avg_agg_sql

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"'{sf_smoke}/documents.parquet'"
    )
    got = rows(dv_index.weighted_avg_agg(Q))
    want = [tuple(r) for r in con.execute(weighted_avg_agg_sql(Q)).fetchall()]
    assert got == want and len(got) == 1
    _n, _mn, _mx, _s, plain_avg = rows(dv_index.stats_agg(Q))[0]
    assert got[0][1] != plain_avg


def test_top_metrics_agg_vs_oracle(spark, dv_index, sf_smoke):
    """top_metrics == DuckDB twin; each bucket's top doc really is its
    best-scored doc (cross-checked against terms_stats max_score)."""
    import duckdb

    from smse_backend_spark.operators.aggregations import top_metrics_agg_sql

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"'{sf_smoke}/documents.parquet'"
    )
    got = rows(dv_index.top_metrics_agg(Q, k=10))
    want = [tuple(r) for r in con.execute(top_metrics_agg_sql(Q, 10)).fetchall()]
    assert got == want and got
    max_of = {r[0]: r[2] for r in rows(dv_index.terms_stats_agg(Q, "repo", 10**6))}
    for repo, top_score, _doc, _metric in got:
        assert top_score == max_of[repo], repo


def test_string_stats_agg_vs_oracle(spark, dv_index, sf_smoke):
    """string_stats == DuckDB twin; entropy recomputes from the raw char
    distribution within 1e-6, and is bounded by log2(alphabet)."""
    import math
    from collections import Counter

    import duckdb

    from smse_backend_spark.operators.aggregations import string_stats_agg_sql

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"'{sf_smoke}/documents.parquet'"
    )
    got = rows(dv_index.string_stats_agg(Q))
    want = [tuple(r) for r in con.execute(string_stats_agg_sql(Q)).fetchall()]
    assert got == want and len(got) == 1
    cnt, mn, mx, avg, ent = got[0]
    vals = [
        r["repo"]
        for r in dv_index.match_doc_ids(Q)
        .join(dv_index.doc_values(["repo"]), "doc_id")
        .collect()
    ]
    c = Counter("".join(vals))
    tot = sum(c.values())
    ref = -sum(v / tot * math.log2(v / tot) for v in c.values())
    assert abs(ent - ref) < 1e-6
    assert 0.0 <= ent <= math.log2(len(c)) + 1e-9 and cnt == len(vals)


def test_filters_agg_vs_oracle(spark, dv_index, sf_smoke):
    """filters agg == DuckDB twin; the three size bands partition the
    match set and the overlapping 'not_tiny' bucket double-counts."""
    import duckdb

    from smse_backend_spark.operators.aggregations import filters_agg_sql

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"'{sf_smoke}/documents.parquet'"
    )
    got = rows(dv_index.filters_agg(Q))
    want = [tuple(r) for r in con.execute(filters_agg_sql(Q)).fetchall()]
    assert got == want and len(got) == len(dv_index.FILTERS_BUCKETS)
    by = dict(got)
    n_match = dv_index.match_doc_ids(Q).count()
    assert by["small"] + by["medium"] + by["large"] == n_match
    assert by["not_tiny"] <= n_match


def test_mad_boxplot_t_test_vs_oracle(spark, dv_index, sf_smoke):
    """mad/boxplot/t_test == their DuckDB twins; internal consistency:
    q2 == the median the MAD pass used, boxplot quantiles are ordered,
    and Welch t recomputes from per-group stats within 1e-6."""
    import math

    import duckdb

    from smse_backend_spark.operators.aggregations import (
        boxplot_agg_sql,
        mad_agg_sql,
        t_test_agg_sql,
    )

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"'{sf_smoke}/documents.parquet'"
    )
    got_mad = rows(dv_index.mad_agg(Q))
    assert got_mad == [tuple(r) for r in con.execute(mad_agg_sql(Q)).fetchall()]
    got_box = rows(dv_index.boxplot_agg(Q))
    assert got_box == [tuple(r) for r in
                       con.execute(boxplot_agg_sql(Q)).fetchall()]
    got_t = rows(dv_index.t_test_agg(Q))
    assert got_t == [tuple(r) for r in
                     con.execute(t_test_agg_sql(Q)).fetchall()]
    (_n, med, mad), (_n2, mn, mx, q1, q2, q3) = got_mad[0], got_box[0]
    assert med == q2 and mn <= q1 <= q2 <= q3 <= mx and mad >= 0
    n_a, n_b, mean_a, mean_b, t = got_t[0]
    xs = [
        (r["repo"], r["n_chars"])
        for r in dv_index.match_doc_ids(Q)
        .join(dv_index.doc_values(["repo", "n_chars"]), "doc_id")
        .collect()
    ]
    a = [v for rp, v in xs if rp < "src3"]
    b = [v for rp, v in xs if rp >= "src3"]
    assert (n_a, n_b) == (len(a), len(b)) and n_a > 1 and n_b > 1

    def var(g):
        m = sum(g) / len(g)
        return sum((x - m) ** 2 for x in g) / (len(g) - 1)

    ref_t = (sum(a) / n_a - sum(b) / n_b) / math.sqrt(
        var(a) / n_a + var(b) / n_b
    )
    assert abs(t - ref_t) < 1e-6


def test_global_agg_vs_oracle(spark, dv_index, sf_smoke):
    import duckdb

    from smse_backend_spark.operators.aggregations import global_agg_sql

    got = rows(dv_index.global_agg(Q))
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"'{sf_smoke}/documents.parquet'"
    )
    want = [tuple(r) for r in con.execute(global_agg_sql(Q)).fetchall()]
    assert got == want
    q_docs, q_avg, all_docs, all_avg = got[0]
    # the global bucket ignores the query: strictly more docs than scope
    assert all_docs > q_docs > 0
    assert q_avg > 0 and all_avg > 0


def test_range_agg_vs_oracle_and_partition(spark, dv_index, sf_smoke):
    import duckdb

    from smse_backend_spark.operators.aggregations import range_agg_sql

    got = rows(dv_index.range_agg(Q, (200, 350)))
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"'{sf_smoke}/documents.parquet'"
    )
    want = [tuple(r) for r in
            con.execute(range_agg_sql(Q, (200, 350))).fetchall()]
    assert got == want
    # every bucket emitted, edges half-open, counts partition the match set
    assert [r[0] for r in got] == [0, 1, 2]
    assert (got[0][1], got[0][2]) == (None, 200)
    assert (got[1][1], got[1][2]) == (200, 350)
    assert (got[2][1], got[2][2]) == (350, None)
    n_match = dv_index.match_doc_ids(Q).count()
    assert sum(r[3] for r in got) == n_match
    # an all-empty far-right bucket still appears with NULL avg
    far = rows(dv_index.range_agg(Q, (200, 10_000)))
    assert far[2][3] == 0 and far[2][4] is None


def test_vw_histogram_vs_oracle_equal_frequency(spark, dv_index, sf_smoke):
    import duckdb

    from smse_backend_spark.operators.aggregations import vw_histogram_agg_sql

    got = rows(dv_index.vw_histogram_agg(Q, 4))
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"'{sf_smoke}/documents.parquet'"
    )
    want = [tuple(r) for r in
            con.execute(vw_histogram_agg_sql(Q, 4)).fetchall()]
    assert got == want
    # equal-frequency contract: bucket sizes differ by at most 1 and the
    # variable edges are non-overlapping and ordered
    sizes = [r[1] for r in got]
    assert max(sizes) - min(sizes) <= 1
    for a, b in zip(got, got[1:]):
        assert a[3] <= b[2]  # prev max_v <= next min_v


def test_event_moving_percentiles_vs_oracle(spark, sf_smoke):
    import duckdb

    from smse_backend_spark.operators.relational import (
        event_moving_percentiles,
        event_moving_percentiles_sql,
    )

    got = rows(event_moving_percentiles(spark, sf_smoke, 3))
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        f"'{sf_smoke}/events.parquet'"
    )
    want = [tuple(r) for r in
            con.execute(event_moving_percentiles_sql(3)).fetchall()]
    assert got == want and len(got) > 3
    # the window accumulates: n of day k >= n of its own single day
    single = rows(event_moving_percentiles(spark, sf_smoke, 1))
    by_day = {r[0]: r[1] for r in single}
    for day, n, _, _ in got:
        assert n >= by_day[day]
