"""Round-4 corpus-analytics + sketch operators vs DuckDB oracles:
count-min sketch heavy hitters, Bloom-filter dedup flags, Zipf slope,
Heaps vocabulary growth, and the significant_terms `percentage`
heuristic."""

from __future__ import annotations

import duckdb
import pytest

from smse_backend_spark.operators.corpusstats import (
    heaps_vocab_growth,
    heaps_vocab_growth_sql,
    zipf_slope,
    zipf_slope_sql,
)
from smse_backend_spark.operators.dedup import (
    bloom_dedup_flags,
    bloom_dedup_flags_sql,
)
from smse_backend_spark.operators.sampling import (
    cms_term_counts,
    cms_term_counts_sql,
)


@pytest.fixture(scope="module")
def docs(spark, sf_smoke):
    d = spark.read.parquet(f"{sf_smoke}/documents.parquet").cache()
    d.count()
    yield d
    d.unpersist()


@pytest.fixture(scope="module")
def con(sf_smoke):
    c = duckdb.connect()
    c.execute(
        f"create view documents as select * from '{sf_smoke}/documents.parquet'"
    )
    return c


# --- count-min sketch --------------------------------------------------------

@pytest.mark.parametrize("width,depth,k", [(512, 3, 20), (16, 3, 20), (8, 2, 31)])
def test_cms_vs_oracle(docs, con, width, depth, k):
    got = [tuple(r) for r in cms_term_counts(docs, width, depth, k).collect()]
    want = [
        tuple(r)
        for r in con.execute(cms_term_counts_sql(width, depth, k)).fetchall()
    ]
    assert got == want
    assert len(got) == min(k, 31)


def test_cms_one_sided_error(docs):
    """estimate >= exact always (the count-min guarantee), and a narrow
    sketch must actually overestimate on this vocabulary."""
    wide = cms_term_counts(docs, 512, 3, 31).collect()
    assert all(r["estimate"] >= r["exact"] for r in wide)
    narrow = cms_term_counts(docs, 8, 2, 31).collect()
    assert all(r["estimate"] >= r["exact"] for r in narrow)
    assert any(r["estimate"] > r["exact"] for r in narrow)


def test_cms_deeper_rows_never_worse(docs):
    """Adding sketch rows can only tighten the min-over-rows estimate."""
    d1 = {r["term"]: r["estimate"] for r in cms_term_counts(docs, 16, 1, 31).collect()}
    d3 = {r["term"]: r["estimate"] for r in cms_term_counts(docs, 16, 3, 31).collect()}
    assert all(d3[t] <= d1[t] for t in d3)


# --- Bloom dedup -------------------------------------------------------------

@pytest.mark.parametrize("m,k", [(4096, 4), (512, 3), (64, 2)])
def test_bloom_vs_oracle(docs, con, m, k):
    got = [tuple(r) for r in bloom_dedup_flags(docs, m, k).collect()]
    want = [tuple(r) for r in con.execute(bloom_dedup_flags_sql(m, k)).fetchall()]
    assert got == want


def test_bloom_flags_true_duplicates(spark):
    """Later byte-identical copies are ALWAYS flagged with
    is_exact_dup=true; the filter never flags the first copy of anything
    when m is large enough to avoid false positives."""
    rows = [(i, f"unique text number {i}") for i in range(20)]
    rows += [(100 + i, f"unique text number {i}") for i in range(5)]  # copies
    d = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r["is_exact_dup"]
           for r in bloom_dedup_flags(d, 1 << 16, 4).collect()}
    assert out == {100 + i: True for i in range(5)}


def test_bloom_smaller_filter_flags_superset(docs):
    """Shrinking m can only ADD false positives, never lose a flag."""
    big = {r["doc_id"] for r in bloom_dedup_flags(docs, 4096, 3).collect()}
    small = {r["doc_id"] for r in bloom_dedup_flags(docs, 256, 3).collect()}
    assert big <= small


# --- Zipf / Heaps ------------------------------------------------------------

def test_zipf_vs_oracle(docs, con):
    got = [tuple(r) for r in zipf_slope(docs, 20).collect()]
    want = [tuple(r) for r in con.execute(zipf_slope_sql(20)).fetchall()]
    assert got == want
    assert got[0][0] == 20 and got[0][1] <= 0.0


def test_zipf_skewed_corpus_slopes_down(spark):
    """A genuinely Zipfian corpus gives a clearly negative slope."""
    words = []
    for i, w in enumerate(["alpha", "beta", "gamma", "delta", "epsilon"]):
        words += [w] * (64 >> i)
    d = spark.createDataFrame([(0, " ".join(words))], "doc_id long, text string")
    (row,) = zipf_slope(d, 5).collect()
    assert row["n_terms"] == 5 and row["slope"] < -0.8


def test_heaps_vs_oracle(docs, con):
    got = [tuple(r) for r in heaps_vocab_growth(docs, 3, 10).collect()]
    want = [tuple(r) for r in con.execute(heaps_vocab_growth_sql(3, 10)).fetchall()]
    assert got == want
    vocab = [v for _, v in got]
    assert vocab == sorted(vocab) and len(got) == 10
    assert vocab[-1] > vocab[0] > 0


def test_heaps_saturates_on_tiny_vocab(docs, con):
    """Unigram (n=1) vocabulary saturates at the fixture's 31 words and
    the last point equals the exact distinct-term count on both engines."""
    got = [tuple(r) for r in heaps_vocab_growth(docs, 1, 5).collect()]
    want = [tuple(r) for r in con.execute(heaps_vocab_growth_sql(1, 5)).fetchall()]
    assert got == want
    assert got[-1][1] == 31


# --- significant_terms percentage heuristic ----------------------------------

@pytest.mark.parametrize("query,lang", [("hash join", None), ("scan", "en")])
def test_significant_terms_percentage_vs_oracle(spark, sf_smoke, con, query, lang):
    from smse_backend_spark.corpus import load_corpus
    from smse_backend_spark.operators.aggregations import (
        significant_terms,
        significant_terms_sql,
    )

    corpus = load_corpus(spark, sf_smoke)
    got = sorted(
        tuple(r)
        for r in significant_terms(
            corpus, query, 20, lang, heuristic="percentage"
        ).collect()
    )
    want = sorted(
        tuple(r)
        for r in con.execute(
            significant_terms_sql(query, 20, lang, heuristic="percentage")
        ).fetchall()
    )
    assert got == want
    # every query term's own usage is 100% inside the foreground
    byterm = {t: s for t, _, _, s in got}
    for t in query.split():
        assert byterm.get(t) == 1.0
