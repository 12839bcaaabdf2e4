"""simple_query_string: parser semantics + DuckDB oracle identity."""

from __future__ import annotations

import duckdb
import pytest

from smse_backend_spark.corpus import load_corpus
from smse_backend_spark.operators.querystring import (
    PhraseLeaf,
    PrefixLeaf,
    QAnd,
    QNot,
    QOr,
    TermLeaf,
    parse_simple_query,
    simple_query_string_oracle_sql,
    simple_query_string_topk,
)


@pytest.fixture(scope="module")
def corpus(spark, sf_smoke):
    c = load_corpus(spark, sf_smoke).cache()
    c.count()
    yield c
    c.unpersist()


@pytest.fixture(scope="module")
def con(sf_smoke):
    c = duckdb.connect()
    c.execute(
        f"create view documents as select * from '{sf_smoke}/documents.parquet'"
    )
    return c


# --------------------------------------------------------------------------
# parser
# --------------------------------------------------------------------------

def test_parse_shapes():
    assert parse_simple_query("hash") == TermLeaf("hash")
    assert parse_simple_query("hash join") == QAnd(
        (TermLeaf("hash"), TermLeaf("join"))
    )
    assert parse_simple_query("hash join", "or") == QOr(
        (TermLeaf("hash"), TermLeaf("join"))
    )
    assert parse_simple_query("hash | join") == QOr(
        (TermLeaf("hash"), TermLeaf("join"))
    )
    assert parse_simple_query("hash + join", "or") == QAnd(
        (TermLeaf("hash"), TermLeaf("join"))
    )
    assert parse_simple_query('"table scan"') == PhraseLeaf(("table", "scan"))
    assert parse_simple_query('"table"') == TermLeaf("table")
    assert parse_simple_query("merg*") == PrefixLeaf("merg")
    assert parse_simple_query("hash -join") == QAnd(
        (TermLeaf("hash"), QNot(TermLeaf("join")))
    )
    # grouping + mixed precedence: juxt binds tighter than '|'
    assert parse_simple_query('"table scan" | (hash + join) merg*') == QOr((
        PhraseLeaf(("table", "scan")),
        QAnd((QAnd((TermLeaf("hash"), TermLeaf("join"))), PrefixLeaf("merg"))),
    ))


def test_parse_rejects():
    with pytest.raises(ValueError):
        parse_simple_query("")
    with pytest.raises(ValueError):
        parse_simple_query("(hash")
    with pytest.raises(ValueError):
        simple_query_string_topk(None, "-hash")  # pure negative
    with pytest.raises(ValueError):
        parse_simple_query("hash", default_operator="xor")


# --------------------------------------------------------------------------
# oracle identity
# --------------------------------------------------------------------------

QUERIES = [
    ("hash join", "and", None),
    ("hash join", "or", None),
    ('"table scan"', "and", None),
    ('"table scan" | (hash + join) -window', "and", None),
    ("merg* + scan", "and", None),
    ("hash -join | window", "or", "en"),
    ("nonexistentterm | hash", "and", None),
]


@pytest.mark.parametrize("q,op,lang", QUERIES)
def test_simple_query_string_vs_duckdb(corpus, con, q, op, lang):
    got = [tuple(r) for r in
           simple_query_string_topk(corpus, q, 10, lang, op).collect()]
    want = [tuple(w) for w in con.execute(
        simple_query_string_oracle_sql(q, 10, lang, op)).fetchall()]
    assert got == want
    if q != "nonexistentterm | hash":
        assert got


def test_term_only_matches_bm25_scan(corpus):
    """A plain AND of terms scores exactly like the classic scan with
    min_match = all terms (same formula, same df space)."""
    from smse_backend_spark.operators.search import bm25_topk_scan

    got = [tuple(r) for r in
           simple_query_string_topk(corpus, "hash join", 10).collect()]
    want = [tuple(r) for r in
            bm25_topk_scan(corpus, "hash join", 10, min_match=2).collect()]
    assert got == want


def test_phrase_matches_phrase_oracle(corpus, con):
    """A bare phrase scores exactly like the dedicated phrase machinery."""
    from smse_backend_spark.operators.search import bm25_phrase_oracle_sql

    got = [tuple(r) for r in
           simple_query_string_topk(corpus, '"table scan"', 10).collect()]
    want = [tuple(w) for w in
            con.execute(bm25_phrase_oracle_sql("table scan", 10)).fetchall()]
    assert got == want and got


def test_negation_filters_but_never_scores(corpus):
    pos = {r["doc_id"]: r["score"] for r in
           simple_query_string_topk(corpus, "hash", 1000).collect()}
    neg = [tuple(r) for r in
           simple_query_string_topk(corpus, "hash -join", 1000).collect()]
    assert neg
    for doc_id, score in neg:
        assert pos[doc_id] == score  # same score as without the negation


def test_prefix_is_constant_score(corpus):
    got = [tuple(r) for r in
           simple_query_string_topk(corpus, "merg*", 10).collect()]
    assert got and all(s == 1.0 for _d, s in got)


def test_simple_query_string_indexed_matches_scan(spark, corpus, con,
                                                  tmp_path_factory):
    from smse_backend_spark.index.build import build_index
    from smse_backend_spark.index.query import InvertedIndex

    out = str(tmp_path_factory.mktemp("sqs_idx"))
    build_index(spark, corpus, out, segment_size=64, n_buckets=4,
                block_size=16, n_batches=2, with_positions=True)
    ix = InvertedIndex(spark, out)
    for q, op in [
        ('"table scan" | (hash + join) merg*', "and"),
        ("hash join", "and"),
        ("hash window -join", "or"),
        ('"table scan"', "and"),
    ]:
        scan = [tuple(r) for r in
                simple_query_string_topk(corpus, q, 10, None, op).collect()]
        idx = [tuple(r) for r in
               ix.simple_query_string_topk(q, 10, None, op).collect()]
        assert idx == scan and idx, (q, op)
        want = [tuple(w) for w in con.execute(
            simple_query_string_oracle_sql(q, 10, None, op)).fetchall()]
        assert idx == want, (q, op)
