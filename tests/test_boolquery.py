"""Boolean query DSL: parser unit tests + oracle identity + semantics."""

from __future__ import annotations

import duckdb
import pytest

from smse_backend_spark.corpus import load_corpus
from smse_backend_spark.operators.boolquery import (
    And,
    Not,
    Or,
    Term,
    boolean_query_oracle_sql,
    boolean_query_topk,
    parse_bool_query,
)
from smse_backend_spark.operators.search import bm25_topk_scan


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


def test_parser_shapes():
    assert parse_bool_query("hash") == Term("hash")
    assert parse_bool_query("hash AND join") == And((Term("hash"), Term("join")))
    assert parse_bool_query("hash OR join OR merge") == Or(
        (Term("hash"), Term("join"), Term("merge"))
    )
    # precedence: AND binds tighter than OR
    assert parse_bool_query("a OR b AND c") == Or(
        (Term("a"), And((Term("b"), Term("c"))))
    )
    assert parse_bool_query("(a OR b) AND NOT c") == And(
        (Or((Term("a"), Term("b"))), Not(Term("c")))
    )
    # NOT is legal wherever a positive sibling still anchors the match set
    assert parse_bool_query("a AND (NOT b OR NOT c)") == And(
        (Term("a"), Or((Not(Term("b")), Not(Term("c")))))
    )
    # single-token terms are analyzer-folded; multi-token words are errors
    assert parse_bool_query("Window") == Term("window")


def test_parser_rejects():
    for bad in ["", "AND", "a AND", "(a", "a)", "NOT a", "a OR NOT b",
                "NOT a OR b", "HashJoin"]:
        with pytest.raises(ValueError):
            parse_bool_query(bad)


@pytest.mark.parametrize("q", [
    "hash AND join",
    "hash OR join OR merge",
    "hash AND (join OR merge) AND NOT window",
    "(hash OR merge) AND (scan OR sort)",
    "hash AND NOT hash",            # self-contradiction -> empty
    "the AND NOT nonexistentterm",  # negation of an absent term = no-op
])
def test_boolean_query_vs_duckdb(corpus, con, q):
    got = [(r["doc_id"], r["score"])
           for r in boolean_query_topk(corpus, q, 10).collect()]
    want = [tuple(w) for w in con.execute(boolean_query_oracle_sql(q, 10)).fetchall()]
    assert got == want, q


def test_boolean_semantics(corpus, con):
    """MUST_NOT filters but never scores; AND of one term == plain BM25."""
    plain = [(r["doc_id"], r["score"])
             for r in bm25_topk_scan(corpus, "hash", 10).collect()]
    viaq = [(r["doc_id"], r["score"])
            for r in boolean_query_topk(corpus, "hash", 10).collect()]
    assert plain == viaq
    # every hit of "hash AND NOT window" contains hash and not window
    rows = con.execute(
        "SELECT doc_id, text LIKE '%window%' FROM documents"
    ).fetchall()
    has_window = {d: w for d, w in rows}
    hits = boolean_query_topk(corpus, "hash AND NOT window", 10).collect()
    assert hits
    for r in hits:
        assert not has_window[r["doc_id"]]
