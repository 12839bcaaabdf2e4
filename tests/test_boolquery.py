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


def test_parser_roundtrip_property():
    """Random ASTs render to strings that parse back to the same AST
    (hypothesis over positive-valid trees)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    terms = st.sampled_from(["hash", "join", "merge", "scan", "window", "sort"])

    def render(node):
        if isinstance(node, Term):
            return node.term
        if isinstance(node, Not):
            return f"NOT ({render(node.child)})"
        op = " AND " if isinstance(node, And) else " OR "
        return "(" + op.join(f"({render(c)})" for c in node.children) + ")"

    @st.composite
    def trees(draw, depth=0):
        if depth >= 3:
            return Term(draw(terms))
        kind = draw(st.sampled_from(["term", "and", "or", "andnot"]))
        if kind == "term":
            return Term(draw(terms))
        if kind == "andnot":  # NOT always anchored by a positive sibling
            return And((draw(trees(depth + 1)), Not(draw(trees(depth + 1)))))
        children = tuple(
            draw(trees(depth + 1))
            for _ in range(draw(st.integers(min_value=2, max_value=3)))
        )
        return And(children) if kind == "and" else Or(children)

    @settings(max_examples=200, deadline=None)
    @given(trees())
    def check(t):
        # every generated tree is positive-valid by construction
        assert parse_bool_query(render(t)) == _strip_singletons(t)

    def _strip_singletons(t):
        return t  # renderer never produces 1-child And/Or

    check()


def test_boolean_indexed_rank_identity(spark, sf_smoke, corpus, con):
    """Index-path boolean queries == the scan twin — on a standard index,
    and on a stemmed index (tree leaves folded through the analyzer,
    checked against the stem=True scan/oracle)."""
    import tempfile

    from smse_backend_spark.index.build import build_index
    from smse_backend_spark.index.query import InvertedIndex

    out = tempfile.mkdtemp(prefix="smse_idx_bool_")
    build_index(spark, corpus, out, segment_size=256, n_buckets=8,
                block_size=64, n_batches=2)
    idx = InvertedIndex(spark, out)
    for q in [
        "hash AND (join OR merge) AND NOT window",
        "hash OR join",
        "hash AND NOT hash",
        "the AND NOT nonexistentterm",
        "nonexistentterm",
    ]:
        got = [tuple(r) for r in idx.boolean_topk(q, 10).collect()]
        want = [tuple(r) for r in boolean_query_topk(corpus, q, 10).collect()]
        assert got == want, q

    outs = tempfile.mkdtemp(prefix="smse_idx_bools_")
    build_index(spark, corpus, outs, segment_size=256, n_buckets=8,
                block_size=64, n_batches=2, analyzer="stem")
    sidx = InvertedIndex(spark, outs)
    q = "tables AND scans AND NOT windows"
    got = [tuple(r) for r in sidx.boolean_topk(q, 10).collect()]
    assert got, "stemmed boolean query must hit stemmed postings"
    want_scan = [tuple(r) for r in
                 boolean_query_topk(corpus, q, 10, stem=True).collect()]
    want_sql = [tuple(w) for w in
                con.execute(boolean_query_oracle_sql(q, 10, stem=True)).fetchall()]
    assert got == want_scan == want_sql
