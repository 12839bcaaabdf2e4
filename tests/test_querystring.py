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


# --------------------------------------------------------------------------
# property: render(ast) re-parses to a semantically equivalent query
# --------------------------------------------------------------------------

def _render(node, top=False):
    if isinstance(node, TermLeaf):
        return node.term
    if isinstance(node, PhraseLeaf):
        return '"' + " ".join(node.terms) + '"'
    if isinstance(node, PrefixLeaf):
        return node.prefix + "*"
    if isinstance(node, QNot):
        return "-" + _render(node.child)
    if isinstance(node, QAnd):
        s = " + ".join(_render(c) for c in node.children)
    else:
        s = " | ".join(_render(c) for c in node.children)
    return s if top else "(" + s + ")"


def _eval(node, present):
    if isinstance(node, (TermLeaf, PhraseLeaf, PrefixLeaf)):
        return present[node]
    if isinstance(node, QNot):
        return not _eval(node.child, present)
    if isinstance(node, QAnd):
        return all(_eval(c, present) for c in node.children)
    return any(_eval(c, present) for c in node.children)


def _es_rewrite(node):
    """The documented ES bool semantics the parser applies: a negated
    clause in an OR list attaches as must_not to the enclosing bool
    ((a | -b) means a AND NOT b), recursively."""
    if isinstance(node, (TermLeaf, PhraseLeaf, PrefixLeaf)):
        return node
    if isinstance(node, QNot):
        return QNot(_es_rewrite(node.child))
    kids = tuple(_es_rewrite(c) for c in node.children)
    if isinstance(node, QAnd):
        return QAnd(kids)
    nots = tuple(c for c in kids if isinstance(c, QNot))
    pos = tuple(c for c in kids if not isinstance(c, QNot))
    if not nots:
        return QOr(kids)
    if not pos:
        return QAnd(nots)
    should = pos[0] if len(pos) == 1 else QOr(pos)
    return QAnd((should,) + nots)


def test_parser_roundtrip_semantics_property():
    """Random ASTs rendered to query strings re-parse to trees that agree
    with the ES-rewritten reference on EVERY leaf-presence assignment
    (negated OR branches hoist to must_not — the documented semantics)."""
    import itertools
    import random

    from smse_backend_spark.operators.querystring import collect_leaves

    rng = random.Random(7)
    LEAVES = [TermLeaf("a"), TermLeaf("b"), TermLeaf("c"),
              PhraseLeaf(("a", "b")), PrefixLeaf("pre")]

    def gen(depth):
        r = rng.random()
        if depth >= 3 or r < 0.4:
            return rng.choice(LEAVES)
        if r < 0.55:
            child = gen(depth + 1)
            return QNot(child) if not isinstance(child, QNot) else child
        kids = tuple(gen(depth + 1) for _ in range(rng.randint(2, 3)))
        return QAnd(kids) if r < 0.8 else QOr(kids)

    checked = 0
    for _case in range(300):
        ast = gen(0)
        text = _render(ast, top=True)
        try:
            parsed = parse_simple_query(text, "and")
        except ValueError:
            continue  # pure-negative renders are legitimately rejected
        leaves, _pos = collect_leaves(parsed)
        base_leaves, _bp = collect_leaves(ast)
        assert set(leaves) <= set(LEAVES) and set(base_leaves) <= set(LEAVES)
        for bits in itertools.product([False, True], repeat=len(LEAVES)):
            present = dict(zip(LEAVES, bits))
            assert (_eval(_es_rewrite(ast), present)
                    == _eval(parsed, present)), (text, present)
        checked += 1
    assert checked > 200  # the generator mostly produces parseable queries
