"""Classic Lucene query_string: parser semantics + DuckDB oracle identity."""

from __future__ import annotations

import duckdb
import pytest

from smse_backend_spark.corpus import load_corpus
from smse_backend_spark.operators.luceneqs import (
    LAnd,
    LBool,
    LFuzzy,
    LNot,
    LOr,
    LPhrase,
    LPrefix,
    LRange,
    LTerm,
    LWildcard,
    parse_query_string,
    query_string_oracle_sql,
    query_string_topk,
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


def test_parse_bare_terms_default_or():
    node = parse_query_string("hash join")
    assert node == LBool(
        (), (LTerm("content", "hash"), LTerm("content", "join")), ()
    )


def test_parse_must_must_not_prefixes():
    node = parse_query_string("+hash -join scan")
    assert node == LBool(
        (LTerm("content", "hash"),),
        (LTerm("content", "scan"),),
        (LTerm("content", "join"),),
    )


def test_parse_keywords_precedence():
    # AND binds tighter than OR
    node = parse_query_string("a AND b OR c")
    assert node == LOr((LAnd((LTerm("content", "a"), LTerm("content", "b"))),
                        LTerm("content", "c")))


def test_parse_not_and_bang():
    assert parse_query_string("a AND NOT b") == LAnd(
        (LTerm("content", "a"), LNot(LTerm("content", "b")))
    )
    assert parse_query_string("a AND !b") == LAnd(
        (LTerm("content", "a"), LNot(LTerm("content", "b")))
    )
    assert parse_query_string("a && b") == LAnd(
        (LTerm("content", "a"), LTerm("content", "b"))
    )
    assert parse_query_string("a || b") == LOr(
        (LTerm("content", "a"), LTerm("content", "b"))
    )


def test_parse_field_boost_phrase_range_fuzzy_wildcard():
    assert parse_query_string("lang:en") == LTerm("lang", "en")
    assert parse_query_string('"table scan"^2') == LPhrase(
        "content", ("table", "scan"), 2.0
    )
    assert parse_query_string("merge^1.5") == LTerm("content", "merge", 1.5)
    assert parse_query_string("n_chars:[100 TO 400]") == LRange(
        "n_chars", 100, 400, True, True
    )
    assert parse_query_string("doc_id:{5 TO *]") == LRange(
        "doc_id", 5, None, False, True
    )
    assert parse_query_string("hsh~1") == LFuzzy("content", "hsh", 1)
    assert parse_query_string("hsh~") == LFuzzy("content", "hsh", 2)
    assert parse_query_string("tabl*") == LPrefix("content", "tabl")
    assert parse_query_string("t?bl*") == LWildcard("content", "t?bl*")
    assert parse_query_string("repo:src1*") == LWildcard("repo", "src1*")


def test_parse_field_scoped_group():
    node = parse_query_string("repo:(src1 OR src2)")
    assert node == LOr((LTerm("repo", "src1"), LTerm("repo", "src2")))


def test_parse_group_boost_distributes():
    node = parse_query_string("(hash join)^3")
    assert node == LBool(
        (), (LTerm("content", "hash", 3.0), LTerm("content", "join", 3.0)), ()
    )


def test_parse_errors():
    with pytest.raises(ValueError, match="unknown field"):
        parse_query_string("nosuch:x")
    with pytest.raises(ValueError, match="range on non-numeric"):
        parse_query_string("lang:[a TO b]")
    with pytest.raises(ValueError, match="pure-negative|empty"):
        parse_query_string("")
    with pytest.raises(ValueError, match="fuzzy applies"):
        parse_query_string('"a b"~1')
    with pytest.raises(ValueError, match="numeric field"):
        parse_query_string("doc_id:abc")


def test_pure_negative_rejected(corpus):
    with pytest.raises(ValueError, match="pure-negative"):
        query_string_topk(corpus, "-hash")


# --------------------------------------------------------------------------
# engine vs oracle
# --------------------------------------------------------------------------

# phrase-slop ("a b"~N) is deliberately NOT in this grammar — the engine
# ships it as its own operator (bm25_phrase_slop); ~ after a phrase errors
GRAMMAR_QUERIES = [
    "hash join scan",
    "+hash +join -window",
    'lang:en +hash +join "table scan"^2 -repo:src18 n_chars:[100 TO 400]',
    "hsh~1 tabl* merge^1.5",
    "repo:(src1 OR src2) AND (merge OR sort)",
    "spark AND NOT (slow OR batch) doc_id:[* TO 400} lang:e?",
]


@pytest.mark.parametrize("q", GRAMMAR_QUERIES)
def test_query_string_vs_oracle(corpus, con, q):
    got = sorted(map(tuple, query_string_topk(corpus, q, 10).collect()))
    want = sorted(map(tuple,
                      con.execute(query_string_oracle_sql(q, 10)).fetchall()))
    assert got == want
    assert got, f"query {q!r} matched nothing at smoke scale"


def test_default_operator_and(corpus, con):
    q = "hash join"
    got = sorted(map(tuple, query_string_topk(
        corpus, q, 10, default_operator="and").collect()))
    want = sorted(map(tuple, con.execute(
        query_string_oracle_sql(q, 10, default_operator="and")).fetchall()))
    assert got == want


def test_boost_scales_contribution(corpus):
    base = {r["doc_id"]: r["score"]
            for r in query_string_topk(corpus, "merge", 10).collect()}
    boosted = {r["doc_id"]: r["score"]
               for r in query_string_topk(corpus, "merge^2", 10).collect()}
    assert set(base) == set(boosted)
    for d, s in base.items():
        assert boosted[d] == pytest.approx(2 * s, abs=2e-6)


def test_must_not_filters(corpus):
    with_neg = {r["doc_id"] for r in
                query_string_topk(corpus, "+hash -join", 100).collect()}
    joined = {r["doc_id"] for r in
              query_string_topk(corpus, "+hash +join", 100).collect()}
    assert not (with_neg & joined)


# --------------------------------------------------------------------------
# index path
# --------------------------------------------------------------------------


@pytest.fixture(scope="module")
def qs_index(spark, corpus, tmp_path_factory):
    from smse_backend_spark.index.build import build_index
    from smse_backend_spark.index.query import InvertedIndex

    out = str(tmp_path_factory.mktemp("qsidx"))
    build_index(
        spark, corpus, out, segment_size=256, n_buckets=8, block_size=64,
        n_batches=2, with_positions=True, docvalues=("repo", "n_chars"),
    )
    return InvertedIndex(spark, out)


@pytest.mark.parametrize("q", GRAMMAR_QUERIES[:5])
def test_query_string_indexed_rank_identity(corpus, qs_index, q):
    """The index-served grammar is rank- and score-identical to the scan
    twin for every leaf family (term, phrase, prefix, wildcard, fuzzy,
    keyword, range, boost, must/must_not)."""
    a = sorted(map(tuple, qs_index.query_string_topk(q, 10).collect()))
    b = sorted(map(tuple, query_string_topk(corpus, q, 10).collect()))
    assert a == b and a


def test_query_string_indexed_missing_docvalue_raises(spark, corpus,
                                                      tmp_path):
    from smse_backend_spark.index.build import build_index
    from smse_backend_spark.index.query import InvertedIndex

    out = str(tmp_path / "plain")
    build_index(spark, corpus, out, segment_size=256, n_buckets=8,
                block_size=64, n_batches=1)
    ix = InvertedIndex(spark, out)
    with pytest.raises(ValueError, match="doc-values.*not stored"):
        ix.query_string_topk("repo:src1 OR hash", 10)


# --------------------------------------------------------------------------
# adversarial inputs: every string either parses to the oracle-identical
# result or fails loudly with ValueError — never a wrong answer, never a
# crash of a different class
# --------------------------------------------------------------------------

ADVERSARIAL = [
    '"unterminated phrase merge',       # ES: quote swallows the rest
    "(hash OR (join AND merge))",       # nested groups
    "-lang:en hash",                    # negated fielded clause
    "repo:(src1 -src2) merge",          # must_not inside field scope
    "n_chars:(100 200) OR hash",        # numeric terms in field scope
    "hash AND OR join",                 # operator soup
    "(a OR b",                          # unbalanced paren
    "lang:",                            # dangling field
    "^2 hash",                          # leading boost
    "~ hash",                           # leading fuzzy
    "n_chars:[abc TO 5]",               # non-numeric range edge
    "hash~9",                           # fuzzy clamped to 2
    "merge^0.25^2",                     # stacked boosts compose
]


@pytest.mark.parametrize("q", ADVERSARIAL)
def test_adversarial_parse_or_oracle_identity(corpus, con, q):
    try:
        node = parse_query_string(q)
    except ValueError:
        return  # loud rejection is a valid outcome
    # parsed: the engine and the oracle must still agree exactly
    got = sorted(map(tuple, query_string_topk(corpus, q, 10).collect()))
    want = sorted(map(tuple,
                      con.execute(query_string_oracle_sql(q, 10)).fetchall()))
    assert got == want, (q, node)


def test_stacked_boosts_compose():
    assert parse_query_string("merge^0.25^2") == LTerm("content", "merge", 0.5)


def test_fuzzy_clamp():
    assert parse_query_string("hash~9") == LFuzzy("content", "hash", 2)


def test_parser_is_total_over_arbitrary_input():
    """Property: for ANY input string the parser either returns an AST or
    raises ValueError — no IndexError/KeyError/RecursionError class ever
    escapes (the never-crash bar a user-facing query box needs)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    alphabet = 'abc XY19 ()"[]{}^~+-!&|:*?.\\/_TO'

    @settings(max_examples=300, deadline=None)
    @given(st.text(alphabet=alphabet, max_size=48))
    def check(s):
        try:
            parse_query_string(s)
        except ValueError:
            pass

    check()
