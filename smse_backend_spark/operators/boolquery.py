"""Boolean query language: ``hash AND (join OR merge) AND NOT window``.

The user-facing composition layer over the term primitives — the query
front-end the reference's single free-text search box implies but never
grew (``/root/reference/smse_backend/routes/search.py:148-156`` accepts
one query string and forwards it verbatim). A recursive-descent parser
for AND / OR / NOT / parentheses, compiled to DataFrame algebra (and to
a DuckDB SQL twin) with Lucene BooleanQuery semantics:

* a doc MATCHES iff the boolean expression over its term-presence is true;
* the SCORE is the BM25 sum of the doc's POSITIVE query terms only —
  negated terms filter, they never score (Lucene's MUST_NOT);
* pure-negative expressions are rejected (Lucene's MatchNoDocsQuery
  stance): every OR branch must be able to assert at least one positive
  term, which also guarantees every matching doc appears in the
  term-match frame — evaluation never needs the complement of the corpus.

Plan shape: the ONE tokenized scan of ``bm25_topk_scan`` plus a
``collect_set(term)`` per doc for the predicate — no extra corpus scans,
no crossJoin; the top is ``TakeOrderedAndProject``.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from smse_backend_spark import DEFAULT_TOP_K
from smse_backend_spark.functions.bm25 import (
    bm25_term_score_col,
    bm25_term_score_sql,
    idf_col,
    idf_sql,
)
from smse_backend_spark.functions.tokenizer import (
    doc_len_col,
    tokenize_col,
    tokenize_duckdb_sql,
    tokenize_py,
)


# --------------------------------------------------------------------------
# AST + parser
# --------------------------------------------------------------------------

@dataclass(frozen=True)
class Term:
    term: str


@dataclass(frozen=True)
class Not:
    child: "Node"


@dataclass(frozen=True)
class And:
    children: tuple["Node", ...]


@dataclass(frozen=True)
class Or:
    children: tuple["Node", ...]


Node = Term | Not | And | Or

_KEYWORDS = {"AND", "OR", "NOT"}


def _lex(q: str) -> list[str]:
    out: list[str] = []
    i, n = 0, len(q)
    while i < n:
        c = q[i]
        if c.isspace():
            i += 1
        elif c in "()":
            out.append(c)
            i += 1
        else:
            j = i
            while j < n and not q[j].isspace() and q[j] not in "()":
                j += 1
            out.append(q[i:j])
            i = j
    return out


class _Parser:
    def __init__(self, toks: list[str]):
        self.toks = toks
        self.i = 0

    def peek(self) -> str | None:
        return self.toks[self.i] if self.i < len(self.toks) else None

    def take(self) -> str:
        t = self.toks[self.i]
        self.i += 1
        return t

    def parse(self) -> Node:
        node = self.or_expr()
        if self.peek() is not None:
            raise ValueError(f"trailing input at token {self.i}: {self.peek()!r}")
        return node

    def or_expr(self) -> Node:
        parts = [self.and_expr()]
        while self.peek() == "OR":
            self.take()
            parts.append(self.and_expr())
        return parts[0] if len(parts) == 1 else Or(tuple(parts))

    def and_expr(self) -> Node:
        parts = [self.unary()]
        while self.peek() == "AND":
            self.take()
            parts.append(self.unary())
        return parts[0] if len(parts) == 1 else And(tuple(parts))

    def unary(self) -> Node:
        if self.peek() == "NOT":
            self.take()
            return Not(self.unary())
        return self.atom()

    def atom(self) -> Node:
        t = self.peek()
        if t is None:
            raise ValueError("unexpected end of query")
        if t == "(":
            self.take()
            node = self.or_expr()
            if self.peek() != ")":
                raise ValueError("missing closing parenthesis")
            self.take()
            return node
        if t in _KEYWORDS or t == ")":
            raise ValueError(f"unexpected token {t!r}")
        toks = tokenize_py(self.take())
        if len(toks) != 1:
            raise ValueError(f"bare term must tokenize to one token, got {toks!r}")
        return Term(toks[0])


def parse_bool_query(q: str) -> Node:
    """Parse and validate: the expression must be POSITIVE — able to
    assert at least one present term on every path (every Or branch
    positive, Not never positive) — else it could match docs containing
    no query term at all (the complement of the corpus)."""
    node = _Parser(_lex(q)).parse()
    if not _positive(node):
        raise ValueError("pure-negative boolean query (cannot match on absence alone)")
    return node


def _positive(node: Node) -> bool:
    if isinstance(node, Term):
        return True
    if isinstance(node, Not):
        return False
    if isinstance(node, And):
        return any(_positive(c) for c in node.children)
    return all(_positive(c) for c in node.children)  # Or


def _all_terms(node: Node) -> set[str]:
    if isinstance(node, Term):
        return {node.term}
    if isinstance(node, Not):
        return _all_terms(node.child)
    return set().union(*(_all_terms(c) for c in node.children))


def _positive_terms(node: Node, under_not: bool = False) -> set[str]:
    """Terms with at least one non-negated occurrence — the scoring set."""
    if isinstance(node, Term):
        return set() if under_not else {node.term}
    if isinstance(node, Not):
        return _positive_terms(node.child, not under_not)
    return set().union(*(_positive_terms(c, under_not) for c in node.children))


# --------------------------------------------------------------------------
# Compilation: Column predicate / SQL predicate over the matched-term set
# --------------------------------------------------------------------------

def _pred_col(node: Node, matched: Column) -> Column:
    if isinstance(node, Term):
        return F.array_contains(matched, node.term)
    if isinstance(node, Not):
        return ~_pred_col(node.child, matched)
    ops = [_pred_col(c, matched) for c in node.children]
    out = ops[0]
    for o in ops[1:]:
        out = (out & o) if isinstance(node, And) else (out | o)
    return out


def _pred_sql(node: Node, matched: str) -> str:
    if isinstance(node, Term):
        esc = node.term.replace("'", "''")
        return f"list_contains({matched}, '{esc}')"
    if isinstance(node, Not):
        return f"(NOT {_pred_sql(node.child, matched)})"
    op = " AND " if isinstance(node, And) else " OR "
    return "(" + op.join(_pred_sql(c, matched) for c in node.children) + ")"


# --------------------------------------------------------------------------
# Execution
# --------------------------------------------------------------------------

def boolean_query_topk(
    corpus: DataFrame,
    query: str,
    k: int = DEFAULT_TOP_K,
    lang: str | None = None,
    stem: bool = False,
) -> DataFrame:
    """Top-k for a boolean query string. Score = BM25 over the doc's
    positive terms; the boolean expression filters (Lucene MUST/SHOULD/
    MUST_NOT composition). ``stem`` runs the Harman S-stemmer analyzer
    over both the tree's term leaves and the document tokens."""
    from smse_backend_spark.functions.tokenizer import stem_col, stem_py

    tree = parse_bool_query(query)
    if stem:
        tree = map_terms(tree, stem_py)
    terms = sorted(_all_terms(tree))
    pos = sorted(_positive_terms(tree))
    if lang is not None:
        corpus = corpus.filter(F.col("lang") == lang)

    toks = tokenize_col("content")
    if stem:
        toks = stem_col(toks)
    docs = corpus.select("doc_id", doc_len_col("content").alias("doc_len"),
                         toks.alias("toks"))
    n_docs, avgdl = docs.agg(
        F.count(F.lit(1)).cast("double"), F.avg("doc_len")
    ).first()
    if not n_docs:
        return corpus.select("doc_id", F.lit(0.0).alias("score")).limit(0)

    tf = (
        docs.select("doc_id", "doc_len", F.explode("toks").alias("term"))
        .filter(F.col("term").isin(terms))
        .groupBy("doc_id", "doc_len", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    df_t = tf.groupBy("term").agg(F.count(F.lit(1)).cast("double").alias("df"))
    contrib = bm25_term_score_col(
        F.col("tf"), idf_col(F.col("df"), n_docs), F.col("doc_len"), float(avgdl)
    )
    per_doc = (
        tf.join(F.broadcast(df_t), "term")
        .withColumn("contrib", F.when(F.col("term").isin(pos), contrib)
                                .otherwise(F.lit(0.0)))
        .groupBy("doc_id")
        .agg(
            F.round(F.sum("contrib"), 6).alias("score"),
            F.collect_set("term").alias("matched"),
        )
    )
    return (
        per_doc.filter(_pred_col(tree, F.col("matched")))
        .select("doc_id", "score")
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(k)
    )


def boolean_query_oracle_sql(
    query: str,
    k: int = DEFAULT_TOP_K,
    lang: str | None = None,
    table: str = "documents",
    content_col: str = "text",
    stem: bool = False,
) -> str:
    """DuckDB twin of :func:`boolean_query_topk` (and of the index path
    ``InvertedIndex.boolean_topk`` — set ``stem`` to the index analyzer)."""
    from smse_backend_spark.functions.tokenizer import stem_duckdb_sql, stem_py

    tree = parse_bool_query(query)
    if stem:
        tree = map_terms(tree, stem_py)
    terms = sorted(_all_terms(tree))
    pos = sorted(_positive_terms(tree))
    in_list = ", ".join("'" + t.replace("'", "''") + "'" for t in terms)
    pos_list = ", ".join("'" + t.replace("'", "''") + "'" for t in pos) or "''"
    where_lang = f"WHERE lang = '{lang}'" if lang is not None else ""
    toks = tokenize_duckdb_sql(content_col)
    if stem:
        toks = stem_duckdb_sql(toks)
    score = bm25_term_score_sql(
        "tf.tf", idf_sql("dfq.df", "stats.n"), "tf.doc_len", "stats.avgdl"
    )
    return f"""
WITH docs AS (
  SELECT doc_id, {toks} AS toks FROM {table} {where_lang}
),
dl AS (
  SELECT doc_id, toks, len(toks)::BIGINT AS doc_len FROM docs
),
stats AS (
  SELECT count(*)::DOUBLE AS n, avg(doc_len) AS avgdl FROM dl
),
tok AS (
  SELECT doc_id, doc_len, unnest(toks) AS term FROM dl
),
tf AS (
  SELECT doc_id, doc_len, term, count(*)::BIGINT AS tf
  FROM tok WHERE term IN ({in_list})
  GROUP BY doc_id, doc_len, term
),
dfq AS (
  SELECT term, count(*)::DOUBLE AS df FROM tf GROUP BY term
),
per_doc AS (
  SELECT tf.doc_id AS doc_id,
         round(sum(CASE WHEN tf.term IN ({pos_list})
                        THEN {score} ELSE 0.0 END), 6) AS score,
         list(DISTINCT tf.term) AS matched
  FROM tf JOIN dfq USING (term) CROSS JOIN stats
  GROUP BY tf.doc_id
)
SELECT doc_id, score FROM per_doc
WHERE {_pred_sql(tree, "matched")}
ORDER BY score DESC, doc_id ASC
LIMIT {k}
"""


def map_terms(node: Node, fn) -> Node:
    """Rewrite every Term leaf through ``fn`` (e.g. an analyzer's stemmer)
    — two leaves may fold to one term; boolean semantics are unaffected."""
    if isinstance(node, Term):
        return Term(fn(node.term))
    if isinstance(node, Not):
        return Not(map_terms(node.child, fn))
    children = tuple(map_terms(c, fn) for c in node.children)
    return And(children) if isinstance(node, And) else Or(children)


def all_terms(node: Node) -> set[str]:
    return _all_terms(node)


def positive_terms(node: Node) -> set[str]:
    return _positive_terms(node)


def pred_col(node: Node, matched: Column) -> Column:
    return _pred_col(node, matched)
