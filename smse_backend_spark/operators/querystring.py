"""ES ``simple_query_string``: the sane user-facing query DSL.

The reference exposes exactly one free-text search box
(``/root/reference/smse_backend/routes/search.py:148-156``) and forwards
the string verbatim; this module is the grown-up front-end that box
implies — Elasticsearch's ``simple_query_string`` grammar, which never
throws on user input in ES and is the DSL real search UIs ship:

* ``|``    OR between clauses
* ``+``    AND between clauses
* ``-X``   negate the next clause (filter, never scores)
* ``"a b"``  phrase (adjacent positions, in order)
* ``te*``  prefix (dictionary expansion, constant-score rewrite)
* ``( )``  grouping; bare whitespace = the ``default_operator``

Scoring follows Lucene clause semantics:

* a TERM leaf contributes BM25(tf, idf(df_term)) when present;
* a PHRASE leaf contributes BM25(phrase_tf, idf(phrase_df)) — the same
  convention as :meth:`InvertedIndex.phrase_topk` / its oracle;
* a PREFIX leaf contributes a constant 1.0 when present (Lucene's
  ``constant_score`` multi-term rewrite — per-expansion idf would make
  scores depend on ``max_expansions``, which ES deliberately avoids);
* leaves under ``-`` only filter (Lucene MUST_NOT never scores);
* a doc matches iff the boolean expression over leaf presence is true;
  pure-negative queries are rejected (MatchNoDocsQuery stance).

Plan shape (the part that must survive 10^12 rows): ONE projection over
the corpus computes every leaf's per-doc tf as pure JVM Column algebra
(``filter``/``sequence``/``get`` higher-order functions — no explode, no
shuffle, no Python); a single aggregate row (N, sum doc_len, one df per
leaf — all integers) is collected and shipped back as literals, so the
scoring pass is scan → constant-folded projection → filter →
``TakeOrderedAndProject``. Two scans total, both bandwidth-bound and
embarrassingly parallel; nothing corpus-sized ever shuffles.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import reduce

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
# AST
# --------------------------------------------------------------------------


@dataclass(frozen=True)
class TermLeaf:
    term: str


@dataclass(frozen=True)
class PhraseLeaf:
    terms: tuple[str, ...]


@dataclass(frozen=True)
class PrefixLeaf:
    prefix: str


Leaf = TermLeaf | PhraseLeaf | PrefixLeaf


@dataclass(frozen=True)
class QNot:
    child: "QNode"


@dataclass(frozen=True)
class QAnd:
    children: tuple["QNode", ...]


@dataclass(frozen=True)
class QOr:
    children: tuple["QNode", ...]


QNode = Leaf | QNot | QAnd | QOr


# --------------------------------------------------------------------------
# Lexer + parser
# --------------------------------------------------------------------------

_SPECIAL = set('()|+-"')


def _lex(q: str) -> list[tuple[str, str]]:
    """Tokens as (kind, text): OP('(' ')' '|' '+' '-'), PHRASE, WORD."""
    out: list[tuple[str, str]] = []
    i, n = 0, len(q)
    while i < n:
        c = q[i]
        if c.isspace():
            i += 1
        elif c == '"':
            j = q.find('"', i + 1)
            if j < 0:  # ES: unterminated quote swallows the rest
                j = n
            out.append(("PHRASE", q[i + 1:j]))
            i = j + 1
        elif c in _SPECIAL:
            out.append(("OP", c))
            i += 1
        else:
            j = i
            while j < n and not q[j].isspace() and q[j] not in _SPECIAL:
                j += 1
            out.append(("WORD", q[i:j]))
            i = j
    return out


class _Parser:
    """``or := and ('|' and)*``; ``and := unary (('+'|juxt) unary)*`` when
    ``default_operator='and'`` — with ``'or'`` juxtaposition binds at the
    OR level instead. ``unary := '-' unary | atom``."""

    def __init__(self, toks: list[tuple[str, str]], default_operator: str):
        self.toks = toks
        self.i = 0
        if default_operator not in ("and", "or"):
            raise ValueError("default_operator must be 'and' or 'or'")
        self.default = default_operator

    def _peek(self):
        return self.toks[self.i] if self.i < len(self.toks) else (None, None)

    def _take(self):
        if self.i >= len(self.toks):
            raise ValueError("unexpected end of query")
        t = self.toks[self.i]
        self.i += 1
        return t

    def _at_atom_start(self) -> bool:
        kind, text = self._peek()
        if kind in ("PHRASE", "WORD"):
            return True
        return kind == "OP" and text in ("(", "-")

    def parse(self) -> QNode:
        node = self.or_expr()
        if self.i != len(self.toks):
            raise ValueError(f"unexpected token {self.toks[self.i]!r}")
        if node is None:
            raise ValueError("empty query")
        return node

    def or_expr(self):
        parts = [self.and_expr()]
        while True:
            kind, text = self._peek()
            if kind == "OP" and text == "|":
                self._take()
                parts.append(self.and_expr())
            elif self.default == "or" and self._at_atom_start():
                parts.append(self.and_expr())
            else:
                break
        parts = [p for p in parts if p is not None]
        if not parts:
            return None
        if len(parts) == 1:
            return parts[0]
        # ES bool semantics: negated clauses in an OR list attach as
        # must_not to the enclosing bool (should(a) must_not(b) for
        # ``a -b``), they are never an OR branch of their own.
        nots = tuple(p for p in parts if isinstance(p, QNot))
        pos = tuple(p for p in parts if not isinstance(p, QNot))
        if not nots:
            return QOr(pos)
        if not pos:
            return QAnd(nots)  # rejected later as pure-negative
        should = pos[0] if len(pos) == 1 else QOr(pos)
        return QAnd((should,) + nots)

    def and_expr(self):
        parts = [self.unary()]
        while True:
            kind, text = self._peek()
            if kind == "OP" and text == "+":
                self._take()
                parts.append(self.unary())
            elif self.default == "and" and self._at_atom_start():
                parts.append(self.unary())
            else:
                break
        parts = [p for p in parts if p is not None]
        if not parts:
            return None
        return parts[0] if len(parts) == 1 else QAnd(tuple(parts))

    def unary(self):
        kind, text = self._peek()
        if kind == "OP" and text == "-":
            self._take()
            child = self.unary()
            return None if child is None else QNot(child)
        return self.atom()

    def atom(self):
        kind, text = self._take()
        if kind == "OP" and text == "(":
            node = self.or_expr()
            k2, t2 = self._peek()
            if k2 == "OP" and t2 == ")":
                self._take()
            else:
                raise ValueError("unbalanced '('")
            return node
        if kind == "PHRASE":
            terms = tuple(tokenize_py(text))
            if not terms:
                return None
            return PhraseLeaf(terms) if len(terms) > 1 else TermLeaf(terms[0])
        if kind == "WORD":
            if text.endswith("*") and len(text) > 1:
                stem = text[:-1]
                folded = tokenize_py(stem)
                # a multi-token stem (e.g. 'fooBar*') prefixes its LAST token
                if not folded:
                    return None
                if len(folded) == 1:
                    return PrefixLeaf(folded[0])
                pre = [TermLeaf(t) for t in folded[:-1]]
                combine = QAnd if self.default == "and" else QOr
                return combine(tuple(pre) + (PrefixLeaf(folded[-1]),))
            folded = tokenize_py(text)
            if not folded:
                return None
            if len(folded) == 1:
                return TermLeaf(folded[0])
            combine = QAnd if self.default == "and" else QOr
            return combine(tuple(TermLeaf(t) for t in folded))
        raise ValueError(f"unexpected token {(kind, text)!r}")


def parse_simple_query(q: str, default_operator: str = "and") -> QNode:
    return _Parser(_lex(q), default_operator).parse()


# --------------------------------------------------------------------------
# AST analysis
# --------------------------------------------------------------------------


def _can_assert_positive(node: QNode) -> bool:
    """Lucene MatchNoDocsQuery stance: every OR branch must be able to
    assert at least one positive leaf (same rule as boolquery)."""
    if isinstance(node, (TermLeaf, PhraseLeaf, PrefixLeaf)):
        return True
    if isinstance(node, QNot):
        return False
    if isinstance(node, QAnd):
        return any(_can_assert_positive(c) for c in node.children)
    return all(_can_assert_positive(c) for c in node.children)


def _walk_leaves(node: QNode, under_not: bool, out: list[tuple[Leaf, bool]]):
    if isinstance(node, (TermLeaf, PhraseLeaf, PrefixLeaf)):
        out.append((node, under_not))
    elif isinstance(node, QNot):
        _walk_leaves(node.child, True, out)
    else:
        for c in node.children:
            _walk_leaves(c, under_not, out)


def collect_leaves(node: QNode) -> tuple[list[Leaf], set[Leaf]]:
    """Unique leaves in first-appearance order + the subset that appears
    in at least one positive (non-negated) position (those score)."""
    walked: list[tuple[Leaf, bool]] = []
    _walk_leaves(node, False, walked)
    order: list[Leaf] = []
    positive: set[Leaf] = set()
    for leaf, under_not in walked:
        if leaf not in order:
            order.append(leaf)
        if not under_not:
            positive.add(leaf)
    return order, positive


def _pred_col(node: QNode, present: dict[Leaf, Column]) -> Column:
    if isinstance(node, (TermLeaf, PhraseLeaf, PrefixLeaf)):
        return present[node]
    if isinstance(node, QNot):
        return ~_pred_col(node.child, present)
    op = (lambda a, b: a & b) if isinstance(node, QAnd) else (lambda a, b: a | b)
    return reduce(op, (_pred_col(c, present) for c in node.children))


def _pred_sql(node: QNode, present: dict[Leaf, str]) -> str:
    if isinstance(node, (TermLeaf, PhraseLeaf, PrefixLeaf)):
        return present[node]
    if isinstance(node, QNot):
        return f"(NOT {_pred_sql(node.child, present)})"
    glue = " AND " if isinstance(node, QAnd) else " OR "
    return "(" + glue.join(_pred_sql(c, present) for c in node.children) + ")"


def _sq(s: str) -> str:
    return s.replace("'", "''")


# --------------------------------------------------------------------------
# Spark evaluation
# --------------------------------------------------------------------------


def _leaf_tf_col(leaf: Leaf, toks: Column, doc_len: Column) -> Column:
    if isinstance(leaf, TermLeaf):
        t = leaf.term
        return F.size(F.filter(toks, lambda x: x == F.lit(t)))
    if isinstance(leaf, PrefixLeaf):
        p = leaf.prefix
        return F.size(F.filter(toks, lambda x: x.startswith(F.lit(p))))
    terms = leaf.terms
    L = len(terms)
    cond = lambda i: reduce(  # noqa: E731
        lambda a, b: a & b,
        (F.get(toks, i + j) == F.lit(t) for j, t in enumerate(terms)),
    )
    return F.when(doc_len < F.lit(L), F.lit(0)).otherwise(
        F.size(F.filter(F.sequence(F.lit(0), doc_len - F.lit(L)), cond))
    )


def simple_query_string_topk(
    corpus: DataFrame,
    q: str,
    k: int = DEFAULT_TOP_K,
    lang: str | None = None,
    default_operator: str = "and",
) -> DataFrame:
    """Top-k (doc_id, score) for an ES ``simple_query_string`` query."""
    root = parse_simple_query(q, default_operator)
    if not _can_assert_positive(root):
        raise ValueError("pure-negative query matches nothing (Lucene "
                         "MatchNoDocsQuery) — add a positive clause")
    leaves, positive = collect_leaves(root)

    if lang is not None:
        corpus = corpus.filter(F.col("lang") == lang)
    docs = corpus.select(
        "doc_id",
        doc_len_col("content").alias("doc_len"),
        tokenize_col("content").alias("toks"),
    )
    toks, dl = F.col("toks"), F.col("doc_len")
    lf = docs.select(
        "doc_id",
        "doc_len",
        *[
            _leaf_tf_col(leaf, toks, dl).cast("long").alias(f"tf{i}")
            for i, leaf in enumerate(leaves)
        ],
    )

    # one aggregate row, all integers -> exact literals on both engines
    stats = lf.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("doc_len").alias("sdl"),
        *[
            F.sum((F.col(f"tf{i}") > 0).cast("long")).alias(f"df{i}")
            for i in range(len(leaves))
        ],
    ).first()
    n = int(stats["n"] or 0)
    if n == 0:
        return lf.select("doc_id", F.lit(0.0).alias("score")).limit(0)
    avgdl = float(stats["sdl"]) / n

    contribs: list[Column] = []
    present: dict[Leaf, Column] = {}
    for i, leaf in enumerate(leaves):
        tf = F.col(f"tf{i}")
        present[leaf] = tf > 0
        if leaf not in positive:
            continue
        if isinstance(leaf, PrefixLeaf):
            c = F.when(tf > 0, F.lit(1.0)).otherwise(F.lit(0.0))
        else:
            dfc = F.lit(float(stats[f"df{i}"]))
            c = F.when(
                tf > 0,
                bm25_term_score_col(tf, idf_col(dfc, float(n)), dl, avgdl),
            ).otherwise(F.lit(0.0))
        contribs.append(c)
    score = reduce(lambda a, b: a + b, contribs)
    return (
        lf.filter(_pred_col(root, present))
        .select("doc_id", F.round(score, 6).alias("score"))
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(k)
    )


# --------------------------------------------------------------------------
# DuckDB oracle
# --------------------------------------------------------------------------


def _leaf_tf_sql(leaf: Leaf) -> str:
    if isinstance(leaf, TermLeaf):
        return f"len(list_filter(toks, x -> x = '{_sq(leaf.term)}'))"
    if isinstance(leaf, PrefixLeaf):
        return ("len(list_filter(toks, x -> starts_with(x, "
                f"'{_sq(leaf.prefix)}')))")
    L = len(leaf.terms)
    cond = " AND ".join(
        f"toks[i + {j}] = '{_sq(t)}'" for j, t in enumerate(leaf.terms)
    )
    return (
        f"CASE WHEN doc_len < {L} THEN 0 ELSE "
        f"len(list_filter(generate_series(1, len(toks) - {L - 1}), "
        f"i -> {cond})) END"
    )


def simple_query_string_oracle_sql(
    q: str,
    k: int = DEFAULT_TOP_K,
    lang: str | None = None,
    default_operator: str = "and",
    table: str = "documents",
    content_col: str = "text",
) -> str:
    """DuckDB twin of :func:`simple_query_string_topk` — same leaf tf
    algebra, same one-row integer stats, same fixed-order contribution
    sum, same 6 dp round."""
    root = parse_simple_query(q, default_operator)
    leaves, positive = collect_leaves(root)
    where_lang = f"WHERE lang = '{lang}'" if lang is not None else ""
    toks = tokenize_duckdb_sql(content_col)

    tf_cols = ",\n         ".join(
        f"({_leaf_tf_sql(leaf)})::BIGINT AS tf{i}"
        for i, leaf in enumerate(leaves)
    )
    df_cols = ",\n         ".join(
        f"sum((tf{i} > 0)::BIGINT)::DOUBLE AS df{i}"
        for i in range(len(leaves))
    )
    contribs = []
    present: dict[Leaf, str] = {}
    for i, leaf in enumerate(leaves):
        present[leaf] = f"(lf.tf{i} > 0)"
        if leaf not in positive:
            continue
        if isinstance(leaf, PrefixLeaf):
            contribs.append(f"CASE WHEN lf.tf{i} > 0 THEN 1.0 ELSE 0.0 END")
        else:
            s = bm25_term_score_sql(
                f"lf.tf{i}",
                idf_sql(f"stats.df{i}", "stats.n"),
                "lf.doc_len",
                "stats.avgdl",
            )
            contribs.append(f"CASE WHEN lf.tf{i} > 0 THEN {s} ELSE 0.0 END")
    score = " + ".join(contribs)
    pred = _pred_sql(root, present)
    return f"""
WITH docs AS (
  SELECT doc_id, {toks} AS toks FROM {table} {where_lang}
),
dl AS (
  SELECT doc_id, toks, len(toks)::BIGINT AS doc_len FROM docs
),
lf AS (
  SELECT doc_id, doc_len,
         {tf_cols}
  FROM dl
),
stats AS (
  SELECT count(*)::DOUBLE AS n,
         sum(doc_len)::DOUBLE / count(*) AS avgdl,
         {df_cols}
  FROM lf
)
SELECT lf.doc_id AS doc_id, round({score}, 6) AS score
FROM lf CROSS JOIN stats
WHERE {pred}
ORDER BY score DESC, doc_id ASC
LIMIT {int(k)}
"""
