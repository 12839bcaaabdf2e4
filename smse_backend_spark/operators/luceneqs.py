"""Lucene classic ``query_string``: the full power-user query grammar.

``simple_query_string`` (operators/querystring.py) is the never-throws
end-user DSL; THIS module is the classic Lucene ``QueryParser`` surface a
search power user types into Kibana or the ES ``q=`` URL parameter — the
last retrieval entry point the engine was missing:

* ``field:term``          fielded term (text, keyword or numeric field)
* ``field:(a OR b)``      field-scoped group
* ``"a b"`` / ``"a b"^2`` phrase, optional boost
* ``term^2.5``            per-clause boost (multiplies the contribution)
* ``te?m* ``              wildcard (``*`` = any run, ``?`` = one char)
* ``term~`` / ``term~1``  fuzzy (Levenshtein expansion, default 2 edits)
* ``n_chars:[100 TO 400]`` inclusive numeric range; ``{..}`` exclusive,
  ``*`` for an open end
* ``AND OR NOT && || !``  boolean keywords (UPPERCASE, like Lucene)
* ``+x`` / ``-x``         must / must_not prefixes
* bare juxtaposition      ES bool ``should`` clauses (``default_operator
  ='or'``) or ``must`` (``'and'``)

Scoring follows Lucene clause semantics, written identically on both
engines so the DuckDB twin matches bit-for-bit:

* a text TERM leaf contributes ``boost * BM25(tf, idf(df))``;
* a PHRASE leaf contributes ``boost * BM25(phrase_tf, idf(phrase_df))``;
* a FUZZY leaf is the union of every corpus token within ``max_edits``
  (unbounded expansion — the scan path needs no dictionary cap), scored
  ``boost * BM25(tf_sum, idf(df_union))`` (the SynonymQuery blend with
  union-df; the index-served fuzzy family keeps Lucene's df-ranked capped
  rewrite — both disciplines are deliberate and documented);
* WILDCARD / PREFIX leaves contribute a constant ``boost * 1.0`` when
  present (Lucene's constant-score multi-term rewrite);
* keyword-field (``repo``/``lang``/``path``) and numeric-range leaves are
  predicates contributing ``boost * 1.0`` (Lucene scores ranges constant);
* MUST_NOT clauses filter and never score; a doc matches iff the ES bool
  tree accepts it (musts all present, shoulds free once a must exists);
  pure-negative queries are rejected (MatchNoDocsQuery stance).

Plan shape (the 10^12-row requirement): identical to
``simple_query_string_topk`` — ONE projection computes every leaf's tf /
presence as JVM Column algebra (higher-order ``filter`` with equality,
``startswith``, ``rlike`` or ``levenshtein`` per element — all inside
whole-stage codegen, no explode, no Python), ONE single-row integer
aggregate (N, Σdoc_len, one df per scored leaf) ships back as literals,
then scan → constant-folded score projection → boolean filter →
``TakeOrderedAndProject``. Nothing corpus-sized shuffles.

Reference analog: the free-text search box forwarded verbatim at
smse_backend/routes/search.py:148-156 — this is the grammar that string
gains when the user is an operator rather than an end user.
"""

from __future__ import annotations

import re
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
# Field model: the engine corpus schema (corpus.py) on the Spark side, the
# driver's documents.parquet on the oracle side.
# --------------------------------------------------------------------------

DEFAULT_FIELD = "content"
KEYWORD_FIELDS = ("repo", "lang", "path", "commit")
NUMERIC_FIELDS = ("doc_id", "n_chars")

# corpus column -> oracle (documents table) SQL expression
_ORACLE_EXPR = {
    "content": "text",
    "repo": "source",
    "lang": "lang",
    "path": "NULL",  # synthesized in corpus.py; oracle entries avoid it
    "commit": "NULL",
    "doc_id": "doc_id",
    "n_chars": "length(text)",
}

# corpus column -> Spark Column expression
def _spark_field(field: str) -> Column:
    if field == "n_chars":
        return F.length(F.col("content"))
    return F.col(field)


# --------------------------------------------------------------------------
# AST
# --------------------------------------------------------------------------


@dataclass(frozen=True)
class LTerm:
    field: str
    term: str
    boost: float = 1.0


@dataclass(frozen=True)
class LPhrase:
    field: str
    terms: tuple[str, ...]
    boost: float = 1.0


@dataclass(frozen=True)
class LPrefix:
    field: str
    prefix: str
    boost: float = 1.0


@dataclass(frozen=True)
class LWildcard:
    field: str
    pattern: str
    boost: float = 1.0


@dataclass(frozen=True)
class LFuzzy:
    field: str
    term: str
    max_edits: int = 2
    boost: float = 1.0


@dataclass(frozen=True)
class LRange:
    field: str
    lo: int | None
    hi: int | None
    incl_lo: bool = True
    incl_hi: bool = True
    boost: float = 1.0


LLeaf = LTerm | LPhrase | LPrefix | LWildcard | LFuzzy | LRange


@dataclass(frozen=True)
class LNot:
    child: "LNode"


@dataclass(frozen=True)
class LAnd:
    children: tuple["LNode", ...]


@dataclass(frozen=True)
class LOr:
    children: tuple["LNode", ...]


@dataclass(frozen=True)
class LBool:
    """ES bool: ``must`` all required, ``should`` free once a must exists
    (else at least one), ``must_not`` forbidden. Juxtaposed clause lists
    parse to this node so ``a b +c -d`` means should=[a,b] must=[c]
    must_not=[d], exactly ES."""

    must: tuple["LNode", ...]
    should: tuple["LNode", ...]
    must_not: tuple["LNode", ...]


LNode = LLeaf | LNot | LAnd | LOr | LBool


# --------------------------------------------------------------------------
# Lexer
# --------------------------------------------------------------------------

_FIELD_RE = re.compile(r"^([A-Za-z_][A-Za-z0-9_]*):")
_NUM_RE = re.compile(r"[0-9]+(?:\.[0-9]+)?")


def _lex(q: str) -> list[tuple[str, str]]:
    """Tokens: OP('(' ')' '+' '-'), WORD, PHRASE, FIELD(name),
    BOOST(number), FUZZY(number-or-''), RANGE('[lo TO hi]'-style text
    with the bracket chars kept so the parser reads inclusivity)."""
    out: list[tuple[str, str]] = []
    i, n = 0, len(q)
    while i < n:
        c = q[i]
        if c.isspace():
            i += 1
        elif c == '"':
            j = q.find('"', i + 1)
            if j < 0:
                j = n
            out.append(("PHRASE", q[i + 1:j]))
            i = j + 1
        elif c in "([{":
            if c == "(":
                out.append(("OP", "("))
                i += 1
            else:
                close = "]" if c == "[" else "}"
                j = i + 1
                while j < n and q[j] not in "]}":
                    j += 1
                if j >= n:
                    raise ValueError(f"unterminated range at {i}: {q[i:]!r}")
                out.append(("RANGE", q[i:j + 1]))
                i = j + 1
        elif c == ")":
            out.append(("OP", ")"))
            i += 1
        elif c == "^":
            m = _NUM_RE.match(q, i + 1)
            if not m:
                raise ValueError(f"boost needs a number at {i}: {q[i:]!r}")
            out.append(("BOOST", m.group(0)))
            i = m.end()
        elif c == "~":
            m = _NUM_RE.match(q, i + 1)
            out.append(("FUZZY", m.group(0) if m else ""))
            i = m.end() if m else i + 1
        elif c in "+-" and (i == 0 or q[i - 1].isspace() or q[i - 1] == "(") \
                and i + 1 < n and not q[i + 1].isspace():
            out.append(("OP", c))
            i += 1
        elif c == "!":
            out.append(("WORD", "NOT"))
            i += 1
        else:
            j = i
            while j < n and not q[j].isspace() and q[j] not in '()"[{^~!':
                j += 1
            word = q[i:j]
            i = j
            if word in ("&&", "||"):
                out.append(("WORD", "AND" if word == "&&" else "OR"))
                continue
            m = _FIELD_RE.match(word)
            if m:
                out.append(("FIELD", m.group(1)))
                rest = word[m.end():]
                if rest:
                    out.append(("WORD", rest))
            else:
                out.append(("WORD", word))
    return out


# --------------------------------------------------------------------------
# Parser
# --------------------------------------------------------------------------

_KEYWORDS = ("AND", "OR", "NOT")


class _QSParser:
    """``query := clause+`` (juxtaposition -> LBool with +/- occurs);
    ``clause := ('+'|'-'|NOT)? or_expr``;
    ``or_expr := and_expr (OR and_expr)*``;
    ``and_expr := unary (AND unary)*``;
    ``unary := NOT unary | atom [BOOST] [FUZZY]``."""

    def __init__(self, toks: list[tuple[str, str]], default_operator: str):
        if default_operator not in ("and", "or"):
            raise ValueError("default_operator must be 'and' or 'or'")
        self.toks = toks
        self.i = 0
        self.default = default_operator

    def _peek(self):
        return self.toks[self.i] if self.i < len(self.toks) else (None, None)

    def _take(self):
        if self.i >= len(self.toks):
            raise ValueError("unexpected end of query")
        t = self.toks[self.i]
        self.i += 1
        return t

    def _at_clause_start(self) -> bool:
        kind, text = self._peek()
        if kind in ("PHRASE", "RANGE", "FIELD"):
            return True
        if kind == "WORD":
            return text not in ("AND", "OR")
        return kind == "OP" and text in ("(", "+", "-")

    # -- grammar ----------------------------------------------------------

    def parse(self) -> LNode:
        node = self.clause_list()
        if self.i != len(self.toks):
            raise ValueError(f"unexpected token {self.toks[self.i]!r}")
        if node is None:
            raise ValueError("empty query")
        return node

    def clause_list(self):
        must: list[LNode] = []
        should: list[LNode] = []
        must_not: list[LNode] = []
        n_clauses = 0
        plain: LNode | None = None
        while self._at_clause_start():
            kind, text = self._peek()
            occur = None
            if kind == "OP" and text in ("+", "-"):
                self._take()
                occur = "must" if text == "+" else "must_not"
            elif kind == "WORD" and text == "NOT":
                self._take()
                occur = "must_not"
            node = self.or_expr()
            if node is None:
                continue
            n_clauses += 1
            plain = node if occur is None else None
            if occur == "must":
                must.append(node)
            elif occur == "must_not":
                must_not.append(node)
            elif self.default == "and":
                must.append(node)
            else:
                should.append(node)
        if n_clauses == 0:
            return None
        if n_clauses == 1 and plain is not None:
            return plain
        return LBool(tuple(must), tuple(should), tuple(must_not))

    def or_expr(self):
        parts = [self.and_expr()]
        while True:
            kind, text = self._peek()
            if kind == "WORD" and text == "OR":
                self._take()
                parts.append(self.and_expr())
            else:
                break
        parts = [p for p in parts if p is not None]
        if not parts:
            return None
        return parts[0] if len(parts) == 1 else LOr(tuple(parts))

    def and_expr(self):
        parts = [self.unary()]
        while True:
            kind, text = self._peek()
            if kind == "WORD" and text == "AND":
                self._take()
                parts.append(self.unary())
            else:
                break
        parts = [p for p in parts if p is not None]
        if not parts:
            return None
        return parts[0] if len(parts) == 1 else LAnd(tuple(parts))

    def unary(self):
        kind, text = self._peek()
        if kind == "WORD" and text == "NOT":
            self._take()
            child = self.unary()
            return None if child is None else LNot(child)
        return self.atom()

    # -- atoms ------------------------------------------------------------

    def atom(self):
        kind, text = self._take()
        field = DEFAULT_FIELD
        if kind == "FIELD":
            field = text
            if field not in _ORACLE_EXPR:
                raise ValueError(f"unknown field {field!r}")
            kind, text = self._take()
            if kind == "OP" and text == "(":
                grp = self.clause_list()
                k2, t2 = self._peek()
                if not (k2 == "OP" and t2 == ")"):
                    raise ValueError("unbalanced '(' in field group")
                self._take()
                grp = _retarget(grp, field)
                return self._suffixed(grp)
        if kind == "OP" and text == "(":
            grp = self.clause_list()
            k2, t2 = self._peek()
            if not (k2 == "OP" and t2 == ")"):
                raise ValueError("unbalanced '('")
            self._take()
            return self._suffixed(grp)
        if kind == "PHRASE":
            terms = tuple(tokenize_py(text))
            if field != DEFAULT_FIELD:
                raise ValueError(f"phrase on non-text field {field!r}")
            if not terms:
                return None
            leaf: LNode = (LPhrase(field, terms) if len(terms) > 1
                           else LTerm(field, terms[0]))
            return self._suffixed(leaf)
        if kind == "RANGE":
            return self._suffixed(_parse_range(field, text))
        if kind == "WORD":
            return self._suffixed(self._word_leaf(field, text))
        raise ValueError(f"unexpected token {(kind, text)!r}")

    def _word_leaf(self, field: str, word: str):
        if field in NUMERIC_FIELDS:
            try:
                v = int(word)
            except ValueError:
                raise ValueError(f"numeric field {field!r} needs an integer, "
                                 f"got {word!r}") from None
            return LRange(field, v, v)
        if field in KEYWORD_FIELDS:
            if "*" in word or "?" in word:
                return LWildcard(field, word)
            return LTerm(field, word)
        # text field: fold through the analyzer
        if "*" in word or "?" in word:
            if word.endswith("*") and "*" not in word[:-1] and "?" not in word:
                folded = tokenize_py(word[:-1])
                if not folded:
                    return None
                if len(folded) == 1:
                    return LPrefix(field, folded[0])
                pre = [LTerm(field, t) for t in folded[:-1]]
                last = LPrefix(field, folded[-1])
                return _combine(self.default, tuple(pre) + (last,))
            return LWildcard(field, word.lower())
        folded = tokenize_py(word)
        if not folded:
            return None
        if len(folded) == 1:
            return LTerm(field, folded[0])
        return _combine(self.default, tuple(LTerm(field, t) for t in folded))

    def _suffixed(self, node):
        """Attach trailing ``~N`` (fuzzy) and/or ``^B`` (boost)."""
        if node is None:
            # still consume dangling suffixes
            while self._peek()[0] in ("FUZZY", "BOOST"):
                self._take()
            return None
        while True:
            kind, text = self._peek()
            if kind == "FUZZY":
                self._take()
                edits = int(float(text)) if text else 2
                if not isinstance(node, LTerm) or node.field != DEFAULT_FIELD:
                    raise ValueError("~fuzzy applies to a single text term")
                node = LFuzzy(node.field, node.term, max(0, min(2, edits)),
                              node.boost)
            elif kind == "BOOST":
                self._take()
                node = _boosted(node, float(text))
            else:
                return node


def _combine(default: str, children: tuple[LNode, ...]) -> LNode:
    return LAnd(children) if default == "and" else LOr(children)


def _parse_range(field: str, text: str) -> LRange:
    if field not in NUMERIC_FIELDS:
        raise ValueError(f"range on non-numeric field {field!r}")
    incl_lo = text[0] == "["
    incl_hi = text[-1] == "]"
    body = text[1:-1].strip()
    parts = re.split(r"\s+TO\s+", body)
    if len(parts) != 2:
        raise ValueError(f"range needs 'lo TO hi', got {body!r}")
    lo = None if parts[0] == "*" else int(parts[0])
    hi = None if parts[1] == "*" else int(parts[1])
    return LRange(field, lo, hi, incl_lo, incl_hi)


def _boosted(node: LNode, b: float) -> LNode:
    """Multiply ``b`` into every leaf of the subtree (Lucene boost
    composition — a group boost distributes over its clauses)."""
    if isinstance(node, LLeaf):
        return _leaf_with_boost(node, node.boost * b)
    if isinstance(node, LNot):
        return LNot(_boosted(node.child, b))
    if isinstance(node, LAnd):
        return LAnd(tuple(_boosted(c, b) for c in node.children))
    if isinstance(node, LOr):
        return LOr(tuple(_boosted(c, b) for c in node.children))
    return LBool(
        tuple(_boosted(c, b) for c in node.must),
        tuple(_boosted(c, b) for c in node.should),
        tuple(_boosted(c, b) for c in node.must_not),
    )


def _leaf_with_boost(leaf: LLeaf, b: float) -> LLeaf:
    import dataclasses

    return dataclasses.replace(leaf, boost=b)


def _retarget(node: LNode | None, field: str) -> LNode | None:
    """Apply a ``field:(...)`` scope to every leaf of the group."""
    if node is None:
        return None
    if isinstance(node, LLeaf):
        if isinstance(node, LRange) and field not in NUMERIC_FIELDS:
            raise ValueError(f"range on non-numeric field {field!r}")
        if isinstance(node, (LPhrase, LFuzzy)) and field != DEFAULT_FIELD:
            raise ValueError(f"{type(node).__name__} on non-text field "
                             f"{field!r}")
        if isinstance(node, LTerm) and field in NUMERIC_FIELDS:
            return LRange(field, int(node.term), int(node.term),
                          boost=node.boost)
        if isinstance(node, LPrefix) and field in KEYWORD_FIELDS:
            return LWildcard(field, node.prefix + "*", node.boost)
        import dataclasses

        return dataclasses.replace(node, field=field)
    if isinstance(node, LNot):
        return LNot(_retarget(node.child, field))
    if isinstance(node, LAnd):
        return LAnd(tuple(_retarget(c, field) for c in node.children))
    if isinstance(node, LOr):
        return LOr(tuple(_retarget(c, field) for c in node.children))
    return LBool(
        tuple(_retarget(c, field) for c in node.must),
        tuple(_retarget(c, field) for c in node.should),
        tuple(_retarget(c, field) for c in node.must_not),
    )


def parse_query_string(q: str, default_operator: str = "or") -> LNode:
    """Parse a classic Lucene query string (default_operator='or', the
    Lucene/ES default — contrast simple_query_string's 'and')."""
    return _QSParser(_lex(q), default_operator).parse()


# --------------------------------------------------------------------------
# AST analysis (shared by the Spark evaluator and the DuckDB twin)
# --------------------------------------------------------------------------


def _can_assert_positive(node: LNode) -> bool:
    if isinstance(node, LLeaf):
        return True
    if isinstance(node, LNot):
        return False
    if isinstance(node, LAnd):
        return any(_can_assert_positive(c) for c in node.children)
    if isinstance(node, LOr):
        return all(_can_assert_positive(c) for c in node.children)
    if node.must:
        return any(_can_assert_positive(c) for c in node.must)
    return bool(node.should) and all(
        _can_assert_positive(c) for c in node.should
    )


def _walk(node: LNode, under_not: bool, out: list[tuple[LLeaf, bool]]):
    if isinstance(node, LLeaf):
        out.append((node, under_not))
    elif isinstance(node, LNot):
        _walk(node.child, True, out)
    elif isinstance(node, (LAnd, LOr)):
        for c in node.children:
            _walk(c, under_not, out)
    else:
        for c in node.must + node.should:
            _walk(c, under_not, out)
        for c in node.must_not:
            _walk(c, True, out)


def collect_qs_leaves(node: LNode) -> tuple[list[LLeaf], set[LLeaf]]:
    walked: list[tuple[LLeaf, bool]] = []
    _walk(node, False, walked)
    order: list[LLeaf] = []
    positive: set[LLeaf] = set()
    for leaf, under_not in walked:
        if leaf not in order:
            order.append(leaf)
        if not under_not:
            positive.add(leaf)
    return order, positive


def _pred(node: LNode, present, AND, OR, NOT):
    if isinstance(node, LLeaf):
        return present[node]
    if isinstance(node, LNot):
        return NOT(_pred(node.child, present, AND, OR, NOT))
    if isinstance(node, LAnd):
        return reduce(AND, (_pred(c, present, AND, OR, NOT)
                            for c in node.children))
    if isinstance(node, LOr):
        return reduce(OR, (_pred(c, present, AND, OR, NOT)
                           for c in node.children))
    parts = []
    if node.must:
        parts.append(reduce(AND, (_pred(c, present, AND, OR, NOT)
                                  for c in node.must)))
    elif node.should:
        parts.append(reduce(OR, (_pred(c, present, AND, OR, NOT)
                                 for c in node.should)))
    for c in node.must_not:
        parts.append(NOT(_pred(c, present, AND, OR, NOT)))
    return reduce(AND, parts)


def _pred_col(node: LNode, present: dict[LLeaf, Column]) -> Column:
    return _pred(node, present, lambda a, b: a & b, lambda a, b: a | b,
                 lambda a: ~a)


def _pred_sql(node: LNode, present: dict[LLeaf, str]) -> str:
    return _pred(node, present, lambda a, b: f"({a} AND {b})",
                 lambda a, b: f"({a} OR {b})", lambda a: f"(NOT {a})")


def _sq(s: str) -> str:
    return s.replace("'", "''")


def wild_regex_body(pattern: str) -> str:
    """Unanchored regex body for a Lucene wildcard (``*``/``?``) — the
    form full-match consumers (the index dictionary walk) take."""
    out = []
    for ch in pattern:
        if ch == "*":
            out.append(".*")
        elif ch == "?":
            out.append(".")
        else:
            out.append(re.escape(ch))
    return "".join(out)


def _wild_regex(pattern: str) -> str:
    """Anchored regex for a Lucene wildcard — identical string handed to
    Spark ``rlike`` and DuckDB ``regexp_matches`` so both engines run the
    same automaton."""
    return "^" + wild_regex_body(pattern) + "$"


def _is_scored(leaf: LLeaf) -> bool:
    """BM25-scored (needs a df stat) vs constant-score leaves."""
    return isinstance(leaf, (LTerm, LPhrase, LFuzzy)) \
        and leaf.field == DEFAULT_FIELD


# --------------------------------------------------------------------------
# Spark evaluation
# --------------------------------------------------------------------------


def _leaf_tf_col(leaf: LLeaf, toks: Column, doc_len: Column) -> Column:
    """Per-doc tf (text leaves) or 0/1 presence (predicate leaves) as a
    single JVM Column — every branch stays inside codegen."""
    if isinstance(leaf, LRange):
        c = _spark_field(leaf.field)
        p = F.lit(True)
        if leaf.lo is not None:
            p = p & (c >= F.lit(leaf.lo) if leaf.incl_lo
                     else c > F.lit(leaf.lo))
        if leaf.hi is not None:
            p = p & (c <= F.lit(leaf.hi) if leaf.incl_hi
                     else c < F.lit(leaf.hi))
        return p.cast("long")
    if leaf.field != DEFAULT_FIELD:
        c = _spark_field(leaf.field)
        if isinstance(leaf, LTerm):
            return (c == F.lit(leaf.term)).cast("long")
        if isinstance(leaf, LWildcard):
            return c.rlike(_wild_regex(leaf.pattern)).cast("long")
        raise ValueError(f"unsupported leaf on field {leaf.field!r}: {leaf}")
    if isinstance(leaf, LTerm):
        t = leaf.term
        return F.size(F.filter(toks, lambda x: x == F.lit(t)))
    if isinstance(leaf, LPrefix):
        p = leaf.prefix
        return F.size(F.filter(toks, lambda x: x.startswith(F.lit(p))))
    if isinstance(leaf, LWildcard):
        rx = _wild_regex(leaf.pattern)
        return F.size(F.filter(toks, lambda x: x.rlike(rx)))
    if isinstance(leaf, LFuzzy):
        t, b = leaf.term, leaf.max_edits
        return F.size(
            F.filter(toks, lambda x: F.levenshtein(x, F.lit(t)) <= F.lit(b))
        )
    terms = leaf.terms
    L = len(terms)
    cond = lambda i: reduce(  # noqa: E731
        lambda a, b: a & b,
        (F.get(toks, i + j) == F.lit(t) for j, t in enumerate(terms)),
    )
    return F.when(doc_len < F.lit(L), F.lit(0)).otherwise(
        F.size(F.filter(F.sequence(F.lit(0), doc_len - F.lit(L)), cond))
    )


def query_string_topk(
    corpus: DataFrame,
    q: str,
    k: int = DEFAULT_TOP_K,
    default_operator: str = "or",
) -> DataFrame:
    """Top-k (doc_id, score) for a classic Lucene ``query_string`` query
    over the engine corpus ``(doc_id, repo, path, commit, lang, content)``."""
    root = parse_query_string(q, default_operator)
    if not _can_assert_positive(root):
        raise ValueError("pure-negative query matches nothing (Lucene "
                         "MatchNoDocsQuery) — add a positive clause")
    leaves, positive = collect_qs_leaves(root)

    meta = sorted({
        leaf.field for leaf in leaves if leaf.field != DEFAULT_FIELD
    })
    docs = corpus.select(
        "doc_id",
        *[c for c in meta if c != "n_chars"],
        *(["content"] if "n_chars" in meta else []),
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

    stats = lf.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("doc_len").alias("sdl"),
        *[
            F.sum((F.col(f"tf{i}") > 0).cast("long")).alias(f"df{i}")
            for i, leaf in enumerate(leaves)
            if _is_scored(leaf)
        ],
    ).first()
    n = int(stats["n"] or 0)
    if n == 0:
        return lf.select("doc_id", F.lit(0.0).alias("score")).limit(0)
    avgdl = float(stats["sdl"]) / n

    contribs: list[Column] = []
    present: dict[LLeaf, Column] = {}
    for i, leaf in enumerate(leaves):
        tf = F.col(f"tf{i}")
        present[leaf] = tf > 0
        if leaf not in positive:
            continue
        if _is_scored(leaf):
            dfc = F.lit(float(stats[f"df{i}"]))
            c = F.when(
                tf > 0,
                F.lit(leaf.boost)
                * bm25_term_score_col(tf, idf_col(dfc, float(n)), dl, avgdl),
            ).otherwise(F.lit(0.0))
        else:
            c = F.when(tf > 0, F.lit(float(leaf.boost))).otherwise(F.lit(0.0))
        contribs.append(c)
    score = reduce(lambda a, b: a + b, contribs)
    # half-up 6dp floor written identically on both engines (round(x,6)
    # diverges 1 ulp at .xxxxxx5 boundaries between Spark and DuckDB)
    rounded = F.floor(score * F.lit(1e6) + F.lit(0.5)) / F.lit(1e6)
    return (
        lf.filter(_pred_col(root, present))
        .select("doc_id", rounded.alias("score"))
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(k)
    )


# --------------------------------------------------------------------------
# DuckDB oracle
# --------------------------------------------------------------------------


def _leaf_tf_sql(leaf: LLeaf, colref: str | None = None) -> str:
    if isinstance(leaf, LRange):
        c = colref or _ORACLE_EXPR[leaf.field]
        conds = []
        if leaf.lo is not None:
            conds.append(f"{c} {'>=' if leaf.incl_lo else '>'} {leaf.lo}")
        if leaf.hi is not None:
            conds.append(f"{c} {'<=' if leaf.incl_hi else '<'} {leaf.hi}")
        cond = " AND ".join(conds) if conds else "TRUE"
        return f"(({cond}))::BIGINT"
    if leaf.field != DEFAULT_FIELD:
        c = colref or _ORACLE_EXPR[leaf.field]
        if isinstance(leaf, LTerm):
            return f"({c} = '{_sq(leaf.term)}')::BIGINT"
        if isinstance(leaf, LWildcard):
            rx = _sq(_wild_regex(leaf.pattern))
            return f"regexp_matches({c}, '{rx}')::BIGINT"
        raise ValueError(f"unsupported leaf on field {leaf.field!r}: {leaf}")
    if isinstance(leaf, LTerm):
        return f"len(list_filter(toks, x -> x = '{_sq(leaf.term)}'))"
    if isinstance(leaf, LPrefix):
        return ("len(list_filter(toks, x -> starts_with(x, "
                f"'{_sq(leaf.prefix)}')))")
    if isinstance(leaf, LWildcard):
        rx = _sq(_wild_regex(leaf.pattern))
        return f"len(list_filter(toks, x -> regexp_matches(x, '{rx}')))"
    if isinstance(leaf, LFuzzy):
        return ("len(list_filter(toks, x -> levenshtein(x, "
                f"'{_sq(leaf.term)}') <= {leaf.max_edits}))")
    L = len(leaf.terms)
    cond = " AND ".join(
        f"toks[i + {j}] = '{_sq(t)}'" for j, t in enumerate(leaf.terms)
    )
    return (
        f"CASE WHEN doc_len < {L} THEN 0 ELSE "
        f"len(list_filter(generate_series(1, len(toks) - {L - 1}), "
        f"i -> {cond})) END"
    )


def query_string_oracle_sql(
    q: str,
    k: int = DEFAULT_TOP_K,
    default_operator: str = "or",
    table: str = "documents",
    content_col: str = "text",
) -> str:
    """DuckDB twin of :func:`query_string_topk` — same leaf algebra, same
    one-row integer stats, same fixed-order boosted contribution sum,
    same 6 dp round."""
    root = parse_query_string(q, default_operator)
    leaves, positive = collect_qs_leaves(root)
    toks = tokenize_duckdb_sql(content_col)

    # metadata fields ride the CTE chain under stable qsm{i} aliases so
    # the tf expressions never re-embed raw column references
    carry = ", ".join(
        f"{_ORACLE_EXPR[leaf.field]} AS qsm{i}"
        for i, leaf in enumerate(leaves)
        if leaf.field != DEFAULT_FIELD
    )
    tf_exprs = []
    for i, leaf in enumerate(leaves):
        colref = f"qsm{i}" if leaf.field != DEFAULT_FIELD else None
        tf_exprs.append(f"({_leaf_tf_sql(leaf, colref)})::BIGINT AS tf{i}")
    tf_cols = ",\n         ".join(tf_exprs)
    df_cols = ",\n         ".join(
        f"sum((tf{i} > 0)::BIGINT)::DOUBLE AS df{i}"
        for i, leaf in enumerate(leaves)
        if _is_scored(leaf)
    )
    contribs = []
    present: dict[LLeaf, str] = {}
    for i, leaf in enumerate(leaves):
        present[leaf] = f"(lf.tf{i} > 0)"
        if leaf not in positive:
            continue
        if _is_scored(leaf):
            s = bm25_term_score_sql(
                f"lf.tf{i}",
                idf_sql(f"stats.df{i}", "stats.n"),
                "lf.doc_len",
                "stats.avgdl",
            )
            contribs.append(
                f"CASE WHEN lf.tf{i} > 0 THEN {float(leaf.boost)!r} * ({s}) "
                f"ELSE 0.0 END"
            )
        else:
            contribs.append(
                f"CASE WHEN lf.tf{i} > 0 THEN {float(leaf.boost)!r} "
                f"ELSE 0.0 END"
            )
    score = " + ".join(contribs)
    pred = _pred_sql(root, present)
    stats_sel = (f",\n         {df_cols}" if df_cols else "")
    carry_sel = f",\n         {carry}" if carry else ""
    return f"""
WITH docs AS (
  SELECT doc_id, {toks} AS toks{carry_sel} FROM {table}
),
dl AS (
  SELECT *, len(toks)::BIGINT AS doc_len FROM docs
),
lf AS (
  SELECT doc_id, doc_len,
         {tf_cols}
  FROM dl
),
stats AS (
  SELECT count(*)::DOUBLE AS n,
         sum(doc_len)::DOUBLE / count(*) AS avgdl{stats_sel}
  FROM lf
)
SELECT lf.doc_id AS doc_id, floor(({score}) * 1e6 + 0.5) / 1e6 AS score
FROM lf CROSS JOIN stats
WHERE {pred}
ORDER BY score DESC, doc_id ASC
LIMIT {int(k)}
"""
