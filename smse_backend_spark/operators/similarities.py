"""Additional Lucene similarity models served from the inverted index —
the remaining members of Lucene's pluggable-similarity family next to
BM25 (default), ``LMDirichletSimilarity`` (``operators/lmsim.py``) and
``ClassicSimilarity`` (``index/query.py:classic_tfidf_topk``):

- ``LMJelinekMercerSimilarity`` (λ-smoothed query-likelihood LM):
  per matched (doc, term)::

      p(t|C)  = (cf_t + 1) / (T + 1)
      contrib = ln(1 + (((1-λ) * tf) / dl) / (λ * p(t|C)))

- ``DFRSimilarity(BasicModelIn, AfterEffectL, NormalizationH2)`` — the
  classic **InL2** divergence-from-randomness model (c = 1)::

      tfn     = tf * log2(1 + avgdl / dl)
      contrib = log2((N + 1) / (df + 0.5)) * (tfn / (tfn + 1))

- ``IBSimilarity(DistributionLL, LambdaDF, NormalizationH2)`` — the
  information-based log-logistic model::

      λ_w     = (df + 1) / (N + 1)
      contrib = log2((tfn + λ_w) / λ_w)          (same H2 tfn)

- ``DFISimilarity(IndependenceChiSquared)`` — divergence from
  independence::

      expected = ((cf + 1) * dl) / (T + 1)
      contrib  = log2(((tf-expected)^2 / expected) + 1)  if tf > expected
                 else 0

- ``BooleanSimilarity``: score = number of matched query terms (every
  term scores its boost = 1; tf/dl ignored).

Determinism discipline (the lm_dirichlet / bigram_pmi precedent): every
per-(doc, term) contribution is one identically-parenthesized expression
on both engines, log2 is ``ln(x) / LN2`` with the SAME ``LN2`` literal,
each contribution is floor-half-up quantized to 1e-6 BEFORE the per-doc
sum, so the aggregate is an order-independent integer sum. Per-term
constants (p(t|C), idf, λ_w, cf+1) are computed ONCE driver-side from
exact integer corpus stats and shipped as literals / tiny broadcast
frames — the SQL twin derives the same doubles from the same integers.

Scale shape (indexed paths in ``index/query.py``): identical to the BM25
``_score`` plan — the postings of the query terms are the only input
(dictionary supplies df/cf driver-side, build metadata supplies N/T/avgdl
without a corpus scan), one per-doc partial aggregation, then
``TakeOrderedAndProject``. Nothing here adds a shuffle over plain BM25.

Reference analog: the reference ranks with a single fixed similarity
(pgvector cosine, ``smse_backend/services/search.py:97-110``); the
pluggable similarity family is the Lucene-parity surface its search core
lacks.
"""

from __future__ import annotations

import math

from smse_backend_spark import DEFAULT_TOP_K
from smse_backend_spark.functions.tokenizer import tokenize_duckdb_sql
from smse_backend_spark.operators.search import query_terms

LN2 = 0.6931471805599453  # repr(math.log(2.0)) — shared literal, both engines
DEFAULT_JM_LAMBDA = 0.1   # Lucene LMJelinekMercerSimilarity default for
                          # short queries (Zhai & Lafferty 2001 guidance)


def _scan_scaffold(
    terms: list[str],
    lang: str | None,
    table: str,
    content_col: str,
) -> str:
    """Shared DuckDB CTE scaffold: tokenized docs, per-doc length, corpus
    stats (n docs, avgdl, total tokens t), per-(doc, term) tf restricted
    to the query terms, and per-term df/cf over the matched set (equal to
    the dictionary's df/cf — every occurrence is in some matched doc)."""
    in_list = ", ".join("'" + t.replace("'", "''") + "'" for t in terms)
    where_lang = f"WHERE lang = '{lang}'" if lang is not None else ""
    toks = tokenize_duckdb_sql(content_col)
    return f"""
WITH docs AS (
  SELECT doc_id, {toks} AS toks FROM {table} {where_lang}
),
dl AS (
  SELECT doc_id, toks, len(toks)::BIGINT AS doc_len FROM docs
),
stats AS (
  SELECT count(*)::DOUBLE AS n, avg(doc_len) AS avgdl,
         sum(doc_len)::DOUBLE AS t
  FROM dl
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
  SELECT term, count(*)::DOUBLE AS df, sum(tf)::DOUBLE AS cf
  FROM tf GROUP BY term
)"""


def _qsum_tail(contrib: str, k: int) -> str:
    """Quantize-then-integer-sum final SELECT shared by all models."""
    return f"""
SELECT tf.doc_id AS doc_id,
       (sum(floor(({contrib}) * 1e6 + 0.5)::BIGINT)::DOUBLE / 1e6) AS score
FROM tf JOIN dfq USING (term) CROSS JOIN stats
GROUP BY tf.doc_id
ORDER BY score DESC, doc_id ASC
LIMIT {int(k)}
"""


_EMPTY = "SELECT doc_id, 0.0 AS score FROM {table} WHERE false"

# H2 normalization (c = 1) — written once, duplicated textually where it
# appears twice in a formula (same value, same rounding).
_TFN = "(tf.tf::DOUBLE * (ln(1.0 + stats.avgdl / tf.doc_len::DOUBLE) / {ln2}))"


def lm_jelinek_mercer_oracle_sql(
    query_text: str,
    k: int = DEFAULT_TOP_K,
    lang: str | None = None,
    lam: float = DEFAULT_JM_LAMBDA,
    table: str = "documents",
    content_col: str = "text",
) -> str:
    """DuckDB twin of ``InvertedIndex.lm_jelinek_mercer_topk``."""
    terms = query_terms(query_text)
    if not terms:
        return _EMPTY.format(table=table)
    om, lm = repr(1.0 - float(lam)), repr(float(lam))
    contrib = (
        f"ln(1.0 + (({om} * tf.tf::DOUBLE) / tf.doc_len::DOUBLE)"
        f" / ({lm} * ((dfq.cf + 1.0) / (stats.t + 1.0))))"
    )
    return _scan_scaffold(terms, lang, table, content_col) + _qsum_tail(
        contrib, k
    )


def dfr_inl2_oracle_sql(
    query_text: str,
    k: int = DEFAULT_TOP_K,
    lang: str | None = None,
    table: str = "documents",
    content_col: str = "text",
) -> str:
    """DuckDB twin of ``InvertedIndex.dfr_inl2_topk``."""
    terms = query_terms(query_text)
    if not terms:
        return _EMPTY.format(table=table)
    tfn = _TFN.format(ln2=repr(LN2))
    idf = f"(ln((stats.n + 1.0) / (dfq.df + 0.5)) / {LN2!r})"
    contrib = f"{idf} * ({tfn} / ({tfn} + 1.0))"
    return _scan_scaffold(terms, lang, table, content_col) + _qsum_tail(
        contrib, k
    )


def dfr_pl2_oracle_sql(
    query_text: str,
    k: int = DEFAULT_TOP_K,
    lang: str | None = None,
    table: str = "documents",
    content_col: str = "text",
) -> str:
    """DuckDB twin of ``InvertedIndex.dfr_pl2_topk`` (Terrier PL2):
    identically parenthesized Poisson/Laplace/H2 expression, λ_t from the
    same integer cf/N division, shared LN2/log2(e)/2π literals."""
    terms = query_terms(query_text)
    if not terms:
        return _EMPTY.format(table=table)
    tfn = _TFN.format(ln2=repr(LN2))
    lam = "(dfq.cf / stats.n)"
    log2e = repr(1.0 / LN2)
    two_pi = repr(2.0 * math.pi)
    contrib = (
        f"(1.0 / ({tfn} + 1.0)) * ({tfn} * (ln({tfn} / {lam}) / {LN2!r})"
        f" + ({lam} - {tfn}) * {log2e}"
        f" + 0.5 * (ln({two_pi} * {tfn}) / {LN2!r}))"
    )
    return _scan_scaffold(terms, lang, table, content_col) + _qsum_tail(
        contrib, k
    )


def ib_ll_oracle_sql(
    query_text: str,
    k: int = DEFAULT_TOP_K,
    lang: str | None = None,
    table: str = "documents",
    content_col: str = "text",
) -> str:
    """DuckDB twin of ``InvertedIndex.ib_ll_topk``."""
    terms = query_terms(query_text)
    if not terms:
        return _EMPTY.format(table=table)
    tfn = _TFN.format(ln2=repr(LN2))
    lw = "((dfq.df + 1.0) / (stats.n + 1.0))"
    contrib = f"(ln(({tfn} + {lw}) / {lw}) / {LN2!r})"
    return _scan_scaffold(terms, lang, table, content_col) + _qsum_tail(
        contrib, k
    )


def dfi_chi2_oracle_sql(
    query_text: str,
    k: int = DEFAULT_TOP_K,
    lang: str | None = None,
    table: str = "documents",
    content_col: str = "text",
) -> str:
    """DuckDB twin of ``InvertedIndex.dfi_chi2_topk``."""
    terms = query_terms(query_text)
    if not terms:
        return _EMPTY.format(table=table)
    e = "(((dfq.cf + 1.0) * tf.doc_len::DOUBLE) / (stats.t + 1.0))"
    m = f"(((tf.tf::DOUBLE - {e}) * (tf.tf::DOUBLE - {e})) / {e})"
    contrib = (
        f"CASE WHEN tf.tf::DOUBLE > {e}"
        f" THEN (ln({m} + 1.0) / {LN2!r}) ELSE 0.0 END"
    )
    return _scan_scaffold(terms, lang, table, content_col) + _qsum_tail(
        contrib, k
    )


def ib_spl_oracle_sql(
    query_text: str,
    k: int = DEFAULT_TOP_K,
    lang: str | None = None,
    table: str = "documents",
    content_col: str = "text",
) -> str:
    """DuckDB twin of ``InvertedIndex.ib_spl_topk`` — the power written
    as ``exp(q * ln(λ))`` exactly like the Spark side (libm pow differs
    between engines; exp∘ln composed identically does not)."""
    terms = query_terms(query_text)
    if not terms:
        return _EMPTY.format(table=table)
    tfn = _TFN.format(ln2=repr(LN2))
    lw = "((dfq.df + 1.0) / (stats.n + 1.0))"
    powed = f"exp(({tfn} / ({tfn} + 1.0)) * ln({lw}))"
    contrib = f"(-(ln(({powed} - {lw}) / (1.0 - {lw})) / {LN2!r}))"
    return _scan_scaffold(terms, lang, table, content_col) + _qsum_tail(
        contrib, k
    )


def _dfi_variant_oracle_sql(
    query_text: str,
    kind: str,
    k: int,
    lang: str | None,
    table: str,
    content_col: str,
) -> str:
    """Shared DuckDB twin of the saturated / standardized DFI variants
    (same expected-tf, same tf > expected gate, same log2 as chi2)."""
    terms = query_terms(query_text)
    if not terms:
        return _EMPTY.format(table=table)
    e = "(((dfq.cf + 1.0) * tf.doc_len::DOUBLE) / (stats.t + 1.0))"
    if kind == "saturated":
        m = f"((tf.tf::DOUBLE - {e}) / {e})"
    else:
        m = f"((tf.tf::DOUBLE - {e}) / sqrt({e}))"
    contrib = (
        f"CASE WHEN tf.tf::DOUBLE > {e}"
        f" THEN (ln({m} + 1.0) / {LN2!r}) ELSE 0.0 END"
    )
    return _scan_scaffold(terms, lang, table, content_col) + _qsum_tail(
        contrib, k
    )


def dfi_saturated_oracle_sql(
    query_text: str,
    k: int = DEFAULT_TOP_K,
    lang: str | None = None,
    table: str = "documents",
    content_col: str = "text",
) -> str:
    """DuckDB twin of ``InvertedIndex.dfi_saturated_topk``."""
    return _dfi_variant_oracle_sql(
        query_text, "saturated", k, lang, table, content_col
    )


def dfi_standardized_oracle_sql(
    query_text: str,
    k: int = DEFAULT_TOP_K,
    lang: str | None = None,
    table: str = "documents",
    content_col: str = "text",
) -> str:
    """DuckDB twin of ``InvertedIndex.dfi_standardized_topk``."""
    return _dfi_variant_oracle_sql(
        query_text, "standardized", k, lang, table, content_col
    )


AX_S = 0.5   # Lucene Axiomatic* growth-function default (s)
AX_K = 0.35  # Lucene AxiomaticF2EXP idf exponent default (k)

# F2 length-normalized tf (Fang & Zhai 2005, Lucene AxiomaticF2EXP /
# AxiomaticF2LOG): tf / (tf + s + s·dl/avgdl) — written once, same
# parenthesization on both engines.
_AX_TFN = (
    "(tf.tf::DOUBLE / (tf.tf::DOUBLE + {s}"
    " + {s} * tf.doc_len::DOUBLE / stats.avgdl))"
)


def axiomatic_f2exp_oracle_sql(
    query_text: str,
    k: int = DEFAULT_TOP_K,
    lang: str | None = None,
    table: str = "documents",
    content_col: str = "text",
) -> str:
    """DuckDB twin of ``InvertedIndex.axiomatic_f2exp_topk`` (Lucene
    ``AxiomaticF2EXP``): ``((N+1)/df)^k * tf/(tf + s + s·dl/avgdl)``
    with the Lucene defaults s=0.5, k=0.35. ``pow`` over the same
    integer-derived doubles on both engines (libm on this host)."""
    terms = query_terms(query_text)
    if not terms:
        return _EMPTY.format(table=table)
    tfn = _AX_TFN.format(s=repr(AX_S))
    idf = f"pow((stats.n + 1.0) / dfq.df, {AX_K!r})"
    return _scan_scaffold(terms, lang, table, content_col) + _qsum_tail(
        f"{idf} * {tfn}", k
    )


def axiomatic_f2log_oracle_sql(
    query_text: str,
    k: int = DEFAULT_TOP_K,
    lang: str | None = None,
    table: str = "documents",
    content_col: str = "text",
) -> str:
    """DuckDB twin of ``InvertedIndex.axiomatic_f2log_topk`` (Lucene
    ``AxiomaticF2LOG``): ``ln((N+1)/df) * tf/(tf + s + s·dl/avgdl)``,
    s=0.5."""
    terms = query_terms(query_text)
    if not terms:
        return _EMPTY.format(table=table)
    tfn = _AX_TFN.format(s=repr(AX_S))
    idf = "ln((stats.n + 1.0) / dfq.df)"
    return _scan_scaffold(terms, lang, table, content_col) + _qsum_tail(
        f"{idf} * {tfn}", k
    )


def boolean_sim_oracle_sql(
    query_text: str,
    k: int = DEFAULT_TOP_K,
    lang: str | None = None,
    table: str = "documents",
    content_col: str = "text",
) -> str:
    """DuckDB twin of ``InvertedIndex.boolean_sim_topk``: score = count of
    distinct matched query terms (each term's boost = 1; exact integers,
    no quantization needed)."""
    terms = query_terms(query_text)
    if not terms:
        return _EMPTY.format(table=table)
    scaffold = _scan_scaffold(terms, lang, table, content_col)
    return scaffold + f"""
SELECT doc_id, count(DISTINCT term)::DOUBLE AS score
FROM tf
GROUP BY doc_id
ORDER BY score DESC, doc_id ASC
LIMIT {int(k)}
"""


def jm_constants(
    cfs: dict[str, int], total_tokens: int, lam: float
) -> tuple[float, float, dict[str, float]]:
    """Driver-side per-term constants for Jelinek-Mercer: (1-λ, λ,
    {term: p(t|C)}) — computed once from exact integers so both engines
    see the same doubles."""
    t_plus_1 = float(total_tokens) + 1.0
    p = {t: (float(cf) + 1.0) / t_plus_1 for t, cf in cfs.items()}
    return 1.0 - float(lam), float(lam), p


def inl2_idf(n: float, dfs: dict[str, int]) -> dict[str, float]:
    """Per-term InL2 idf: log2((N+1)/(df+0.5)) via the shared LN2."""
    return {
        t: math.log((n + 1.0) / (float(df) + 0.5)) / LN2
        for t, df in dfs.items()
    }


def ll_lambda(n: float, dfs: dict[str, int]) -> dict[str, float]:
    """Per-term log-logistic λ_w = (df+1)/(N+1)."""
    return {t: (float(df) + 1.0) / (n + 1.0) for t, df in dfs.items()}


def f2exp_idf(n: float, dfs: dict[str, int]) -> dict[str, float]:
    """Per-term Axiomatic F2EXP idf ((N+1)/df)^k — driver-side from the
    dictionary's exact integer df, the same libm pow the oracle uses."""
    return {
        t: math.pow((n + 1.0) / float(df), AX_K) for t, df in dfs.items()
    }


def f2log_idf(n: float, dfs: dict[str, int]) -> dict[str, float]:
    """Per-term Axiomatic F2LOG idf ln((N+1)/df)."""
    return {t: math.log((n + 1.0) / float(df)) for t, df in dfs.items()}
