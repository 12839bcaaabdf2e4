"""Search-side analytics: significant-terms aggregation and percolation.

Two Elasticsearch/Lucene capabilities the reference's search surface implies
but never had an engine for (its API stops at ranked retrieval —
``smse_backend/routes/search.py:148-231``):

* ``significant_terms`` — "what is this result set ABOUT": terms that are
  unusually frequent in the matched docs vs the whole corpus (the ES
  significant-terms aggregation, JLH score).
* ``percolate`` — reverse search: given a table of STORED queries, which
  queries match a given document (saved searches / alerting).

Both are pure DataFrame algebra — tokenize, explode, join, aggregate — and
both ship a DuckDB oracle twin.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window, functions as F

from smse_backend_spark.functions.tokenizer import (
    doc_len_col,
    tokenize_col,
    tokenize_duckdb_sql,
)
from smse_backend_spark.operators.search import query_terms


def _doc_terms(corpus: DataFrame) -> DataFrame:
    """(doc_id, term) with per-doc DISTINCT terms — doc-frequency units."""
    return corpus.select(
        "doc_id",
        F.explode(F.array_distinct(tokenize_col("content"))).alias("term"),
    )


def significant_terms(
    corpus: DataFrame,
    query_text: str,
    k: int = 20,
    lang: str | None = None,
    heuristic: str = "jlh",
) -> DataFrame:
    """ES significant-terms aggregation: for each term in the foreground
    (docs matching ANY query term), score by the chosen significance
    heuristic:

    * ``jlh`` (ES default): ``(fg% - bg%) * (fg% / bg%)``,
      fg% = fg_df/|fg|, bg% = bg_df/N;
    * ``chi_square``: the 2×2 contingency chi-squared (term presence ×
      foreground membership, background superset) —
      ``N·(N11·N00 − N01·N10)² / ((N11+N01)(N10+N00)(N11+N10)(N01+N00))``
      with N11=fg_df, N01=bg_df−fg_df, N10=|fg|−fg_df,
      N00=(N−|fg|)−N01 — every cell an exact integer, one double
      division at the end, so both engines agree bit-for-bit.

    * ``mutual_information``: ES's third built-in heuristic
      (``include_negatives=true``) — the 4-cell pointwise-MI sum
      ``Σ (Nxy/N)·log2(Nxy·N / (Nx_·N_y))`` over the term-presence ×
      foreground-membership contingency table; a zero cell contributes
      0 (the x·log x → 0 limit). Every cell is an exact integer and the
      expression is identically parenthesized on both engines (shared
      LN2 literal).

    * ``percentage``: fg_df/bg_df — the share of the term's background
      usage that is inside the foreground (ES's simplest built-in);
      shared half-up 6 dp floor.

    * ``gnd``: exp(-NGD) over the (term, foreground) co-occurrence
      marginals (see inline comment).

    Returns the top-k (term, fg_df, bg_df, score) by (score desc, term asc).

    Scale shape: two doc-frequency aggregations over distinct (doc, term)
    pairs — the index build's shuffle unit — plus an equi-join on term;
    the foreground doc set joins on doc_id (no broadcast assumption: the
    match set can be huge).
    """
    if heuristic not in (
        "jlh", "chi_square", "mutual_information", "gnd", "percentage",
    ):
        raise ValueError(f"unknown significance heuristic {heuristic!r}")
    qterms = query_terms(query_text)
    if lang is not None:
        corpus = corpus.filter(F.col("lang") == lang)
    empty = corpus.select(
        F.lit("").alias("term"), F.lit(0).cast("long").alias("fg_df"),
        F.lit(0).cast("long").alias("bg_df"), F.lit(0.0).alias("score"),
    ).limit(0)
    if not qterms:
        return empty
    toks = _doc_terms(corpus)
    m = toks.filter(F.col("term").isin(qterms)).select("doc_id").distinct()
    fg_n = m.count()
    bg_n = corpus.count()
    if not fg_n:
        return empty
    fg = toks.join(m, "doc_id").groupBy("term").agg(
        F.count(F.lit(1)).alias("fg_df")
    )
    bg = toks.groupBy("term").agg(F.count(F.lit(1)).alias("bg_df"))
    if heuristic == "jlh":
        fg_pct = F.col("fg_df").cast("double") / F.lit(float(fg_n))
        bg_pct = F.col("bg_df").cast("double") / F.lit(float(bg_n))
        score = F.round((fg_pct - bg_pct) * (fg_pct / bg_pct), 6)
    elif heuristic == "mutual_information":
        from smse_backend_spark.operators.similarities import LN2

        nd = float(bg_n)
        n11 = F.col("fg_df").cast("long")
        n10 = (F.col("bg_df") - F.col("fg_df")).cast("long")
        n01 = (F.lit(int(fg_n)) - F.col("fg_df")).cast("long")
        n00 = (F.lit(int(bg_n) - int(fg_n)) - n10).cast("long")
        n1x, n0x = F.col("bg_df").cast("long"), F.lit(int(bg_n)) - F.col("bg_df")
        nx1, nx0 = F.lit(int(fg_n)), F.lit(int(bg_n) - int(fg_n))

        def _mi(nxy, nx, ny):
            d = nxy.cast("double")
            return F.when(
                nxy > 0,
                (d / F.lit(nd)) * (
                    F.log((d * F.lit(nd))
                          / (nx.cast("double") * ny.cast("double")))
                    / F.lit(LN2)
                ),
            ).otherwise(F.lit(0.0))

        score = F.round(
            _mi(n11, n1x, nx1) + _mi(n10, n1x, nx0)
            + _mi(n01, n0x, nx1) + _mi(n00, n0x, nx0),
            6,
        )
    elif heuristic == "percentage":
        # ES percentage heuristic: the plain fraction of the term's
        # background occurrences that fall inside the foreground —
        # fg_df/bg_df in [0, 1]. ES documents it as the heuristic for
        # "what share of this term's usage is in my result set"; no
        # corpus-size terms, so ratio-of-two-integers exactness holds.
        # Shared half-up floor at 6 dp (not round()) so both engines
        # agree at half boundaries.
        score = F.floor(
            (F.col("fg_df").cast("double") / F.col("bg_df").cast("double"))
            * F.lit(1e6) + F.lit(0.5)
        ) / F.lit(1e6)
    elif heuristic == "gnd":
        # ES GND heuristic (Cilibrasi & Vitányi 2007 normalized Google
        # distance; ES inverts it with exp(-NGD) so relevant terms score
        # HIGH): fx = bg_df (term marginal), fy = |fg| (set marginal),
        # fxy = fg_df (co-occurrence), N = corpus size. fxy = 0 -> 0;
        # perfect co-occurrence (fx = fy = fxy) -> 1.
        fx = F.col("bg_df").cast("double")
        fy = F.lit(float(fg_n))
        fxy = F.col("fg_df").cast("double")
        nd = F.lit(float(bg_n))
        dist = (F.greatest(F.log(fx), F.log(fy)) - F.log(fxy)) / (
            F.log(nd) - F.least(F.log(fx), F.log(fy))
        )
        score = F.round(
            F.when(F.col("fg_df") == 0, F.lit(0.0))
            .when(
                (F.col("bg_df") == F.lit(int(fg_n)))
                & (F.col("bg_df") == F.col("fg_df")),
                F.lit(1.0),
            )
            .otherwise(F.exp(F.lit(-1.0) * dist)),
            6,
        )
    else:
        n11 = F.col("fg_df").cast("long")
        n01 = (F.col("bg_df") - F.col("fg_df")).cast("long")
        n10 = (F.lit(int(fg_n)) - F.col("fg_df")).cast("long")
        n00 = (F.lit(int(bg_n) - int(fg_n)) - n01).cast("long")
        d = (n11 * n00 - n01 * n10).cast("long")
        score = F.round(
            (F.lit(int(bg_n)).cast("double") * (d * d).cast("double"))
            / ((n11 + n01) * (n10 + n00)).cast("double")
            / ((n11 + n10) * (n01 + n00)).cast("double"),
            6,
        )
    return (
        fg.join(bg, "term")
        .withColumn("score", score)
        .select("term", "fg_df", "bg_df", "score")
        .orderBy(F.desc("score"), F.asc("term"))
        .limit(k)
    )


def significant_terms_sql(
    query_text: str,
    k: int = 20,
    lang: str | None = None,
    table: str = "documents",
    content_col: str = "text",
    heuristic: str = "jlh",
) -> str:
    """DuckDB twin of :func:`significant_terms` (same per-heuristic
    expression, same parenthesization, same rounding)."""
    qterms = query_terms(query_text)
    if not qterms:
        return ("SELECT '' AS term, 0::BIGINT AS fg_df, 0::BIGINT AS bg_df, "
                f"0.0 AS score FROM {table} WHERE false")
    in_list = ", ".join("'" + t.replace("'", "''") + "'" for t in qterms)
    where_lang = f"WHERE lang = '{lang}'" if lang is not None else ""
    toks = tokenize_duckdb_sql(content_col)
    if heuristic == "jlh":
        score = (
            "round(((fg_df::DOUBLE / nn.fg_n) - (bg_df::DOUBLE / nn.bg_n))\n"
            "             * ((fg_df::DOUBLE / nn.fg_n)"
            " / (bg_df::DOUBLE / nn.bg_n)), 6)"
        )
    elif heuristic == "chi_square":
        n11 = "fg_df"
        n01 = "(bg_df - fg_df)"
        n10 = "(nn.fg_ni - fg_df)"
        n00 = f"((nn.bg_ni - nn.fg_ni) - {n01})"
        d = f"({n11} * {n00} - {n01} * {n10})"
        score = (
            f"round((nn.bg_ni::DOUBLE * ({d} * {d})::DOUBLE)"
            f" / (({n11} + {n01}) * ({n10} + {n00}))::DOUBLE"
            f" / (({n11} + {n10}) * ({n01} + {n00}))::DOUBLE, 6)"
        )
    elif heuristic == "mutual_information":
        from smse_backend_spark.operators.similarities import LN2

        # cell / marginal names mirror the Spark side exactly
        cells = {
            "n11": ("fg_df", "bg_df", "nn.fg_ni"),
            "n10": ("(bg_df - fg_df)", "bg_df", "(nn.bg_ni - nn.fg_ni)"),
            "n01": ("(nn.fg_ni - fg_df)", "(nn.bg_ni - bg_df)", "nn.fg_ni"),
            "n00": ("((nn.bg_ni - nn.fg_ni) - (bg_df - fg_df))",
                    "(nn.bg_ni - bg_df)", "(nn.bg_ni - nn.fg_ni)"),
        }
        mi_terms = [
            f"CASE WHEN {nxy} > 0 THEN ({nxy}::DOUBLE / nn.bg_n) * "
            f"(ln(({nxy}::DOUBLE * nn.bg_n) / ({nx}::DOUBLE * {ny}::DOUBLE))"
            f" / {LN2!r}) ELSE 0.0 END"
            for nxy, nx, ny in cells.values()
        ]
        score = "round(" + " + ".join(mi_terms) + ", 6)"
    elif heuristic == "percentage":
        score = (
            "floor((fg_df::DOUBLE / bg_df::DOUBLE) * 1e6 + 0.5) / 1e6"
        )
    elif heuristic == "gnd":
        dist = (
            "((greatest(ln(bg_df::DOUBLE), ln(nn.fg_n))"
            " - ln(fg_df::DOUBLE))"
            " / (ln(nn.bg_n)"
            " - least(ln(bg_df::DOUBLE), ln(nn.fg_n))))"
        )
        score = (
            "round(CASE WHEN fg_df = 0 THEN 0.0\n"
            "            WHEN bg_df = nn.fg_ni AND bg_df = fg_df THEN 1.0\n"
            f"            ELSE exp(-1.0 * {dist}) END, 6)"
        )
    else:
        raise ValueError(f"unknown significance heuristic {heuristic!r}")
    return f"""
WITH dl AS (
  SELECT doc_id, {toks} AS toks FROM {table} {where_lang}
),
tok AS (
  SELECT DISTINCT doc_id, unnest(toks) AS term FROM dl
),
m AS (
  SELECT DISTINCT doc_id FROM tok WHERE term IN ({in_list})
),
nn AS (
  SELECT (SELECT count(*) FROM m)::DOUBLE AS fg_n,
         (SELECT count(*) FROM dl)::DOUBLE AS bg_n,
         (SELECT count(*) FROM m)::BIGINT AS fg_ni,
         (SELECT count(*) FROM dl)::BIGINT AS bg_ni
),
fg AS (
  SELECT term, count(*)::BIGINT AS fg_df
  FROM tok JOIN m USING (doc_id) GROUP BY term
),
bg AS (
  SELECT term, count(*)::BIGINT AS bg_df FROM tok GROUP BY term
)
SELECT term, fg_df, bg_df,
       {score}
         AS score
FROM fg JOIN bg USING (term) CROSS JOIN nn
ORDER BY score DESC, term ASC
LIMIT {k}
"""


def graph_explore(
    corpus: DataFrame,
    query_text: str,
    n_vertices: int = 12,
    n_edges: int = 20,
    lang: str | None = None,
) -> DataFrame:
    """ES X-Pack Graph explore, one hop: seed the match set with
    ``query_text``, pick the ``n_vertices`` most-frequent terms of that
    foreground as vertices, and return the top-``n_edges`` co-occurrence
    edges (term_a, term_b, n_docs) — term_a < term_b, ordered by
    (n_docs desc, term_a asc, term_b asc).

    The Graph API's default vertex ranking is significance-based with a
    frequency fallback; this uses foreground doc-frequency (ties term
    asc) so the weights stay pure integers, and leaves significance
    ranking to :func:`significant_terms` (same foreground machinery).

    Scale shape: the corpus-sized work is the distinct (doc, term)
    explode the significant-terms family already pays; the match set
    joins on doc_id (no broadcast assumption). The vertex list is
    ``n_vertices`` rows — broadcast into the edge self-join, which is
    keyed by doc_id over a frame pre-filtered to vertex terms (<=
    ``n_vertices`` rows per doc), so the pair blow-up is bounded by
    ``n_vertices^2`` per doc, not vocabulary-sized.
    """
    qterms = query_terms(query_text)
    if lang is not None:
        corpus = corpus.filter(F.col("lang") == lang)
    tok = _doc_terms(corpus)
    m = tok.filter(F.col("term").isin(qterms)).select("doc_id").distinct()
    fg = tok.join(m, "doc_id")
    vertices = (
        fg.groupBy("term")
        .agg(F.count(F.lit(1)).cast("long").alias("fg_df"))
        .orderBy(F.desc("fg_df"), F.asc("term"))
        .limit(int(n_vertices))
        .select("term")
    )
    vfg = fg.join(F.broadcast(vertices), "term")
    a = vfg.select("doc_id", F.col("term").alias("term_a"))
    b = vfg.select("doc_id", F.col("term").alias("term_b"))
    return (
        a.join(b, "doc_id")
        .filter(F.col("term_a") < F.col("term_b"))
        .groupBy("term_a", "term_b")
        .agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
        .orderBy(F.desc("n_docs"), F.asc("term_a"), F.asc("term_b"))
        .limit(int(n_edges))
    )


def graph_explore_sql(
    query_text: str,
    n_vertices: int = 12,
    n_edges: int = 20,
    lang: str | None = None,
    table: str = "documents",
    content_col: str = "text",
) -> str:
    """DuckDB twin of :func:`graph_explore` — same foreground, same
    vertex cut, same pair count, same ordering."""
    toks = tokenize_duckdb_sql(content_col)
    qterms = query_terms(query_text)
    in_list = ", ".join(f"'{t}'" for t in qterms) or "''"
    where_lang = f"WHERE lang = '{lang}'" if lang is not None else ""
    return f"""
WITH dl AS (
  SELECT doc_id, {toks} AS toks FROM {table} {where_lang}
),
tok AS (
  SELECT DISTINCT doc_id, unnest(toks) AS term FROM dl
),
m AS (
  SELECT DISTINCT doc_id FROM tok WHERE term IN ({in_list})
),
fg AS (
  SELECT tok.doc_id, term FROM tok JOIN m USING (doc_id)
),
vertices AS (
  SELECT term FROM fg GROUP BY term
  ORDER BY count(*) DESC, term ASC LIMIT {int(n_vertices)}
),
vfg AS (
  SELECT doc_id, term FROM fg JOIN vertices USING (term)
)
SELECT a.term AS term_a, b.term AS term_b, count(*)::BIGINT AS n_docs
FROM vfg a JOIN vfg b ON a.doc_id = b.doc_id AND a.term < b.term
GROUP BY a.term, b.term
ORDER BY n_docs DESC, term_a ASC, term_b ASC
LIMIT {int(n_edges)}
"""


AGG_SAMPLE_SALT = "-agg-sample-v1"


def random_sampler_facets(
    corpus: DataFrame,
    probability: float = 0.25,
    facet: str = "lang",
    lang: str | None = None,
) -> DataFrame:
    """ES ``random_sampler`` aggregation (8.2+): run the inner agg over a
    probabilistic document sample and INFLATE the counts by
    1/probability — the constant-cost way to keep dashboards interactive
    over 10^12 docs. ES samples per shard with a random seed; here the
    sample is the repo's DETERMINISTIC sha-u60 threshold draw (the
    corpus_sample discipline, its own salt) so the result — and the
    oracle — is stable across runs and cluster sizes. Inner agg: facet
    doc counts. Returns (facet, sampled_n, est_n) with
    ``est_n = floor(sampled_n/p + 0.5)`` (half-up, both engines
    integer-exact), ordered (est_n desc, facet asc).

    Scale shape: the hash predicate is map-side (no pre-pass), so the
    facet groupBy touches ~p of the corpus; the inflation is driver
    arithmetic on bucket rows.
    """
    from smse_backend_spark.operators.sampling import TWO60, hash_u60

    if lang is not None:
        corpus = corpus.filter(F.col("lang") == lang)
    thr = int(float(probability) * TWO60)
    sampled = corpus.filter(
        hash_u60(F.col("doc_id"), AGG_SAMPLE_SALT) < thr
    )
    return (
        sampled.groupBy(F.col(facet).alias("facet"))
        .agg(F.count(F.lit(1)).cast("long").alias("sampled_n"))
        .withColumn(
            "est_n",
            F.floor(
                F.col("sampled_n").cast("double") / F.lit(float(probability))
                + F.lit(0.5)
            ).cast("long"),
        )
        .orderBy(F.desc("est_n"), F.asc("facet"))
    )


def random_sampler_facets_sql(
    probability: float = 0.25,
    facet: str = "lang",
    lang: str | None = None,
    table: str = "documents",
) -> str:
    """DuckDB twin of :func:`random_sampler_facets`."""
    from smse_backend_spark.operators.sampling import TWO60, _hash_u60_sql

    thr = int(float(probability) * TWO60)
    h = _hash_u60_sql("doc_id", AGG_SAMPLE_SALT)
    where_lang = f"AND lang = '{lang}'" if lang is not None else ""
    return f"""
SELECT {facet} AS facet,
       count(*)::BIGINT AS sampled_n,
       floor(count(*)::DOUBLE / {float(probability)!r} + 0.5)::BIGINT AS est_n
FROM {table}
WHERE {h} < {thr} {where_lang}
GROUP BY {facet}
ORDER BY est_n DESC, facet ASC
"""


def percolate(
    corpus: DataFrame,
    stored_queries: dict[int, str],
    max_doc_id: int | None = None,
) -> DataFrame:
    """Reverse search (ES percolator, conjunctive semantics): a stored
    query matches a doc iff EVERY query term appears in the doc. Returns
    (doc_id, query_id) pairs, one per match.

    The stored-query table is tiny and broadcasts; the doc side streams
    through one tokenize + join + count — matching cost scales with the
    corpus, not corpus x queries.
    """
    spark = corpus.sparkSession
    qrows = [
        (qid, t)
        for qid, q in sorted(stored_queries.items())
        for t in query_terms(q)
    ]
    if max_doc_id is not None:
        corpus = corpus.filter(F.col("doc_id") < max_doc_id)
    empty = corpus.select(
        "doc_id", F.lit(0).cast("long").alias("query_id")
    ).limit(0)
    if not qrows:  # zero-term queries match nothing (not everything)
        return empty
    qdf = spark.createDataFrame(qrows, "query_id long, term string")
    need = {qid: 0 for qid, _ in qrows}
    for qid, _ in qrows:
        need[qid] += 1
    need_c = F.coalesce(
        *[F.when(F.col("query_id") == q, F.lit(n)) for q, n in need.items()]
    )
    return (
        _doc_terms(corpus)
        .join(F.broadcast(qdf), "term")
        .groupBy("doc_id", "query_id")
        .agg(F.count(F.lit(1)).alias("c"))
        .filter(F.col("c") == need_c)
        .select("doc_id", "query_id")
        .orderBy("doc_id", "query_id")
    )


def percolate_sql(
    stored_queries: dict[int, str],
    max_doc_id: int | None = None,
    table: str = "documents",
    content_col: str = "text",
) -> str:
    """DuckDB twin of :func:`percolate`."""
    qrows = [
        (qid, t)
        for qid, q in sorted(stored_queries.items())
        for t in query_terms(q)
    ]
    if not qrows:
        return f"SELECT doc_id, 0::BIGINT AS query_id FROM {table} WHERE false"
    vals = ", ".join(
        f"({qid}::BIGINT, '" + t.replace("'", "''") + "')" for qid, t in qrows
    )
    where = f"WHERE doc_id < {max_doc_id}" if max_doc_id is not None else ""
    toks = tokenize_duckdb_sql(content_col)
    return f"""
WITH q(query_id, term) AS (VALUES {vals}),
need AS (SELECT query_id, count(*) AS n FROM q GROUP BY query_id),
dl AS (
  SELECT doc_id, {toks} AS toks FROM {table} {where}
),
tok AS (
  SELECT DISTINCT doc_id, unnest(toks) AS term FROM dl
),
hit AS (
  SELECT doc_id, query_id, count(*) AS c
  FROM tok JOIN q USING (term) GROUP BY doc_id, query_id
)
SELECT doc_id, query_id
FROM hit JOIN need USING (query_id)
WHERE c = n
ORDER BY doc_id, query_id
"""


def repo_topk(
    corpus: DataFrame,
    query_text: str,
    k: int = 10,
    score_mode: str = "sum",
    lang: str | None = None,
) -> DataFrame:
    """Parent-level retrieval (ES ``has_child`` query): rank repos by the
    aggregated relevance of their matching docs — ``score_mode`` ``sum``
    or ``max`` — with the matching-doc count. Output
    (repo, n_hits, score) by (score desc, repo asc).

    Scale shape: the match set (doc_id, score) joins a column-pruned
    (doc_id, repo) projection, then one groupBy on repo — document text
    never moves.
    """
    from smse_backend_spark.operators.search import bm25_scored_scan

    scored = bm25_scored_scan(corpus, query_text, lang).select("doc_id", "score")
    if score_mode == "sum":
        agg = F.round(F.sum("score"), 6).alias("score")
    elif score_mode == "max":
        agg = F.round(F.max("score"), 6).alias("score")
    else:
        raise ValueError(f"unknown score_mode {score_mode!r}")
    return (
        scored.join(corpus.select("doc_id", "repo"), "doc_id")
        .groupBy("repo")
        .agg(F.count(F.lit(1)).alias("n_hits"), agg)
        .select("repo", "n_hits", "score")
        .orderBy(F.desc("score"), F.asc("repo"))
        .limit(k)
    )


def repo_topk_sql(
    query_text: str,
    k: int = 10,
    score_mode: str = "sum",
    lang: str | None = None,
    table: str = "documents",
    content_col: str = "text",
) -> str:
    """DuckDB twin of :func:`repo_topk` (corpus ``repo`` = raw ``source``)."""
    from smse_backend_spark.operators.search import _ALL_ROWS, bm25_scan_oracle_sql

    if score_mode not in ("sum", "max"):
        raise ValueError(f"unknown score_mode {score_mode!r}")
    scored = bm25_scan_oracle_sql(query_text, _ALL_ROWS, lang, table, content_col)
    return f"""
WITH scored AS ({scored})
SELECT d.source AS repo, count(*)::BIGINT AS n_hits,
       round({score_mode}(s.score), 6) AS score
FROM scored s JOIN {table} d USING (doc_id)
GROUP BY d.source
ORDER BY score DESC, repo ASC
LIMIT {k}
"""


# --- exact percentile aggregation -------------------------------------------

PCTLS = (0.25, 0.5, 0.9, 0.99)


def value_percentiles(events: DataFrame, group: str = "event_type",
                      col: str = "value") -> DataFrame:
    """(group, n, p25, p50, p90, p99): EXACT linear-interpolation
    percentiles per group (the ES percentiles aggregation, exact flavor).

    Spark's ``percentile`` and DuckDB's ``quantile_cont`` share the
    interpolation definition (rank = (n-1)*p, linear between neighbors),
    so results are bit-identical — verified, no rounding shim needed.
    Exact percentiles need the group's values together (one shuffle on the
    group key, in-partition sort); at 10^12 rows you'd swap in a sketch
    (KLL / t-digest) — the KMV sketch in operators/sampling.py shows the
    mergeable-sketch pattern this would follow.
    """
    aggs = [F.count("*").cast("long").alias("n")] + [
        F.percentile(col, p).alias(f"p{int(p * 100)}") for p in PCTLS
    ]
    return events.groupBy(group).agg(*aggs)


def value_percentiles_sql(group: str = "event_type", col: str = "value",
                          table: str = "events") -> str:
    qs = ", ".join(
        f"quantile_cont({col}, {p}) AS p{int(p * 100)}" for p in PCTLS
    )
    return f"SELECT {group}, count(*)::BIGINT AS n, {qs} FROM {table} GROUP BY {group}"


def _match_set_cte(query_text: str, lang: str | None, table: str,
                   content_col: str) -> str:
    """Shared DuckDB CTE prefix producing ``m(doc_id)`` — the OR match set
    of the analyzed query terms (the SQL twin of
    ``InvertedIndex.match_doc_ids``)."""
    terms = query_terms(query_text)
    in_list = ", ".join("'" + t.replace("'", "''") + "'" for t in terms)
    where_lang = f"WHERE lang = '{lang}'" if lang is not None else ""
    toks = tokenize_duckdb_sql(content_col)
    return f"""
WITH docs AS (
  SELECT doc_id, {toks} AS toks FROM {table} {where_lang}
),
tok AS (
  SELECT doc_id, unnest(toks) AS term FROM docs
),
m AS (
  SELECT DISTINCT doc_id FROM tok WHERE term IN ({in_list})
)"""


def histogram_agg_sql(
    query_text: str,
    interval: int = 64,
    lang: str | None = None,
    table: str = "documents",
    content_col: str = "text",
) -> str:
    """DuckDB twin of ``InvertedIndex.histogram_agg`` over the n_chars
    doc-value (engine stores ``n_chars = length(content)`` at build —
    ``index/build.py`` docvalues)."""
    return f"""{_match_set_cte(query_text, lang, table, content_col)}
SELECT (floor(length(d.{content_col})::DOUBLE / {int(interval)})::BIGINT
        * {int(interval)}) AS bucket,
       count(*)::BIGINT AS n_docs
FROM {table} d JOIN m USING (doc_id)
GROUP BY bucket
ORDER BY bucket ASC
"""


def composite_agg_sql(
    query_text: str,
    interval: int = 64,
    size: int = 10,
    after: tuple[str, int] | None = None,
    lang: str | None = None,
    table: str = "documents",
    content_col: str = "text",
) -> str:
    """DuckDB twin of ``InvertedIndex.composite_agg``: buckets keyed by
    (source, n_chars histogram), after-key filter on the keys, ascending
    key order, one page."""
    bucket = (
        f"(floor(length(d.{content_col})::DOUBLE / {int(interval)})::BIGINT"
        f" * {int(interval)})"
    )
    where_after = ""
    if after is not None:
        a_repo = after[0].replace("'", "''")
        where_after = (
            f"WHERE (d.source > '{a_repo}' OR "
            f"(d.source = '{a_repo}' AND {bucket} > {int(after[1])}))"
        )
    return f"""{_match_set_cte(query_text, lang, table, content_col)}
SELECT d.source AS repo, {bucket} AS bucket, count(*)::BIGINT AS n_docs
FROM {table} d JOIN m USING (doc_id)
{where_after}
GROUP BY repo, bucket
ORDER BY repo ASC, bucket ASC
LIMIT {int(size)}
"""


def terms_stats_agg_sql(
    query_text: str,
    k: int = 10,
    lang: str | None = None,
    table: str = "documents",
    content_col: str = "text",
) -> str:
    """DuckDB twin of ``InvertedIndex.terms_stats_agg`` (source backs the
    ``repo`` doc-value): per-doc scores from the BM25 scan twin, micro-unit
    integer sums, the identical floor-half-up bucket average."""
    from smse_backend_spark.operators.search import bm25_scan_oracle_sql

    scores = bm25_scan_oracle_sql(
        query_text, k=1_000_000_000, lang=lang, table=table,
        content_col=content_col,
    )
    return f"""
WITH s AS ({scores})
SELECT d.source AS repo,
       count(*)::BIGINT AS n_docs,
       max(s.score) AS max_score,
       floor(sum(round(s.score * 1e6)::BIGINT)::DOUBLE
             / count(*)::DOUBLE + 0.5) / 1e6 AS avg_score
FROM s JOIN {table} d USING (doc_id)
GROUP BY repo
ORDER BY avg_score DESC, repo ASC
LIMIT {int(k)}
"""


def stats_agg_sql(
    query_text: str,
    lang: str | None = None,
    table: str = "documents",
    content_col: str = "text",
) -> str:
    """DuckDB twin of ``InvertedIndex.stats_agg`` (n_chars doc-value):
    count/min/max/sum exact integers; avg through the shared half-up
    floor formula, written identically to the Spark side."""
    return f"""{_match_set_cte(query_text, lang, table, content_col)}
SELECT count(*)::BIGINT AS n_docs,
       min(length(d.{content_col}))::BIGINT AS min_v,
       max(length(d.{content_col}))::BIGINT AS max_v,
       sum(length(d.{content_col}))::BIGINT AS sum_v,
       floor((sum(length(d.{content_col}))::DOUBLE
              / count(*)::DOUBLE) * 1e6 + 0.5) / 1e6 AS avg_v
FROM {table} d JOIN m USING (doc_id)
"""


def cardinality_agg_sql(
    query_text: str,
    field: str = "source",
    lang: str | None = None,
    table: str = "documents",
    content_col: str = "text",
) -> str:
    """DuckDB twin of ``InvertedIndex.cardinality_agg`` (the documents
    column backing the stored doc-value — ``source`` backs ``repo``)."""
    return f"""{_match_set_cte(query_text, lang, table, content_col)}
SELECT count(DISTINCT d.{field})::BIGINT AS n_distinct
FROM {table} d JOIN m USING (doc_id)
"""


def search_percentiles_sql(
    query_text: str,
    lang: str | None = None,
    table: str = "documents",
    content_col: str = "text",
    pctls: tuple[float, ...] = (0.25, 0.5, 0.9, 0.99),
) -> str:
    """DuckDB twin of ``InvertedIndex.percentiles_agg`` over the n_chars
    doc-value (``quantile_cont`` == Spark ``percentile`` bit-identically
    on integer inputs)."""
    qs = ", ".join(
        f"quantile_cont(length(d.{content_col}), {p}) AS p{int(p * 100)}"
        for p in pctls
    )
    return f"""{_match_set_cte(query_text, lang, table, content_col)}
SELECT count(*)::BIGINT AS n_docs, {qs}
FROM {table} d JOIN m USING (doc_id)
"""

def global_agg_sql(
    query_text: str,
    lang: str | None = None,
    table: str = "documents",
    content_col: str = "text",
) -> str:
    """DuckDB twin of ``InvertedIndex.global_agg`` (n_chars doc-value):
    query-scoped and whole-corpus doc count + avg side by side, both
    avgs through the shared half-up floor formula."""
    return f"""{_match_set_cte(query_text, lang, table, content_col)},
q AS (
  SELECT count(*)::BIGINT AS q_docs,
         sum(length(d.{content_col}))::BIGINT AS q_sum
  FROM {table} d JOIN m USING (doc_id)
),
g AS (
  SELECT count(*)::BIGINT AS all_docs,
         sum(length({content_col}))::BIGINT AS all_sum
  FROM {table}
)
SELECT q_docs,
       floor((q_sum::DOUBLE / q_docs::DOUBLE) * 1e6 + 0.5) / 1e6 AS q_avg,
       all_docs,
       floor((all_sum::DOUBLE / all_docs::DOUBLE) * 1e6 + 0.5) / 1e6
         AS all_avg
FROM q CROSS JOIN g
"""


def range_agg_sql(
    query_text: str,
    bounds: tuple[int, ...] = (200, 350),
    lang: str | None = None,
    table: str = "documents",
    content_col: str = "text",
) -> str:
    """DuckDB twin of ``InvertedIndex.range_agg`` over the n_chars
    doc-value: same when-chain bucket assignment (from inclusive, to
    exclusive), same emit-empty-buckets left join."""
    bs = sorted(int(b) for b in bounds)
    v = f"length(d.{content_col})"
    case = "CASE "
    for i, b in enumerate(bs):
        case += f"WHEN {v} < {b} THEN {i} "
    case += f"ELSE {len(bs)} END"
    edges = ", ".join(
        f"({i}, {bs[i - 1] if i > 0 else 'NULL'}, "
        f"{bs[i] if i < len(bs) else 'NULL'})"
        for i in range(len(bs) + 1)
    )
    return f"""{_match_set_cte(query_text, lang, table, content_col)},
got AS (
  SELECT ({case})::BIGINT AS bucket,
         count(*)::BIGINT AS n_docs,
         sum({v})::BIGINT AS sum_v
  FROM {table} d JOIN m USING (doc_id)
  GROUP BY 1
),
ranges(bucket, lo, hi) AS (VALUES {edges})
SELECT r.bucket::BIGINT AS bucket, r.lo::BIGINT AS lo, r.hi::BIGINT AS hi,
       coalesce(got.n_docs, 0)::BIGINT AS n_docs,
       CASE WHEN got.n_docs IS NOT NULL THEN
         floor((got.sum_v::DOUBLE / got.n_docs::DOUBLE) * 1e6 + 0.5) / 1e6
       END AS avg_v
FROM ranges r LEFT JOIN got ON r.bucket = got.bucket
ORDER BY r.bucket
"""


def vw_histogram_agg_sql(
    query_text: str,
    buckets: int = 4,
    lang: str | None = None,
    table: str = "documents",
    content_col: str = "text",
) -> str:
    """DuckDB twin of ``InvertedIndex.vw_histogram_agg``: NTILE over the
    identical total order (value asc, doc_id asc) — SQL NTILE's
    first-buckets-get-the-remainder split is the same in Spark and
    DuckDB, so the equal-frequency buckets agree exactly."""
    v = f"length(d.{content_col})"
    return f"""{_match_set_cte(query_text, lang, table, content_col)},
tiled AS (
  SELECT d.doc_id, {v} AS val,
         ntile({int(buckets)}) OVER (ORDER BY {v} ASC, d.doc_id ASC)
           AS bucket
  FROM {table} d JOIN m USING (doc_id)
)
SELECT bucket::BIGINT AS bucket,
       count(*)::BIGINT AS n_docs,
       min(val)::BIGINT AS min_v,
       max(val)::BIGINT AS max_v,
       floor((sum(val)::DOUBLE / count(*)::DOUBLE) * 1e6 + 0.5) / 1e6
         AS avg_v
FROM tiled
GROUP BY bucket
ORDER BY bucket
"""


def extended_stats_agg_sql(
    query_text: str,
    lang: str | None = None,
    table: str = "documents",
    content_col: str = "text",
) -> str:
    """DuckDB twin of ``InvertedIndex.extended_stats_agg`` (n_chars
    doc-value backed by length(text)): integer count/min/max/sum/sum_sq;
    avg/variance/std derived through the identically-parenthesized
    expression (ss/n - (s/n)*(s/n), clamped at 0) and the shared 6dp
    floor."""
    v = f"length(d.{content_col})"
    var = ("a.sum_sq::DOUBLE / a.n_docs::DOUBLE - "
           "(a.sum_v::DOUBLE / a.n_docs::DOUBLE) * "
           "(a.sum_v::DOUBLE / a.n_docs::DOUBLE)")
    return f"""{_match_set_cte(query_text, lang, table, content_col)},
a AS (
  SELECT count(*)::BIGINT AS n_docs,
         min({v})::BIGINT AS min_v,
         max({v})::BIGINT AS max_v,
         sum({v})::BIGINT AS sum_v,
         sum({v}::BIGINT * {v}::BIGINT)::BIGINT AS sum_sq
  FROM {table} d JOIN m USING (doc_id)
)
SELECT a.n_docs, a.min_v, a.max_v, a.sum_v, a.sum_sq,
       floor(a.sum_v::DOUBLE / a.n_docs::DOUBLE * 1e6 + 0.5) / 1e6 AS avg_v,
       floor(greatest({var}, 0.0) * 1e6 + 0.5) / 1e6 AS variance,
       floor(sqrt(greatest({var}, 0.0)) * 1e6 + 0.5) / 1e6 AS std_dev
FROM a
"""


def weighted_avg_agg_sql(
    query_text: str,
    lang: str | None = None,
    table: str = "documents",
    content_col: str = "text",
) -> str:
    """DuckDB twin of ``InvertedIndex.weighted_avg_agg``: per-doc scores
    from the BM25 scan twin converted to exact integer micro-units, both
    sums integer, one final ratio through the shared floor formula."""
    from smse_backend_spark.operators.search import bm25_scan_oracle_sql

    scores = bm25_scan_oracle_sql(
        query_text, k=1_000_000_000, lang=lang, table=table,
        content_col=content_col,
    )
    return f"""
WITH s AS ({scores})
SELECT count(*)::BIGINT AS n_docs,
       floor(sum(round(s.score * 1e6)::BIGINT
                 * length(d.{content_col})::BIGINT)::DOUBLE
             / sum(round(s.score * 1e6)::BIGINT)::DOUBLE
             * 1e6 + 0.5) / 1e6 AS weighted_avg
FROM s JOIN {table} d USING (doc_id)
"""


def top_metrics_agg_sql(
    query_text: str,
    k: int = 10,
    lang: str | None = None,
    table: str = "documents",
    content_col: str = "text",
) -> str:
    """DuckDB twin of ``InvertedIndex.top_metrics_agg`` (bucket = source
    backing the ``repo`` doc-value, metric = length(text) backing
    ``n_chars``): per-bucket top doc under (score desc, doc_id asc),
    buckets ranked (top_score desc, bucket asc)."""
    from smse_backend_spark.operators.search import bm25_scan_oracle_sql

    scores = bm25_scan_oracle_sql(
        query_text, k=1_000_000_000, lang=lang, table=table,
        content_col=content_col,
    )
    return f"""
WITH s AS ({scores}),
r AS (
  SELECT d.source AS repo, s.score, s.doc_id,
         length(d.{content_col})::BIGINT AS metric,
         row_number() OVER (
           PARTITION BY d.source ORDER BY s.score DESC, s.doc_id ASC
         ) AS rn
  FROM s JOIN {table} d USING (doc_id)
)
SELECT repo, score AS top_score, doc_id AS top_doc, metric
FROM r WHERE rn = 1
ORDER BY top_score DESC, repo ASC
LIMIT {int(k)}
"""


def string_stats_agg_sql(
    query_text: str,
    lang: str | None = None,
    table: str = "documents",
    content_col: str = "text",
) -> str:
    """DuckDB twin of ``InvertedIndex.string_stats_agg`` over the source
    column backing the ``repo`` doc-value: integer char counts, each
    -p*log2(p) term as ln/ln2 with the SAME ln(2) literal, quantized to
    1e-12 integer units per char and integer-summed (the bigram_pmi
    ln-parity precedent), final values through the shared 6dp floor."""
    ln2 = "0.6931471805599453"
    return f"""{_match_set_cte(query_text, lang, table, content_col)},
v AS (
  SELECT d.source AS s FROM {table} d JOIN m USING (doc_id)
),
base AS (
  SELECT count(*)::BIGINT AS cnt,
         min(length(s))::BIGINT AS min_length,
         max(length(s))::BIGINT AS max_length,
         sum(length(s))::BIGINT AS len_sum
  FROM v
),
ch AS (
  SELECT unnest(string_split(s, '')) AS ch FROM v
),
dist AS (
  SELECT ch, count(*)::BIGINT AS c FROM ch WHERE ch <> '' GROUP BY ch
),
tot AS (SELECT sum(c)::BIGINT AS total FROM dist),
q AS (
  SELECT floor(-(c::DOUBLE / total::DOUBLE
                 * ln(c::DOUBLE / total::DOUBLE))
               / {ln2} * 1e12 + 0.5)::BIGINT AS q
  FROM dist CROSS JOIN tot
),
ent AS (
  SELECT floor(sum(q)::DOUBLE / 1e12 * 1e6 + 0.5) / 1e6 AS entropy FROM q
)
SELECT base.cnt, base.min_length, base.max_length,
       floor(base.len_sum::DOUBLE / base.cnt::DOUBLE * 1e6 + 0.5) / 1e6
         AS avg_length,
       ent.entropy
FROM base CROSS JOIN ent
"""


def mad_agg_sql(
    query_text: str,
    lang: str | None = None,
    table: str = "documents",
    content_col: str = "text",
) -> str:
    """DuckDB twin of ``InvertedIndex.mad_agg`` (n_chars backed by
    length(text)): quantile_cont twice, the abs-deviation median over
    the same interpolated median."""
    v = f"length(d.{content_col})::DOUBLE"
    return f"""{_match_set_cte(query_text, lang, table, content_col)},
x AS (
  SELECT {v} AS x FROM {table} d JOIN m USING (doc_id)
),
med AS (
  SELECT count(*)::BIGINT AS n_docs, quantile_cont(x, 0.5) AS median FROM x
)
SELECT med.n_docs, med.median,
       quantile_cont(abs(x.x - med.median), 0.5) AS mad
FROM x CROSS JOIN med
GROUP BY med.n_docs, med.median
"""


def boxplot_agg_sql(
    query_text: str,
    lang: str | None = None,
    table: str = "documents",
    content_col: str = "text",
) -> str:
    """DuckDB twin of ``InvertedIndex.boxplot_agg``."""
    v = f"length(d.{content_col})"
    return f"""{_match_set_cte(query_text, lang, table, content_col)}
SELECT count(*)::BIGINT AS n_docs,
       min({v})::BIGINT AS min_v,
       max({v})::BIGINT AS max_v,
       quantile_cont({v}::DOUBLE, 0.25) AS q1,
       quantile_cont({v}::DOUBLE, 0.5) AS q2,
       quantile_cont({v}::DOUBLE, 0.75) AS q3
FROM {table} d JOIN m USING (doc_id)
"""


def t_test_agg_sql(
    query_text: str,
    split: str = "src3",
    lang: str | None = None,
    table: str = "documents",
    content_col: str = "text",
) -> str:
    """DuckDB twin of ``InvertedIndex.t_test_agg`` (repo backed by
    source, n_chars by length(text)): Welch t from exact integer sums
    through the identical expression chain."""
    v = f"length(d.{content_col})"
    esc = split.replace("'", "''")
    return f"""{_match_set_cte(query_text, lang, table, content_col)},
a AS (
  SELECT sum(CASE WHEN d.source < '{esc}' THEN 1 ELSE 0 END)::BIGINT AS n_a,
         sum(CASE WHEN d.source >= '{esc}' THEN 1 ELSE 0 END)::BIGINT AS n_b,
         sum(CASE WHEN d.source < '{esc}' THEN {v} ELSE 0 END)::BIGINT AS s_a,
         sum(CASE WHEN d.source >= '{esc}' THEN {v} ELSE 0 END)::BIGINT AS s_b,
         sum(CASE WHEN d.source < '{esc}' THEN {v}::BIGINT * {v}::BIGINT
             ELSE 0 END)::BIGINT AS ss_a,
         sum(CASE WHEN d.source >= '{esc}' THEN {v}::BIGINT * {v}::BIGINT
             ELSE 0 END)::BIGINT AS ss_b
  FROM {table} d JOIN m USING (doc_id)
)
SELECT n_a, n_b,
       floor(s_a::DOUBLE / n_a::DOUBLE * 1e6 + 0.5) / 1e6 AS mean_a,
       floor(s_b::DOUBLE / n_b::DOUBLE * 1e6 + 0.5) / 1e6 AS mean_b,
       floor((s_a::DOUBLE / n_a::DOUBLE - s_b::DOUBLE / n_b::DOUBLE)
             / sqrt(((ss_a::DOUBLE - s_a::DOUBLE * s_a::DOUBLE / n_a::DOUBLE)
                     / (n_a::DOUBLE - 1.0)) / n_a::DOUBLE
                    + ((ss_b::DOUBLE - s_b::DOUBLE * s_b::DOUBLE / n_b::DOUBLE)
                       / (n_b::DOUBLE - 1.0)) / n_b::DOUBLE)
             * 1e6 + 0.5) / 1e6 AS t
FROM a
"""


def filters_agg_sql(
    query_text: str,
    lang: str | None = None,
    table: str = "documents",
    content_col: str = "text",
) -> str:
    """DuckDB twin of ``InvertedIndex.filters_agg`` (n_chars backed by
    length(text)): the same named predicates as one conditional
    aggregation, unpivoted via UNION ALL."""
    from smse_backend_spark.index.query import InvertedIndex

    v = f"length(d.{content_col})"
    selects = []
    for key, lo, hi in InvertedIndex.FILTERS_BUCKETS:
        conds = []
        if lo is not None:
            conds.append(f"{v} >= {int(lo)}")
        if hi is not None:
            conds.append(f"{v} < {int(hi)}")
        cond = " AND ".join(conds) if conds else "TRUE"
        selects.append(
            f"SELECT '{key}' AS key, "
            f"sum(CASE WHEN {cond} THEN 1 ELSE 0 END)::BIGINT AS n_docs\n"
            f"FROM {table} d JOIN m USING (doc_id)"
        )
    body = "\nUNION ALL\n".join(selects)
    return f"""{_match_set_cte(query_text, lang, table, content_col)}
SELECT * FROM (
{body}
) ORDER BY key
"""


def diversified_sample_facets(
    corpus: DataFrame,
    query_text: str,
    dedup_field: str = "repo",
    shard_size: int = 3,
    facet: str = "lang",
    lang: str | None = None,
) -> DataFrame:
    """ES ``diversified_sampler`` aggregation: cap the scored match set to
    the best ``shard_size`` hits PER ``dedup_field`` value (score desc,
    doc_id asc — the de-duplication that stops one dominant repo from
    swamping a downstream agg), then run the sub-aggregation (a ``facet``
    terms count) over the diversified sample. Returns
    (``facet``, n) ordered (n desc, value asc).

    Scale shape: the per-key cap is a bounded window over (doc_id, score,
    key) — the match set, never the corpus text; the sub-agg input is
    <= shard_size x |keys| rows by construction, so everything after the
    cap is metadata-sized regardless of corpus size.
    """
    from pyspark.sql import Window

    from smse_backend_spark.operators.search import bm25_scored_scan

    scored = bm25_scored_scan(corpus, query_text, lang).select("doc_id", "score")
    attrs = corpus.select("doc_id", dedup_field, facet)
    w = Window.partitionBy(dedup_field).orderBy(
        F.desc("score"), F.asc("doc_id")
    )
    sample = (
        scored.join(attrs, "doc_id")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= int(shard_size))
    )
    return (
        sample.groupBy(facet)
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .orderBy(F.desc("n"), F.asc(facet))
    )


def diversified_sample_facets_sql(
    query_text: str,
    dedup_field: str = "source",
    shard_size: int = 3,
    facet: str = "lang",
    lang: str | None = None,
    table: str = "documents",
    content_col: str = "text",
) -> str:
    """DuckDB twin of :func:`diversified_sample_facets` (``dedup_field``
    in the raw table's column names — ``source`` is the corpus ``repo``)."""
    from smse_backend_spark.operators.search import _ALL_ROWS, bm25_scan_oracle_sql

    scored = bm25_scan_oracle_sql(query_text, _ALL_ROWS, lang, table, content_col)
    return f"""
WITH scored AS ({scored}),
ranked AS (
  SELECT d.{facet} AS fv,
         row_number() OVER (PARTITION BY d.{dedup_field}
                            ORDER BY s.score DESC, s.doc_id ASC) AS rn
  FROM scored s JOIN {table} d USING (doc_id)
)
SELECT fv AS {facet}, count(*)::BIGINT AS n
FROM ranked WHERE rn <= {int(shard_size)}
GROUP BY fv
ORDER BY n DESC, {facet} ASC
"""


def sampler_facets(
    corpus: DataFrame,
    query_text: str,
    shard_size: int = 100,
    facet: str = "lang",
    lang: str | None = None,
) -> DataFrame:
    """ES ``sampler`` aggregation (the best-docs sibling of
    ``random_sampler`` and ``diversified_sampler``): restrict the
    sub-aggregation to the ``shard_size`` HIGHEST-SCORING matches of the
    query, then run the inner agg (a ``facet`` terms count) over that
    elite sample — ES's way to focus significant-terms / facet math on
    high-relevance docs only. ES caps per shard; here the cap is the
    GLOBAL deterministic top (score desc, doc_id asc — the repo's total
    order), so the result is identical at any partitioning/cluster size
    and exactly replayable in SQL. Returns (``facet``, n) ordered
    (n desc, value asc).

    Scale shape: the cap is a ``TakeOrderedAndProject`` over the scored
    match set (never the corpus text); everything after it operates on
    <= ``shard_size`` rows — driver-sized regardless of corpus scale.
    """
    from smse_backend_spark.operators.search import bm25_scored_scan

    scored = bm25_scored_scan(corpus, query_text, lang).select(
        "doc_id", "score"
    )
    sample = scored.orderBy(F.desc("score"), F.asc("doc_id")).limit(
        int(shard_size)
    )
    attrs = corpus.select("doc_id", facet)
    return (
        sample.join(attrs, "doc_id")
        .groupBy(facet)
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .orderBy(F.desc("n"), F.asc(facet))
    )


def sampler_facets_sql(
    query_text: str,
    shard_size: int = 100,
    facet: str = "lang",
    lang: str | None = None,
    table: str = "documents",
    content_col: str = "text",
) -> str:
    """DuckDB twin of :func:`sampler_facets`."""
    from smse_backend_spark.operators.search import bm25_scan_oracle_sql

    scored = bm25_scan_oracle_sql(
        query_text, int(shard_size), lang, table, content_col
    )
    return f"""
WITH sample AS ({scored})
SELECT d.{facet} AS {facet}, count(*)::BIGINT AS n
FROM sample s JOIN {table} d USING (doc_id)
GROUP BY d.{facet}
ORDER BY n DESC, {facet} ASC
"""


def rare_terms(
    corpus: DataFrame,
    max_doc_frac: float = 0.05,
    k: int = 30,
    lang: str | None = None,
) -> DataFrame:
    """ES ``rare_terms`` aggregation: the LONG-TAIL complement of the terms
    agg — vocabulary terms whose document frequency is at most
    ``ceil(max_doc_frac * N)`` docs, ordered (df asc, term asc), capped.
    The signal behind typo mining, index-bloat audits and stop-criteria
    for fuzzy expansion. ES's knob is an absolute ``max_doc_count``; the
    contract form is corpus-relative so "rare" means the same thing at
    every scale factor (pass the absolute count as ``max_doc_frac = c/N``
    when needed).

    Scale shape: one distinct-(doc, term) aggregation (the index build's
    shuffle unit) then a df filter — the output is vocabulary-bounded.
    On a built index this is a DICTIONARY-ONLY read
    (:meth:`InvertedIndex.rare_terms`): no postings, no corpus.
    """
    import math

    if lang is not None:
        corpus = corpus.filter(F.col("lang") == lang)
    cut = int(math.ceil(float(max_doc_frac) * corpus.count()))
    return (
        _doc_terms(corpus)
        .groupBy("term")
        .agg(F.count(F.lit(1)).cast("long").alias("df"))
        .filter(F.col("df") <= cut)
        .orderBy(F.asc("df"), F.asc("term"))
        .limit(k)
    )


def rare_terms_sql(
    max_doc_frac: float = 0.05,
    k: int = 30,
    lang: str | None = None,
    table: str = "documents",
    content_col: str = "text",
) -> str:
    """DuckDB twin of :func:`rare_terms` (same ceil(frac*N) cutoff)."""
    where_lang = f"WHERE lang = '{lang}'" if lang is not None else ""
    toks = tokenize_duckdb_sql(content_col)
    return f"""
WITH docs AS (
  SELECT doc_id, {toks} AS toks FROM {table} {where_lang}
),
cut AS (SELECT ceil({float(max_doc_frac)!r} * count(*))::BIGINT AS c FROM docs),
tok AS (
  SELECT DISTINCT doc_id, unnest(toks) AS term FROM docs
)
SELECT term, count(*)::BIGINT AS df
FROM tok GROUP BY term
HAVING count(*) <= (SELECT c FROM cut)
ORDER BY df ASC, term ASC
LIMIT {k}
"""


def _match_flag_col(terms: list[str]):
    """Boolean Column: doc's token array overlaps the analyzed terms."""
    return F.arrays_overlap(
        tokenize_col("content"), F.array(*[F.lit(t) for t in terms])
    )


def multi_terms(
    corpus: DataFrame,
    query_text: str,
    fields: tuple[str, str] = ("lang", "repo"),
    k: int = 10,
) -> DataFrame:
    """ES ``multi_terms`` aggregation: buckets keyed by a COMPOUND key
    (here two doc-values) over the query's OR match set, ordered by
    doc_count desc then key asc, top-k. The compound-key twin of the
    plain terms agg — what "facet by (lang, repo) pairs" actually needs
    (a nested terms agg would rank each level independently).

    Scale shape: the match flag is per-row Column algebra on the scan
    (no explode); the groupBy shuffles only (key fields, 1) pairs with
    map-side partial counts; top-k is a ``TakeOrderedAndProject``.
    """
    terms = query_terms(query_text)
    if not terms:
        return corpus.select(
            *[F.col(f) for f in fields],
            F.lit(0).cast("long").alias("n_docs"),
        ).limit(0)
    return (
        corpus.filter(_match_flag_col(terms))
        .groupBy(*fields)
        .agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
        .orderBy(F.desc("n_docs"), *[F.asc(f) for f in fields])
        .limit(k)
    )


def multi_terms_sql(
    query_text: str,
    fields: tuple[str, str] = ("lang", "source"),
    out_fields: tuple[str, str] = ("lang", "repo"),
    k: int = 10,
    lang: str | None = None,
    table: str = "documents",
    content_col: str = "text",
) -> str:
    """DuckDB twin of :func:`multi_terms` (raw-table column names in
    ``fields``, engine names in ``out_fields``)."""
    sel = ", ".join(
        f"d.{f} AS {o}" for f, o in zip(fields, out_fields)
    )
    order = ", ".join(f"{o} ASC" for o in out_fields)
    return f"""{_match_set_cte(query_text, lang, table, content_col)}
SELECT {sel}, count(*)::BIGINT AS n_docs
FROM {table} d JOIN m USING (doc_id)
GROUP BY {", ".join(out_fields)}
ORDER BY n_docs DESC, {order}
LIMIT {int(k)}
"""


def adjacency_matrix(
    corpus: DataFrame,
    filters: dict[str, str],
    lang: str | None = None,
) -> DataFrame:
    """ES ``adjacency_matrix`` aggregation: named term filters; one bucket
    per filter and per pairwise intersection (key ``a&b`` with names in
    ascending order, exactly ES's key format), zero-count buckets dropped,
    ordered by key. The co-occurrence matrix behind "users who matched A
    also matched B" dashboards.

    Scale shape: ONE corpus scan computes every filter's boolean as
    Column algebra; a single aggregate row sums all |F| + C(|F|,2)
    indicator products (map-side partials, one row crosses the wire);
    the bucket rows are unpivoted from that row driver-free via
    ``stack``. Nothing corpus-sized shuffles.
    """
    names = sorted(filters)
    if lang is not None:
        corpus = corpus.filter(F.col("lang") == lang)
    flags = corpus.select(
        *[
            _match_flag_col(query_terms(filters[nm]))
            .cast("long")
            .alias(f"f_{i}")
            for i, nm in enumerate(names)
        ]
    )
    aggs = []
    keys = []
    for i, nm in enumerate(names):
        aggs.append(F.sum(F.col(f"f_{i}")).alias(f"c{len(keys)}"))
        keys.append(nm)
    for i in range(len(names)):
        for j in range(i + 1, len(names)):
            aggs.append(
                F.sum(F.col(f"f_{i}") * F.col(f"f_{j}")).alias(f"c{len(keys)}")
            )
            keys.append(f"{names[i]}&{names[j]}")
    row = flags.agg(*aggs)
    stack_args = ", ".join(
        f"'{k}', c{i}" for i, k in enumerate(keys)
    )
    return (
        row.selectExpr(
            f"stack({len(keys)}, {stack_args}) AS (key, doc_count)"
        )
        .filter(F.col("doc_count") > 0)
        .select("key", F.col("doc_count").cast("long").alias("doc_count"))
        .orderBy(F.asc("key"))
    )


def adjacency_matrix_sql(
    filters: dict[str, str],
    lang: str | None = None,
    table: str = "documents",
    content_col: str = "text",
) -> str:
    """DuckDB twin of :func:`adjacency_matrix` — same one-row aggregate,
    same key naming, unpivoted via UNION ALL."""
    names = sorted(filters)
    where_lang = f"WHERE lang = '{lang}'" if lang is not None else ""
    toks = tokenize_duckdb_sql(content_col)

    def _overlap(q: str) -> str:
        in_list = ", ".join(
            "'" + t.replace("'", "''") + "'" for t in query_terms(q)
        )
        return f"(len(list_filter(toks, x -> x IN ({in_list}))) > 0)::BIGINT"

    flag_cols = ",\n         ".join(
        f"{_overlap(filters[nm])} AS f_{i}" for i, nm in enumerate(names)
    )
    sums = []
    keys = []
    for i, nm in enumerate(names):
        sums.append(f"sum(f_{i})::BIGINT AS c{len(keys)}")
        keys.append(nm)
    for i in range(len(names)):
        for j in range(i + 1, len(names)):
            sums.append(f"sum(f_{i} * f_{j})::BIGINT AS c{len(keys)}")
            keys.append(f"{names[i]}&{names[j]}")
    unpivot = "\nUNION ALL\n".join(
        f"SELECT '{k}' AS key, c{i} AS doc_count FROM agg"
        for i, k in enumerate(keys)
    )
    return f"""
WITH docs AS (
  SELECT {toks} AS toks FROM {table} {where_lang}
),
flags AS (
  SELECT {flag_cols} FROM docs
),
agg AS (
  SELECT {", ".join(sums)} FROM flags
)
SELECT key, doc_count FROM ({unpivot})
WHERE doc_count > 0
ORDER BY key ASC
"""


def matrix_stats(
    corpus: DataFrame,
    query_text: str,
    lang: str | None = None,
) -> DataFrame:
    """ES ``matrix_stats`` aggregation over two numeric doc-values —
    here x = n_chars (stored length) and y = token count — computed on
    the query's OR match set: count, means, population variances,
    covariance and Pearson correlation.

    Determinism: the five moment sums (Σx, Σy, Σx², Σy², Σxy) are EXACT
    integer aggregates; every derived stat is the identical double
    formula over those integers on both engines, then 6 dp rounded. On a
    real 10^12-row cluster the squared sums need a 128-bit accumulator
    (Spark: sum of DECIMAL(38,0)) — at contract scales int64 has > 6
    orders of headroom, so the cheaper long sum is used.

    Scale shape: per-row flag + two int columns on the scan, one
    aggregate row out — map-side partials, constant network traffic.
    """
    terms = query_terms(query_text)
    if lang is not None:
        corpus = corpus.filter(F.col("lang") == lang)
    x = F.length(F.col("content")).cast("long")
    y = doc_len_col("content").cast("long")
    m = corpus.filter(_match_flag_col(terms)).select(
        x.alias("x"), y.alias("y")
    )
    row = m.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
    )
    n = F.col("n").cast("double")
    sx, sy = F.col("sx").cast("double"), F.col("sy").cast("double")
    sxx, syy = F.col("sxx").cast("double"), F.col("syy").cast("double")
    sxy = F.col("sxy").cast("double")
    var_x = (sxx - sx * sx / n) / n
    var_y = (syy - sy * sy / n) / n
    cov = (sxy - sx * sy / n) / n
    r6 = lambda c: F.round(c, 6)  # noqa: E731
    return row.select(
        F.col("n"),
        r6(sx / n).alias("mean_x"),
        r6(sy / n).alias("mean_y"),
        r6(var_x).alias("var_x"),
        r6(var_y).alias("var_y"),
        r6(cov).alias("cov_xy"),
        r6(cov / F.sqrt(var_x * var_y)).alias("corr_xy"),
    )


def matrix_stats_sql(
    query_text: str,
    lang: str | None = None,
    table: str = "documents",
    content_col: str = "text",
) -> str:
    """DuckDB twin of :func:`matrix_stats` — identical integer moment
    sums and double formulas."""
    return f"""{_match_set_cte(query_text, lang, table, content_col)},
xy AS (
  SELECT length(d.{content_col})::BIGINT AS x,
         len({tokenize_duckdb_sql("d." + content_col)})::BIGINT AS y
  FROM {table} d JOIN m USING (doc_id)
),
agg AS (
  SELECT count(*)::BIGINT AS n,
         sum(x)::BIGINT AS sx, sum(y)::BIGINT AS sy,
         sum(x * x)::BIGINT AS sxx, sum(y * y)::BIGINT AS syy,
         sum(x * y)::BIGINT AS sxy
  FROM xy
)
SELECT n,
       round(sx::DOUBLE / n, 6) AS mean_x,
       round(sy::DOUBLE / n, 6) AS mean_y,
       round((sxx::DOUBLE - sx::DOUBLE * sx::DOUBLE / n) / n, 6) AS var_x,
       round((syy::DOUBLE - sy::DOUBLE * sy::DOUBLE / n) / n, 6) AS var_y,
       round((sxy::DOUBLE - sx::DOUBLE * sy::DOUBLE / n) / n, 6) AS cov_xy,
       round(((sxy::DOUBLE - sx::DOUBLE * sy::DOUBLE / n) / n)
             / sqrt(((sxx::DOUBLE - sx::DOUBLE * sx::DOUBLE / n) / n)
                    * ((syy::DOUBLE - sy::DOUBLE * sy::DOUBLE / n) / n)),
             6) AS corr_xy
FROM agg
"""


def significant_text(
    corpus: DataFrame,
    query_text: str,
    sample_size: int = 50,
    k: int = 20,
    lang: str | None = None,
) -> DataFrame:
    """ES ``significant_text`` aggregation: JLH-scored terms where the
    FOREGROUND is the top-``sample_size`` hits by BM25 (ES runs it under
    a ``sampler`` agg and re-tokenizes _source text on the fly), not the
    whole match set — the "what words characterize the BEST results"
    variant that stays cheap when a query matches half the corpus.
    Same output shape and JLH expression as :func:`significant_terms`.

    Scale shape: the sample cut is a TakeOrderedAndProject over the
    scored match set (sample_size rows broadcast back); only the sampled
    docs' tokens feed the foreground df agg; the background df agg is the
    same vocabulary-bounded aggregate the index build pays.
    """
    from smse_backend_spark.operators.search import bm25_scored_scan

    qterms = query_terms(query_text)
    if lang is not None:
        corpus = corpus.filter(F.col("lang") == lang)
    empty = corpus.select(
        F.lit("").alias("term"), F.lit(0).cast("long").alias("fg_df"),
        F.lit(0).cast("long").alias("bg_df"), F.lit(0.0).alias("score"),
    ).limit(0)
    if not qterms:
        return empty
    sample = (
        bm25_scored_scan(corpus, query_text)
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(int(sample_size))
        .select("doc_id")
    )
    fg_n = sample.count()
    bg_n = corpus.count()
    if not fg_n:
        return empty
    toks = _doc_terms(corpus)
    fg = toks.join(F.broadcast(sample), "doc_id").groupBy("term").agg(
        F.count(F.lit(1)).alias("fg_df")
    )
    bg = toks.groupBy("term").agg(F.count(F.lit(1)).alias("bg_df"))
    fg_pct = F.col("fg_df").cast("double") / F.lit(float(fg_n))
    bg_pct = F.col("bg_df").cast("double") / F.lit(float(bg_n))
    return (
        fg.join(bg, "term")
        .withColumn("score", F.round((fg_pct - bg_pct) * (fg_pct / bg_pct), 6))
        .select("term", "fg_df", "bg_df", "score")
        .orderBy(F.desc("score"), F.asc("term"))
        .limit(k)
    )


def significant_text_sql(
    query_text: str,
    sample_size: int = 50,
    k: int = 20,
    lang: str | None = None,
    table: str = "documents",
    content_col: str = "text",
) -> str:
    """DuckDB twin of :func:`significant_text` (same top-N sample cut,
    same JLH expression and parenthesization)."""
    from smse_backend_spark.operators.search import (
        _ALL_ROWS,
        bm25_scan_oracle_sql,
    )

    scored = bm25_scan_oracle_sql(
        query_text, _ALL_ROWS, lang, table, content_col
    )
    where_lang = f"WHERE lang = '{lang}'" if lang is not None else ""
    toks = tokenize_duckdb_sql(content_col)
    return f"""
WITH dl AS (
  SELECT doc_id, {toks} AS toks FROM {table} {where_lang}
),
tok AS (
  SELECT DISTINCT doc_id, unnest(toks) AS term FROM dl
),
scored AS ({scored}),
m AS (
  SELECT doc_id FROM scored
  ORDER BY score DESC, doc_id ASC
  LIMIT {int(sample_size)}
),
nn AS (
  SELECT (SELECT count(*) FROM m)::DOUBLE AS fg_n,
         (SELECT count(*) FROM dl)::DOUBLE AS bg_n
),
fg AS (
  SELECT term, count(*)::BIGINT AS fg_df
  FROM tok JOIN m USING (doc_id) GROUP BY term
),
bg AS (
  SELECT term, count(*)::BIGINT AS bg_df FROM tok GROUP BY term
)
SELECT term, fg_df, bg_df,
       round(((fg_df::DOUBLE / nn.fg_n) - (bg_df::DOUBLE / nn.bg_n))
             * ((fg_df::DOUBLE / nn.fg_n) / (bg_df::DOUBLE / nn.bg_n)), 6)
         AS score
FROM fg JOIN bg USING (term) CROSS JOIN nn
ORDER BY score DESC, term ASC
LIMIT {int(k)}
"""


def percentile_ranks(
    corpus: DataFrame,
    query_text: str,
    values: tuple[int, ...] = (100, 300),
    lang: str | None = None,
) -> DataFrame:
    """ES ``percentile_ranks`` aggregation — the inverse of percentiles:
    for each given value, what PERCENT of the match set's doc-values
    (n_chars) sit at or below it. The "how does a 300-char doc compare"
    question. Returns (value, pct) ordered by value; pct = 100 * count(x
    <= v) / n through the shared half-up floor formula (exact integer
    counts, one double division).

    Scale shape: one aggregate row of |values| conditional integer counts
    — map-side partials, constant traffic.
    """
    terms = query_terms(query_text)
    if lang is not None:
        corpus = corpus.filter(F.col("lang") == lang)
    x = F.length(F.col("content")).cast("long")
    m = corpus.filter(_match_flag_col(terms)).select(x.alias("x"))
    row = m.agg(
        F.count(F.lit(1)).alias("n"),
        *[
            F.sum((F.col("x") <= F.lit(int(v))).cast("long")).alias(f"c{i}")
            for i, v in enumerate(values)
        ],
    )
    pct = lambda c: (  # noqa: E731
        F.floor(
            (F.lit(100.0) * c.cast("double") / F.col("n").cast("double"))
            * F.lit(1e6) + F.lit(0.5)
        ) / F.lit(1e6)
    )
    stacked = ", ".join(
        f"{int(v)}L, p{i}" for i, v in enumerate(values)
    )
    return (
        row.select(
            *[pct(F.col(f"c{i}")).alias(f"p{i}") for i in range(len(values))]
        )
        .selectExpr(f"stack({len(values)}, {stacked}) AS (value, pct)")
        .orderBy("value")
    )


def percentile_ranks_sql(
    query_text: str,
    values: tuple[int, ...] = (100, 300),
    lang: str | None = None,
    table: str = "documents",
    content_col: str = "text",
) -> str:
    """DuckDB twin of :func:`percentile_ranks`."""
    counts = ",\n         ".join(
        f"sum((length(d.{content_col}) <= {int(v)})::BIGINT)::BIGINT AS c{i}"
        for i, v in enumerate(values)
    )
    rows = "\nUNION ALL\n".join(
        f"SELECT {int(v)}::BIGINT AS value, "
        f"floor((100.0 * c{i}::DOUBLE / n::DOUBLE) * 1e6 + 0.5) / 1e6 AS pct "
        f"FROM agg"
        for i, v in enumerate(values)
    )
    return f"""{_match_set_cte(query_text, lang, table, content_col)},
agg AS (
  SELECT count(*)::BIGINT AS n,
         {counts}
  FROM {table} d JOIN m USING (doc_id)
)
SELECT value, pct FROM ({rows})
ORDER BY value
"""


def has_parent_search(
    corpus: DataFrame,
    query_text: str,
    k: int = 10,
    score_mode: str = "max",
    lang: str | None = None,
) -> DataFrame:
    """ES ``has_parent`` query — the mirror of :func:`repo_topk`'s
    ``has_child``: CHILD docs are returned, each scored by its PARENT
    repo's aggregated relevance (``score_mode`` ``max`` or ``sum`` over
    the repo's matching docs), so every doc of a relevant repo surfaces
    even when the doc itself never matched. Output (doc_id, repo, score)
    by (score desc, doc_id asc), top-k.

    Scale shape: the parent score table is repo-cardinality (tiny —
    broadcast); children join it on the column-pruned (doc_id, repo)
    projection; top-k is a TakeOrderedAndProject. Document text never
    moves.
    """
    from smse_backend_spark.operators.search import bm25_scored_scan

    if score_mode not in ("sum", "max"):
        raise ValueError(f"unknown score_mode {score_mode!r}")
    if lang is not None:
        corpus = corpus.filter(F.col("lang") == lang)
    scored = bm25_scored_scan(corpus, query_text).select("doc_id", "score")
    agg = (F.round(F.sum("score"), 6) if score_mode == "sum"
           else F.round(F.max("score"), 6)).alias("pscore")
    parents = (
        scored.join(corpus.select("doc_id", "repo"), "doc_id")
        .groupBy("repo")
        .agg(agg)
    )
    return (
        corpus.select("doc_id", "repo")
        .join(F.broadcast(parents), "repo")
        .select("doc_id", "repo", F.col("pscore").alias("score"))
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(k)
    )


def has_parent_search_sql(
    query_text: str,
    k: int = 10,
    score_mode: str = "max",
    lang: str | None = None,
    table: str = "documents",
    content_col: str = "text",
) -> str:
    """DuckDB twin of :func:`has_parent_search`."""
    from smse_backend_spark.operators.search import (
        _ALL_ROWS,
        bm25_scan_oracle_sql,
    )

    if score_mode not in ("sum", "max"):
        raise ValueError(f"unknown score_mode {score_mode!r}")
    scored = bm25_scan_oracle_sql(query_text, _ALL_ROWS, lang, table, content_col)
    where_lang = f"WHERE lang = '{lang}'" if lang is not None else ""
    return f"""
WITH scored AS ({scored}),
parents AS (
  SELECT d.source AS repo, round({score_mode}(s.score), 6) AS pscore
  FROM scored s JOIN {table} d USING (doc_id)
  GROUP BY d.source
)
SELECT d.doc_id AS doc_id, d.source AS repo, p.pscore AS score
FROM {table} d JOIN parents p ON d.source = p.repo
{where_lang}
ORDER BY score DESC, doc_id ASC
LIMIT {int(k)}
"""


def rank_eval(
    corpus: DataFrame,
    queries: dict[int, str],
    k: int = 10,
    lang: str | None = None,
) -> DataFrame:
    """ES ``_rank_eval`` API: offline ranking-quality metrics for a set of
    queries against relevance judgments — here the deterministic qrel
    "a doc is relevant iff it contains EVERY query term" (binary,
    derivable on both engines, no human labels needed). Per query:

        p_at_k  = |relevant in top-k| / k          (ES ``precision``)
        recall  = |relevant in top-k| / n_rel      (ES ``recall``)
        mrr     = 1 / rank of first relevant hit   (ES ``mean_reciprocal_rank``)
        err     = sum_i (1/i)·R_i·prod_{j<i}(1-R_j), R = rel/2 (binary,
                  max grade 1 — ES ``expected_reciprocal_rank``,
                  Chapelle et al. 2009); each term 1e-9-quantized before
                  the sum so the aggregate is order-independent
        dcg_k   = sum_{i<=k} rel_i / log2(i + 1)
        ndcg_k  = dcg_k / idcg_k   (0 when the query has no relevant doc)

    over the engine's BM25 top-k (score desc, doc_id asc). Returns
    (query_id, n_rel, p_at_k, recall_at_k, mrr, err, ndcg) ordered by
    query_id — the regression gate a search team runs before shipping a
    ranking change, with every metric the ES ``_rank_eval`` API ships.

    Scale shape: per query, the scored scan's match set carries nmatch,
    so relevance is a compare, not a second scan; the metric reduces
    top-k rows + one relevant-count aggregate. Queries run as separate
    jobs (an eval set is small; at 10^12 docs each job is the standard
    match-set reduction).
    """
    from smse_backend_spark.operators.search import bm25_scored_scan

    spark = corpus.sparkSession
    if lang is not None:
        corpus = corpus.filter(F.col("lang") == lang)
    parts = []
    for qid in sorted(queries):
        terms = query_terms(queries[qid])
        scored = bm25_scored_scan(corpus, queries[qid])
        rel = scored.filter(F.col("nmatch") == len(terms))
        n_rel = rel.count()
        w = Window.orderBy(F.desc("score"), F.asc("doc_id"))
        topk = (
            scored.select("doc_id", "score", "nmatch")
            .withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= int(k))
        )
        relc = (F.col("nmatch") == len(terms)).cast("int")
        w_prev = Window.orderBy("rn").rowsBetween(
            Window.unboundedPreceding, -1
        )
        topk = topk.withColumn(
            "prevrel", F.coalesce(F.sum(relc).over(w_prev), F.lit(0))
        )
        err_term = (
            F.lit(0.5) * F.pow(F.lit(0.5), F.col("prevrel").cast("double"))
        ) / F.col("rn").cast("double")
        err_q = F.sum(
            F.when(relc == 1,
                   F.floor(err_term * F.lit(1e9) + F.lit(0.5)).cast("long"))
            .otherwise(F.lit(0).cast("long"))
        )
        dcg = F.sum(
            F.when(relc == 1,
                   F.lit(1.0) / F.log2(F.col("rn") + F.lit(1)))
            .otherwise(F.lit(0.0))
        )
        hits = F.sum(relc.cast("long"))
        first_rel = F.min(F.when(relc == 1, F.col("rn")))
        idcg = sum(1.0 / math.log2(i + 1)
                   for i in range(1, min(int(k), n_rel) + 1))
        r6 = lambda c: F.round(c, 6)  # noqa: E731
        parts.append(
            topk.agg(
                F.lit(int(qid)).cast("long").alias("query_id"),
                F.lit(int(n_rel)).cast("long").alias("n_rel"),
                F.coalesce(
                    r6(hits.cast("double") / F.lit(float(k))), F.lit(0.0)
                ).alias("p_at_k"),
                (
                    F.coalesce(
                        r6(hits.cast("double") / F.lit(float(n_rel))),
                        F.lit(0.0),
                    ) if n_rel > 0 else F.lit(0.0)
                ).alias("recall_at_k"),
                F.coalesce(
                    r6(F.lit(1.0) / first_rel.cast("double")), F.lit(0.0)
                ).alias("mrr"),
                F.coalesce(
                    r6(err_q.cast("double") / F.lit(1e9)), F.lit(0.0)
                ).alias("err"),
                (r6(dcg / F.lit(idcg)) if idcg > 0
                 else F.lit(0.0)).alias("ndcg"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.orderBy("query_id")


def rank_eval_sql(
    queries: dict[int, str],
    k: int = 10,
    lang: str | None = None,
    table: str = "documents",
    content_col: str = "text",
) -> str:
    """DuckDB twin of :func:`rank_eval` (same qrels, same window order,
    same metric expressions; idcg re-derived in SQL from the same
    min(k, n_rel) prefix sum)."""
    from smse_backend_spark.operators.search import (
        _ALL_ROWS,
        bm25_scan_oracle_sql,
    )

    blocks = []
    for qid in sorted(queries):
        n_terms = len(query_terms(queries[qid]))
        scored = bm25_scan_oracle_sql(
            queries[qid], _ALL_ROWS, lang, table, content_col,
            with_nmatch=True,
        )
        blocks.append(f"""
SELECT * FROM (
  WITH scored AS ({scored}),
  ranked0 AS (
    SELECT doc_id, score, (nmatch = {n_terms})::INT AS rel,
           row_number() OVER (ORDER BY score DESC, doc_id ASC) AS rn
    FROM scored
  ),
  ranked AS (
    SELECT *, coalesce(sum(rel) OVER (ORDER BY rn
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
              AS prevrel
    FROM ranked0
  ),
  nr AS (SELECT count(*)::BIGINT AS n_rel FROM scored
         WHERE nmatch = {n_terms}),
  idcg AS (
    SELECT coalesce(sum(CASE WHEN i <= least({int(k)}, nr.n_rel)
                         THEN 1.0 / log2(i + 1) END), 0.0) AS v
    FROM generate_series(1, {int(k)}) t(i), nr
  )
  SELECT {int(qid)}::BIGINT AS query_id,
         (SELECT n_rel FROM nr) AS n_rel,
         coalesce(round(sum(rel)::DOUBLE / {float(k)!r}, 6), 0.0)
           AS p_at_k,
         CASE WHEN (SELECT n_rel FROM nr) > 0 THEN
           coalesce(round(sum(rel)::DOUBLE
                          / (SELECT n_rel FROM nr)::DOUBLE, 6), 0.0)
         ELSE 0.0 END AS recall_at_k,
         coalesce(round(1.0 / min(CASE WHEN rel = 1 THEN rn END)::DOUBLE,
                        6), 0.0) AS mrr,
         coalesce(round(sum(CASE WHEN rel = 1 THEN
             floor(((0.5 * pow(0.5, prevrel::DOUBLE)) / rn::DOUBLE)
                   * 1e9 + 0.5)::BIGINT ELSE 0 END)::DOUBLE / 1e9, 6),
           0.0) AS err,
         CASE WHEN (SELECT v FROM idcg) > 0 THEN
           round(sum(CASE WHEN rel = 1
                          THEN 1.0 / log2(rn + 1) ELSE 0.0 END)
                 / (SELECT v FROM idcg), 6)
         ELSE 0.0 END AS ndcg
  FROM ranked WHERE rn <= {int(k)}
)""")
    union = "\nUNION ALL\n".join(blocks)
    return f"SELECT * FROM (\n{union}\n) ORDER BY query_id"


def categorize_text(
    corpus: DataFrame,
    n_tokens: int = 4,
    size: int = 20,
    lang: str | None = None,
) -> DataFrame:
    """ES ``categorize_text`` aggregation — grouping semi-structured
    messages into categories — with a DETERMINISTIC categorizer: the
    category key is the doc's first ``n_tokens`` analyzed tokens with
    every digit-bearing token masked to ``#`` (the "log skeleton": stable
    prefixes survive, counters/ids collapse). Elastic's production
    categorizer is an incremental drain-style token tree whose buckets
    depend on ingestion order; that is the documented swap — this
    prefix-skeleton variant is order-independent, so the same corpus
    always yields the same buckets on any cluster size (and the oracle
    can replay it exactly).

    Returns (category, doc_count, sample_doc_id = min doc_id) ordered by
    (doc_count desc, category asc), capped at ``size``.

    Scale shape: one tokenize pass projecting ONLY the n-token prefix
    (the full token array never leaves the row), then a map-side-combined
    groupBy on the category string — bucket cardinality is bounded by
    the distinct skeletons, not the corpus.
    """
    if lang is not None:
        corpus = corpus.filter(F.col("lang") == lang)
    skel = F.concat_ws(
        " ",
        F.transform(
            F.slice(tokenize_col("content"), 1, int(n_tokens)),
            lambda t: F.when(t.rlike("[0-9]"), F.lit("#")).otherwise(t),
        ),
    )
    return (
        corpus.select(skel.alias("category"), "doc_id")
        .groupBy("category")
        .agg(
            F.count(F.lit(1)).cast("long").alias("doc_count"),
            F.min("doc_id").cast("long").alias("sample_doc_id"),
        )
        .orderBy(F.desc("doc_count"), F.asc("category"))
        .limit(int(size))
    )


def categorize_text_sql(
    n_tokens: int = 4,
    size: int = 20,
    lang: str | None = None,
    table: str = "documents",
    content_col: str = "text",
) -> str:
    """DuckDB twin of :func:`categorize_text` (same tokenizer, same
    digit-mask, same prefix length)."""
    where_lang = f"WHERE lang = '{lang}'" if lang is not None else ""
    toks = tokenize_duckdb_sql(content_col)
    return f"""
WITH docs AS (
  SELECT doc_id, {toks} AS toks FROM {table} {where_lang}
),
cat AS (
  SELECT doc_id,
         array_to_string(
           list_transform(toks[1:{int(n_tokens)}],
                          t -> CASE WHEN regexp_matches(t, '[0-9]')
                               THEN '#' ELSE t END),
           ' ') AS category
  FROM docs
)
SELECT category, count(*)::BIGINT AS doc_count,
       min(doc_id)::BIGINT AS sample_doc_id
FROM cat
GROUP BY category
ORDER BY doc_count DESC, category ASC
LIMIT {int(size)}
"""


def terms_shard_error(
    corpus: DataFrame,
    n_shards: int = 4,
    shard_size: int = 8,
    size: int = 5,
    lang: str | None = None,
) -> DataFrame:
    """The ES ``terms`` aggregation's DISTRIBUTED protocol, including its
    approximation accounting: each shard returns only its local top
    ``shard_size`` terms by doc count (count desc, term asc); the
    coordinator sums the received partials into the global top ``size``
    and reports, per term, ``doc_count_error_upper_bound`` = the sum of
    the LAST (smallest) returned count of every shard that did NOT
    return that term — the worst case it could have missed. This is the
    semantics gap between a single-node terms agg and a sharded one, and
    the reason ES responses carry the error field at all. Shard routing
    is ``doc_id % n_shards`` (deterministic, replayable).

    Returns (term, doc_count, err) — summed count is a LOWER bound, err
    the upper bound on what's missing — ordered (doc_count desc, term
    asc), top ``size``. All integers; no rounding.

    Scale shape: per-(shard, term) distinct-doc counts are ONE map-side-
    combined aggregation; the shard_size cut happens on shard-local
    (vocabulary-bounded) rows before anything crosses to the
    coordinator, exactly like ES — the coordinator merge touches at most
    ``n_shards * shard_size`` rows.
    """
    if lang is not None:
        corpus = corpus.filter(F.col("lang") == lang)
    toks = corpus.select(
        (F.col("doc_id") % int(n_shards)).alias("shard"),
        F.explode(F.array_distinct(tokenize_col("content"))).alias("term"),
    )
    per = toks.groupBy("shard", "term").agg(
        F.count(F.lit(1)).cast("long").alias("cnt")
    )
    w = Window.partitionBy("shard").orderBy(F.desc("cnt"), F.asc("term"))
    ret = per.withColumn("rk", F.row_number().over(w)).filter(
        F.col("rk") <= int(shard_size)
    )
    last = ret.groupBy("shard").agg(F.min("cnt").alias("last"))
    total_last = last.agg(F.sum("last").cast("long").alias("tl"))
    merged = (
        ret.join(last, "shard")
        .groupBy("term")
        .agg(
            F.sum("cnt").cast("long").alias("doc_count"),
            F.sum("last").cast("long").alias("present_last"),
        )
        .crossJoin(F.broadcast(total_last))
        .select(
            "term",
            "doc_count",
            (F.col("tl") - F.col("present_last")).cast("long").alias("err"),
        )
    )
    return merged.orderBy(
        F.desc("doc_count"), F.asc("term")
    ).limit(int(size))


def terms_shard_error_sql(
    n_shards: int = 4,
    shard_size: int = 8,
    size: int = 5,
    lang: str | None = None,
    table: str = "documents",
    content_col: str = "text",
) -> str:
    """DuckDB twin of :func:`terms_shard_error`."""
    where_lang = f"WHERE lang = '{lang}'" if lang is not None else ""
    toks = tokenize_duckdb_sql(content_col)
    return f"""
WITH docs AS (
  SELECT doc_id, {toks} AS toks FROM {table} {where_lang}
),
tok AS (
  SELECT doc_id % {int(n_shards)} AS shard, unnest(list_distinct(toks)) AS term
  FROM docs
),
per AS (
  SELECT shard, term, count(*)::BIGINT AS cnt FROM tok GROUP BY shard, term
),
ret AS (
  SELECT shard, term, cnt FROM (
    SELECT shard, term, cnt,
           row_number() OVER (PARTITION BY shard
                              ORDER BY cnt DESC, term ASC) AS rk
    FROM per
  ) WHERE rk <= {int(shard_size)}
),
last AS (SELECT shard, min(cnt) AS last FROM ret GROUP BY shard),
tl AS (SELECT sum(last)::BIGINT AS tl FROM last)
SELECT term, sum(cnt)::BIGINT AS doc_count,
       (tl.tl - sum(last.last))::BIGINT AS err
FROM ret JOIN last USING (shard) CROSS JOIN tl
GROUP BY term, tl.tl
ORDER BY doc_count DESC, term ASC
LIMIT {int(size)}
"""
