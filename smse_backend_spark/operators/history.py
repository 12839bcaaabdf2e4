"""Query/result persistence + history readback (SURVEY §2 S3/S9/S10/T4/A1, §3.3).

The reference persists one ``Query`` + ``Embedding`` row per search
(routes/search.py:148-162) and one ``SearchRecord`` per hit (:176-187 — a
Python loop of ORM inserts), then reads history back with
``ORDER BY timestamp DESC LIMIT/OFFSET`` (:252-258) plus a separate
``count()`` (:261), and hydrates hits with N point lookups (:191-203).

Here: results are a DataFrame appended in one write (the N-insert loop
becomes a single columnar append), the N+1 hydration loop becomes one join,
and pagination gets a total order (timestamp desc, id asc) — the reference
relies on storage order for ties.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def persist_search(
    results: DataFrame,
    queries_path: str,
    records_path: str,
    query_id: int,
    query_text: str,
    user_id: int,
    retrieved_at: str,
) -> None:
    """Append one query row + per-hit records (S9/S10 as table appends).

    ``retrieved_at`` is an explicit ISO timestamp: determinism in data paths
    is an engine invariant (no wall-clock inside jobs) — the caller stamps.
    """
    spark = results.sparkSession
    ts = F.to_timestamp(F.lit(retrieved_at))
    spark.createDataFrame(
        [(query_id, query_text, user_id)], "query_id long, text string, user_id long"
    ).withColumn("timestamp", ts).write.mode("append").parquet(queries_path)
    (
        results.select(
            F.lit(query_id).alias("query_id"),
            F.col("doc_id").alias("content_id"),
            F.col("score").alias("similarity_score"),
        )
        .withColumn("retrieved_at", ts)
        .write.mode("append")
        .parquet(records_path)
    )


def history_page(
    events: DataFrame, user_id: int, limit: int = 10, offset: int = 0
) -> DataFrame:
    """GET /api/search history: filter user -> newest first -> page (S3/T4).

    Total order (ts desc, event_id asc) makes OFFSET deterministic across
    engines — the reference's bare ``ORDER BY timestamp DESC`` is not.
    """
    return (
        events.filter(F.col("user_id") == user_id)
        .orderBy(F.desc("ts"), F.asc("event_id"))
        .offset(offset)
        .limit(limit)
    )


def history_page_sql(user_id: int, limit: int = 10, offset: int = 0) -> str:
    return (
        f"SELECT * FROM events WHERE user_id = {user_id} "
        f"ORDER BY ts DESC, event_id ASC LIMIT {limit} OFFSET {offset}"
    )


def history_counts(events: DataFrame, min_events: int = 50) -> DataFrame:
    """Pagination totals (A1): events per user, heavier users only."""
    return (
        events.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .filter(F.col("n_events") >= min_events)
    )


def history_counts_sql(min_events: int = 50) -> str:
    return (
        "SELECT user_id, count(*) AS n_events FROM events "
        f"GROUP BY user_id HAVING count(*) >= {min_events}"
    )


def hydrate_results(
    records: DataFrame, contents: DataFrame, pushdown_limit: int | None = 10_000
) -> DataFrame:
    """J2: the reference's per-hit point-lookup loop (routes/search.py:191-203)
    as ONE left join.

    When the hit list is bounded (it is: k results per query), the distinct
    content_ids are pushed into the contents scan as an ``isin`` filter —
    the plan becomes a pruned point-lookup (``PushedFilters: [In(...)]``)
    against the 100 TB contents table plus a broadcast join, not a full
    corpus scan. ``pushdown_limit`` caps the driver-side id collect; above
    it (or with ``None``) the plain shuffle join runs instead.
    """
    if pushdown_limit is not None:
        ids = records.select("content_id").distinct().limit(pushdown_limit + 1).collect()
        if len(ids) <= pushdown_limit:
            contents = contents.filter(
                F.col("content_id").isin([r[0] for r in ids])
            )
    return records.join(contents, "content_id", "left")


def search_persist_roundtrip(
    spark,
    sf_dir: str,
    out_root: str,
    query_text: str,
    k: int = 10,
    query_id: int = 1,
    user_id: int = 7,
    retrieved_at: str = "2024-06-01 12:00:00",
) -> DataFrame:
    """The reference's full search lifecycle as ONE oracle-checked flow:
    search (routes/search.py:148-174) -> persist query + per-hit records
    (:176-187) -> read history detail back and hydrate each hit
    (:286-312). Idempotent: the persist step runs once per ``out_root``.
    """
    import os

    from smse_backend_spark.corpus import load_corpus
    from smse_backend_spark.operators.search import bm25_topk_scan

    qdir = os.path.join(out_root, "queries")
    rdir = os.path.join(out_root, "records")
    if not os.path.exists(rdir):
        results = bm25_topk_scan(load_corpus(spark, sf_dir), query_text, k)
        persist_search(results, qdir, rdir, query_id, query_text, user_id, retrieved_at)
    records = spark.read.parquet(rdir)
    contents = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        F.col("doc_id").alias("content_id"), "lang", "source"
    )
    return hydrate_results(records, contents).select(
        "query_id",
        "content_id",
        "similarity_score",
        F.col("retrieved_at").cast("timestamp_ntz").alias("retrieved_at"),
        "lang",
        "source",
    )


def search_persist_roundtrip_sql(
    query_text: str,
    k: int = 10,
    query_id: int = 1,
    retrieved_at: str = "2024-06-01 12:00:00",
) -> str:
    from smse_backend_spark.operators.search import bm25_scan_oracle_sql

    base = bm25_scan_oracle_sql(query_text, k)
    return f"""
WITH base AS ({base})
SELECT {query_id} AS query_id, b.doc_id AS content_id, b.score AS similarity_score,
       TIMESTAMP '{retrieved_at}' AS retrieved_at, d.lang, d.source
FROM base b JOIN documents d ON d.doc_id = b.doc_id
"""
