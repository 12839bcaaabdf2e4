"""Structured-Streaming re-expression of the reference's async dataflow.

The reference runs ingest through a Celery queue (schedule task -> worker
embeds -> status row updated; smse_backend/services/embedding.py:6-19,
tasks.py:262-355). The streaming twin treats arriving corpus files as an
unbounded source and maintains the same derived state incrementally:

- ``incremental_ingest``: file-arrival stream -> tokenize/stats -> appended
  docstats (Trigger.AvailableNow semantics == "drain the queue then stop",
  exactly the Celery eager-mode contract used in the reference's tests,
  config/test.py:27-31).
- ``windowed_event_rollup``: watermarked tumbling-window aggregation over
  the events table (late data dropped past the watermark) — the streaming
  twin of ``operators/relational.hourly_event_rollup`` (its batch oracle).

Local testing uses the parquet source + ``processAllAvailable`` (a bounded
drain), so the same code is cluster-ready for kafka/files at scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from smse_backend_spark.functions.tokenizer import doc_len_col

EVENTS_SCHEMA = (
    "event_id long, ts timestamp_ntz, user_id long, event_type string, "
    "value double, props string"
)

DOCS_SCHEMA = "doc_id long, text string, lang string, source string, n_chars long"


def windowed_event_rollup(
    spark: SparkSession,
    source_dir: str,
    out_path: str,
    checkpoint: str,
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> None:
    """Tumbling-window event rollup with late-data watermarking, drained to
    parquet via AvailableNow (batch-equivalent, restart-safe checkpoint)."""
    events = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .parquet(source_dir)
        .withColumn("ts", F.col("ts").cast("timestamp"))
    )
    agg = (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), F.col("event_type"))
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 6).alias("total_value"))
        .select(F.col("w.start").alias("hour"), "event_type", "n", "total_value")
    )
    q = (
        agg.writeStream.outputMode("append")
        .format("parquet")
        .option("path", out_path)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def streamed_rollup_df(spark: SparkSession, sf_dir: str, out_root: str) -> DataFrame:
    """Driver-contract wrapper: run :func:`windowed_event_rollup` over the
    sf_dir events table (idempotent — the checkpoint makes a rerun a no-op)
    and return the materialized result with deterministic types/rounding.

    Append-mode semantics under AvailableNow: only windows the final
    watermark (max(ts) - 2h) has closed are emitted — the SQL oracle
    (:func:`streamed_rollup_sql`) encodes exactly that boundary.
    """
    import os
    import shutil

    src = os.path.join(out_root, "src")
    out = os.path.join(out_root, "out")
    ckpt = os.path.join(out_root, "ckpt")
    if not os.path.exists(src):
        os.makedirs(src)
        shutil.copy(os.path.join(sf_dir, "events.parquet"), os.path.join(src, "part-0.parquet"))
    windowed_event_rollup(spark, src, out, ckpt)
    return (
        spark.read.parquet(out)
        .select(
            F.col("hour").cast("timestamp_ntz").alias("hour"),
            "event_type",
            "n",
            F.round("total_value", 6).alias("total_value"),
        )
    )


def streamed_rollup_sql(window_hours: int = 1, watermark_hours: int = 2) -> str:
    # bucketing derives from window_hours (epoch-aligned tumbling windows,
    # matching F.window's origin); the 1h case keeps the simpler date_trunc
    # (identical result for tz-less timestamps)
    w = window_hours * 3600
    bucket = (
        "date_trunc('hour', ts)"
        if window_hours == 1
        else f"to_timestamp((floor(epoch(ts) / {w}) * {w})::BIGINT)::TIMESTAMP"
    )
    return f"""
WITH agg AS (
  SELECT {bucket} AS hour, event_type,
         count(*) AS n, round(sum(value), 6) AS total_value
  FROM events GROUP BY 1, 2
)
SELECT hour, event_type, n, total_value FROM agg
WHERE hour + INTERVAL {window_hours} HOUR
      <= (SELECT max(ts) - INTERVAL {watermark_hours} HOUR FROM events)
"""


def streamed_dedup(
    spark: SparkSession,
    source_dir: str,
    out_path: str,
    checkpoint: str,
) -> None:
    """Streaming exact dedup: the arriving document stream deduplicated on
    content hash with ``dropDuplicates`` state — the incremental twin of
    ``operators/dedup.dedup_exact``. Emits one row per DISTINCT content
    hash (first arrival wins; only the hash is emitted so the result is
    order-independent and oracle-comparable).

    State is one ~64 B row per distinct hash. At 100 TB pair this with
    ``withWatermark`` on an ingest-time column (dropDuplicates then ages
    state out past the watermark) — unbounded here because the local drain
    is finite.
    """
    docs = spark.readStream.schema(DOCS_SCHEMA).parquet(source_dir)
    hashes = docs.select(
        F.sha2(F.col("text"), 256).alias("content_sha256")
    ).dropDuplicates(["content_sha256"])
    q = (
        hashes.writeStream.outputMode("append")
        .format("parquet")
        .option("path", out_path)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def streamed_dedup_df(spark: SparkSession, sf_dir: str, out_root: str) -> DataFrame:
    """Driver-contract wrapper (idempotent via checkpoint)."""
    import os
    import shutil

    src = os.path.join(out_root, "src")
    out = os.path.join(out_root, "out")
    ckpt = os.path.join(out_root, "ckpt")
    if not os.path.exists(src):
        os.makedirs(src)
        shutil.copy(os.path.join(sf_dir, "documents.parquet"),
                    os.path.join(src, "part-0.parquet"))
    streamed_dedup(spark, src, out, ckpt)
    return spark.read.parquet(out)


def streamed_dedup_sql() -> str:
    return "SELECT DISTINCT sha256(text) AS content_sha256 FROM documents"


def incremental_ingest(
    spark: SparkSession,
    source_dir: str,
    out_path: str,
    checkpoint: str,
) -> None:
    """Streaming ingest: new corpus files -> per-doc stats appended.

    The checkpoint directory carries exactly the reference's task-status
    semantics: a file already processed is never re-embedded (Celery task
    dedup), and a crash resumes from the last committed offset.
    """
    docs = spark.readStream.schema(DOCS_SCHEMA).parquet(source_dir)
    stats = docs.select(
        "doc_id",
        "lang",
        F.sha2(F.col("text"), 256).alias("content_sha256"),
        doc_len_col("text").alias("doc_len"),
    )
    q = (
        stats.writeStream.outputMode("append")
        .format("parquet")
        .option("path", out_path)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def streamed_percolate(
    spark: SparkSession,
    source_dir: str,
    out_path: str,
    checkpoint: str,
    stored_queries: dict[int, str],
    max_doc_id: int | None = None,
) -> None:
    """Streaming percolation (the ES watcher / saved-search alerting
    shape): every arriving document is matched against the stored-query
    table inside its micro-batch, and (doc_id, query_id) alert rows are
    appended. Percolation is per-doc stateless, so the streamed result
    over any wave split equals the one-shot batch result — which is what
    the DuckDB oracle checks.

    ``foreachBatch`` + checkpoint gives exactly-once appends per batch;
    the stored-query side broadcasts inside :func:`percolate`.
    """
    from smse_backend_spark.operators.aggregations import percolate

    docs = spark.readStream.schema(DOCS_SCHEMA).parquet(source_dir)

    def handle(batch_df: DataFrame, _batch_id: int) -> None:
        corpus = batch_df.withColumnRenamed("text", "content")
        percolate(corpus, stored_queries, max_doc_id).write.mode(
            "append"
        ).parquet(out_path)

    q = (
        docs.writeStream.foreachBatch(handle)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def streamed_percolate_df(
    spark: SparkSession,
    sf_dir: str,
    out_root: str,
    stored_queries: dict[int, str],
    max_doc_id: int | None = None,
) -> DataFrame:
    """Driver-contract wrapper: the corpus arrives in two waves, each
    drained by its own AvailableNow run. Crash-safe the way
    :func:`streamed_dedup_df` is: every call re-writes any missing wave
    file (atomic tmp+rename) and re-drains — the checkpoint makes drains
    of already-processed files no-ops, so a run that died between waves
    self-heals on the next call instead of returning partial alerts."""
    import os

    import pandas as pd

    src = os.path.join(out_root, "src")
    out = os.path.join(out_root, "out")
    ckpt = os.path.join(out_root, "ckpt")
    os.makedirs(src, exist_ok=True)
    docs = pd.read_parquet(os.path.join(sf_dir, "documents.parquet"))
    half = len(docs) // 2
    for i, wave in enumerate((docs.iloc[:half], docs.iloc[half:])):
        path = os.path.join(src, f"wave{i}.parquet")
        if not os.path.exists(path):
            # dot-prefixed tmp: the parquet stream source ignores hidden
            # files, so a crash mid-write can never corrupt a drain
            tmp = os.path.join(src, f".wave{i}.tmp")
            wave.to_parquet(tmp, index=False)
            os.rename(tmp, path)
        streamed_percolate(spark, src, out, ckpt, stored_queries, max_doc_id)
    return spark.read.parquet(out)


def windowed_trending_terms(
    spark: SparkSession,
    source_dir: str,
    out_path: str,
    checkpoint: str,
    window: str = "6 hours",
    slide: str = "2 hours",
    watermark: str = "1 hour",
) -> None:
    """SLIDING-window event-type counts with late-data watermarking — the
    'trending now' shape (each event contributes to window/slide
    overlapping windows, so rankings update every slide step while
    smoothing over the full window). The tumbling
    :func:`windowed_event_rollup` cannot express overlap; this is the
    one Structured-Streaming window form the suite hadn't exercised.

    Counts stream out in append mode (only watermark-closed windows
    emit — restart-safe via the checkpoint); ranking happens at serve
    time over the emitted frame, because append-mode streams cannot
    hold a global rank. State is (windows × event_types) rows, bounded
    by the watermark horizon.
    """
    events = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .parquet(source_dir)
        .withColumn("ts", F.col("ts").cast("timestamp"))
    )
    agg = (
        events.withWatermark("ts", watermark)
        .groupBy(
            F.window("ts", window, slide).alias("w"),
            F.col("event_type"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n")
    )
    q = (
        agg.writeStream.outputMode("append")
        .format("parquet")
        .option("path", out_path)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def streamed_trending_df(
    spark: SparkSession, sf_dir: str, out_root: str, top: int = 3
) -> DataFrame:
    """Driver-contract wrapper: drain :func:`windowed_trending_terms` over
    the sf_dir events table (idempotent via checkpoint), then rank the
    emitted windows top-``top`` per window by (n desc, event_type asc).
    Returns (window_start epoch-seconds, rank, event_type, n)."""
    import os
    import shutil

    from pyspark.sql import Window as W

    src = os.path.join(out_root, "src")
    out = os.path.join(out_root, "out")
    ckpt = os.path.join(out_root, "ckpt")
    if not os.path.exists(src):
        os.makedirs(src)
        shutil.copy(os.path.join(sf_dir, "events.parquet"),
                    os.path.join(src, "part-0.parquet"))
    windowed_trending_terms(spark, src, out, ckpt)
    w = W.partitionBy("window_start").orderBy(
        F.desc("n"), F.asc("event_type")
    )
    return (
        spark.read.parquet(out)
        .select(
            F.col("window_start").cast("timestamp").cast("long")
            .alias("window_start"),
            "event_type",
            F.col("n").cast("long").alias("n"),
        )
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= top)
        .select("window_start", F.col("rank").cast("long").alias("rank"),
                "event_type", "n")
    )


def streamed_trending_sql(
    window_hours: int = 6,
    slide_hours: int = 2,
    watermark_hours: int = 1,
    top: int = 3,
) -> str:
    """DuckDB twin of :func:`streamed_trending_df`: each event lands in
    ``window/slide`` slide-aligned windows (Spark's epoch-aligned
    origin), only windows the FINAL watermark (max ts - watermark) has
    closed emit, rank top-``top`` per window by (n desc, type asc)."""
    w = window_hours * 3600
    s = slide_hours * 3600
    if window_hours % slide_hours:
        raise ValueError(
            "streamed_trending_sql requires window divisible by slide "
            f"(got {window_hours}h / {slide_hours}h) — Spark emits "
            "ceil(w/s) windows per event and this replay assumes w/s"
        )
    n_over = window_hours // slide_hours
    return f"""
WITH expanded AS (
  SELECT ((floor(epoch(ts))::BIGINT // {s}) - g.i) * {s} AS window_start,
         event_type
  FROM events,
       (SELECT unnest(generate_series(0, {n_over - 1})) AS i) g
  WHERE ((floor(epoch(ts))::BIGINT // {s}) - g.i) * {s} + {w}
        > floor(epoch(ts))::BIGINT
),
counted AS (
  SELECT window_start::BIGINT AS window_start, event_type,
         count(*)::BIGINT AS n
  FROM expanded GROUP BY 1, 2
),
closed AS (
  SELECT * FROM counted
  WHERE window_start + {w}
        <= (SELECT floor(epoch(max(ts))) - {watermark_hours * 3600}
            FROM events)
),
ranked AS (
  SELECT window_start, event_type, n,
         row_number() OVER (PARTITION BY window_start
                            ORDER BY n DESC, event_type ASC) AS rank
  FROM closed
)
SELECT window_start, rank, event_type, n
FROM ranked WHERE rank <= {int(top)}
"""
