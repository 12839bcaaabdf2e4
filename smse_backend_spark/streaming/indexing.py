"""Continuous index maintenance over an arriving corpus stream.

Reference analog: the Celery ingest queue — a content upload schedules a
task, a worker embeds it, and the doc becomes searchable
(smse_backend/routes/content.py:59-75, tasks.py:262-355). Here the
arriving corpus files ARE the queue: a Structured Streaming query drains
them and each micro-batch commits ONE index batch through the normal
lineage protocol (``build_index`` for the first, ``extend_index`` after),
so the index is queryable — and crash-resumable — after every drain.

Exactly-once: Spark's checkpoint replays a failed micro-batch under the
same ``batch_id``; the committed lineage row records
``corpus_snapshot = "stream-<batch_id>"``, so a replayed batch that
already committed is skipped (idempotent foreachBatch, the standard
pattern for non-transactional sinks).

Scale notes: each micro-batch costs one build-batch plan (two stateless
scans + one wide shuffle over the DELTA only) plus ``finalize``'s
dictionary re-agg, which reads block *metadata* columns across the whole
index — cheap relative to a batch, but at very high drain frequency
batch up arrivals (``maxFilesPerTrigger``) rather than indexing file by
file, and run ``compact_index`` periodically to fold the accumulated
batches (see index/build.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from smse_backend_spark.index import lineage as lin
from smse_backend_spark.index.build import build_index, extend_index
from smse_backend_spark.streaming.events import DOCS_SCHEMA


def index_micro_batch(
    df: DataFrame,
    batch_id: int,
    index_dir: str,
    segment_size: int = 2048,
    n_buckets: int = 8,
    block_size: int = 128,
) -> None:
    """foreachBatch body: commit one index batch for one micro-batch.
    Idempotent under Spark's micro-batch replay (see module docstring)."""
    snap = f"stream-{batch_id}"
    rows = lin.read_lineage(index_dir)
    if any(r.get("corpus_snapshot") == snap for r in rows):
        return
    if df.isEmpty():
        return
    if not rows:
        build_index(
            df.sparkSession, df, index_dir, segment_size=segment_size,
            n_buckets=n_buckets, block_size=block_size, n_batches=1,
            snapshot_id=snap,
        )
    else:
        extend_index(df.sparkSession, df, index_dir, snapshot_id=snap)


def streaming_index_maintenance(
    spark: SparkSession,
    source_dir: str,
    index_dir: str,
    checkpoint: str,
    segment_size: int = 2048,
    n_buckets: int = 8,
    block_size: int = 128,
    max_files_per_trigger: int | None = None,
) -> None:
    """Drain newly arrived corpus files into the index (AvailableNow:
    process everything new, then stop — rerun on the same checkpoint to
    pick up later arrivals). Arrivals must be append-only in doc_id
    (Iceberg-append discipline), which ``extend_index`` enforces."""
    reader = spark.readStream.schema(DOCS_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    corpus = reader.parquet(source_dir).select(
        "doc_id", "lang", F.col("text").alias("content")
    )
    q = (
        corpus.writeStream.foreachBatch(
            lambda df, bid: index_micro_batch(
                df, bid, index_dir, segment_size, n_buckets, block_size
            )
        )
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
