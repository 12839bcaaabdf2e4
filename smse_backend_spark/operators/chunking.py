"""Sliding-window document chunking (the embedding-ingest preprocessor).

The reference chunks every text into 240-token windows with overlap 10
before embedding (``/root/reference/smse_backend/tasks.py:97-99``,
``TextConfig(chunk_size=240, chunk_overlap=10)``); its multipart search
then mean-fuses the per-chunk query embeddings (covered by
``operators/similarity.fuse_multipart``). This operator is the missing
front half: corpus -> (doc_id, chunk_id, n_tokens, chunk_text) rows, the
unit a 100 TB training-data pipeline feeds to an embedding model.

Scale shape: pure JVM Column algebra end to end — tokenize (the engine's
code-aware tokenizer), ``sequence`` + ``explode`` for the window index,
``slice`` for the window — no Python crossing, no shuffle at all (chunking
is embarrassingly row-parallel; output partitioning inherits the scan).
Row growth is bounded by ceil(doc_len/stride), so output size is
O(corpus tokens * size/stride).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from smse_backend_spark.functions.tokenizer import (
    tokenize_col,
    tokenize_duckdb_sql,
)


def chunk_documents(
    corpus: DataFrame, chunk_size: int = 240, overlap: int = 10
) -> DataFrame:
    """(doc_id, chunk_id, n_tokens, chunk_text): token windows of
    ``chunk_size`` advancing by ``chunk_size - overlap``; the last window
    may be short; token-less documents produce no rows. Defaults are the
    reference's TextConfig (240/10)."""
    if overlap >= chunk_size:
        raise ValueError("overlap must be < chunk_size")
    stride = chunk_size - overlap
    base = (
        corpus.select("doc_id", tokenize_col(F.col("content")).alias("toks"))
        .withColumn("n", F.size("toks"))
        .filter(F.col("n") > 0)
    )
    n_chunks = F.when(F.col("n") <= chunk_size, F.lit(1)).otherwise(
        F.floor((F.col("n") - chunk_size + stride - 1) / F.lit(stride)) + 1
    )
    ct = F.slice("toks", F.col("chunk_id").cast("int") * stride + 1, chunk_size)
    return (
        base.select(
            "doc_id",
            F.explode(F.sequence(F.lit(0), (n_chunks - 1).cast("int"))).alias(
                "chunk_id"
            ),
            "toks",
        )
        .select(
            "doc_id",
            F.col("chunk_id").cast("long").alias("chunk_id"),
            F.size(ct).cast("long").alias("n_tokens"),
            F.array_join(ct, " ").alias("chunk_text"),
        )
    )


def chunk_documents_sql(
    chunk_size: int = 240,
    overlap: int = 10,
    table: str = "documents",
    content_col: str = "text",
) -> str:
    """DuckDB twin of :func:`chunk_documents` (identical tokenizer,
    window arithmetic and join separator)."""
    stride = chunk_size - overlap
    return f"""
WITH t AS (
  SELECT doc_id, {tokenize_duckdb_sql(content_col)} AS toks FROM {table}
),
n AS (SELECT doc_id, toks, len(toks) AS n FROM t WHERE len(toks) > 0),
c AS (
  SELECT doc_id, toks,
         CASE WHEN n <= {chunk_size} THEN 1
              ELSE (n - {chunk_size} + {stride} - 1) // {stride} + 1
         END AS n_chunks
  FROM n
),
x AS (SELECT doc_id, toks, unnest(range(0, n_chunks)) AS chunk_id FROM c),
y AS (
  SELECT doc_id, chunk_id,
         list_slice(toks, chunk_id * {stride} + 1,
                    chunk_id * {stride} + {chunk_size}) AS ct
  FROM x
)
SELECT doc_id, chunk_id::BIGINT AS chunk_id, len(ct)::BIGINT AS n_tokens,
       array_to_string(ct, ' ') AS chunk_text
FROM y
"""
