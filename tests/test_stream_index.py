"""Streaming index maintenance: arriving corpus files drain into index
batches; the index is queryable and rank-identical after every drain."""

from __future__ import annotations

import os
import shutil

from pyspark.sql import functions as F

from smse_backend_spark.corpus import load_corpus
from smse_backend_spark.index import lineage as lin
from smse_backend_spark.index.query import InvertedIndex
from smse_backend_spark.operators.search import bm25_topk_scan
from smse_backend_spark.streaming.indexing import (
    index_micro_batch,
    streaming_index_maintenance,
)

Q = "hash join merge scan"


def _write_wave(docs, pred, dst):
    pdf = docs.filter(pred).toPandas()
    pdf.to_parquet(dst, index=False)
    return len(pdf)


def test_streaming_maintenance_three_waves(spark, sf_smoke, tmp_path):
    src = str(tmp_path / "arrivals")
    idx_dir = str(tmp_path / "idx")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src)
    docs = spark.read.parquet(f"{sf_smoke}/documents.parquet")
    corpus = load_corpus(spark, sf_smoke)

    # waves split on segment boundaries (segment_size 64): append-only ids
    waves = [
        (F.col("doc_id") < 256, F.col("doc_id") < 256),
        (F.col("doc_id").between(256, 383), F.col("doc_id") < 384),
        (F.col("doc_id") >= 384, F.lit(True)),
    ]
    for i, (wave_pred, seen_pred) in enumerate(waves):
        _write_wave(docs, wave_pred, os.path.join(src, f"wave{i}.parquet"))
        streaming_index_maintenance(
            spark, src, idx_dir, ckpt,
            segment_size=64, n_buckets=4, block_size=16,
        )
        got = [(r["doc_id"], r["score"])
               for r in InvertedIndex(spark, idx_dir).bm25_topk(Q, 10).collect()]
        want = [(r["doc_id"], r["score"])
                for r in bm25_topk_scan(corpus.filter(seen_pred), Q, 10).collect()]
        assert got == want, (i, got[:3], want[:3])

    rows = lin.read_lineage(idx_dir)
    assert [r["corpus_snapshot"] for r in rows] == [
        "stream-0", "stream-1", "stream-2"
    ]

    # re-drain with nothing new: no extra batches, index unchanged
    streaming_index_maintenance(spark, src, idx_dir, ckpt,
                                segment_size=64, n_buckets=4, block_size=16)
    assert len(lin.read_lineage(idx_dir)) == 3


def test_micro_batch_replay_is_idempotent(spark, sf_smoke, tmp_path):
    idx_dir = str(tmp_path / "idx")
    corpus = load_corpus(spark, sf_smoke).select("doc_id", "lang", "content")
    first = corpus.filter(F.col("doc_id") < 256)
    index_micro_batch(first, 0, idx_dir, segment_size=64, n_buckets=4,
                      block_size=16)
    assert len(lin.read_lineage(idx_dir)) == 1
    # Spark replays the same batch_id after a crash — must be a no-op
    index_micro_batch(first, 0, idx_dir, segment_size=64, n_buckets=4,
                      block_size=16)
    rows = lin.read_lineage(idx_dir)
    assert len(rows) == 1 and rows[0]["corpus_snapshot"] == "stream-0"
    # a NEW batch id extends
    second = corpus.filter(F.col("doc_id") >= 256)
    index_micro_batch(second, 1, idx_dir, segment_size=64, n_buckets=4,
                      block_size=16)
    assert [r["corpus_snapshot"] for r in lin.read_lineage(idx_dir)] == [
        "stream-0", "stream-1"
    ]
