"""Query-time BM25 top-k over the segment-partitioned index.

Two exact modes:

- ``exhaustive``: decode every matching posting block, score, distributed
  top-k. The correctness anchor.
- ``pruned`` (block-max, default): a metadata-only pass reads just the tiny
  per-block stat columns (``block_max_tf``/``block_min_dl`` — Parquet column
  pruning never touches the compressed blobs), computes a sound per-segment
  score upper bound, scores the most promising segments first to obtain a
  threshold θ, then decodes only segments whose upper bound can still beat
  θ. This is block-max WAND at segment granularity, re-expressed as two
  DataFrame jobs instead of a per-posting iterator — the idiomatic Spark
  shape (driver steers with two tiny actions; all data movement stays
  declarative). Exactness: every skipped segment has ub < θ ≤ k-th score,
  so no skipped doc can enter the top-k.

Plan shape to expect at scale: partition pruning on (lang, term_bucket,
batch), predicate pushdown on term, ArrowEvalPython only for block decode,
and ``TakeOrderedAndProject`` on top.

Replaces the reference's per-query exact pgvector scan
(smse_backend/services/search.py:97-110, which has no ANN index) with a
sublinear indexed path.
"""

from __future__ import annotations

import math
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from smse_backend_spark import B, DEFAULT_TOP_K, K1
from smse_backend_spark.index import lineage as lin
from smse_backend_spark.index.codec import decode_blocks, delta_decode
from smse_backend_spark.operators.search import query_terms

RESULT_SCHEMA = T.StructType(
    [T.StructField("doc_id", T.LongType()), T.StructField("score", T.DoubleType())]
)

DECODED_SCHEMA = "term string, doc_id long, tf long, dl long"


def _decode_map(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        if pdf.empty:
            continue
        gaps, counts = decode_blocks(list(pdf["gaps"]))
        tfs, _ = decode_blocks(list(pdf["tfs"]))
        dls, _ = decode_blocks(list(pdf["dls"]))
        doc_ids = delta_decode(
            gaps.astype(np.int64), pdf["first_doc"].to_numpy(np.int64), counts
        )
        yield pd.DataFrame(
            {
                "term": np.repeat(pdf["term"].to_numpy(), counts),
                "doc_id": doc_ids,
                "tf": tfs.astype(np.int64),
                "dl": dls.astype(np.int64),
            }
        )


def _tf_norm(tf_col, dl_col, avgdl: float):
    d = tf_col.cast("double")
    return d * (K1 + 1.0) / (d + K1 * (1.0 - B + B * dl_col.cast("double") / avgdl))


class InvertedIndex:
    """Reader handle over an index directory produced by ``build_index``."""

    def __init__(self, spark: SparkSession, path: str):
        from smse_backend_spark.session import ensure_pyfiles

        ensure_pyfiles(spark)
        self.spark = spark
        self.path = path
        self.meta = lin.read_meta(path)

    # -- stats ------------------------------------------------------------

    def corpus_stats(self, lang: str | None = None) -> tuple[float, float]:
        if lang is None:
            n, sdl = self.meta["n_docs"], self.meta["sum_dl"]
        else:
            st = self.meta["per_lang"].get(lang, {"n_docs": 0, "sum_dl": 0})
            n, sdl = st["n_docs"], st["sum_dl"]
        return float(n), (sdl / n if n else 0.0)

    def term_idf(self, terms: list[str], lang: str | None = None) -> dict[str, float]:
        """idf per term from the dictionary (tiny pruned read + collect)."""
        n, _ = self.corpus_stats(lang)
        d = self.spark.read.parquet(f"{self.path}/dictionary").filter(
            F.col("term").isin(terms)
        )
        if lang is not None:
            d = d.filter(F.col("lang") == lang)
        rows = d.groupBy("term").agg(F.sum("df").alias("df")).collect()
        return {
            r["term"]: math.log(1.0 + (n - r["df"] + 0.5) / (r["df"] + 0.5))
            for r in rows
        }

    # -- scans ------------------------------------------------------------

    def _blocks(self, terms: list[str], lang: str | None) -> DataFrame:
        nb = self.meta["config"]["n_buckets"]
        # driver-side xxhash64 of the query terms would need the JVM seed;
        # instead push a bucket IN-list computed by one tiny local job
        buckets = [
            r[0]
            for r in self.spark.createDataFrame([(t,) for t in terms], "term string")
            .select(F.pmod(F.xxhash64("term"), F.lit(nb)).cast("int"))
            .distinct()
            .collect()
        ]
        df = self.spark.read.parquet(f"{self.path}/postings").filter(
            F.col("term_bucket").isin(buckets) & F.col("term").isin(terms)
        )
        if lang is not None:
            df = df.filter(F.col("lang") == lang)
        return df

    def _score(
        self, blocks: DataFrame, idf: dict[str, float], avgdl: float
    ) -> DataFrame:
        """Decode blocks -> unrounded (doc_id, score)."""
        idf_df = F.broadcast(
            self.spark.createDataFrame(list(idf.items()), "term string, idf double")
        )
        decoded = blocks.select("term", "first_doc", "gaps", "tfs", "dls").mapInPandas(
            _decode_map, DECODED_SCHEMA
        )
        return (
            decoded.join(idf_df, "term")
            .withColumn("contrib", F.col("idf") * _tf_norm(F.col("tf"), F.col("dl"), avgdl))
            .groupBy("doc_id")
            .agg(F.sum("contrib").alias("score"))
        )

    # -- public API --------------------------------------------------------

    def bm25_topk(
        self,
        query_text: str,
        k: int = DEFAULT_TOP_K,
        lang: str | None = None,
        mode: str = "pruned",
    ) -> DataFrame:
        terms = query_terms(query_text)
        n, avgdl = self.corpus_stats(lang)
        idf = self.term_idf(terms, lang) if terms and n else {}
        if not idf:
            return self.spark.createDataFrame([], RESULT_SCHEMA)
        blocks = self._blocks(sorted(idf), lang)
        if mode == "exhaustive":
            scored = self._score(blocks, idf, avgdl)
            return self._finish(scored, k)
        return self._pruned_topk(blocks, idf, avgdl, k)

    def _finish(self, scored: DataFrame, k: int) -> DataFrame:
        return (
            scored.select("doc_id", F.round("score", 6).alias("score"))
            .orderBy(F.desc("score"), F.asc("doc_id"))
            .limit(k)
        )

    def _pruned_topk(
        self, blocks: DataFrame, idf: dict[str, float], avgdl: float, k: int
    ) -> DataFrame:
        idf_df = F.broadcast(
            self.spark.createDataFrame(list(idf.items()), "term string, idf double")
        )
        # metadata-only pass: per-segment upper bound (no blob columns read)
        seg_ub = (
            blocks.select("term", "segment", "block_max_tf", "block_min_dl")
            .join(idf_df, "term")
            .withColumn(
                "ub", F.col("idf") * _tf_norm(F.col("block_max_tf"), F.col("block_min_dl"), avgdl)
            )
            .groupBy("segment", "term")
            .agg(F.max("ub").alias("tub"))
            .groupBy("segment")
            .agg(F.sum("tub").alias("seg_ub"))
        ).cache()
        try:
            n_seed = max(2, k // 4)
            seed = [r["segment"] for r in seg_ub.orderBy(F.desc("seg_ub")).limit(n_seed).collect()]
            seed_scores = self._score(
                blocks.filter(F.col("segment").isin(seed)), idf, avgdl
            ).cache()
            top = seed_scores.orderBy(F.desc("score")).limit(k).collect()
            theta = top[-1]["score"] - 1e-9 if len(top) >= k else float("-inf")
            rest_segments = seg_ub.filter(
                (F.col("seg_ub") >= theta) & ~F.col("segment").isin(seed)
            ).select("segment")
            rest = self._score(
                blocks.join(F.broadcast(rest_segments), "segment"), idf, avgdl
            )
            return self._finish(seed_scores.unionByName(rest), k)
        finally:
            seg_ub.unpersist()
