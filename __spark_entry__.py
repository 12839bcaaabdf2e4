"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship BM25 query at sf0.001; ``queries()`` /
``oracle_sql()`` pair every implemented operator with a DuckDB oracle.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, str(Path(__file__).resolve().parent))

from smse_backend_spark.corpus import load_corpus
from smse_backend_spark.operators.search import bm25_scan_oracle_sql, bm25_topk_scan

FLAGSHIP_QUERY = "hash join merge scan"

_INDEX_CACHE: dict[str, str] = {}


def _indexed(spark: SparkSession, sf_dir: str):
    """Build (once per process) and open the inverted index for sf_dir."""
    from smse_backend_spark.index.build import build_index
    from smse_backend_spark.index.query import InvertedIndex

    if sf_dir not in _INDEX_CACHE:
        import tempfile

        out = tempfile.mkdtemp(prefix="smse_index_")
        build_index(spark, load_corpus(spark, sf_dir), out,
                    segment_size=256, n_buckets=8, block_size=64, n_batches=2)
        _INDEX_CACHE[sf_dir] = out
    return InvertedIndex(spark, _INDEX_CACHE[sf_dir])


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: BM25 top-10 for a fixed query over the sf0.001 corpus."""
    corpus = load_corpus(spark, "/root/testdata/sf0.001")
    return bm25_topk_scan(corpus, FLAGSHIP_QUERY, k=10)


def _bm25(query: str, k: int = 10, lang: str | None = None):
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        return bm25_topk_scan(load_corpus(spark, sf_dir), query, k, lang)

    return run


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    def _bm25_indexed(query: str, k: int = 10, lang: str | None = None, mode: str = "pruned"):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            return _indexed(spark, sf_dir).bm25_topk(query, k, lang, mode=mode)

        return run

    return {
        "bm25_topk": _bm25(FLAGSHIP_QUERY),
        "bm25_topk_lang": _bm25("batch stream spark window", lang="en"),
        "bm25_topk_hot": _bm25("the row data", k=20),
        "bm25_indexed": _bm25_indexed(FLAGSHIP_QUERY),
        "bm25_indexed_exhaustive": _bm25_indexed("the fast small slow", mode="exhaustive"),
        "bm25_indexed_lang": _bm25_indexed("batch stream spark window", lang="en"),
    }


def oracle_sql() -> dict[str, str]:
    return {
        "bm25_topk": bm25_scan_oracle_sql(FLAGSHIP_QUERY),
        "bm25_topk_lang": bm25_scan_oracle_sql("batch stream spark window", lang="en"),
        "bm25_topk_hot": bm25_scan_oracle_sql("the row data", k=20),
        "bm25_indexed": bm25_scan_oracle_sql(FLAGSHIP_QUERY),
        "bm25_indexed_exhaustive": bm25_scan_oracle_sql("the fast small slow"),
        "bm25_indexed_lang": bm25_scan_oracle_sql("batch stream spark window", lang="en"),
    }
