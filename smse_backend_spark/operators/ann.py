"""Approximate nearest neighbor over embedding columns.

Two paths, mirroring the BM25 engine's scan-vs-index split:

- ``brute_force_topk``: exact cosine top-k for a batch of query vectors —
  the reference's own semantics (exact pgvector scan, no ANN index exists
  there) done right for Spark: queries broadcast, corpus streamed once, one
  numpy matmul per Arrow batch, per-partition local top-k, global
  TakeOrdered. Correctness baseline for everything else.
- ``lsh_topk``: random-hyperplane LSH (sign bits -> bucket), candidates =
  same-bucket rows across any of B tables, exact re-rank on candidates.
  The 10^12-row path: bucket equijoin instead of cross product. Recall is
  probabilistic — tests assert recall@10 against brute force, not equality.

Hyperplanes are seeded numpy (seed 42) — deterministic across runs.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from smse_backend_spark.session import ensure_pyfiles


def _topk_kernel(q_mat: np.ndarray, q_ids: np.ndarray, k: int):
    """mapInPandas kernel: per-partition exact cosine top-k for all queries."""

    qn = q_mat / np.linalg.norm(q_mat, axis=1, keepdims=True)

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        best: list[pd.DataFrame] = []
        for pdf in batches:
            if pdf.empty:
                continue
            m = np.vstack(pdf["embedding"].to_numpy()).astype(np.float64)
            m /= np.linalg.norm(m, axis=1, keepdims=True)
            sims = m @ qn.T  # (rows, queries)
            vec_ids = pdf["vec_id"].to_numpy(np.int64)
            kk = min(k, sims.shape[0])
            for j in range(sims.shape[1]):
                col = sims[:, j]
                idx = np.argpartition(-col, kk - 1)[:kk] if sims.shape[0] > kk else np.arange(sims.shape[0])
                sc = np.round(col[idx], 6)
                order = np.lexsort((vec_ids[idx], -sc))
                best.append(
                    pd.DataFrame(
                        {"query_id": q_ids[j], "vec_id": vec_ids[idx][order],
                         "score": sc[order]}
                    )
                )
        if best:
            out = pd.concat(best, ignore_index=True)
            out = out.sort_values(
                ["query_id", "score", "vec_id"], ascending=[True, False, True],
                kind="stable", ignore_index=True,
            )
            yield out.groupby("query_id", sort=False).head(k)

    return kernel


def brute_force_topk(
    emb: DataFrame, queries: dict[int, list[float]], k: int = 10
) -> DataFrame:
    """Exact cosine top-k per query vector. Returns (query_id, rank, vec_id,
    score) with the engine's total order (score desc, vec_id asc)."""
    from pyspark.sql import Window

    spark = emb.sparkSession
    ensure_pyfiles(spark)
    q_ids = np.array(sorted(queries), dtype=np.int64)
    q_mat = np.array([queries[int(q)] for q in q_ids], dtype=np.float64)
    kernel = _topk_kernel(q_mat, q_ids, k)
    local = emb.select("vec_id", "embedding").mapInPandas(
        kernel, "query_id long, vec_id long, score double"
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("vec_id"))
    return (
        local.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "vec_id", "score")
    )


def _planes(dim: int, n_planes: int, table: int) -> np.ndarray:
    rng = np.random.default_rng(42 + table)
    return rng.standard_normal((dim, n_planes))


def lsh_bucket_col(planes: np.ndarray):
    """Sign-bit bucket id for one hyperplane table, as a pandas UDF (the
    matmul is worth Arrow; a 16-term Column fold is not)."""

    @F.pandas_udf("long")
    def bucket(emb: pd.Series) -> pd.Series:
        m = np.vstack(emb.to_numpy()).astype(np.float64)
        bits = (m @ planes) > 0
        weights = (1 << np.arange(planes.shape[1], dtype=np.int64))
        return pd.Series(bits @ weights)

    return bucket


def lsh_topk(
    emb: DataFrame,
    queries: dict[int, list[float]],
    k: int = 10,
    n_planes: int = 8,
    n_tables: int = 4,
) -> DataFrame:
    """ANN top-k: candidates = rows sharing any table's bucket with the
    query, exact cosine re-rank on candidates only."""
    from pyspark.sql import Window

    from smse_backend_spark.functions.vectors import cosine_col

    spark = emb.sparkSession
    ensure_pyfiles(spark)
    dim = len(next(iter(queries.values())))

    cand = None
    for t in range(n_tables):
        planes = _planes(dim, n_planes, t)
        weights = 1 << np.arange(n_planes, dtype=np.int64)
        qrows = [
            (int(qid), int((((np.array(v) @ planes) > 0) @ weights)))
            for qid, v in queries.items()
        ]
        qb = F.broadcast(
            spark.createDataFrame(qrows, "query_id long, bucket long")
        )
        tagged = emb.withColumn("bucket", lsh_bucket_col(planes)(F.col("embedding")))
        c = tagged.join(qb, "bucket").select("query_id", "vec_id", "embedding")
        cand = c if cand is None else cand.unionByName(c)
    cand = cand.dropDuplicates(["query_id", "vec_id"])

    qv = F.broadcast(
        spark.createDataFrame(
            [(int(q), [float(x) for x in v]) for q, v in queries.items()],
            "query_id long, qvec array<double>",
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("vec_id"))
    return (
        cand.join(qv, "query_id")
        .withColumn("score", F.round(cosine_col(F.col("embedding"), F.col("qvec")), 6))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "vec_id", "score")
    )
