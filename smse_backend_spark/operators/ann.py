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


def rademacher_planes(dim: int, n_planes: int, n_tables: int) -> np.ndarray:
    """(n_tables, dim, n_planes) array of deterministic +/-1 hyperplane
    entries — sign-random projections (Charikar's SimHash family works with
    Rademacher entries). Derived from sha256 like every other hash in this
    engine, so the DuckDB oracle can inline the identical planes as
    literals and replay the bucketing exactly."""
    import hashlib

    out = np.empty((n_tables, dim, n_planes), dtype=np.float64)
    for t in range(n_tables):
        for j in range(n_planes):
            for d in range(dim):
                h = hashlib.sha256(f"annlsh_{t}_{j}_{d}".encode()).digest()[0]
                out[t, d, j] = 1.0 if h % 2 == 0 else -1.0
    return out


def lsh_buckets_col(planes: np.ndarray):
    """array<long> of per-table bucket ids, ALL tables in one Arrow pass
    (one matmul against the stacked plane matrix — not one scan per table).
    """
    n_tables, dim, n_planes = planes.shape
    stacked = planes.transpose(1, 0, 2).reshape(dim, n_tables * n_planes)
    weights = 1 << np.arange(n_planes, dtype=np.int64)

    @F.pandas_udf("array<long>")
    def buckets(emb: pd.Series) -> pd.Series:
        m = np.vstack(emb.to_numpy()).astype(np.float64)
        bits = (m @ stacked) > 0
        b = bits.reshape(len(m), n_tables, n_planes) @ weights
        return pd.Series(list(b))

    return buckets


def lsh_topk(
    emb: DataFrame,
    queries: dict[int, list[float]],
    k: int = 10,
    n_planes: int = 8,
    n_tables: int = 4,
) -> DataFrame:
    """ANN top-k: candidates = rows sharing any table's bucket with the
    query, exact cosine re-rank on candidates only.

    ONE corpus scan total: the kernel computes all tables' buckets with a
    single stacked matmul, matches them against the broadcast-as-closure
    query buckets, and scores the hits in place — no per-table scan loop,
    no candidate join, per-partition top-k before the global rank.
    """
    from pyspark.sql import Window

    spark = emb.sparkSession
    ensure_pyfiles(spark)
    dim = len(next(iter(queries.values())))
    planes = rademacher_planes(dim, n_planes, n_tables)
    stacked = planes.transpose(1, 0, 2).reshape(dim, n_tables * n_planes)
    weights = 1 << np.arange(n_planes, dtype=np.int64)

    q_ids = np.array(sorted(queries), dtype=np.int64)
    q_mat = np.array([queries[int(q)] for q in q_ids], dtype=np.float64)
    q_bits = (q_mat @ stacked) > 0
    q_buckets = q_bits.reshape(len(q_ids), n_tables, n_planes) @ weights  # (Q, T)
    qn = q_mat / np.linalg.norm(q_mat, axis=1, keepdims=True)

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        best: list[pd.DataFrame] = []
        for pdf in batches:
            if pdf.empty:
                continue
            m = np.vstack(pdf["embedding"].to_numpy()).astype(np.float64)
            bits = (m @ stacked) > 0
            buckets = bits.reshape(len(m), n_tables, n_planes) @ weights  # (R, T)
            match = (buckets[:, None, :] == q_buckets[None, :, :]).any(axis=2)
            rows, qs = np.nonzero(match)
            if not len(rows):
                continue
            mn = m / np.linalg.norm(m, axis=1, keepdims=True)
            sims = np.einsum("ij,ij->i", mn[rows], qn[qs])
            vec_ids = pdf["vec_id"].to_numpy(np.int64)
            best.append(
                pd.DataFrame(
                    {"query_id": q_ids[qs], "vec_id": vec_ids[rows],
                     "score": np.round(sims, 6)}
                )
            )
        if best:
            out = pd.concat(best, ignore_index=True)
            out = out.sort_values(
                ["query_id", "score", "vec_id"], ascending=[True, False, True],
                kind="stable", ignore_index=True,
            )
            yield out.groupby("query_id", sort=False).head(k)

    local = emb.select("vec_id", "embedding").mapInPandas(
        kernel, "query_id long, vec_id long, score double"
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("vec_id"))
    return (
        local.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "vec_id", "score")
    )


def ivf_topk(
    emb: DataFrame,
    queries: dict[int, list[float]],
    k: int = 10,
    n_centroids: int = 16,
    n_probe: int = 4,
) -> DataFrame:
    """IVF-style ANN: vectors are assigned to their nearest centroid
    (inverted lists); a query probes only its ``n_probe`` nearest lists and
    exact-re-ranks the candidates. The classic recall/cost dial next to the
    LSH path: at 10^12 rows a query touches n_probe/n_centroids of the
    corpus instead of all of it, and the assignment is a bounded-size
    broadcast (centroids) against a single corpus scan.

    Centroids here are the deterministic stand-in ``vec_id < n_centroids``
    rows (a real deployment k-means-trains them first — training changes
    WHICH rows are centroids, not this dataflow), which keeps the whole
    operator exactly replayable by the DuckDB oracle. Assignment and probe
    selection round cosines to 6 dp and tie-break on centroid id, so both
    engines pick identical lists.
    """
    from pyspark.sql import Window

    spark = emb.sparkSession
    ensure_pyfiles(spark)
    cent_rows = sorted(
        (r["vec_id"], [float(x) for x in r["embedding"]])
        for r in emb.filter(F.col("vec_id") < n_centroids).collect()
    )
    c_ids = np.array([c for c, _ in cent_rows], dtype=np.int64)
    c_mat = np.array([v for _, v in cent_rows], dtype=np.float64)
    cn = c_mat / np.linalg.norm(c_mat, axis=1, keepdims=True)

    q_ids = np.array(sorted(queries), dtype=np.int64)
    q_mat = np.array([queries[int(q)] for q in q_ids], dtype=np.float64)
    qn = q_mat / np.linalg.norm(q_mat, axis=1, keepdims=True)
    # per query: the n_probe nearest centroids (rounded score desc, id asc)
    q_sims = np.round(qn @ cn.T, 6)  # (Q, C)
    probe_sets = []
    for j in range(len(q_ids)):
        order = np.lexsort((c_ids, -q_sims[j]))[:n_probe]
        probe_sets.append(set(c_ids[order].tolist()))

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        best: list[pd.DataFrame] = []
        for pdf in batches:
            if pdf.empty:
                continue
            m = np.vstack(pdf["embedding"].to_numpy()).astype(np.float64)
            mn = m / np.linalg.norm(m, axis=1, keepdims=True)
            a_sims = np.round(mn @ cn.T, 6)  # (R, C)
            # nearest centroid, ties -> smallest centroid id (c_ids sorted
            # asc, argmax returns the first maximum)
            assigned = c_ids[np.argmax(a_sims, axis=1)]
            vec_ids = pdf["vec_id"].to_numpy(np.int64)
            sims = np.round(mn @ qn.T, 6)  # (R, Q)
            for j in range(len(q_ids)):
                mask = np.isin(assigned, list(probe_sets[j]))
                if not mask.any():
                    continue
                best.append(
                    pd.DataFrame(
                        {"query_id": q_ids[j], "vec_id": vec_ids[mask],
                         "score": sims[mask, j]}
                    )
                )
        if best:
            out = pd.concat(best, ignore_index=True)
            out = out.sort_values(
                ["query_id", "score", "vec_id"], ascending=[True, False, True],
                kind="stable", ignore_index=True,
            )
            yield out.groupby("query_id", sort=False).head(k)

    local = emb.select("vec_id", "embedding").mapInPandas(
        kernel, "query_id long, vec_id long, score double"
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("vec_id"))
    return (
        local.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "vec_id", "score")
    )


def ivf_topk_sql(
    query_vec_ids: list[int],
    k: int = 10,
    n_centroids: int = 16,
    n_probe: int = 4,
) -> str:
    """Exact DuckDB oracle for :func:`ivf_topk` (queries are rows of
    ``embeddings``; centroids are the deterministic ``vec_id < n_centroids``
    rows, so the full assignment/probe/re-rank is SQL-replayable)."""
    ids = ", ".join(map(str, query_vec_ids))
    return f"""
WITH cent AS (SELECT vec_id AS c_id, embedding AS cv FROM embeddings WHERE vec_id < {n_centroids}),
pz AS (
  SELECT e.vec_id, c.c_id,
         unnest(e.embedding)::DOUBLE AS x, unnest(c.cv)::DOUBLE AS y
  FROM embeddings e, cent c
),
ps AS (
  SELECT vec_id, c_id,
         round(sum(x*y) / (sqrt(sum(x*x)) * sqrt(sum(y*y))), 6) AS sim
  FROM pz GROUP BY vec_id, c_id
),
assigned AS (
  SELECT vec_id, c_id FROM (
    SELECT vec_id, c_id,
           row_number() OVER (PARTITION BY vec_id ORDER BY sim DESC, c_id ASC) AS rn
    FROM ps
  ) WHERE rn = 1
),
probes AS (
  SELECT vec_id AS query_id, c_id FROM (
    SELECT vec_id, c_id,
           row_number() OVER (PARTITION BY vec_id ORDER BY sim DESC, c_id ASC) AS rn
    FROM ps WHERE vec_id IN ({ids})
  ) WHERE rn <= {n_probe}
),
cand AS (
  SELECT p.query_id, a.vec_id
  FROM probes p JOIN assigned a ON a.c_id = p.c_id
),
z AS (
  SELECT c.query_id, c.vec_id,
         unnest(e.embedding)::DOUBLE AS x, unnest(q.embedding)::DOUBLE AS y
  FROM cand c
  JOIN embeddings e ON e.vec_id = c.vec_id
  JOIN embeddings q ON q.vec_id = c.query_id
),
s AS (
  SELECT query_id, vec_id,
         round(sum(x*y) / (sqrt(sum(x*x)) * sqrt(sum(y*y))), 6) AS score
  FROM z GROUP BY query_id, vec_id
),
r AS (
  SELECT query_id, vec_id, score,
         row_number() OVER (PARTITION BY query_id ORDER BY score DESC, vec_id ASC) AS rank
  FROM s
)
SELECT query_id, rank, vec_id, score FROM r WHERE rank <= {k}
"""


def planes_values_sql(planes: np.ndarray) -> str:
    """The plane entries as a DuckDB VALUES list ``(t, j, d, s)`` with
    1-based ``d`` (DuckDB list subscripts)."""
    n_tables, dim, n_planes = planes.shape
    rows = ", ".join(
        f"({t}, {j}, {d + 1}, {int(planes[t, d, j])})"
        for t in range(n_tables)
        for j in range(n_planes)
        for d in range(dim)
    )
    return f"(VALUES {rows}) p(t, j, d, s)"


def lsh_buckets_sql(planes: np.ndarray, source: str = "embeddings") -> str:
    """CTE body computing (vec_id, t, bucket) for every row of ``source``
    with the inlined deterministic planes — the oracle twin of
    :func:`lsh_buckets_col`."""
    dim = planes.shape[1]
    return f"""
eb AS (
  SELECT vec_id, di.i AS d, embedding[di.i]::DOUBLE AS x
  FROM {source}, range(1, {dim + 1}) di(i)
),
dots AS (
  SELECT e.vec_id, p.t, p.j, sum(e.x * p.s) AS dot
  FROM eb e JOIN {planes_values_sql(planes)} ON p.d = e.d
  GROUP BY e.vec_id, p.t, p.j
),
buckets AS (
  SELECT vec_id, t,
         sum(CASE WHEN dot > 0 THEN (1::BIGINT << j) ELSE 0 END)::BIGINT AS bucket
  FROM dots GROUP BY vec_id, t
)"""


def lsh_topk_sql(
    query_vec_ids: list[int],
    dim: int,
    k: int = 10,
    n_planes: int = 8,
    n_tables: int = 4,
) -> str:
    """Exact DuckDB oracle for :func:`lsh_topk` when the query vectors are
    themselves rows of ``embeddings`` (the contract's case): identical
    deterministic buckets -> identical candidates -> exact re-rank."""
    planes = rademacher_planes(dim, n_planes, n_tables)
    ids = ", ".join(map(str, query_vec_ids))
    return f"""
WITH {lsh_buckets_sql(planes)[1:]},
qb AS (SELECT vec_id AS query_id, t, bucket FROM buckets WHERE vec_id IN ({ids})),
cand AS (
  SELECT DISTINCT qb.query_id, b.vec_id
  FROM buckets b JOIN qb ON b.t = qb.t AND b.bucket = qb.bucket
),
z AS (
  SELECT c.query_id, c.vec_id,
         unnest(e.embedding)::DOUBLE AS x, unnest(q.embedding)::DOUBLE AS y
  FROM cand c
  JOIN embeddings e ON e.vec_id = c.vec_id
  JOIN embeddings q ON q.vec_id = c.query_id
),
s AS (
  SELECT query_id, vec_id,
         round(sum(x*y) / (sqrt(sum(x*x)) * sqrt(sum(y*y))), 6) AS score
  FROM z GROUP BY query_id, vec_id
),
r AS (
  SELECT query_id, vec_id, score,
         row_number() OVER (PARTITION BY query_id ORDER BY score DESC, vec_id ASC) AS rank
  FROM s
)
SELECT query_id, rank, vec_id, score FROM r WHERE rank <= {k}
"""


def dequantized_sq8_col(emb_col: str = "embedding"):
    """Scalar int8 quantization round-trip as PURE Column algebra:
    per-vector scale s = max|x|/127, code = floor(x/s + 0.5), value
    back = code * s. At 100 TB the stored form is the int8 codes + one
    float scale (4x smaller vectors, int8 matmul); here the dequantized
    doubles keep the DuckDB oracle bit-identical."""
    e = F.col(emb_col)
    s_raw = F.array_max(F.transform(e, lambda x: F.abs(x))) / F.lit(127.0)
    s = F.when(s_raw == F.lit(0.0), F.lit(1.0)).otherwise(s_raw)
    return F.transform(e, lambda x: F.floor(x / s + F.lit(0.5)) * s)


def sq8_topk(
    emb: DataFrame, queries: dict[int, list[float]], k: int = 10
) -> DataFrame:
    """ANN over int8 scalar-quantized vectors: corpus vectors quantized
    (the compressed form a 100 TB store would hold), queries stay full
    precision, scoring/rank is the exact brute-force machinery over the
    dequantized values — so results are deterministic and SQL-replayable,
    unlike recall-probabilistic LSH."""
    return brute_force_topk(
        emb.withColumn("embedding", dequantized_sq8_col()), queries, k
    )


def sq8_topk_sql(query_ids: list[int], k: int = 10) -> str:
    """DuckDB twin of :func:`sq8_topk` (same scale, same floor rounding,
    same cosine + 6dp round + (score desc, vec_id asc) rank)."""
    ids = ", ".join(str(int(q)) for q in sorted(query_ids))
    return f"""
WITH q AS (
  SELECT vec_id AS qid, embedding AS qv FROM embeddings WHERE vec_id IN ({ids})
),
scaled AS (
  SELECT vec_id, embedding,
         CASE WHEN list_max(list_transform(embedding, x -> abs(x))) / 127.0 = 0.0
              THEN 1.0
              ELSE list_max(list_transform(embedding, x -> abs(x))) / 127.0
         END AS s
  FROM embeddings
),
dq AS (
  SELECT vec_id,
         list_transform(embedding, x -> floor(x / s + 0.5) * s) AS dv
  FROM scaled
),
z AS (
  SELECT q.qid, d.vec_id, unnest(d.dv)::DOUBLE AS x, unnest(q.qv)::DOUBLE AS y
  FROM dq d, q
),
sims AS (
  SELECT qid, vec_id,
         round(sum(x*y) / (sqrt(sum(x*x)) * sqrt(sum(y*y))), 6) AS score
  FROM z GROUP BY qid, vec_id
),
r AS (
  SELECT qid AS query_id, vec_id, score,
         row_number() OVER (PARTITION BY qid
                            ORDER BY score DESC, vec_id ASC) AS rank
  FROM sims
)
SELECT query_id, rank, vec_id, score FROM r WHERE rank <= {k}
"""
