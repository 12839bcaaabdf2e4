"""The reference's vector-search operators, DataFrame-first.

Covers SURVEY §2 items S1 (similarity scan+join), P3-P5 (modality gating),
T1/T2 (per-modality top-k, union + global re-rank), A2/A3 (multipart mean
fusion + modality mode), J2 (hydration join), U1 (union).

The local ``embeddings.parquet`` is ``(vec_id, embedding:array<float>,
label)``; the reference's derived columns are synthesized deterministically
(FIXTURES.md §3): ``modality`` cycles text/image/audio from ``label % 3``,
``user_id = vec_id % 5 + 1``. Every operator has an exactly-matching DuckDB
oracle (same derivations in SQL).

Scale notes: the query side is always a broadcast (one or a few query
vectors); the corpus side streams — cosine per row is a codegen'd
``zip_with``/``aggregate`` fold, top-k is ``TakeOrderedAndProject``. A
brute-force scan is the reference's own semantics (it has no ANN index);
the LSH-bucketed variant in ``operators/dedup.py`` is the scale path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from smse_backend_spark.functions.vectors import MODALITY_THRESHOLDS, cosine_col

MODALITIES = ["text", "image", "audio"]


def load_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """embeddings.parquet + deterministic modality/user columns."""
    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    modality = (
        F.when(F.col("label") % 3 == 0, "text")
        .when(F.col("label") % 3 == 1, "image")
        .otherwise("audio")
    )
    return e.select(
        "vec_id", "embedding", "label",
        modality.alias("modality"),
        (F.col("vec_id") % 5 + 1).alias("user_id"),
    )


EMB_DERIVED_SQL = """
SELECT vec_id, embedding, label,
       CASE label % 3 WHEN 0 THEN 'text' WHEN 1 THEN 'image' ELSE 'audio' END AS modality,
       vec_id % 5 + 1 AS user_id
FROM embeddings
"""


def _query_vec(emb: DataFrame, query_vec_id: int) -> DataFrame:
    return F.broadcast(
        emb.filter(F.col("vec_id") == query_vec_id).select(
            F.col("embedding").alias("qvec")
        )
    )


def scored_embeddings(
    emb: DataFrame, query_vec_id: int, user_id: int | None = None
) -> DataFrame:
    """Cosine score of every row against one stored query vector.

    The reference computes this as one pushed-down SQL over
    contents x embeddings (services/search.py:97-110); the ownership
    predicate (:104) becomes a partition-prunable filter.
    """
    df = emb.filter(F.col("vec_id") != query_vec_id)
    if user_id is not None:
        df = df.filter(F.col("user_id") == user_id)
    return df.crossJoin(_query_vec(emb, query_vec_id)).select(
        "vec_id", "modality", "user_id",
        F.round(cosine_col(F.col("embedding"), F.col("qvec")), 6).alias("score"),
    )


def cosine_topk(
    emb: DataFrame, query_vec_id: int, k: int = 10,
    modality: str | None = None, user_id: int | None = None,
) -> DataFrame:
    """search_by_modality: scan+join -> cosine -> ORDER BY score DESC LIMIT k
    (total order adds vec_id asc; the reference relies on storage order)."""
    df = scored_embeddings(emb, query_vec_id, user_id)
    if modality is not None:
        df = df.filter(F.col("modality") == modality)
    return df.select("vec_id", "modality", "score").orderBy(
        F.desc("score"), F.asc("vec_id")
    ).limit(k)


def multimodal_search(
    emb: DataFrame, query_vec_id: int, query_modality: str,
    k: int = 10, per_modality_limit: int = 30,
) -> DataFrame:
    """The full POST /api/search dataflow (routes/search.py:164-205):

    per-modality top-`per_modality_limit` -> threshold-matrix filter
    (services/search.py:171-184) -> union -> global re-sort -> LIMIT k.
    Implemented as ONE plan: window rank within modality replaces the
    per-modality SQL loop; a broadcast threshold lookup replaces the
    Python-side gate; normalization is identity (disabled in the reference,
    search.py:190-193).

    The modality rank is the salted two-level top-k: modality has
    cardinality 3, so a bare partitionBy(modality) window would stream a
    third of the corpus through one task. Level 1 ranks within
    (modality, pmod(xxhash64(vec_id), 64)) — 64-way parallel — and keeps
    rank <= limit; level 2 ranks the <= 64*limit survivors per modality.
    Exact: a row in the global top-L of its modality has at most L-1 rows
    above it anywhere, hence rank <= L in its own bucket (the order is
    total: score desc, vec_id asc).
    """
    from pyspark.sql import Window

    spark = emb.sparkSession
    thr = F.broadcast(
        spark.createDataFrame(
            [(m, t) for m, t in MODALITY_THRESHOLDS[query_modality].items()],
            "modality string, threshold double",
        )
    )
    scored = scored_embeddings(emb, query_vec_id)
    w1 = Window.partitionBy("modality", "b").orderBy(
        F.desc("score"), F.asc("vec_id")
    )
    w = Window.partitionBy("modality").orderBy(F.desc("score"), F.asc("vec_id"))
    return (
        scored.withColumn("b", F.pmod(F.xxhash64("vec_id"), F.lit(64)))
        .withColumn("r1", F.row_number().over(w1))
        .filter(F.col("r1") <= per_modality_limit)
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= per_modality_limit)
        .join(thr, "modality")
        .filter(F.col("score") >= F.col("threshold"))
        .select("vec_id", "modality", "score")
        .orderBy(F.desc("score"), F.asc("vec_id"))
        .limit(k)
    )


def fuse_multipart(emb: DataFrame, vec_ids: list[int]) -> DataFrame:
    """Multipart query fusion (services/embedding.py:56-94): element-wise
    mean of the part vectors + primary modality = most common, first-seen
    (by part order == vec_id order here) tie-break.

    Returns one row: (fused array<double> rounded 6dp, primary_modality).
    """
    parts = emb.filter(F.col("vec_id").isin(vec_ids))
    pos = parts.select(
        "vec_id", "modality", F.posexplode("embedding").alias("pos", "v")
    )
    fused = (
        pos.groupBy("pos")
        .agg(F.round(F.avg(F.col("v").cast("double")), 6).alias("m"))
        .groupBy()
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "m"))), lambda s: s["m"]
            ).alias("fused")
        )
    )
    primary = (
        parts.groupBy("modality")
        .agg(F.count(F.lit(1)).alias("cnt"), F.min("vec_id").alias("first_seen"))
        .orderBy(F.desc("cnt"), F.asc("first_seen"))
        .limit(1)
        .select(F.col("modality").alias("primary_modality"))
    )
    return fused.crossJoin(F.broadcast(primary))


def fuse_multipart_rows(emb: DataFrame, vec_ids: list[int]) -> DataFrame:
    """:func:`fuse_multipart` flattened for the driver's scalar canonicalizer:
    one row per vector position — (pos, value, primary_modality).

    Same math (mean per position rounded 6dp, mode/first-seen modality);
    only the output shape differs (the harness cannot sort array cells).
    """
    parts = emb.filter(F.col("vec_id").isin(vec_ids))
    pos = parts.select(
        "vec_id", "modality", F.posexplode("embedding").alias("pos", "v")
    )
    fused = pos.groupBy("pos").agg(
        F.round(F.avg(F.col("v").cast("double")), 6).alias("value")
    )
    primary = (
        parts.groupBy("modality")
        .agg(F.count(F.lit(1)).alias("cnt"), F.min("vec_id").alias("first_seen"))
        .orderBy(F.desc("cnt"), F.asc("first_seen"))
        .limit(1)
        .select(F.col("modality").alias("primary_modality"))
    )
    return fused.crossJoin(F.broadcast(primary)).select(
        F.col("pos").cast("int").alias("pos"), "value", "primary_modality"
    )


# ---------------------------------------------------------------------------
# DuckDB oracle builders (same derivations, same math, same rounding)
# ---------------------------------------------------------------------------

def _scored_sql(query_vec_id: int, user_id: int | None = None) -> str:
    user = f"AND e.vec_id % 5 + 1 = {user_id}" if user_id is not None else ""
    return f"""
WITH e AS ({EMB_DERIVED_SQL}),
q AS (SELECT embedding AS qvec FROM embeddings WHERE vec_id = {query_vec_id}),
z AS (
  SELECT e.vec_id, e.modality, e.vec_id % 5 + 1 AS user_id,
         unnest(e.embedding)::DOUBLE AS a, unnest(q.qvec)::DOUBLE AS b
  FROM e, q WHERE e.vec_id <> {query_vec_id} {user}
),
s AS (
  SELECT vec_id, any_value(modality) AS modality,
         round(sum(a*b) / (sqrt(sum(a*a)) * sqrt(sum(b*b))), 6) AS score
  FROM z GROUP BY vec_id
)
"""


def cosine_topk_sql(
    query_vec_id: int, k: int = 10,
    modality: str | None = None, user_id: int | None = None,
) -> str:
    mod = f"WHERE modality = '{modality}'" if modality is not None else ""
    return (
        _scored_sql(query_vec_id, user_id)
        + f"SELECT vec_id, modality, score FROM s {mod} "
        + "ORDER BY score DESC, vec_id ASC LIMIT " + str(k)
    )


def multimodal_search_sql(query_vec_id: int, query_modality: str,
                          k: int = 10, per_modality_limit: int = 30) -> str:
    cases = " ".join(
        f"WHEN '{m}' THEN {t}" for m, t in MODALITY_THRESHOLDS[query_modality].items()
    )
    return (
        _scored_sql(query_vec_id)
        + f""",
r AS (
  SELECT vec_id, modality, score,
         row_number() OVER (PARTITION BY modality ORDER BY score DESC, vec_id ASC) AS rnk
  FROM s
)
SELECT vec_id, modality, score FROM r
WHERE rnk <= {per_modality_limit}
  AND score >= CASE modality {cases} END
ORDER BY score DESC, vec_id ASC LIMIT {k}
"""
    )


def fuse_multipart_sql(vec_ids: list[int]) -> str:
    ids = ", ".join(map(str, vec_ids))
    return f"""
WITH e AS ({EMB_DERIVED_SQL}),
parts AS (SELECT * FROM e WHERE vec_id IN ({ids})),
pos AS (
  SELECT vec_id, modality,
         unnest(embedding)::DOUBLE AS v,
         generate_subscripts(embedding, 1) AS pos
  FROM parts
),
fused AS (
  SELECT list(m ORDER BY pos) AS fused
  FROM (SELECT pos, round(avg(v), 6) AS m FROM pos GROUP BY pos)
),
primary_m AS (
  SELECT modality AS primary_modality
  FROM (
    SELECT modality, count(*) AS cnt, min(vec_id) AS first_seen
    FROM parts GROUP BY modality
  )
  ORDER BY cnt DESC, first_seen ASC LIMIT 1
)
SELECT fused, primary_modality FROM fused, primary_m
"""


def fuse_multipart_rows_sql(vec_ids: list[int]) -> str:
    """Oracle twin of :func:`fuse_multipart_rows` (pos is 0-based like
    Spark's posexplode; DuckDB subscripts are 1-based)."""
    ids = ", ".join(map(str, vec_ids))
    return f"""
WITH e AS ({EMB_DERIVED_SQL}),
parts AS (SELECT * FROM e WHERE vec_id IN ({ids})),
pos AS (
  SELECT vec_id, modality,
         unnest(embedding)::DOUBLE AS v,
         generate_subscripts(embedding, 1) AS pos
  FROM parts
),
fused AS (
  SELECT (pos - 1)::INT AS pos, round(avg(v), 6) AS value FROM pos GROUP BY pos
),
primary_m AS (
  SELECT modality AS primary_modality
  FROM (
    SELECT modality, count(*) AS cnt, min(vec_id) AS first_seen
    FROM parts GROUP BY modality
  )
  ORDER BY cnt DESC, first_seen ASC LIMIT 1
)
SELECT pos, value, primary_modality FROM fused, primary_m
"""
