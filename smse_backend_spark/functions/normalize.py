"""Score-normalization functions (reference F2/F3).

The reference defines a numerically-stable softmax and a min-max normalizer
over result-score lists (smse_backend/services/search.py:28-74). Both are
dead code there (normalization is disabled at search.py:193), but they are
part of the declared surface, so the engine carries them as per-group
window operators with the reference's exact edge rules:

- softmax: exp(s - max) / sum(exp(s - max)) within the group
- min-max: (s - min) / (max - min); all-equal group -> 1.0 (search.py:69-71)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def softmax_scores(df: DataFrame, group_col: str, score_col: str) -> DataFrame:
    """Per-group stable softmax of ``score_col``; adds ``softmax`` column."""
    w = Window.partitionBy(group_col)
    e = F.exp(F.col(score_col) - F.max(score_col).over(w))
    return df.withColumn(
        "softmax", F.round(e / F.sum(e).over(w), 6)
    )


def minmax_scores(df: DataFrame, group_col: str, score_col: str) -> DataFrame:
    """Per-group min-max normalization; all-equal groups map to 1.0."""
    w = Window.partitionBy(group_col)
    mn, mx = F.min(score_col).over(w), F.max(score_col).over(w)
    return df.withColumn(
        "minmax",
        F.round(
            F.when(mx == mn, F.lit(1.0)).otherwise(
                (F.col(score_col) - mn) / (mx - mn)
            ),
            6,
        ),
    )


def normalized_events(spark, sf_dir: str, max_user: int = 5) -> DataFrame:
    """Driver-contract wrapper: both normalizations over per-user event
    values (a bounded deterministic stand-in for per-query score lists)."""
    e = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .filter(F.col("user_id") < max_user)
        .select("event_id", "user_id", F.round("value", 6).alias("value"))
    )
    return minmax_scores(
        softmax_scores(e, "user_id", "value"), "user_id", "value"
    ).select("event_id", "user_id", "value", "softmax", "minmax")


def normalized_events_sql(max_user: int = 5) -> str:
    return f"""
WITH e AS (
  SELECT event_id, user_id, round(value, 6) AS value FROM events
  WHERE user_id < {max_user}
),
w AS (
  SELECT event_id, user_id, value,
         exp(value - max(value) OVER (PARTITION BY user_id)) AS ev,
         min(value) OVER (PARTITION BY user_id) AS mn,
         max(value) OVER (PARTITION BY user_id) AS mx
  FROM e
)
SELECT event_id, user_id, value,
       round(ev / sum(ev) OVER (PARTITION BY user_id), 6) AS softmax,
       round(CASE WHEN mx = mn THEN 1.0 ELSE (value - mn) / (mx - mn) END, 6)
         AS minmax
FROM w
"""
