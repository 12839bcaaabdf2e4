"""Model-based corpus classification, trained and served inside the engine.

The FineWeb/CCNet pattern at 10^12 files is a cheap linear/NB text
classifier gating every document; this module trains a multinomial
Naive Bayes classifier ON the corpus (no external model, fully
deterministic) and scores a held-out split, Spark-first:

* training is two partial aggregations (per-(class, term) counts and
  per-class totals) — the model IS a small table;
* scoring broadcasts the model and folds quantized per-term
  log-likelihoods with an integer sum per (doc, class) — no Python, no
  iteration, shard-count invariant.

Exactness discipline: Laplace-smoothed likelihoods are ratios of
integers; each ``ln`` is quantized half-up to 6 dp int64 BEFORE the
tf-weighted sum, so the doc score is pure int64 arithmetic and the
argmax (score desc, class asc) is identical on both engines.

Reference analog: smse_backend has no trained classifier (modality
gating is by file extension — `services/file_storage.py`); this is the
corpus-filtering layer a pretraining pipeline adds on top.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from smse_backend_spark.functions.tokenizer import (
    tokenize_col,
    tokenize_duckdb_sql,
)
from smse_backend_spark.operators.sampling import SPLIT_SALT, TWO60, hash_u60
from smse_backend_spark.operators.sampling import _hash_u60_sql

_Q = 1e6


def _qln(c):
    """floor(ln(x)*1e6 + 0.5) as int64 — the shared log quantizer."""
    return F.floor(F.log(c) * F.lit(_Q) + F.lit(0.5)).cast("long")


def nb_lang_confusion(
    docs: DataFrame, label_col: str = "lang", train_frac: float = 0.8
) -> DataFrame:
    """Confusion matrix (true_label, pred_label, n) of a multinomial
    Naive Bayes classifier trained on the hash-split train fraction and
    evaluated on the rest — ordered by (true_label, pred_label).

    Model: P(class) from train doc counts; P(term|class) Laplace-1
    smoothed over train token counts. A test doc scores
    ``qln(prior_c) + sum_t tf_t * qln((c_{c,t}+1)/(N_c+V))`` per class
    (every ln quantized to 6 dp int64 first — the sum is integer);
    prediction is argmax with (score desc, class asc) tie-break.

    Scale shape: the model is |classes| x V rows built by one partial
    agg over the train explode — broadcast-sized (V is vocabulary, not
    corpus). Scoring explodes test tokens once, joins the broadcast
    model, and folds one integer sum per (doc, class); the argmax is a
    two-key window over |classes| rows per doc. Nothing corpus-sized
    crosses the wire except the token explode the index build already
    pays.
    """
    t_train = int(train_frac * TWO60)
    split = docs.withColumn(
        "_is_train", hash_u60(F.col("doc_id"), SPLIT_SALT) < t_train
    )
    train = split.filter("_is_train")
    test = split.filter("NOT _is_train")

    tr_tok = train.select(
        F.col(label_col).alias("cls"),
        F.explode(tokenize_col(F.col("text"))).alias("term"),
    )
    model = tr_tok.groupBy("cls", "term").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    totals = model.groupBy("cls").agg(F.sum("c").cast("long").alias("n_cls"))
    vocab = model.select("term").distinct().agg(
        F.count(F.lit(1)).cast("long").alias("v")
    )
    priors = (
        train.groupBy(F.col(label_col).alias("cls"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
        .crossJoin(
            F.broadcast(train.agg(F.count(F.lit(1)).alias("n_total")))
        )
        .select(
            "cls",
            _qln(F.col("n_docs").cast("double") / F.col("n_total")).alias(
                "q_prior"
            ),
        )
    )
    classes = F.broadcast(
        totals.crossJoin(F.broadcast(vocab)).join(priors, "cls")
    )

    te_tok = (
        test.select(
            "doc_id",
            F.col(label_col).alias("true_label"),
            F.explode(tokenize_col(F.col("text"))).alias("term"),
        )
        .groupBy("doc_id", "true_label", "term")
        .agg(F.count(F.lit(1)).cast("long").alias("tf"))
    )
    scored = (
        te_tok.crossJoin(classes)
        .join(F.broadcast(model), ["cls", "term"], "left")
        .select(
            "doc_id",
            "true_label",
            "cls",
            "q_prior",
            (
                F.col("tf")
                * _qln(
                    (F.coalesce(F.col("c"), F.lit(0)) + F.lit(1)).cast(
                        "double"
                    )
                    / (F.col("n_cls") + F.col("v")).cast("double")
                )
            ).alias("contrib"),
        )
        .groupBy("doc_id", "true_label", "cls")
        .agg(
            (F.max("q_prior") + F.sum("contrib")).cast("long").alias("score")
        )
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.desc("score"), F.asc("cls")
    )
    pred = (
        scored.withColumn("rn", F.row_number().over(w))
        .filter("rn = 1")
        .select("true_label", F.col("cls").alias("pred_label"))
    )
    return (
        pred.groupBy("true_label", "pred_label")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .orderBy("true_label", "pred_label")
    )


def nb_lang_confusion_sql(
    label_col: str = "lang",
    train_frac: float = 0.8,
    table: str = "documents",
    content_col: str = "text",
) -> str:
    """DuckDB twin of :func:`nb_lang_confusion` — same split threshold,
    same quantized logs, same integer scores, same argmax tie-break."""
    t_train = int(train_frac * TWO60)
    h = _hash_u60_sql("doc_id", SPLIT_SALT)
    toks = tokenize_duckdb_sql(content_col)
    return f"""
WITH base AS (
  SELECT doc_id, {label_col} AS lbl, {toks} AS t,
         ({h} < {t_train}) AS is_train
  FROM {table}
),
tr_tok AS (
  SELECT lbl AS cls, unnest(t) AS term FROM base WHERE is_train
),
model AS (
  SELECT cls, term, count(*)::BIGINT AS c FROM tr_tok GROUP BY cls, term
),
totals AS (
  SELECT cls, sum(c)::BIGINT AS n_cls FROM model GROUP BY cls
),
vocab AS (
  SELECT count(DISTINCT term)::BIGINT AS v FROM model
),
priors AS (
  SELECT cls,
         floor(ln(n_docs::DOUBLE / n_total::DOUBLE) * 1e6 + 0.5)::BIGINT
           AS q_prior
  FROM (
    SELECT lbl AS cls, count(*)::BIGINT AS n_docs,
           (SELECT count(*) FROM base WHERE is_train)::BIGINT AS n_total
    FROM base WHERE is_train GROUP BY lbl
  )
),
classes AS (
  SELECT totals.cls, n_cls, v, q_prior
  FROM totals, vocab JOIN priors ON priors.cls = totals.cls
),
te_tok AS (
  SELECT doc_id, lbl AS true_label, term, count(*)::BIGINT AS tf
  FROM (SELECT doc_id, lbl, unnest(t) AS term FROM base WHERE NOT is_train)
  GROUP BY doc_id, lbl, term
),
scored AS (
  SELECT doc_id, true_label, classes.cls,
         (max(q_prior) + sum(
            tf * floor(ln((coalesce(model.c, 0) + 1)::DOUBLE
                          / (n_cls + v)::DOUBLE) * 1e6 + 0.5)::BIGINT
         ))::BIGINT AS score
  FROM te_tok
  CROSS JOIN classes
  LEFT JOIN model
    ON model.cls = classes.cls AND model.term = te_tok.term
  GROUP BY doc_id, true_label, classes.cls
),
pred AS (
  SELECT true_label, cls AS pred_label
  FROM (
    SELECT *, row_number() OVER (
      PARTITION BY doc_id ORDER BY score DESC, cls ASC
    ) AS rn FROM scored
  ) WHERE rn = 1
)
SELECT true_label, pred_label, count(*)::BIGINT AS n
FROM pred GROUP BY true_label, pred_label
ORDER BY true_label, pred_label
"""
