"""Naive Bayes corpus classifier: oracle parity + planted separability."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from smse_backend_spark.operators.classify import (
    nb_lang_confusion,
    nb_lang_confusion_sql,
)


@pytest.fixture(scope="module")
def docs(spark, sf_correct):
    return spark.read.parquet(f"{sf_correct}/documents.parquet")


def test_nb_confusion_vs_oracle(docs, sf_correct):
    con = duckdb.connect()
    con.execute(
        f"create view documents as select * from '{sf_correct}/documents.parquet'"
    )
    s = sorted(map(tuple, nb_lang_confusion(docs).collect()))
    o = sorted(map(tuple, con.execute(nb_lang_confusion_sql()).fetchall()))
    assert s == o
    assert sum(n for *_, n in s) > 0


def test_nb_confusion_covers_every_test_doc(docs):
    rows = nb_lang_confusion(docs).collect()
    total = sum(r["n"] for r in rows)
    from smse_backend_spark.operators.sampling import (
        SPLIT_SALT,
        TWO60,
        hash_u60,
    )

    n_test = docs.filter(
        hash_u60(F.col("doc_id"), SPLIT_SALT) >= int(0.8 * TWO60)
    ).count()
    assert total == n_test


def test_nb_planted_separable_corpus_is_diagonal(spark):
    """Three classes with disjoint vocabularies: NB must classify every
    held-out doc correctly (the smoothed likelihood of any observed
    term is far higher under its own class)."""
    vocab = {
        "aa": ["apple", "avocado", "apricot"],
        "bb": ["banana", "blueberry", "bramble"],
        "cc": ["cherry", "cranberry", "currant"],
    }
    rows = []
    for i in range(90):
        cls = ["aa", "bb", "cc"][i % 3]
        words = [vocab[cls][(i + j) % 3] for j in range(12)]
        rows.append((i, cls, " ".join(words)))
    df = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    conf = nb_lang_confusion(df).collect()
    off_diag = [r for r in conf if r["true_label"] != r["pred_label"]]
    assert not off_diag
    assert sum(r["n"] for r in conf) > 0
