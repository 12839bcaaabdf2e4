"""Round-3 curation ops: decontamination, PII redaction, chunk hash
embeddings, and index-served term vectors."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from smse_backend_spark.corpus import load_corpus
from smse_backend_spark.functions.redact import (
    redact_pii,
    redact_pii_injected,
    redact_pii_sql,
)
from smse_backend_spark.functions.tokenizer import tokenize_py
from smse_backend_spark.operators.chunking import (
    chunk_hash_embed,
    chunk_hash_embed_sql,
)
from smse_backend_spark.operators.decontam import decontaminate, decontaminate_sql


@pytest.fixture(scope="module")
def con(sf_smoke):
    c = duckdb.connect()
    c.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{sf_smoke}/documents.parquet'"
    )
    return c


# --- decontamination --------------------------------------------------------

def test_decontaminate_matches_duckdb(spark, sf_smoke, con):
    docs = spark.read.parquet(f"{sf_smoke}/documents.parquet")
    got = sorted(map(tuple, decontaminate(docs, 8, 50).collect()))
    want = sorted(map(tuple, con.execute(decontaminate_sql(8, 50)).fetchall()))
    assert got == want and len(got) > 0


def test_decontaminate_eval_docs_self_flag(spark, sf_smoke):
    """Every eval doc with >= n tokens must flag itself; output is total."""
    docs = spark.read.parquet(f"{sf_smoke}/documents.parquet")
    out = {r["doc_id"]: r for r in decontaminate(docs, 8, 50).collect()}
    texts = {r["doc_id"]: r["text"] for r in docs.collect()}
    assert set(out) == set(texts)  # one row per doc
    flagged_eval = 0
    for doc_id, text in texts.items():
        if doc_id % 50 == 0 and len(tokenize_py(text)) >= 8:
            assert out[doc_id]["contaminated"], doc_id
            flagged_eval += 1
    assert flagged_eval > 0


def test_decontaminate_planted_overlap(spark, tmp_path):
    """A non-eval doc sharing an 8-gram with an eval doc is flagged; a
    disjoint doc is not."""
    shared = "alpha bravo charlie delta echo foxtrot golf hotel"
    rows = [
        (0, shared + " tail words here"),              # eval doc
        (1, "prefix words " + shared),                 # contaminated
        (2, "nine ten eleven twelve thirteen fourteen fifteen sixteen"),
    ]
    docs = (
        tmp_path / "d.parquet"
    )
    spark.createDataFrame(rows, "doc_id long, text string").write.parquet(
        str(docs)
    )
    out = {
        r["doc_id"]: r["contaminated"]
        for r in decontaminate(
            spark.read.parquet(str(docs)), 8, 50
        ).collect()
    }
    assert out == {0: True, 1: True, 2: False}


# --- PII redaction ----------------------------------------------------------

def test_redact_pii_handmade(spark):
    df = spark.createDataFrame(
        [
            (1, "mail bob.smith+x@corp.io and 10.0.0.1 card 4111111111111111"),
            (2, "clean text with short 123 numbers"),
        ],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in redact_pii(df).collect()}
    assert (rows[1]["n_email"], rows[1]["n_ipv4"], rows[1]["n_num"]) == (1, 1, 1)
    assert (rows[2]["n_email"], rows[2]["n_ipv4"], rows[2]["n_num"]) == (0, 0, 0)
    # redacted text of doc 2 is unchanged -> sha equals sha of original
    import hashlib

    assert rows[2]["redacted_sha256"] == hashlib.sha256(
        b"clean text with short 123 numbers"
    ).hexdigest()
    assert rows[1]["redacted_sha256"] == hashlib.sha256(
        b"mail <EMAIL> and <IP> card <NUM>"
    ).hexdigest()


def test_redact_injected_matches_duckdb(spark, sf_smoke, con):
    docs = spark.read.parquet(f"{sf_smoke}/documents.parquet")
    got = sorted(map(tuple, redact_pii_injected(docs).collect()))
    want = sorted(map(tuple, con.execute(redact_pii_sql()).fetchall()))
    assert got == want and len(got) > 0
    # injected docs actually had something to scrub
    hit = [r for r in got if r[1] > 0]
    assert len(hit) == sum(1 for r in got if r[0] % 3 == 0) and hit


# --- chunk hash embeddings --------------------------------------------------

def test_chunk_hash_embed_matches_duckdb(spark, sf_smoke, con):
    corpus = load_corpus(spark, sf_smoke)
    got = sorted(map(tuple, chunk_hash_embed(corpus, 32, 8, 16).collect()))
    want = sorted(
        map(tuple, con.execute(chunk_hash_embed_sql(32, 8, 16)).fetchall())
    )
    assert got == want and len(got) > 0
    dims = {d for _, d, _ in got}
    assert dims <= set(range(16)) and len(dims) > 4
    assert any(v < 0 for *_, v in got) and any(v > 0 for *_, v in got)


# --- term vectors from the index -------------------------------------------

def test_term_vectors_against_brute_force(spark, sf_smoke, tmp_path):
    from collections import Counter

    from smse_backend_spark.index.build import build_index
    from smse_backend_spark.index.query import InvertedIndex

    corpus = load_corpus(spark, sf_smoke)
    path = str(tmp_path / "idx")
    build_index(spark, corpus, path)
    idx = InvertedIndex(spark, path)
    ids = [1, 7]
    got = sorted(
        (r["doc_id"], r["term"], r["tf"], r["df"])
        for r in idx.term_vectors(ids).collect()
    )
    texts = {r["doc_id"]: r["content"] for r in corpus.collect()}
    df_count = Counter()
    for t in texts.values():
        df_count.update(set(tokenize_py(t)))
    want = []
    for d in ids:
        for term, tf in Counter(tokenize_py(texts[d])).items():
            want.append((d, term, tf, df_count[term]))
    assert got == sorted(want) and got


def test_postings_stats_metadata_only(spark, sf_smoke, tmp_path):
    """The stats scan must be column-pruned to metadata — never reading
    the compressed posting blobs (gaps/tfs/dls)."""
    from smse_backend_spark.corpus import load_corpus
    from smse_backend_spark.index.build import build_index
    from smse_backend_spark.index.query import postings_stats

    path = str(tmp_path / "idx")
    build_index(spark, load_corpus(spark, sf_smoke), path)
    df = postings_stats(spark, path)
    plan = df._jdf.queryExecution().executedPlan().toString()
    read_schema = [l for l in plan.splitlines() if "ReadSchema" in l]
    assert read_schema and all("gaps" not in l for l in read_schema)
    assert df.count() > 0


def test_top_bigrams_and_doclen_histogram(spark, sf_smoke, con, tmp_path):
    from smse_backend_spark.corpus import load_corpus
    from smse_backend_spark.functions.text_quality import (
        top_bigrams,
        top_bigrams_sql,
    )
    from smse_backend_spark.index.build import build_index
    from smse_backend_spark.index.query import (
        doclen_histogram,
        doclen_histogram_oracle_sql,
    )

    docs = spark.read.parquet(f"{sf_smoke}/documents.parquet")
    got = [tuple(r) for r in top_bigrams(docs, 20).collect()]
    want = con.execute(top_bigrams_sql(20)).fetchall()
    assert got == want and len(got) == 20  # ordered comparison: ranked list
    assert got[0][1] >= got[-1][1]

    path = str(tmp_path / "idx")
    build_index(spark, load_corpus(spark, sf_smoke), path)
    hg = sorted(map(tuple, doclen_histogram(spark, path, 16).collect()))
    ho = sorted(map(tuple, con.execute(doclen_histogram_oracle_sql(16)).fetchall()))
    assert hg == ho and sum(n for _, n in hg) == docs.count()
