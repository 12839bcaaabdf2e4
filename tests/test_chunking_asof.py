"""Sliding-window chunking and the event->order as-of join."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from smse_backend_spark.corpus import load_corpus
from smse_backend_spark.operators.chunking import (
    chunk_documents,
    chunk_documents_sql,
)
from smse_backend_spark.operators.relational import (
    events_asof_orders,
    events_asof_orders_sql,
)
from smse_backend_spark.functions.tokenizer import tokenize_py


@pytest.fixture(scope="module")
def corpus(spark, sf_smoke):
    return load_corpus(spark, sf_smoke)


def test_chunks_reconstruct_tokens(corpus):
    """Dropping each chunk's leading overlap and concatenating must give
    back the full token stream; every chunk obeys the size bound."""
    size, ov = 32, 8
    stride = size - ov
    got = {}
    for r in chunk_documents(corpus.limit(50), size, ov).collect():
        got.setdefault(r["doc_id"], []).append(
            (r["chunk_id"], r["n_tokens"], r["chunk_text"])
        )
    texts = {r["doc_id"]: r["content"] for r in corpus.limit(50).collect()}
    checked_multi = 0
    for doc_id, chunks in got.items():
        chunks.sort()
        toks = tokenize_py(texts[doc_id])
        assert chunks[0][0] == 0
        rebuilt = chunks[0][2].split(" ") if chunks[0][2] else []
        for cid, n_tok, text in chunks[1:]:
            ct = text.split(" ")
            assert ct[:ov] == toks[cid * stride : cid * stride + ov]  # overlap
            rebuilt.extend(ct[ov:])
        assert rebuilt == toks, doc_id
        assert all(n <= size for _, n, _ in chunks)
        if len(chunks) > 1:
            checked_multi += 1
            assert all(n == size for _, n, _ in chunks[:-1])
    assert checked_multi > 0, "fixture must contain multi-chunk docs"


def test_chunking_matches_duckdb(corpus, sf_smoke):
    got = sorted(map(tuple, chunk_documents(corpus, 32, 8).collect()))
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{sf_smoke}/documents.parquet'"
    )
    want = sorted(map(tuple, con.execute(chunk_documents_sql(32, 8)).fetchall()))
    assert got == want and len(got) > 0


def test_chunking_rejects_bad_overlap(corpus):
    with pytest.raises(ValueError):
        chunk_documents(corpus, 10, 10)


def test_asof_join_matches_duckdb(spark, sf_smoke):
    got = sorted(map(tuple, events_asof_orders(spark, sf_smoke).collect()))
    con = duckdb.connect()
    for t in ("events", "orders"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_smoke}/{t}.parquet'"
        )
    want = sorted(map(tuple, con.execute(events_asof_orders_sql()).fetchall()))
    assert got == want and len(got) > 0


def test_asof_join_semantics_handmade(spark, sf_smoke, tmp_path):
    """Inclusive boundary, duplicate-date tie-break, and left semantics on
    a handcrafted pair of tables."""
    ev = spark.createDataFrame(
        [
            (1, "2020-01-05 00:00:00", 7),   # after both orders -> order 11
            (2, "2020-01-03 00:00:00", 7),   # exactly ON order 11 -> 11
            (3, "2020-01-02 00:00:00", 7),   # between -> order 10
            (4, "2020-01-01 00:00:00", 8),   # no order for user 8 -> NULL
            (5, "2019-12-31 00:00:00", 7),   # before all orders -> NULL
        ],
        "event_id long, ts string, user_id long",
    ).select("event_id", F.col("ts").cast("timestamp"), "user_id")
    od = spark.createDataFrame(
        [
            (10, 7, "2020-01-01 00:00:00", 5.0),
            (11, 7, "2020-01-03 00:00:00", 6.0),
            (9, 7, "2020-01-03 00:00:00", 4.0),  # same date: max key wins
        ],
        "o_orderkey long, o_custkey long, o_orderdate string, o_totalprice double",
    ).select(
        "o_orderkey", "o_custkey",
        F.col("o_orderdate").cast("timestamp"), "o_totalprice",
    )
    d = str(tmp_path)
    ev.write.parquet(f"{d}/events.parquet")
    od.write.parquet(f"{d}/orders.parquet")
    rows = {
        r["event_id"]: (r["o_orderkey"], r["o_totalprice"])
        for r in events_asof_orders(spark, d).collect()
    }
    assert rows[1] == (11, 6.0)
    assert rows[2] == (11, 6.0)
    assert rows[3] == (10, 5.0)
    assert rows[4] == (None, None)
    assert rows[5] == (None, None)
