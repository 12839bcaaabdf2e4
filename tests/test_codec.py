"""Property tests for the delta+varint posting-block codec (FIXTURES.md §6)."""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from smse_backend_spark.index.codec import (
    decode_blocks,
    delta_decode,
    delta_encode,
    encode_blocks,
    varint_decode,
    varint_encode,
    varint_nbytes,
)


@given(st.lists(st.integers(min_value=0, max_value=2**63 - 1), max_size=300))
@settings(max_examples=200, deadline=None)
def test_varint_roundtrip(vals):
    a = np.array(vals, dtype=np.uint64)
    assert varint_decode(varint_encode(a)).tolist() == vals


def test_varint_known_lengths():
    a = np.array([0, 1, 127, 128, 2**14 - 1, 2**14, 2**21, 2**63 - 1], dtype=np.uint64)
    assert varint_nbytes(a).tolist() == [1, 1, 1, 2, 2, 3, 4, 9]
    assert varint_encode(np.array([300], dtype=np.uint64)) == b"\xac\x02"


@pytest.mark.parametrize("sizes", [[0], [1], [5, 0, 3], [0, 0], [128, 128, 7], [1000]])
def test_encode_blocks_roundtrip(sizes):
    rng = np.random.default_rng(42)
    vals = rng.integers(0, 2**21, size=sum(sizes)).astype(np.uint64)
    blobs = encode_blocks(vals, np.array(sizes))
    assert len(blobs) == len(sizes)
    got, counts = decode_blocks(blobs)
    assert counts.tolist() == sizes
    assert got.tolist() == vals.tolist()


@given(
    st.lists(
        st.lists(st.integers(0, 2**40), min_size=1, max_size=50).map(sorted),
        min_size=1,
        max_size=8,
    )
)
@settings(max_examples=100, deadline=None)
def test_delta_roundtrip(groups):
    flat = np.array([x for g in groups for x in g], dtype=np.int64)
    counts = np.array([len(g) for g in groups], dtype=np.int64)
    starts = np.concatenate(([0], np.cumsum(counts[:-1])))
    firsts = flat[starts]
    gaps = delta_encode(flat, starts)
    assert (gaps[starts] == 0).all()
    back = delta_decode(gaps, firsts, counts)
    assert back.tolist() == flat.tolist()


def test_full_posting_pipeline_roundtrip():
    """sorted doc ids -> gaps -> varint -> blocks -> decode -> identical ids."""
    rng = np.random.default_rng(7)
    doc_ids = np.unique(rng.integers(0, 10**9, size=100_000)).astype(np.int64)
    block = 128
    n_blocks = (doc_ids.size + block - 1) // block
    counts = np.full(n_blocks, block, dtype=np.int64)
    counts[-1] = doc_ids.size - block * (n_blocks - 1)
    starts = np.concatenate(([0], np.cumsum(counts[:-1])))
    gaps = delta_encode(doc_ids, starts)
    blobs = encode_blocks(gaps.astype(np.uint64), counts)
    got_gaps, got_counts = decode_blocks(blobs)
    back = delta_decode(got_gaps.astype(np.int64), doc_ids[starts], got_counts)
    assert back.tolist() == doc_ids.tolist()


def test_front_coding_stats_prefix_heavy_vocab(spark):
    """Planted identifier-style vocabulary (long shared prefixes): front
    coding must compress (ratio < 1), the block-restart terms must pay
    full length, and the integer byte accounting must replay by hand."""
    from smse_backend_spark.index.codec import front_coding_stats

    terms = [f"get_user_field_{i:03d}" for i in range(40)]
    d = spark.createDataFrame([("en", t) for t in terms], "lang string, term string")
    row = front_coding_stats(d, block=16).first()
    assert row["n_terms"] == 40
    assert row["raw_bytes"] == sum(len(t) for t in terms)
    # hand replay: rn 1, 17, 33 are restarts (full length); others store
    # 2 + len - lcp(prev)
    coded = 0
    for i, t in enumerate(sorted(terms)):
        if i % 16 == 0:
            coded += len(t)
        else:
            prev = sorted(terms)[i - 1]
            lcp = 0
            while lcp < min(len(t), len(prev)) and t[lcp] == prev[lcp]:
                lcp += 1
            coded += 2 + len(t) - lcp
    assert row["coded_bytes"] == coded
    assert row["ratio"] < 0.35  # 15-char shared prefixes compress hard


def test_front_coding_stats_matches_oracle(spark, sf_smoke):
    import duckdb

    from smse_backend_spark.index.codec import (
        front_coding_stats,
        front_coding_stats_sql,
    )
    from smse_backend_spark.functions.tokenizer import tokenize_col
    from pyspark.sql import functions as F

    docs = spark.read.parquet(f"{sf_smoke}/documents.parquet")
    dic = docs.select(
        "lang", F.explode(tokenize_col(F.col("text"))).alias("term")
    ).distinct()
    got = sorted(map(tuple, front_coding_stats(dic, 16).collect()))
    con = duckdb.connect()
    con.execute(
        f"create view documents as select * from '{sf_smoke}/documents.parquet'"
    )
    want = sorted(map(tuple,
                      con.execute(front_coding_stats_sql(16)).fetchall()))
    assert got == want


def test_postings_size_stats_container_rule(spark):
    """Planted density: a term present in >4096 docs of one 2^16 chunk
    must flip to a bitmap container (8192 B flat), while a sparse term
    stays an array container at 2 B/posting; varint gaps of 1 cost one
    byte each."""
    from smse_backend_spark.index.codec import postings_size_stats

    rows = [(i, "hot", "en") for i in range(5000)]           # dense chunk
    rows += [(i, "rare", "en") for i in range(0, 5000, 500)]  # 10 docs
    docs = spark.createDataFrame(
        [(d, t, lang) for d, t, lang in rows],
        "doc_id long, text string, lang string",
    )
    row = postings_size_stats(docs).first()
    assert row["n_terms"] == 2
    assert row["n_postings"] == 5010
    assert row["bitmap_containers"] == 1      # 'hot' chunk 0: 5000 > 4096
    assert row["array_containers"] == 1       # 'rare' chunk 0
    assert row["roaring_bytes"] == 8192 + 2 * 10
    # hot: first id 0 (1 B) + 4999 gaps of 1 (1 B each); rare: first 0 +
    # 9 gaps of 500 (2 B each)
    assert row["varint_bytes"] == 5000 + 1 + 9 * 2


def test_postings_size_stats_matches_oracle(spark, sf_smoke):
    import duckdb

    from smse_backend_spark.index.codec import (
        postings_size_stats,
        postings_size_stats_sql,
    )

    got = sorted(map(tuple, postings_size_stats(
        spark.read.parquet(f"{sf_smoke}/documents.parquet")).collect()))
    con = duckdb.connect()
    con.execute(
        f"create view documents as select * from '{sf_smoke}/documents.parquet'"
    )
    want = sorted(map(tuple,
                      con.execute(postings_size_stats_sql()).fetchall()))
    assert got == want
