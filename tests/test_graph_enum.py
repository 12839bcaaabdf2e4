"""ES Graph explore + _terms_enum: oracle parity and plan shape."""

from __future__ import annotations

import duckdb
import pytest

from smse_backend_spark.corpus import load_corpus
from smse_backend_spark.index.query import terms_enum, terms_enum_oracle_sql
from smse_backend_spark.operators.aggregations import (
    graph_explore,
    graph_explore_sql,
)


@pytest.fixture(scope="module")
def con(sf_correct):
    c = duckdb.connect()
    c.execute(
        f"create view documents as select * from '{sf_correct}/documents.parquet'"
    )
    return c


@pytest.fixture(scope="module")
def index_path(spark, sf_correct, tmp_path_factory):
    from smse_backend_spark.index.build import build_index

    out = str(tmp_path_factory.mktemp("idx"))
    build_index(
        spark, load_corpus(spark, sf_correct), out,
        segment_size=256, n_buckets=8, block_size=64,
    )
    return out


def test_graph_explore_vs_oracle(spark, sf_correct, con):
    s = sorted(map(tuple, graph_explore(
        load_corpus(spark, sf_correct), "vector window", 12, 20
    ).collect()))
    o = sorted(map(tuple, con.execute(
        graph_explore_sql("vector window", 12, 20)
    ).fetchall()))
    assert s == o
    assert 0 < len(s) <= 20


def test_graph_explore_edges_within_vertex_set(spark, sf_correct):
    """Every edge endpoint must be one of the top-n_vertices foreground
    terms, and edges are canonical (term_a < term_b)."""
    rows = graph_explore(
        load_corpus(spark, sf_correct), "vector window", 8, 50
    ).collect()
    verts = {r["term_a"] for r in rows} | {r["term_b"] for r in rows}
    assert len(verts) <= 8
    assert all(r["term_a"] < r["term_b"] for r in rows)


def test_terms_enum_vs_oracle(spark, index_path, con):
    s = sorted(map(tuple, terms_enum(spark, index_path, "sc", 20).collect()))
    o = sorted(map(tuple, con.execute(
        terms_enum_oracle_sql("sc", 20)
    ).fetchall()))
    assert s == o
    assert all(t.startswith("sc") for t, _, _ in s)


def test_terms_enum_is_dictionary_only(spark, index_path):
    """The plan must read <index>/dictionary and never touch postings
    (the ES API is a dictionary walk, not a search)."""
    plan = terms_enum(spark, index_path, "sc", 20)._jdf.queryExecution().executedPlan().toString()
    assert "dictionary" in plan
    assert "postings" not in plan
    assert "StartsWith" in plan or "isnotnull" in plan
