"""HyperLogLog / KMV set algebra / A-ES weighted reservoir.

Each operator is checked three ways: exact DuckDB-oracle parity at
sf0.01, the algebraic law that makes it shippable at scale (register
merge, sub-capacity losslessness), and a statistical sanity bound
against the exact count.
"""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from smse_backend_spark.operators import sketches as SK
from smse_backend_spark.operators.sampling import (
    weighted_reservoir,
    weighted_reservoir_sql,
)


@pytest.fixture(scope="module")
def con(sf_correct):
    c = duckdb.connect()
    for t in ("events", "documents"):
        c.execute(
            f"create view {t} as select * from '{sf_correct}/{t}.parquet'"
        )
    return c


@pytest.fixture(scope="module")
def events(spark, sf_correct):
    return spark.read.parquet(f"{sf_correct}/events.parquet")


@pytest.fixture(scope="module")
def docs(spark, sf_correct):
    return spark.read.parquet(f"{sf_correct}/documents.parquet")


def _pairs(df):
    return sorted(map(tuple, df.collect()))


@pytest.mark.parametrize("p", [6, 10, 12])
def test_hll_vs_oracle(events, con, p):
    s = _pairs(SK.hll_cardinality(events, "user_id", p))
    o = sorted(map(tuple, con.execute(
        SK.hll_cardinality_sql("user_id", p)
    ).fetchall()))
    assert s == o


def test_hll_merged_equals_single_pass(events, con):
    """The merge law: shard-local register frames merged by max produce
    the identical estimate — checked against the single-pass oracle AND
    the single-pass Spark frame."""
    merged = _pairs(SK.hll_cardinality_merged(events, "user_id", 10))
    single = _pairs(SK.hll_cardinality(events, "user_id", 10))
    oracle = sorted(map(tuple, con.execute(
        SK.hll_cardinality_sql("user_id", 10)
    ).fetchall()))
    assert merged == single == oracle


def test_hll_register_merge_is_max(events):
    """Register-level check: per-shard sketches merged by per-idx max
    equal the registers of one global pass (frame equality, not just
    the folded estimate)."""
    whole = _pairs(SK.hll_registers(events, "user_id", 8))
    halves = events.withColumn(
        "_half", F.pmod(F.col("event_id"), F.lit(2))
    )
    a = SK.hll_registers(halves.filter("_half = 0"), "user_id", 8)
    b = SK.hll_registers(halves.filter("_half = 1"), "user_id", 8)
    merged = _pairs(
        a.unionByName(b).groupBy("idx").agg(F.max("r").alias("r"))
    )
    assert merged == whole


def test_hll_accuracy_within_theory(events):
    """p=10 standard error is 1.04/sqrt(1024) ~ 3.3%; assert the
    estimate lands within 4 sigma of the exact count."""
    row = SK.hll_cardinality(events, "user_id", 10).collect()[0]
    rel = abs(row["estimate"] - row["n_exact"]) / row["n_exact"]
    assert rel < 4 * 1.04 / (1024 ** 0.5)


def test_kmv_set_ops_vs_oracle(events, con):
    s = _pairs(SK.kmv_set_ops(events))
    o = sorted(map(tuple, con.execute(SK.kmv_set_ops_sql()).fetchall()))
    assert s == o


def test_kmv_set_ops_subcapacity_is_exact(events, con):
    """With k above the union cardinality the sketch is lossless: the
    union estimate equals the exact count and the intersection estimate
    equals the exact intersection."""
    row = SK.kmv_set_ops(events, k=4096).collect()[0]
    assert row["union_est"] == float(row["n_union_exact"])
    assert row["inter_est"] == pytest.approx(float(row["n_inter_exact"]))
    o = con.execute(SK.kmv_set_ops_sql(k=4096)).fetchall()[0]
    assert tuple(row) == o


def test_weighted_reservoir_vs_oracle(docs, con):
    s = _pairs(weighted_reservoir(docs))
    o = sorted(map(tuple, con.execute(weighted_reservoir_sql()).fetchall()))
    assert s == o


def test_weighted_reservoir_biases_toward_weight(docs):
    """Probability-proportional-to-size: the sampled docs' mean n_chars
    exceeds the corpus mean (553-vs-48 weight spread makes this
    overwhelmingly likely for k=32 of 500)."""
    sample = weighted_reservoir(docs, k=32)
    mean_s = sample.agg(F.avg("weight")).collect()[0][0]
    mean_c = docs.agg(F.avg("n_chars")).collect()[0][0]
    assert sample.count() == 32
    assert mean_s > mean_c


def test_weighted_reservoir_is_subset_and_deterministic(docs):
    ids = {r["doc_id"] for r in weighted_reservoir(docs, k=16).collect()}
    again = {r["doc_id"] for r in weighted_reservoir(docs, k=16).collect()}
    allids = {r["doc_id"] for r in docs.select("doc_id").collect()}
    assert ids == again and ids <= allids and len(ids) == 16
