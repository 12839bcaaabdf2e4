"""History + relational operators vs DuckDB oracles at sf0.01."""

from __future__ import annotations

import duckdb
import pytest

from smse_backend_spark.operators import history as H
from smse_backend_spark.operators import relational as R


@pytest.fixture(scope="module")
def con(sf_correct):
    c = duckdb.connect()
    for t in ["customer", "orders", "lineitem", "nation", "events"]:
        c.execute(f"create view {t} as select * from '{sf_correct}/{t}.parquet'")
    return c


def _cmp(sdf, con, sql):
    got = sorted(map(tuple, sdf.collect()))
    want = sorted(map(tuple, con.execute(sql).fetchall()))
    assert got == want and len(got) > 0


def test_pricing_summary(spark, sf_correct, con):
    _cmp(R.pricing_summary(spark, sf_correct), con, R.pricing_summary_sql())


def test_top_revenue_nations(spark, sf_correct, con):
    _cmp(R.top_revenue_nations(spark, sf_correct), con, R.top_revenue_nations_sql())


def test_customers_without_big_orders(spark, sf_correct, con):
    _cmp(R.customers_without_big_orders(spark, sf_correct), con,
         R.customers_without_big_orders_sql())


def test_latest_orders_per_customer(spark, sf_correct, con):
    _cmp(R.latest_orders_per_customer(spark, sf_correct), con, R.latest_orders_per_customer_sql())


def test_hourly_event_rollup(spark, sf_correct, con):
    _cmp(R.hourly_event_rollup(spark, sf_correct), con, R.hourly_event_rollup_sql())


def test_event_props_extract(spark, sf_correct, con):
    _cmp(R.event_props_extract(spark, sf_correct), con, R.event_props_extract_sql())


def test_history_page_and_counts(spark, sf_correct, con):
    events = spark.read.parquet(f"{sf_correct}/events.parquet")
    _cmp(H.history_page(events, user_id=7, limit=10, offset=5), con,
         H.history_page_sql(7, 10, 5))
    _cmp(H.history_counts(events, min_events=60), con, H.history_counts_sql(60))


def test_persist_and_readback_roundtrip(spark, sf_correct, tmp_path):
    """S9/S10 + J2: persist a search, read history back, hydrate hits."""
    from pyspark.sql import functions as F

    from smse_backend_spark.corpus import load_corpus
    from smse_backend_spark.operators.search import bm25_topk_scan

    corpus = load_corpus(spark, sf_correct)
    results = bm25_topk_scan(corpus, "hash join", 5)
    qp, rp = str(tmp_path / "queries"), str(tmp_path / "records")
    H.persist_search(results, qp, rp, query_id=1, query_text="hash join",
                     user_id=42, retrieved_at="2026-01-01 00:00:00")
    H.persist_search(results, qp, rp, query_id=2, query_text="hash join",
                     user_id=42, retrieved_at="2026-01-02 00:00:00")

    queries = spark.read.parquet(qp)
    records = spark.read.parquet(rp)
    assert queries.count() == 2 and records.count() == 10

    # history: newest first
    page = H.history_page(
        queries.withColumnRenamed("timestamp", "ts").withColumnRenamed("query_id", "event_id"),
        user_id=42, limit=1,
    ).collect()
    assert page[0]["event_id"] == 2

    # hydration join restores content columns for each hit
    contents = corpus.select(F.col("doc_id").alias("content_id"), "path", "repo")
    hydrated = H.hydrate_results(records.filter(F.col("query_id") == 1), contents)
    rows = hydrated.collect()
    assert len(rows) == 5 and all(r["path"] is not None for r in rows)


def test_shipping_priority_and_order_priority_vs_duckdb(spark, sf_smoke):
    import duckdb

    from smse_backend_spark.operators.relational import (
        order_priority_counts,
        order_priority_counts_sql,
        shipping_priority,
        shipping_priority_sql,
    )

    con = duckdb.connect()
    for t in ("orders", "lineitem", "customer"):
        con.execute(
            f"create view {t} as select * from '{sf_smoke}/{t}.parquet'"
        )
    got = [tuple(r) for r in shipping_priority(spark, sf_smoke).collect()]
    want = [tuple(w) for w in con.execute(shipping_priority_sql()).fetchall()]
    assert got == want and got

    got = [tuple(r) for r in order_priority_counts(spark, sf_smoke).collect()]
    want = [tuple(w) for w in
            con.execute(order_priority_counts_sql()).fetchall()]
    assert got == want and got


def test_auto_date_histogram(spark, sf_correct, con):
    _cmp(
        R.auto_date_histogram(spark, sf_correct, 20),
        con,
        R.auto_date_histogram_sql(20),
    )
    got = R.auto_date_histogram(spark, sf_correct, 20).collect()
    # the pick honors the target and uses a ladder step
    assert 1 < len(got) <= 20
    iv = got[0]["interval_sec"]
    assert iv in R.AUTO_HIST_LADDER
    # a looser target allows a finer interval (more, narrower buckets)
    got40 = R.auto_date_histogram(spark, sf_correct, 40).collect()
    _cmp(
        R.auto_date_histogram(spark, sf_correct, 40),
        con,
        R.auto_date_histogram_sql(40),
    )
    assert len(got) < len(got40) <= 40 and got40[0]["interval_sec"] < iv
    # buckets tile: starts are multiples of the interval, counts sum to N
    assert all(r["bucket_start"] % iv == 0 for r in got)
    n_events = sum(r["n"] for r in got)
    assert n_events == spark.read.parquet(f"{sf_correct}/events.parquet").count()


def test_event_pipeline_aggs(spark, sf_correct, con):
    _cmp(
        R.event_pipeline_aggs(spark, sf_correct),
        con,
        R.event_pipeline_aggs_sql(),
    )
    rows = R.event_pipeline_aggs(spark, sf_correct).collect()
    # cumulative sum is a running total; derivative telescopes to it
    assert rows[0]["deriv_n"] is None and rows[0]["cum_n"] == rows[0]["n"]
    for prev, cur in zip(rows, rows[1:]):
        assert cur["cum_n"] == prev["cum_n"] + cur["n"]
        assert cur["deriv_n"] == cur["n"] - prev["n"]
    # 3-bucket moving mean stays within the window's min/max
    for i, r in enumerate(rows):
        win = [x["n"] for x in rows[max(0, i - 2):i + 1]]
        assert min(win) <= r["mov_avg"] <= max(win)


def test_percentile_ranks(spark, sf_correct, con):
    from smse_backend_spark.corpus import load_corpus
    from smse_backend_spark.operators.aggregations import (
        percentile_ranks,
        percentile_ranks_sql,
    )

    c2 = duckdb_docs = None  # noqa: F841 (clarity only)
    import duckdb

    con2 = duckdb.connect()
    con2.execute(
        f"create view documents as select * from '{sf_correct}/documents.parquet'"
    )
    corpus = load_corpus(spark, sf_correct)
    q = "hash join"
    got = [tuple(r) for r in
           percentile_ranks(corpus, q, (100, 300, 10000)).collect()]
    want = [tuple(w) for w in
            con2.execute(percentile_ranks_sql(q, (100, 300, 10000))).fetchall()]
    assert got == want and len(got) == 3
    # monotone in the value, bounded by [0, 100]; a huge value ranks 100%
    pcts = [p for _v, p in got]
    assert pcts == sorted(pcts) and pcts[-1] == 100.0
    assert all(0.0 <= p <= 100.0 for p in pcts)


def test_event_anomalies(spark, sf_correct, con):
    _cmp(
        R.event_anomalies(spark, sf_correct, 2.0),
        con,
        R.event_anomalies_sql(2.0),
    )
    rows = R.event_anomalies(spark, sf_correct, 2.0).collect()
    assert all(abs(r["z"]) > 2.0 for r in rows)
    # anomalies are the tail, not the bulk
    n_buckets = R.event_pipeline_aggs(spark, sf_correct).count()
    assert 0 < len(rows) < n_buckets / 4


def test_event_date_range_agg(spark, sf_correct, con):
    _cmp(
        R.event_date_range_agg(spark, sf_correct),
        con,
        R.event_date_range_agg_sql(),
    )
    rows = {r["key"]: r for r in
            R.event_date_range_agg(spark, sf_correct).collect()}
    assert set(rows) == {k for k, _l, _h in R.DATE_RANGE_BUCKETS}
    n_events = spark.read.parquet(f"{sf_correct}/events.parquet").count()
    # the whole-month range covers the January 2024 fixture entirely,
    # and the four week slices partition it (overlap is the point of
    # the ES filters/date_range contract — whole_month double-counts)
    assert rows["whole_month"]["n"] == n_events
    assert (rows["before_w2"]["n"] + rows["w2_w3"]["n"]
            + rows["w3_w4"]["n"] + rows["from_w4"]["n"]) == n_events
    for r in rows.values():
        assert r["n_users"] <= r["n"]


def test_event_bucket_pipeline(spark, sf_correct, con):
    _cmp(
        R.event_bucket_pipeline(spark, sf_correct, 50, 10),
        con,
        R.event_bucket_pipeline_sql(50, 10),
    )
    rows = R.event_bucket_pipeline(spark, sf_correct, 50, 10).collect()
    # selector kept only qualifying buckets; sort is ratio desc
    assert len(rows) <= 10
    assert all(r["views"] > 0 for r in rows)
    ratios = [r["ratio"] for r in rows]
    assert ratios == sorted(ratios, reverse=True)
    # an impossible selector threshold empties the result on both engines
    got = R.event_bucket_pipeline(spark, sf_correct, 10**9, 10).collect()
    want = con.execute(R.event_bucket_pipeline_sql(10**9, 10)).fetchall()
    assert got == [] and want == []


def test_event_stats_bucket(spark, sf_correct, con):
    _cmp(R.event_stats_bucket(spark, sf_correct), con,
         R.event_stats_bucket_sql())
    row = R.event_stats_bucket(spark, sf_correct).collect()[0]
    assert row["min_n"] <= row["avg_n"] <= row["max_n"]
    assert row["sum_n"] == spark.read.parquet(
        f"{sf_correct}/events.parquet").count()


def test_event_serial_diff(spark, sf_correct, con):
    _cmp(R.event_serial_diff(spark, sf_correct, 24), con,
         R.event_serial_diff_sql(24))
    rows = R.event_serial_diff(spark, sf_correct, 24).collect()
    # the first `lag` buckets have no lagged partner (ES skips them)
    assert all(r["sdiff"] is None for r in rows[:24])
    by_bucket = {r["hour_start"]: r["n"] for r in rows}
    for i, r in enumerate(rows[24:], start=24):
        assert r["sdiff"] == r["n"] - rows[i - 24]["n"]
    # rescale_0_1 spans exactly [0, 1]
    rs = [r["rescaled"] for r in rows]
    assert min(rs) == 0.0 and max(rs) == 1.0
    assert by_bucket  # sanity: non-empty histogram


def test_event_rate(spark, sf_correct, con):
    _cmp(R.event_rate(spark, sf_correct), con, R.event_rate_sql())
    rows = R.event_rate(spark, sf_correct).collect()
    for r in rows:
        # rate_count is n/24 through the shared floor formula
        import math
        assert r["rate_count"] == math.floor(
            (r["n"] / 24.0) * 1e6 + 0.5) / 1e6


def test_event_frequent_item_sets(spark, sf_correct, con):
    _cmp(
        R.event_frequent_item_sets(spark, sf_correct, 0.25),
        con,
        R.event_frequent_item_sets_sql(0.25),
    )
    rows = R.event_frequent_item_sets(spark, sf_correct, 0.25).collect()
    assert rows and all(r["support"] >= 0.25 for r in rows)
    # anti-monotonicity: a pair never out-supports either member
    singles = {r["items"]: r["doc_count"] for r in rows if r["size"] == 1}
    for r in rows:
        if r["size"] == 2:
            i1, i2 = r["items"].split("+")
            for m in (i1, i2):
                if m in singles:
                    assert r["doc_count"] <= singles[m]


def test_runtime_field_agg(spark, sf_correct, con):
    _cmp(R.runtime_field_agg(spark, sf_correct), con,
         R.runtime_field_agg_sql())
    rows = R.runtime_field_agg(spark, sf_correct).collect()
    assert {r["dow"] for r in rows} <= set(range(7))
    assert sum(r["n"] for r in rows) == spark.read.parquet(
        f"{sf_correct}/events.parquet").count()
    # anchor check: 1970-01-01 (epoch day 0) maps to Thursday under
    # 0=Sunday, i.e. (0 + 4) % 7 == 4
    assert (0 + 4) % 7 == 4


def test_event_value_histogram_empty(spark, sf_correct, con):
    _cmp(
        R.event_value_histogram_empty(spark, sf_correct, 10.0, 0, 90),
        con,
        R.event_value_histogram_empty_sql(10.0, 0, 90),
    )
    rows = R.event_value_histogram_empty(
        spark, sf_correct, 10.0, 0, 90).collect()
    # dense axis: consecutive multiples of the interval, no holes
    buckets = [r["bucket"] for r in rows]
    assert buckets == [buckets[0] + 10.0 * i for i in range(len(buckets))]
    # empty buckets are emitted (the data has gaps above the bulk)
    assert any(r["n"] == 0 for r in rows)
    assert sum(r["n"] for r in rows) == spark.read.parquet(
        f"{sf_correct}/events.parquet").count()


def test_terms_shard_error(spark, sf_correct):
    import duckdb

    from smse_backend_spark.corpus import load_corpus
    from smse_backend_spark.operators import aggregations as AG

    con = duckdb.connect()
    con.execute(
        f"create view documents as select * from "
        f"'{sf_correct}/documents.parquet'"
    )
    corpus = load_corpus(spark, sf_correct)
    _cmp(
        AG.terms_shard_error(corpus, 4, 8, 5),
        con,
        AG.terms_shard_error_sql(4, 8, 5),
    )
    rows = AG.terms_shard_error(corpus, 4, 8, 5).collect()
    assert rows and all(r["err"] >= 0 for r in rows)
    # the reported count is a LOWER bound on the exact distinct-doc count
    from pyspark.sql import functions as F
    from smse_backend_spark.functions.tokenizer import tokenize_col
    exact = {
        r["term"]: r["c"]
        for r in corpus.select(
            F.explode(F.array_distinct(tokenize_col("content")))
            .alias("term"))
        .groupBy("term").agg(F.count(F.lit(1)).alias("c")).collect()
    }
    for r in rows:
        assert r["doc_count"] <= exact[r["term"]]
        assert exact[r["term"]] <= r["doc_count"] + r["err"]
    # with shard_size covering the whole vocabulary the error vanishes
    # and counts are exact
    full = AG.terms_shard_error(corpus, 4, 10**6, 5).collect()
    assert all(r["err"] == 0 for r in full)
    for r in full:
        assert r["doc_count"] == exact[r["term"]]


def test_rollup_roundtrip_lossless(spark, sf_correct, con, tmp_path):
    """Weekly served from the daily rollup == weekly computed from raw
    events — additive integer metrics re-aggregate exactly."""
    out = str(tmp_path / "rollup")
    R.build_event_rollup(spark, sf_correct, out)
    _cmp(R.rollup_weekly(spark, out), con, R.rollup_weekly_sql())
    # the rollup itself is day-grained and much smaller than the events
    n_days = spark.read.parquet(out).count()
    n_events = spark.read.parquet(f"{sf_correct}/events.parquet").count()
    assert 0 < n_days < n_events / 10


def test_ingest_pipeline(spark, sf_correct):
    import duckdb

    con = duckdb.connect()
    con.execute(
        f"create view documents as select * from "
        f"'{sf_correct}/documents.parquet'"
    )
    _cmp(R.ingest_pipeline(spark, sf_correct, 5), con,
         R.ingest_pipeline_sql(5))
    rows = R.ingest_pipeline(spark, sf_correct, 5).collect()
    assert all(r["word_count"] >= 5 for r in rows)
    assert all(r["head_token"] != "" for r in rows)
    # drop processor: an impossible floor empties both engines
    got = R.ingest_pipeline(spark, sf_correct, 10**9).collect()
    want = con.execute(R.ingest_pipeline_sql(10**9)).fetchall()
    assert got == [] and want == []


def test_terms_lookup_search(spark, sf_correct):
    import duckdb

    con = duckdb.connect()
    con.execute(
        f"create view documents as select * from "
        f"'{sf_correct}/documents.parquet'"
    )
    _cmp(
        R.terms_lookup_search(spark, sf_correct, "hash join", 3, 10),
        con,
        R.terms_lookup_search_sql("hash join", 3, 10),
    )
    # every hit's source is one the lookup docs carry
    docs = spark.read.parquet(f"{sf_correct}/documents.parquet")
    sources = {r["source"] for r in
               docs.filter("doc_id < 3").select("source").collect()}
    by_id = {r["doc_id"]: r["source"] for r in docs.collect()}
    hits = R.terms_lookup_search(spark, sf_correct, "hash join", 3, 10)
    assert all(by_id[r["doc_id"]] in sources for r in hits.collect())
