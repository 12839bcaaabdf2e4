"""Round-4 session-6 additions: ES nested query semantics, calendar
date_histogram with time_zone, hard-negative mining, sliding-window
streaming trending."""

from __future__ import annotations

import datetime as dt

import numpy as np
import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE


# --- nested query ----------------------------------------------------------


def test_nested_same_child_vs_flattened(spark, tmp_path):
    """The canonical ES nested lesson on planted data: order 1's quantity
    and discount clauses are satisfied by DIFFERENT lineitems (flattened
    matches, nested must not); order 2 has one child satisfying both."""
    from smse_backend_spark.operators.relational import (
        nested_order_search,
        nested_vs_flattened,
    )

    li = spark.createDataFrame(
        [
            # order 1: qty hit on child A, discount hit on child B
            (1, 50.0, 0.01),
            (1, 1.0, 0.09),
            # order 2: one child satisfies both clauses, twice
            (2, 50.0, 0.09),
            (2, 48.0, 0.08),
            # order 3: matches neither
            (3, 1.0, 0.01),
        ],
        "l_orderkey long, l_quantity double, l_discount double",
    )
    orders = spark.createDataFrame(
        [(1, 10.0), (2, 20.0), (3, 30.0)],
        "o_orderkey long, o_totalprice double",
    )
    sf = str(tmp_path)
    li.write.parquet(f"{sf}/lineitem.parquet")
    orders.write.parquet(f"{sf}/orders.parquet")

    got = nested_order_search(spark, sf, 45.0, 0.07, 10).collect()
    assert [(r["o_orderkey"], r["n_matched"]) for r in got] == [(2, 2)]

    row = nested_vs_flattened(spark, sf, 45.0, 0.07).first()
    assert row["n_nested"] == 1
    assert row["n_flattened"] == 2  # order 1 is the cross-child FP
    assert row["n_false_positive"] == 1


def test_nested_search_matches_oracle(spark, sf_smoke):
    import duckdb

    from smse_backend_spark.operators.relational import (
        nested_order_search,
        nested_order_search_sql,
        nested_vs_flattened,
        nested_vs_flattened_sql,
    )

    con = duckdb.connect()
    for t in ("orders", "lineitem"):
        con.execute(
            f"create view {t} as select * from '{sf_smoke}/{t}.parquet'"
        )
    got = sorted(map(tuple, nested_order_search(spark, sf_smoke).collect()))
    want = sorted(map(tuple, con.execute(nested_order_search_sql()).fetchall()))
    assert got == want
    got1 = [tuple(nested_vs_flattened(spark, sf_smoke).first())]
    want1 = [tuple(con.execute(nested_vs_flattened_sql()).fetchone())]
    assert got1 == want1
    # nested ⊆ flattened
    assert got1[0][0] <= got1[0][1]


# --- calendar date_histogram -----------------------------------------------


def test_calendar_week_tz_boundary(spark, tmp_path):
    """An event late Sunday UTC belongs to the NEXT local week under
    +05:30 — the shift no epoch-aligned fixed interval reproduces.
    2024-01-07 is a Sunday; 20:00 UTC = 01:30 Monday local."""
    from smse_backend_spark.operators.relational import (
        event_calendar_histogram,
    )

    rows = [
        (1, dt.datetime(2024, 1, 7, 10, 0, 0), 1.0),   # Sunday local+utc: week of Jan 1
        (2, dt.datetime(2024, 1, 7, 20, 0, 0), 1.0),   # Monday 01:30 local: week of Jan 8
        (3, dt.datetime(2024, 1, 9, 12, 0, 0), 1.0),   # Tuesday: week of Jan 8
    ]
    e = spark.createDataFrame(
        [(i, ts, 7, "click", v, "{}") for i, ts, v in rows],
        "event_id long, ts timestamp_ntz, user_id long, event_type string, "
        "value double, props string",
    )
    sf = str(tmp_path)
    e.write.parquet(f"{sf}/events.parquet")
    got = {
        r["bucket_start"]: r["n"]
        for r in event_calendar_histogram(spark, sf, 330).collect()
    }
    # local week starts: Mon Jan 1 00:00+05:30 = Dec 31 18:30 UTC;
    # Mon Jan 8 00:00+05:30 = Jan 7 18:30 UTC
    wk1 = int(dt.datetime(2023, 12, 31, 18, 30).timestamp())
    wk2 = int(dt.datetime(2024, 1, 7, 18, 30).timestamp())
    assert got == {wk1: 1, wk2: 2}


def test_calendar_histogram_matches_oracle(spark, sf_smoke):
    import duckdb

    from smse_backend_spark.operators.relational import (
        event_calendar_histogram,
        event_calendar_histogram_sql,
    )

    con = duckdb.connect()
    con.execute(
        f"create view events as select * from '{sf_smoke}/events.parquet'"
    )
    got = sorted(map(tuple, event_calendar_histogram(spark, sf_smoke).collect()))
    want = sorted(map(tuple,
                      con.execute(event_calendar_histogram_sql()).fetchall()))
    assert got == want
    # weekly calendar buckets: starts are 7 days apart
    starts = [g[0] for g in got]
    assert all(b - a == 7 * 86400 for a, b in zip(starts, starts[1:]))


# --- hard negatives ---------------------------------------------------------


def test_hard_negatives_exclude_anchor_label(spark, sf_smoke):
    from smse_backend_spark.operators.ann import hard_negatives_topk

    emb = spark.read.parquet(f"{sf_smoke}/embeddings.parquet")
    anchors = {
        int(r["vec_id"]): int(r["label"])
        for r in emb.filter(F.col("vec_id") < 4).collect()
    }
    out = hard_negatives_topk(emb, [0, 1, 2, 3], 8).collect()
    assert {int(r["anchor_id"]) for r in out} == set(anchors)
    for r in out:
        assert int(r["label"]) != anchors[int(r["anchor_id"])]
        assert int(r["vec_id"]) != int(r["anchor_id"])


def test_hard_negatives_equals_numpy_reference(spark, sf_smoke):
    """Exact-mining check: per anchor, the engine's top-8 equals the
    driver-side numpy ranking over different-label rows (rounded score,
    score desc / vec_id asc)."""
    from smse_backend_spark.operators.ann import hard_negatives_topk

    emb = spark.read.parquet(f"{sf_smoke}/embeddings.parquet")
    rows = emb.select("vec_id", "label", "embedding").collect()
    ids = np.array([r["vec_id"] for r in rows], dtype=np.int64)
    labs = np.array([r["label"] for r in rows], dtype=np.int64)
    mat = np.array([r["embedding"] for r in rows], dtype=np.float64)
    mat /= np.linalg.norm(mat, axis=1, keepdims=True)
    got = sorted(
        map(tuple, hard_negatives_topk(emb, [0, 1], 8).collect())
    )
    want = []
    for a in (0, 1):
        ai = int(np.flatnonzero(ids == a)[0])
        sims = np.round(mat @ mat[ai], 6)
        keep = np.flatnonzero(labs != labs[ai])
        order = np.lexsort((ids[keep], -sims[keep]))[:8]
        for rk, j in enumerate(keep[order], start=1):
            want.append((a, rk, int(ids[j]), int(labs[j]), float(sims[j])))
    assert got == sorted(want)


# --- sliding-window trending -------------------------------------------------


def test_streamed_trending_overlap_and_watermark(spark, tmp_path):
    """One event at 07:00 lands in the 02-08, 04-10 and 06-12 windows
    (sliding overlap); only windows closed by the final watermark
    (max_ts - 1h) emit."""
    from smse_backend_spark.streaming.events import streamed_trending_df

    base = dt.datetime(2024, 3, 4, 0, 0, 0)
    rows = [
        (1, base + dt.timedelta(hours=7), "click"),
        # sentinel far ahead so the watermark closes the early windows
        (2, base + dt.timedelta(hours=48), "view"),
    ]
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    pdf = pd.DataFrame(
        {
            "event_id": [i for i, _, _ in rows],
            "ts": [ts for _, ts, _ in rows],
            "user_id": [7] * len(rows),
            "event_type": [t for _, _, t in rows],
            "value": [1.0] * len(rows),
            "props": ["{}"] * len(rows),
        }
    )
    sf = str(tmp_path / "sf")
    (tmp_path / "sf").mkdir()
    schema = pa.schema(
        [
            ("event_id", pa.int64()),
            ("ts", pa.timestamp("us")),
            ("user_id", pa.int64()),
            ("event_type", pa.string()),
            ("value", pa.float64()),
            ("props", pa.string()),
        ]
    )
    pq.write_table(
        pa.Table.from_pandas(pdf, schema=schema), f"{sf}/events.parquet"
    )
    out = streamed_trending_df(spark, sf, str(tmp_path / "stream"), 3)
    got = {(r["window_start"], r["event_type"]): r["n"] for r in out.collect()}
    ep = int(base.timestamp())
    click_windows = {k[0] for k in got if k[1] == "click"}
    assert click_windows == {ep + 2 * 3600, ep + 4 * 3600, ep + 6 * 3600}
    assert all(v == 1 for v in got.values())
    # the sentinel's own windows end after the watermark: never emitted
    assert all(k[1] == "click" for k in got)


def test_streamed_trending_matches_oracle(spark, sf_smoke, tmp_path):
    import duckdb

    from smse_backend_spark.streaming.events import (
        streamed_trending_df,
        streamed_trending_sql,
    )

    con = duckdb.connect()
    con.execute(
        f"create view events as select * from '{sf_smoke}/events.parquet'"
    )
    got = sorted(map(tuple,
                     streamed_trending_df(spark, sf_smoke,
                                          str(tmp_path / "t")).collect()))
    want = sorted(map(tuple, con.execute(streamed_trending_sql()).fetchall()))
    assert got == want


# --- dense_vector metric options ---------------------------------------------


def test_metric_topk_l2_and_mip_vs_oracle(spark, sf_smoke):
    import duckdb

    from smse_backend_spark.operators.ann import metric_topk, metric_topk_sql

    emb = spark.read.parquet(f"{sf_smoke}/embeddings.parquet")
    qvecs = {
        int(r["vec_id"]): [float(x) for x in r["embedding"]]
        for r in emb.filter("vec_id in (0, 1, 2)").collect()
    }
    con = duckdb.connect()
    con.execute(
        f"create view embeddings as select * from '{sf_smoke}/embeddings.parquet'"
    )
    for metric in ("l2_norm", "max_inner_product"):
        got = sorted(map(tuple, metric_topk(emb, qvecs, 10, metric).collect()))
        want = sorted(map(tuple,
                          con.execute(metric_topk_sql([0, 1, 2], 10,
                                                      metric)).fetchall()))
        assert got == want, metric
    # ES transform laws: l2 score in (0, 1]; the query's own vector is
    # its own l2 nearest (d=0 -> score exactly 1.0)
    l2 = metric_topk(emb, qvecs, 10, "l2_norm").collect()
    for r in l2:
        assert 0.0 < r["score"] <= 1.0
        if r["rank"] == 1:
            assert r["vec_id"] == r["query_id"] and r["score"] == 1.0


def test_metric_topk_mip_transform_monotone(spark, sf_smoke):
    """max_inner_product transform: branches map to score > 1 (mip>=0)
    and score in (0, 1) (mip<0); rank order == raw mip order."""
    import numpy as np

    from smse_backend_spark.operators.ann import metric_topk

    emb = spark.read.parquet(f"{sf_smoke}/embeddings.parquet")
    rows = emb.collect()
    ids = np.array([r["vec_id"] for r in rows])
    mat = np.array([r["embedding"] for r in rows], dtype=np.float64)
    q = {0: [float(x) for x in mat[ids == 0][0]]}
    got = metric_topk(emb, q, 10, "max_inner_product").collect()
    raw = {int(i): float(v) for i, v in zip(ids, mat @ np.asarray(q[0]))}
    scores = [r["score"] for r in got]
    assert scores == sorted(scores, reverse=True)
    for r in got:
        mip = raw[int(r["vec_id"])]
        assert (r["score"] > 1.0) == (round(mip, 9) >= 0.0) or abs(mip) < 1e-9


# --- BPE merge round ---------------------------------------------------------


def test_bpe_merge_step_planted(spark):
    """Planted corpus: 'ab' is the dominant pair; after the merge it
    vanishes from the pair table and the merged symbol pairs with its
    neighbors. Greedy left-to-right: 'aaa' with winner (a,a) yields
    exactly one merged symbol + one leftover 'a'."""
    from smse_backend_spark.operators.bpe import bpe_merge_step

    docs = spark.createDataFrame(
        [(0, "abc abc abd"), (1, "abc zq")],
        "doc_id long, text string",
    )
    out = {(r["phase"], r["left"], r["right"]): (r["cnt"], r["rank"])
           for r in bpe_merge_step(docs, 10).collect()}
    assert out[("before", "a", "b")] == (4, 1)
    # after: (a,b) gone; merged symbol 'ab' now pairs with c/d
    assert ("after", "a", "b") not in out
    assert out[("after", "ab", "c")][0] == 3
    assert out[("after", "ab", "d")][0] == 1

    docs2 = spark.createDataFrame([(0, "aaa aaa")], "doc_id long, text string")
    out2 = [(r["phase"], r["left"], r["right"], r["cnt"])
            for r in bpe_merge_step(docs2, 10).collect()]
    # winner (a,a): 'aaa' -> ['aa', 'a'], so after-pairs = ('aa','a') x2
    assert ("after", "aa", "a", 2) in out2
    assert ("after", "a", "a", 2) not in out2


def test_bpe_merge_step_matches_oracle(spark, sf_smoke):
    import duckdb

    from smse_backend_spark.operators.bpe import (
        bpe_merge_step,
        bpe_merge_step_sql,
    )

    con = duckdb.connect()
    con.execute(
        f"create view documents as select * from '{sf_smoke}/documents.parquet'"
    )
    got = sorted(map(tuple, bpe_merge_step(
        spark.read.parquet(f"{sf_smoke}/documents.parquet"), 5).collect()))
    want = sorted(map(tuple, con.execute(bpe_merge_step_sql(5)).fetchall()))
    assert got == want


# --- plan shapes for the session-6 ops ---------------------------------------


def _plan_of(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_nested_search_plan_pushes_child_predicates(spark, sf_correct):
    """Both nested clause predicates must reach the lineitem parquet scan
    (row-group pruning is the whole point at 100 TB), and the plan must
    end in a TakeOrderedAndProject, not a global sort."""
    from smse_backend_spark.operators.relational import nested_order_search

    plan = _plan_of(nested_order_search(spark, sf_correct))
    assert "PushedFilters" in plan
    # the plan string truncates long filter lists ("GreaterThanOr..."),
    # so assert the first pushed range plus column pruning to the three
    # needed child columns — the discount predicate rides the same scan
    assert "GreaterThanOrEqual(l_quantity,45.0)" in plan
    assert (
        "ReadSchema: struct<l_orderkey:bigint,l_quantity:double,"
        "l_discount:double>" in plan
    )
    assert "TakeOrderedAndProject" in plan


def test_calendar_histogram_plan_is_one_agg_no_udf(spark, sf_correct):
    """Bucket arithmetic is pure Column algebra: no Python evals in the
    plan, exactly one shuffle (the partial->final agg exchange)."""
    from smse_backend_spark.operators.relational import (
        event_calendar_histogram,
    )

    plan = _plan_of(event_calendar_histogram(spark, sf_correct))
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert plan.count("Exchange hashpartitioning") == 1
    assert "HashAggregate" in plan


def test_bpe_pair_counts_run_on_vocab_not_corpus(spark, sf_correct):
    """The words frame (vocab-sized) is aggregated BEFORE pair explosion:
    the pair-count input must be the cached words aggregate, not a
    second corpus scan; and no per-row Python appears anywhere."""
    from smse_backend_spark.operators.bpe import bpe_merge_step

    plan = _plan_of(bpe_merge_step(
        spark.read.parquet(f"{sf_correct}/documents.parquet"), 5))
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    # corpus text is only read for the words agg, which is cached: the
    # final plan reads the InMemoryRelation, not documents.parquet
    assert "InMemoryTableScan" in plan


# --- EQL sequence ------------------------------------------------------------


def _write_events(tmp_path, rows):
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    pdf = pd.DataFrame(
        {
            "event_id": list(range(len(rows))),
            "ts": [ts for _, ts, _ in rows],
            "user_id": [u for u, _, _ in rows],
            "event_type": [t for _, _, t in rows],
            "value": [1.0] * len(rows),
            "props": ["{}"] * len(rows),
        }
    )
    schema = pa.schema([
        ("event_id", pa.int64()), ("ts", pa.timestamp("us")),
        ("user_id", pa.int64()), ("event_type", pa.string()),
        ("value", pa.float64()), ("props", pa.string()),
    ])
    sf = str(tmp_path / "sf")
    (tmp_path / "sf").mkdir(exist_ok=True)
    pq.write_table(pa.Table.from_pandas(pdf, schema=schema),
                   f"{sf}/events.parquet")
    return sf


def test_eql_sequence_later_start_beats_greedy(spark, tmp_path):
    """The case a first-match-only engine gets wrong: user 1's earliest
    view leads to a chain spanning 101 min, but a later view completes
    within 3 — the minimal-cover sweep must find it. User 2 has the
    steps OUT OF ORDER (purchase before click): no match."""
    from smse_backend_spark.operators.relational import eql_sequence

    base = dt.datetime(2024, 5, 6, 12, 0, 0)
    m = dt.timedelta(minutes=1)
    rows = [
        (1, base, "view"),
        (1, base + 100 * m, "view"),
        (1, base + 101 * m, "click"),
        (1, base + 102 * m, "purchase"),
        (2, base, "view"),
        (2, base + 1 * m, "purchase"),
        (2, base + 2 * m, "click"),
    ]
    sf = _write_events(tmp_path, rows)
    got = {r["user_id"]: r["min_span_us"]
           for r in eql_sequence(spark, sf, within_hours=1).collect()}
    assert got == {1: 2 * 60_000_000}


def test_eql_sequence_strictly_increasing_and_window(spark, tmp_path):
    """Equal timestamps do not chain (strict >); a chain spanning exactly
    the window passes, one microsecond over fails."""
    from smse_backend_spark.operators.relational import eql_sequence

    base = dt.datetime(2024, 5, 6, 12, 0, 0)
    h = dt.timedelta(hours=1)
    us = dt.timedelta(microseconds=1)
    rows = [
        # user 1: click shares the view's timestamp -> no chain
        (1, base, "view"),
        (1, base, "click"),
        (1, base + h, "purchase"),
        # user 2: exactly 24h end-to-end -> passes (<=)
        (2, base, "view"),
        (2, base + h, "click"),
        (2, base + 24 * h, "purchase"),
        # user 3: 24h + 1us -> fails
        (3, base, "view"),
        (3, base + h, "click"),
        (3, base + 24 * h + us, "purchase"),
    ]
    sf = _write_events(tmp_path, rows)
    got = {r["user_id"]: r["min_span_us"]
           for r in eql_sequence(spark, sf, within_hours=24).collect()}
    assert got == {2: 24 * 3_600_000_000}


def test_eql_sequence_matches_oracle(spark, sf_smoke):
    import duckdb

    from smse_backend_spark.operators.relational import (
        eql_sequence,
        eql_sequence_sql,
    )

    con = duckdb.connect()
    con.execute(
        f"create view events as select * from '{sf_smoke}/events.parquet'"
    )
    got = sorted(map(tuple, eql_sequence(spark, sf_smoke).collect()))
    want = sorted(map(tuple, con.execute(eql_sequence_sql()).fetchall()))
    assert got == want


def test_eql_sequence_plan_projects_before_shuffle(spark, sf_correct):
    """Only (user_id, event_type, us) may cross the per-key shuffle —
    event payloads (props/value) must be pruned at the scan, and the
    step-type filter must be pushed."""
    from smse_backend_spark.operators.relational import eql_sequence

    plan = _plan_of(eql_sequence(spark, sf_correct))
    assert "PushedFilters" in plan
    assert "In(event_type" in plan
    assert "ReadSchema: struct<ts:timestamp_ntz,user_id:bigint," \
           "event_type:string>" in plan
    assert "props" not in plan.split("ReadSchema")[1][:200]


def test_eql_sequence_until_cancels(spark, tmp_path):
    """An until event strictly inside the chain interval cancels it; one
    at or outside the endpoints does not (EQL's until fires BETWEEN
    sequence events, not on them)."""
    from smse_backend_spark.operators.relational import eql_sequence

    base = dt.datetime(2024, 5, 6, 12, 0, 0)
    m = dt.timedelta(minutes=1)
    rows = [
        # user 1: error strictly inside (view, purchase) -> cancelled
        (1, base, "view"),
        (1, base + 1 * m, "click"),
        (1, base + 2 * m, "error"),
        (1, base + 3 * m, "purchase"),
        # user 2: error exactly AT the purchase timestamp -> not inside
        (2, base, "view"),
        (2, base + 1 * m, "click"),
        (2, base + 2 * m, "purchase"),
        (2, base + 2 * m, "error"),
        # user 3: error before the chain starts -> unaffected
        (3, base - 5 * m, "error"),
        (3, base, "view"),
        (3, base + 1 * m, "click"),
        (3, base + 2 * m, "purchase"),
    ]
    sf = _write_events(tmp_path, rows)
    got = {r["user_id"]: r["min_span_us"]
           for r in eql_sequence(spark, sf, within_hours=1,
                                 until="error").collect()}
    assert got == {2: 2 * 60_000_000, 3: 2 * 60_000_000}
    # without until, user 1 matches too
    plain = {r["user_id"] for r in eql_sequence(spark, sf,
                                                within_hours=1).collect()}
    assert plain == {1, 2, 3}


def test_eql_sequence_until_matches_oracle(spark, sf_smoke):
    import duckdb

    from smse_backend_spark.operators.relational import (
        eql_sequence,
        eql_sequence_sql,
    )

    con = duckdb.connect()
    con.execute(
        f"create view events as select * from '{sf_smoke}/events.parquet'"
    )
    got = sorted(map(tuple,
                     eql_sequence(spark, sf_smoke, until="error").collect()))
    want = sorted(map(tuple,
                      con.execute(eql_sequence_sql(until="error")).fetchall()))
    assert got == want
    # until only removes keys, never adds
    plain = {t[0] for t in map(tuple, eql_sequence(spark, sf_smoke).collect())}
    assert {t[0] for t in got} <= plain
