"""Round-5 operator additions: EQL runs=N + multi-key by."""

from __future__ import annotations

import datetime as dt

import pytest


def _write_events(tmp_path, rows):
    """rows: (user_id, ts, event_type, props_json)."""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    pdf = pd.DataFrame(
        {
            "event_id": list(range(len(rows))),
            "ts": [ts for _, ts, _, _ in rows],
            "user_id": [u for u, _, _, _ in rows],
            "event_type": [t for _, _, t, _ in rows],
            "value": [1.0] * len(rows),
            "props": [p for _, _, _, p in rows],
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


def test_eql_runs_expansion_equals_repeated_steps():
    from smse_backend_spark.operators.relational import _expand_runs

    assert _expand_runs(("a", "b"), (1, 3)) == ["a", "b", "b", "b"]
    assert _expand_runs(("a", "b"), None) == ["a", "b"]
    with pytest.raises(ValueError):
        _expand_runs(("a", "b"), (1,))
    with pytest.raises(ValueError):
        _expand_runs(("a",), (0,))


def test_eql_sequence_runs_planted(spark, tmp_path):
    """[view] [click] with runs=2 == view click click. User 1 has two
    clicks after a view (match); user 2 has only one click (no match);
    user 3's LATER view gives the minimal span (greedy-vs-optimal with
    a repeated step)."""
    from smse_backend_spark.operators.relational import eql_sequence

    base = dt.datetime(2024, 5, 6, 12, 0, 0)
    m = dt.timedelta(minutes=1)
    rows = [
        (1, base, "view", "{}"),
        (1, base + 1 * m, "click", "{}"),
        (1, base + 2 * m, "click", "{}"),
        (2, base, "view", "{}"),
        (2, base + 1 * m, "click", "{}"),
        (3, base, "view", "{}"),
        (3, base + 98 * m, "view", "{}"),
        (3, base + 99 * m, "click", "{}"),
        (3, base + 100 * m, "click", "{}"),
    ]
    sf = _write_events(tmp_path, rows)
    got = {r["user_id"]: r["min_span_us"]
           for r in eql_sequence(spark, sf, steps=("view", "click"),
                                 runs=(1, 2), within_hours=24).collect()}
    assert got == {1: 2 * 60_000_000, 3: 2 * 60_000_000}


def test_eql_sequence_multikey_planted(spark, tmp_path):
    """by user_id, k_bucket: every step must agree on BOTH keys — a
    chain whose steps sit in different k buckets is not a chain."""
    from smse_backend_spark.operators.relational import eql_sequence

    base = dt.datetime(2024, 5, 6, 12, 0, 0)
    m = dt.timedelta(minutes=1)
    rows = [
        # user 1: click is in a different bucket -> no chain
        (1, base, "view", '{"k": 0}'),
        (1, base + 1 * m, "click", '{"k": 1}'),
        (1, base + 2 * m, "purchase", '{"k": 0}'),
        # user 2: all steps in bucket 2 -> match
        (2, base, "view", '{"k": 2}'),
        (2, base + 1 * m, "click", '{"k": 2}'),
        (2, base + 2 * m, "purchase", '{"k": 6}'),  # 6 % 4 == 2
    ]
    sf = _write_events(tmp_path, rows)
    got = [(r["user_id"], r["k_bucket"], r["min_span_us"])
           for r in eql_sequence(
               spark, sf, within_hours=24,
               by_cols=("user_id", "k_bucket")).collect()]
    assert got == [(2, 2, 2 * 60_000_000)]


def test_eql_sequence_runs_and_multikey_match_oracle(spark, sf_smoke):
    import duckdb

    from smse_backend_spark.operators.relational import (
        eql_sequence,
        eql_sequence_sql,
    )

    con = duckdb.connect()
    con.execute(
        "create view events as select * from "
        f"'{sf_smoke}/events.parquet'"
    )
    for kwargs in [
        {"steps": ("view", "click"), "runs": (1, 2), "within_hours": 24},
        {"steps": ("view", "purchase"), "within_hours": 24,
         "by_cols": ("user_id", "k_bucket")},
        {"steps": ("view", "click"), "runs": (2, 1), "within_hours": 48,
         "by_cols": ("user_id", "k_bucket"), "until": "purchase"},
    ]:
        s = sorted(map(tuple,
                       eql_sequence(spark, sf_smoke, **kwargs).collect()))
        o = sorted(map(tuple,
                       con.execute(eql_sequence_sql(**kwargs)).fetchall()))
        assert s == o and len(s) > 0, kwargs
