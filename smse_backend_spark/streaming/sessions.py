"""Custom stateful streaming: gap-based sessionization via
``applyInPandasWithState``.

The reference's only stateful construct is the Celery task state machine
(PENDING -> SUCCESS, smse_backend/tasks.py:299-355); this module carries
the engine's custom-stateful-operator pattern for the streaming side:
arbitrary per-key state (here: the open session) maintained across
micro-batches with event-time timeouts.

Semantics (classic inactivity-gap sessions, per user):
- events sorted by time; a gap > ``gap`` closes the session at the earlier
  event (closed-by-data sessions emit immediately — a later event proves
  the gap, no watermark wait needed);
- the key's LAST open session is held in state and emitted only when the
  event-time watermark passes ``last_ts + gap`` (fires in the trailing
  no-data micro-batch under AvailableNow);
- sessions still open at the final watermark stay in state — exactly the
  append-mode late-data contract of ``events.windowed_event_rollup``, and
  exactly what the DuckDB oracle below encodes.

The kernel is vectorized: per Arrow batch it is pandas/numpy column ops
(sort, diff, cumsum group split, groupby-agg), no per-row Python.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from smse_backend_spark.streaming.events import EVENTS_SCHEMA

SESSION_SCHEMA = (
    "user_id long, session_start timestamp, session_end timestamp, "
    "n_events int, total_value double"
)
# open-session state: micros since epoch for exact arithmetic
STATE_SCHEMA = "first_us long, last_us long, n int, total double"

_US = 1_000_000


def _make_session_fn(gap_seconds: int):
    gap_us = gap_seconds * _US

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.hasTimedOut:
            first_us, last_us, n, total = state.get
            state.remove()
            yield _emit(user_id, [(first_us, last_us, n, total)])
            return

        rows = [p[["ts", "value"]] for p in pdfs if not p.empty]
        if not rows:
            return
        ev = pd.concat(rows, ignore_index=True).sort_values("ts", ignore_index=True)
        us = ev["ts"].astype("int64") // 1000  # ns -> us (exact)
        val = ev["value"].astype("float64")

        # 1. split the batch standalone (no state seeding): consecutive
        #    groups are > gap apart by construction
        prev = us.shift(1)
        boundary = (us - prev) > gap_us
        boundary.iloc[0] = True
        sess_id = boundary.cumsum()
        agg = (
            pd.DataFrame({"s": sess_id, "us": us, "v": val})
            .groupby("s", sort=True)
            .agg(first=("us", "min"), last=("us", "max"),
                 n=("us", "size"), total=("v", "sum"))
        )
        groups = [
            (int(r["first"]), int(r["last"]), int(r["n"]), float(r["total"]))
            for _, r in agg.iterrows()
        ]

        # 2. fold the open state session in as an interval: any group within
        #    gap of (or overlapping) the state span [first_us, last_us]
        #    merges into it with min/max bounds — events may legally arrive
        #    BEFORE the state's last event (out-of-order across micro-
        #    batches, inside the watermark) and must neither re-open a
        #    boundary nor shrink session_end. Chains are covered: a group
        #    not merging against the ORIGINAL span is > gap from every
        #    merged group too (standalone groups are > gap apart).
        if state.exists:
            first_us, last_us, n, total = state.get
            merged = (first_us, last_us, n, total)
            rest: list[tuple[int, int, int, float]] = []
            for g in groups:
                if g[0] <= last_us + gap_us and g[1] >= first_us - gap_us:
                    merged = (
                        min(merged[0], g[0]), max(merged[1], g[1]),
                        merged[2] + g[2], merged[3] + g[3],
                    )
                else:
                    rest.append(g)
            sessions = sorted(rest + [merged])
        else:
            sessions = groups

        # all but the newest session were closed by a later event -> emit now
        closed, open_ = sessions[:-1], sessions[-1]
        state.update(open_)
        state.setTimeoutTimestamp((open_[1] + gap_us) // 1000)  # ms
        if closed:
            yield _emit(user_id, closed)

    return fn


def _emit(user_id: int, sessions: list[tuple]) -> pd.DataFrame:
    return pd.DataFrame(
        {
            "user_id": user_id,
            "session_start": [pd.Timestamp(s[0], unit="us") for s in sessions],
            "session_end": [pd.Timestamp(s[1], unit="us") for s in sessions],
            "n_events": [s[2] for s in sessions],
            "total_value": [round(s[3], 6) for s in sessions],
        }
    )


def sessionize(
    spark: SparkSession,
    source_dir: str,
    out_path: str,
    checkpoint: str,
    gap_minutes: int = 30,
    watermark: str = "2 hours",
) -> None:
    """Drain the event stream into per-user inactivity-gap sessions."""
    from smse_backend_spark.session import ensure_pyfiles

    ensure_pyfiles(spark)
    events = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .parquet(source_dir)
        .select(
            "user_id",
            F.col("ts").cast("timestamp").alias("ts"),
            "value",
        )
        .withWatermark("ts", watermark)
    )
    sessions = events.groupBy("user_id").applyInPandasWithState(
        _make_session_fn(gap_minutes * 60),
        outputStructType=SESSION_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
    q = (
        sessions.writeStream.outputMode("append")
        .format("parquet")
        .option("path", out_path)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def sessionized_events_df(
    spark: SparkSession, sf_dir: str, out_root: str,
    gap_minutes: int = 30, watermark_hours: int = 2,
) -> DataFrame:
    """Driver-contract wrapper (idempotent via checkpoint), deterministic
    column types for the oracle compare."""
    import os
    import shutil

    src = os.path.join(out_root, "src")
    out = os.path.join(out_root, "out")
    ckpt = os.path.join(out_root, "ckpt")
    if not os.path.exists(src):
        os.makedirs(src)
        shutil.copy(os.path.join(sf_dir, "events.parquet"),
                    os.path.join(src, "part-0.parquet"))
    sessionize(spark, src, out, ckpt, gap_minutes, f"{watermark_hours} hours")
    return spark.read.parquet(out).select(
        "user_id",
        F.col("session_start").cast("timestamp_ntz").alias("session_start"),
        F.col("session_end").cast("timestamp_ntz").alias("session_end"),
        "n_events",
        F.round("total_value", 6).alias("total_value"),
    )


def sessionized_events_sql(gap_minutes: int = 30, watermark_hours: int = 2) -> str:
    """Batch twin: lag-gap session split; a user's last session emits only
    if the final watermark (max ts - delay) passed its timeout."""
    return f"""
WITH s AS (
  SELECT user_id, event_id, ts, value,
         CASE WHEN lag(ts) OVER w IS NULL
                   OR ts - lag(ts) OVER w > INTERVAL {gap_minutes} MINUTE
              THEN 1 ELSE 0 END AS is_new
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
g AS (
  SELECT *, sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS UNBOUNDED PRECEDING) AS sess
  FROM s
),
agg AS (
  SELECT user_id, sess, min(ts) AS session_start, max(ts) AS session_end,
         count(*)::INT AS n_events, round(sum(value), 6) AS total_value
  FROM g GROUP BY user_id, sess
),
ranked AS (
  SELECT *, max(sess) OVER (PARTITION BY user_id) AS last_sess FROM agg
)
SELECT user_id, session_start, session_end, n_events, total_value
FROM ranked
WHERE sess < last_sess
   OR session_end + INTERVAL {gap_minutes} MINUTE
      < (SELECT max(ts) - INTERVAL {watermark_hours} HOUR FROM events)
"""
