"""Generic relational operator coverage over the driver's star schema.

The reference's relational surface is thin (one equi-join, filter_by scans,
order/limit/offset — SURVEY §2.2-2.6); these operators exercise the same
primitives at analytical scale (multi-join, grouped aggregation, windows,
anti-join, date bucketing, JSON extraction) so a reference user's query
patterns all have a home. Every function returns a DataFrame and has a
``*_sql`` DuckDB oracle twin.

Plan hygiene: filters sit on base tables (pushdown), the small sides of
joins are broadcast, top-k is orderBy+limit (TakeOrderedAndProject).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# --- TPC-H Q1-style pricing summary (A-aggregate coverage) -----------------

def pricing_summary(spark: SparkSession, sf_dir: str, cutoff: str = "1998-09-02") -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= cutoff)
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 4).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 4).alias("sum_base_price"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4).alias("sum_disc_price"),
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


def pricing_summary_sql(cutoff: str = "1998-09-02") -> str:
    return f"""
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 4) AS sum_qty,
       round(sum(l_extendedprice), 4) AS sum_base_price,
       round(sum(l_extendedprice * (1 - l_discount)), 4) AS sum_disc_price,
       round(avg(l_quantity), 6) AS avg_qty,
       round(avg(l_discount), 6) AS avg_disc,
       count(*) AS count_order
FROM lineitem WHERE l_shipdate <= TIMESTAMP '{cutoff} 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""


# --- 3-way join + grouped top-k (J1 at scale) -------------------------------

def top_revenue_nations(spark: SparkSession, sf_dir: str, k: int = 10) -> DataFrame:
    """orders x lineitem x customer x nation: revenue per nation, top-k.

    The two small dims broadcast; the fact-fact join shuffles on o_orderkey.
    """
    li, o = _t(spark, sf_dir, "lineitem"), _t(spark, sf_dir, "orders")
    c, n = _t(spark, sf_dir, "customer"), _t(spark, sf_dir, "nation")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4).alias("revenue"),
            F.countDistinct("o_orderkey").alias("n_orders"),
        )
        .orderBy(F.desc("revenue"), F.asc("n_name"))
        .limit(k)
    )


def top_revenue_nations_sql(k: int = 10) -> str:
    return f"""
SELECT n_name,
       round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue,
       count(DISTINCT o_orderkey) AS n_orders
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
GROUP BY n_name
ORDER BY revenue DESC, n_name ASC LIMIT {k}
"""


# --- anti join (uniqueness checks in bulk, SURVEY §2.3) ---------------------

def customers_without_big_orders(
    spark: SparkSession, sf_dir: str, min_price: float = 300000.0
) -> DataFrame:
    """NOT EXISTS in bulk — the reference's per-row uniqueness checks
    (routes/auth.py:29-33) as one left_anti join with the filter pushed
    into the build side."""
    c, o = _t(spark, sf_dir, "customer"), _t(spark, sf_dir, "orders")
    big = o.filter(F.col("o_totalprice") > min_price)
    return (
        c.join(big, c.c_custkey == big.o_custkey, "left_anti")
        .select("c_custkey", "c_name", "c_nationkey")
    )


def customers_without_big_orders_sql(min_price: float = 300000.0) -> str:
    return f"""
SELECT c_custkey, c_name, c_nationkey FROM customer
WHERE NOT EXISTS (
  SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > {min_price}
)
"""


# --- window / rank (§2.8) ----------------------------------------------------

def latest_orders_per_customer(spark: SparkSession, sf_dir: str, per: int = 3) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_orderdate"), F.asc("o_orderkey"))
    return (
        o.withColumn("rn", F.row_number().over(w).cast("long"))
        .filter(F.col("rn") <= per)
        .select("o_custkey", "o_orderkey", "o_orderdate", "rn")
    )


def latest_orders_per_customer_sql(per: int = 3) -> str:
    return f"""
SELECT o_custkey, o_orderkey, o_orderdate, rn FROM (
  SELECT o_custkey, o_orderkey, o_orderdate,
         row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderdate DESC, o_orderkey ASC) AS rn
  FROM orders
) WHERE rn <= {per}
"""


# --- event-time bucketing + JSON (streaming analog in batch; F13) -----------

def hourly_event_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1h window agg over events — the batch twin of the
    structured-streaming rollup in ``streaming/events.py``."""
    e = _t(spark, sf_dir, "events")
    return (
        e.groupBy(
            F.date_trunc("hour", F.col("ts")).alias("hour"),
            F.col("event_type"),
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 6).alias("total_value"),
        )
    )


def hourly_event_rollup_sql() -> str:
    return """
SELECT date_trunc('hour', ts) AS hour, event_type,
       count(*) AS n, round(sum(value), 6) AS total_value
FROM events GROUP BY 1, 2
"""


def event_props_extract(spark: SparkSession, sf_dir: str, min_k: int = 95) -> DataFrame:
    """JSON property extraction (users.preferences analog, F13)."""
    e = _t(spark, sf_dir, "events")
    return (
        e.select(
            "event_id",
            F.get_json_object("props", "$.k").cast("int").alias("k"),
        )
        .filter(F.col("k") >= min_k)
    )


def event_props_extract_sql(min_k: int = 95) -> str:
    return f"""
SELECT event_id, json_extract(props, '$.k')::INT AS k
FROM events WHERE json_extract(props, '$.k')::INT >= {min_k}
"""


def user_prefs_merge(
    spark: SparkSession, sf_dir: str, clear_type: str = "signup"
) -> DataFrame:
    """JSON preferences read/merge/clear (F13) — the dataflow of the
    reference's /user/preferences routes (smse_backend/routes/user.py:92-139):
    PUT merges keys into the stored JSON (last writer wins per key, i.e. an
    iterated ``map_concat``), DELETE clears the map.

    Events model the update stream: each event merges ``{event_type:
    props.k}``; an event of ``clear_type`` clears the user's map. The final
    state — latest value per key among events after the user's last clear —
    is ONE scan + two windows: a running clears-seen count over the
    (user, key-desc) window marks survivors ("no clear after me"), then a
    per-(user, key) rank picks the latest. No self-join, no second pass
    over the event log — at 100 TB of events the log is read once.
    Output: one (user_id, pref_key, pref_value) row per surviving key.
    """
    from pyspark.sql import Window

    e = _t(spark, sf_dir, "events")
    w_desc = Window.partitionBy("user_id").orderBy(
        F.desc("ts"), F.desc("event_id")
    ).rowsBetween(Window.unboundedPreceding, -1)
    clears_after = F.count(
        F.when(F.col("event_type") == clear_type, F.lit(1))
    ).over(w_desc)
    survivors = (
        e.withColumn("clears_after", clears_after)
        .filter((F.col("event_type") != clear_type) & (F.col("clears_after") == 0))
    )
    wk = Window.partitionBy("user_id", "event_type").orderBy(
        F.desc("ts"), F.desc("event_id")
    )
    return (
        survivors.withColumn("rn", F.row_number().over(wk))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            F.col("event_type").alias("pref_key"),
            F.get_json_object("props", "$.k").cast("int").alias("pref_value"),
        )
    )


def user_prefs_merge_sql(clear_type: str = "signup") -> str:
    return f"""
WITH clears AS (
  SELECT user_id, ts AS cts, event_id AS cid FROM (
    SELECT user_id, ts, event_id,
           row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
    FROM events WHERE event_type = '{clear_type}'
  ) WHERE rn = 1
),
upd AS (
  SELECT e.user_id, e.event_type, e.props, e.ts, e.event_id
  FROM events e LEFT JOIN clears c USING (user_id)
  WHERE e.event_type <> '{clear_type}'
    AND (c.user_id IS NULL OR e.ts > c.cts OR (e.ts = c.cts AND e.event_id > c.cid))
),
latest AS (
  SELECT user_id, event_type AS pref_key,
         json_extract(props, '$.k')::INT AS pref_value,
         row_number() OVER (PARTITION BY user_id, event_type ORDER BY ts DESC, event_id DESC) AS rn
  FROM upd
)
SELECT user_id, pref_key, pref_value FROM latest WHERE rn = 1
"""


# --- TPC-H Q3-style shipping priority (selective 3-way join + top-k) --------

def shipping_priority(
    spark: SparkSession, sf_dir: str,
    segment: str = "BUILDING", date: str = "1997-06-01",
) -> DataFrame:
    """Unshipped-revenue top-10 per order for one market segment (TPC-H Q3
    shape): filters push to all three base scans, the customer side is a
    selective dimension, the top is one ``TakeOrderedAndProject``."""
    c = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == segment)
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderdate") < date)
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > date)
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
            ).alias("revenue")
        )
        .orderBy(F.desc("revenue"), F.asc("o_orderdate"), F.asc("l_orderkey"))
        .limit(10)
    )


def shipping_priority_sql(
    segment: str = "BUILDING", date: str = "1997-06-01"
) -> str:
    return f"""
SELECT l_orderkey, o_orderdate,
       round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = '{segment}'
  AND o_orderdate < TIMESTAMP '{date} 00:00:00'
  AND l_shipdate > TIMESTAMP '{date} 00:00:00'
GROUP BY l_orderkey, o_orderdate
ORDER BY revenue DESC, o_orderdate ASC, l_orderkey ASC
LIMIT 10
"""


# --- TPC-H Q4-style order-priority check (EXISTS semi-join) -----------------

def order_priority_counts(
    spark: SparkSession, sf_dir: str,
    date: str = "1997-07-01", late_days: int = 60,
) -> DataFrame:
    """Orders in one quarter that had at least one lineitem shipped more
    than ``late_days`` after the order date, counted per priority (TPC-H
    Q4 shape re-keyed to this schema's columns). The EXISTS becomes a
    LEFT SEMI join — each order counted once however many lineitems are
    late."""
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= date)
        & (F.col("o_orderdate") < F.lit(date).cast("timestamp")
           + F.expr("INTERVAL 3 MONTHS"))
    )
    li = _t(spark, sf_dir, "lineitem")
    late = o.join(
        li,
        (o.o_orderkey == li.l_orderkey)
        & (li.l_shipdate > o.o_orderdate + F.expr(f"INTERVAL {late_days} DAYS")),
        "left_semi",
    )
    return (
        late.groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy(F.asc("o_orderpriority"))
    )


def order_priority_counts_sql(
    date: str = "1997-07-01", late_days: int = 60
) -> str:
    return f"""
SELECT o_orderpriority, count(*) AS order_count
FROM orders o
WHERE o.o_orderdate >= TIMESTAMP '{date} 00:00:00'
  AND o.o_orderdate < TIMESTAMP '{date} 00:00:00' + INTERVAL 3 MONTH
  AND EXISTS (
    SELECT 1 FROM lineitem l
    WHERE l.l_orderkey = o.o_orderkey
      AND l.l_shipdate > o.o_orderdate + INTERVAL {late_days} DAY
  )
GROUP BY o_orderpriority
ORDER BY o_orderpriority ASC
"""


# --- As-of join (event -> latest order at event time) -----------------------

def events_asof_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: attribute each user event to the user's most recent
    order at event time (``o_custkey = user_id AND o_orderdate <= ts``,
    winner = max ``(o_orderdate, o_orderkey)``) — the temporal-attribution
    primitive Spark lacks as a built-in (reference analog: SQLAlchemy
    latest-row readback patterns, routes/search.py order-by-created-desc).

    Distributed shape (the classic scalable as-of): probe rows (events)
    and state rows (orders) are unioned, ONE shuffle on the user key, one
    in-partition sort, and a running ``last(ignorenulls)`` window carries
    the latest order forward onto each event row. No range-join explosion
    (never materializes event x order pairs), no per-row Python; cost is
    O((|events|+|orders|) log) within partitions. Hot-user skew is
    bounded by per-user row counts, the same envelope as any per-user
    window; events with no prior order keep NULLs (left semantics).
    """
    ev = _t(spark, sf_dir, "events").select(
        F.col("user_id").alias("k"), F.col("ts").alias("t"),
        "event_id", F.lit(1).alias("is_probe"),
        F.lit(None).cast("long").alias("o_orderkey"),
        F.lit(None).cast("timestamp").alias("o_orderdate"),
        F.lit(None).cast("double").alias("o_totalprice"),
    )
    od = _t(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("k"), F.col("o_orderdate").alias("t"),
        F.lit(None).cast("long").alias("event_id"),
        F.lit(0).alias("is_probe"),
        "o_orderkey", "o_orderdate", "o_totalprice",
    )
    # same-t ordering: orders (is_probe=0) sort BEFORE the probe -> the
    # join is inclusive (<=); among same-t orders the window's last row
    # has the max o_orderkey -> deterministic winner
    w = (
        Window.partitionBy("k")
        .orderBy(F.asc("t"), F.asc("is_probe"), F.asc("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = F.last(
        F.when(
            F.col("is_probe") == 0,
            F.struct("o_orderkey", "o_orderdate", "o_totalprice"),
        ),
        ignorenulls=True,
    ).over(w)
    return (
        ev.unionByName(od)
        .withColumn("c", carried)
        .filter(F.col("is_probe") == 1)
        .select(
            "event_id",
            F.col("k").alias("user_id"),
            F.col("t").alias("ts"),
            F.col("c.o_orderkey").alias("o_orderkey"),
            F.col("c.o_orderdate").alias("o_orderdate"),
            F.col("c.o_totalprice").alias("o_totalprice"),
        )
    )


def events_asof_orders_sql() -> str:
    """DuckDB twin of :func:`events_asof_orders` — explicit window instead
    of ASOF JOIN so the duplicate-date tie rule is pinned, not
    implementation-defined."""
    return """
WITH best AS (
  SELECT e.event_id, o.o_orderkey, o.o_orderdate, o.o_totalprice,
         row_number() OVER (
           PARTITION BY e.event_id
           ORDER BY o.o_orderdate DESC, o.o_orderkey DESC
         ) AS rn
  FROM events e
  JOIN orders o ON o.o_custkey = e.user_id AND o.o_orderdate <= e.ts
)
SELECT e.event_id, e.user_id, e.ts, b.o_orderkey, b.o_orderdate, b.o_totalprice
FROM events e
LEFT JOIN (SELECT * FROM best WHERE rn = 1) b USING (event_id)
"""


# ES auto_date_histogram rounding ladder (seconds) — minute up to week
AUTO_HIST_LADDER = (60, 300, 600, 1800, 3600, 10800, 43200, 86400, 604800)


def _auto_hist_interval(lo: int, hi: int, target_buckets: int) -> int:
    """Smallest ladder interval whose bucket count fits the target —
    the exact integer rule both engines apply (floor-divided bucket ids,
    inclusive count)."""
    for i in AUTO_HIST_LADDER:
        if hi // i - lo // i + 1 <= target_buckets:
            return i
    return AUTO_HIST_LADDER[-1]


def auto_date_histogram(
    spark: SparkSession,
    sf_dir: str,
    target_buckets: int = 20,
) -> DataFrame:
    """ES ``auto_date_histogram``: the engine — not the user — picks the
    interval, the smallest step from a fixed rounding ladder (minute →
    week) that keeps the bucket count within ``target_buckets``. The agg
    dashboards actually want ("show me the trend in ~20 bars") without
    the caller knowing the data's time span; because the pick re-derives
    from the data, the SAME query stays ~20 bars at every corpus scale.

    Returns (bucket_start epoch-seconds, interval_sec, n, total_value)
    ordered by bucket. Session timezone is pinned UTC, so Spark's
    ``ts.cast(long)`` (truncating) and DuckDB's ``floor(epoch(ts))``
    agree bit-for-bit — DuckDB's bare ``::BIGINT`` cast would ROUND the
    fractional seconds and shift boundary events one bucket.

    Scale shape: one (min, max) aggregate — two integers to the driver —
    then one map-side-combined groupBy on an integer bucket id. The
    ladder walk is O(9) driver arithmetic; nothing re-scans.
    """
    e = _t(spark, sf_dir, "events")
    # ts is TIMESTAMP_NTZ: hop through TIMESTAMP (session tz pinned UTC)
    # so the epoch equals DuckDB's epoch(ts) on the same naive value
    epoch = F.col("ts").cast("timestamp").cast("long")
    row = e.agg(
        F.min(epoch).alias("lo"), F.max(epoch).alias("hi")
    ).first()
    if row["lo"] is None:
        return e.select(
            F.lit(0).cast("long").alias("bucket_start"),
            F.lit(0).cast("long").alias("interval_sec"),
            F.lit(0).cast("long").alias("n"),
            F.lit(0.0).alias("total_value"),
        ).limit(0)
    iv = _auto_hist_interval(int(row["lo"]), int(row["hi"]), target_buckets)
    bucket = (F.floor(epoch / F.lit(iv)) * F.lit(iv)).cast("long")
    return (
        e.groupBy(bucket.alias("bucket_start"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.round(F.sum("value"), 6).alias("total_value"),
        )
        .select(
            "bucket_start",
            F.lit(iv).cast("long").alias("interval_sec"),
            "n",
            "total_value",
        )
        .orderBy("bucket_start")
    )


def auto_date_histogram_sql(target_buckets: int = 20) -> str:
    """DuckDB twin of :func:`auto_date_histogram` — the interval pick is
    re-derived IN SQL with the identical integer rule, so the static
    oracle stays correct at every scale factor."""
    cases = " ".join(
        f"WHEN (hi // {i} - lo // {i} + 1) <= {int(target_buckets)} "
        f"THEN {i}"
        for i in AUTO_HIST_LADDER
    )
    return f"""
WITH b AS (
  SELECT min(floor(epoch(ts)))::BIGINT AS lo,
         max(floor(epoch(ts)))::BIGINT AS hi
  FROM events
),
iv AS (
  SELECT (CASE {cases} ELSE {AUTO_HIST_LADDER[-1]} END)::BIGINT AS i FROM b
)
SELECT (floor(epoch(ts))::BIGINT // iv.i) * iv.i AS bucket_start,
       iv.i AS interval_sec,
       count(*)::BIGINT AS n,
       round(sum(value), 6) AS total_value
FROM events CROSS JOIN iv
GROUP BY 1, 2
ORDER BY bucket_start
"""


def event_pipeline_aggs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES pipeline aggregations over the hourly date histogram:
    ``cumulative_sum``, ``derivative`` and a 3-bucket ``moving_fn`` mean
    of the per-bucket event count — the running-total / rate-of-change /
    smoothing trio every monitoring dashboard derives from a histogram.

    Returns (hour_start epoch-seconds, n, cum_n, deriv_n, mov_avg)
    ordered by bucket; deriv_n is NULL for the first bucket (ES emits no
    derivative there), mov_avg uses the trailing window available so far.

    Scale shape: the histogram itself is the only corpus-sized work
    (map-side-combined groupBy on an integer bucket id); the pipeline
    functions run over BUCKET rows — metadata-sized at any corpus scale
    (a year of hourly buckets is 8.8k rows), so the single-partition
    window over buckets is deliberate, not a scale wart. The moving
    average divides an exact integer window sum by its count through the
    shared half-up floor formula.
    """
    from pyspark.sql import Window

    e = _t(spark, sf_dir, "events")
    epoch = F.col("ts").cast("timestamp").cast("long")
    hist = (
        e.groupBy(((F.floor(epoch / F.lit(3600))) * F.lit(3600))
                  .cast("long").alias("hour_start"))
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    w = Window.orderBy("hour_start")
    win3 = w.rowsBetween(-2, 0)
    mov_sum = F.sum("n").over(win3)
    mov_cnt = F.count(F.lit(1)).over(win3)
    mov_avg = (
        F.floor(
            (mov_sum.cast("double") / mov_cnt.cast("double")) * F.lit(1e6)
            + F.lit(0.5)
        ) / F.lit(1e6)
    )
    return (
        hist.select(
            "hour_start",
            "n",
            F.sum("n").over(w.rowsBetween(Window.unboundedPreceding, 0))
            .cast("long").alias("cum_n"),
            (F.col("n") - F.lag("n", 1).over(w)).cast("long").alias("deriv_n"),
            mov_avg.alias("mov_avg"),
        )
        .orderBy("hour_start")
    )


def event_pipeline_aggs_sql() -> str:
    """DuckDB twin of :func:`event_pipeline_aggs` (same floor formula)."""
    return """
WITH hist AS (
  SELECT (floor(epoch(ts))::BIGINT // 3600) * 3600 AS hour_start,
         count(*)::BIGINT AS n
  FROM events GROUP BY 1
)
SELECT hour_start, n,
       sum(n) OVER (ORDER BY hour_start
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         ::BIGINT AS cum_n,
       (n - lag(n, 1) OVER (ORDER BY hour_start))::BIGINT AS deriv_n,
       floor((sum(n) OVER (ORDER BY hour_start
                           ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)::DOUBLE
              / count(*) OVER (ORDER BY hour_start
                               ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
                ::DOUBLE) * 1e6 + 0.5) / 1e6 AS mov_avg
FROM hist
ORDER BY hour_start
"""


def event_moving_percentiles(
    spark: SparkSession, sf_dir: str, window_days: int = 3
) -> DataFrame:
    """ES ``moving_percentiles`` pipeline aggregation, exact flavor: for
    each daily bucket, the p50/p90 of the raw ``value``s in the trailing
    ``window_days``-day window (current day included). ES slides the
    window over per-bucket t-digest SKETCHES and merges them; merging
    exact percentiles means recomputing over the window's union of raw
    values — which is what this does, so the result is what ES
    approximates. Returns (day_start epoch-seconds, n, p50, p90) ordered
    by bucket.

    Plan shape: the distinct-day frame is bucket-sized (metadata at any
    corpus scale) and broadcast; events join it on the half-open day
    interval, replicating each event row at most ``window_days`` times
    (bounded fan-out, no corpus-sized shuffle beyond the final groupBy on
    the day key). ``percentile`` == DuckDB ``quantile_cont``
    bit-identically (same evidence as ``value_percentiles``). At 10^12
    events you'd swap the exact percentile for a mergeable sketch per
    bucket — the ES design — as documented for ``value_percentiles``.
    """
    day_s = 86400
    e = _t(spark, sf_dir, "events")
    epoch = F.col("ts").cast("timestamp").cast("long")
    ev = e.select(
        ((F.floor(epoch / F.lit(day_s))) * F.lit(day_s)).cast("long")
        .alias("day"),
        F.col("value").alias("value"),
    )
    days = ev.select("day").distinct()
    span = window_days * day_s
    j = ev.alias("e").join(
        F.broadcast(days.alias("d")),
        (F.col("e.day") <= F.col("d.day"))
        & (F.col("e.day") > F.col("d.day") - F.lit(span)),
    )
    return (
        j.groupBy(F.col("d.day").alias("day_start"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.percentile("e.value", 0.5).alias("p50"),
            F.percentile("e.value", 0.9).alias("p90"),
        )
        .orderBy("day_start")
    )


def event_moving_percentiles_sql(window_days: int = 3) -> str:
    """DuckDB twin of :func:`event_moving_percentiles` (same half-open
    interval join, same quantile definition)."""
    span = window_days * 86400
    return f"""
WITH ev AS (
  SELECT (floor(epoch(ts))::BIGINT // 86400) * 86400 AS day, value
  FROM events
),
days AS (SELECT DISTINCT day FROM ev)
SELECT d.day::BIGINT AS day_start,
       count(*)::BIGINT AS n,
       quantile_cont(e.value, 0.5) AS p50,
       quantile_cont(e.value, 0.9) AS p90
FROM days d JOIN ev e ON e.day <= d.day AND e.day > d.day - {span}
GROUP BY d.day
ORDER BY day_start
"""


DATE_RANGE_BUCKETS: tuple[tuple[str, int | None, int | None], ...] = (
    # (key, from epoch-seconds inclusive, to exclusive) — the ES
    # date_range agg contract; None = unbounded. 2024-01-01 / -08 / -15
    # / -22 UTC week edges over the fixture's January 2024 span.
    ("before_w2", None, 1704672000),
    ("w2_w3", 1704672000, 1705276800),
    ("w3_w4", 1705276800, 1705881600),
    ("from_w4", 1705881600, None),
    ("whole_month", 1704067200, 1706745600),  # ranges may overlap (ES)
)


def event_date_range_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES ``date_range`` bucket aggregation over events: named ranges
    (from inclusive, to exclusive, epoch seconds; unbounded ends open),
    each an independent predicate — overlapping ranges double-count, ES
    semantics. Per bucket: (key, from_s, to_s, n, n_users) where n_users
    is the exact distinct-user count (the HLL swap-in point at 10^12).

    Determinism: counts and distinct counts only — no double sums, so
    every output is an exact integer. Plan shape: ONE scan computes
    every bucket via conditional aggregation (no per-range re-scan, no
    union of jobs); the bucket rows are unpivoted from the single
    aggregate row, so network traffic is constant in corpus size."""
    e = _t(spark, sf_dir, "events")
    epoch = F.col("ts").cast("timestamp").cast("long")
    aggs = []
    for key, lo, hi in DATE_RANGE_BUCKETS:
        cond = F.lit(True)
        if lo is not None:
            cond = cond & (epoch >= F.lit(int(lo)))
        if hi is not None:
            cond = cond & (epoch < F.lit(int(hi)))
        aggs.append(
            F.sum(F.when(cond, 1).otherwise(0)).cast("long")
            .alias(f"n_{key}")
        )
        aggs.append(
            F.countDistinct(F.when(cond, F.col("user_id"))).cast("long")
            .alias(f"u_{key}")
        )
    one = e.agg(*aggs)
    rows = []
    for key, lo, hi in DATE_RANGE_BUCKETS:
        rows.append(
            one.select(
                F.lit(key).alias("key"),
                F.lit(lo).cast("long").alias("from_s"),
                F.lit(hi).cast("long").alias("to_s"),
                F.col(f"n_{key}").alias("n"),
                F.col(f"u_{key}").alias("n_users"),
            )
        )
    out = rows[0]
    for r in rows[1:]:
        out = out.unionByName(r)
    return out.orderBy("key")


def event_date_range_agg_sql() -> str:
    """DuckDB twin of :func:`event_date_range_agg` — the same named
    ranges as one conditional aggregation, unpivoted via UNION ALL."""
    selects = []
    for key, lo, hi in DATE_RANGE_BUCKETS:
        conds = []
        if lo is not None:
            conds.append(f"floor(epoch(ts))::BIGINT >= {int(lo)}")
        if hi is not None:
            conds.append(f"floor(epoch(ts))::BIGINT < {int(hi)}")
        cond = " AND ".join(conds) if conds else "TRUE"
        lo_sql = "NULL::BIGINT" if lo is None else f"{int(lo)}::BIGINT"
        hi_sql = "NULL::BIGINT" if hi is None else f"{int(hi)}::BIGINT"
        selects.append(
            f"SELECT '{key}' AS key, {lo_sql} AS from_s, {hi_sql} AS to_s,\n"
            f"       sum(CASE WHEN {cond} THEN 1 ELSE 0 END)::BIGINT AS n,\n"
            f"       count(DISTINCT CASE WHEN {cond} THEN user_id END)"
            f"::BIGINT AS n_users\nFROM events"
        )
    body = "\nUNION ALL\n".join(selects)
    return f"SELECT * FROM (\n{body}\n) ORDER BY key"


def event_anomalies(
    spark: SparkSession,
    sf_dir: str,
    z_cut: float = 2.0,
) -> DataFrame:
    """Rate-anomaly detection over the hourly event histogram: buckets
    whose count deviates from the corpus mean by more than ``z_cut``
    population standard deviations — the alerting primitive behind every
    ops dashboard ("traffic spike / outage dip at hour X").

    Determinism: mean and variance come from EXACT integer sums
    (Σn, Σn², bucket count) so z is the identical double expression on
    both engines; z is floor-half-up rounded to 6 dp. Returns
    (hour_start, n, z) ordered by hour for |z| > z_cut.

    Scale shape: the histogram groupBy is the only corpus-sized stage;
    the stats are ONE aggregate row over bucket rows (metadata-sized),
    broadcast back as literals via a cross join of a one-row frame.
    """
    e = _t(spark, sf_dir, "events")
    epoch = F.col("ts").cast("timestamp").cast("long")
    hist = (
        e.groupBy(((F.floor(epoch / F.lit(3600))) * F.lit(3600))
                  .cast("long").alias("hour_start"))
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    stats = hist.agg(
        F.count(F.lit(1)).alias("nb"),
        F.sum("n").alias("s1"),
        F.sum(F.col("n") * F.col("n")).alias("s2"),
    )
    nb = F.col("nb").cast("double")
    s1, s2 = F.col("s1").cast("double"), F.col("s2").cast("double")
    mean = s1 / nb
    var = (s2 - s1 * s1 / nb) / nb
    z = (F.col("n").cast("double") - mean) / F.sqrt(var)
    z6 = F.floor(z * F.lit(1e6) + F.lit(0.5)) / F.lit(1e6)
    return (
        hist.crossJoin(F.broadcast(stats))
        .select("hour_start", "n", z6.alias("z"))
        .filter(F.abs(F.col("z")) > float(z_cut))
        .orderBy("hour_start")
    )


def event_anomalies_sql(z_cut: float = 2.0) -> str:
    """DuckDB twin of :func:`event_anomalies` (same integer moments,
    same expression shape, same floor rounding)."""
    return f"""
WITH hist AS (
  SELECT (floor(epoch(ts))::BIGINT // 3600) * 3600 AS hour_start,
         count(*)::BIGINT AS n
  FROM events GROUP BY 1
),
st AS (
  SELECT count(*)::BIGINT AS nb, sum(n)::BIGINT AS s1,
         sum(n * n)::BIGINT AS s2
  FROM hist
)
SELECT hour_start, n,
       floor(((n::DOUBLE - s1::DOUBLE / nb::DOUBLE)
              / sqrt((s2::DOUBLE - s1::DOUBLE * s1::DOUBLE / nb::DOUBLE)
                     / nb::DOUBLE)) * 1e6 + 0.5) / 1e6 AS z
FROM hist CROSS JOIN st
WHERE abs(floor(((n::DOUBLE - s1::DOUBLE / nb::DOUBLE)
                 / sqrt((s2::DOUBLE - s1::DOUBLE * s1::DOUBLE / nb::DOUBLE)
                        / nb::DOUBLE)) * 1e6 + 0.5) / 1e6) > {float(z_cut)!r}
ORDER BY hour_start
"""


def event_bucket_pipeline(
    spark: SparkSession,
    sf_dir: str,
    min_total: int = 50,
    size: int = 10,
) -> DataFrame:
    """ES ``bucket_script`` + ``bucket_selector`` + ``bucket_sort``
    pipeline aggs composed over a daily date histogram of events: per
    day-bucket conditional counts of clicks and views, a scripted
    click/view ratio (``bucket_script``), buckets kept only where total
    events >= ``min_total`` and views > 0 (``bucket_selector``), then
    the top ``size`` buckets by ratio (``bucket_sort``, tie-broken by
    bucket start) — the "best-converting days" dashboard query.

    Returns (day_start epoch-seconds, clicks, views, ratio) — counts are
    exact integers; ratio passes the shared half-up floor at 6 dp.

    Scale shape: ONE map-side-combined groupBy on an integer day id is
    the only corpus-sized work (the conditional counts ride the partial
    agg); selector/script/sort all run over BUCKET rows — metadata-sized
    at any corpus scale — finishing with TakeOrderedAndProject.
    """
    e = _t(spark, sf_dir, "events")
    epoch = F.col("ts").cast("timestamp").cast("long")
    hist = (
        e.groupBy(((F.floor(epoch / F.lit(86400))) * F.lit(86400))
                  .cast("long").alias("day_start"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("total"),
            F.sum(F.when(F.col("event_type") == "click", 1).otherwise(0))
            .cast("long").alias("clicks"),
            F.sum(F.when(F.col("event_type") == "view", 1).otherwise(0))
            .cast("long").alias("views"),
        )
    )
    ratio = (
        F.floor(
            (F.col("clicks").cast("double") / F.col("views").cast("double"))
            * F.lit(1e6) + F.lit(0.5)
        ) / F.lit(1e6)
    )
    return (
        hist.filter((F.col("total") >= int(min_total)) & (F.col("views") > 0))
        .select("day_start", "clicks", "views", ratio.alias("ratio"))
        .orderBy(F.desc("ratio"), F.asc("day_start"))
        .limit(int(size))
    )


def event_bucket_pipeline_sql(min_total: int = 50, size: int = 10) -> str:
    """DuckDB twin of :func:`event_bucket_pipeline`."""
    return f"""
WITH hist AS (
  SELECT (floor(epoch(ts))::BIGINT // 86400) * 86400 AS day_start,
         count(*)::BIGINT AS total,
         sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)::BIGINT
           AS clicks,
         sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)::BIGINT
           AS views
  FROM events GROUP BY 1
)
SELECT day_start, clicks, views,
       floor((clicks::DOUBLE / views::DOUBLE) * 1e6 + 0.5) / 1e6 AS ratio
FROM hist
WHERE total >= {int(min_total)} AND views > 0
ORDER BY ratio DESC, day_start ASC
LIMIT {int(size)}
"""


def event_stats_bucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES sibling pipeline aggregations (``stats_bucket`` ==
    avg/min/max/sum/count ``_bucket``) over the hourly event histogram:
    ONE summary row describing the distribution of per-bucket doc
    counts — the "how bursty is traffic" rollup.

    Returns (n_buckets, min_n, max_n, sum_n, avg_n) — all exact integers
    except avg_n (shared 6 dp floor).

    Scale shape: the histogram groupBy is the only corpus-sized stage;
    the sibling agg reduces BUCKET rows (metadata-sized) to one row.
    """
    e = _t(spark, sf_dir, "events")
    epoch = F.col("ts").cast("timestamp").cast("long")
    hist = (
        e.groupBy(((F.floor(epoch / F.lit(3600))) * F.lit(3600))
                  .cast("long").alias("hour_start"))
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    return hist.agg(
        F.count(F.lit(1)).cast("long").alias("n_buckets"),
        F.min("n").cast("long").alias("min_n"),
        F.max("n").cast("long").alias("max_n"),
        F.sum("n").cast("long").alias("sum_n"),
        (
            F.floor(
                (F.sum("n").cast("double") / F.count(F.lit(1)).cast("double"))
                * F.lit(1e6) + F.lit(0.5)
            ) / F.lit(1e6)
        ).alias("avg_n"),
    )


def event_stats_bucket_sql() -> str:
    """DuckDB twin of :func:`event_stats_bucket`."""
    return """
WITH hist AS (
  SELECT (floor(epoch(ts))::BIGINT // 3600) * 3600 AS hour_start,
         count(*)::BIGINT AS n
  FROM events GROUP BY 1
)
SELECT count(*)::BIGINT AS n_buckets,
       min(n)::BIGINT AS min_n,
       max(n)::BIGINT AS max_n,
       sum(n)::BIGINT AS sum_n,
       floor((sum(n)::DOUBLE / count(*)::DOUBLE) * 1e6 + 0.5) / 1e6 AS avg_n
FROM hist
"""


def event_percentiles_bucket(
    spark: SparkSession, sf_dir: str,
    pcts: tuple[float, ...] = (0.25, 0.5, 0.75, 0.99),
) -> DataFrame:
    """ES ``percentiles_bucket`` sibling pipeline agg over the hourly
    event histogram: exact interpolated percentiles of the per-bucket
    doc counts — "what does a p99 traffic hour look like". ES computes
    this exactly (the bucket array is in coordinator memory, no TDigest),
    which is also why the oracle can be exact: Spark ``percentile`` ==
    DuckDB ``quantile_cont`` bit-for-bit (the event_value_percentiles
    parity precedent). One row (pct, value) per requested percentile,
    value through the shared 6 dp floor.

    Scale shape: the histogram groupBy is the only corpus-sized stage
    (map-side combined); the percentile runs over BUCKET rows —
    metadata-sized, single-partition by design (a year of hours is
    8.8k rows), same as the other sibling aggs."""
    e = _t(spark, sf_dir, "events")
    epoch = F.col("ts").cast("timestamp").cast("long")
    hist = (
        e.groupBy(((F.floor(epoch / F.lit(3600))) * F.lit(3600))
                  .cast("long").alias("hour_start"))
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    arr = ", ".join(repr(float(p)) for p in pcts)
    row = hist.agg(
        F.expr(f"percentile(n, array({arr}))").alias("qs")
    )
    pct_struct = F.array(*[
        F.struct(
            F.lit(float(p)).alias("pct"),
            (
                F.floor(F.element_at("qs", i + 1) * F.lit(1e6) + F.lit(0.5))
                / F.lit(1e6)
            ).alias("value"),
        )
        for i, p in enumerate(pcts)
    ])
    return (
        row.select(F.explode(pct_struct).alias("x"))
        .select("x.pct", "x.value")
        .orderBy("pct")
    )


def event_percentiles_bucket_sql(
    pcts: tuple[float, ...] = (0.25, 0.5, 0.75, 0.99),
) -> str:
    """DuckDB twin of :func:`event_percentiles_bucket`."""
    branches = "\n  UNION ALL\n  ".join(
        f"SELECT {float(p)!r}::DOUBLE AS pct, "
        f"floor(quantile_cont(n, {float(p)!r}) * 1e6 + 0.5) / 1e6 AS value "
        "FROM hist"
        for p in pcts
    )
    return f"""
WITH hist AS (
  SELECT (floor(epoch(ts))::BIGINT // 3600) * 3600 AS hour_start,
         count(*)::BIGINT AS n
  FROM events GROUP BY 1
)
SELECT pct, value FROM (
  {branches}
)
ORDER BY pct
"""


def event_cumulative_cardinality(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """ES ``cumulative_cardinality`` pipeline aggregation: per hourly
    bucket, the number of DISTINCT users seen so far (the "total users
    to date" incremental-uniques curve), plus the per-bucket increment
    (ES docs' derivative-of-cumulative-cardinality recipe for "new users
    per hour"). ES approximates with HLL sketches; here the count is
    EXACT via the first-seen trick: cumulative distinct at bucket b =
    |{users whose FIRST event hour <= b}| — a per-user min() then one
    histogram + running sum, no sketch needed.

    Returns (hour_start, new_users, cum_users) ordered by hour.

    Scale shape: the per-user min is one map-side-combined groupBy on
    user_id (the corpus-sized stage); everything after operates on
    first-seen rows (<= |users|) collapsed to BUCKET rows — the
    single-partition running-sum window is over metadata-sized bucket
    counts, the event_pipeline_aggs discipline.
    """
    from pyspark.sql import Window

    e = _t(spark, sf_dir, "events")
    epoch = F.col("ts").cast("timestamp").cast("long")
    hour = ((F.floor(epoch / F.lit(3600))) * F.lit(3600)).cast("long")
    first_seen = e.select(F.col("user_id"), hour.alias("hour_start")).groupBy(
        "user_id"
    ).agg(F.min("hour_start").alias("hour_start"))
    hist = first_seen.groupBy("hour_start").agg(
        F.count(F.lit(1)).cast("long").alias("new_users")
    )
    w = Window.orderBy("hour_start").rowsBetween(
        Window.unboundedPreceding, 0
    )
    return (
        hist.select(
            "hour_start",
            "new_users",
            F.sum("new_users").over(w).cast("long").alias("cum_users"),
        )
        .orderBy("hour_start")
    )


def event_cumulative_cardinality_sql() -> str:
    """DuckDB twin of :func:`event_cumulative_cardinality`."""
    return """
WITH first_seen AS (
  SELECT user_id,
         min((floor(epoch(ts))::BIGINT // 3600) * 3600) AS hour_start
  FROM events GROUP BY user_id
),
hist AS (
  SELECT hour_start, count(*)::BIGINT AS new_users
  FROM first_seen GROUP BY hour_start
)
SELECT hour_start, new_users,
       sum(new_users) OVER (ORDER BY hour_start
                            ROWS UNBOUNDED PRECEDING)::BIGINT AS cum_users
FROM hist
ORDER BY hour_start
"""


def event_normalize_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES ``normalize`` pipeline aggregation (``method: rescale_0_1``)
    over the daily event-count histogram: each bucket's count rescaled
    to ``(n - min) / (max - min)`` across the sibling buckets — the
    "shape of traffic" curve dashboards overlay across weeks. Constant
    histograms (max == min) rescale to 0, matching ES. The rescaled
    value goes through the shared 6 dp half-up floor so both engines
    agree bit-for-bit.

    Returns (day_start, n, rescaled) ordered by day.

    Scale shape: histogram groupBy is the corpus-sized stage; min/max
    are a sibling agg over BUCKET rows broadcast back — metadata-sized.
    """
    e = _t(spark, sf_dir, "events")
    epoch = F.col("ts").cast("timestamp").cast("long")
    hist = (
        e.groupBy(((F.floor(epoch / F.lit(86400))) * F.lit(86400))
                  .cast("long").alias("day_start"))
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    mm = hist.agg(
        F.min("n").alias("mn"), F.max("n").alias("mx")
    )
    rescaled = F.when(
        F.col("mx") == F.col("mn"), F.lit(0.0)
    ).otherwise(
        F.floor(
            ((F.col("n") - F.col("mn")).cast("double")
             / (F.col("mx") - F.col("mn")).cast("double")) * F.lit(1e6)
            + F.lit(0.5)
        ) / F.lit(1e6)
    )
    return (
        hist.crossJoin(F.broadcast(mm))
        .select("day_start", "n", rescaled.alias("rescaled"))
        .orderBy("day_start")
    )


def event_normalize_agg_sql() -> str:
    """DuckDB twin of :func:`event_normalize_agg`."""
    return """
WITH hist AS (
  SELECT (floor(epoch(ts))::BIGINT // 86400) * 86400 AS day_start,
         count(*)::BIGINT AS n
  FROM events GROUP BY 1
),
mm AS (SELECT min(n) AS mn, max(n) AS mx FROM hist)
SELECT day_start, n,
       CASE WHEN mm.mx = mm.mn THEN 0.0
            ELSE floor(((n - mm.mn)::DOUBLE / (mm.mx - mm.mn)::DOUBLE) * 1e6
                       + 0.5) / 1e6 END AS rescaled
FROM hist CROSS JOIN mm
ORDER BY day_start
"""


def event_scripted_metric(
    spark: SparkSession,
    sf_dir: str,
    pos_types: tuple[str, ...] = ("click", "view"),
) -> DataFrame:
    """ES ``scripted_metric`` aggregation — the docs' canonical "profit"
    example: a map script emits ``+value`` for positive event types and
    ``-value`` otherwise; combine sums per shard; reduce sums the shard
    states. Bucketed per UTC day so the result is a frame, not a scalar.

    Spark-first shape: ES's map/combine/reduce contract IS Spark's
    partial aggregation — the map script is a Column expression, the
    combine script is the map-side partial sum, and the reduce script is
    the exchange-then-final-merge that Tungsten generates for any
    ``sum``. Nothing imperative to schedule: declaring the expression
    gets the same three-phase execution the ES scripted agg hand-rolls.
    Values are quantized to integer cents BEFORE summation (the repo's
    order-independence discipline), so shard count / partitioning can
    never flip a low bit.

    Returns (day_start, n_tx, profit) ordered by day.
    """
    e = _t(spark, sf_dir, "events")
    epoch = F.col("ts").cast("timestamp").cast("long")
    day = ((F.floor(epoch / F.lit(86400))) * F.lit(86400)).cast(
        "long"
    ).alias("day_start")
    cents = F.floor(F.col("value") * F.lit(100.0) + F.lit(0.5)).cast("long")
    signed = F.when(
        F.col("event_type").isin(list(pos_types)), cents
    ).otherwise(-cents)
    return (
        e.groupBy(day)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_tx"),
            (F.sum(signed).cast("double") / F.lit(100.0)).alias("profit"),
        )
        .orderBy("day_start")
    )


def event_scripted_metric_sql(
    pos_types: tuple[str, ...] = ("click", "view"),
) -> str:
    """DuckDB twin of :func:`event_scripted_metric`."""
    in_list = ", ".join("'" + t.replace("'", "''") + "'" for t in pos_types)
    return f"""
SELECT (floor(epoch(ts))::BIGINT // 86400) * 86400 AS day_start,
       count(*)::BIGINT AS n_tx,
       sum(CASE WHEN event_type IN ({in_list})
                THEN floor(value * 100.0 + 0.5)::BIGINT
                ELSE -(floor(value * 100.0 + 0.5)::BIGINT) END)::DOUBLE
         / 100.0 AS profit
FROM events
GROUP BY 1
ORDER BY day_start
"""


def event_serial_diff(
    spark: SparkSession, sf_dir: str, lag: int = 24
) -> DataFrame:
    """ES ``serial_diff`` (lag = 24: day-over-day change of hourly
    counts) + ``normalize`` (method ``rescale_0_1``) pipeline aggs over
    the hourly event histogram — seasonality removal plus a 0-1 rescale
    for plotting.

    Returns (hour_start, n, sdiff, rescaled) ordered by bucket; sdiff is
    NULL for the first ``lag`` buckets (ES emits no value until the
    lagged bucket exists); rescaled = (n - min)/(max - min) through the
    shared 6 dp floor.

    Scale shape: histogram groupBy is the only corpus-sized stage; the
    lag window and min/max run over BUCKET rows (metadata-sized — a year
    of hours is 8.8k rows), so the single-partition window is
    deliberate, same as :func:`event_pipeline_aggs`.
    """
    from pyspark.sql import Window

    e = _t(spark, sf_dir, "events")
    epoch = F.col("ts").cast("timestamp").cast("long")
    hist = (
        e.groupBy(((F.floor(epoch / F.lit(3600))) * F.lit(3600))
                  .cast("long").alias("hour_start"))
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    w = Window.orderBy("hour_start")
    wall = Window.partitionBy()
    lo = F.min("n").over(wall).cast("double")
    hi = F.max("n").over(wall).cast("double")
    rescaled = (
        F.floor(
            ((F.col("n").cast("double") - lo) / (hi - lo)) * F.lit(1e6)
            + F.lit(0.5)
        ) / F.lit(1e6)
    )
    return (
        hist.select(
            "hour_start",
            "n",
            (F.col("n") - F.lag("n", int(lag)).over(w)).cast("long")
            .alias("sdiff"),
            rescaled.alias("rescaled"),
        )
        .orderBy("hour_start")
    )


def event_serial_diff_sql(lag: int = 24) -> str:
    """DuckDB twin of :func:`event_serial_diff`."""
    return f"""
WITH hist AS (
  SELECT (floor(epoch(ts))::BIGINT // 3600) * 3600 AS hour_start,
         count(*)::BIGINT AS n
  FROM events GROUP BY 1
)
SELECT hour_start, n,
       (n - lag(n, {int(lag)}) OVER (ORDER BY hour_start))::BIGINT AS sdiff,
       floor(((n::DOUBLE - min(n) OVER ()::DOUBLE)
              / (max(n) OVER ()::DOUBLE - min(n) OVER ()::DOUBLE)) * 1e6
             + 0.5) / 1e6 AS rescaled
FROM hist
ORDER BY hour_start
"""


def event_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES ``rate`` aggregation inside a daily date histogram, unit =
    hour: per day-bucket the event count and value sum rescaled to a
    per-hour rate (factor 1/24 — the bucket/unit ratio ES computes).

    Returns (day_start, n, rate_count, rate_value) ordered by bucket;
    rates pass the shared 6 dp floor; the value sum itself is summed as
    micro-unit integers (value × 1e6 floor-quantized per row) so the
    aggregation is order-independent before the final divide.

    Scale shape: ONE map-side-combined groupBy on the integer day id;
    the rate arithmetic is per-bucket column algebra.
    """
    e = _t(spark, sf_dir, "events")
    epoch = F.col("ts").cast("timestamp").cast("long")
    vq = F.floor(F.col("value") * F.lit(1e6) + F.lit(0.5)).cast("long")
    hist = (
        e.groupBy(((F.floor(epoch / F.lit(86400))) * F.lit(86400))
                  .cast("long").alias("day_start"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(vq).cast("long").alias("vq"),
        )
    )
    rate_count = (
        F.floor((F.col("n").cast("double") / F.lit(24.0)) * F.lit(1e6)
                + F.lit(0.5)) / F.lit(1e6)
    )
    rate_value = (
        F.floor(((F.col("vq").cast("double") / F.lit(1e6)) / F.lit(24.0))
                * F.lit(1e6) + F.lit(0.5)) / F.lit(1e6)
    )
    return (
        hist.select(
            "day_start", "n",
            rate_count.alias("rate_count"),
            rate_value.alias("rate_value"),
        )
        .orderBy("day_start")
    )


def event_rate_sql() -> str:
    """DuckDB twin of :func:`event_rate` (same micro-unit integer value
    sum, same floor formula)."""
    return """
WITH hist AS (
  SELECT (floor(epoch(ts))::BIGINT // 86400) * 86400 AS day_start,
         count(*)::BIGINT AS n,
         sum(floor(value * 1e6 + 0.5)::BIGINT)::BIGINT AS vq
  FROM events GROUP BY 1
)
SELECT day_start, n,
       floor((n::DOUBLE / 24.0) * 1e6 + 0.5) / 1e6 AS rate_count,
       floor(((vq::DOUBLE / 1e6) / 24.0) * 1e6 + 0.5) / 1e6 AS rate_value
FROM hist
ORDER BY day_start
"""


def event_frequent_item_sets(
    spark: SparkSession, sf_dir: str, min_support: float = 0.25
) -> DataFrame:
    """ES ``frequent_item_sets`` aggregation (the Apriori/ECLAT market-
    basket agg): transactions are USERS, items are the distinct
    event_types a user has triggered; emit every itemset of size 1 and 2
    whose support (fraction of users containing it) >= ``min_support``.

    Returns (items 'a+b' sorted-joined, size, doc_count, support)
    ordered by (support desc, items asc); support passes the shared 6 dp
    floor; doc_count is the exact transaction count.

    Scale shape: the corpus-sized work is ONE distinct on (user, type) —
    map-side combined, vocabulary-bounded per user. Pair candidates come
    from a self-join on user_id keyed by the (small) per-user item sets;
    with an unbounded item vocabulary the documented 10^12 swap is
    Spark MLlib's distributed FP-Growth (the same candidate lattice,
    frequency-pruned level by level). The support filter happens on the
    aggregated counts — nothing corpus-sized crosses the network twice.
    """
    e = _t(spark, sf_dir, "events")
    ut = e.select("user_id", F.col("event_type").alias("item")).distinct()
    ut = ut.cache()
    total = ut.select(F.countDistinct("user_id").alias("t"))
    singles = (
        ut.groupBy("item")
        .agg(F.count(F.lit(1)).cast("long").alias("doc_count"))
        .select(F.col("item").alias("items"),
                F.lit(1).cast("int").alias("size"), "doc_count")
    )
    a, b = ut.alias("a"), ut.alias("b")
    pairs = (
        a.join(b, (F.col("a.user_id") == F.col("b.user_id"))
               & (F.col("a.item") < F.col("b.item")))
        .groupBy(F.col("a.item").alias("i1"), F.col("b.item").alias("i2"))
        .agg(F.count(F.lit(1)).cast("long").alias("doc_count"))
        .select(
            F.concat_ws("+", F.col("i1"), F.col("i2")).alias("items"),
            F.lit(2).cast("int").alias("size"), "doc_count",
        )
    )
    sup = (
        F.floor(
            (F.col("doc_count").cast("double") / F.col("t").cast("double"))
            * F.lit(1e6) + F.lit(0.5)
        ) / F.lit(1e6)
    )
    return (
        singles.unionByName(pairs)
        .crossJoin(F.broadcast(total))
        .select("items", "size", "doc_count", sup.alias("support"))
        .filter(F.col("support") >= float(min_support))
        .orderBy(F.desc("support"), F.asc("items"))
    )


def event_frequent_item_sets_sql(min_support: float = 0.25) -> str:
    """DuckDB twin of :func:`event_frequent_item_sets`."""
    return f"""
WITH ut AS (
  SELECT DISTINCT user_id, event_type AS item FROM events
),
tot AS (
  SELECT count(DISTINCT user_id)::DOUBLE AS t FROM ut
),
singles AS (
  SELECT item AS items, 1 AS size, count(*)::BIGINT AS doc_count
  FROM ut GROUP BY item
),
pairs AS (
  SELECT a.item || '+' || b.item AS items, 2 AS size,
         count(*)::BIGINT AS doc_count
  FROM ut a JOIN ut b
    ON a.user_id = b.user_id AND a.item < b.item
  GROUP BY 1
),
u AS (
  SELECT * FROM singles UNION ALL SELECT * FROM pairs
)
SELECT items, size, doc_count,
       floor((doc_count::DOUBLE / tot.t) * 1e6 + 0.5) / 1e6 AS support
FROM u CROSS JOIN tot
WHERE floor((doc_count::DOUBLE / tot.t) * 1e6 + 0.5) / 1e6
      >= {float(min_support)!r}
ORDER BY support DESC, items ASC
"""


def runtime_field_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES runtime fields: a field that exists only at QUERY time — here
    ``day_of_week`` derived from the event timestamp — used directly as
    an aggregation key without reindexing (the runtime-mapping promise).
    The derivation is pure integer arithmetic (``(epoch_days + 4) % 7``,
    0 = Sunday, anchored on 1970-01-01 being a Thursday) rather than a
    calendar function, so both engines agree with no timezone surface.

    Returns (dow, n, total_value) ordered by dow; total_value sums exact
    micro-unit integers then floors at 6 dp.

    Scale shape: the runtime field is a projection inside the ONE
    map-side-combined groupBy — same cost as aggregating a stored field
    (the ES trade: flexibility for per-query compute, no index bloat).
    """
    e = _t(spark, sf_dir, "events")
    epoch = F.col("ts").cast("timestamp").cast("long")
    dow = ((F.floor(epoch / F.lit(86400)) + F.lit(4)) % F.lit(7)).cast("long")
    vq = F.floor(F.col("value") * F.lit(1e6) + F.lit(0.5)).cast("long")
    return (
        e.groupBy(dow.alias("dow"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            (F.sum(vq).cast("double") / F.lit(1e6)).alias("tv"),
        )
        .select(
            "dow", "n",
            (F.floor(F.col("tv") * F.lit(1e6) + F.lit(0.5)) / F.lit(1e6))
            .alias("total_value"),
        )
        .orderBy("dow")
    )


def runtime_field_agg_sql() -> str:
    """DuckDB twin of :func:`runtime_field_agg`."""
    return """
SELECT ((floor(epoch(ts))::BIGINT // 86400) + 4) % 7 AS dow,
       count(*)::BIGINT AS n,
       floor((sum(floor(value * 1e6 + 0.5)::BIGINT)::DOUBLE / 1e6) * 1e6
             + 0.5) / 1e6 AS total_value
FROM events
GROUP BY 1
ORDER BY dow
"""


def event_value_histogram_empty(
    spark: SparkSession,
    sf_dir: str,
    interval: float = 10.0,
    lo: int = 0,
    hi: int = 90,
) -> DataFrame:
    """ES ``histogram`` agg with ``min_doc_count: 0`` + ``extended_bounds``:
    every bucket in [lo, hi] is EMITTED even when empty (the
    dashboard-friendly dense axis), with counts left-joined in. Bucket
    key = floor(value / interval) * interval.

    ES extends, never clips: the emitted axis is the union of the data's
    own bucket range and [lo, hi]. Returns (bucket, n) for every bucket
    key on that axis, ordered by bucket; n = 0 for empty buckets.

    Scale shape: the corpus-sized work is the ONE groupBy on the bucket
    id; the axis bounds are two driver scalars (the same min/max the ES
    coordinator computes) and the dense axis is metadata-sized.
    """
    e = _t(spark, sf_dir, "events")
    iv = float(interval)
    bucket = (F.floor(F.col("value") / F.lit(iv)) * F.lit(iv)).alias("bucket")
    counts = e.groupBy(bucket).agg(F.count(F.lit(1)).cast("long").alias("n"))
    row = counts.agg(
        F.min("bucket").alias("blo"), F.max("bucket").alias("bhi")
    ).first()
    b_lo = min(float(lo), row["blo"]) if row["blo"] is not None else float(lo)
    b_hi = max(float(hi), row["bhi"]) if row["bhi"] is not None else float(hi)
    n_buckets = int((b_hi - b_lo) / iv) + 1
    axis = spark.range(n_buckets).select(
        (F.lit(b_lo) + F.col("id") * F.lit(iv)).alias("bucket")
    )
    return (
        axis.join(counts, "bucket", "left")
        .select("bucket", F.coalesce(F.col("n"), F.lit(0)).cast("long")
                .alias("n"))
        .orderBy("bucket")
    )


def event_value_histogram_empty_sql(
    interval: float = 10.0, lo: int = 0, hi: int = 90
) -> str:
    """DuckDB twin of :func:`event_value_histogram_empty` (axis = data
    bucket range extended by [lo, hi], same float bucket keys)."""
    iv = repr(float(interval))
    return f"""
WITH counts AS (
  SELECT floor(value / {iv}) * {iv} AS bucket, count(*)::BIGINT AS n
  FROM events GROUP BY 1
),
b AS (
  SELECT least({float(lo)!r}, min(bucket)) AS blo,
         greatest({float(hi)!r}, max(bucket)) AS bhi
  FROM counts
),
axis AS (
  SELECT (SELECT blo FROM b) + i * {iv} AS bucket
  FROM unnest(generate_series(
         0, (((SELECT bhi FROM b) - (SELECT blo FROM b)) / {iv})::BIGINT
       )) t(i)
)
SELECT axis.bucket AS bucket, coalesce(counts.n, 0)::BIGINT AS n
FROM axis LEFT JOIN counts ON axis.bucket = counts.bucket
ORDER BY bucket
"""


def build_event_rollup(spark: SparkSession, sf_dir: str, out_dir: str) -> None:
    """ES rollup-job analog: materialize a DAILY pre-aggregation of the
    events stream (n events, micro-unit value sum) to parquet. Only
    ADDITIVE metrics are rolled up (counts and integer sums re-aggregate
    exactly at any coarser grain); ES's distinct-count rollup stores HLL
    sketches for the same reason — that is the documented swap for
    non-additive metrics. Partitioned by day id so serving queries prune."""
    e = _t(spark, sf_dir, "events")
    epoch = F.col("ts").cast("timestamp").cast("long")
    vq = F.floor(F.col("value") * F.lit(1e6) + F.lit(0.5)).cast("long")
    (
        e.groupBy(((F.floor(epoch / F.lit(86400))) * F.lit(86400))
                  .cast("long").alias("day_start"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(vq).cast("long").alias("vq"),
        )
        .write.mode("overwrite").parquet(out_dir)
    )


def rollup_weekly(spark: SparkSession, rollup_dir: str) -> DataFrame:
    """Serve a WEEKLY aggregation from the daily rollup — the whole point
    of the rollup job: the raw events are never touched again, the query
    re-aggregates the (tiny) rollup rows. week_start = epoch-day // 7
    anchored at 1970-01-01 (a Thursday; pure integer arithmetic, no
    calendar/timezone surface).

    Returns (week_start, n, total_value) ordered by week; counts exact,
    total_value through the shared 6 dp floor over the summed micro-unit
    integers — bit-identical to aggregating the raw events directly,
    BECAUSE the rolled-up metrics are additive integers."""
    r = spark.read.parquet(rollup_dir)
    week = (
        (F.floor(F.col("day_start") / F.lit(604800)) * F.lit(604800))
        .cast("long").alias("week_start")
    )
    return (
        r.groupBy(week)
        .agg(
            F.sum("n").cast("long").alias("n"),
            (F.sum("vq").cast("double") / F.lit(1e6)).alias("tv"),
        )
        .select(
            "week_start", "n",
            (F.floor(F.col("tv") * F.lit(1e6) + F.lit(0.5)) / F.lit(1e6))
            .alias("total_value"),
        )
        .orderBy("week_start")
    )


def rollup_weekly_sql() -> str:
    """DuckDB twin of the rollup-served weekly aggregation, computed
    DIRECTLY from the raw events — equality proves the rollup round-trip
    is lossless for additive metrics."""
    return """
SELECT ((floor(epoch(ts))::BIGINT // 86400) * 86400 // 604800) * 604800
         AS week_start,
       count(*)::BIGINT AS n,
       floor((sum(floor(value * 1e6 + 0.5)::BIGINT)::DOUBLE / 1e6) * 1e6
             + 0.5) / 1e6 AS total_value
FROM events
GROUP BY 1
ORDER BY week_start
"""


def ingest_pipeline(spark: SparkSession, sf_dir: str, min_tokens: int = 5) -> DataFrame:
    """ES ingest pipeline (processor chain) applied at ingest time — the
    node-side document rewrite every ES deployment runs before indexing,
    modeled with four canonical processors over the documents stream:

    * ``set``        — word_count = analyzed token count;
    * ``dissect``    — head_token = first analyzed token ('' when empty);
    * ``script``     — quality = n_chars / (1 + word_count) (6 dp floor);
    * ``drop``       — documents with word_count < ``min_tokens`` leave
      the pipeline (the ES drop processor's conditional).

    Returns (doc_id, head_token, word_count, quality) for surviving docs.

    Scale shape: ONE map-only projection pass — processors are row-local
    Column algebra, so the pipeline fuses into the ingest scan with no
    shuffle (exactly how ES ingest nodes stream it).
    """
    from smse_backend_spark.functions.tokenizer import tokenize_col

    d = _t(spark, sf_dir, "documents")
    toks = tokenize_col("text")
    wc = F.size(toks).cast("long")
    head = F.coalesce(F.element_at(toks, 1), F.lit(""))
    quality = (
        F.floor(
            (F.col("n_chars").cast("double")
             / (F.lit(1.0) + wc.cast("double"))) * F.lit(1e6) + F.lit(0.5)
        ) / F.lit(1e6)
    )
    return (
        d.select(
            "doc_id",
            head.alias("head_token"),
            wc.alias("word_count"),
            quality.alias("quality"),
        )
        .filter(F.col("word_count") >= int(min_tokens))
    )


def ingest_pipeline_sql(min_tokens: int = 5, table: str = "documents") -> str:
    """DuckDB twin of :func:`ingest_pipeline`."""
    from smse_backend_spark.functions.tokenizer import tokenize_duckdb_sql

    toks = tokenize_duckdb_sql("text")
    return f"""
WITH t AS (
  SELECT doc_id, n_chars, {toks} AS toks FROM {table}
)
SELECT doc_id,
       coalesce(toks[1], '') AS head_token,
       len(toks)::BIGINT AS word_count,
       floor((n_chars::DOUBLE / (1.0 + len(toks)::DOUBLE)) * 1e6 + 0.5)
         / 1e6 AS quality
FROM t
WHERE len(toks) >= {int(min_tokens)}
"""


def terms_lookup_search(
    spark: SparkSession,
    sf_dir: str,
    query_text: str,
    lookup_max_doc: int = 3,
    k: int = 10,
) -> DataFrame:
    """ES ``terms`` lookup query: the filter's value list is not inlined
    in the request but FETCHED from another document's field at query
    time — here "sources of the lookup docs (doc_id < ``lookup_max_doc``)".
    Docs whose ``source`` is in the looked-up set are BM25-ranked for
    ``query_text`` with FULL-corpus statistics (a filter never changes
    scoring stats — the filter-context discipline).

    Scale shape: the lookup read is a pruned point-fetch (doc_id
    predicate pushed to parquet); the fetched set is a tiny broadcast
    semi-join on the scored frame.
    """
    from smse_backend_spark.operators.search import bm25_scored_scan

    d = _t(spark, sf_dir, "documents")
    lookup = (
        d.filter(F.col("doc_id") < int(lookup_max_doc))
        .select("source").distinct()
    )
    corpus = d.select(
        "doc_id", F.col("text").alias("content"), "lang", "source"
    )
    scored = bm25_scored_scan(corpus, query_text).select("doc_id", "score")
    return (
        scored.join(d.select("doc_id", "source"), "doc_id")
        .join(F.broadcast(lookup), "source", "left_semi")
        .select("doc_id", F.round("score", 6).alias("score"))
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(int(k))
    )


def terms_lookup_search_sql(
    query_text: str,
    lookup_max_doc: int = 3,
    k: int = 10,
    table: str = "documents",
    content_col: str = "text",
) -> str:
    """DuckDB twin of :func:`terms_lookup_search`."""
    from smse_backend_spark.operators.search import (
        _ALL_ROWS,
        bm25_scan_oracle_sql,
    )

    scored = bm25_scan_oracle_sql(
        query_text, _ALL_ROWS, None, table, content_col
    )
    return f"""
WITH scored AS ({scored}),
lookup AS (
  SELECT DISTINCT source FROM {table} WHERE doc_id < {int(lookup_max_doc)}
)
SELECT s.doc_id AS doc_id, round(s.score, 6) AS score
FROM scored s
JOIN {table} d USING (doc_id)
WHERE d.source IN (SELECT source FROM lookup)
ORDER BY score DESC, doc_id ASC
LIMIT {int(k)}
"""


# --- ES nested query + calendar date_histogram (round-4 session) -----------

def nested_order_search(
    spark: SparkSession,
    sf_dir: str,
    min_qty: float = 45.0,
    min_disc: float = 0.07,
    k: int = 15,
) -> DataFrame:
    """ES ``nested`` query over the order→lineitems parent/child shape:
    parents whose SAME child satisfies every clause (``l_quantity >=
    min_qty AND l_discount >= min_disc`` on one lineitem), scored with
    ``score_mode="sum"`` over a constant inner score of 1 — i.e. the
    number of qualifying children. This is the semantics a flattened
    (object-mapped) document gets WRONG: flattening matches an order
    whose quantity and discount come from DIFFERENT lineitems (see
    :func:`nested_vs_flattened` for the false-positive count).

    Reference analog: the 1:N ``contents``→``search_records`` traversal
    (smse_backend/models/search_record.py:6-29) — the only nested-shaped
    relation the reference walks; ES nested is its search-engine form.

    Output (o_orderkey, n_matched, o_totalprice), top-k by
    (n_matched desc, o_orderkey asc).

    Scale shape: both clause predicates push into the lineitem parquet
    scan (row-group pruning on the numeric columns); the surviving
    children partial-aggregate map-side onto their order key, and only
    the qualifying-parent frame (orders-with-a-qualifying-child
    cardinality, far below |lineitem|) joins back to orders. The final
    cut is a TakeOrderedAndProject — no full sort, no corpus-sized
    shuffle of non-matching children.
    """
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    child = (
        li.filter(
            (F.col("l_quantity") >= F.lit(float(min_qty)))
            & (F.col("l_discount") >= F.lit(float(min_disc)))
        )
        .groupBy("l_orderkey")
        .agg(F.count(F.lit(1)).cast("long").alias("n_matched"))
    )
    return (
        orders.join(
            child, orders["o_orderkey"] == child["l_orderkey"]
        )
        .select("o_orderkey", "n_matched", "o_totalprice")
        .orderBy(F.desc("n_matched"), F.asc("o_orderkey"))
        .limit(int(k))
    )


def nested_order_search_sql(
    min_qty: float = 45.0, min_disc: float = 0.07, k: int = 15
) -> str:
    """DuckDB twin of :func:`nested_order_search`."""
    return f"""
WITH child AS (
  SELECT l_orderkey, count(*)::BIGINT AS n_matched
  FROM lineitem
  WHERE l_quantity >= {float(min_qty)} AND l_discount >= {float(min_disc)}
  GROUP BY l_orderkey
)
SELECT o.o_orderkey AS o_orderkey, c.n_matched AS n_matched,
       o.o_totalprice AS o_totalprice
FROM orders o JOIN child c ON o.o_orderkey = c.l_orderkey
ORDER BY n_matched DESC, o_orderkey ASC
LIMIT {int(k)}
"""


def nested_vs_flattened(
    spark: SparkSession,
    sf_dir: str,
    min_qty: float = 45.0,
    min_disc: float = 0.07,
) -> DataFrame:
    """The one-row proof of WHY nested mapping exists (the ES docs'
    canonical example): ``n_nested`` counts parents where one child
    satisfies both clauses; ``n_flattened`` counts parents where the
    clauses match across ANY children (the object-mapping cross-match);
    ``n_false_positive`` is their difference — orders a flattened index
    would wrongly return. Nested ⊆ flattened by construction (a child
    satisfying both clauses satisfies each), so the difference is never
    negative.

    Scale shape: ONE pass over lineitem — three boolean conditions fold
    map-side into per-order maxes, then a metadata-sized count. No join.
    """
    li = _t(spark, sf_dir, "lineitem")
    q = (F.col("l_quantity") >= F.lit(float(min_qty))).cast("int")
    d = (F.col("l_discount") >= F.lit(float(min_disc))).cast("int")
    per_order = li.groupBy("l_orderkey").agg(
        F.max(q * d).alias("both_same_child"),
        F.max(q).alias("any_qty"),
        F.max(d).alias("any_disc"),
    )
    return per_order.agg(
        F.sum("both_same_child").cast("long").alias("n_nested"),
        F.sum(
            (F.col("any_qty") * F.col("any_disc"))
        ).cast("long").alias("n_flattened"),
        (
            F.sum(F.col("any_qty") * F.col("any_disc"))
            - F.sum("both_same_child")
        ).cast("long").alias("n_false_positive"),
    )


def nested_vs_flattened_sql(
    min_qty: float = 45.0, min_disc: float = 0.07
) -> str:
    """DuckDB twin of :func:`nested_vs_flattened`."""
    return f"""
WITH per_order AS (
  SELECT l_orderkey,
         max(CASE WHEN l_quantity >= {float(min_qty)}
                   AND l_discount >= {float(min_disc)} THEN 1 ELSE 0 END)
           AS both_same_child,
         max(CASE WHEN l_quantity >= {float(min_qty)} THEN 1 ELSE 0 END)
           AS any_qty,
         max(CASE WHEN l_discount >= {float(min_disc)} THEN 1 ELSE 0 END)
           AS any_disc
  FROM lineitem GROUP BY l_orderkey
)
SELECT sum(both_same_child)::BIGINT AS n_nested,
       sum(any_qty * any_disc)::BIGINT AS n_flattened,
       (sum(any_qty * any_disc) - sum(both_same_child))::BIGINT
         AS n_false_positive
FROM per_order
"""


def event_calendar_histogram(
    spark: SparkSession,
    sf_dir: str,
    tz_offset_min: int = 330,
) -> DataFrame:
    """ES ``date_histogram`` with ``calendar_interval: week`` and a fixed
    ``time_zone`` offset (here +05:30): buckets are CALENDAR units —
    ISO weeks anchored on Monday IN THE GIVEN TIME ZONE — not fixed
    epoch multiples, so bucket boundaries shift with the zone and bucket
    widths follow the calendar (the ES semantics
    ``fixed_interval`` cannot express). An event late Sunday UTC lands
    in the NEXT local week under +05:30 — exactly the boundary the
    epoch-aligned :func:`hourly_event_rollup` / ``auto_date_histogram``
    family cannot produce. Bucket key follows the ES convention: the
    UTC instant of the local week start (local truncation shifted back).

    Returns (bucket_start epoch-seconds, n, total_value) ordered by
    bucket.

    Scale shape: the bucket id is row-local Column arithmetic (shift,
    truncate, shift back — no UDF), folded by ONE map-side-combined
    groupBy onto a handful of weekly keys; output is calendar-bounded,
    not corpus-bounded.
    """
    e = _t(spark, sf_dir, "events")
    off = F.expr(f"INTERVAL {int(tz_offset_min)} MINUTES")
    # ts is TIMESTAMP_NTZ; session tz is pinned UTC, so the cast chain
    # equals DuckDB's epoch() on the same naive value (the
    # auto_date_histogram discipline)
    local = F.col("ts").cast("timestamp") + off
    bucket = (F.date_trunc("week", local) - off).cast("long")
    return (
        e.groupBy(bucket.alias("bucket_start"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.round(F.sum("value"), 6).alias("total_value"),
        )
        .orderBy("bucket_start")
    )


def event_calendar_histogram_sql(tz_offset_min: int = 330) -> str:
    """DuckDB twin of :func:`event_calendar_histogram` — duckdb
    ``date_trunc('week', ·)`` anchors Monday exactly like Spark."""
    return f"""
SELECT floor(epoch(date_trunc('week', ts + INTERVAL {int(tz_offset_min)} MINUTE)
             - INTERVAL {int(tz_offset_min)} MINUTE))::BIGINT AS bucket_start,
       count(*)::BIGINT AS n,
       round(sum(value), 6) AS total_value
FROM events
GROUP BY 1
ORDER BY bucket_start
"""


def _expand_runs(
    steps: tuple[str, ...], runs: tuple[int, ...] | None
) -> list[str]:
    """EQL ``[step] with runs=N`` is defined as repeating the step query
    N times in place (the documented equivalence) — so runs expand to a
    longer step list before the sweep, and the SAME kernel/oracle serve
    both forms."""
    if runs is None:
        return list(steps)
    if len(runs) != len(steps) or any(r < 1 for r in runs):
        raise ValueError("runs must align with steps and be >= 1")
    out: list[str] = []
    for s, r in zip(steps, runs):
        out.extend([s] * r)
    return out


# the one derived join key both engines compute identically: the JSON
# props k bucketed mod 4 — the multi-`by` demo key (host+process style)
_EQL_KEY_SPARK = {
    "k_bucket": lambda: (
        F.get_json_object("props", "$.k").cast("long") % 4
    ).alias("k_bucket"),
}
_EQL_KEY_SQL = {
    "k_bucket": "(json_extract(props, '$.k')::BIGINT % 4)",
}


def eql_sequence(
    spark: SparkSession,
    sf_dir: str,
    steps: tuple[str, ...] = ("view", "click", "purchase"),
    within_hours: int = 24,
    until: str | None = None,
    runs: tuple[int, ...] | None = None,
    by_cols: tuple[str, ...] = ("user_id",),
) -> DataFrame:
    """ES EQL ``sequence by <key> [step1] [step2] ... with maxspan``:
    per user, does a strictly time-increasing chain of events matching
    the step predicates exist with (last.ts - first.ts) <= maxspan —
    and what is the MINIMAL such span? The SIEM/funnel correlation
    primitive (view -> click -> purchase) that windowed aggregation
    cannot express: order matters, each step must strictly follow the
    previous pick, and the span constraint binds the ends of the chain.

    Returns (user_id, min_span_us) for every key with a qualifying
    sequence, ordered by user_id. Exact: timestamps compare as integer
    epoch-microseconds on both engines.

    ``until`` (EQL's ``until [event]`` clause) cancels a pending
    sequence when the terminating event fires: a chain is valid only if
    no ``until`` event for the same key lies strictly inside
    (first.ts, last.ts). Validity depends only on the chain's ENDPOINTS,
    and for a fixed start the greedy chain minimizes the endpoint, so
    per-start validity is decided by the greedy chain alone — which is
    what keeps the sweep linear AND exactly equal to the oracle's
    NOT-EXISTS over all chains (argued in the docstring of the kernel).

    ``runs`` (EQL's ``with runs=N``): per-step repeat counts — a step
    with runs=N is the documented equivalent of writing the step query N
    times, so the expansion happens before the sweep and the same kernel
    serves both forms (repeated step types are already what the
    strictly-increasing pointer sweep handles).

    ``by_cols`` (EQL's multi-field ``by k1, k2``): every step of a chain
    must agree on ALL join keys. Keys are event columns, plus the
    derived ``"k_bucket"`` (props JSON ``k`` mod 4 — the host+process
    style second key) computed identically on both engines.

    Plan shape: events pre-filter to the step types and project to
    (keys, step, ts_us) — ~16-24 B/row of MATCHING events shuffles,
    never the event payload; one applyInPandas per key tuple runs the
    same monotone-pointer minimal-cover sweep as the positional
    span-near kernel (O(events-per-key), pointers never rewind). At
    10^12 events the per-key state is the per-type timestamp lists — the
    exact state ES's EQL engine keeps per join key.
    """
    import numpy as np
    import pandas as pd

    from smse_backend_spark.session import ensure_pyfiles

    ensure_pyfiles(spark)
    within_us = int(within_hours) * 3_600_000_000
    e = _t(spark, sf_dir, "events")
    step_list = _expand_runs(steps, runs)
    keys = list(by_cols)
    key_exprs = [
        _EQL_KEY_SPARK[c]() if c in _EQL_KEY_SPARK else F.col(c)
        for c in keys
    ]
    wanted = list(steps) + ([until] if until else [])
    typed = (
        e.filter(F.col("event_type").isin(wanted))
        .select(
            *key_exprs,
            "event_type",
            F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
        )
    )
    schema = ", ".join(f"{k} long" for k in keys) + ", min_span_us long"
    empty = {k: [] for k in keys} | {"min_span_us": []}

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        lists = []
        for s in step_list:
            arr = np.sort(pdf.loc[pdf["event_type"] == s, "us"].to_numpy(np.int64))
            if arr.size == 0:
                return pd.DataFrame(empty)
            lists.append(arr)
        u_arr = (
            np.sort(pdf.loc[pdf["event_type"] == until, "us"].to_numpy(np.int64))
            if until else None
        )
        ptrs = [0] * len(lists)
        best = None
        for p1 in lists[0]:
            prev = p1
            dead = False
            for i in range(1, len(lists)):
                li = lists[i]
                j = ptrs[i]
                while j < li.size and li[j] <= prev:
                    j += 1
                ptrs[i] = j
                if j >= li.size:
                    dead = True
                    break
                prev = li[j]
            if dead:
                break
            if u_arr is not None and u_arr.size:
                # an until event strictly inside (p1, prev) cancels every
                # chain from this start (their endpoints only widen)
                lo = np.searchsorted(u_arr, p1, side="right")
                hi = np.searchsorted(u_arr, prev, side="left")
                if hi > lo:
                    continue
            span = int(prev - p1)
            if best is None or span < best:
                best = span
        if best is None or best > within_us:
            return pd.DataFrame(empty)
        row = {k: [int(pdf[k].iloc[0])] for k in keys}
        row["min_span_us"] = [best]
        return pd.DataFrame(row)

    return (
        typed.groupBy(*keys)
        .applyInPandas(kernel, schema)
        .orderBy(*keys)
    )


def eql_sequence_sql(
    steps: tuple[str, ...] = ("view", "click", "purchase"),
    within_hours: int = 24,
    until: str | None = None,
    runs: tuple[int, ...] | None = None,
    by_cols: tuple[str, ...] = ("user_id",),
) -> str:
    """DuckDB twin of :func:`eql_sequence` — the explicit ordered join
    chain with min(last - first) per key (tractable at oracle scale; the
    Spark side is the linear-sweep algorithm). ``runs`` expands to
    repeated join steps exactly like the Spark side; multi-``by`` keys
    join on every key column."""
    within_us = int(within_hours) * 3_600_000_000
    step_list = _expand_runs(steps, runs)
    keys = list(by_cols)
    key_sels = ", ".join(
        f"{_EQL_KEY_SQL[c]} AS {c}" if c in _EQL_KEY_SQL else c
        for c in keys
    )
    ctes = ",\n".join(
        f"s{i} AS (SELECT {key_sels}, epoch_us(ts) AS us FROM events "
        f"WHERE event_type = '{s}')"
        for i, s in enumerate(step_list)
    )
    joins = " ".join(
        "JOIN s{i} ON ".format(i=i)
        + " AND ".join(f"s{i}.{k} = s0.{k}" for k in keys)
        + f" AND s{i}.us > s{i - 1}.us"
        for i in range(1, len(step_list))
    )
    last = f"s{len(step_list) - 1}"
    until_clause = ""
    if until:
        u_keys = " AND ".join(
            (f"({_EQL_KEY_SQL[k]}) = s0.{k}" if k in _EQL_KEY_SQL
             else f"u.{k} = s0.{k}")
            for k in keys
        )
        until_clause = (
            f"\nWHERE NOT EXISTS (SELECT 1 FROM events u "
            f"WHERE u.event_type = '{until}' AND {u_keys} "
            f"AND epoch_us(u.ts) > s0.us AND epoch_us(u.ts) < {last}.us)"
        )
    sel_keys = ", ".join(f"s0.{k} AS {k}" for k in keys)
    group_keys = ", ".join(f"s0.{k}" for k in keys)
    order_keys = ", ".join(keys)
    return f"""
WITH {ctes}
SELECT {sel_keys},
       min({last}.us - s0.us)::BIGINT AS min_span_us
FROM s0 {joins}{until_clause}
GROUP BY {group_keys}
HAVING min({last}.us - s0.us) <= {within_us}
ORDER BY {order_keys}
"""
