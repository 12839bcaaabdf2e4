"""Mergeable cardinality sketches: HyperLogLog and KMV set algebra.

The two sketch families ES/Druid/DataSketches actually run for
distinct-count questions at scale, built deterministically so the DuckDB
oracle replays them bit-for-bit:

* :func:`hll_cardinality` — HyperLogLog (Flajolet et al. 2007), the
  algorithm behind ES's ``cardinality`` agg (HLL++, Heule et al. 2013).
  2^p registers each hold the max leading-zero rank seen; the register
  frame IS the sketch state — fixed-size, merged by per-register ``max``
  (associative, so Spark partial aggregation merges shards for free).
* :func:`hll_cardinality_merged` — the same estimate computed from
  register states built independently per shard and merged with
  ``max``; sharing the single-pass oracle proves the merge law.
* :func:`kmv_set_ops` — K-Minimum-Values set algebra (Beyer et al.
  2007): union cardinality from the k-th smallest hash of the merged
  sketch, intersection via the Jaccard share of the union sketch that
  lands in both sides. The "distinct users who did A and B" workload no
  exact engine answers cheaply at 10^12 rows.

Exactness discipline: hashes are sha-derived 60-bit integers
(``hash_u60``); register ranks come from binary-string length (never
``log2``, which can round at exact powers of two); the HLL harmonic sum
is computed as an INTEGER — each register contributes ``1 << (Kmax -
r)`` so the sum of dyadic rationals is exact int64 arithmetic — with one
double division at the end through the shared half-up 6 dp floor.

Reference analog: smse_backend counts distinct rows with SQL
``count(distinct …)`` (e.g. `routes/search.py` history stats); these are
the sketch twins a 10^12-row deployment swaps in.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from smse_backend_spark.operators.sampling import (
    TWO60,
    _hash_u60_sql,
    hash_u60,
)

HLL_SALT = "-hll-v1"
KMVS_SALT = "-kmvset-v1"


def _hll_consts(p: int) -> tuple[int, int, int, float]:
    """(m, L, Kmax, alpha_m) for precision ``p``: m = 2^p registers,
    L = 60 - p hash bits feed the rank, Kmax = L + 1 is the max register
    value, alpha_m the standard bias constant (m >= 128 flavor)."""
    if not 4 <= p <= 16:
        raise ValueError(f"HLL precision p={p} out of range [4, 16]")
    m = 1 << p
    L = 60 - p
    alpha = 0.7213 / (1.0 + 1.079 / float(m))
    return m, L, L + 1, alpha


def hll_registers(
    df: DataFrame, key: str, p: int = 10, salt: str = HLL_SALT
) -> DataFrame:
    """The HLL sketch state: (idx, r) with idx in [0, 2^p) and r the max
    rank seen — rank = leading zeros of the remaining 60-p hash bits,
    plus 1. Duplicates of a key hit the same (idx, rank), so feeding the
    raw multiset (no distinct) is the whole point of the sketch.

    Rank is derived from the binary-string length of the suffix (``L -
    length(bin(w)) + 1``; w = 0 -> L + 1): integer-exact on both
    engines, immune to the log2(2^k) rounding hazard.

    Scale shape: one projection + a groupBy onto at most 2^p keys with a
    map-side-combined max — the sketch's fixed-size mergeable state.
    """
    m, L, _, _ = _hll_consts(p)
    h = hash_u60(F.col(key), salt)
    w = F.shiftright(h, p)
    rank = F.when(w == 0, F.lit(L + 1)).otherwise(
        F.lit(L) - F.length(F.bin(w)) + F.lit(1)
    )
    return (
        df.select(
            h.bitwiseAND(F.lit(m - 1)).alias("idx"),
            rank.cast("int").alias("rank"),
        )
        .groupBy("idx")
        .agg(F.max("rank").alias("r"))
    )


def _hll_estimate(regs: DataFrame, n_exact: DataFrame, p: int) -> DataFrame:
    """Fold a register frame into the one-row estimate, exact count
    alongside. The harmonic sum is integer: register r contributes
    ``1 << (Kmax - r)`` and each of the V empty registers ``1 << Kmax``
    (their value is 0), so S fits int64 (m * 2^Kmax <= 2^61) and both
    engines agree exactly; ``raw = alpha * m^2 * 2^Kmax / S`` is one
    double division. Linear counting (m * ln(m/V)) replaces raw below
    2.5m when V > 0 — the branch condition is computed from identical
    integers so both engines take the same arm.
    """
    m, _, kmax, alpha = _hll_consts(p)
    s = regs.agg(
        F.count(F.lit(1)).cast("long").alias("n_regs"),
        F.sum(
            F.expr(f"shiftleft(CAST(1 AS BIGINT), CAST({kmax} - r AS INT))")
        ).cast("long").alias("s_used"),
    ).select(
        (F.lit(m) - F.col("n_regs")).cast("long").alias("v_empty"),
        (
            F.col("s_used")
            + (F.lit(m) - F.col("n_regs")) * F.lit(1 << kmax)
        ).cast("long").alias("s_total"),
    )
    raw = (
        F.lit(alpha) * F.lit(float(m)) * F.lit(float(m))
        * F.lit(float(1 << kmax)) / F.col("s_total").cast("double")
    )
    est = F.when(
        (raw <= F.lit(2.5 * m)) & (F.col("v_empty") > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / F.col("v_empty").cast("double")),
    ).otherwise(raw)
    return (
        n_exact.crossJoin(F.broadcast(s))
        .select(
            F.col("n_exact").cast("long").alias("n_exact"),
            "v_empty",
            (F.floor(est * F.lit(1e6) + F.lit(0.5)) / F.lit(1e6)).alias(
                "estimate"
            ),
        )
    )


def hll_cardinality(
    events: DataFrame, key: str = "user_id", p: int = 10
) -> DataFrame:
    """One row (n_exact, v_empty, estimate): the HLL distinct-count
    estimate for ``key`` with the exact count alongside (the column a
    10^12-row deployment drops — the sketch state is 2^p small ints).
    """
    regs = hll_registers(events, key, p)
    n_exact = events.agg(F.countDistinct(key).alias("n_exact"))
    return _hll_estimate(regs, n_exact, p)


def hll_cardinality_merged(
    events: DataFrame,
    key: str = "user_id",
    p: int = 10,
    shard_by: str = "event_id",
    n_shards: int = 4,
) -> DataFrame:
    """Bit-identical to :func:`hll_cardinality`, computed the way a
    cluster actually would: each of ``n_shards`` row-shards builds its
    own register frame independently; the shard states merge by
    per-register ``max``. Equality with the single-pass oracle is the
    merge-associativity law that makes HLL shippable across 1000
    executors (and across days, for rollup stores).
    """
    sharded = events.withColumn(
        "_shard", F.pmod(F.col(shard_by), F.lit(n_shards))
    )
    m, L, _, _ = _hll_consts(p)
    h = hash_u60(F.col(key), HLL_SALT)
    w = F.shiftright(h, p)
    rank = F.when(w == 0, F.lit(L + 1)).otherwise(
        F.lit(L) - F.length(F.bin(w)) + F.lit(1)
    )
    per_shard = (
        sharded.select(
            "_shard",
            h.bitwiseAND(F.lit(m - 1)).alias("idx"),
            rank.cast("int").alias("rank"),
        )
        .groupBy("_shard", "idx")
        .agg(F.max("rank").alias("r"))
    )
    merged = per_shard.groupBy("idx").agg(F.max("r").alias("r"))
    n_exact = events.agg(F.countDistinct(key).alias("n_exact"))
    return _hll_estimate(merged, n_exact, p)


def hll_cardinality_sql(
    key: str = "user_id", p: int = 10, table: str = "events"
) -> str:
    """DuckDB twin of :func:`hll_cardinality` (and, by the merge law, of
    :func:`hll_cardinality_merged`): same sha hashes, same
    binary-string rank, same integer harmonic sum, same literals in the
    same association order."""
    m, L, kmax, alpha = _hll_consts(p)
    h = _hash_u60_sql(key, HLL_SALT)
    return f"""
WITH hashed AS (
  SELECT ({h} & {m - 1}) AS idx, ({h} >> {p}) AS w FROM {table}
),
regs AS (
  SELECT idx,
         max(CASE WHEN w = 0 THEN {L + 1}
                  ELSE {L} - length(bin(w)) + 1 END) AS r
  FROM hashed GROUP BY idx
),
s AS (
  SELECT ({m} - count(*))::BIGINT AS v_empty,
         (sum((1::BIGINT << ({kmax} - r))::BIGINT)::BIGINT
          + ({m} - count(*))::BIGINT * {1 << kmax}) AS s_total
  FROM regs
),
ex AS (
  SELECT count(DISTINCT {key})::BIGINT AS n_exact FROM {table}
)
SELECT ex.n_exact AS n_exact, s.v_empty AS v_empty,
       floor(
         (CASE WHEN ({alpha!r}::DOUBLE * {float(m)!r}::DOUBLE
                     * {float(m)!r}::DOUBLE
                     * {float(1 << kmax)!r}::DOUBLE / s_total::DOUBLE)
                    <= {2.5 * m!r}::DOUBLE
                AND v_empty > 0
               THEN {float(m)!r}::DOUBLE
                    * ln({float(m)!r}::DOUBLE / v_empty::DOUBLE)
               ELSE {alpha!r}::DOUBLE * {float(m)!r}::DOUBLE
                    * {float(m)!r}::DOUBLE
                    * {float(1 << kmax)!r}::DOUBLE / s_total::DOUBLE
          END) * 1e6 + 0.5) / 1e6 AS estimate
FROM ex, s
"""


# ---------------------------------------------------------------------------
# KMV set algebra: union / intersection distinct-count estimates
# ---------------------------------------------------------------------------


def kmv_set_ops(
    events: DataFrame,
    key: str = "user_id",
    type_col: str = "event_type",
    type_a: str = "click",
    type_b: str = "error",
    k: int = 64,
) -> DataFrame:
    """One row (n_union_exact, union_est, n_inter_exact, inter_est):
    distinct-``key`` cardinality of ``type_a OR type_b`` and
    ``type_a AND type_b`` — the KMV set-algebra estimates (Beyer et al.
    2007) beside their exact counts.

    The union sketch is the k smallest distinct hashes across both
    sides; ``union_est = (k-1) * 2^60 / h_(k)`` (exact total when the
    union is below sketch capacity). The intersection rides Jaccard:
    the fraction of the union sketch present in BOTH sides estimates
    J(A,B), and ``inter_est = round_half_up_6dp(J * union_est)``. The
    same key hashes identically on both sides, so sketch membership
    needs no per-side hash state.

    Scale shape: distinct (key, in_a, in_b) is one partial agg over the
    filtered pair of types; the k-smallest cut is a TakeOrdered-sized
    window over hashes (at 10^12 rows, pre-filter by a threshold on h as
    in ``kmv_distinct_dist`` — rank <= k survives any such cut). All
    estimate arithmetic happens on one one-row frame.
    """
    d = (
        events.filter(F.col(type_col).isin([type_a, type_b]))
        .groupBy(key)
        .agg(
            F.max(F.when(F.col(type_col) == type_a, 1).otherwise(0)).alias(
                "in_a"
            ),
            F.max(F.when(F.col(type_col) == type_b, 1).otherwise(0)).alias(
                "in_b"
            ),
        )
        .withColumn("h", hash_u60(F.col(key), KMVS_SALT))
    )
    ranked = d.withColumn(
        "rn", F.row_number().over(Window.orderBy("h"))
    )
    agg = ranked.agg(
        F.count(F.lit(1)).cast("long").alias("n_union_exact"),
        F.sum(F.col("in_a") * F.col("in_b")).cast("long").alias(
            "n_inter_exact"
        ),
        F.max(F.when(F.col("rn") == k, F.col("h"))).alias("hk"),
        F.sum(
            F.when(
                (F.col("rn") <= k) & (F.col("in_a") * F.col("in_b") == 1), 1
            ).otherwise(0)
        ).cast("long").alias("k_both"),
        F.sum(F.when(F.col("rn") <= k, 1).otherwise(0)).cast("long").alias(
            "k_used"
        ),
    )
    union_est = F.when(
        F.col("hk").isNull(), F.col("n_union_exact").cast("double")
    ).otherwise(
        F.lit(float(k - 1)) * F.lit(float(TWO60)) / F.col("hk").cast("double")
    )
    inter_est = (
        F.col("k_both").cast("double") / F.col("k_used").cast("double")
    ) * union_est
    q = lambda c: F.floor(c * F.lit(1e6) + F.lit(0.5)) / F.lit(1e6)  # noqa: E731
    return agg.select(
        "n_union_exact",
        q(union_est).alias("union_est"),
        "n_inter_exact",
        q(inter_est).alias("inter_est"),
    )


def kmv_set_ops_sql(
    key: str = "user_id",
    type_col: str = "event_type",
    type_a: str = "click",
    type_b: str = "error",
    k: int = 64,
    table: str = "events",
) -> str:
    """DuckDB twin of :func:`kmv_set_ops` — same hashes, same rank cut,
    same estimate expressions in the same association order."""
    h = _hash_u60_sql(key, KMVS_SALT)
    return f"""
WITH d AS (
  SELECT {key},
         max(CASE WHEN {type_col} = '{type_a}' THEN 1 ELSE 0 END) AS in_a,
         max(CASE WHEN {type_col} = '{type_b}' THEN 1 ELSE 0 END) AS in_b,
         {h} AS h
  FROM {table}
  WHERE {type_col} IN ('{type_a}', '{type_b}')
  GROUP BY {key}
),
ranked AS (
  SELECT *, row_number() OVER (ORDER BY h) AS rn FROM d
),
agg AS (
  SELECT count(*)::BIGINT AS n_union_exact,
         sum(in_a * in_b)::BIGINT AS n_inter_exact,
         max(CASE WHEN rn = {k} THEN h END) AS hk,
         sum(CASE WHEN rn <= {k} AND in_a * in_b = 1 THEN 1 ELSE 0 END)::BIGINT
           AS k_both,
         sum(CASE WHEN rn <= {k} THEN 1 ELSE 0 END)::BIGINT AS k_used
  FROM ranked
)
SELECT n_union_exact,
       floor((CASE WHEN hk IS NULL THEN n_union_exact::DOUBLE
                   ELSE {float(k - 1)!r} * {float(TWO60)!r} / hk::DOUBLE
              END) * 1e6 + 0.5) / 1e6 AS union_est,
       n_inter_exact,
       floor(((k_both::DOUBLE / k_used::DOUBLE)
              * (CASE WHEN hk IS NULL THEN n_union_exact::DOUBLE
                      ELSE {float(k - 1)!r} * {float(TWO60)!r} / hk::DOUBLE
                 END)) * 1e6 + 0.5) / 1e6 AS inter_est
FROM agg
"""
