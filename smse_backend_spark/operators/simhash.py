"""SimHash near-duplicate detection (64-bit, tf-weighted).

sig(doc) = sign bits of sum over terms of tf * (+1/-1 per bit of h(term)),
h = sha256-derived 64-bit (same hash discipline as MinHash — reproducible
in plain python for the test oracle). Candidate pairs via 4x16-bit band
tables (hamming <= 3 guarantees at least one identical band by pigeonhole),
then exact hamming verification on candidates only — no cross product.

The signature kernel is a vectorized pandas UDF: per Arrow batch, one
(tokens x 64) bit-matrix accumulation in numpy.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from smse_backend_spark.functions.tokenizer import tokenize_py, tokenize_series
from smse_backend_spark.session import ensure_pyfiles

N_BITS = 64


def band_plan(n_bands: int) -> list[tuple[int, int]]:
    """Split 64 bits into ``n_bands`` contiguous bands: (shift, bits) per
    band; the first ``64 % n_bands`` bands get the extra bit. Pigeonhole:
    any pair with hamming < n_bands shares at least one identical band."""
    base, rem = N_BITS // n_bands, N_BITS % n_bands
    plan, shift = [], 0
    for i in range(n_bands):
        bits = base + (1 if i < rem else 0)
        plan.append((shift, bits))
        shift += bits
    return plan


def _term_hash64(term: str) -> int:
    return int(hashlib.sha256(term.encode()).hexdigest()[:16], 16)


def simhash_py(text: str) -> int:
    """Plain-python oracle."""
    acc = np.zeros(N_BITS, dtype=np.int64)
    from collections import Counter

    for term, tf in Counter(tokenize_py(text)).items():
        h = _term_hash64(term)
        bits = np.array([(h >> i) & 1 for i in range(N_BITS)], dtype=np.int64)
        acc += tf * (2 * bits - 1)
    sig = 0
    for i in range(N_BITS):
        if acc[i] > 0:
            sig |= 1 << i
    return sig


def _simhash_series(texts: pd.Series) -> pd.Series:
    toks = tokenize_series(texts)
    out = np.zeros(len(texts), dtype=np.uint64)
    frame = pd.DataFrame({"row": np.arange(len(texts)), "term": toks})
    frame = frame.explode("term").dropna(subset=["term"])
    if not frame.empty:
        tf = frame.groupby(["row", "term"], sort=False).size().reset_index(name="tf")
        uniq = tf["term"].unique()
        hmap = {t: _term_hash64(t) for t in uniq}
        h = tf["term"].map(hmap).to_numpy(np.uint64)
        bits = ((h[:, None] >> np.arange(N_BITS, dtype=np.uint64)) & np.uint64(1)).astype(np.int64)
        contrib = tf["tf"].to_numpy(np.int64)[:, None] * (2 * bits - 1)
        acc = np.zeros((len(texts), N_BITS), dtype=np.int64)
        np.add.at(acc, tf["row"].to_numpy(np.int64), contrib)
        sig_bits = (acc > 0).astype(np.uint64)
        out = (sig_bits << np.arange(N_BITS, dtype=np.uint64)).sum(axis=1, dtype=np.uint64)
    return pd.Series(out.astype(np.int64).view(np.int64))


def simhash_signatures(docs: DataFrame) -> DataFrame:
    ensure_pyfiles(docs.sparkSession)
    # pandas_udf parses its DDL type against the active session — create it
    # lazily, not at import time
    udf = F.pandas_udf(_simhash_series, "long")
    return docs.select("doc_id", udf(F.col("text")).alias("simhash"))


def simhash_neardup_pairs(
    docs: DataFrame, max_hamming: int = 3, n_bands: int | None = None
) -> DataFrame:
    """Pairs with hamming(sig_a, sig_b) <= max_hamming (doc_a < doc_b).

    ``n_bands`` defaults to ``max_hamming + 1`` so the banding is EXACT at
    the requested radius (pigeonhole: <= max_hamming differing bits across
    n_bands > max_hamming bands leaves one band identical); the final
    hamming filter runs only on band-collision candidates. Higher radii
    mean fewer bits per band and so more candidates — the standard
    recall/cost dial of simhash banding.

    Scale note: with 64-bit signatures, radius r buckets on ~64/(r+1)-bit
    keys; beyond r~7 (8-bit bands) the buckets get dense enough that
    within-bucket pairing dominates — at 10^12 docs run high radii over a
    WIDER signature (the same kernel with N_BITS=128 keeps >=11-bit bands
    at r=10) or accept probabilistic recall with fewer, wider bands. The
    64-bit/exact-radius default matches the contract's corpus scale.
    """
    if n_bands is None:
        n_bands = min(max_hamming + 1, N_BITS)
    sig = simhash_signatures(docs).cache()
    banded = sig.select(
        "doc_id", "simhash",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(b).alias("band"),
                    F.shiftright("simhash", shift).bitwiseAND(
                        F.lit((1 << bits) - 1)
                    ).alias("key"),
                )
                for b, (shift, bits) in enumerate(band_plan(n_bands))
            ])
        ).alias("bk"),
    ).select("doc_id", "simhash", "bk.band", "bk.key")
    a, b = banded.alias("a"), banded.alias("b")
    pairs = (
        a.join(b, (F.col("a.band") == F.col("b.band")) & (F.col("a.key") == F.col("b.key"))
               & (F.col("a.doc_id") < F.col("b.doc_id")))
        .select(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"),
            F.col("a.simhash").alias("sig_a"), F.col("b.simhash").alias("sig_b"),
        )
        .distinct()
        .withColumn(
            "hamming",
            F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b"))).cast("int"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .select("doc_a", "doc_b", "hamming")
    )
    return pairs


def simhash_neardup_sql(max_hamming: int = 3) -> str:
    """Exact DuckDB oracle: recompute the 64-bit tf-weighted signatures in
    SQL (same tokenizer, same sha256-derived term hashes, same sign rule)
    and take ALL pairs with hamming <= max_hamming — no banding, so it also
    witnesses the banded path's full recall at the requested radius.

    Token-less documents get signature 0 (matching the numpy kernel's
    zero accumulator).
    """
    from smse_backend_spark.functions.tokenizer import tokenize_duckdb_sql

    toks = tokenize_duckdb_sql("text")
    return f"""
WITH tok AS (SELECT doc_id, {toks} AS t FROM documents),
tf AS (
  SELECT doc_id, term, count(*)::BIGINT AS tf
  FROM (SELECT doc_id, unnest(t) AS term FROM tok)
  GROUP BY doc_id, term
),
th AS (
  SELECT doc_id, tf, ('0x' || substring(sha256(term), 1, 16))::UBIGINT AS h
  FROM tf
),
acc AS (
  SELECT doc_id, r.b,
         sum(CASE WHEN ((h >> r.b) & 1::UBIGINT) = 1 THEN tf ELSE -tf END) AS acc
  FROM th, range(0, 64) r(b)
  GROUP BY doc_id, r.b
),
sig AS (
  SELECT doc_id,
         sum(CASE WHEN acc > 0 THEN (1::UBIGINT << b) ELSE 0::UBIGINT END)::UBIGINT AS sig
  FROM acc GROUP BY doc_id
),
sig0 AS (
  SELECT d.doc_id, coalesce(s.sig, 0::UBIGINT) AS sig
  FROM documents d LEFT JOIN sig s USING (doc_id)
)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       bit_count(xor(a.sig, b.sig))::INT AS hamming
FROM sig0 a JOIN sig0 b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.sig, b.sig)) <= {max_hamming}
"""
