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
N_BANDS = 4
BAND_BITS = N_BITS // N_BANDS


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


def simhash_neardup_pairs(docs: DataFrame, max_hamming: int = 3) -> DataFrame:
    """Pairs with hamming(sig_a, sig_b) <= max_hamming (doc_a < doc_b).

    Banding is exact for max_hamming < N_BANDS (pigeonhole); the final
    hamming filter runs only on band-collision candidates.
    """
    sig = simhash_signatures(docs).cache()
    banded = sig.select(
        "doc_id", "simhash",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(b).alias("band"),
                    F.shiftright("simhash", b * BAND_BITS).bitwiseAND(
                        F.lit((1 << BAND_BITS) - 1)
                    ).alias("key"),
                )
                for b in range(N_BANDS)
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
        .withColumn("hamming", F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b"))))
        .filter(F.col("hamming") <= max_hamming)
        .select("doc_a", "doc_b", "hamming")
    )
    return pairs
