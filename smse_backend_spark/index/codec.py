"""Delta-gap + LEB128 varint posting-block codec, fully numpy-vectorized.

Posting blocks store three parallel integer arrays (doc-id gaps, term
frequencies, doc lengths) as varint byte blobs. Everything below is
array-at-a-time numpy — no per-value Python — per the build target's
"vectorized UDFs only" constraint. Encoding N blocks costs O(total values)
regardless of block count: values are encoded as one concatenated stream and
then sliced at per-block byte offsets.

LEB128: little-endian base-128, continuation bit 0x80 on every byte except
the last of a value.
"""

from __future__ import annotations

import numpy as np

_MAX_BYTES = 10  # 64-bit value -> at most ceil(64/7) = 10 septets


def varint_nbytes(vals: np.ndarray) -> np.ndarray:
    """Encoded byte length per value (vectorized)."""
    v = vals.astype(np.uint64, copy=False)
    n = np.ones(v.shape, dtype=np.int64)
    for k in range(1, _MAX_BYTES):
        n += (v >= np.uint64(1) << np.uint64(7 * k)).astype(np.int64)
    return n


def varint_encode(vals: np.ndarray) -> bytes:
    """Encode a 1-D array of non-negative ints to one LEB128 byte stream."""
    v = np.ascontiguousarray(vals, dtype=np.uint64)
    if v.size == 0:
        return b""
    nb = varint_nbytes(v)
    ends = np.cumsum(nb)
    starts = ends - nb
    out = np.zeros(int(ends[-1]), dtype=np.uint8)
    for j in range(_MAX_BYTES):
        mask = nb > j
        if not mask.any():
            break
        septet = (v[mask] >> np.uint64(7 * j)).astype(np.uint64) & np.uint64(0x7F)
        cont = (nb[mask] > j + 1).astype(np.uint8) << 7
        out[starts[mask] + j] = septet.astype(np.uint8) | cont
    return out.tobytes()


def varint_decode(buf: bytes | np.ndarray) -> np.ndarray:
    """Decode one LEB128 stream back to a uint64 array."""
    b = np.frombuffer(buf, dtype=np.uint8) if not isinstance(buf, np.ndarray) else buf
    if b.size == 0:
        return np.empty(0, dtype=np.uint64)
    is_last = (b & 0x80) == 0
    # value index for every byte: number of completed values before it
    val_idx = np.zeros(b.size, dtype=np.int64)
    val_idx[1:] = np.cumsum(is_last[:-1])
    n_vals = int(is_last.sum())
    # position of each byte within its value
    starts = np.flatnonzero(np.concatenate(([True], is_last[:-1])))
    pos = np.arange(b.size, dtype=np.int64) - starts[val_idx]
    contrib = (b & 0x7F).astype(np.uint64) << (7 * pos).astype(np.uint64)
    out = np.zeros(n_vals, dtype=np.uint64)
    np.add.at(out, val_idx, contrib)
    return out


def encode_blocks(vals: np.ndarray, block_lens: np.ndarray) -> list[bytes]:
    """Encode a concatenated value array into per-block blobs.

    One vectorized encode over the whole stream, then zero-copy slicing at
    per-block byte offsets — O(total) independent of block count.
    """
    v = np.ascontiguousarray(vals, dtype=np.uint64)
    if v.size == 0:
        return [b"" for _ in range(len(block_lens))]
    stream = varint_encode(v)
    nb = varint_nbytes(v)
    byte_ends = np.cumsum(nb)
    val_ends = np.cumsum(np.asarray(block_lens, dtype=np.int64))
    # a block's byte end is the byte end of its last value; an empty block
    # shares its predecessor's cumulative val_end, so indexing byte_ends at
    # val_ends-1 lands on the previous block's end automatically (0 when no
    # value precedes it at all)
    ends = np.where(val_ends > 0, byte_ends[val_ends - 1], 0).tolist()
    mv = memoryview(stream)
    out, s = [], 0
    for e in ends:
        out.append(bytes(mv[s:e]))
        s = e
    return out


def decode_blocks(blobs: list[bytes]) -> tuple[np.ndarray, np.ndarray]:
    """Decode many blobs at once -> (values, value_counts_per_blob)."""
    joined = b"".join(blobs)
    vals = varint_decode(joined)
    if not blobs:
        return vals, np.empty(0, dtype=np.int64)
    # per-blob value counts = number of terminator bytes per blob
    lens = np.array([len(x) for x in blobs], dtype=np.int64)
    b = np.frombuffer(joined, dtype=np.uint8)
    is_last = ((b & 0x80) == 0).astype(np.int64)
    csum = np.concatenate(([0], np.cumsum(is_last)))
    ends = np.cumsum(lens)
    counts = np.diff(np.concatenate(([0], csum[ends])))
    return vals, counts


def delta_encode(sorted_ids: np.ndarray, group_starts: np.ndarray) -> np.ndarray:
    """Gaps within groups: out[i] = x[i]-x[i-1], 0 at each group start."""
    x = np.asarray(sorted_ids, dtype=np.int64)
    out = np.zeros(x.size, dtype=np.int64)
    if x.size:
        out[1:] = x[1:] - x[:-1]
        out[group_starts] = 0
    return out


def delta_decode(gaps: np.ndarray, firsts: np.ndarray, counts: np.ndarray) -> np.ndarray:
    """Inverse of delta_encode: firsts[g] + cumsum(gaps) within each group."""
    g = np.asarray(gaps, dtype=np.int64)
    counts = np.asarray(counts, dtype=np.int64)
    if g.size == 0:
        return g
    starts = np.concatenate(([0], np.cumsum(counts[:-1])))
    base = np.repeat(np.asarray(firsts, dtype=np.int64), counts)
    c = np.cumsum(g)
    # reset the running sum at each group start (gaps[start] is 0 by encode)
    c0 = np.repeat(c[starts], counts)
    return base + c - c0


def front_coding_stats(dictionary, block: int = 16):
    """Lucene TermsDict-style front-coding statistics over the sorted
    term dictionary: within each lang, terms sort lexicographically and
    every non-block-start term stores only (prefix_len, suffix_len,
    suffix bytes) against its predecessor — 2 bytes of lengths + the
    unshared tail; every ``block``-th term stores its full bytes (the
    restart point that keeps lookup O(block) — Lucene's terms-block
    discipline). Returns one row per lang: (lang, n_terms, raw_bytes,
    coded_bytes, ratio). The ratio can honestly exceed 1.0 on tiny or
    prefix-poor vocabularies (the 2-byte header beats the shared
    prefix) — the stat is the codec-selection signal, not a guarantee;
    real code-identifier vocabularies (get_user_id, get_user_name, …)
    compress well below 1 (tested).

    Pure Column algebra over the vocab-sized dictionary frame: the LCP
    is the count of equal-prefix lengths (prefix equality is monotone,
    so count == longest), the block reset is a row_number modulus —
    everything stays one window + one agg at any corpus scale (the
    dictionary is vocabulary-sized, not corpus-sized).
    """
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    w = Window.partitionBy("lang").orderBy("term")
    d = (
        dictionary.select("lang", "term").distinct()
        .withColumn("prev", F.lag("term").over(w))
        .withColumn("rn", F.row_number().over(w))
    )
    d = d.withColumn(
        "lcp",
        F.when(F.col("prev").isNull(), F.lit(0)).otherwise(
            F.expr(
                "size(filter(sequence(1, least(length(term), length(prev))), "
                "i -> substring(term, 1, i) = substring(prev, 1, i)))"
            )
        ),
    )
    coded = F.when(
        (F.col("rn") % block == 1) | F.col("prev").isNull(),
        F.length("term"),
    ).otherwise(F.lit(2) + F.length("term") - F.col("lcp"))
    return (
        d.groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_terms"),
            F.sum(F.length("term")).cast("long").alias("raw_bytes"),
            F.sum(coded).cast("long").alias("coded_bytes"),
        )
        .withColumn(
            "ratio",
            F.floor(
                F.col("coded_bytes") / F.col("raw_bytes") * 1e6 + F.lit(0.5)
            ) / 1e6,
        )
        .orderBy("lang")
    )


def front_coding_stats_sql(block: int = 16, table: str = "documents",
                           content_col: str = "text") -> str:
    """DuckDB twin of :func:`front_coding_stats`, recomputing the
    dictionary (distinct (lang, term)) from the corpus with the lockstep
    tokenizer — bit-identical because every quantity is integer until
    the final half-up-floored ratio."""
    from smse_backend_spark.functions.tokenizer import tokenize_duckdb_sql

    toks = tokenize_duckdb_sql(content_col)
    return f"""
WITH dict AS (
  SELECT DISTINCT lang, term
  FROM (SELECT lang, unnest({toks}) AS term FROM {table})
),
seq AS (
  SELECT lang, term,
         lag(term) OVER (PARTITION BY lang ORDER BY term) AS prev,
         row_number() OVER (PARTITION BY lang ORDER BY term) AS rn
  FROM dict
),
coded AS (
  SELECT lang, term, rn, prev,
         CASE WHEN prev IS NULL THEN 0
              ELSE len(list_filter(generate_series(1,
                     least(length(term), length(prev))),
                     i -> substring(term, 1, i) = substring(prev, 1, i)))
         END AS lcp
  FROM seq
)
SELECT lang,
       count(*)::BIGINT AS n_terms,
       sum(length(term))::BIGINT AS raw_bytes,
       sum(CASE WHEN rn % {int(block)} = 1 OR prev IS NULL
                THEN length(term)
                ELSE 2 + length(term) - lcp END)::BIGINT AS coded_bytes,
       floor(sum(CASE WHEN rn % {int(block)} = 1 OR prev IS NULL
                      THEN length(term)
                      ELSE 2 + length(term) - lcp END)::DOUBLE
             / sum(length(term))::DOUBLE * 1e6 + 0.5) / 1e6 AS ratio
FROM coded
GROUP BY lang
ORDER BY lang
"""


def postings_size_stats(docs):
    """Codec-selection statistics for doc-id posting lists, per lang:
    the exact bytes the engine's delta+varint coding pays (first doc id
    raw, then gaps; varint length by the 7-bit-group thresholds) versus
    the RoaringBitmap container rule (per 2^16 doc-id chunk: array
    container = 2 bytes/posting when <= 4096 postings in the chunk,
    bitmap container = 8192 bytes flat otherwise) — the analysis Lucene
    does when choosing doc-id-set encodings. Returns one row per lang:
    (lang, n_terms, n_postings, varint_bytes, array_containers,
    bitmap_containers, roaring_bytes), all exact integers.

    Scale shape: distinct (lang, term, doc_id) is the index build's own
    shuffle unit; the gap lag-window partitions by (lang, term) — the
    same key the postings groupBy uses, so the sort is the build's sort,
    not a new global one. Container counting is one more partial agg on
    (lang, term, chunk). Nothing here exceeds the build's cost class.
    """
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from smse_backend_spark.functions.tokenizer import tokenize_col

    post = (
        docs.select(
            "lang", "doc_id",
            F.explode(F.array_distinct(tokenize_col(F.col("text"))))
            .alias("term"),
        )
        .distinct()
    )
    w = Window.partitionBy("lang", "term").orderBy("doc_id")
    gap = F.when(
        F.lag("doc_id").over(w).isNull(), F.col("doc_id")
    ).otherwise(F.col("doc_id") - F.lag("doc_id").over(w))
    vb = (
        F.when(gap < (1 << 7), 1)
        .when(gap < (1 << 14), 2)
        .when(gap < (1 << 21), 3)
        .when(gap < (1 << 28), 4)
        .otherwise(5)
    )
    sized = post.withColumn("vbytes", vb).withColumn(
        "chunk", (F.col("doc_id") / (1 << 16)).cast("long")
    )
    containers = (
        sized.groupBy("lang", "term", "chunk")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .groupBy("lang")
        .agg(
            F.sum((F.col("cnt") <= 4096).cast("long")).alias("array_containers"),
            F.sum((F.col("cnt") > 4096).cast("long")).alias("bitmap_containers"),
            F.sum(
                F.when(F.col("cnt") <= 4096, 2 * F.col("cnt"))
                .otherwise(F.lit(8192))
            ).cast("long").alias("roaring_bytes"),
        )
    )
    flat = sized.groupBy("lang").agg(
        F.count_distinct("term").cast("long").alias("n_terms"),
        F.count(F.lit(1)).cast("long").alias("n_postings"),
        F.sum("vbytes").cast("long").alias("varint_bytes"),
    )
    return (
        flat.join(containers, "lang")
        .select("lang", "n_terms", "n_postings", "varint_bytes",
                "array_containers", "bitmap_containers", "roaring_bytes")
        .orderBy("lang")
    )


def postings_size_stats_sql(table: str = "documents",
                            content_col: str = "text") -> str:
    """DuckDB twin of :func:`postings_size_stats` — identical integer
    varint thresholds and Roaring container rule."""
    from smse_backend_spark.functions.tokenizer import tokenize_duckdb_sql

    toks = tokenize_duckdb_sql(content_col)
    return f"""
WITH post AS (
  SELECT DISTINCT lang, doc_id, term
  FROM (SELECT lang, doc_id, unnest({toks}) AS term FROM {table})
),
gaps AS (
  SELECT lang, term, doc_id,
         coalesce(doc_id - lag(doc_id) OVER (PARTITION BY lang, term
                                             ORDER BY doc_id), doc_id)
           AS gap,
         doc_id // 65536 AS chunk
  FROM post
),
sized AS (
  SELECT lang, term, chunk,
         CASE WHEN gap < 128 THEN 1
              WHEN gap < 16384 THEN 2
              WHEN gap < 2097152 THEN 3
              WHEN gap < 268435456 THEN 4
              ELSE 5 END AS vbytes
  FROM gaps
),
containers AS (
  SELECT lang,
         sum(CASE WHEN cnt <= 4096 THEN 1 ELSE 0 END)::BIGINT
           AS array_containers,
         sum(CASE WHEN cnt > 4096 THEN 1 ELSE 0 END)::BIGINT
           AS bitmap_containers,
         sum(CASE WHEN cnt <= 4096 THEN 2 * cnt ELSE 8192 END)::BIGINT
           AS roaring_bytes
  FROM (SELECT lang, term, chunk, count(*)::BIGINT AS cnt
        FROM sized GROUP BY 1, 2, 3)
  GROUP BY lang
),
flat AS (
  SELECT lang, count(DISTINCT term)::BIGINT AS n_terms,
         count(*)::BIGINT AS n_postings,
         sum(vbytes)::BIGINT AS varint_bytes
  FROM sized GROUP BY lang
)
SELECT f.lang, f.n_terms, f.n_postings, f.varint_bytes,
       c.array_containers, c.bitmap_containers, c.roaring_bytes
FROM flat f JOIN containers c USING (lang)
ORDER BY lang
"""
