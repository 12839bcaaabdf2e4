"""Sliding-window document chunking (the embedding-ingest preprocessor).

The reference chunks every text into 240-token windows with overlap 10
before embedding (``/root/reference/smse_backend/tasks.py:97-99``,
``TextConfig(chunk_size=240, chunk_overlap=10)``); its multipart search
then mean-fuses the per-chunk query embeddings (covered by
``operators/similarity.fuse_multipart``). This operator is the missing
front half: corpus -> (doc_id, chunk_id, n_tokens, chunk_text) rows, the
unit a 100 TB training-data pipeline feeds to an embedding model.

Scale shape: pure JVM Column algebra end to end — tokenize (the engine's
code-aware tokenizer), ``sequence`` + ``explode`` for the window index,
``slice`` for the window — no Python crossing, no shuffle at all (chunking
is embarrassingly row-parallel; output partitioning inherits the scan).
Row growth is bounded by ceil(doc_len/stride), so output size is
O(corpus tokens * size/stride).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from smse_backend_spark.functions.tokenizer import (
    tokenize_col,
    tokenize_duckdb_sql,
)


def chunk_documents(
    corpus: DataFrame,
    chunk_size: int = 240,
    overlap: int = 10,
    extra_cols: tuple[str, ...] = (),
) -> DataFrame:
    """(doc_id, chunk_id, n_tokens, chunk_text[, *extra_cols]): token
    windows of ``chunk_size`` advancing by ``chunk_size - overlap``; the
    last window may be short; token-less documents produce no rows.
    Defaults are the reference's TextConfig (240/10). ``extra_cols`` are
    carried through unchanged (e.g. ``lang`` for per-language packing)."""
    if overlap >= chunk_size:
        raise ValueError("overlap must be < chunk_size")
    stride = chunk_size - overlap
    base = (
        corpus.select(
            "doc_id", *extra_cols, tokenize_col(F.col("content")).alias("toks")
        )
        .withColumn("n", F.size("toks"))
        .filter(F.col("n") > 0)
    )
    n_chunks = F.when(F.col("n") <= chunk_size, F.lit(1)).otherwise(
        F.floor((F.col("n") - chunk_size + stride - 1) / F.lit(stride)) + 1
    )
    ct = F.slice("toks", F.col("chunk_id").cast("int") * stride + 1, chunk_size)
    return (
        base.select(
            "doc_id",
            *extra_cols,
            F.explode(F.sequence(F.lit(0), (n_chunks - 1).cast("int"))).alias(
                "chunk_id"
            ),
            "toks",
        )
        .select(
            "doc_id",
            *extra_cols,
            F.col("chunk_id").cast("long").alias("chunk_id"),
            F.size(ct).cast("long").alias("n_tokens"),
            F.array_join(ct, " ").alias("chunk_text"),
        )
    )


def pack_chunks(
    corpus: DataFrame,
    chunk_size: int = 240,
    overlap: int = 10,
    budget: int = 1024,
) -> DataFrame:
    """Concat-and-cut sequence packing — assign every chunk its position in
    fixed-size training sequences: (lang, doc_id, chunk_id, bin_id,
    bin_offset, straddles).

    The standard LLM-pretraining packer: per language (training sequences
    don't mix languages), chunks concatenate in (doc_id, chunk_id) order
    into one token stream cut every ``budget`` tokens; ``bin_id`` is the
    sequence holding the chunk's first token, ``bin_offset`` its position
    there, ``straddles`` whether it crosses the cut.

    Scale shape: one window partitioned by lang (an exclusive running sum
    of integer token counts — exact, order-pinned). At 10^12 rows the
    per-lang partition is the classic distributed prefix-sum (per-partition
    totals + broadcast prefix offsets); the per-lang window is the
    contract-scale expression of the same plan.
    """
    chunks = chunk_documents(corpus, chunk_size, overlap, extra_cols=("lang",))
    w = (
        Window.partitionBy("lang")
        .orderBy("doc_id", "chunk_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    excl = F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
    return chunks.select(
        "lang", "doc_id", "chunk_id", "n_tokens",
        F.floor(excl / budget).cast("long").alias("bin_id"),
        (excl % budget).cast("long").alias("bin_offset"),
        ((excl % budget) + F.col("n_tokens") > budget).alias("straddles"),
    )


def pack_chunks_dist(
    corpus: DataFrame,
    chunk_size: int = 240,
    overlap: int = 10,
    budget: int = 1024,
    n_groups: int | None = None,
) -> DataFrame:
    """Bit-identical to :func:`pack_chunks`, computed as the classic
    two-pass distributed prefix sum instead of one window task per
    language.

    ``pack_chunks``'s single ``partitionBy("lang")`` window is exact but
    serial per language — at 10^12 rows one task streams the whole
    English corpus. Here the stream is cut into ``n_groups``
    order-preserving blocks by doc-id range (``g = doc_id // d`` — block
    g's rows ALL precede block g+1's in the (doc_id, chunk_id) order, so
    blocked prefix sums compose exactly):

    1. local pass — running sum within (lang, g): n_groups-way parallel;
    2. offsets pass — per-(lang, g) subtotals (a partial-agg groupBy),
       then an exclusive sum over the TINY (n_langs × n_groups)-row
       frame, broadcast-joined back.

    excl = group_offset + local_excl, exactly the window's value: integer
    sums, so bit-identical output (asserted by test and by sharing
    :func:`pack_chunks_sql` as oracle). Cost: the chunk pipeline runs
    twice (subtotals + local pass) off the same scan — persist ``corpus``
    upstream if the tokenize is expensive; the shuffles are
    hashpartitioning(lang, g), i.e. parallel in n_groups, never in
    n_langs.
    """
    chunks = chunk_documents(corpus, chunk_size, overlap, extra_cols=("lang",))
    hi = corpus.agg(F.max("doc_id")).first()[0]
    if hi is None:
        return pack_chunks(corpus, chunk_size, overlap, budget)
    if n_groups is None:
        n_groups = max(
            8, corpus.sparkSession.sparkContext.defaultParallelism * 4
        )
    d = int(hi) // n_groups + 1
    blocked = chunks.withColumn("g", (F.col("doc_id") / d).cast("long"))

    w_local = (
        Window.partitionBy("lang", "g")
        .orderBy("doc_id", "chunk_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    local = blocked.withColumn(
        "local_excl", F.coalesce(F.sum("n_tokens").over(w_local), F.lit(0))
    )

    w_groups = (
        Window.partitionBy("lang").orderBy("g")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = (
        blocked.groupBy("lang", "g")
        .agg(F.sum("n_tokens").alias("g_total"))
        .withColumn("g_off", F.coalesce(F.sum("g_total").over(w_groups), F.lit(0)))
        .select("lang", "g", "g_off")
    )

    excl = F.col("g_off") + F.col("local_excl")
    return local.join(F.broadcast(offsets), ["lang", "g"]).select(
        "lang", "doc_id", "chunk_id", "n_tokens",
        F.floor(excl / budget).cast("long").alias("bin_id"),
        (excl % budget).cast("long").alias("bin_offset"),
        ((excl % budget) + F.col("n_tokens") > budget).alias("straddles"),
    )


def pack_chunks_sql(
    chunk_size: int = 240,
    overlap: int = 10,
    budget: int = 1024,
    table: str = "documents",
    content_col: str = "text",
) -> str:
    """DuckDB twin of :func:`pack_chunks`."""
    chunks = chunk_documents_sql(
        chunk_size, overlap, table, content_col, extra_cols=("lang",)
    )
    return f"""
WITH chunks AS ({chunks}),
x AS (
  SELECT lang, doc_id, chunk_id, n_tokens,
         coalesce(sum(n_tokens) OVER (
           PARTITION BY lang ORDER BY doc_id, chunk_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
         ), 0) AS excl
  FROM chunks
)
SELECT lang, doc_id, chunk_id, n_tokens,
       (excl // {budget})::BIGINT AS bin_id,
       (excl % {budget})::BIGINT AS bin_offset,
       (excl % {budget}) + n_tokens > {budget} AS straddles
FROM x
"""


def chunk_hash_embed(
    corpus: DataFrame,
    chunk_size: int = 240,
    overlap: int = 10,
    dim: int = 16,
) -> DataFrame:
    """Feature-hashed chunk embeddings mean-fused to one doc vector:
    (doc_id, dim, value) rows — the full reference ingest pipeline shape
    (chunk -> embed -> fuse, ``/root/reference/smse_backend/tasks.py:97-118``)
    with the model swapped for a deterministic signed feature hasher (the
    embedding-model call is an external service; the hasher keeps the
    pipeline exact and oracle-checkable, and is itself the classic
    hashing-trick text vectorizer).

    Each token hashes to one of ``dim`` buckets with a ±1 sign (both from
    its sha256); the fused doc vector is the signed bucket count over ALL
    chunk tokens (overlap tokens intentionally count once per chunk — this
    is mean-of-chunk-embeddings, not a doc-level bag) divided by the doc's
    total chunk-token count. Integer sums are order-independent, so the
    single final division is bit-identical cross-engine; results are
    rounded with the half-up-on-scaled-integer formula (oracle-safe, see
    BASELINE.md rounding note).

    Scale shape: chunk -> split -> explode -> two partial-agg groupBys on
    doc_id — one shuffle key, no UDF, no corpus re-read.
    """
    chunks = chunk_documents(corpus, chunk_size, overlap)
    toks = chunks.select(
        "doc_id", "n_tokens", F.explode(F.split("chunk_text", " ")).alias("tok")
    )
    h = F.conv(F.substring(F.sha2(F.col("tok"), 256), 1, 15), 16, 10).cast(
        "long"
    )
    sign = F.when(
        F.conv(F.substring(F.sha2(F.col("tok"), 256), 16, 1), 16, 10).cast(
            "int"
        )
        % 2
        == 0,
        F.lit(1),
    ).otherwise(F.lit(-1))
    sums = (
        toks.select("doc_id", (h % dim).alias("dim"), sign.alias("s"))
        .groupBy("doc_id", "dim")
        .agg(F.sum("s").alias("num"))
    )
    totals = chunks.groupBy("doc_id").agg(F.sum("n_tokens").alias("den"))
    v = F.col("num").cast("double") / F.col("den")
    return sums.join(totals, "doc_id").select(
        "doc_id",
        F.col("dim").cast("long").alias("dim"),
        (F.floor(v * 1e6 + F.lit(0.5)) / 1e6).alias("value"),
    )


def chunk_hash_embed_sql(
    chunk_size: int = 240,
    overlap: int = 10,
    dim: int = 16,
    table: str = "documents",
    content_col: str = "text",
) -> str:
    """DuckDB twin of :func:`chunk_hash_embed`."""
    chunks = chunk_documents_sql(chunk_size, overlap, table, content_col)
    return f"""
WITH chunks AS ({chunks}),
tok AS (
  SELECT doc_id, unnest(string_split(chunk_text, ' ')) AS tok FROM chunks
),
hashed AS (
  SELECT doc_id,
         ((('0x' || substr(sha256(tok), 1, 15))::UBIGINT)::BIGINT % {dim})
           AS dim,
         CASE WHEN ('0x' || substr(sha256(tok), 16, 1))::INT % 2 = 0
              THEN 1 ELSE -1 END AS s
  FROM tok
),
sums AS (SELECT doc_id, dim, sum(s)::BIGINT AS num FROM hashed GROUP BY 1, 2),
totals AS (SELECT doc_id, sum(n_tokens)::BIGINT AS den FROM chunks GROUP BY 1)
SELECT s.doc_id, s.dim::BIGINT AS dim,
       floor(s.num::DOUBLE / t.den * 1e6 + 0.5) / 1e6 AS value
FROM sums s JOIN totals t USING (doc_id)
"""


def chunk_documents_sql(
    chunk_size: int = 240,
    overlap: int = 10,
    table: str = "documents",
    content_col: str = "text",
    extra_cols: tuple[str, ...] = (),
) -> str:
    """DuckDB twin of :func:`chunk_documents` (identical tokenizer,
    window arithmetic and join separator)."""
    stride = chunk_size - overlap
    ec = "".join(f"{c}, " for c in extra_cols)
    return f"""
WITH t AS (
  SELECT doc_id, {ec}{tokenize_duckdb_sql(content_col)} AS toks FROM {table}
),
n AS (SELECT doc_id, {ec}toks, len(toks) AS n FROM t WHERE len(toks) > 0),
c AS (
  SELECT doc_id, {ec}toks,
         CASE WHEN n <= {chunk_size} THEN 1
              ELSE (n - {chunk_size} + {stride} - 1) // {stride} + 1
         END AS n_chunks
  FROM n
),
x AS (SELECT doc_id, {ec}toks, unnest(range(0, n_chunks)) AS chunk_id FROM c),
y AS (
  SELECT doc_id, {ec}chunk_id,
         list_slice(toks, chunk_id * {stride} + 1,
                    chunk_id * {stride} + {chunk_size}) AS ct
  FROM x
)
SELECT doc_id, {ec}chunk_id::BIGINT AS chunk_id, len(ct)::BIGINT AS n_tokens,
       array_to_string(ct, ' ') AS chunk_text
FROM y
"""


def curation_pipeline(
    docs: DataFrame,
    chunk_size: int = 240,
    overlap: int = 10,
    budget: int = 1024,
    train: float = 0.8,
    val: float = 0.1,
) -> DataFrame:
    """The canonical training-data flow as ONE composed plan: exact-dedup
    survivors -> train-split members -> token chunks -> packed sequences.

    Composability is the point: every stage is the already-verified
    operator (operators/dedup.dedup_exact, operators/sampling.hash_split,
    pack_chunks), fused by Catalyst into one job — the dedup window, the
    split filter (map-only hash predicate) and the chunker all run off a
    single corpus scan; the only exchanges are the dedup hash window and
    the per-lang packing window.
    """
    from smse_backend_spark.operators.dedup import dedup_exact
    from smse_backend_spark.operators.sampling import hash_split

    survivors = dedup_exact(docs).select("doc_id")
    train_ids = hash_split(docs, train, val).filter(
        F.col("split") == "train"
    ).select("doc_id")
    kept = (
        docs.join(survivors, "doc_id", "left_semi")
        .join(train_ids, "doc_id", "left_semi")
        .select("doc_id", "lang", F.col("text").alias("content"))
    )
    return pack_chunks(kept, chunk_size, overlap, budget)


def curation_pipeline_sql(
    chunk_size: int = 240,
    overlap: int = 10,
    budget: int = 1024,
    train: float = 0.8,
    val: float = 0.1,
) -> str:
    """DuckDB twin of :func:`curation_pipeline` (stage twins chained; the
    packer SQL runs as a nested CTE over the kept set)."""
    from smse_backend_spark.operators.sampling import hash_split_sql

    inner = pack_chunks_sql(chunk_size, overlap, budget, table="kept",
                            content_col="text")
    return f"""
WITH surv AS (
  SELECT doc_id FROM (
    SELECT doc_id, min(doc_id) OVER (PARTITION BY sha256(text)) AS canonical
    FROM documents
  ) WHERE doc_id = canonical
),
tr AS (SELECT doc_id FROM ({hash_split_sql(train, val)}) WHERE split = 'train'),
kept AS (
  SELECT d.doc_id, d.lang, d.text FROM documents d
  JOIN surv USING (doc_id) JOIN tr USING (doc_id)
)
SELECT * FROM ({inner})
"""
