"""Corpus ingest: the engine's ``docs`` table.

Authoritative input shape (build target ``input_hint``): a table of
source-code repositories ``(repo, path, commit, lang, content)``. Locally it
is synthesized deterministically from the driver's
``/root/testdata/sf*/documents.parquet``
``(doc_id, text, lang, source, n_chars)`` with the column mapping from
``FIXTURES.md §1``:

    source -> repo,  doc_id -> path surrogate,  text -> content,
    commit = sha2(repo || path || 'v1', 256)[:40]   (deterministic)

Per-row invariant vs the reference corpus: ``content_sha256 =
sha2(content, 256)`` — Spark built-in, checked at ingest (the analog of the
reference's blob-integrity responsibility, smse_backend/services/
file_storage.py:534-570, re-expressed as a data-plane column).

Everything is a narrow projection over the parquet scan — no shuffle, no
UDF; at 10^12 rows this stage is embarrassingly parallel and bounded by
scan bandwidth.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from smse_backend_spark.functions.tokenizer import doc_len_col

LANG_EXT = {"py": "py", "js": "js", "go": "go", "java": "java", "rs": "rs",
            "en": "py", "es": "js", "de": "go", "fr": "java", "zh": "rs"}


def load_corpus(spark: SparkSession, sf_dir: str, with_doc_len: bool = False) -> DataFrame:
    """documents.parquet -> (doc_id, repo, path, commit, lang, content, content_sha256)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    ext = F.coalesce(
        F.element_at(
            F.create_map(*[F.lit(x) for kv in LANG_EXT.items() for x in kv]), F.col("lang")
        ),
        F.lit("txt"),
    )
    path = F.concat(F.lit("src/m"), (F.col("doc_id") % 50).cast("string"),
                    F.lit("/f"), F.col("doc_id").cast("string"), F.lit("."), ext)
    out = docs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.col("source").alias("repo"),
        path.alias("path"),
        F.substring(F.sha2(F.concat(F.col("source"), F.lit("/"), path, F.lit("v1")), 256), 1, 40)
        .alias("commit"),
        F.col("lang"),
        F.col("text").alias("content"),
        F.sha2(F.col("text"), 256).alias("content_sha256"),
    )
    if with_doc_len:
        out = out.withColumn("doc_len", doc_len_col("content"))
    return out


def scaled_corpus(corpus: DataFrame, replicas: int) -> DataFrame:
    """Deterministic synthetic scale-up: replicate rows with distinct doc_ids.

    Used only for the scaling bench (N vs 4N cores needs enough work that
    fixed overhead doesn't mask parallel speedup). doc_id' = doc_id * R + r
    keeps ids dense and deterministic; content is unchanged so per-doc CPU
    cost is identical across replicas.
    """
    if replicas <= 1:
        return corpus
    spark = corpus.sparkSession
    reps = spark.range(replicas).withColumnRenamed("id", "replica")
    return (
        corpus.crossJoin(F.broadcast(reps))
        .withColumn("doc_id", F.col("doc_id") * replicas + F.col("replica"))
        .drop("replica")
    )


def verify_sha256_invariant(corpus: DataFrame) -> int:
    """Count rows violating the per-row content-sha256 invariant (must be 0)."""
    return corpus.filter(F.sha2(F.col("content"), 256) != F.col("content_sha256")).count()


# --- multi-format sources ----------------------------------------------------
#
# The engine's corpus contract is the (repo, path, commit, lang, content)
# PROJECTION, not the container format: any Spark source that yields the
# documents schema feeds the identical pipeline. These helpers materialize
# the driver's parquet table as JSONL / CSV / ORC once per (process,
# sf_dir) and load it back through the same projection, so a contract
# entry can prove end-to-end rank identity off each format (the oracle is
# the ordinary parquet-backed SQL — same rows by construction).

import tempfile as _tempfile

_FMT_CACHE: dict[tuple[str, str], str] = {}

SOURCE_FORMATS = ("jsonl", "csv", "orc")


def _project_corpus(docs: DataFrame, with_doc_len: bool = False) -> DataFrame:
    """The documents-schema -> corpus projection shared by every source."""
    from pyspark.sql import functions as F  # noqa: F811 (local for clarity)

    ext = F.coalesce(
        F.element_at(
            F.create_map(*[F.lit(x) for kv in LANG_EXT.items() for x in kv]),
            F.col("lang"),
        ),
        F.lit("txt"),
    )
    path = F.concat(F.lit("src/m"), (F.col("doc_id") % 50).cast("string"),
                    F.lit("/f"), F.col("doc_id").cast("string"),
                    F.lit("."), ext)
    out = docs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.col("source").alias("repo"),
        path.alias("path"),
        F.substring(
            F.sha2(F.concat(F.col("source"), F.lit("/"), path, F.lit("v1")),
                   256), 1, 40
        ).alias("commit"),
        F.col("lang"),
        F.col("text").alias("content"),
        F.sha2(F.col("text"), 256).alias("content_sha256"),
    )
    if with_doc_len:
        out = out.withColumn("doc_len", doc_len_col("content"))
    return out


def load_corpus_from(
    spark: SparkSession, sf_dir: str, fmt: str
) -> DataFrame:
    """documents as JSONL / CSV / ORC -> the standard corpus projection.

    The conversion writes once per (process, sf_dir, fmt) to a temp dir
    with the parquet table's exact schema; reads supply that schema
    explicitly (no inference — CSV would otherwise widen ints and JSON
    reorder fields). At 10^12 rows each source is still one
    embarrassingly-parallel scan; only the decode cost differs (columnar
    ORC ~ parquet; row-wise JSON/CSV pay per-row parsing).
    """
    if fmt not in SOURCE_FORMATS:
        raise ValueError(f"unknown source format {fmt!r}")
    key = (sf_dir, fmt)
    if key not in _FMT_CACHE:
        tmp = _tempfile.mkdtemp(prefix=f"smse_src_{fmt}_")
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        w = docs.write.mode("overwrite")
        if fmt == "jsonl":
            w.json(tmp)
        elif fmt == "csv":
            w.option("header", True).csv(tmp)
        else:
            w.orc(tmp)
        _FMT_CACHE[key] = tmp
    path = _FMT_CACHE[key]
    schema = spark.read.parquet(f"{sf_dir}/documents.parquet").schema
    if fmt == "jsonl":
        raw = spark.read.schema(schema).json(path)
    elif fmt == "csv":
        raw = spark.read.option("header", True).schema(schema).csv(path)
    else:
        raw = spark.read.orc(path)
    return _project_corpus(raw)
