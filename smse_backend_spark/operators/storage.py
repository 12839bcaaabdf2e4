"""Blob-store metadata operators, re-expressed over the corpus table.

The reference's storage layer exposes prefix listing, file metadata,
directory sizing, and age-based GC over a local-FS/S3 blob store
(smse_backend/services/file_storage.py:127-168, 350-384, 675-735). On
Spark those are plain DataFrame ops over the catalog/corpus metadata —
every function here is a narrow projection/filter/aggregate with a DuckDB
oracle twin, no UDFs.

Path synthesis matches ``corpus.load_corpus``: ``src/m{doc_id%50}/f{doc_id}.{ext}``
with ext from ``LANG_EXT`` (lang -> file extension).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from smse_backend_spark.corpus import LANG_EXT, load_corpus

# DuckDB fragment reproducing load_corpus's path column
_EXT_CASE = "CASE lang " + " ".join(
    f"WHEN '{k}' THEN '{v}'" for k, v in LANG_EXT.items()
) + " ELSE 'txt' END"
_PATH_SQL = (
    "'src/m' || (doc_id % 50)::VARCHAR || '/f' || doc_id::VARCHAR || '.' || "
    + f"({_EXT_CASE})"
)


def blob_listing(spark: SparkSession, sf_dir: str, prefix: str = "src/m1/") -> DataFrame:
    """Prefix listing (S7, file_storage.py:127-150) + size-KB metadata (F9,
    :517-532) + first-path-component owner check (F11, :801-812)."""
    c = load_corpus(spark, sf_dir)
    return (
        c.filter(F.col("path").startswith(prefix))
        .select(
            "doc_id",
            "path",
            F.split(F.col("path"), "/")[0].alias("root_dir"),
            F.round(F.octet_length("content") / F.lit(1024.0), 2).alias("size_kb"),
        )
    )


def blob_listing_sql(prefix: str = "src/m1/") -> str:
    return f"""
WITH files AS (
  SELECT doc_id, {_PATH_SQL} AS path, octet_length(encode(text)) AS bytes
  FROM documents
)
SELECT doc_id, path, split_part(path, '/', 1) AS root_dir,
       round(bytes / 1024.0, 2) AS size_kb
FROM files WHERE path LIKE '{prefix}%'
"""


def dir_size_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Directory-size aggregation (A4, file_storage.py:710-735): bytes and
    file count per directory."""
    c = load_corpus(spark, sf_dir)
    return (
        c.select(
            F.split(F.col("path"), "/")[1].alias("dir"),
            F.octet_length("content").alias("bytes"),
        )
        .groupBy("dir")
        .agg(
            F.count(F.lit(1)).alias("n_files"),
            F.sum("bytes").alias("total_bytes"),
        )
    )


def dir_size_rollup_sql() -> str:
    return f"""
WITH files AS (
  SELECT {_PATH_SQL} AS path, octet_length(encode(text)) AS bytes FROM documents
)
SELECT split_part(path, '/', 2) AS dir, count(*) AS n_files,
       sum(bytes)::BIGINT AS total_bytes
FROM files GROUP BY 1
"""


def temp_file_gc(spark: SparkSession, sf_dir: str, age_hours: int = 24) -> DataFrame:
    """Age-based GC predicate (S12/F10, file_storage.py:675-708): rows older
    than the cutoff, anchored to max(ts) so the result is deterministic
    (wall-clock anchoring is banned in the data path — SURVEY.md F8 note)."""
    e = spark.read.parquet(f"{sf_dir}/events.parquet")
    cutoff = e.agg(
        (F.max("ts") - F.expr(f"INTERVAL {age_hours} HOURS")).alias("c")
    ).first()["c"]
    return (
        e.filter(F.col("ts") < F.lit(cutoff))
        .select("event_id", "user_id", "ts")
    )


def temp_file_gc_sql(age_hours: int = 24) -> str:
    return f"""
SELECT event_id, user_id, ts FROM events
WHERE ts < (SELECT max(ts) - INTERVAL {age_hours} HOUR FROM events)
"""


def filename_display(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's derived ``Content.filename``: stored blobs carry a
    ``{uuidhex}_{original}`` name and the display name strips everything up
    to the first underscore (models/content.py:42-55). Stored names are
    synthesized deterministically (hash prefix instead of uuid4 — F8)."""
    c = load_corpus(spark, sf_dir)
    stored = F.concat(
        F.substring(F.sha2(F.col("path"), 256), 1, 8),
        F.lit("_doc_"),
        F.col("doc_id").cast("string"),
    )
    return c.select(
        "doc_id",
        stored.alias("stored_name"),
        F.regexp_replace(stored, "^[^_]*_", "").alias("display_name"),
        # regex-validation predicate (F7 analog of the reference's email
        # regex check, models/user.py:24-29): stored names must carry the
        # 8-hex-digit content prefix
        stored.rlike("^[0-9a-f]{8}_").alias("valid"),
    )


def filename_display_sql() -> str:
    return f"""
WITH files AS (
  SELECT doc_id,
         substring(sha256({_PATH_SQL}), 1, 8) || '_doc_' || doc_id::VARCHAR
           AS stored_name
  FROM documents
)
SELECT doc_id, stored_name,
       regexp_replace(stored_name, '^[^_]*_', '') AS display_name,
       regexp_matches(stored_name, '^[0-9a-f]{{8}}_') AS valid
FROM files
"""
