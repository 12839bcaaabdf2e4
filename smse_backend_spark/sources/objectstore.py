"""S3-compatible object-store source: parallel prefix listing + blob ops.

Reference analog: smse_backend's S3 backend
(`smse_backend/services/file_storage.py:220-431`) lists, stats, uploads
and deletes blobs through boto3 one call at a time. At 10^12 objects the
LISTING is itself big data — a single driver paging loop would take
days — so the Spark-first shape is: shard the keyspace by prefix, give
every executor its own boto3 client, and page each shard independently
(`mapPartitions`), yielding a DataFrame of object metadata that the
relational blob operators (`operators/storage.py` semantics: prefix
listing, directory rollup, age GC) run on unchanged.

The s3a *data* path (reading object bytes as a DataFrame source) is
configured in `session.object_store_conf` but cannot run in this image —
the hadoop-aws jar is absent — so reads here go through boto3 as well
(driver-bounded, used for the per-row sha256 integrity check on a
sample). Listing, rollup, GC and delete are exercised live against an
S3-compatible endpoint (moto) in `tests/test_objectstore.py`.

Scale notes:
* one task per prefix shard — the standard S3 inventory pattern; shard
  by hex prefix (16^n shards) when key layout is opaque;
* `list_objects_v2` pages are 1000 keys; the generator yields rows
  straight into Arrow batches — nothing accumulates per task;
* deletes batch 1000 keys per call (the API maximum) and only ever see
  the GC candidate set, never the full listing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_SCHEMA = "key string, size long, etag string, last_modified double"


def list_prefixes_df(
    spark: SparkSession,
    endpoint_url: str,
    bucket: str,
    prefixes: list[str],
    region: str = "us-east-1",
    access_key: str = "testing",
    secret_key: str = "testing",
) -> DataFrame:
    """(key, size, etag, last_modified) for every object under any of
    ``prefixes`` — one Spark task per prefix shard, each paging its own
    ``list_objects_v2`` with its own boto3 client (clients are not
    serializable and must be born on the executor)."""
    endpoint, bkt, reg = endpoint_url, bucket, region
    ak, sk = access_key, secret_key

    def _part(it):
        import boto3

        c = boto3.client(
            "s3", endpoint_url=endpoint, region_name=reg,
            aws_access_key_id=ak, aws_secret_access_key=sk,
        )
        for pfx in it:
            token = None
            while True:
                kw = {"Bucket": bkt, "Prefix": pfx, "MaxKeys": 1000}
                if token:
                    kw["ContinuationToken"] = token
                r = c.list_objects_v2(**kw)
                for o in r.get("Contents", []):
                    yield (
                        o["Key"],
                        int(o["Size"]),
                        o["ETag"].strip('"'),
                        o["LastModified"].timestamp(),
                    )
                if not r.get("IsTruncated"):
                    break
                token = r["NextContinuationToken"]

    rdd = spark.sparkContext.parallelize(
        list(prefixes), max(1, len(prefixes))
    ).mapPartitions(_part)
    return spark.createDataFrame(rdd, _SCHEMA)


def dir_size_rollup_objects(listing: DataFrame) -> DataFrame:
    """Directory-size aggregation over an object listing (the
    `operators/storage.dir_size_rollup` semantics on live S3 metadata):
    (dir, n_files, total_bytes) by the first key component, ordered."""
    d = F.split(F.col("key"), "/")[0]
    return (
        listing.groupBy(d.alias("dir"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_files"),
            F.sum("size").cast("long").alias("total_bytes"),
        )
        .orderBy("dir")
    )


def gc_candidates(
    listing: DataFrame, now_ts: float, age_hours: float
) -> DataFrame:
    """Objects older than ``age_hours`` (the `temp_file_gc` rule on live
    metadata): (key, age_hours) ordered by key."""
    age = (F.lit(float(now_ts)) - F.col("last_modified")) / F.lit(3600.0)
    return (
        listing.select("key", age.alias("age_hours"))
        .filter(F.col("age_hours") >= age_hours)
        .orderBy("key")
    )


def delete_keys(
    endpoint_url: str, bucket: str, keys: list[str],
    region: str = "us-east-1",
    access_key: str = "testing",
    secret_key: str = "testing",
) -> int:
    """Batch-delete ``keys`` (1000 per call, the API max) — driver-side
    because the candidate set is GC output, bounded by policy, never the
    full listing. Returns the number deleted."""
    import boto3

    c = boto3.client(
        "s3", endpoint_url=endpoint_url, region_name=region,
        aws_access_key_id=access_key, aws_secret_access_key=secret_key,
    )
    n = 0
    for i in range(0, len(keys), 1000):
        batch = keys[i:i + 1000]
        c.delete_objects(
            Bucket=bucket,
            Delete={"Objects": [{"Key": k} for k in batch], "Quiet": True},
        )
        n += len(batch)
    return n


def verify_content_sha256(
    endpoint_url: str,
    bucket: str,
    expected: dict[str, str],
    region: str = "us-east-1",
    access_key: str = "testing",
    secret_key: str = "testing",
) -> list[str]:
    """Fetch each key and compare sha256(body) to ``expected`` — the
    per-row content-integrity invariant the target spec requires against
    the reference corpus, applied at the blob layer. Returns the keys
    that FAIL (empty list = all verified). Driver-bounded: callers pass
    a sample or a per-partition slice, never 10^12 keys."""
    import hashlib

    import boto3

    c = boto3.client(
        "s3", endpoint_url=endpoint_url, region_name=region,
        aws_access_key_id=access_key, aws_secret_access_key=secret_key,
    )
    bad = []
    for key, want in expected.items():
        body = c.get_object(Bucket=bucket, Key=key)["Body"].read()
        if hashlib.sha256(body).hexdigest() != want:
            bad.append(key)
    return bad
