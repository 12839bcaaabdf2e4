"""Live S3-compatible object-store exercise (moto endpoint).

Closes SURVEY S5's "untested live" gap: an in-process S3 server (moto)
receives deterministic blobs; the parallel prefix-listing source, the
blob rollup/GC operators, batch delete and the per-row sha256 integrity
check all run against the real S3 wire protocol. The s3a DataFrame
*data* path stays config-only (hadoop-aws jar absent in this image —
`session.object_store_conf` carries the full conf block).
"""

from __future__ import annotations

import hashlib
import time

import pytest

boto3 = pytest.importorskip("boto3")
moto = pytest.importorskip("moto")

from smse_backend_spark.sources.objectstore import (  # noqa: E402
    delete_keys,
    dir_size_rollup_objects,
    gc_candidates,
    list_prefixes_df,
    verify_content_sha256,
)

BUCKET = "smse-blobs"
N_DIRS = 4
PER_DIR = 30


@pytest.fixture(scope="module")
def s3(tmp_path_factory):
    from moto.server import ThreadedMotoServer

    server = ThreadedMotoServer(port=0, verbose=False)
    server.start()
    host, port = server.get_host_and_port()
    endpoint = f"http://{host}:{port}"
    import os

    os.environ.setdefault("AWS_ACCESS_KEY_ID", "testing")
    os.environ.setdefault("AWS_SECRET_ACCESS_KEY", "testing")
    c = boto3.client("s3", endpoint_url=endpoint, region_name="us-east-1")
    c.create_bucket(Bucket=BUCKET)
    bodies = {}
    for d in range(N_DIRS):
        for i in range(PER_DIR):
            key = f"src/m{d}/f{d * PER_DIR + i}.py"
            body = (f"def f{d}_{i}():\n    return {i * d}\n" * (i + 1)).encode()
            c.put_object(Bucket=BUCKET, Key=key, Body=body)
            bodies[key] = body
    yield endpoint, bodies
    server.stop()


def test_parallel_prefix_listing_is_complete(spark, s3):
    endpoint, bodies = s3
    prefixes = [f"src/m{d}/" for d in range(N_DIRS)]
    listing = list_prefixes_df(spark, endpoint, BUCKET, prefixes)
    assert listing.rdd.getNumPartitions() == N_DIRS
    rows = {r["key"]: r for r in listing.collect()}
    assert set(rows) == set(bodies)
    assert all(rows[k]["size"] == len(v) for k, v in bodies.items())
    # single-part uploads: etag is the body md5 — metadata-level integrity
    assert all(
        rows[k]["etag"] == hashlib.md5(v).hexdigest()
        for k, v in bodies.items()
    )


def test_dir_rollup_matches_uploaded_metadata(spark, s3):
    endpoint, bodies = s3
    listing = list_prefixes_df(
        spark, endpoint, BUCKET, [f"src/m{d}/" for d in range(N_DIRS)]
    )
    got = {
        r["dir"]: (r["n_files"], r["total_bytes"])
        for r in dir_size_rollup_objects(listing).collect()
    }
    assert got == {
        "src": (
            N_DIRS * PER_DIR,
            sum(len(v) for v in bodies.values()),
        )
    }


def test_content_sha256_invariant_roundtrip(s3):
    endpoint, bodies = s3
    sample = dict(list(bodies.items())[:10])
    expected = {
        k: hashlib.sha256(v).hexdigest() for k, v in sample.items()
    }
    assert verify_content_sha256(endpoint, BUCKET, expected) == []
    # a wrong expectation must be reported, not silently passed
    k0 = next(iter(sample))
    broken = dict(expected, **{k0: "0" * 64})
    assert verify_content_sha256(endpoint, BUCKET, broken) == [k0]


def test_gc_flags_and_deletes_old_objects(spark, s3):
    endpoint, _ = s3
    c = boto3.client("s3", endpoint_url=endpoint, region_name="us-east-1")
    c.put_object(Bucket=BUCKET, Key="tmp/stale.bin", Body=b"x" * 8)
    listing = list_prefixes_df(spark, endpoint, BUCKET, ["tmp/"])
    # age_hours=0: everything already written qualifies
    cands = [
        r["key"]
        for r in gc_candidates(listing, time.time() + 1.0, 0.0).collect()
    ]
    assert cands == ["tmp/stale.bin"]
    assert delete_keys(endpoint, BUCKET, cands) == 1
    left = list_prefixes_df(spark, endpoint, BUCKET, ["tmp/"]).count()
    assert left == 0
