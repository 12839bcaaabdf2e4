"""Multimodal binary-column plumbing (decode stubbed, pipeline real)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from smse_backend_spark.sources.multimodal import (
    extract_image_features,
    frame_sample_plan,
    ingest_binary_dir,
    modality_col,
)


@pytest.fixture(scope="module")
def media_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("media")
    (d / "a.jpg").write_bytes(b"\xff\xd8fakejpeg-a" * 100)
    (d / "b.png").write_bytes(b"\x89PNGfake-b" * 50)
    (d / "c.mp3").write_bytes(b"ID3fakeaudio" * 200)
    (d / "d.txt").write_text("plain text doc")
    (d / "e.unknown").write_bytes(b"???")
    return str(d)


def test_ingest_scheme_agnostic_uri(spark, media_dir):
    """S5/S6 backend dispatch: the same ingest runs against an explicit
    filesystem URI (file://) as against a bare path — all IO resolves
    through Hadoop FileSystem, so an s3a:// bucket is the same code path
    with ``session.object_store_conf`` + the hadoop-aws jars."""
    plain = sorted(
        (r["path"].rsplit("/", 1)[-1], r["sha256"], r["length"])
        for r in ingest_binary_dir(spark, media_dir).collect()
    )
    uri = sorted(
        (r["path"].rsplit("/", 1)[-1], r["sha256"], r["length"])
        for r in ingest_binary_dir(spark, f"file://{media_dir}").collect()
    )
    assert plain == uri and len(plain) == 5


def test_object_store_conf_shape():
    from smse_backend_spark.session import object_store_conf

    conf = object_store_conf("http://localhost:9000")
    assert conf["spark.hadoop.fs.s3a.committer.name"] == "magic"
    assert conf["spark.hadoop.fs.s3a.endpoint"] == "http://localhost:9000"
    assert conf["spark.hadoop.fs.s3a.path.style.access"] == "true"
    # no credential material may ever appear in conf
    assert not any("secret" in k or "access.key" in k for k in conf)
    assert "spark.hadoop.fs.s3a.endpoint" not in object_store_conf()


def test_apply_object_store_conf_live_session(spark):
    """S5: the fs.s3a.* conf lands on a LIVE session's Hadoop
    configuration (runtime-mutable, unlike the committer keys)."""
    from smse_backend_spark.session import apply_object_store_conf

    apply_object_store_conf(spark, "http://localhost:9000")
    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    assert hconf.get("fs.s3a.endpoint") == "http://localhost:9000"
    assert hconf.get("fs.s3a.committer.name") == "magic"
    assert hconf.get("fs.s3a.path.style.access") == "true"


def test_s3a_live_roundtrip_moto(spark, media_dir):
    """S5 live: ingest straight from a moto S3 bucket over s3a. The stock
    spark-bin-hadoop3 image ships no hadoop-aws jars, so this SKIPS there
    and auto-activates on any deployment that has them (the rest of the
    engine needs no change — same Hadoop FS resolution as file://)."""
    from smse_backend_spark.session import (
        apply_object_store_conf,
        s3a_filesystem_available,
    )

    if not s3a_filesystem_available(spark):
        pytest.skip("hadoop-aws jars not on the JVM classpath")
    import boto3
    from moto.server import ThreadedMotoServer

    server = ThreadedMotoServer(port=0)
    server.start()
    try:
        host, port = server._server.server_address[:2]
        endpoint = f"http://{host}:{port}"
        s3 = boto3.client(
            "s3", endpoint_url=endpoint,
            aws_access_key_id="test", aws_secret_access_key="test",
            region_name="us-east-1",
        )
        s3.create_bucket(Bucket="media")
        import pathlib

        for p in pathlib.Path(media_dir).iterdir():
            s3.put_object(Bucket="media", Key=p.name, Body=p.read_bytes())
        apply_object_store_conf(spark, endpoint)
        hconf = spark.sparkContext._jsc.hadoopConfiguration()
        hconf.set("fs.s3a.access.key", "test")
        hconf.set("fs.s3a.secret.key", "test")
        got = sorted(
            (r["path"].rsplit("/", 1)[-1], r["sha256"], r["length"])
            for r in ingest_binary_dir(spark, "s3a://media").collect()
        )
        want = sorted(
            (r["path"].rsplit("/", 1)[-1], r["sha256"], r["length"])
            for r in ingest_binary_dir(spark, media_dir).collect()
        )
        assert got == want
    finally:
        server.stop()


def test_ingest_modality_and_sha(spark, media_dir):
    m = ingest_binary_dir(spark, media_dir)
    rows = {r["path"].rsplit("/", 1)[-1]: r for r in m.collect()}
    assert rows["a.jpg"]["modality"] == "image"
    assert rows["b.png"]["modality"] == "image"
    assert rows["c.mp3"]["modality"] == "audio"
    assert rows["d.txt"]["modality"] == "text"
    assert rows["e.unknown"]["modality"] is None  # quarantine, not crash
    import hashlib

    assert rows["d.txt"]["sha256"] == hashlib.sha256(b"plain text doc").hexdigest()
    assert all(r["length"] > 0 for r in rows.values())


def test_image_features_shape_and_determinism(spark, media_dir):
    m = ingest_binary_dir(spark, media_dir)
    f1 = {r["path"]: r for r in extract_image_features(m).collect()}
    f2 = {r["path"]: r for r in extract_image_features(m).collect()}
    assert len(f1) == 2  # only the two images
    for p, r in f1.items():
        assert (r["height"], r["width"]) == (8, 8)
        assert len(r["features"]) == 64
        assert f2[p]["features"] == r["features"]  # deterministic stub


def test_frame_sample_plan(spark, media_dir):
    m = ingest_binary_dir(spark, media_dir)
    plan = frame_sample_plan(m, every_n=1)
    rows = plan.groupBy("path").agg(F.count(F.lit(1)).alias("n")).collect()
    assert all(r["n"] >= 1 for r in rows)
    # text is excluded from frame sampling
    assert not any(r["path"].endswith("d.txt") for r in rows)


def test_modality_col_is_pure_column(spark):
    df = spark.createDataFrame(
        [("x/y.JPG",), ("z.flac",), ("noext",)], "path string"
    ).select(modality_col(F.col("path")).alias("m"))
    assert [r["m"] for r in df.collect()] == ["image", "audio", None]
