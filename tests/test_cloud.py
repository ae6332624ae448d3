"""cloud_conf / cloud_session: the S3A posture as a tested surface.

Pure-dict tests — no cloud, no SparkSession. The keys are public Hadoop
S3A / Spark configuration; what's certified here is that the builder
emits the README "Cloud object stores" mapping exactly and rejects
incoherent combinations.
"""

import pytest

from dicom_metadata_extractor_serverless_datalake_spark.cloud import cloud_conf


def test_magic_committer_defaults():
    c = cloud_conf()
    assert c["spark.hadoop.fs.s3a.committer.name"] == "magic"
    assert c["spark.hadoop.fs.s3a.committer.magic.enabled"] == "true"
    assert (
        c["spark.sql.sources.commitProtocolClass"]
        == "org.apache.spark.internal.io.cloud.PathOutputCommitProtocol"
    )
    assert (
        c["spark.sql.parquet.output.committer.class"]
        == "org.apache.spark.internal.io.cloud.BindingParquetOutputCommitter"
    )
    # ranged-read ingest shape is the default posture
    assert c["spark.hadoop.fs.s3a.experimental.input.fadvise"] == "random"
    # executor-memory-safe multipart assembly
    assert c["spark.hadoop.fs.s3a.fast.upload.buffer"] == "disk"
    # pool sized above task threads
    assert int(c["spark.hadoop.fs.s3a.connection.maximum"]) >= int(
        c["spark.hadoop.fs.s3a.threads.max"]
    )
    # no staging keys leak into the magic posture
    assert not any("staging" in k for k in c)


def test_directory_committer_requires_and_emits_staging():
    with pytest.raises(ValueError, match="staging_tmp"):
        cloud_conf(committer="directory")
    c = cloud_conf(committer="directory", staging_tmp="/mnt/local/staging")
    assert c["spark.hadoop.fs.s3a.committer.name"] == "directory"
    assert c["spark.hadoop.fs.s3a.committer.staging.tmp.path"] == "/mnt/local/staging"
    assert c["spark.hadoop.fs.s3a.committer.staging.conflict-mode"] == "append"
    assert "spark.hadoop.fs.s3a.committer.magic.enabled" not in c


def test_warehouse_uri_validated_and_emitted():
    c = cloud_conf(warehouse="s3a://lake/warehouse")
    assert c["spark.sql.warehouse.dir"] == "s3a://lake/warehouse"
    with pytest.raises(ValueError, match="URI"):
        cloud_conf(warehouse="/local/path")


def test_bad_enums_rejected():
    with pytest.raises(ValueError, match="committer"):
        cloud_conf(committer="rename")
    with pytest.raises(ValueError, match="fadvise"):
        cloud_conf(fadvise="chaotic")


def test_commit_protocol_opt_out():
    # measured in-sandbox: the two committer classes live in the
    # spark-hadoop-cloud module; without the jar every query fails at
    # its first action, so installs lacking it must be able to carry
    # the fs.s3a.* posture alone
    c = cloud_conf(commit_protocol=False)
    assert "spark.sql.sources.commitProtocolClass" not in c
    assert "spark.sql.parquet.output.committer.class" not in c
    assert c["spark.hadoop.fs.s3a.committer.name"] == "magic"


def test_scan_heavy_override():
    c = cloud_conf(fadvise="sequential", connection_maximum=200, threads_max=128)
    assert c["spark.hadoop.fs.s3a.experimental.input.fadvise"] == "sequential"
    assert c["spark.hadoop.fs.s3a.connection.maximum"] == "200"


def test_cloud_session_layers_extra_conf_last():
    # cloud_session must pass cloud_conf + overrides into get_spark;
    # intercept get_spark so no real JVM session is created
    import dicom_metadata_extractor_serverless_datalake_spark.cloud as cloud_mod
    import dicom_metadata_extractor_serverless_datalake_spark.session as session_mod

    seen = {}

    def fake_get_spark(app_name, master, shuffle_partitions, extra_conf):
        seen.update(extra_conf)
        return "SENTINEL"

    orig = session_mod.get_spark
    session_mod.get_spark = fake_get_spark
    try:
        out = cloud_mod.cloud_session(
            warehouse="s3a://lake/wh",
            extra_conf={
                "spark.hadoop.fs.s3a.experimental.input.fadvise": "sequential",
                "spark.hadoop.fs.s3a.bucket.lake.endpoint.region": "eu-west-1",
            },
        )
    finally:
        session_mod.get_spark = orig
    assert out == "SENTINEL"
    assert seen["spark.sql.warehouse.dir"] == "s3a://lake/wh"
    # extra_conf wins over the builder's default
    assert seen["spark.hadoop.fs.s3a.experimental.input.fadvise"] == "sequential"
    assert seen["spark.hadoop.fs.s3a.bucket.lake.endpoint.region"] == "eu-west-1"
