"""Session factory (session.py): engine defaults and the cloud-storage
configuration passthrough (parity with the reference's s3a bootstrap,
/root/reference/dags/spark/etl.py:12-21)."""

from __future__ import annotations

from quanta_etl_spark.session import get_spark, s3a_conf


def test_s3a_conf_block():
    conf = s3a_conf(
        endpoint="s3.eu-central-1.amazonaws.com",
        access_key="AK",
        secret_key="SK",
    )
    assert conf["spark.hadoop.fs.s3a.impl"] == (
        "org.apache.hadoop.fs.s3a.S3AFileSystem"
    )
    assert conf["spark.hadoop.fs.s3a.endpoint"] == (
        "s3.eu-central-1.amazonaws.com"
    )
    assert conf["spark.hadoop.fs.s3a.access.key"] == "AK"
    assert conf["spark.hadoop.fs.s3a.secret.key"] == "SK"
    assert conf["spark.hadoop.fs.s3a.path.style.access"] == "true"
    # anonymous mode swaps in the anonymous credentials provider
    anon = s3a_conf(anonymous=True)
    assert "AnonymousAWSCredentialsProvider" in (
        anon["spark.hadoop.fs.s3a.aws.credentials.provider"]
    )
    # no keys -> provider chain left to defaults
    assert "spark.hadoop.fs.s3a.access.key" not in anon


def test_cloud_conf_lands_in_session(spark):
    """cloud_conf keys must reach the session conf (on a shared session
    getOrCreate applies them to the runtime conf)."""
    s = get_spark(
        cloud_conf=s3a_conf(endpoint="s3.example.test", anonymous=True)
    )
    assert s.conf.get("spark.hadoop.fs.s3a.endpoint") == "s3.example.test"
    # extra_conf overrides cloud_conf on key collision
    s2 = get_spark(
        cloud_conf={"spark.hadoop.fs.s3a.endpoint": "a"},
        extra_conf={"spark.hadoop.fs.s3a.endpoint": "b"},
    )
    assert s2.conf.get("spark.hadoop.fs.s3a.endpoint") == "b"
