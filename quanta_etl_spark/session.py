"""SparkSession factory for the engine.

Counterpart of the reference's ``create_spark_session``
(/root/reference/dags/spark/etl.py:7-22), re-designed for a generic
deployment: local by default, cluster-agnostic, with the scale-oriented
defaults the reference lacks (AQE, skew-join handling, Arrow transfers,
sane shuffle partitioning).

At 100 TB these settings are the starting point, not the end state:
`spark.sql.shuffle.partitions` should be sized so that each shuffle
partition holds 100-200 MB (AQE coalescing handles the rest), and
`spark.sql.files.maxPartitionBytes` governs scan parallelism.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

__all__ = ["get_spark", "s3a_conf", "stop_spark"]

_DEFAULTS: dict[str, str] = {
    # Adaptive query execution: runtime re-planning, partition coalescing,
    # skew-join splitting. Free wins at scale; on by default.
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # Arrow for any pandas UDF / toPandas path (the slow paths we do keep).
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # Deterministic timestamp semantics regardless of host timezone —
    # required for oracle-differential testing against DuckDB.
    "spark.sql.session.timeZone": "UTC",
    # Broadcast threshold: dims up to 64 MB broadcast instead of shuffling.
    "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
    # Parquet: vectorized reader on, predicate pushdown on (defaults, pinned
    # here so a misconfigured cluster profile can't silently disable them).
    "spark.sql.parquet.filterPushdown": "true",
    "spark.sql.parquet.enableVectorizedReader": "true",
    # Read INT64(TIMESTAMP(NANOS)) parquet columns (e.g. pandas-written
    # ns timestamps) as long instead of erroring; sources convert to
    # TimestampType explicitly (see sources/testdata.py).
    "spark.sql.legacy.parquet.nanosAsLong": "true",
}


def s3a_conf(
    endpoint: str | None = None,
    access_key: str | None = None,
    secret_key: str | None = None,
    path_style_access: bool = True,
    anonymous: bool = False,
) -> dict[str, str]:
    """Hadoop-S3A configuration block for ``get_spark(cloud_conf=...)``.

    Parity with the reference's session bootstrap, which wires s3a
    endpoint/path-style/V4-signing directly into the builder
    (/root/reference/dags/spark/etl.py:12-21) — its primary deployment
    reads ``s3a://`` URIs (etl.py:50,96). Credentials default to the
    AWS provider chain (env vars / instance profile); pass keys only
    for explicit-credential setups, or ``anonymous=True`` for public
    buckets like the reference's open datasets.

    NOTE: the hadoop-aws + aws-sdk jars must be on the cluster
    classpath (spark.jars.packages or a bundled distro) — not pinned
    here because the right version tracks the cluster's Hadoop."""
    conf = {
        "spark.hadoop.fs.s3a.impl": "org.apache.hadoop.fs.s3a.S3AFileSystem",
        "spark.hadoop.fs.s3a.path.style.access": str(path_style_access).lower(),
    }
    if endpoint:
        conf["spark.hadoop.fs.s3a.endpoint"] = endpoint
    if access_key:
        conf["spark.hadoop.fs.s3a.access.key"] = access_key
    if secret_key:
        conf["spark.hadoop.fs.s3a.secret.key"] = secret_key
    if anonymous:
        conf["spark.hadoop.fs.s3a.aws.credentials.provider"] = (
            "org.apache.hadoop.fs.s3a.AnonymousAWSCredentialsProvider"
        )
    return conf


def get_spark(
    app_name: str = "quanta-etl-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
    cloud_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession with engine defaults.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` locally; on a real
    cluster leave it None and let spark-submit inject it.

    ``cloud_conf`` is an object-store configuration block, e.g.
    ``get_spark(cloud_conf=s3a_conf(endpoint="s3.eu-central-1.amazonaws.com"))``
    — applied before ``extra_conf`` so callers can still override keys.
    """
    builder = SparkSession.builder.appName(app_name)
    if master is None and "SPARK_GRAFT_CPUS" in os.environ:
        master = f"local[{os.environ['SPARK_GRAFT_CPUS']}]"
    if master is not None:
        builder = builder.master(master)
    conf = dict(_DEFAULTS)
    if master is not None and master.startswith("local"):
        # Spark's 1g driver-heap default is sized for a thin cluster
        # driver, but in local mode the "driver" IS the executor — all
        # N worker threads share that one heap. Size it like an
        # executor (>=4 GB/core guidance in SCALING.md, bounded here to
        # stay friendly on small hosts); only effective at JVM start,
        # a no-op when attaching to an existing session.
        conf.setdefault(
            "spark.driver.memory",
            os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"),
        )
    if shuffle_partitions is None:
        shuffle_partitions = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    conf["spark.sql.shuffle.partitions"] = str(shuffle_partitions)
    if cloud_conf:
        conf.update(cloud_conf)
    if extra_conf:
        conf.update(extra_conf)
    for k, v in conf.items():
        builder = builder.config(k, v)
    return builder.getOrCreate()


def stop_spark() -> None:
    active = SparkSession.getActiveSession()
    if active is not None:
        active.stop()
