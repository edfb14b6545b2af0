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

__all__ = ["get_spark", "stop_spark"]

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


def get_spark(
    app_name: str = "quanta-etl-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession with engine defaults.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` locally; on a real
    cluster leave it None and let spark-submit inject it.
    """
    builder = SparkSession.builder.appName(app_name)
    if master is None and "SPARK_GRAFT_CPUS" in os.environ:
        master = f"local[{os.environ['SPARK_GRAFT_CPUS']}]"
    if master is not None:
        builder = builder.master(master)
    conf = dict(_DEFAULTS)
    if shuffle_partitions is None:
        shuffle_partitions = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    conf["spark.sql.shuffle.partitions"] = str(shuffle_partitions)
    if extra_conf:
        conf.update(extra_conf)
    for k, v in conf.items():
        builder = builder.config(k, v)
    return builder.getOrCreate()


def stop_spark() -> None:
    active = SparkSession.getActiveSession()
    if active is not None:
        active.stop()
