"""sf1-scale LSH hot-bucket skew stress (VERDICT r6 #5).

Builds a skewed documents table — the sf1 corpus (50k docs) plus ONE
hotspot text duplicated ``HOT``× (default 10,000) — and times the dedup
family on it with the default ``max_bucket=4096`` guard, on BOTH the
Arrow (`_fused_likely_pairs`) and pure-Catalyst (`use_arrow=False`)
paths. Every band of the identical hotspot text collides into one LSH
bucket of ~10k rows; unguarded pair generation would materialize
bands × 10k²/2 ≈ 8×10⁸ candidate rows — the guard's chain+star
spanning set keeps it ≤ bands × 2×10⁴ while cluster assembly still
finds the full hotspot cluster.

Wall-times land in NOTES.md; the scale-independent behavior is pinned
by tests/test_plans.py::test_minhash_hot_bucket_bounded and
::test_minhash_catalyst_fallback_hot_bucket_bounded.

Usage:
    python tools/skew_stress.py [hot_copies] [sf_dir]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main() -> int:
    hot = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/.benchdata/sf1"

    from pyspark.sql import SparkSession, functions as F

    from quanta_etl_spark.operators import dedup as D
    from quanta_etl_spark.operators import graph as G

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "48g")
        .appName("skew-stress")
        .getOrCreate()
    )
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    template = (
        "subscribe to our newsletter for weekly market updates and "
        "exclusive trading insights delivered straight to your inbox "
    ) * 4
    hot_df = (
        spark.range(hot)
        .select(
            (F.col("id") + F.lit(10_000_000_000)).alias("doc_id"),
            F.lit(template).alias("text"),
        )
    )
    skewed = docs.unionByName(hot_df).repartition(32)
    skewed.cache().count()
    n_total = skewed.count()
    print(f"corpus: {n_total} docs ({hot} hotspot copies)")

    results = {}
    for label, kwargs in [
        ("arrow", {}),
        ("catalyst", {"use_arrow": False}),
    ]:
        t0 = time.time()
        pairs = D.minhash_dedup_pairs(
            skewed, "doc_id", "text", threshold=0.8, **kwargs
        )
        n_pairs = pairs.count()
        t_pairs = time.time() - t0
        t0 = time.time()
        clusters = G.assign_clusters(pairs)
        hot_cluster = (
            clusters.where(F.col("id") >= 10_000_000_000)
            .select("cluster_id")
            .distinct()
            .count()
        )
        hot_members = clusters.where(F.col("id") >= 10_000_000_000).count()
        t_clusters = time.time() - t0
        results[label] = (n_pairs, t_pairs, t_clusters)
        print(
            f"{label:9s} pairs={n_pairs} ({t_pairs:.1f}s)  "
            f"clusters: hotspot in {hot_cluster} cluster(s), "
            f"{hot_members}/{hot} members ({t_clusters:.1f}s)"
        )
        assert hot_cluster == 1, "hotspot cluster split"
        assert hot_members == hot, "hotspot member lost"
        # guard bound: spanning set is linear, not quadratic
        bound = 16 * 2 * (n_total)
        assert n_pairs <= bound, f"pair listing {n_pairs} > linear bound {bound}"
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
