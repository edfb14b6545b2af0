#!/usr/bin/env python
"""Benchmark harness: run every declared query at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and print ONE
JSON line:

    {"metric": "total_query_seconds", "value": N, "unit": "sec",
     "queries": {"<name>": sec, ...}, "sf": 0.1}

Each query is fully executed (written to the no-op sink, so the whole
plan runs on executors — nothing is collected to the driver). The
session is configured the way the engine recommends for production:
AQE on, shuffle partitions sized to the core count, Arrow enabled.
"""

from __future__ import annotations

import json
import os
import re
import statistics
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

# Stdout budget for the final JSON line. The driver's capture keeps only
# the tail of stdout; round 3's 74-query line and round 8's
# 45-entry sanity_violations dict both blew it and were recorded as
# parsed:null despite rc 0 (VERDICT r8 wrong #1). Everything beyond this
# budget belongs in the committed BENCH_LOCAL*.json file, never inline.
LINE_BUDGET = 1500

# A query whose prior committed sf0.1 time exceeds this is "heavy":
# always take 3 samples (VERDICT r8 #4 — the dedup_minhash 2.82→5.06s
# phantom passed the old 2-sample policy because BOTH samples landed in
# the same contention window; a third draw breaks the correlation).
HEAVY_SECONDS = 2.0

# Re-sample when the fresh best deviates from the prior committed round
# by more than this factor in either direction (VERDICT r8 #4).
DRIFT_FACTOR = 1.5

# sf0.001 runs ~100× less data than sf0.1; a query whose sf0.001 time
# is >= this fraction of its sf0.1 time is dominated by fixed overhead
# (micro-batch setup, JVM/python-worker round-trips), so its sf0.1
# number says nothing about data-scale efficiency (VERDICT r8 #5).
OVERHEAD_RATIO = 0.8


def is_overhead_dominated(t_small: float | None, t_big: float) -> bool:
    """True when the ~100×-smaller input runs at >= OVERHEAD_RATIO of
    the big input's time — i.e. fixed cost, not data volume, sets the
    timing, and per-query perf-gate math should exclude the row."""
    if t_small is None or t_big <= 0:
        return False
    return t_small >= OVERHEAD_RATIO * t_big


def calibration_seconds(spark) -> float:
    """Fixed-seed, I/O-free host-speed probe (VERDICT r12 #3): 100M
    synthetic rows → xxhash64 keys → decimal-summed groupBy(1000 keys)
    → global sort → no-op sink. Pure CPU + shuffle, zero disk reads,
    deterministic input (range + hashes, no RNG, no wall clock), so
    its wall time measures THIS HOST's Spark throughput and nothing
    else. Every bench record stores it as ``calibration_sec``;
    cross-round record comparisons divide per-query ratios by the
    calibration ratio instead of asserting "this host is slower"
    (the r12 records' 12-23% uniform drift had to be claimed as host
    noise because nothing measured it). Warm once, min of two — the
    probe rides the same JIT/codegen warmup policy as the panel."""
    from pyspark.sql import functions as F

    def run() -> float:
        t0 = time.perf_counter()
        (
            spark.range(0, 100_000_000, 1, 32)
            .select(
                (F.xxhash64("id") % 1000).alias("k"),
                (F.xxhash64("id", F.lit(1)) % 97).cast("double").alias("v"),
            )
            .groupBy("k")
            .agg(
                F.sum(F.col("v").cast("decimal(38,6)")).alias("s"),
                F.count(F.lit(1)).alias("n"),
                F.avg("v").alias("m"),
            )
            .orderBy("k")
            .write.mode("overwrite")
            .format("noop")
            .save()
        )
        return time.perf_counter() - t0

    run()  # warm codegen/JIT exactly like every panel query
    return round(min(run(), run()), 4)


def make_summary_line(full: dict, budget: int = LINE_BUDGET) -> str:
    """Compress the full per-query record into ONE stdout JSON line
    that fits the driver's tail-capture window.

    Keeps the headline metrics verbatim; inlines only the slowest
    queries that fit; replaces unbounded dicts (errors,
    sanity_violations, overhead_dominated) with counts + a pointer to
    the committed record file. Sheds weight in order — query timings
    (down to zero inlined; the shrink ladder always ends at keep=0
    even when len(queries) % 4 != 0), then the error-name list — so
    the line fits the budget whenever the fixed headline scalars +
    queries_file path do (they are built in main() and total well
    under 1 KB)."""
    summary = {
        "metric": full["metric"],
        "value": full["value"],
        "unit": full["unit"],
        "sf": full["sf"],
        "n_queries": full["n_queries"],
        "n_failed": full["n_failed"],
        "n_sanity_violations": len(full.get("sanity_violations", {})),
        "n_overhead_dominated": len(full.get("overhead_dominated", [])),
        # provenance marker (VERDICT r9 #4): how many excluded rows'
        # gate numbers are sourced from the committed sf1 record
        "n_gate_sf1": len(full.get("gate_sf1", {})),
        # measured host speed (VERDICT r12 #3) — one scalar, always fits
        "calibration_sec": full.get("calibration_sec"),
        "queries_file": full["queries_file"],
    }
    if full.get("errors"):  # names only; full messages live in the file
        summary["errors"] = sorted(full["errors"])[:20]
    timings = full.get("queries", {})
    slowest = sorted(timings.items(), key=lambda kv: -kv[1])
    keeps = list(range(len(slowest), -1, -4))
    if not keeps or keeps[-1] != 0:
        keeps.append(0)  # 198 % 4 == 2: the stride alone never hits 0
    line = ""
    for keep in keeps:
        summary["queries"] = dict(
            sorted(slowest[:keep])  # name-sorted for readability
        )
        summary["queries_truncated"] = len(timings) - keep
        line = json.dumps(summary)
        if len(line) <= budget:
            return line
    # Zero queries inlined and still over budget: the error-name list
    # is the only remaining unbounded field (up to 20 arbitrary-length
    # names) — drop it; n_failed keeps the count and the full messages
    # live in the committed record file.
    summary.pop("errors", None)
    return json.dumps(summary)


def bench_paths(sf_tag: str, sf: float | None, record: bool) -> tuple[str, str]:
    """(committed_record_name, write_path) for this run.

    Provenance rule, mechanically enforced (VERDICT r11 #5): the
    committed BENCH_LOCAL*.json files are CLEAN-HOST records, taken
    deliberately with --record. A default run (the driver's per-round
    bench, possibly on a contended host) still READS the committed
    record for drift/gate logic but WRITES its full per-query artifact
    to the gitignored BENCH_DRIVER*.json — so a driver run can never
    dirty the committed records again (r10 and r11 both ended with a
    driver-overwritten BENCH_LOCAL.json in the working tree)."""
    committed = (
        "BENCH_LOCAL.json" if sf == 0.1 else f"BENCH_LOCAL_sf{sf_tag}.json"
    )
    if record:
        return committed, committed
    driver = (
        "BENCH_DRIVER.json" if sf == 0.1 else f"BENCH_DRIVER_sf{sf_tag}.json"
    )
    return committed, driver


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else None

    from quanta_etl_spark.session import get_spark

    spark = get_spark(
        app_name="quanta-etl-bench",
        master=f"local[{cpus}]",
        shuffle_partitions=cpus,
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entry_mod

    qs = entry_mod.queries()

    # Warm the JVM / parquet footers once so the first timed query is not
    # charged for session startup.
    spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet")).count()

    # Host-speed probe before the panel (VERDICT r12 #3): recorded in
    # every bench artifact so cross-round comparisons can normalize by
    # measured host throughput instead of asserting it.
    calibration = calibration_seconds(spark)
    print(f"[bench] calibration: {calibration:.2f}s", file=sys.stderr, flush=True)

    def _drop_leftover_persists() -> None:
        # Operators that materialize intermediates (eager localCheckpoint,
        # persist) leave executor-memory residue; 60+ queries of it in one
        # session builds GC pressure that bleeds between measurements.
        # Each query is timed standalone, so clear between queries.
        for rdd in spark.sparkContext._jsc.getPersistentRDDs().values():
            rdd.unpersist()

    # Warmup once per query (JIT/codegen/python workers), then take the
    # MIN of the timed runs: this host is multi-tenant and per-run
    # throughput swings 2-3×; min-over-repetitions estimates the query's
    # real cost rather than the neighbors' load.
    # Sampling policy (VERDICT r7 #2, r8 #4 — the phantom market_share
    # 5.92s and dedup_minhash 5.06s spikes):
    #   * 2 samples by default;
    #   * a 3rd sample whenever (a) the two disagree by > 2×, (b) the
    #     best exceeds the SAME query's committed sf1 time (10× the
    #     data can't be slower, modulo noise), (c) the prior committed
    #     round put this query above HEAVY_SECONDS (heavy queries are
    #     exactly where a correlated-contention pair ships a phantom),
    #     or (d) the best drifts > DRIFT_FACTOR from the prior
    #     committed round in either direction.
    # One failing query must never zero out the whole perf signal
    # (round 4: a single AnalysisException aborted the run with rc 1 and
    # no timings at all) — record the error, keep timing the rest, and
    # always emit the summary JSON line.
    # Integral sf values print without the float's trailing ".0" so an
    # sf1 run targets the committed BENCH_LOCAL_sf1.json record (a
    # float-formatted "sf1.0" name would silently fork the record).
    # sf is None when the dir name carries no sf<number> segment — tag
    # the record "unknown" rather than crashing before any query runs
    # (int(None) raised here, r9 third review).
    if sf is None:
        sf_tag = "unknown"
    else:
        sf_tag = str(int(sf)) if sf == int(sf) else str(sf)
    record, write_path = bench_paths(
        sf_tag, sf, record="--record" in sys.argv[1:]
    )
    ref_sf1: dict[str, float] = {}
    prior: dict[str, float] = {}
    small: dict[str, float] = {}
    # `prior` is the committed record for the CURRENT scale factor —
    # the drift-resample trigger must protect EVERY recorded scale, not
    # just sf0.1: the r9 sf1 refresh shipped three phantom spikes
    # (pricing_summary 1.29→8.59s on untouched code) precisely because
    # the sf1 run had no prior to drift-check against.
    paths = [(record, prior)]
    if sf == 0.1:
        paths += [
            ("BENCH_LOCAL_sf1.json", ref_sf1),
            ("BENCH_LOCAL_sf0.001.json", small),
        ]
    record_cals: dict[int, float] = {}
    for idx, (path, dest) in enumerate(paths):
        try:
            with open(os.path.join(REPO, path)) as f:
                loaded = json.load(f)
            dest.update(loaded.get("queries", {}))
            if loaded.get("calibration_sec"):
                record_cals[idx] = float(loaded["calibration_sec"])
        except (FileNotFoundError, json.JSONDecodeError):
            pass
    # Host-speed normalization of the comparison baselines (r13): a
    # prior record taken on a host measured K× faster/slower than this
    # one would otherwise trip (or mask) the drift and sanity triggers
    # on every untouched query — exactly the r12 "uniform 12-23%
    # drift" ambiguity. Scale each loaded baseline by
    # current_cal / record_cal where the record stored its probe;
    # records predating the field stay raw (the old behavior).
    if record_cals:
        for idx, (path, dest) in enumerate(paths):
            if idx in record_cals and record_cals[idx] > 0:
                ratio = calibration / record_cals[idx]
                for k in dest:
                    dest[k] = round(dest[k] * ratio, 4)
        print(
            f"[bench] baselines normalized by calibration "
            f"(this host {calibration:.2f}s; records "
            f"{sorted(round(v, 2) for v in record_cals.values())})",
            file=sys.stderr,
            flush=True,
        )

    timings: dict[str, float] = {}
    medians: dict[str, float] = {}
    errors: dict[str, str] = {}
    sanity_violations: dict[str, dict[str, float]] = {}
    overhead_dominated: list[str] = []
    for name, fn in qs.items():
        try:
            fn(spark, sf_dir).write.mode("overwrite").format("noop").save()

            def _sample() -> float:
                _drop_leftover_persists()
                t0 = time.perf_counter()
                fn(spark, sf_dir).write.mode("overwrite").format(
                    "noop"
                ).save()
                return time.perf_counter() - t0

            samples = [_sample(), _sample()]
            t1 = ref_sf1.get(name)
            t_prior = prior.get(name)
            best = min(samples)

            def _suspect(b: float) -> bool:
                # a measurement SLOWER than its own committed history is
                # a phantom candidate until sampling says otherwise.
                # Upward drift only (ADVICE r9 #3): min-of-samples can
                # only be inflated by contention, never deflated, so a
                # >DRIFT_FACTOR improvement is a real change (e.g. the
                # r9 percentile-sharing 3× wins) and burning the full
                # 5-sample ladder on it every run until the record is
                # re-committed is pure wall-clock waste. Downward drift
                # gets ONE confirming sample below instead.
                return (
                    (t1 is not None and b > t1)
                    or (
                        t_prior is not None
                        and t_prior > 0
                        and b > t_prior * DRIFT_FACTOR
                    )
                )

            improved = (
                t_prior is not None
                and t_prior > 0
                and best < t_prior / DRIFT_FACTOR
            )
            # Resample while suspect, bounded at 5 samples total: the
            # r9 sf1 reruns showed host contention lasting across a
            # full 3-sample window (text_winnow 6.8s committed, 11.4s
            # min-of-3 on untouched code), so one extra sample is not
            # always enough to outlast a neighbor's burst. Converging
            # high 5 times in a row is accepted as a real change.
            # The unconditional heavy-query 3rd sample is an sf0.1
            # calibration (HEAVY_SECONDS=2 ≈ the top decile there); at
            # sf1 half the panel exceeds 2s and the rule would add a
            # full extra run per heavy query with no drift signal —
            # other scales rely on the _suspect() drift triggers.
            if (
                max(samples) > 2.0 * best
                or (
                    sf == 0.1
                    and t_prior is not None
                    and t_prior > HEAVY_SECONDS
                )
                or _suspect(best)
                or improved  # one confirming sample, not the ladder
            ):
                samples.append(_sample())
                best = min(samples)
            while _suspect(best) and len(samples) < 5:
                samples.append(_sample())
                best = min(samples)
            timings[name] = round(best, 4)
            # median-of-samples alongside the min (VERDICT r9 #6): min
            # is kept for the gate/drift math (one-sided contention
            # noise), but it reports best-case; the median records the
            # typical cost so the committed record stops systematically
            # flattering.
            medians[name] = round(statistics.median(samples), 4)
            if is_overhead_dominated(small.get(name), best):
                overhead_dominated.append(name)
            if t1 is not None and best > t1:
                # still slower than its own 10×-data time after the
                # re-run: record it loudly instead of silently shipping
                # a noise spike as the round's number
                sanity_violations[name] = {"sf0.1": round(best, 4), "sf1": t1}
                print(
                    f"[bench] {name}: SANITY sf0.1 {best:.2f}s > sf1 "
                    f"{t1:.2f}s after {len(samples)} samples",
                    file=sys.stderr, flush=True,
                )
            print(
                f"[bench] {name}: {timings[name]:.2f}s", file=sys.stderr, flush=True
            )
        except Exception as exc:  # noqa: BLE001 — survive any one query
            errors[name] = f"{type(exc).__name__}: {exc}"[:500]
            print(f"[bench] {name}: FAILED {errors[name]}", file=sys.stderr, flush=True)
        finally:
            _drop_leftover_persists()

    total = round(sum(timings.values()), 4)
    full = {
        "metric": "total_query_seconds",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "queries_median": medians,
        "calibration_sec": calibration,
        "sf": sf,
        "n_queries": len(timings),
        "n_failed": len(errors),
        "queries_file": write_path,
    }
    if errors:
        full["errors"] = errors
    if sanity_violations:
        full["sanity_violations"] = sanity_violations
    if overhead_dominated:
        # Fixed-cost-bound rows (sf0.001 >= OVERHEAD_RATIO × sf0.1):
        # their sf0.1 time measures session overhead, not data-scale
        # efficiency — per-query perf gates should exclude them.
        full["overhead_dominated"] = sorted(overhead_dominated)
        # VERDICT r9 #4: those rows are not gate-less — their gate
        # number is sourced from the committed sf1 record, where 100×
        # the data makes them signal-bound. gate_sf1 carries the sf1
        # seconds per excluded row; any row with no sf1 record yet is
        # listed in gate_unresolved (machine-checkable: every panel row
        # has a signal-bound timing in queries ∪ gate_sf1).
        gate_sf1 = {
            n: ref_sf1[n] for n in sorted(overhead_dominated) if n in ref_sf1
        }
        if gate_sf1:
            full["gate_sf1"] = gate_sf1
            full["gate_sf1_source"] = "BENCH_LOCAL_sf1.json"
        unresolved = sorted(set(overhead_dominated) - set(gate_sf1))
        if unresolved:
            full["gate_unresolved"] = unresolved
    # Full per-query record → repo file (committed BENCH_LOCAL* only
    # under --record; gitignored BENCH_DRIVER* otherwise); stdout gets
    # only the compact line (the driver's capture keeps ~2000 trailing
    # chars).
    with open(os.path.join(REPO, write_path), "w") as f:
        json.dump(full, f, indent=1)
    print(make_summary_line(full))


if __name__ == "__main__":
    main()
