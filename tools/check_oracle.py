"""Local replica of the driver's t2 correctness gate.

Runs every ``__spark_entry__.queries()`` entry on Spark and its
``oracle_sql()`` counterpart on DuckDB over the same parquet tables,
then compares row count, column names, and an order-insensitive
value hash (canonical column order, rows sorted, doubles rounded to 6
decimals — FIXTURES.md §5 protocol).

Beyond the hash check, this replica enforces two gate-divergence
lessons from round 2 (ADVICE r2):

- **Gate-safe output types only.** The driver's canonicalizer pandas-
  sorts every output column: array/map/struct columns crash it
  (``TypeError: unhashable type: 'list'``) and Decimal columns
  stringify engine-dependently (Spark ``Decimal('1.0000')`` vs DuckDB
  ``Decimal('1.0')``) and hash-mismatch even when values are equal.
  Any gated query emitting decimal/array/map/struct/binary columns is
  therefore FAILED here, even if the local hash would match.
- **0-row-both-sides is a coverage failure**, not a pass — a query
  that selects nothing verifies nothing (the r2 ``agg_percentiles``
  cutoff bug).

Usage:  python tools/check_oracle.py [--json OUT.json]
            [--oracle-timeout SECS] [sf_dir] [query ...]

``--json`` writes the per-query verdicts to a committable artifact
(VERDICT r7 #3: ``SWEEP_rN.json``) so stale driver-gate rows can be
audited without re-executing the sweep.

``--sample-prefix HEX`` (r13, VERDICT r12 #6) runs the SAMPLED
differential check for large-output queries: both engines' outputs
are filtered to the deterministic hash bucket
``md5(concat_ws('|', key_cols...)) LIKE '<hex>%'`` — a
1/16^len(prefix) row sample — before the normal canonical compare.
This is how 6e8-row outputs carry an sf100 hash signal without
materializing either side. Key columns come from
``__spark_entry__.sample_keys()`` (bigint/int/string only — types
whose CAST-to-string renders identically in both engines). Queries
with no sample_keys entry are SKIPPED under this flag (a typo must
never trigger an accidental full 6B-row collect).

``--oracle-timeout`` bounds each DUCKDB oracle's wall time (r10,
for above-gate-scale sweeps): several oracles are deliberately
brute-force — all-pairs Ω(n²) shingle intersections
(``dedup_minhash``/``dedup_clusters``/``dedup_apply``) — which is
the point of an oracle at the 500-doc gate scale but infeasible at a
50k-doc sf1 replica (1.25B list intersections).  On timeout the
query records ``status: "oracle_timeout"`` (with the Spark side's
row count, which DID complete — the operator scales; the spec
doesn't) instead of hanging the sweep.  Timeouts are not failures:
the summary counts them separately so a scale sweep stays honest
about which rows carry a hash signal.
"""

from __future__ import annotations

import datetime as _dt
import hashlib
import math
import os
import re
import sys
import threading

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _canon_value(v: object) -> str:
    if v is None:
        return "∅"
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        r = round(v, 6)
        return "0" if r == 0 else f"{r:.6f}"
    if isinstance(v, bool):
        return str(int(v))
    if isinstance(v, (_dt.datetime, _dt.date)):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_canon_value(x) for x in v) + "]"
    if isinstance(v, bytes):
        return v.hex()
    return str(v)


def canonicalize(rows: list[dict], cols: list[str]) -> tuple[str, int]:
    order = sorted(cols)
    mat = sorted(
        "|".join(_canon_value(r[c]) for c in order) for r in rows
    )
    h = hashlib.md5("\n".join(mat).encode()).hexdigest()
    return h, len(mat)


_GATE_UNSAFE = ("decimal", "array", "map", "struct", "binary")


def gate_unsafe_columns(df) -> list[str]:
    """Output columns whose type the driver's canonicalizer mishandles."""
    return [
        f"{f.name}:{f.dataType.simpleString()}"
        for f in df.schema.fields
        if any(t in f.dataType.simpleString() for t in _GATE_UNSAFE)
    ]


def spark_result(df) -> tuple[list[dict], list[str]]:
    cols = df.columns
    rows = [r.asDict(recursive=True) for r in df.collect()]
    return rows, cols


# DuckDB output types the driver's pandas canonicalizer mishandles:
# HUGEINT/UHUGEINT map to float64 (so integer 3 renders "3.000000" vs
# Spark long "3" — the r6 profile_columns/referential_check failures)
# and DECIMAL stringifies engine-dependently.  A bare integer
# ``sum(CASE WHEN … THEN 1 ELSE 0 END)`` is the classic emitter —
# oracles must CAST such columns to BIGINT.
_DUCK_GATE_UNSAFE = ("HUGEINT", "UHUGEINT", "DECIMAL")


def duck_gate_unsafe_columns(rel) -> list[str]:
    """Oracle output columns whose DuckDB type is pandas-hazardous."""
    return [
        f"{c}:{t}"
        for c, t in zip(rel.columns, rel.types)
        if any(u in str(t).upper() for u in _DUCK_GATE_UNSAFE)
    ]


def duckdb_result(
    con, sql: str, timeout: float | None = None
) -> tuple[list[dict], list[str], list[str]]:
    """Run one oracle; if ``timeout`` is set, ``con.interrupt()`` fires
    from a daemon timer and the in-flight query raises
    ``duckdb.InterruptException`` (the connection stays usable —
    verified on duckdb 1.0.0).  The timer spans relation construction
    AND fetch: ``con.sql`` is lazy, execution happens in fetchall.

    The callback is gated on a ``done`` event (ADVICE r10): without
    it, a timer firing in the window between fetchall() returning and
    timer.cancel() would interrupt() an IDLE connection, and the stale
    interrupt could spuriously abort the NEXT oracle in the sweep —
    misrecording a healthy query as oracle_timeout. The gate alone
    still leaves a hair's-width race (fire between the is_set check
    and the interrupt call), so the cleanup also JOINS the timer
    thread — after which any callback has fully run — and, if it
    fired, drains the possibly-pending interrupt with a trivial query
    before the connection is reused."""
    timer: threading.Timer | None = None
    done = threading.Event()
    fired = threading.Event()

    def _interrupt() -> None:
        if not done.is_set():
            fired.set()
            con.interrupt()

    if timeout is not None:
        timer = threading.Timer(timeout, _interrupt)
        timer.daemon = True
        timer.start()
    try:
        rel = con.sql(sql)
        cols = rel.columns
        unsafe = duck_gate_unsafe_columns(rel)
        rows = [dict(zip(cols, t)) for t in rel.fetchall()]
    finally:
        done.set()
        if timer is not None:
            timer.cancel()
            timer.join()
            if fired.is_set():
                try:
                    con.sql("SELECT 1").fetchall()
                except Exception:
                    pass
    return rows, cols, unsafe


def main() -> int:
    args = sys.argv[1:]
    json_out: str | None = None
    if "--json" in args:
        i = args.index("--json")
        if i + 1 >= len(args):
            print(
                "usage: check_oracle.py [--json OUT.json] [SF_DIR] "
                "[QUERY ...]  (--json requires a file path)",
                file=sys.stderr,
            )
            return 2
        json_out = args[i + 1]
        args = args[:i] + args[i + 2:]
    oracle_timeout: float | None = None
    if "--oracle-timeout" in args:
        i = args.index("--oracle-timeout")
        if i + 1 >= len(args):
            print(
                "usage: check_oracle.py [--oracle-timeout SECS] ... "
                "(--oracle-timeout requires seconds)",
                file=sys.stderr,
            )
            return 2
        try:
            oracle_timeout = float(args[i + 1])
        except ValueError:
            print(
                f"--oracle-timeout: not a number: {args[i + 1]!r}",
                file=sys.stderr,
            )
            return 2
        if oracle_timeout <= 0:
            print("--oracle-timeout: must be > 0", file=sys.stderr)
            return 2
        args = args[:i] + args[i + 2:]
    sample_prefix: str | None = None
    if "--sample-prefix" in args:
        i = args.index("--sample-prefix")
        if i + 1 >= len(args):
            print(
                "usage: check_oracle.py [--sample-prefix HEX] ... "
                "(--sample-prefix requires lowercase hex chars, e.g. '00')",
                file=sys.stderr,
            )
            return 2
        sample_prefix = args[i + 1]
        if not re.fullmatch(r"[0-9a-f]{1,8}", sample_prefix):
            print(
                f"--sample-prefix: must be 1-8 lowercase hex chars, got "
                f"{sample_prefix!r}",
                file=sys.stderr,
            )
            return 2
        args = args[:i] + args[i + 2:]
    master_override: str | None = None
    if "--master" in args:
        i = args.index("--master")
        if i + 1 >= len(args):
            print(
                "usage: check_oracle.py [--master MASTER] ... "
                "(--master requires a master URL, e.g. "
                "'local-cluster[2,16,16384]')",
                file=sys.stderr,
            )
            return 2
        master_override = args[i + 1]
        args = args[:i] + args[i + 2:]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    only = set(args[1:])

    import __spark_entry__ as entry_mod
    from quanta_etl_spark.session import get_spark

    # Pass an explicit local master (like bench.py): with master=None
    # get_spark skips its local-mode driver-heap sizing, so the sweep
    # would run 32 worker threads on Spark's 1g default heap — which
    # OOM-kills the JVM on the first sf10-scale aggregation.
    # Default to the host's core count (ADVICE r11): a hardcoded 32
    # oversubscribes small hosts when SPARK_GRAFT_CPUS is unset.
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    # The differential check collects BOTH engines' full results by
    # design; at sf10 a 60M-row projection exceeds the 1g
    # maxResultSize default. 0 = bounded only by the driver heap,
    # which SPARK_GRAFT_DRIVER_MEM sizes for the sweep scale.
    extra_conf = {"spark.driver.maxResultSize": "0"}
    master = master_override or f"local[{cpus}]"
    if master.startswith("local-cluster"):
        # VERDICT r11 #2: multi-process execution. local-cluster spawns
        # real separate executor JVMs (the bracket is
        # [workers,coresPerWorker,memPerWorkerMB]) — the first
        # environment where driver↔executor serialization, broadcast
        # shipping, and Arrow-worker spawning cross a process boundary
        # instead of sharing the driver's heap. Executors are fresh
        # JVMs with fresh python workers: they need the repo on their
        # PYTHONPATH to import quanta_etl_spark inside UDF closures,
        # and an executor memory below the worker cap.
        repo_root = os.path.dirname(
            os.path.dirname(os.path.abspath(__file__))
        )
        extra_conf["spark.executorEnv.PYTHONPATH"] = repo_root
        # Default executor memory to fit the worker cap in the master
        # string (local-cluster[workers,cores,memPerWorkerMB]): Spark
        # refuses to start when executor.memory exceeds the worker
        # cap, so a flat 12g default broke any sweep with smaller
        # workers. SPARK_GRAFT_EXEC_MEM still overrides explicitly.
        exec_mem = os.environ.get("SPARK_GRAFT_EXEC_MEM")
        if not exec_mem:
            m = re.search(r"\[\s*\d+\s*,\s*\d+\s*,\s*(\d+)\s*\]", master)
            worker_mb = int(m.group(1)) if m else 12288
            exec_mem = f"{min(12288, max(worker_mb - 512, 512))}m"
        extra_conf.setdefault("spark.executor.memory", exec_mem)
    spark = get_spark(
        app_name="oracle-check",
        master=master,
        shuffle_partitions=cpus,
        extra_conf=extra_conf,
    )
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    # Bound DuckDB's memory and give it a spill directory (r13): its
    # default memory_limit is 80% of PHYSICAL RAM, which ignores the
    # co-resident Spark JVM — the sf30 pagerank oracle (5 unrolled
    # 180M-edge join rounds) grew a 89 GB RSS next to a 48 g heap and
    # the kernel OOM-killed the whole differential run. With a limit
    # set, DuckDB spills the join intermediates instead. Override with
    # SPARK_GRAFT_DUCK_MEM; sized so jvm + duck fit in RAM by default.
    duck_mem = os.environ.get("SPARK_GRAFT_DUCK_MEM", "40GB")
    con.execute(f"SET memory_limit='{duck_mem}'")
    con.execute("SET temp_directory='/tmp/duckdb_spill'")
    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings"
    ).split():
        # r14: replica fact tables may be a DIRECTORY of parquet files
        # (tools/make_sfN.py multi-file layout — real corpora are many
        # files and single-file monoliths blinded scan parallelism);
        # glob those, keep the flat-file form for driver testdata.
        p = f"{sf_dir}/{t}.parquet"
        src = f"{p}/*.parquet" if os.path.isdir(p) else p
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{src}')"
        )

    queries = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    skeys: dict[str, list[str]] = (
        getattr(entry_mod, "sample_keys", dict)() if sample_prefix else {}
    )
    failures: list[str] = []
    record: dict[str, dict] = {}

    def _sample_spark(df, keys: list[str]):
        from pyspark.sql import functions as F

        sig = F.md5(
            F.concat_ws(
                "|", *[F.col(k).cast("string") for k in keys]
            ).cast("binary")
        )
        return df.where(sig.startswith(sample_prefix))

    def _sample_oracle(sql: str, keys: list[str]) -> str:
        ks = ", ".join(f'CAST("{k}" AS VARCHAR)' for k in keys)
        return (
            f"SELECT * FROM (\n{sql}\n) __sampled "
            f"WHERE md5(concat_ws('|', {ks})) LIKE '{sample_prefix}%'"
        )

    def fail(name: str, err: str) -> None:
        failures.append(name)
        record[name] = {"status": "fail", "err": err}
        print(f"FAIL  {name}: {err}")

    for name, fn in queries.items():
        if only and name not in only:
            continue
        if sample_prefix and name not in skeys:
            # never fall back to a full collect under the sampling
            # flag — at sf100 that is a 6e8-row driver OOM, and a
            # silent fallback would also misrepresent the artifact
            print(f"skip  {name}: no sample_keys entry")
            continue
        try:
            df = fn(spark, sf_dir)
            unsafe = gate_unsafe_columns(df)
            if unsafe:
                fail(name, f"gate-unsafe output types {unsafe}")
                continue
            if sample_prefix:
                missing = [k for k in skeys[name] if k not in df.columns]
                if missing:
                    fail(name, f"sample_keys not in output: {missing}")
                    continue
                df = _sample_spark(df, skeys[name])
            s_rows, s_cols = spark_result(df)
        except Exception as e:
            fail(name, f"spark error: {e}")
            continue
        if name not in oracles:
            record[name] = {"status": "weak", "rows": len(s_rows)}
            print(f"weak  {name}: rows={len(s_rows)} (no oracle; rows-only check)")
            continue
        oracle_text = oracles[name]
        if sample_prefix:
            oracle_text = _sample_oracle(oracle_text, skeys[name])
        try:
            d_rows, d_cols, d_unsafe = duckdb_result(
                con, oracle_text, timeout=oracle_timeout
            )
        except duckdb.InterruptException:
            # the ORACLE is over budget at this scale, not the engine:
            # the Spark side already completed above.  Recorded as its
            # own status (counted separately from fail) so scale sweeps
            # terminate while staying honest about signal coverage.
            record[name] = {
                "status": "oracle_timeout",
                "rows": len(s_rows),
                "timeout_s": oracle_timeout,
            }
            print(
                f"tmo   {name}: oracle exceeded {oracle_timeout:g}s at this "
                f"scale (spark side ok, {len(s_rows)} rows)"
            )
            continue
        except Exception as e:
            fail(name, f"duckdb error: {e}")
            continue
        if d_unsafe:
            fail(
                name,
                f"gate-unsafe DuckDB oracle types {d_unsafe}"
                " (HUGEINT/DECIMAL → float64/str under the driver's pandas"
                " fetch; CAST the column in the oracle SQL)",
            )
            continue
        if sorted(s_cols) != sorted(d_cols):
            fail(name, f"columns {sorted(s_cols)} != {sorted(d_cols)}")
            continue
        sh, sn = canonicalize(s_rows, s_cols)
        dh, dn = canonicalize(d_rows, d_cols)
        if sn == 0 and dn == 0:
            fail(name, "0 rows on both sides — vacuous, verifies nothing")
            continue
        if sn != dn:
            fail(name, f"rowcount spark={sn} duckdb={dn}")
        elif sh != dh:
            fail(name, f"hash mismatch ({sn} rows)")
            for i, (a, b) in enumerate(
                zip(
                    sorted("|".join(_canon_value(r[c]) for c in sorted(s_cols)) for r in s_rows),
                    sorted("|".join(_canon_value(r[c]) for c in sorted(d_cols)) for r in d_rows),
                )
            ):
                if a != b:
                    print(f"      first diff row {i}:\n      spark : {a}\n      duckdb: {b}")
                    break
        else:
            record[name] = {"status": "ok", "rows": sn, "hash": sh[:12]}
            if sample_prefix:
                record[name]["sampled"] = sample_prefix
            print(
                f"ok    {name}: {sn} rows, hash {sh[:12]}"
                + (f" (sampled '{sample_prefix}')" if sample_prefix else "")
            )
    # The record must survive a dead JVM: above-gate-scale sweeps can
    # OOM-kill the Spark JVM on a late query, and stop() then raises
    # ConnectionRefused AFTER every verdict above was already computed
    # (the r11 batch-1 sweep lost 15 verdicts to exactly this). Write
    # the artifact first; treat stop() as best-effort cleanup.
    if json_out:
        import json as _json

        summary = {
            "sf_dir": sf_dir,
            **({"sample_prefix": sample_prefix} if sample_prefix else {}),
            "n_queries": len(record),
            "n_ok": sum(1 for v in record.values() if v["status"] == "ok"),
            "n_weak": sum(1 for v in record.values() if v["status"] == "weak"),
            "n_fail": len(failures),
            "results": record,
        }
        n_tmo = sum(
            1 for v in record.values() if v["status"] == "oracle_timeout"
        )
        if n_tmo:
            summary["n_oracle_timeout"] = n_tmo
            summary["oracle_timeout_s"] = oracle_timeout
        with open(json_out, "w") as f:
            _json.dump(summary, f, indent=1)
        print(f"wrote {json_out}")
    try:
        spark.stop()
    except Exception as e:  # noqa: BLE001 — JVM may already be gone
        print(f"spark.stop() failed (JVM gone?): {e}", file=sys.stderr)
    print(f"\n{len(failures)} failure(s)" + (f": {failures}" if failures else ""))
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
