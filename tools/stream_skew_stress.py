"""sf1-scale STREAMING hot-key (bot-traffic) skew stress (VERDICT r8 #6).

Batch dedup (tools/skew_stress.py, r6) and the iterative graph family
(tools/graph_skew_stress.py, r8) carry committed hot-key stress
records; this covers the STATEFUL STREAMING path, whose realistic
100-TB skew is one hot ``user_id`` — a bot or scraper emitting a large
fraction of all events — hammering one grouping key of every stateful
operator.

Takes the sf1 events table (1M rows / 30 days / 15k users), builds a
HOT variant in which one synthetic bot user owns ``HOT_PCT``% of all
events (default 20%, deterministic ``event_id % 100`` assignment), and
drives both variants through the three stateful streaming operators as
an 8-micro-batch time-ordered backfill (the repo's standard
``read_stream`` + ``maxFilesPerTrigger=1`` harness):

- ``windowed_distinct_users`` (exact): the bot's duplicate (window,
  user) rows are absorbed by ``dropDuplicatesWithinWatermark`` — state
  holds ONE entry per (window, user) pair regardless of how many
  events the bot sends, and the watermark evicts closed windows, so
  the hot variant's state is SMALLER (the bot collapses to one entry
  per window). Emitted counts must equal the batch
  ``count(DISTINCT)`` on the same input.
- ``windowed_distinct_users_approx`` (HLL++): state is one fixed-size
  sketch per open window — O(windows), independent of both user
  cardinality AND the hot key's event share.
- ``interval_join_streams``: bot clicks×purchases amplify the join
  OUTPUT quadratically per window (that is the join's semantics, not a
  defect — the same rows come out of the batch join); the stress
  verifies output == batch join under skew and that join STATE stays
  watermark-bounded (rows evicted as event time advances) instead of
  scaling with the bot's history.

Wall-times and end-of-run state rows print for the NOTES.md record,
base vs hot in the same session. The scale-independent behaviors
(exactness under a hot key, dedup-state ≤ distinct pairs, O(windows)
approx state, join-output parity, state eviction) are pinned by
tests/test_streaming.py::TestStreamHotKeySkew; this script is the
sf1-scale evidence run (reproducible: ``python tools/make_sfN.py &&
python tools/stream_skew_stress.py``).

Usage:
    python tools/stream_skew_stress.py [hot_pct] [sf_dir]
"""

from __future__ import annotations

import shutil
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

BOT_ID = 10_000_000_000
N_CHUNKS = 8


def _state_rows(query) -> list[tuple[str, int, int]]:
    """(operator, numRowsTotal, numRowsRemoved) from the final progress."""
    prog = query.lastProgress or {}
    return [
        (
            op.get("operatorName", "?"),
            int(op.get("numRowsTotal", -1)),
            int(op.get("numRowsRemoved", -1)),
        )
        for op in prog.get("stateOperators", [])
    ]


def _write_time_chunks(df, ts_col: str, root: str) -> str:
    """Split df into N_CHUNKS contiguous event-time slices and write
    them as c0..cN subdirs IN TIME ORDER (sequential writes → ascending
    mtimes → the file source replays them chronologically, so the
    watermark advances monotonically and nothing is late-dropped)."""
    from pyspark.sql import functions as F

    bounds = df.select(
        F.min(ts_col).alias("lo"), F.max(ts_col).alias("hi")
    ).collect()[0]
    lo, hi = bounds.lo, bounds.hi
    span = (hi - lo).total_seconds() + 1
    step = span / N_CHUNKS
    for i in range(N_CHUNKS):
        start = F.lit(lo) + F.expr(f"INTERVAL {int(i * step)} SECOND")
        # the last slice's upper bound overshoots by one second so the
        # max-ts row always lands in a chunk despite integer truncation
        end_s = int((i + 1) * step) + (1 if i == N_CHUNKS - 1 else 0)
        end = F.lit(lo) + F.expr(f"INTERVAL {end_s} SECOND")
        chunk = df.where((F.col(ts_col) >= start) & (F.col(ts_col) < end))
        chunk.coalesce(1).write.parquet(f"{root}/c{i}")
    return f"{root}/c*/part-*.parquet"


def _drive(spark, stream_df, name: str):
    """Run a streaming frame to a memory sink; return (table, seconds,
    state_rows)."""
    from quanta_etl_spark.streaming import ingest

    t0 = time.perf_counter()
    q = ingest.write_stream_memory(stream_df, name)
    q.awaitTermination(600)
    secs = time.perf_counter() - t0
    state = _state_rows(q)
    return spark.table(name), secs, state


def main() -> int:
    hot_pct = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/.benchdata/sf1"

    from pyspark.sql import functions as F

    from quanta_etl_spark.session import get_spark
    from quanta_etl_spark.streaming import ingest

    spark = get_spark(
        app_name="stream-skew-stress", master="local[32]",
        shuffle_partitions=32,
    )
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.session.timeZone", "UTC")

    events = ingest.normalize_event_time(
        spark.read.parquet(f"{sf_dir}/events.parquet")
    ).select("event_id", "ts", "user_id", "event_type")
    n_rows = events.count()
    print(f"[stress] sf1 events: {n_rows} rows, hot_pct={hot_pct}")

    hot = events.withColumn(
        "user_id",
        F.when(F.col("event_id") % 100 < hot_pct, F.lit(BOT_ID)).otherwise(
            F.col("user_id")
        ),
    )

    work = Path(tempfile.mkdtemp(prefix="stream_skew_"))
    results: dict[str, dict] = {}
    try:
        schema = events.schema
        globs = {}
        for tag, df in (("base", events), ("hot", hot)):
            globs[tag] = _write_time_chunks(df, "ts", str(work / tag))

        for tag in ("base", "hot"):
            src = ingest.read_stream(
                spark, globs[tag], schema, max_files_per_trigger=1
            )
            batch_input = spark.read.schema(schema).parquet(globs[tag])

            # --- exact windowed distinct users -----------------------
            out, secs, state = _drive(
                spark,
                ingest.windowed_distinct_users(src, window="1 hour"),
                f"wdu_{tag}",
            )
            emitted = out.select(
                F.col("win.start").alias("ws"), "distinct_users"
            )
            oracle = batch_input.groupBy(
                F.window("ts", "1 hour").alias("win")
            ).agg(F.count_distinct("user_id").alias("exp"))
            mism = (
                emitted.join(
                    oracle.select(F.col("win.start").alias("ws"), "exp"),
                    "ws",
                )
                .where(F.col("distinct_users") != F.col("exp"))
                .count()
            )
            n_win = emitted.count()
            assert mism == 0, f"exact distinct wrong under {tag}: {mism}"
            results[f"wdu_{tag}"] = {
                "secs": secs, "windows_emitted": n_win, "state": state,
            }
            print(
                f"[stress] windowed_distinct_users/{tag}: {secs:.1f}s, "
                f"{n_win} windows emitted, state={state}"
            )

            # --- HLL approx variant ----------------------------------
            out, secs, state = _drive(
                spark,
                ingest.windowed_distinct_users_approx(src, window="1 hour"),
                f"wda_{tag}",
            )
            n_win = out.count()
            results[f"wda_{tag}"] = {
                "secs": secs, "windows_emitted": n_win, "state": state,
            }
            print(
                f"[stress] windowed_distinct_users_approx/{tag}: "
                f"{secs:.1f}s, {n_win} windows emitted, state={state}"
            )

            # --- stream-stream interval join -------------------------
            # two independent source instances (the repo's established
            # stream-self-join pattern, __spark_entry__ stream_stream_join)
            src_l = ingest.read_stream(
                spark, globs[tag], schema, max_files_per_trigger=1
            )
            src_r = ingest.read_stream(
                spark, globs[tag], schema, max_files_per_trigger=1
            )
            clicks = src_l.where(F.col("event_type") == "click").select(
                "user_id", "event_id", "ts"
            )
            purchases = src_r.where(F.col("event_type") == "purchase").select(
                F.col("user_id").alias("r_user_id"),
                F.col("event_id").alias("r_event_id"),
                F.col("ts").alias("r_ts"),
            )
            joined = ingest.interval_join_streams(
                clicks, purchases, "user_id", "ts", "r_ts",
                lower="0 seconds", upper="30 minutes",
            )
            out, secs, state = _drive(spark, joined, f"ssj_{tag}")
            got = out.count()
            bc = batch_input.where(F.col("event_type") == "click").select(
                "user_id", "event_id", "ts"
            )
            bp = batch_input.where(
                F.col("event_type") == "purchase"
            ).select(
                F.col("user_id").alias("r_user_id"),
                F.col("event_id").alias("r_event_id"),
                F.col("ts").alias("r_ts"),
            )
            exp = bc.join(
                bp,
                (F.col("user_id") == F.col("r_user_id"))
                & (F.col("r_ts") >= F.col("ts"))
                & (F.col("r_ts") <= F.col("ts") + F.expr("INTERVAL 30 MINUTE")),
            ).count()
            assert got == exp, f"join output {got} != batch {exp} ({tag})"
            results[f"ssj_{tag}"] = {
                "secs": secs, "out_rows": got, "state": state,
            }
            print(
                f"[stress] interval_join_streams/{tag}: {secs:.1f}s, "
                f"{got} matches (= batch), state={state}"
            )

        # Amplification + state summary for the NOTES record
        amp = results["ssj_hot"]["out_rows"] / max(
            1, results["ssj_base"]["out_rows"]
        )
        print(
            f"[stress] summary: join output amplification hot/base = "
            f"{amp:.2f}×; per-op time ratios: "
            f"wdu {results['wdu_hot']['secs'] / results['wdu_base']['secs']:.2f}×, "
            f"wda {results['wda_hot']['secs'] / results['wda_base']['secs']:.2f}×, "
            f"ssj {results['ssj_hot']['secs'] / results['ssj_base']['secs']:.2f}×"
        )
        return 0
    finally:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    raise SystemExit(main())
