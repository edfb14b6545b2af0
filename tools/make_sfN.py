"""Generate a scaled-up copy of a driver testdata directory for LOCAL
scaling-curve evidence (VERDICT r5 #4: all timing evidence was sf0.1;
one sf1-scale bench row pins the curve the 100-TB claims rest on).

Usage:
    python tools/make_sfN.py /root/testdata/sf0.1 /root/repo/.benchdata/sf1 10

Replicates every fact table N× with FOREIGN-KEY-CONSISTENT key offsets
(copy i shifts orderkey/custkey/suppkey/partkey/event_id/user_id/doc_id/
vec_id by i * STRIDE in every table that carries them), so every join
in the query panel keeps its semantics and selectivity. The small dims
(region, nation) are NOT replicated — nationkey/regionkey references
stay valid, mirroring how a real 10× corpus shares its dimensions.
Text/embedding payloads are reused across copies, which makes the dedup
family's workload strictly harder (10× duplicate clusters) — the right
direction for a scale stress.

This script writes ONLY inside the destination directory (never under
/root/testdata) and is driver-independent: bench.py picks the output up
via SPARK_GRAFT_SF_DIR.
"""

from __future__ import annotations

import sys
from pathlib import Path

import duckdb

STRIDE = 100_000_000

# Replicated tables whose output exceeds this are written as a
# DIRECTORY of ~this-many-byte parquet files instead of one monolith
# (r14, guide §6 file layout; VERDICT r13 #5): a single file at or
# under spark.sql.files.maxPartitionBytes (128 MB default) is ONE
# scan task no matter how many row groups it holds, which blinded the
# 8-vs-32-core scaling signal for every aggregate-scan query — a real
# 10× corpus is many files, and the replica should look like one.
# 64 MB files leave each file its own split at default settings.
# Spark reads the directory transparently; the oracle harness globs
# it (tools/check_oracle.py resolves dir vs file per table).
FILE_BYTES = 64 * 1024 * 1024

# table -> columns to offset per copy
OFFSET_KEYS: dict[str, list[str]] = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
COPY_AS_IS = ["region", "nation"]


def count_rows(con: "duckdb.DuckDBPyConnection", out: Path) -> int:
    """Row count of a table artifact — single parquet file or the
    multi-file directory layout."""
    pat = f"{out}/*.parquet" if out.is_dir() else str(out)
    return con.execute(
        f"SELECT count(*) FROM read_parquet('{pat}')"
    ).fetchone()[0]


def scale_table(
    con: "duckdb.DuckDBPyConnection",
    src: Path,
    dst: Path,
    table: str,
    factor: int,
) -> int:
    f = src / f"{table}.parquet"
    out = dst / f"{table}.parquet"
    if table in COPY_AS_IS or table not in OFFSET_KEYS:
        con.execute(
            f"COPY (SELECT * FROM '{f}') TO '{out}' (FORMAT PARQUET)"
        )
    else:
        keys = set(OFFSET_KEYS[table])
        # Replication is only key-collision-free when every source key
        # block fits inside one stride: copy i of key k lands at
        # k + i·STRIDE, so a source key ≥ STRIDE (i.e. a source that
        # was ITSELF produced by this tool) collides with a later
        # copy's block — duplicate doc_ids/orderkeys that silently
        # merge in per-key groupBys and corrupt every per-key contract
        # (found the hard way in r11: sf10 built from sf1 instead of
        # sf0.1 ×100 broke corpus_quality_filter in BOTH engines).
        # Always scale from the ORIGINAL driver testdata.
        for k in sorted(keys):
            hi, n_over = con.execute(
                f'SELECT max("{k}"), count(*) FILTER ("{k}" >= {STRIDE}) '
                f"FROM '{f}'"
            ).fetchone()
            if n_over:
                raise SystemExit(
                    f"{table}.{k}: {n_over} source keys >= STRIDE "
                    f"{STRIDE} (max {hi}) — replicating an "
                    "already-replicated directory collides key blocks; "
                    "scale from the original testdata with a larger "
                    "factor instead"
                )
        cols = [
            r[0]
            for r in con.execute(
                f"DESCRIBE SELECT * FROM '{f}'"
            ).fetchall()
        ]
        # One CROSS JOIN against range(factor) instead of a factor-way
        # UNION ALL: the union form hits DuckDB's max_expression_depth
        # at factor=1000 (found building the sf100 replica) and plans
        # O(factor) subtrees; this is O(1) depth at any factor. Row
        # order within the parquet differs from the union form —
        # irrelevant: every consumer is order-free and the differential
        # gate canonicalizes before hashing.
        # Cast each offset expression back to the SOURCE column's type:
        # range() yields BIGINT, so the bare `key + i*STRIDE` would
        # promote INT32 key columns to INT64 and silently change the
        # output parquet schema relative to the driver's original
        # artifacts (ADVICE r12). Safe: factor*STRIDE stays far below
        # INT32 range only for tiny factors, so validate the widened
        # value actually fits before narrowing.
        types = {
            r[0]: r[1]
            for r in con.execute(f"DESCRIBE SELECT * FROM '{f}'").fetchall()
        }
        int_max = {"TINYINT": 2**7, "SMALLINT": 2**15, "INTEGER": 2**31}
        for k in sorted(keys):
            t = types[k]
            if t in int_max and factor * STRIDE >= int_max[t]:
                raise SystemExit(
                    f"{table}.{k} is {t}: copy offsets up to "
                    f"{factor * STRIDE} overflow it — widen the source "
                    "column or lower the factor"
                )
        proj = ", ".join(
            f'CAST("{c}" + __copy.i * {STRIDE} AS {types[c]}) AS "{c}"'
            if c in keys
            else f'"{c}"'
            for c in cols
        )
        select = (
            f"SELECT {proj} FROM '{f}' CROSS JOIN "
            f"(SELECT unnest(range({factor})) AS i) AS __copy"
        )
        if f.stat().st_size * factor > FILE_BYTES:
            # multi-file directory layout — see FILE_BYTES
            con.execute(
                f"COPY ({select}) TO '{out}' "
                f"(FORMAT PARQUET, FILE_SIZE_BYTES {FILE_BYTES})"
            )
        else:
            con.execute(f"COPY ({select}) TO '{out}' (FORMAT PARQUET)")
    return count_rows(con, out)


def main() -> int:
    src = Path(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1")
    dst = Path(
        sys.argv[2] if len(sys.argv) > 2 else "/root/repo/.benchdata/sf1"
    )
    factor = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    dst.mkdir(parents=True, exist_ok=True)
    con = duckdb.connect()
    # Stream the COPY instead of buffering it: with the default
    # preserve_insertion_order=true DuckDB materializes the whole
    # replicated table in memory before writing (observed 70+ GB RSS
    # on the 600M-row sf100 lineitem). Row order in the output is
    # meaningless here — every consumer is order-free and the
    # differential gate canonicalizes before hashing.
    con.execute("SET preserve_insertion_order = false")
    import shutil

    def _remove(p: Path) -> None:
        shutil.rmtree(p) if p.is_dir() else p.unlink()

    for f in sorted(src.glob("*.parquet")):
        out = dst / f"{f.stem}.parquet"
        if out.exists() and out.stat().st_size > 0:
            # Resume support after a killed run. A partial parquet has
            # no footer, so the count fails loudly → rebuild. A COMPLETE
            # file only short-circuits when its row count matches what
            # THIS (source, factor) pair would produce — source rows ×
            # factor for replicated tables, source rows for dims —
            # otherwise a rerun into the same destination with a
            # different factor silently yields a mixed-scale directory
            # (ADVICE r12).
            try:
                n = count_rows(con, out)
                n_src = con.execute(
                    f"SELECT count(*) FROM '{f}'"
                ).fetchone()[0]
                mult = 1 if f.stem in COPY_AS_IS or f.stem not in OFFSET_KEYS else factor
                if n == n_src * mult:
                    print(f"{f.stem}: {n} rows (kept existing)")
                    continue
                print(
                    f"{f.stem}: existing file has {n} rows, expected "
                    f"{n_src * mult} for factor {factor} — rebuilding"
                )
                _remove(out)
            except duckdb.Error:
                _remove(out)
        n = scale_table(con, src, dst, f.stem, factor)
        print(f"{f.stem}: {n} rows")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
