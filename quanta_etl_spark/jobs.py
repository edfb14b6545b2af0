"""Job registry + plain-Python driver — the engine's replacement for
the reference's Airflow/EMR orchestration layer (SURVEY.md §3: the DAG
at /root/reference/dags/dag.py:28-179 exists only to ship files, boot a
cluster, and spark-submit one script; none of that is query semantics).

A job is ``(spark, **params) -> None``; the registry maps names to
jobs; the CLI runs one by name:

    python -m quanta_etl_spark.jobs xetra \
        --input /data/xetra/*.csv --output /out/xetra
    python -m quanta_etl_spark.jobs full_etl \
        --input <xetra_glob> --eurex-input <eurex_glob> \
        --dim-input <dim_csv> --output /out

Dependency wiring (the reference's ``start >> upload >> emr >> step``)
collapses to sequential Python calls inside a job; retries/schedules
belong to whatever invokes the CLI (cron, Airflow, anything) — the
correctness path has no orchestrator dependency.
"""

from __future__ import annotations

import argparse
from typing import Callable, Dict

from pyspark.sql import SparkSession

JobFn = Callable[..., None]

_REGISTRY: Dict[str, JobFn] = {}


def register(name: str) -> Callable[[JobFn], JobFn]:
    """Decorator: add a job to the registry under ``name``."""

    def deco(fn: JobFn) -> JobFn:
        if name in _REGISTRY:
            raise ValueError(f"job already registered: {name!r}")
        _REGISTRY[name] = fn
        return fn

    return deco


def get_job(name: str) -> JobFn:
    try:
        return _REGISTRY[name]
    except KeyError:
        raise KeyError(
            f"unknown job {name!r}; available: {sorted(_REGISTRY)}"
        ) from None


def available_jobs() -> list[str]:
    return sorted(_REGISTRY)


# ---------------------------------------------------------------------------
# Built-in jobs: the two reference pipelines + the combined run
# (mirrors etl.py main(), dags/spark/etl.py:178-186)
# ---------------------------------------------------------------------------


@register("xetra")
def xetra_job(spark: SparkSession, input: str, output: str, **_) -> None:
    from quanta_etl_spark.pipelines.xetra import process_xetra

    process_xetra(spark, input, output)


@register("eurex")
def eurex_job(
    spark: SparkSession, input: str, dim_input: str, output: str, **_
) -> None:
    from quanta_etl_spark.pipelines.eurex import process_eurex

    process_eurex(spark, input, dim_input, output)


@register("full_etl")
def full_etl_job(
    spark: SparkSession,
    input: str,
    eurex_input: str,
    dim_input: str,
    output: str,
    **_,
) -> None:
    """Both pipelines, sequentially — the reference's whole main()."""
    xetra_job(spark, input=input, output=f"{output.rstrip('/')}/xetra")
    eurex_job(
        spark,
        input=eurex_input,
        dim_input=dim_input,
        output=f"{output.rstrip('/')}/eurex",
    )


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(description="Run a registered engine job.")
    p.add_argument("job", help=f"one of: {', '.join(available_jobs())}")
    p.add_argument("--input", required=True)
    p.add_argument("--eurex-input", dest="eurex_input")
    p.add_argument("--dim-input", dest="dim_input")
    p.add_argument("--output", required=True)
    p.add_argument("--master", default=None)
    args = p.parse_args(argv)

    from quanta_etl_spark.session import get_spark

    spark = get_spark(app_name=f"quanta-job-{args.job}", master=args.master)
    try:
        get_job(args.job)(
            spark,
            input=args.input,
            eurex_input=args.eurex_input,
            dim_input=args.dim_input,
            output=args.output,
        )
    finally:
        spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
