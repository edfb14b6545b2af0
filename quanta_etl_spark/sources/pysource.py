"""Custom connector via the Python DataSource API (Spark 4).

The reference reads only CSV from object storage (dags/spark/etl.py:50,
96); real deployments also pull from APIs, queues, and generators with
no built-in source. Spark 4's Python DataSource API is the sanctioned
extension point: a pure-Python connector whose ``partitions()`` plan
parallelizes reads across executors exactly like a file source's
splits.

This module ships a deterministic synthetic-events connector — the
shape every custom connector follows (options → schema → partition plan
→ per-partition generator) with zero external dependencies, so it also
serves as the template for wiring a real API/queue source:

    spark.dataSource.register(SyntheticEventsDataSource)
    df = (spark.read.format("synthetic_events")
          .option("rows", 10000).option("partitions", 8)
          .option("seed", 42).load())

Scale notes: each partition generates its slice independently from
``(seed, partition_id)`` — no driver-side materialization, no
cross-partition coordination, and adding partitions scales the read
linearly like any splittable source. Filter pushdown is available via
``pushFilters`` for connectors whose backend can evaluate predicates;
a generator has nothing to push, so it declines (Spark then applies
the filters itself — correctness never depends on the pushdown).
"""

from __future__ import annotations

import datetime as dt
import random
from typing import Iterator, Sequence

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)

_EVENT_TYPES = ("view", "click", "purchase", "signup", "error")
_BASE_TS = dt.datetime(2024, 1, 1)

SCHEMA = (
    "event_id bigint, ts timestamp, user_id bigint, "
    "event_type string, value double"
)


class _Partition(InputPartition):
    def __init__(self, index: int, start: int, end: int, seed: int):
        self.index = index
        self.start = start
        self.end = end
        self.seed = seed


class SyntheticEventsReader(DataSourceReader):
    def __init__(self, options: dict):
        self.rows = int(options.get("rows", 1000))
        self.num_partitions = int(options.get("partitions", 4))
        self.seed = int(options.get("seed", 42))

    def partitions(self) -> Sequence[InputPartition]:
        per = -(-self.rows // self.num_partitions)  # ceil
        parts = []
        for i in range(self.num_partitions):
            start, end = i * per, min((i + 1) * per, self.rows)
            if start < end:
                parts.append(_Partition(i, start, end, self.seed))
        return parts

    def read(self, partition: _Partition) -> Iterator[tuple]:
        # deterministic per (seed, partition): re-running a failed task
        # regenerates identical rows — the retry-safety every source
        # must guarantee
        rng = random.Random(partition.seed * 1_000_003 + partition.index)
        for event_id in range(partition.start, partition.end):
            yield (
                event_id,
                _BASE_TS + dt.timedelta(seconds=event_id * 7),
                rng.randrange(1000),
                _EVENT_TYPES[rng.randrange(len(_EVENT_TYPES))],
                round(rng.random() * 100, 6),
            )


class SyntheticEventsStreamReader(SimpleDataSourceStreamReader):
    """Streaming twin of the batch reader: the offset is simply the
    next ``event_id`` to generate, so each micro-batch emits
    ``rows_per_batch`` new events and the checkpoint holds one integer.
    Offsets are the whole streaming contract — a restart resumes from
    the checkpointed offset and regenerates the identical rows
    (deterministic generation is what makes the source replayable,
    Spark's requirement for exactly-once sinks).

    The Simple reader variant generates on the driver; it is for
    demo/low-rate sources — a high-throughput connector implements the
    partition-planned ``DataSourceStreamReader`` with the same offset
    logic instead.
    """

    def __init__(self, options: dict):
        self.rows_per_batch = int(options.get("rows_per_batch", 100))
        self.seed = int(options.get("seed", 42))

    def initialOffset(self) -> dict:
        return {"next": 0}

    def read(self, start: dict):
        begin = int(start["next"])
        end = begin + self.rows_per_batch
        # a LIST, not a generator: Spark pickles the returned records
        # into its prefetch cache before the batch is planned
        return list(self.readBetweenOffsets(start, {"next": end})), {
            "next": end
        }

    def readBetweenOffsets(self, start: dict, end: dict):
        # replay for recovery: regenerate [start, end) deterministically
        begin, stop = int(start["next"]), int(end["next"])
        rng = random.Random(self.seed * 1_000_003 + begin)
        for event_id in range(begin, stop):
            yield (
                event_id,
                _BASE_TS + dt.timedelta(seconds=event_id * 7),
                rng.randrange(1000),
                _EVENT_TYPES[rng.randrange(len(_EVENT_TYPES))],
                round(rng.random() * 100, 6),
            )

    def commit(self, end: dict) -> None:
        pass  # nothing to clean up: generation is stateless


class SyntheticEventsDataSource(DataSource):
    """``format("synthetic_events")`` — see module docstring."""

    @classmethod
    def name(cls) -> str:
        return "synthetic_events"

    def schema(self) -> str:
        return SCHEMA

    def reader(self, schema) -> SyntheticEventsReader:
        return SyntheticEventsReader(self.options)

    def simpleStreamReader(self, schema) -> SyntheticEventsStreamReader:
        return SyntheticEventsStreamReader(self.options)
