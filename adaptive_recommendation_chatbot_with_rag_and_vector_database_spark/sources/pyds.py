"""Python DataSource (Spark 4 custom-source API, SURVEY §2.1 S9).

The reference ingests via LangChain document loaders (PyPDFLoader,
/root/reference/AI.py:61-71) — i.e. "a Python function produces rows".
Spark 4's ``pyspark.sql.datasource`` makes that a first-class PARALLEL
source: the planner asks the source for input partitions, each executor
runs ``read(partition)`` for its split, and the rows enter the plan as
an ordinary scan (filter/projection on top, AQE downstream — everything
Catalyst does for built-in sources except native pushdown).

``SynthGenDataSource`` is a deterministic generator (LCG-hashed ids)
so the scan is oracle-checkable: DuckDB recomputes the identical rows
from ``range()``. The shape — split the keyspace into ranges, generate
per-split with no driver participation, no shared state — is exactly
how a custom API/queue/tenant-shard reader should be structured at
100 TB: one partition per shard, work happens executor-side.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)

# LCG constants (glibc's) — integer math identical in DuckDB.
_LCG_A = 1103515245
_LCG_C = 12345
_LCG_M = 2147483648  # 2^31
_TAG_MOD = 97


class _RangePartition(InputPartition):
    def __init__(self, start: int, end: int):
        self.start = start
        self.end = end


class SynthGenReader(DataSourceReader):
    def __init__(self, options: dict):
        self.rows = int(options.get("rows", 1000))
        self.parts = int(options.get("parts", 8))

    def partitions(self) -> list[InputPartition]:
        step = max(1, (self.rows + self.parts - 1) // self.parts)
        return [
            _RangePartition(lo, min(lo + step, self.rows))
            for lo in range(0, self.rows, step)
        ]

    def read(self, partition: _RangePartition) -> Iterator[tuple]:
        return _gen_rows(partition.start, partition.end)


def _gen_rows(start: int, end: int) -> Iterator[tuple]:
    for i in range(start, end):
        yield (i, (i * _LCG_A + _LCG_C) % _LCG_M, f"u{i % _TAG_MOD}")


class SynthGenStreamReader(SimpleDataSourceStreamReader):
    """Micro-batch form of the same generator: the offset is the next
    unread id, each batch emits ``batch`` ids until ``rows`` is
    exhausted, and ``readBetweenOffsets`` replays any [start, end)
    range deterministically — which is precisely the replayability
    contract exactly-once recovery needs from a custom source."""

    def __init__(self, options: dict):
        self.rows = int(options.get("rows", 1000))
        self.batch = int(options.get("batch", 250))

    def initialOffset(self) -> dict:
        return {"pos": 0}

    def read(self, start: dict):
        pos = int(start["pos"])
        end = min(pos + self.batch, self.rows)
        # list-backed iterator REQUIRED: the prefetch cache copy.copy's
        # it, and generator objects are not copyable
        return iter(list(_gen_rows(pos, end))), {"pos": end}

    def readBetweenOffsets(self, start: dict, end: dict):
        return iter(list(_gen_rows(int(start["pos"]), int(end["pos"]))))


class SynthGenDataSource(DataSource):
    """``spark.read.format("synthgen").option("rows", N).option("parts", P)``
    → columns ``(id long, h long, tag string)``. Also streamable:
    ``spark.readStream.format("synthgen")`` yields the SAME rows in
    micro-batches (batch/stream equality is asserted in tests) — the
    unified-API guarantee for a custom Python source."""

    @classmethod
    def name(cls) -> str:
        return "synthgen"

    def schema(self) -> str:
        return "id long, h long, tag string"

    def reader(self, schema) -> SynthGenReader:
        return SynthGenReader(self.options)

    def simpleStreamReader(self, schema) -> SynthGenStreamReader:
        return SynthGenStreamReader(self.options)


def register(spark) -> None:
    """Idempotent registration of the synthgen source on a session."""
    spark.dataSource.register(SynthGenDataSource)
