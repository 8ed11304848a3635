"""Custom Python data source (Spark 4 ``pyspark.sql.datasource`` API)
— the extension point for reading systems Spark has no built-in
connector for, demonstrated with a deterministic synthetic-events
generator.

Why this shape matters at scale: ``partitions()`` declares the split
list up front, and each ``read(partition)`` runs ON AN EXECUTOR and
yields only its slice — so a custom source parallelizes like a file
scan (no driver-side materialization, no single-reader bottleneck).
The generator arithmetic is closed-form per row id, which is what
lets the DuckDB oracle replay the whole source from ``range(n)``.

The reference ingests only local/GCS text files (main.py:173-186);
a pluggable source API is part of the §2.2 gap surface.
"""

from __future__ import annotations

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

SYNTH_SCHEMA = "event_id bigint, user_id bigint, value double"


class SyntheticEventsReader(DataSourceReader):
    """Deterministic generator: row i → (i, i % users, (i*7 % 100)/10)."""

    def __init__(self, options: dict):
        self.n = int(options.get("rows", 1000))
        self.parts = int(options.get("partitions", 8))
        self.users = int(options.get("users", 50))

    def partitions(self):
        step = (self.n + self.parts - 1) // self.parts
        return [
            InputPartition((i * step, min((i + 1) * step, self.n)))
            for i in range(self.parts)
        ]

    def read(self, partition: InputPartition):
        start, end = partition.value
        for i in range(start, end):
            yield (i, i % self.users, (i * 7 % 100) / 10.0)


class SyntheticEventsSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "synthetic_events"

    def schema(self) -> str:
        return SYNTH_SCHEMA

    def reader(self, schema) -> DataSourceReader:
        return SyntheticEventsReader(self.options)


def register(spark) -> None:
    """Idempotent registration (re-register overwrites)."""
    spark.dataSource.register(SyntheticEventsSource)


# --- streaming variant --------------------------------------------------------

try:  # SimpleDataSourceStreamReader: PySpark >= 4.0
    from pyspark.sql.datasource import SimpleDataSourceStreamReader
except ImportError:  # pragma: no cover
    SimpleDataSourceStreamReader = object


class TickStreamReader(SimpleDataSourceStreamReader):
    """Offset-tracked synthetic stream: each micro-batch emits the
    next ``batch`` ids. ``read`` advances the offset; ``readBetween
    Offsets`` makes any committed range REPLAYABLE — that is the
    exactly-once contract a custom streaming source must honor for
    checkpoint recovery (Spark re-reads from the last committed
    offset after a crash)."""

    def __init__(self, options: dict):
        self.batch = int(options.get("batch", 10))
        self.users = int(options.get("users", 50))

    def _rows(self, start: int, end: int):
        return iter(
            [(i, i % self.users, (i * 7 % 100) / 10.0) for i in range(start, end)]
        )

    def initialOffset(self):
        return {"i": 0}

    def read(self, start):
        s = start["i"]
        return self._rows(s, s + self.batch), {"i": s + self.batch}

    def readBetweenOffsets(self, start, end):
        return self._rows(start["i"], end["i"])


class TickStreamSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "synthetic_events_stream"

    def schema(self) -> str:
        return SYNTH_SCHEMA

    def simpleStreamReader(self, schema):
        return TickStreamReader(self.options)


def register_stream(spark) -> None:
    spark.dataSource.register(TickStreamSource)
