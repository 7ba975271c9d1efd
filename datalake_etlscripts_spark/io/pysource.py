"""Custom Python DataSource (Spark 4 ``pyspark.sql.datasource`` API):
a deterministic synthetic sensor feed, registered as
``format("synthetic_sensor")``.

Why it exists: the reference's scan surface is files + HTTP
(SURVEY §2.1); a real lake also ingests from APIs/devices with no
connector. Spark 4's Python DataSource API is the idiomatic seam for
that — the reader declares PARTITIONS so the scan parallelizes across
executors like any file source, and each partition generates (or in a
real source, fetches) only its slice.

Determinism contract: reading = first-8-hex-digits of
md5("{sensor}:{tick}") mod 1000 — the exact md5 integer lane the
DuckDB oracle replays in SQL (plans/registry.ddb_hex32), so a query
over this source is hash-verified end-to-end even though the rows
never touch disk.
"""

from __future__ import annotations

import hashlib

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceWriter,
    InputPartition,
    SimpleDataSourceStreamReader,
    WriterCommitMessage,
)
from pyspark.sql.types import StructType

N_SENSORS = 5
TICKS_PER_PARTITION = 256
N_PARTITIONS = 4


def sensor_reading(sensor: int, tick: int) -> int:
    """The shared generation rule (Python twin of the SQL lane)."""
    h = hashlib.md5(f"{sensor}:{tick}".encode()).hexdigest()
    return int(h[:8], 16) % 1000


class _SensorReader(DataSourceReader):
    def partitions(self):
        return [InputPartition(p) for p in range(N_PARTITIONS)]

    def read(self, partition):
        lo = partition.value * TICKS_PER_PARTITION
        hi = lo + TICKS_PER_PARTITION
        for tick in range(lo, hi):
            for sensor in range(N_SENSORS):
                yield (sensor, tick, sensor_reading(sensor, tick))


class SyntheticSensorDataSource(DataSource):
    """``spark.read.format("synthetic_sensor")`` after
    ``spark.dataSource.register(SyntheticSensorDataSource)``."""

    @classmethod
    def name(cls) -> str:
        return "synthetic_sensor"

    def schema(self) -> str:
        return "sensor_id INT, tick INT, reading INT"

    def reader(self, schema: StructType) -> DataSourceReader:
        return _SensorReader()


def register(spark) -> None:
    """Idempotent registration (re-register is a no-op overwrite)."""
    spark.dataSource.register(SyntheticSensorDataSource)


class _SensorStreamReader(SimpleDataSourceStreamReader):
    """Offset-tracked streaming twin: each micro-batch emits the ticks
    between the last committed offset and the current head (the head
    advances ``STREAM_STEP`` ticks per poll). Offsets are plain dicts
    — Spark checkpoints them, so a restarted query resumes exactly
    where it stopped (exactly-once source semantics come from the
    deterministic generation rule + offset replay)."""

    def initialOffset(self):
        return {"tick": 0}

    def read(self, start):
        lo = start["tick"]
        hi = lo + STREAM_STEP
        rows = [
            (s, t, sensor_reading(s, t))
            for t in range(lo, hi)
            for s in range(N_SENSORS)
        ]
        return iter(rows), {"tick": hi}

    def readBetweenOffsets(self, start, end):
        return iter(
            (s, t, sensor_reading(s, t))
            for t in range(start["tick"], end["tick"])
            for s in range(N_SENSORS)
        )


STREAM_STEP = 64


class SyntheticSensorStreamSource(DataSource):
    """``spark.readStream.format("synthetic_sensor_stream")``."""

    @classmethod
    def name(cls) -> str:
        return "synthetic_sensor_stream"

    def schema(self) -> str:
        return "sensor_id INT, tick INT, reading INT"

    def simpleStreamReader(self, schema: StructType):
        return _SensorStreamReader()


def register_stream(spark) -> None:
    spark.dataSource.register(SyntheticSensorStreamSource)


class _JsonlCommit(WriterCommitMessage):
    def __init__(self, path: str, n: int):
        self.path = path
        self.n = n


class _JsonlWriter(DataSourceWriter):
    """Per-task JSONL part files + a driver-side commit manifest —
    the two-phase pattern every transactional sink uses: tasks write
    to uniquely-named parts and return commit messages; only the
    DRIVER's commit() publishes the manifest listing the surviving
    parts, so a failed/speculative task's orphan file is never
    visible to readers (they read the manifest, not the directory).
    ``abort()`` removes staged parts."""

    def __init__(self, options):
        self.path = options.get("path")

    def write(self, iterator):
        import json
        import os
        import uuid

        part = os.path.join(self.path, f"part-{uuid.uuid4().hex}.jsonl")
        os.makedirs(self.path, exist_ok=True)
        n = 0
        with open(part, "w") as fh:
            for row in iterator:
                fh.write(json.dumps(row.asDict()) + "\n")
                n += 1
        return _JsonlCommit(part, n)

    def commit(self, messages):
        import json
        import os

        manifest = {
            "parts": sorted(m.path for m in messages),
            "rows": sum(m.n for m in messages),
        }
        with open(os.path.join(self.path, "_MANIFEST.json"), "w") as fh:
            json.dump(manifest, fh)

    def abort(self, messages):
        import os

        for m in messages:
            try:
                os.remove(m.path)
            except OSError:
                pass


class JsonlManifestSink(DataSource):
    """``df.write.format("jsonl_manifest").option("path", dir)`` after
    ``spark.dataSource.register(JsonlManifestSink)``."""

    @classmethod
    def name(cls) -> str:
        return "jsonl_manifest"

    def writer(self, schema: StructType, overwrite: bool):
        return _JsonlWriter(self.options)


def register_sink(spark) -> None:
    spark.dataSource.register(JsonlManifestSink)
