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
    InputPartition,
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
