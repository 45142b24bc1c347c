"""Custom Python Data Source (Spark 4 DataSource API).

Net-new source surface: the reference reads only JDBC/parquet/CSV
(SURVEY §2.1); Spark 4's Python DataSource API is how an engine user
plugs in a system Spark has no built-in connector for (an internal
service, a bespoke file layout, a synthetic generator) while keeping
the full DataFrame/Catalyst surface on top.

The source here is a deterministic arithmetic series generator —
chosen because an exact DuckDB oracle can replay it row for row
(``range()`` + the same affine formula), so the connector's
partitioning and read path get a real correctness row, not a smoke
test.

Scale design: ``partitions()`` reports one split per requested slice,
so Spark schedules reads in parallel exactly like a file source's
splits — the generator never funnels through one task. The classes are
defined inside a factory function so cloudpickle serializes them BY
VALUE: executors cannot import this package (NOTES.md convention #7),
and a module-level class would pickle by reference and fail on the
worker.
"""

from __future__ import annotations

# the affine generator (a * i + b) mod m, all exactly representable in
# int64: a * (n-1) + b < 2^63 for any n this engine generates
_A = 1103515245
_B = 12345
_M = 2147483648


def make_series_datasource():
    """Build the DataSource class (closure-defined for by-value pickling)."""
    from pyspark.sql.datasource import (
        DataSource,
        DataSourceReader,
        InputPartition,
    )

    a, b, m = _A, _B, _M

    class _SeriesPartition(InputPartition):
        def __init__(self, start: int, end: int):
            self.start = start
            self.end = end

    class _SeriesReader(DataSourceReader):
        def __init__(self, options):
            self.n = int(options.get("n", 1000))
            self.num_parts = int(options.get("parts", 8))

        def partitions(self):
            step = (self.n + self.num_parts - 1) // self.num_parts
            return [
                _SeriesPartition(i * step, min((i + 1) * step, self.n))
                for i in range(self.num_parts)
                if i * step < self.n
            ]

        def read(self, partition):
            for i in range(partition.start, partition.end):
                yield (i, (a * i + b) % m)

    class SeriesDataSource(DataSource):
        @classmethod
        def name(cls) -> str:
            return "bdfp_series"

        def schema(self) -> str:
            return "id BIGINT, value BIGINT"

        def reader(self, schema):
            return _SeriesReader(self.options)

    return SeriesDataSource


def register(spark) -> None:
    spark.dataSource.register(make_series_datasource())
