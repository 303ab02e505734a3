"""Custom Python DataSource (Spark 4 ``pyspark.sql.datasource``) — the
user-defined-source extension point, the true Spark analog of SQLite's
loadable virtual tables (``sqlite3.h:7586-7592``: a module that
surfaces arbitrary external data as a relation).

``SynthEventsDataSource`` fabricates a deterministic keyed relation
WITHOUT any backing file: N partitions each generate a contiguous id
slice executor-side, so the source scales horizontally exactly like a
file scan (every partition is independent work). Payload columns are
md5-derived, so an oracle in any engine can recompute the identical
relation — the registration/partition/read plumbing is what's under
test, not the data.
"""

from __future__ import annotations

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition


class _Slice(InputPartition):
    def __init__(self, start: int, end: int):
        self.start = start
        self.end = end


class SynthEventsReader(DataSourceReader):
    def __init__(self, options):
        self.n_rows = int(options.get("n_rows", 10000))
        self.n_parts = int(options.get("n_parts", 8))

    def partitions(self):
        if self.n_rows <= 0:
            return []
        step = (self.n_rows + self.n_parts - 1) // self.n_parts
        return [
            _Slice(i, min(i + step, self.n_rows))
            for i in range(0, self.n_rows, step)
        ]

    def read(self, partition):
        import hashlib

        for rid in range(partition.start, partition.end):
            h = int(
                hashlib.md5(f"pyds{rid}".encode()).hexdigest()[:8], 16
            )
            yield (rid, h, h % 5, (h % 1000) / 100.0)


class SynthEventsDataSource(DataSource):
    @classmethod
    def name(cls):
        return "synth_events"

    def schema(self):
        return "rid long, h long, category long, score double"

    def reader(self, schema):
        return SynthEventsReader(self.options)
