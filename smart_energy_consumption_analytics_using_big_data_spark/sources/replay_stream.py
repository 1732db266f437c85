"""Spark 4 Python STREAMING DataSource: deterministic parquet replay
with explicit offset management.

``spark.readStream.format("replay").option("path", f).option(
"rows_per_batch", n)`` turns a static parquet file into a stream that
emits `n` rows per micro-batch in a fixed order — the custom-connector
counterpart of the file source used elsewhere (streaming/rollup.py
stages files into a directory; THIS source shows the other half of the
connector surface: a SimpleDataSourceStreamReader with initialOffset /
read / readBetweenOffsets, i.e. resumable offsets the engine can
checkpoint and replay exactly-once).

Scale note: SimpleDataSourceStreamReader reads on the DRIVER and is
the prototyping tier of the API — correct for bounded replay/backfill
feeds; a partition-parallel DataSourceStreamReader is the executor-
side tier the same class structure upgrades into. The offset contract
(half-open row ranges over a deterministically-ordered file) is what
makes replays idempotent either way.

Trigger caveat (pinned by test): with Trigger.AvailableNow the engine
prefetches a simple reader ONCE and drains a single range per run —
size rows_per_batch to the backlog for availableNow, or run a
processingTime trigger for continuous multi-range consumption.

No reference analog (the reference has no streaming at all,
SURVEY.md SS2.9); this extends the S-family connector surface.
"""

from __future__ import annotations

from pyspark.sql.datasource import DataSource, SimpleDataSourceStreamReader


class ReplayStreamReader(SimpleDataSourceStreamReader):
    def __init__(self, options: dict):
        self.path = options["path"]
        self.rows_per_batch = int(options.get("rows_per_batch", 1000))
        self.order_col = options.get("order_col")
        self._table = None

    def _rows(self):
        # loaded lazily and kept: the driver-side replay buffer.
        if self._table is None:
            import pyarrow.parquet as pq

            table = pq.read_table(self.path)
            pdf = table.to_pandas()
            if self.order_col:
                pdf = pdf.sort_values(self.order_col, kind="mergesort")
            self._table = [tuple(r) for r in pdf.itertuples(index=False)]
        return self._table

    def initialOffset(self) -> dict:
        return {"row": 0}

    def read(self, start: dict):
        rows = self._rows()
        lo = start["row"]
        hi = min(lo + self.rows_per_batch, len(rows))
        return iter(rows[lo:hi]), {"row": hi}

    def readBetweenOffsets(self, start: dict, end: dict):
        # exactly-once replay after failure: same half-open range, same rows
        rows = self._rows()
        return iter(rows[start["row"] : end["row"]])


class ReplayDataSource(DataSource):
    """format("replay") — schema comes from the parquet footer."""

    @classmethod
    def name(cls) -> str:
        return "replay"

    def schema(self):
        import pyarrow.parquet as pq

        from pyspark.sql.pandas.types import from_arrow_schema
        from pyspark.sql.types import StructType

        # Footer-only read: pq.read_schema touches metadata, never row
        # groups — probing by materializing the whole file on the driver
        # would read the data twice (once here, once per replay buffer)
        # and scale with file size instead of column count (ADVICE r3).
        arrow_schema = pq.read_schema(self.options["path"])
        fields = StructType()
        for field in from_arrow_schema(arrow_schema, prefer_timestamp_ntz=True).fields:
            fields = fields.add(field)
        return fields

    def simpleStreamReader(self, schema):
        return ReplayStreamReader(self.options)


def register_replay_source(spark) -> None:
    spark.dataSource.register(ReplayDataSource)
