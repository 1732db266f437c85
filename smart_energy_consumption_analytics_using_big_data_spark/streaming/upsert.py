"""Streaming MERGE sink: foreachBatch upsert into a keyed snapshot
(SURVEY.md SS2.9 extension - the streaming side of
operators.relational.merge_upsert).

Structured Streaming's file sinks are append-only; a keyed snapshot
("current state per entity") needs MERGE semantics per micro-batch.
The standard pattern - and what Delta/Iceberg MERGE INTO does under
the hood - is foreachBatch: each micro-batch runs a batch upsert of
the new rows into the snapshot. foreachBatch delivers each batch
exactly-once to the function *per checkpoint lineage*, and because
upsert-by-key is IDEMPOTENT, replaying a batch after a crash
converges to the same snapshot - effective exactly-once without a
transactional table format.

The snapshot is double-buffered (write to a fresh generation dir,
then repoint a tiny manifest) because a plain parquet dir cannot be
read and overwritten in the same job. At 100 TB the generation write
is the cost: swap in a table format (Delta/Iceberg) and this class
collapses to MERGE INTO with file pruning; the orchestration here -
batch function, idempotence, manifest swap - stays the same shape.
"""

from __future__ import annotations

import json
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

from smart_energy_consumption_analytics_using_big_data_spark.operators.relational import merge_upsert


class SnapshotUpsertSink:
    """foreachBatch target maintaining a keyed parquet snapshot."""

    def __init__(
        self,
        spark: SparkSession,
        root: str,
        key_cols: list[str],
        order_cols: list[str],
    ):
        self.spark = spark
        self.root = Path(root)
        self.key_cols = key_cols
        # within-batch winner per key = highest (order_cols) - an
        # explicit version/event-time ordering, never an arbitrary pick
        self.order_cols = order_cols
        self.root.mkdir(parents=True, exist_ok=True)

    @property
    def _manifest(self) -> Path:
        return self.root / "MANIFEST.json"

    def current(self) -> DataFrame | None:
        if not self._manifest.exists():
            return None
        gen = json.loads(self._manifest.read_text())["generation"]
        return self.spark.read.parquet(str(self.root / f"gen={gen}"))

    def generations(self) -> list[int]:
        """Snapshot generations still on disk, oldest first — the
        double-buffered dirs double as a time-travel history until
        vacuum() reclaims them (same mechanics as a table format's
        snapshot log, minus the transaction layer)."""
        return sorted(
            int(p.name.split("=", 1)[1])
            for p in self.root.glob("gen=*")
            if p.is_dir()
        )

    def snapshot_at(self, generation: int) -> DataFrame:
        """Time-travel read of a specific retained generation."""
        path = self.root / f"gen={generation}"
        if not path.is_dir():
            raise ValueError(
                f"generation {generation} not retained (have {self.generations()})"
            )
        return self.spark.read.parquet(str(path))

    def vacuum(self, keep_last: int = 2) -> list[int]:
        """Drop all but the newest `keep_last` generations (never the
        current one). Returns the removed generation ids. The retention
        knob every snapshot store needs: without it the double-buffer
        becomes an unbounded history."""
        import shutil

        keep_last = max(keep_last, 1)
        current = (
            json.loads(self._manifest.read_text())["generation"]
            if self._manifest.exists()
            else None
        )
        gens = self.generations()
        removed = [g for g in gens[:-keep_last] if g != current]
        for g in removed:
            shutil.rmtree(self.root / f"gen={g}")
        return removed

    def process_batch(self, batch: DataFrame, batch_id: int) -> None:
        from pyspark.sql import Window, functions as F

        w = Window.partitionBy(*self.key_cols).orderBy(
            *[F.desc(c) for c in self.order_cols]
        )
        updates = (
            batch.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .drop("__rn")
        )
        target = self.current()
        merged = updates if target is None else merge_upsert(target, updates, self.key_cols)
        gen = batch_id
        out = self.root / f"gen={gen}"
        merged.write.mode("overwrite").parquet(str(out))
        self._manifest.write_text(json.dumps({"generation": gen}))


def stream_upsert_snapshot(
    events: DataFrame,
    sink: SnapshotUpsertSink,
    checkpoint_dir: str,
):
    """Wire a streaming DataFrame into the snapshot sink with
    availableNow (drain-everything-then-stop) semantics."""
    return (
        events.writeStream.foreachBatch(sink.process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
