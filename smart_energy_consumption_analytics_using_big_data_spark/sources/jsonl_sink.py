"""Spark 4 Python BATCH DataSource WRITER: manifest-committed JSONL
shards — the write-side counterpart of sources/replay_stream.py's
custom stream reader, completing the connector API surface (SURVEY.md
SS2.1 S-family; the reference's export stage `export_results.py` is a
single-file pandas write with no commit protocol).

The point being demonstrated is the COMMIT PROTOCOL, which is what
makes a distributed write correct at scale:

* each task writes its partition to a uniquely-named shard and returns
  a WriterCommitMessage (path + row count) — no two attempts collide;
* `commit()` runs ONCE on the driver after every task succeeded and
  publishes an atomic `_MANIFEST.json` naming exactly the committed
  shards — a reader that honors the manifest never sees partial
  output (same double-buffer idea as streaming/upsert.py);
* `abort()` removes whatever the failed attempt left behind, so a
  crashed job leaves no torn dataset — speculative/retried tasks'
  orphan shards are simply never manifested.

JSON values stringify timestamps/dates (ISO) — the portable lowest
common denominator for an interchange sink.
"""

from __future__ import annotations

import json
import os
import uuid

from pyspark.sql.datasource import DataSource, DataSourceWriter, WriterCommitMessage


class JsonlCommit(WriterCommitMessage):
    def __init__(self, shard: str, rows: int):
        self.shard = shard
        self.rows = rows


class JsonlShardWriter(DataSourceWriter):
    def __init__(self, options: dict):
        self.path = options["path"]

    def write(self, iterator):
        os.makedirs(self.path, exist_ok=True)
        shard = f"part-{uuid.uuid4().hex}.jsonl"
        n = 0
        tmp = os.path.join(self.path, f".{shard}.inprogress")
        with open(tmp, "w") as fh:
            for row in iterator:
                fh.write(json.dumps(row.asDict(), default=str, sort_keys=True))
                fh.write("\n")
                n += 1
        os.rename(tmp, os.path.join(self.path, shard))
        return JsonlCommit(shard, n)

    def commit(self, messages):
        manifest = {
            "shards": sorted(
                [{"shard": m.shard, "rows": m.rows} for m in messages],
                key=lambda e: e["shard"],
            ),
            "total_rows": sum(m.rows for m in messages),
        }
        tmp = os.path.join(self.path, "._MANIFEST.inprogress")
        with open(tmp, "w") as fh:
            json.dump(manifest, fh, indent=1, sort_keys=True)
        os.rename(tmp, os.path.join(self.path, "_MANIFEST.json"))

    def abort(self, messages):
        for m in messages:
            if m is None:
                continue
            try:
                os.remove(os.path.join(self.path, m.shard))
            except OSError:
                pass


class JsonlShardsDataSource(DataSource):
    """``df.write.format("jsonl_shards").option("path", d).save()``."""

    @classmethod
    def name(cls) -> str:
        return "jsonl_shards"

    def writer(self, schema, overwrite: bool):
        return JsonlShardWriter(self.options)


def register_jsonl_sink(spark) -> None:
    spark.dataSource.register(JsonlShardsDataSource)


def read_manifest(path: str) -> dict:
    """Manifest-honoring read: the committed shard list + counts."""
    with open(os.path.join(path, "_MANIFEST.json")) as fh:
        return json.load(fh)
