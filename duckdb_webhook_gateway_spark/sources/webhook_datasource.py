"""`format("webhook")` — a Spark 4 Python Data Source over the landing dir.

The streaming pipeline's landing directory (streaming/webhook_source.py:
immutable json-lines envelope files — one event per file from plain
``ingest()``, many from ``ingest_many()``/group commit) exposed as a
first-class Spark source, so the ingest path reads idiomatically:

    spark.dataSource.register(WebhookDataSource)
    spark.read.format("webhook").load(landing_dir)          # batch
    spark.readStream.format("webhook").load(landing_dir)    # incremental

Both return the ENVELOPE_SCHEMA relation
(event_id, source_path, payload_json, ingest_ts).

Batch: the file list is split into ``partitions`` chunks (option,
default 8) and each executor task parses its chunk — reads scale out as
long as the landing dir is on shared storage (at cluster scale the
landing dir is an object-store prefix; locally it's a directory).

Streaming: a ``SimpleDataSourceStreamReader`` whose offset is the sorted
list of consumed file names.  Envelope files are immutable-once-visible
and never renamed (webhook_source.py writes tmp-then-rename), so
name-set difference is an exact incremental read: each file is emitted
in exactly one batch, and ``readBetweenOffsets`` can deterministically
replay any (start, end] range after a restart.  A name-set offset grows
linearly with ingested files — the same bookkeeping Spark's own file
source keeps in its compaction log; for unbounded production streams
front with Kafka (SURVEY §7.2) or compact the landing dir periodically.

The driver lists the directory; executors parse.  Per-event semantic
processing stays in StreamingGateway.process_batch — this source only
replaces the scan, and the envelope parse mirrors
webhook_source.py::ingest's writer exactly.
"""

from __future__ import annotations

import json
import os
from datetime import datetime
from typing import Iterator, Tuple

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)

ENVELOPE_DDL = (
    "event_id string, source_path string, payload_json string, "
    "ingest_ts timestamp"
)


def _landing_dir(options) -> str:
    path = options.get("path") or options.get("landing_dir")
    if not path:
        raise ValueError(
            "webhook source needs a landing directory: .load(<dir>) "
            "or .option('landing_dir', <dir>)"
        )
    return path


def _list_envelopes(path: str) -> list[str]:
    try:
        names = os.listdir(path)
    except FileNotFoundError:
        return []
    return sorted(n for n in names if n.endswith(".json"))


def _parse(path: str, name: str) -> list[Tuple]:
    """Every envelope in one landing file.

    Single-event ingest writes one line per file, but ``ingest_many``
    and group commit (round 7) write json-lines BATCH files — reading
    only the first line would silently drop the rest of the batch.
    """
    rows: list[Tuple] = []
    with open(os.path.join(path, name)) as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            env = json.loads(line)
            rows.append(
                (
                    env["event_id"],
                    env["source_path"],
                    env["payload_json"],
                    datetime.fromisoformat(env["ingest_ts"]),
                )
            )
    return rows


class _FileChunk(InputPartition):
    def __init__(self, path: str, names: list[str]):
        self.path = path
        self.names = names


class WebhookBatchReader(DataSourceReader):
    def __init__(self, options):
        self.path = _landing_dir(options)
        self.num_partitions = int(options.get("partitions", "8"))

    def partitions(self):
        names = _list_envelopes(self.path)
        if not names:
            return [_FileChunk(self.path, [])]
        n = max(1, min(self.num_partitions, len(names)))
        chunks = [names[i::n] for i in range(n)]
        return [_FileChunk(self.path, c) for c in chunks if c]

    def read(self, partition: _FileChunk) -> Iterator[Tuple]:
        for name in partition.names:
            yield from _parse(partition.path, name)


class WebhookStreamReader(SimpleDataSourceStreamReader):
    def __init__(self, options):
        self.path = _landing_dir(options)

    def initialOffset(self) -> dict:
        return {"seen": []}

    def read(self, start: dict) -> Tuple[Iterator[Tuple], dict]:
        seen = set(start.get("seen", []))
        current = _list_envelopes(self.path)
        new = [n for n in current if n not in seen]
        end = {"seen": sorted(seen | set(new))}
        return (self._rows(new), end)

    def readBetweenOffsets(self, start: dict, end: dict) -> Iterator[Tuple]:
        new = sorted(set(end.get("seen", [])) - set(start.get("seen", [])))
        return self._rows(new)

    def _rows(self, names: list[str]) -> list[Tuple]:
        # A materialized list, not a generator: the streaming runtime's
        # prefetch cache copy.copy()s the returned iterator to allow
        # re-reads, and generators aren't copyable.
        return [
            row for name in names for row in _parse(self.path, name)
        ]


class WebhookDataSource(DataSource):
    """Register with ``spark.dataSource.register(WebhookDataSource)``."""

    @classmethod
    def name(cls) -> str:
        return "webhook"

    def schema(self) -> str:
        return ENVELOPE_DDL

    def reader(self, schema) -> WebhookBatchReader:
        return WebhookBatchReader(self.options)

    def simpleStreamReader(self, schema) -> WebhookStreamReader:
        return WebhookStreamReader(self.options)
