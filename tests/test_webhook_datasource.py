"""format("webhook") Python Data Source: the landing dir read as a
first-class Spark source (batch + incremental streaming), envelope
parity with StreamingGateway.ingest's writer."""

from __future__ import annotations

import json
import os
import uuid
from datetime import datetime, timezone

import pytest

from duckdb_webhook_gateway_spark.sources.webhook_datasource import (
    WebhookDataSource,
    WebhookStreamReader,
)


def _write_envelope(landing: str, path: str = "/orders", n: int = 1) -> list[str]:
    ids = []
    os.makedirs(landing, exist_ok=True)
    for i in range(n):
        event_id = uuid.uuid4().hex
        env = {
            "event_id": event_id,
            "source_path": path,
            "payload_json": json.dumps({"i": i}),
            "ingest_ts": datetime.now(timezone.utc).isoformat(),
        }
        fname = os.path.join(landing, f"{event_id}.json")
        tmp = fname + ".tmp"
        with open(tmp, "w") as f:
            f.write(json.dumps(env) + "\n")
        os.rename(tmp, fname)
        ids.append(event_id)
    return ids


def _write_batch_file(landing: str, path: str = "/bulk", n: int = 3) -> list[str]:
    """One json-lines file holding n envelopes — the shape ingest_many /
    group commit produce (streaming/webhook_source.py batch writer)."""
    os.makedirs(landing, exist_ok=True)
    ids = []
    lines = []
    for i in range(n):
        event_id = uuid.uuid4().hex
        lines.append(json.dumps({
            "event_id": event_id,
            "source_path": path,
            "payload_json": json.dumps({"i": i}),
            "ingest_ts": datetime.now(timezone.utc).isoformat(),
        }))
        ids.append(event_id)
    fname = os.path.join(landing, f"batch-{uuid.uuid4().hex}.json")
    tmp = fname + ".tmp"
    with open(tmp, "w") as f:
        f.write("\n".join(lines) + "\n")
    os.rename(tmp, fname)
    return ids


@pytest.fixture()
def registered(spark):
    spark.dataSource.register(WebhookDataSource)
    return spark


def test_batch_read_parses_envelopes(registered, tmp_path):
    landing = str(tmp_path / "landing")
    ids = _write_envelope(landing, n=5)
    df = registered.read.format("webhook").load(landing)
    assert [f.name for f in df.schema.fields] == [
        "event_id", "source_path", "payload_json", "ingest_ts",
    ]
    rows = df.collect()
    assert sorted(r.event_id for r in rows) == sorted(ids)
    assert all(r.source_path == "/orders" for r in rows)
    assert all(json.loads(r.payload_json)["i"] in range(5) for r in rows)
    assert all(r.ingest_ts is not None for r in rows)


def test_batch_read_empty_dir_is_empty_relation(registered, tmp_path):
    landing = str(tmp_path / "landing")
    os.makedirs(landing)
    assert registered.read.format("webhook").load(landing).count() == 0


def test_batch_read_partitions_cover_all_files(registered, tmp_path):
    landing = str(tmp_path / "landing")
    _write_envelope(landing, n=23)
    df = (
        registered.read.format("webhook")
        .option("partitions", "4")
        .load(landing)
    )
    assert df.count() == 23
    assert df.select("event_id").distinct().count() == 23


def test_batch_read_json_lines_batch_files(registered, tmp_path):
    """ingest_many / group commit write many envelopes per file; every
    line must surface, mixed freely with single-event files."""
    landing = str(tmp_path / "landing")
    singles = _write_envelope(landing, n=2)
    bulk = _write_batch_file(landing, n=5)
    df = registered.read.format("webhook").load(landing)
    rows = df.collect()
    assert sorted(r.event_id for r in rows) == sorted(singles + bulk)
    assert {r.source_path for r in rows} == {"/orders", "/bulk"}


def test_stream_reader_reads_all_lines_of_batch_files(tmp_path):
    landing = str(tmp_path / "landing")
    bulk = _write_batch_file(landing, n=4)
    r = WebhookStreamReader({"path": landing})
    rows, off = r.read(r.initialOffset())
    assert sorted(t[0] for t in rows) == sorted(bulk)
    more = _write_batch_file(landing, n=3)
    rows2, off2 = r.read(off)
    assert sorted(t[0] for t in rows2) == sorted(more)


def test_stream_reader_offsets_are_incremental_and_replayable(tmp_path):
    """Offset algebra without a running stream: read() emits only unseen
    files, and readBetweenOffsets replays exactly the (start, end] delta."""
    landing = str(tmp_path / "landing")
    first = _write_envelope(landing, n=3)
    r = WebhookStreamReader({"path": landing})
    start = r.initialOffset()
    rows1, off1 = r.read(start)
    assert sorted(t[0] for t in rows1) == sorted(first)

    second = _write_envelope(landing, n=2)
    rows2, off2 = r.read(off1)
    assert sorted(t[0] for t in rows2) == sorted(second)

    rows3, off3 = r.read(off2)  # nothing new
    assert list(rows3) == []
    assert off3 == off2

    replay = r.readBetweenOffsets(off1, off2)
    assert sorted(t[0] for t in replay) == sorted(second)


def test_streaming_end_to_end_exactly_once(registered, tmp_path):
    """availableNow micro-batches against a checkpoint: restarting the
    query after more ingests emits only the new envelopes."""
    landing = str(tmp_path / "landing")
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out.parquet")
    first = _write_envelope(landing, n=4)

    def run_once():
        q = (
            registered.readStream.format("webhook")
            .load(landing)
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(60)

    run_once()
    got = {r.event_id for r in registered.read.parquet(out).collect()}
    assert got == set(first)

    second = _write_envelope(landing, n=3)
    run_once()
    got = sorted(r.event_id for r in registered.read.parquet(out).collect())
    assert got == sorted(first + second)  # no re-emission of batch one
