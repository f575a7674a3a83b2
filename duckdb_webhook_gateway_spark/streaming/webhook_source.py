"""Structured Streaming micro-batch webhook pipeline.

The reference processes each event in a FastAPI background task
(src/app.py:1104-1109) — at-arrival, one at a time, serialized behind a
single DuckDB connection.  The Spark-native shape (SURVEY §7.2 milestone 8,
BASELINE.json north star) is a streaming source feeding micro-batches:

  ingest -> append JSON line to a landing directory ->
  readStream (file source, exactly-once tracking via checkpoint) ->
  foreachBatch: per-event filter/transform (identical executors and
  result-shaping as the synchronous path) + ONE batched audit append
  per micro-batch per table.

Per-event semantics (§2C quirks: filter on raw payload, 0/1/N shaping,
"Filtered out by filter_query" audit rows, error rows) are preserved
exactly — the batch boundary only amortizes storage writes and delivery
fan-out.  At scale, the landing dir becomes cloud storage / Kafka and the
same foreachBatch body runs unchanged; watermarks are unnecessary because
the reference assigns times at ingest (processing time), not event time.
"""

from __future__ import annotations

import json
import os
import threading
import uuid
from typing import Any, Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..engine.audit import FILTERED_OUT_BODY
from ..engine.delivery import deliver
from ..engine.executors import execute_event
from ..engine.pipeline import Gateway
from ..engine.store import new_id, now_utc

ENVELOPE_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.StringType(), False),
        T.StructField("source_path", T.StringType(), False),
        T.StructField("payload_json", T.StringType(), False),
        T.StructField("ingest_ts", T.TimestampType(), False),
    ]
)


class StreamingGateway:
    """Streaming front end over a :class:`Gateway`.

    ``ingest`` is the HTTP-handler side: it appends an envelope line to the
    landing directory and acks (the reference's accepted+event_id reply,
    src/app.py:1111).  ``run_available`` / ``start`` consume the landing
    dir with Structured Streaming and process micro-batches.
    """

    def __init__(self, gateway: Gateway, landing_dir: Optional[str] = None):
        self.gateway = gateway
        self.spark = gateway.spark
        self.landing_dir = landing_dir or os.path.join(
            gateway.workdir, "landing"
        )
        self.checkpoint_dir = os.path.join(gateway.workdir, "checkpoints")
        os.makedirs(self.landing_dir, exist_ok=True)
        self._write_lock = threading.Lock()

    # -- producer side (driver/HTTP shell) --------------------------------
    def ingest(self, path: str, payload: dict | list) -> str:
        """Append an envelope to the landing dir; returns the event id.

        File-per-batch-of-one keeps the file-source contract (files are
        immutable once visible); a fronting HTTP shell may buffer several
        events per file for higher ingest rates.
        """
        event_id = new_id()
        envelope = {
            "event_id": event_id,
            "source_path": path,
            "payload_json": json.dumps(payload),
            "ingest_ts": now_utc().isoformat(),
        }
        fname = os.path.join(self.landing_dir, f"{event_id}.json")
        tmp = fname + ".tmp"
        with open(tmp, "w") as f:
            f.write(json.dumps(envelope) + "\n")
        os.rename(tmp, fname)
        return event_id

    # -- consumer side ----------------------------------------------------
    def _stream_df(self) -> DataFrame:
        return (
            self.spark.readStream.schema(ENVELOPE_SCHEMA)
            .option("maxFilesPerTrigger", 1000)
            .json(self.landing_dir)
        )

    def process_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        """foreachBatch body: per-event pipeline + batched audit appends."""
        rows = batch_df.collect()
        if not rows:
            return
        raw_rows: list[dict[str, Any]] = []
        tr_rows: list[dict[str, Any]] = []
        webhooks_seen: dict[str, Optional[dict[str, Any]]] = {}
        for row in rows:
            path = row["source_path"]
            if path not in webhooks_seen:
                webhooks_seen[path] = self.gateway.catalog.get_by_path(path)
            webhook = webhooks_seen[path]
            payload = json.loads(row["payload_json"])
            raw_rows.append(
                {
                    "id": row["event_id"],
                    "timestamp": row["ingest_ts"],
                    "source_path": path,
                    "payload": row["payload_json"],
                }
            )
            if webhook is None:
                continue  # unmatched path: raw-logged only (reference 404s pre-log)
            tr_rows.append(
                self._process_one(webhook, row["event_id"], payload)
            )
        store = self.gateway.store
        store.append_events("raw_events", raw_rows)
        if tr_rows:
            store.append_events("transformed_events", tr_rows)

    def _process_one(
        self, webhook: dict[str, Any], raw_event_id: str, payload: dict | list
    ) -> dict[str, Any]:
        """One event through filter/transform/deliver; returns the audit row
        (same semantics as Gateway.process_event, write deferred)."""
        spark = self.spark
        self.gateway.udfs.load_webhook_udfs(webhook["id"])
        base = {
            "id": new_id(),
            "raw_event_id": raw_event_id,
            "webhook_id": webhook["id"],
            "timestamp": now_utc(),
            "destination_url": webhook["destination_url"],
        }
        try:
            passed, transformed = execute_event(
                spark,
                webhook.get("filter_query"),
                webhook["transform_query"],
                payload,
            )
            if not passed:
                return {
                    **base,
                    "transformed_payload": json.dumps({}),
                    "success": False,
                    "response_code": None,
                    "response_body": FILTERED_OUT_BODY,
                }
            result = deliver(webhook["destination_url"], transformed)
            return {
                **base,
                "transformed_payload": json.dumps(transformed, default=str),
                "success": result.success,
                "response_code": result.response_code,
                "response_body": result.response_body,
            }
        except Exception as e:
            return {
                **base,
                "transformed_payload": json.dumps({}),
                "success": False,
                "response_code": None,
                "response_body": f"Error: {e}",
            }

    def run_available(self) -> None:
        """Drain everything currently in the landing dir (one shot)."""
        q = (
            self._stream_df()
            .writeStream.foreachBatch(self.process_batch)
            .option("checkpointLocation", self.checkpoint_dir)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    def start(self, processing_interval: str = "1 second"):
        """Continuous micro-batching; returns the StreamingQuery."""
        return (
            self._stream_df()
            .writeStream.foreachBatch(self.process_batch)
            .option("checkpointLocation", self.checkpoint_dir)
            .trigger(processingTime=processing_interval)
            .start()
        )
