"""Stream-stream interval join: correlate the ingest stream with a
delivery-receipt stream.

The reference has no streaming joins at all (its "streaming" is ad-hoc SQL
over accumulated audit tables — SURVEY §2B); this is the Spark-native
completion of the streaming operator surface: windowed aggregation,
stateful dedup, stream-static enrichment, session windows, and now
stream-STREAM joins.

Semantics: a receipt matches an envelope when the ``event_id`` is equal
AND the receipt arrives within ``max_lag`` of ingest
(``ingest_ts <= receipt_ts <= ingest_ts + max_lag``).  Both sides carry
watermarks, and the join condition bounds event time on both sides, so
Spark's state store evicts every buffered row once the watermark passes
``ingest_ts + max_lag`` — state is O(events within the lag window), not
O(stream history).  At 100 TB/day that bound is what makes the join
runnable at all: an unconstrained stream-stream equi-join would buffer
both streams forever.

The one-shot helper drains with the INNER form: inner matches emit as
soon as both sides arrive, so a single ``availableNow`` drain gives a
deterministic answer.  ``ingest_receipt_join_outer`` exposes the LEFT
OUTER form (lost-delivery detection); its unmatched rows only emit once
the watermark actually advances past the lag bound, which takes a
SECOND trigger carrying later data — see
tests/test_streaming.py::test_stream_stream_outer_join_emits_lost_after_watermark
for the two-drain choreography.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .webhook_source import ENVELOPE_SCHEMA

RECEIPT_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.StringType(), False),
        T.StructField("status_code", T.IntegerType(), False),
        T.StructField("receipt_ts", T.TimestampType(), False),
    ]
)


def ingest_receipt_join(
    spark: SparkSession,
    landing_dir: str,
    receipt_dir: str,
    max_lag: str = "10 minutes",
    watermark: str = "2 minutes",
    how: str = "inner",
) -> DataFrame:
    """(event_id, source_path, ingest_ts, status_code, receipt_ts,
    delivery_lag_us) for every receipt arriving within ``max_lag`` of its
    envelope's ingest.  ``how`` picks the join flavor (inner/leftOuter);
    both share identical state bounds."""
    env = (
        spark.readStream.schema(ENVELOPE_SCHEMA)
        .json(landing_dir)
        .withWatermark("ingest_ts", watermark)
    )
    rec = (
        spark.readStream.schema(RECEIPT_SCHEMA)
        .json(receipt_dir)
        .withWatermark("receipt_ts", watermark)
    )
    joined = env.join(
        rec,
        (env["event_id"] == rec["event_id"])
        & (rec["receipt_ts"] >= env["ingest_ts"])
        & (rec["receipt_ts"] <= env["ingest_ts"] + F.expr(f"interval {max_lag}")),
        how,
    )
    return joined.select(
        env["event_id"].alias("event_id"),
        "source_path",
        "ingest_ts",
        "status_code",
        "receipt_ts",
        (F.unix_micros("receipt_ts") - F.unix_micros("ingest_ts"))
        .cast("double")
        .alias("delivery_lag_us"),
    )


def run_ingest_receipt_join_once(
    spark: SparkSession,
    landing_dir: str,
    receipt_dir: str,
    max_lag: str = "10 minutes",
    watermark: str = "2 minutes",
    query_name: str = "ingest_receipts",
) -> list:
    """Drain both directories once through the interval join."""
    df = ingest_receipt_join(spark, landing_dir, receipt_dir, max_lag, watermark)
    q = (
        df.writeStream.outputMode("append")
        .format("memory")
        .queryName(query_name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = spark.table(query_name).collect()
    q.stop()
    return rows


def ingest_receipt_join_outer(
    spark: SparkSession,
    landing_dir: str,
    receipt_dir: str,
    max_lag: str = "10 minutes",
    watermark: str = "2 minutes",
) -> DataFrame:
    """LEFT OUTER flavor of :func:`ingest_receipt_join`: every envelope
    emits — matched rows as soon as both sides arrive, UNMATCHED rows
    (null receipt columns) only once the watermark passes ``ingest_ts +
    max_lag`` and the state store can prove no receipt is still
    possible.  That wait is the semantic cost of outer results on
    unbounded streams; the delivery-monitoring read of it: "rows with
    NULL status_code are deliveries we can now declare lost", which no
    inner join can express.  State bounds are identical to the inner
    form (both sides evict at the lag horizon).
    """
    return ingest_receipt_join(
        spark, landing_dir, receipt_dir, max_lag, watermark, how="leftOuter"
    )
