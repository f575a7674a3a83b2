"""Stream-static enrichment and session windows over the webhook stream.

Two more Spark-native extensions the reference cannot express (its
"streaming" is ad-hoc SQL over accumulated audit tables — SURVEY §2B):

- ``enriched_stream``: join each incoming envelope against a STATIC
  reference dimension (the engine's ``ref_<id>_<name>`` tables are
  exactly this shape).  Stream-static joins need no state store at all —
  Spark re-plans the static side per micro-batch, and a ``broadcast``
  hint keeps the stream side shuffle-free: at 100 TB/day of events the
  enrichment costs one map-side hash probe per event, no matter how many
  executors consume the stream.

- ``session_window_counts``: data-driven session windows (gap timeout)
  via ``F.session_window`` — the streaming twin of the batch
  ``events_sessionize`` operator.  Watermarked, so closed sessions leave
  the state store once the gap has provably expired.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .webhook_source import ENVELOPE_SCHEMA


def enriched_stream(
    spark: SparkSession,
    landing_dir: str,
    dim: DataFrame,
    on: str = "source_path",
    how: str = "left",
) -> DataFrame:
    """Streaming envelopes LEFT-joined against a broadcast static dim.

    ``dim`` must contain the join column ``on``; all its other columns
    land on the enriched stream.  Left join keeps envelopes with no dim
    row (the delivery pipeline decides what unmatched means).
    """
    stream = spark.readStream.schema(ENVELOPE_SCHEMA).json(landing_dir)
    return stream.join(F.broadcast(dim), on=on, how=how)


def run_enriched_once(
    spark: SparkSession,
    landing_dir: str,
    dim: DataFrame,
    on: str = "source_path",
    query_name: str = "enriched_events",
) -> list:
    """Drain the landing dir once through the enrichment join."""
    df = enriched_stream(spark, landing_dir, dim, on=on)
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


def session_window_counts(
    spark: SparkSession,
    landing_dir: str,
    gap: str = "30 seconds",
    watermark: str = "5 minutes",
) -> DataFrame:
    """Streaming sessions per source_path: a session closes after ``gap``
    of silence; the watermark bounds how long open-session state lives."""
    stream = (
        spark.readStream.schema(ENVELOPE_SCHEMA)
        .json(landing_dir)
        .withWatermark("ingest_ts", watermark)
    )
    return (
        stream.groupBy(
            F.session_window("ingest_ts", gap).alias("sess"),
            "source_path",
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("sess.start").alias("session_start"),
            F.col("sess.end").alias("session_end"),
            "source_path",
            "n_events",
        )
    )


def run_session_windows_once(
    spark: SparkSession,
    landing_dir: str,
    gap: str = "30 seconds",
    watermark: str = "5 minutes",
    query_name: str = "session_counts",
) -> list:
    """Drain the landing dir once and return the session windows."""
    df = session_window_counts(spark, landing_dir, gap, watermark)
    q = (
        df.writeStream.outputMode("complete")
        .format("memory")
        .queryName(query_name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = spark.table(query_name).collect()
    q.stop()
    return rows
