"""Custom stateful streaming operator: exact dedup over the event stream.

``applyInPandasWithState`` is the extension point for operators Spark's
built-in streaming aggregations can't express.  The canonical
training-data example implemented here: **streaming exact deduplication**
— every event carries a content hash; the operator keeps the set of seen
hashes per source path in the state store and flags repeats, across
micro-batch boundaries and query restarts (state lives in the
checkpoint).

Scale notes: state is partitioned by group key (source_path), so hot
paths shard across executors with the shuffle; per-group state is the
hash set, 32 bytes per distinct payload.  For unbounded streams, cap
state with a timeout (``GroupStateTimeout``) or switch the set to a
Bloom filter in the same state slot — the operator shape stays the same.
(Spark's built-in ``dropDuplicates`` on streams can only *drop*; this
operator *annotates*, preserving the audit-everything contract.)
"""

from __future__ import annotations

import hashlib
from typing import Any, Iterator, Tuple

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from .webhook_source import ENVELOPE_SCHEMA

OUTPUT_SCHEMA = (
    "event_id string, source_path string, content_hash string, "
    "is_duplicate boolean"
)
STATE_SCHEMA = "seen array<string>"


def _dedup_group(
    key: Tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    seen: set = set(state.get[0]) if state.exists else set()
    (path,) = key
    # Concatenate the WHOLE micro-batch before the arrival-order sort: a
    # group spanning multiple Arrow chunks sorted per-chunk would flag
    # whichever copy happened to land in an earlier chunk as "original"
    # — nondeterministic with chunking (same fix as _session_group).
    pdf = pd.concat(list(pdfs), ignore_index=True)
    if len(pdf):
        pdf = pdf.sort_values(["ingest_ts", "event_id"])
        # null payload_json (a corrupt envelope read PERMISSIVE-ly) must
        # not wedge the stream on None.encode(); it hashes as ""
        hashes = pdf["payload_json"].map(
            lambda s: hashlib.md5((s or "").encode()).hexdigest()
        )
        dup_flags = []
        for h in hashes:
            dup_flags.append(h in seen)
            seen.add(h)
        yield pd.DataFrame(
            {
                "event_id": pdf["event_id"],
                "source_path": path,
                "content_hash": hashes,
                "is_duplicate": dup_flags,
            }
        )
    state.update((sorted(seen),))


def dedup_stream(spark: SparkSession, landing_dir: str) -> DataFrame:
    """Streaming DataFrame annotating each event with is_duplicate."""
    stream = spark.readStream.schema(ENVELOPE_SCHEMA).json(landing_dir)
    return stream.groupBy("source_path").applyInPandasWithState(
        _dedup_group,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def run_dedup_once(
    spark: SparkSession,
    landing_dir: str,
    checkpoint_dir: str,
    out_dir: str,
) -> None:
    """Drain the landing dir once, appending annotations to ``out_dir``.

    State survives across calls through ``checkpoint_dir`` — a payload
    first seen in drain N is flagged duplicate in drain N+1.
    """
    q = (
        dedup_stream(spark, landing_dir)
        .writeStream.outputMode("append")
        .format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


# ---------------------------------------------------------------------------
# Streaming sessionization: the stateful twin of the batch
# operators/sessions.py::sessionize (gap-based, 30-min default).
# ---------------------------------------------------------------------------

SESSION_INPUT_SCHEMA = (
    "event_id long, ts timestamp, user_id long, value double"
)
SESSION_OUTPUT_SCHEMA = (
    "user_id long, session_start timestamp, session_end timestamp, "
    "n_events long, sum_value double"
)
# One open session per user rides across micro-batches (and restarts —
# it lives in the checkpointed state store).
SESSION_STATE_SCHEMA = (
    "start long, last long, n long, sv double"
)

_US = 1_000_000


def _session_rows(user_id, sessions):
    """Arrow-safe emission: timestamp columns must be datetime64, not
    object-dtype lists of pd.Timestamp (object columns crash the Arrow
    serializer in the state runner)."""
    import pandas as pd

    return pd.DataFrame(
        {
            "user_id": pd.Series([user_id] * len(sessions), dtype="int64"),
            "session_start": pd.to_datetime(
                [s[0] for s in sessions], unit="us"
            ),
            "session_end": pd.to_datetime(
                [s[1] for s in sessions], unit="us"
            ),
            "n_events": pd.Series([s[2] for s in sessions], dtype="int64"),
            "sum_value": pd.Series([s[3] for s in sessions], dtype="float64"),
        }
    )


def _session_group(key, pdfs, state):
    """Fold a user's events (event-time order) into gap-separated
    sessions: emit every session CLOSED by a later event; park the open
    tail in state.  If an idle timeout is configured (continuous mode),
    its firing flushes the parked session."""
    (user_id,) = key
    gap_us = 30 * 60 * _US
    if state.hasTimedOut:
        if state.exists:
            start, last, n, sv = state.get
            yield _session_rows(user_id, [(start, last, n, sv)])
        state.remove()
        return

    cur = list(state.get) if state.exists else None
    closed: list[tuple] = []
    # Concatenate the WHOLE micro-batch before the event-time sort: a
    # group spanning multiple Arrow chunks (>10k rows, or unordered
    # source files) sorted per-chunk would fold out-of-order — merging
    # events across a genuine gap and regressing session_end.
    import pandas as pd

    batch = pd.concat(list(pdfs), ignore_index=True)
    if len(batch):
        batch = batch.sort_values(["ts", "event_id"])
        for ts, val in zip(batch["ts"], batch["value"]):
            t = ts.value // 1000  # pandas ns -> epoch us
            if cur is None:
                cur = [t, t, 0, 0.0]
            elif t - cur[1] > gap_us:
                closed.append(tuple(cur))
                cur = [t, t, 0, 0.0]
            # max: a LATE event from a later micro-batch (file source has
            # no watermark) joins the parked session but must never move
            # its end backwards (session_end < session_start otherwise)
            cur[1] = max(cur[1], t)
            cur[2] += 1
            cur[3] += float(val)
    if closed:
        yield _session_rows(user_id, closed)
    if cur is not None:
        state.update(tuple(cur))


def session_stream(
    spark: SparkSession, events_dir: str, idle_timeout_ms: int | None = None
) -> DataFrame:
    """Streaming DataFrame of CLOSED sessions (gap 30 min) per user.

    Reads an events-shaped json drop directory as a file stream; state is
    one open session per user, so memory is user-cardinality regardless
    of stream length — the built-in ``F.session_window`` gives windowed
    aggregates, while this operator variant controls emission
    (close-on-gap) and arbitrary session payload.

    ``idle_timeout_ms`` enables a processing-time idle flush of parked
    sessions for CONTINUOUS queries (processing-time triggers).  Leave it
    None for ``availableNow``/drain usage: timeout-conf'd stateful ops
    re-trigger empty micro-batches under availableNow (observed to spin
    hundreds of batches into a Spark-internal planning error), and a
    drain closes sessions deterministically via later events anyway.
    """

    def group_fn(key, pdfs, state):
        yield from _session_group(key, pdfs, state)
        if idle_timeout_ms is not None and not state.hasTimedOut:
            state.setTimeoutDuration(idle_timeout_ms)

    stream = spark.readStream.schema(SESSION_INPUT_SCHEMA).json(events_dir)
    return stream.groupBy("user_id").applyInPandasWithState(
        group_fn,
        outputStructType=SESSION_OUTPUT_SCHEMA,
        stateStructType=SESSION_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=(
            GroupStateTimeout.ProcessingTimeTimeout
            if idle_timeout_ms is not None
            else GroupStateTimeout.NoTimeout
        ),
    )


def run_sessions_once(
    spark: SparkSession,
    events_dir: str,
    checkpoint_dir: str,
    out_dir: str,
) -> None:
    """Drain available events once, appending closed sessions to out_dir."""
    q = (
        session_stream(spark, events_dir)
        .writeStream.outputMode("append")
        .format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


# ---------------------------------------------------------------------------
# Streaming heavy hitters: Misra-Gries counters in the state store.
# The batch operator's guarantee (operators/sketches.py) carries over
# unchanged because MG is a one-pass streaming algorithm: per group, any
# item with total stream frequency > n_group/k is present in the final
# summary, across micro-batch boundaries and restarts (counters persist
# in the checkpointed state).  State is 2k scalars per group — bounded
# regardless of stream length or item cardinality, which is the entire
# reason to sketch instead of groupBy-count on an unbounded stream.

HH_OUTPUT_SCHEMA = "grp string, item string, est long, seq long"
HH_STATE_SCHEMA = "toks array<string>, cnts array<long>, seq long"


def _hh_group(key, pdfs, state, k: int):
    import pandas as pd

    if state.exists:
        toks, cnts, seq = state.get
        counters = dict(zip(toks, cnts))
    else:
        counters, seq = {}, 0
    from ..operators.sketches import mg_update

    for pdf in pdfs:
        counters = mg_update(counters, pdf["item"].values, k)
    seq += 1
    state.update((list(counters.keys()), list(counters.values()), seq))
    (grp,) = key
    yield pd.DataFrame(
        {
            "grp": grp,
            "item": list(counters.keys()),
            "est": list(counters.values()),
            "seq": seq,
        }
    )


def heavy_hitter_stream(stream: DataFrame, k: int = 50) -> DataFrame:
    """MG summaries over a streaming (grp, item) relation; emits the
    current per-group summary after every micro-batch (seq increments),
    so a reader takes max(seq) per group for the latest view."""

    def fn(key, pdfs, state):
        return _hh_group(key, pdfs, state, k)

    return stream.groupBy("grp").applyInPandasWithState(
        fn,
        outputStructType=HH_OUTPUT_SCHEMA,
        stateStructType=HH_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def run_heavy_hitters_once(
    spark: SparkSession, items: DataFrame, k: int = 50, n_files: int = 6
):
    """Replay a batch (grp, item) relation as a file stream in several
    micro-batch-sized chunks and drain it; returns the final per-group MG
    summaries.  ``maxFilesPerTrigger=1`` forces multiple batches so state
    genuinely round-trips the store."""
    import tempfile
    import uuid

    landing = tempfile.mkdtemp(prefix="hh_stream_")
    items.repartition(n_files).write.mode("overwrite").json(landing)
    stream = spark.readStream.schema("grp string, item string").option(
        "maxFilesPerTrigger", "1"
    ).json(landing)
    name = "hh_" + uuid.uuid4().hex[:8]
    q = (
        heavy_hitter_stream(stream, k=k)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    try:
        if not q.awaitTermination(120):
            raise TimeoutError(
                "heavy-hitter drain did not finish in 120 s — the memory "
                "sink would hold PARTIAL summaries, voiding the superset "
                "guarantee"
            )
    finally:
        q.stop()
    out = spark.table(name)
    from pyspark.sql import Window
    import pyspark.sql.functions as F

    w = Window.partitionBy("grp")
    result = (
        out.withColumn("mx", F.max("seq").over(w))
        .filter(F.col("seq") == F.col("mx"))
        .select("grp", "item", "est")
        # materialize (group-cardinality summaries) so the memory-sink
        # table and the landing copy of the input can be reclaimed —
        # repeated invocations used to leak both for the process lifetime
        .localCheckpoint(eager=True)
    )
    spark.catalog.dropTempView(name)
    import shutil

    shutil.rmtree(landing, ignore_errors=True)
    return result


# ---------------------------------------------------------------------------
# Built-in bounded-state dedup: dropDuplicatesWithinWatermark
# ---------------------------------------------------------------------------


def dedup_within_watermark_stream(
    stream: DataFrame, key_cols: list[str], ts_col: str, delay: str
) -> DataFrame:
    """DROP-style streaming dedup with WATERMARK-BOUNDED state.

    The applyInPandasWithState operator above annotates and keeps every
    hash forever (exactness across all history, state grows with distinct
    keys).  This is the complementary production default for unbounded
    streams: Spark's ``dropDuplicatesWithinWatermark`` evicts a key's
    state once the watermark passes ``delay`` beyond its event time, so
    state is O(keys per delay window) — bounded — at the cost of a
    duplicate arriving later than ``delay`` being treated as new.  Same
    trade the reference cannot make at all (it has no streaming dedup;
    its uniqueness is per-event UUID assignment, src/app.py:1089-1100).

    Use the stateful annotator when the audit-everything contract needs
    repeats FLAGGED; use this when late-bounded DROP semantics suffice
    and the stream is unbounded.
    """
    return stream.withWatermark(ts_col, delay).dropDuplicatesWithinWatermark(
        key_cols
    )
