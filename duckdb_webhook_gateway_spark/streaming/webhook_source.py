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
import uuid
from typing import Any, Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..engine.audit import FILTERED_OUT_BODY
from ..functions import rewrite_dialect
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

# envelope + executor-computed payload-shape fingerprint
TAGGED_SCHEMA = T.StructType(
    list(ENVELOPE_SCHEMA.fields) + [T.StructField("fp", T.StringType(), True)]
)


# Fingerprint path encoding: key segments joined by unit separator \x1f
# (keys containing it are declared unfingerprintable rather than risking
# ambiguity), list descent marked by record separator \x1e.  The encoding
# is injective, so the fingerprint doubles as a SCHEMA: every (path,
# type) entry can be parsed back into a nested StructType without a data
# pass (see schema_from_fingerprint).
_SEP = "\x1f"
_LIST = "\x1e"
_I64_MIN, _I64_MAX = -(2**63), 2**63 - 1


def _shape_fingerprint(payload: Any) -> Optional[str]:
    """Key-path + scalar-type signature; events sharing it infer the same
    schema batched as they would individually (per-event inference
    parity).  Returns None for shapes the vectorized path does not handle
    (non-dict list elements, ``__corr_id`` collisions, keys containing
    the path separator).

    Module-level pure function so executors can compute it inside the
    tagging ``mapInPandas`` — grouping by shape happens distributively,
    never by collecting payload bodies to the driver.
    """

    def sig(obj: Any, prefix: str, out: list) -> bool:
        if isinstance(obj, dict):
            if "__corr_id" in obj:
                return False
            if not obj:
                # record emptiness: {} and {"a": {}} must not share a
                # fingerprint (their per-event schemas differ)
                out.append((prefix + _SEP + "#empty", "dict"))
                return True
            for k in sorted(obj):
                if _SEP in k or _LIST in k:
                    return False
                if not sig(obj[k], prefix + _SEP + k, out):
                    return False
        elif isinstance(obj, list):
            # Fingerprint EVERY element: a single float among ints
            # would otherwise silently widen the whole batch group's
            # inferred type away from the per-event inference result.
            for el in obj:
                if not sig(el, prefix + _SEP + _LIST, out):
                    return False
            out.append((prefix + _SEP + _LIST + "#len", len(obj) > 0))
        elif isinstance(obj, bool):
            out.append((prefix, "bool"))
        elif isinstance(obj, int):
            # int64 range matters for schema derivation: a wider literal
            # must not silently read as NULL under a LongType schema
            out.append(
                (prefix, "int" if _I64_MIN <= obj <= _I64_MAX else "bigint")
            )
        else:
            out.append((prefix, type(obj).__name__))
        return True

    out: list = []
    if isinstance(payload, dict):
        ok = sig(payload, "$", out)
    elif isinstance(payload, list):
        if not payload or not all(isinstance(e, dict) for e in payload):
            return None
        sigs = set()
        ok = True
        for e in payload:
            el_out: list = []
            if not sig(e, "$" + _SEP + _LIST, el_out):
                ok = False
                break
            sigs.add(json.dumps(el_out))
        if ok and len(sigs) != 1:
            return None  # heterogeneous rows within one event -> per-event path
        out.extend(json.loads(next(iter(sigs))) if ok and sigs else [])
        out.append(("$#list", True))
    else:
        return None
    return json.dumps(out) if ok else None


def schema_from_fingerprint(fp: str) -> Optional[T.StructType]:
    """Parse a shape fingerprint back into the StructType that
    ``spark.read.json`` WOULD infer for payloads of that shape — no data
    pass, no inference job.  Returns None for shapes whose inferred type
    this parser does not model bit-for-bit (int64-overflowing literals,
    mixed-kind arrays beyond int+float, empty dicts/lists) — callers
    fall back to authoritative executor-side inference.  The equivalence
    is property-tested against real read.json inference in
    tests/test_streaming.py.

    Scalar mapping (matching Spark's JSON inference): int -> Long,
    float (and int+float mixes) -> Double, bool -> Boolean, str ->
    String, all-null -> String.  Keys sort alphabetically exactly as
    inference canonicalizes them (the fingerprint already records them
    sorted).
    """
    try:
        entries = json.loads(fp)
    except Exception:
        return None

    is_list_payload = any(p == "$#list" for p, _ in entries)
    tree: dict = {}
    TYPES = "__types__"
    for path, tname in entries:
        if path == "$#list":
            continue
        parts = path.split(_SEP)
        if parts[0] != "$":
            return None
        parts = parts[1:]
        if is_list_payload:
            if not parts or parts[0] != _LIST:
                return None
            parts = parts[1:]
        if parts and parts[-1] in ("#empty", _LIST + "#len"):
            if parts[-1] == "#empty":
                return None  # empty dict: inference drops/structs it — bail
            # list-length marker: an empty list has no element entries and
            # its inferred element type is not derivable — bail; non-empty
            # lists carry element entries, the marker itself is a no-op
            if tname is False:
                return None
            continue
        node = tree
        for seg in parts[:-1]:
            node = node.setdefault(seg, {})
            if not isinstance(node, dict):
                return None
        leaf = parts[-1] if parts else None
        if leaf is None:
            return None
        slot = node.setdefault(leaf, {})
        if not isinstance(slot, dict):
            return None
        slot.setdefault(TYPES, set()).add(tname)

    def build(node: dict):
        types = node.get(TYPES, set())
        children = {k: v for k, v in node.items() if k != TYPES}
        has_list_child = _LIST in children
        if types and (children.keys() - {_LIST} or (has_list_child and types - {"NoneType"})):
            return None  # same path both scalar and container -> bail
        if has_list_child and len(children) > 1:
            return None
        if has_list_child:
            elem = build(children[_LIST])
            if elem is None:
                return None
            return T.ArrayType(elem, True)
        if children:
            fields = []
            for k in sorted(children):
                ft = build(children[k])
                if ft is None:
                    return None
                fields.append(T.StructField(k, ft, True))
            return T.StructType(fields)
        kinds = set(types) - {"NoneType"}
        if not kinds:
            return T.StringType()
        if kinds == {"bool"}:
            return T.BooleanType()
        if kinds == {"int"}:
            return T.LongType()
        if kinds <= {"int", "float"}:
            return T.DoubleType()
        if kinds == {"str"}:
            return T.StringType()
        return None  # bigint / mixed kinds -> authoritative inference

    if not tree:
        return None
    out = build(tree)
    if not isinstance(out, T.StructType) or not out.fields:
        return None
    return out


def _make_shape_deliver(webhook_id: str, dest_url: str, out_cols: list):
    """Executor-side shape + deliver + audit for one (webhook, shape) group.

    Returns a ``mapInArrow`` function over the three-way marker union
    (role 2 = LATERAL result row, role 1 = gate-passing id, role 0 =
    group member), repartitioned by ``__corr_id`` so every event's rows
    live in exactly one task.  Per event: no role-1 row -> the
    filtered-out audit row (constant body, no POST); otherwise apply the
    0/1/N shaping contract with the SAME ``_plain`` conversions the
    driver path used (Arrow ``to_pylist`` hands back exact Python values
    — ints stay ints, SQL NULL stays None, no pandas NaN coercion), POST
    the body through a bounded in-task thread pool, and emit the
    finished ``transformed_events`` audit row.  Within-event row order
    is the LATERAL's output order: an event's rows are produced
    contiguously by one upstream task and shuffle fetch preserves
    within-block order.  The ``timestamp`` column ships as an ISO
    string; the store's distributed writer casts it to TimestampType.
    """

    def shape_deliver(batches):
        import pyarrow as pa

        from duckdb_webhook_gateway_spark.engine.delivery import (
            deliver as _deliver,
        )
        from duckdb_webhook_gateway_spark.engine.results import _plain
        from duckdb_webhook_gateway_spark.engine.store import (
            new_id as _nid,
            now_utc as _now,
        )

        from duckdb_webhook_gateway_spark.engine.audit import (
            FILTERED_OUT_BODY as _FILTERED,
        )

        groups: dict[str, list] = {}
        passed: set = set()
        order: list[str] = []
        for batch in batches:
            for row in batch.to_pylist():
                cid = row["__corr_id"]
                if cid not in groups:
                    groups[cid] = []
                    order.append(cid)
                role = row["__role"]
                if role == 1:
                    passed.add(cid)
                elif role == 2:
                    groups[cid].append(
                        {c: _plain(row[c]) for c in out_cols}
                    )
        filtered = [cid for cid in order if cid not in passed]
        order = [cid for cid in order if cid in passed]
        bodies = []
        for cid in order:
            shaped = groups[cid]
            if not shaped:
                transformed: dict[str, Any] = {}
            elif len(shaped) == 1:
                transformed = shaped[0]
            else:
                transformed = {"results": shaped}
            bodies.append(transformed)
        # bounded in-task delivery pool: one slow destination stalls only
        # its own slot, and partition count stays modest (task overhead,
        # output-file count) without serializing POST latency
        if bodies:
            from concurrent.futures import ThreadPoolExecutor

            with ThreadPoolExecutor(
                max_workers=min(8, len(bodies))
            ) as pool:
                outcomes = list(
                    pool.map(lambda b: _deliver(dest_url, b), bodies)
                )
        else:
            outcomes = []
        out_rows = [
            {
                "id": _nid(),
                "raw_event_id": cid,
                "webhook_id": webhook_id,
                "timestamp": _now().isoformat(),
                "transformed_payload": json.dumps({}),
                "destination_url": dest_url,
                "success": False,
                "response_code": None,
                "response_body": _FILTERED,
            }
            for cid in filtered
        ]
        for cid, transformed, res in zip(order, bodies, outcomes):
            out_rows.append(
                {
                    "id": _nid(),
                    "raw_event_id": cid,
                    "webhook_id": webhook_id,
                    "timestamp": _now().isoformat(),
                    "transformed_payload": json.dumps(
                        transformed, default=str
                    ),
                    "destination_url": dest_url,
                    "success": res.success,
                    "response_code": res.response_code,
                    "response_body": res.response_body,
                }
            )
        if out_rows:
            # explicit schema: an all-NULL response_code partition must
            # still type as int32, never infer as null
            yield pa.RecordBatch.from_pylist(
                out_rows,
                schema=pa.schema(
                    [
                        ("id", pa.string()),
                        ("raw_event_id", pa.string()),
                        ("webhook_id", pa.string()),
                        ("timestamp", pa.string()),
                        ("transformed_payload", pa.string()),
                        ("destination_url", pa.string()),
                        ("success", pa.bool_()),
                        ("response_code", pa.int32()),
                        ("response_body", pa.string()),
                    ]
                ),
            )

    return shape_deliver


class _GroupCommit:
    """WAL-style group commit for the landing directory.

    Concurrent ``ingest()`` calls inside one window share a SINGLE
    json-lines file write + atomic rename — the classic group-commit
    trade: each ack waits up to ``window_s`` longer, and in exchange a
    burst of K concurrent producers costs one file instead of K (the
    file source's per-file fixed cost is what caps drain throughput).
    Flushing runs on a DEDICATED daemon thread owned by this object —
    an earlier design drafted the first submitting producer as flusher,
    which under sustained concurrent ingest held that one HTTP request
    thread (and its client's ack) for the entire busy period.  Only
    worthwhile with CONCURRENT producers — a single serial producer
    would just pay the window per event, which is why this is opt-in
    (``StreamingGateway(group_commit_window=...)``).
    """

    def __init__(self, landing_dir: str, window_s: float = 0.02):
        import threading
        from collections import Counter

        self.dir = landing_dir
        self.window = window_s
        self._lock = threading.Lock()
        self._flushed = threading.Condition(self._lock)
        self._have_lines = threading.Condition(self._lock)
        self._lines: list[str] = []
        self._buf_gen = 0  # generation of the buffer now accepting lines
        self._done_gen = -1  # highest generation durable on disk
        # generation -> exception for failed flushes: waiters of a failed
        # batch must get the write error (their event is NOT durable), not
        # a success ack, and must not hang on a generation that will never
        # become durable.  Pruned ONLY below the lowest generation any
        # live waiter still blocks on — a size-bounded prune could delete
        # a live waiter's error, leaving it to spin forever or, once a
        # later generation succeeded, to exit with a FALSE success ack
        # for a non-durable event.
        self._errors: dict[int, Exception] = {}
        self._waiting: Counter = Counter()  # generation -> live waiters
        self._flusher = None  # lazily-started daemon thread

    def _ensure_flusher(self) -> None:
        # caller holds self._lock
        if self._flusher is None or not self._flusher.is_alive():
            import threading

            self._flusher = threading.Thread(
                target=self._flush_loop,
                name="webhook-group-commit-flusher",
                daemon=True,
            )
            self._flusher.start()

    def submit(self, line: str) -> None:
        """Add one envelope line; returns once its file is renamed in.
        Raises the flush's I/O error if the shared write failed — the
        caller's event did not land, same contract as a failed
        single-file ingest."""
        with self._lock:
            self._lines.append(line)
            my_gen = self._buf_gen
            self._waiting[my_gen] += 1
            self._ensure_flusher()
            self._have_lines.notify()
        try:
            with self._flushed:
                while (
                    self._done_gen < my_gen and my_gen not in self._errors
                ):
                    self._flushed.wait(timeout=1.0)
                err = self._errors.get(my_gen)
        finally:
            with self._lock:
                self._waiting[my_gen] -= 1
                if not self._waiting[my_gen]:
                    del self._waiting[my_gen]
                if len(self._errors) > 1024:  # bounded bookkeeping
                    floor = (
                        min(self._waiting) if self._waiting else self._buf_gen
                    )
                    stale = sorted(
                        g for g in self._errors if g < floor
                    )[: len(self._errors) - 512]
                    for g in stale:
                        del self._errors[g]
        if err is not None:
            raise err

    def _flush_loop(self) -> None:
        """Daemon flusher: batch the window, write, repeat.  Producers
        never flush — their only wait is for durability of their own
        generation, bounded by window + one write."""
        import time as _time

        while True:
            with self._have_lines:
                while not self._lines:
                    self._have_lines.wait()
            _time.sleep(self.window)
            with self._lock:
                lines, self._lines = self._lines, []
                gen = self._buf_gen
                self._buf_gen += 1
            flush_err: Optional[Exception] = None
            try:
                fkey = uuid.uuid4().hex
                tmp = os.path.join(self.dir, f".{fkey}.json.tmp")
                with open(tmp, "w") as f:
                    f.write("\n".join(lines) + "\n")
                os.rename(tmp, os.path.join(self.dir, f"{fkey}.json"))
            except Exception as e:  # noqa: BLE001 - propagated to waiters
                flush_err = e
            with self._flushed:
                if flush_err is not None:
                    self._errors[gen] = flush_err
                else:
                    self._done_gen = gen
                self._flushed.notify_all()


class StreamingGateway:
    """Streaming front end over a :class:`Gateway`.

    ``ingest`` is the HTTP-handler side: it appends an envelope line to the
    landing directory and acks (the reference's accepted+event_id reply,
    src/app.py:1111).  ``run_available`` / ``start`` consume the landing
    dir with Structured Streaming and process micro-batches.
    """

    # Delivery fan-out: up to this many events, a bounded driver thread
    # pool (no job overhead; 32 concurrent sockets cover micro-batch
    # rates — measured faster than a Spark job up to ~2k events).  Above
    # it, deliveries ship to executors as a mapInPandas job so the
    # fan-out scales with the cluster instead of one driver's sockets.
    DISTRIBUTED_DELIVERY_THRESHOLD = 2048
    DRIVER_POOL_SIZE = 32

    def __init__(
        self,
        gateway: Gateway,
        landing_dir: Optional[str] = None,
        max_files_per_trigger: int = 5000,
        group_commit_window: Optional[float] = None,
    ):
        self.gateway = gateway
        self.spark = gateway.spark
        self.max_files_per_trigger = max_files_per_trigger
        self.landing_dir = landing_dir or os.path.join(
            gateway.workdir, "landing"
        )
        self.checkpoint_dir = os.path.join(gateway.workdir, "checkpoints")
        os.makedirs(self.landing_dir, exist_ok=True)
        # Opt-in WAL-style group commit: concurrent ingests within the
        # window share one landing file (see _GroupCommit).  Off by
        # default — a single serial producer would only pay the window.
        self._group_commit = (
            _GroupCommit(self.landing_dir, group_commit_window)
            if group_commit_window is not None
            else None
        )
        # NOTE: concurrent ingest() calls need no lock — every event
        # writes its own uniquely-named file (uuid) via an atomic rename.
        # Ledger of fully-committed micro-batch ids; lives inside the
        # checkpoint dir so wiping the checkpoint (which replays the
        # stream from scratch) resets it too.
        self._ledger_path = os.path.join(self.checkpoint_dir, "audit_ledger")
        # fingerprint -> StructType: repeat shapes skip the executor-side
        # inference pass entirely (bounded; fp space per deployment is
        # the set of distinct payload shapes)
        self._schema_cache: dict[str, Any] = {}
        self._SCHEMA_CACHE_MAX = 1024
        # Delivery POSTs run inside Spark tasks (the audit write's
        # mapInArrow pass and the large-batch _resolve_deliveries job); a
        # speculative duplicate task double-POSTs with NO failure having
        # occurred.  spark.speculation is a launch-time core conf (not
        # runtime-settable), so the engine can't just turn it off here —
        # it warns loudly and keeps the driver pool for the RESOLVABLE
        # fallback path only.  The fingerprinted-group main path still
        # POSTs executor-side even under speculation: routing it through
        # the driver would collect transformed payloads driver-side — the
        # anti-pattern the round-6 design removed (pinned by
        # test_no_payload_bearing_collect_in_micro_batch).  Spark's
        # default is false.
        if (
            self.spark.sparkContext.getConf()
            .get("spark.speculation", "false")
            .lower()
            == "true"
        ):
            import warnings

            warnings.warn(
                "spark.speculation=true: speculative tasks can duplicate "
                "webhook delivery POSTs (at-least-once widens beyond "
                "failure-retry). The fallback delivery path is routed to "
                "the driver pool, but the fingerprinted-group audit path "
                "still POSTs executor-side. Launch the streaming session "
                "with speculation off for delivery workloads.",
                RuntimeWarning,
                stacklevel=2,
            )
            self.DISTRIBUTED_DELIVERY_THRESHOLD = 2**63 - 1

    # -- producer side (driver/HTTP shell) --------------------------------
    def ingest(self, path: str, payload: dict | list) -> str:
        """Append an envelope to the landing dir; returns the event id.

        File-per-batch-of-one keeps the file-source contract (files are
        immutable once visible); a fronting HTTP shell may buffer several
        events per file for higher ingest rates.

        The staging file is DOT-PREFIXED so the file stream source (which
        skips only hidden '.'/'_' names, not extensions) can never list a
        half-written envelope — a plain '<id>.json.tmp' in the watched
        dir could be read partially before the rename AND re-read under
        its final name after it, duplicating or corrupting the event.
        The same-directory rename stays atomic.
        """
        event_id = new_id()
        line = json.dumps(
            {
                "event_id": event_id,
                "source_path": path,
                "payload_json": json.dumps(payload),
                "ingest_ts": now_utc().isoformat(),
            }
        )
        if self._group_commit is not None:
            # returns after the shared file is durable (rename done)
            self._group_commit.submit(line)
            return event_id
        fname = os.path.join(self.landing_dir, f"{event_id}.json")
        tmp = os.path.join(self.landing_dir, f".{event_id}.json.tmp")
        with open(tmp, "w") as f:
            f.write(line + "\n")
        os.rename(tmp, fname)
        return event_id

    def ingest_many(self, path: str, payloads: list) -> list[str]:
        """Bulk ingest: N events as ONE landing file; returns their ids.

        The file source's fixed per-file cost (listing, offset-log entry,
        read-task setup) dominates a drain of one-event files — 5,000
        events land at ~200 ev/s as single files but ~550 ev/s as 10
        json-lines files on the same host.  Producers that already hold a
        batch (bulk APIs, replayers, buffering HTTP shells) should use
        this; acks carry the same durability (the rename happens before
        return).  Same dot-prefixed staging + atomic same-dir rename as
        :meth:`ingest`.
        """
        ids, lines = [], []
        for payload in payloads:
            event_id = new_id()
            ids.append(event_id)
            lines.append(
                json.dumps(
                    {
                        "event_id": event_id,
                        "source_path": path,
                        "payload_json": json.dumps(payload),
                        "ingest_ts": now_utc().isoformat(),
                    }
                )
            )
        if not lines:
            return ids
        fkey = uuid.uuid4().hex
        fname = os.path.join(self.landing_dir, f"{fkey}.json")
        tmp = os.path.join(self.landing_dir, f".{fkey}.json.tmp")
        with open(tmp, "w") as f:
            f.write("\n".join(lines) + "\n")
        os.rename(tmp, fname)
        return ids

    # -- consumer side ----------------------------------------------------
    def _stream_df(self) -> DataFrame:
        # 5000-file triggers by default: the batch path is driver-free end
        # to end (round 6), so batch size trades only per-batch fixed cost
        # (tag job + two staged writes) against latency — measured 210
        # ev/s at 1000 vs 290 ev/s at 5000 on a 20k-event drain locally.
        # Latency-sensitive deployments pass a smaller value.
        return (
            self.spark.readStream.schema(ENVELOPE_SCHEMA)
            .option("maxFilesPerTrigger", self.max_files_per_trigger)
            .json(self.landing_dir)
        )

    # -- batch idempotency ledger -----------------------------------------
    def _last_committed_batch(self) -> int:
        try:
            with open(self._ledger_path) as f:
                return int(f.read().strip())
        except (OSError, ValueError):
            return -1

    def _commit_batch(self, batch_id: int) -> None:
        tmp = self._ledger_path + ".tmp"
        with open(tmp, "w") as f:
            f.write(str(batch_id))
        os.rename(tmp, self._ledger_path)

    def process_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        """foreachBatch body: set-oriented processing + batched audit appends.

        Payload bodies NEVER pass through the driver.  The batch is tagged
        executor-side with a payload-shape fingerprint (``mapInPandas``),
        the raw-event audit append is a distributed write, and each
        (webhook, shape) group's payload relation is stood up with the
        ``engine/replay.py`` re-tag pattern (``mapPartitions`` embeds the
        event id into each payload's JSON on the executors).  The only
        driver collection on the main path is metadata-width group
        bookkeeping — (source_path, fp, event_id) triples.  Filter
        gating, transform, result shaping, delivery AND the transformed-
        event audit rows are one distributed plan per group, executed by
        the batch's single staged audit write.

        Each group runs as TWO Spark queries — a vectorized filter gate
        and a correlated LATERAL transform — instead of two queries *per
        event*; the LATERAL rewrite executes the user's transform against
        each event's own payload relation inside one job, so per-event
        semantics (aggregates, LIMIT, 0/1/N shaping, filter-on-raw) are
        preserved exactly.  A group whose shape cannot be fingerprinted
        (non-dict list elements, ``__corr_id`` collisions, malformed
        JSON) or whose vectorized run fails analysis falls back to the
        per-event path — only THOSE groups' payloads are collected, the
        bounded exotic tail.

        Exactly-once AUDIT semantics on retry: a batch that already
        committed (ledger) is skipped outright, and the audit appends use
        batch-keyed file names (driver writes) or batch-keyed staging +
        promote (distributed writes) so a partially-failed batch
        overwrites its own partial output when Structured Streaming
        replays it.  Delivery is at-least-once: a crash-replay re-POSTs
        the recovered batch, and — with delivery running inside the audit
        write's tasks since round 6 — a task-level retry re-POSTs that
        task's partition, and ``spark.speculation`` (off by default; the
        constructor warns if a deployment enables it) would duplicate
        POSTs even without a failure.  Both are the same contract the
        reference's non-retrying, non-deduplicating sink offers under
        recovery; the audit rows themselves stay exactly-once via the
        staged overwrite.
        """
        if batch_id <= self._last_committed_batch():
            return  # replay of an already-committed batch: audits exist
        tagged = self._tag_shapes(batch_df).persist()
        try:
            # ONE metadata-width collect covers group bookkeeping: ids and
            # shapes, never payload bodies.
            id_rows = tagged.select("source_path", "fp", "event_id").collect()
            if not id_rows:
                self._commit_batch(batch_id)
                return
            file_key = f"b{batch_id:09d}"
            store = self.gateway.store
            # Uncommitted REPLAY boundary: drop every file any earlier
            # attempt of this batch wrote, under EITHER writer's naming —
            # an attempt may land rows in different date partitions
            # (midnight tick) or switch writers (fallback on retry), and
            # the per-writer overwrite below only cleans its own scheme.
            store.drop_batch_files("raw_events", file_key)
            store.drop_batch_files("transformed_events", file_key)
            # distributed raw-event append (idempotent via staging+promote)
            store.append_events_df(
                "raw_events",
                tagged.select(
                    F.col("event_id").alias("id"),
                    F.col("ingest_ts").alias("timestamp"),
                    "source_path",
                    F.col("payload_json").alias("payload"),
                ),
                file_key=file_key,
            )

            groups: dict[tuple[str, Optional[str]], list[str]] = {}
            for r in id_rows:
                groups.setdefault((r["source_path"], r["fp"]), []).append(
                    r["event_id"]
                )
            webhooks: dict[str, Optional[dict[str, Any]]] = {}
            for path, _fp in groups:
                if path not in webhooks:
                    webhooks[path] = self.gateway.catalog.get_by_path(path)

            tr_rows: list[dict[str, Any]] = []
            result_groups: list[tuple[str, Optional[str], DataFrame]] = []
            group_cleanups: list[tuple[str, DataFrame]] = []
            fallback: list[tuple[str, Optional[str]]] = []
            for (path, fp), event_ids in sorted(
                groups.items(), key=lambda kv: (kv[0][0], kv[0][1] or "")
            ):
                webhook = webhooks[path]
                if webhook is None:
                    continue  # unmatched path: raw-logged only (reference 404s pre-log)
                self.gateway.udfs.load_webhook_udfs(webhook["id"])
                if fp is None:
                    fallback.append((path, fp))
                    continue
                grp = tagged.filter(
                    (F.col("source_path") == path) & (F.col("fp") == fp)
                )
                try:
                    audit_df, drv_rows = self._process_group_distributed(
                        webhook, grp, event_ids, fp, cleanups=group_cleanups
                    )
                    if audit_df is not None:
                        result_groups.append((path, fp, audit_df))
                    tr_rows.extend(drv_rows)
                except Exception:
                    fallback.append((path, fp))

            # exotic/failed tail: the ONLY payload-bearing collects, each
            # bounded to its own group
            for path, fp in fallback:
                tr_rows.extend(
                    self._per_event_rows(webhooks[path], path, fp, tagged)
                )

            try:
                self._resolve_deliveries(tr_rows)
                # Distributed results first: executing this write runs the
                # shape+deliver+audit pass on the executors — the shaped
                # bodies never exist on the driver.  Union keeps it ONE
                # idempotent staged write for the whole batch.
                if result_groups:
                    res_union = result_groups[0][2]
                    for _, _, extra in result_groups[1:]:
                        res_union = res_union.unionByName(extra)
                    try:
                        store.append_events_df(
                            "transformed_events", res_union, file_key=file_key
                        )
                    except Exception:
                        # The per-group try above only catches ANALYSIS-time
                        # errors — the transforms EXECUTE here.  One group's
                        # runtime failure (UDF exception, ANSI divide/cast on
                        # a specific payload) must not poison the batch: the
                        # replay is deterministic, so rethrowing would wedge
                        # ingestion permanently.  Isolate instead — drop the
                        # partial output, re-run each group as its own
                        # idempotent keyed write, and route the group(s) that
                        # still fail through the per-event path, which audits
                        # "Error: ..." rows per event and keeps going (the
                        # reference's contract, src/app.py:1232-1244).
                        # Delivery stays at-least-once: tasks that POSTed
                        # before the failure re-POST on the re-run.
                        store.drop_batch_files("transformed_events", file_key)
                        late_rows: list[dict[str, Any]] = []
                        for gi, (path, fp, audit_df) in enumerate(
                            result_groups
                        ):
                            try:
                                store.append_events_df(
                                    "transformed_events",
                                    audit_df,
                                    file_key=f"{file_key}-g{gi:04d}",
                                )
                            except Exception:
                                late_rows.extend(
                                    self._per_event_rows(
                                        webhooks[path], path, fp, tagged
                                    )
                                )
                        self._resolve_deliveries(late_rows)
                        tr_rows.extend(late_rows)
                if tr_rows:
                    store.append_events(
                        "transformed_events", tr_rows, file_key=file_key
                    )
            finally:
                for view, grp_df in group_cleanups:
                    try:
                        self.spark.catalog.dropTempView(view)
                    except Exception:
                        pass
                    grp_df.unpersist(blocking=False)
            self._commit_batch(batch_id)
        finally:
            tagged.unpersist(blocking=False)

    def _tag_shapes(self, batch_df: DataFrame) -> DataFrame:
        """Envelope frame -> envelope + shape fingerprint, executor-side.

        Malformed envelopes (null id/payload) are dropped here — the same
        skip the driver loop used to apply — and unparseable payload JSON
        tags as ``fp=NULL`` (per-event fallback group).
        """

        def tag(batches):
            import pandas as pd

            for pdf in batches:
                pdf = pdf[
                    pdf["event_id"].notna() & pdf["payload_json"].notna()
                ]
                fps = []
                for pj in pdf["payload_json"]:
                    try:
                        fps.append(_shape_fingerprint(json.loads(pj)))
                    except Exception:
                        fps.append(None)
                yield pdf.assign(
                    fp=pd.Series(fps, index=pdf.index, dtype=object)
                )

        return batch_df.mapInPandas(tag, TAGGED_SCHEMA)

    def _per_event_rows(
        self,
        webhook: dict[str, Any],
        path: str,
        fp: Optional[str],
        tagged: DataFrame,
    ) -> list[dict[str, Any]]:
        """Per-event fallback for one (path, fp) group: collects THAT
        group's payloads (bounded to the group) and runs each event through
        the single-event executor, which converts any failure into an
        "Error: ..." audit row instead of an exception.  Used for exotic
        shapes (fp=None), analysis-time transform failures, and groups
        whose distributed run failed at runtime."""
        self.gateway.udfs.load_webhook_udfs(webhook["id"])
        cond = F.col("source_path") == path
        cond = cond & (
            F.col("fp").isNull() if fp is None else F.col("fp") == fp
        )
        rows: list[dict[str, Any]] = []
        for r in (
            tagged.filter(cond).select("event_id", "payload_json").collect()
        ):
            try:
                payload = json.loads(r["payload_json"])
            except Exception:
                rows.append(
                    {
                        "id": new_id(),
                        "raw_event_id": r["event_id"],
                        "webhook_id": webhook["id"],
                        "timestamp": now_utc(),
                        "destination_url": webhook["destination_url"],
                        "transformed_payload": json.dumps({}),
                        "success": False,
                        "response_code": None,
                        "response_body": "Error: malformed payload JSON",
                    }
                )
                continue
            rows.append(self._process_one(webhook, r["event_id"], payload))
        return rows

    # -- delivery fan-out --------------------------------------------------
    def _resolve_deliveries(self, tr_rows: list[dict[str, Any]]) -> None:
        """Resolve rows carrying a deferred ``_deliver`` marker in place.

        Delivery used to run serially inside the processing loop — one slow
        destination stalled the whole micro-batch.  Small batches fan out
        on a bounded driver thread pool; large ones ship to executors via
        ``mapInPandas`` (each task POSTs its partition's events), so
        delivery throughput scales with the cluster, not one driver.
        Results are recorded per row exactly as the serial path did.
        """
        pending = [
            (i, row.pop("_deliver")) for i, row in enumerate(tr_rows) if "_deliver" in row
        ]
        if not pending:
            return
        if len(pending) < self.DISTRIBUTED_DELIVERY_THRESHOLD:
            from concurrent.futures import ThreadPoolExecutor

            with ThreadPoolExecutor(
                max_workers=min(self.DRIVER_POOL_SIZE, len(pending))
            ) as pool:
                outcomes = list(
                    pool.map(lambda p: deliver(p[1][0], p[1][1]), pending)
                )
        else:
            delivery_rows = [
                (i, url, json.dumps(payload, default=str))
                for i, (url, payload) in pending
            ]
            nparts = max(1, min(64, len(delivery_rows) // 8))
            from ..plans.localrel import local_df

            sdf = local_df(
                self.spark, delivery_rows, "idx INT, url STRING, payload STRING"
            ).repartition(nparts)

            def _post(batches):
                import pandas as pd

                from duckdb_webhook_gateway_spark.engine.delivery import deliver as _d

                for pdf in batches:
                    out = []
                    for idx, url, payload in pdf.itertuples(index=False):
                        r = _d(url, json.loads(payload))
                        out.append((int(idx), r.success, r.response_code, r.response_body))
                    yield pd.DataFrame(
                        out, columns=["idx", "success", "response_code", "response_body"]
                    )

            from ..engine.delivery import DeliveryResult

            got = {
                r["idx"]: DeliveryResult(
                    bool(r["success"]),
                    None if r["response_code"] is None else int(r["response_code"]),
                    r["response_body"],
                )
                for r in sdf.mapInPandas(
                    _post,
                    "idx INT, success BOOLEAN, response_code INT, response_body STRING",
                ).collect()
            }
            outcomes = [got[i] for i, _ in pending]
        for (i, _), outcome in zip(pending, outcomes):
            tr_rows[i].update(
                success=outcome.success,
                response_code=outcome.response_code,
                response_body=outcome.response_body,
            )

    # -- vectorized group processing --------------------------------------
    # module-level function re-exposed for API stability
    _shape_fingerprint = staticmethod(_shape_fingerprint)

    def _process_group_distributed(
        self,
        webhook: dict[str, Any],
        grp: DataFrame,
        event_ids: list[str],
        fp: Optional[str] = None,
        cleanups: Optional[list] = None,
    ) -> tuple[Optional[DataFrame], list]:
        """One (webhook, shape) group, payloads resident on executors.

        The payload relation is stood up with the ``engine/replay.py:95``
        re-tag pattern: ``mapPartitions`` embeds each event's id into its
        payload JSON as ``__corr_id`` (safe — fingerprinting rejects
        payloads carrying that key, so collisions route to the per-event
        path).  The group schema comes from the shape fingerprint itself
        when derivable (``schema_from_fingerprint`` — cached per fp, no
        inference pass at all); shapes the parser does not model fall
        back to distributed ``spark.read.json`` inference.  Either way,
        uniform shape within the group makes the relation schema equal
        per-event inference (the fingerprint-parity argument; the
        derived-schema path is property-tested against real inference).
        NOTHING event-bearing touches the driver: the filter gate, the
        LATERAL transform, the 0/1/N shaping, the delivery POSTs and the
        ``transformed_events`` audit rows (including filtered-out rows)
        are ONE distributed plan — a three-way marker union (result rows
        / gate-passing ids / group-member ids) repartitioned by event id
        into a ``mapInArrow`` pass that shapes, delivers and audits, all
        executor-side.  The caller appends the returned DataFrame with
        the store's distributed idempotent writer (the same contract as
        the raw-event path).  Arrow (not pandas) so null integers and
        exact types survive: ``to_pylist`` yields the identical Python
        values a driver ``Row`` would, with no NaN/float coercion.
        Returns ``(audit_df, [])`` — the list is kept for signature
        parity with the fallback path.  The payload relation's temp view
        and cache must outlive the audit write, so cleanup registers
        into ``cleanups`` for the caller to run after its appends
        instead of a local finally.
        """
        spark = self.spark

        def _embed(rows):
            for r in rows:
                p = json.loads(r["payload_json"])
                if isinstance(p, dict):
                    yield json.dumps({**p, "__corr_id": r["event_id"]})
                else:  # list of dicts -> N relation rows per event
                    for el in p:
                        yield json.dumps({**el, "__corr_id": r["event_id"]})

        schema = None
        if fp is not None:
            if fp in self._schema_cache:
                schema = self._schema_cache[fp]
            else:
                schema = schema_from_fingerprint(fp)
                if len(self._schema_cache) >= self._SCHEMA_CACHE_MAX:
                    self._schema_cache.clear()
                self._schema_cache[fp] = schema

        rdd = grp.select("event_id", "payload_json").rdd.mapPartitions(_embed)
        if schema is not None:
            full = T.StructType(
                list(schema.fields)
                + [T.StructField("__corr_id", T.StringType(), True)]
            )
            df = spark.read.schema(full).json(rdd).persist()
        else:
            df = spark.read.json(rdd).persist()
        view = f"batch_{uuid.uuid4().hex}"
        df.createOrReplaceTempView(view)
        if cleanups is not None:
            cleanups.append((view, df))
        cols = ", ".join(f"`{c}`" for c in df.columns if c != "__corr_id")
        filter_query = webhook.get("filter_query")
        if filter_query is not None and str(filter_query).strip():
            gate = f"WHERE {filter_query}"
        else:
            gate = ""
        id_source = f"(SELECT DISTINCT __corr_id FROM {view} {gate})"
        # Analysis-check the gate eagerly so a bad filter routes this
        # group to the per-event fallback path (matching the collect-gate
        # behavior this replaces); execution stays deferred.
        pass_df = spark.sql(f"SELECT __corr_id FROM {id_source} g")

        inner = f"(SELECT {cols} FROM {view} WHERE __corr_id = b.__corr_id)"
        rewritten = rewrite_dialect(
            webhook["transform_query"].replace("{{payload}}", inner)
        )
        outer = (
            f"SELECT b.__corr_id AS __corr_id, r.* "
            f"FROM {id_source} b, LATERAL ({rewritten}) r"
        )
        res_df = spark.sql(outer)
        out_cols = [c for c in res_df.columns if c != "__corr_id"]
        # Three-way marker union, all distributed (no filter-gate collect,
        # no driver-built filtered rows): role 2 = transform result row,
        # role 1 = event passed the gate (guarantees 0-row transforms
        # still deliver `{}`), role 0 = group member (events with no role-1
        # row audit as filtered-out).  The id relations are id-width.
        all_ids = grp.select(F.col("event_id").alias("__corr_id"))
        marked = (
            res_df.withColumn("__role", F.lit(2))
            .unionByName(
                pass_df.withColumn("__role", F.lit(1)),
                allowMissingColumns=True,
            )
            .unionByName(
                all_ids.withColumn("__role", F.lit(0)),
                allowMissingColumns=True,
            )
        )
        # ~512 events per task with an 8-thread delivery pool inside each:
        # delivery concurrency without the task-scheduling and output-file
        # overhead of tiny partitions, and the per-task group buffer stays
        # bounded at cluster scale (a fixed small cap would funnel a
        # million-event group through 8 tasks)
        nparts = max(1, min(1024, (len(event_ids) + 511) // 512))
        audit_df = marked.repartition(nparts, "__corr_id").mapInArrow(
            _make_shape_deliver(
                webhook["id"], webhook["destination_url"], out_cols
            ),
            "id string, raw_event_id string, webhook_id string, "
            "timestamp string, transformed_payload string, "
            "destination_url string, success boolean, "
            "response_code int, response_body string",
        )
        return audit_df, []

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
            return {
                **base,
                "transformed_payload": json.dumps(transformed, default=str),
                # resolved by _resolve_deliveries (parallel fan-out)
                "success": False,
                "response_code": None,
                "response_body": None,
                "_deliver": (webhook["destination_url"], transformed),
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
