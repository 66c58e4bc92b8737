"""Service transport layer — request/response loop over the engine.

The reference is a *microservice* (SURVEY §0: a client API arriving
over a broker/socket; §3.3 request lifecycle: a JSON request crosses a
process boundary, is validated against the cube spec, rewritten onto
cube cells, executed, and rows return). ``OlapEngine`` is the
engine-side of that contract; this module is the missing transport —
a newline-delimited-JSON request/response loop over stdio or a local
TCP socket, so a non-Python client can drive the full lifecycle
(create → route → query → drop) the way the reference's clients do.

Protocol (NDJSON — one JSON object per line, UTF-8):

    request:  {"id": <any>, "op": "<opname>", ...op fields}
    response: {"id": <echoed>, "ok": true,  "result": ...}
              {"id": <echoed>, "ok": false,
               "error": {"code": "<code>", "message": "..."}}

Spark's own logging goes to stderr; stdout carries protocol lines
only. The stdio transport is synchronous — one request, one response,
in order (the reference's single-threaded event-loop shape). The
socket transport serves one thread per connection with a bounded
reader-writer contract: read-only ops (query/explain/read) run
concurrently, capped at ``_MAX_CONCURRENT_READS`` in-flight Spark
actions (excess reads block — backpressure, not errors); mutating ops
(create/drop/refresh/apply_cdc/materialize/advise) are exclusive, so
a query never observes a cube mid-drop. Per-connection ordering is
still request order (the handler loop is sequential per client).

Error taxonomy (``error.code``) — the engine's refuse-loudly
convention mapped onto wire codes, so a client can distinguish
"this engine explicitly does not model that" from "you sent
garbage" from "that name does not exist":

    refused      PipelineError — an explicitly-refused stage/operator/
                 shape (the diagnostic names it and the workaround)
    not_found    unknown cube / collection / source table
    bad_request  malformed request: bad JSON, missing field, unknown op
    invalid      engine-level validation error (ValueError)
    internal     anything else — a bug; message carries the class name

Ops:

    ping                                          → "pong"
    list_cubes                                    → [names]
    create_cube        {spec}                     → {cube, cells}
    create_cube_from_pipeline {name, source, pipeline}
                                                  → {cube, cells}
    drop_cube          {name}                     → {dropped}
    refresh_cube       {name}                     → {cube, cells}
    query              {cube?|source?, group_by?, where?, measures?,
                        limit?, as_of?}           → rows payload
                        (as_of: pinned snapshot version — cube mode
                         only; reclaimed/unknown versions refuse)
    list_versions      {name}                     → {cube, versions,
                                                     current}
    query_pipeline     {source, pipeline, limit?} → rows payload
    explain            {source, pipeline}         → route/stages/refusals
    materialize        {source, pipeline}         → {version}
    read_collection    {name, limit?}             → rows payload
    apply_cdc          {cube, batch, batch_id?}   → {applied}
    pump_cdc           {cube, path, max_changes?, max_batches?}
                                                  → {batches, changes,
                                                     resume_token}
    subscribe          {cube, path, max_changes?, max_batches?,
                        follow?: {poll_ms?, idle_timeout_ms?}}
                                                  → STREAMED (see below)

    advise             {workload, cell_budget?, apply?}
                                                  → advice document
    apply_sketch_alternative {spec, quantile_ranges?}
                                                  → {cube, cells, spec}
    shutdown                                      → "bye" (loop exits)

``subscribe`` is the protocol's ONE push-shaped op (VERDICT r13
"What's missing" #5 — a subscribe-style op streaming cube updates):
one request produces MULTIPLE response lines, all echoing the
request id. Each applied CDC batch is pushed as it commits:

    {"id": ..., "ok": true, "event": "batch",
     "result": {"batch_id": tok, "changes": n, "resume_token": tok}}

and the stream terminates with exactly one ordinary (event-less)
response — ``{"ok": true, "result": {batches, changes, resume_token,
"done": true}}`` on a drained stream, or the usual error envelope if
a batch fails mid-stream. A client reads lines until it sees one
WITHOUT an ``"event"`` field. Every other op keeps the strict
one-request-one-response contract; a client that never subscribes
never sees an ``event`` line. Resume rides the cube's own committed
watermark (same exactly-once fence as ``pump_cdc``), so re-sending
``subscribe`` after a disconnect pushes only what was not yet
committed. Each batch applies under the exclusive side of the RW
lock — concurrent reads on other connections interleave BETWEEN
batches and always observe a committed cube state.

By default the stream ends when the landed changes are drained.
``follow`` turns it into a LIVE TAIL (Mongo's change-stream cursor
blocks awaiting new events; the file-landed equivalent polls the
landing directory): on drain, re-poll every ``poll_ms`` (default
500) until ``idle_timeout_ms`` (default 10000) passes with no new
changes, then emit the terminal summary. New files landed while
following are pushed as they commit.

Rows payload: {"columns": [...], "types": [simpleString...],
"rows": [[...]...], "row_count": N, "truncated": bool}. ``limit``
caps driver-side collection (default 10_000): the service serves
AGGREGATE answers — cells, not corpora — so results are small by
construction, but a runaway request must not collect 100 TB onto the
driver; ``truncated`` says the cap bit (detected by fetching limit+1
rows, so no full materialization happens either way).

Run standalone:

    python -m mongo_olap_spark.service --data-dir /root/testdata/sf0.001 \
        --root /tmp/olap_root            # stdio
    python -m mongo_olap_spark.service ... --port 7077   # local socket
"""

from __future__ import annotations

import base64
import datetime as _dt
import decimal
import json
import math
import sys
import threading

__all__ = ["OlapService", "serve_stdio", "serve_socket", "main"]

_DEFAULT_LIMIT = 10_000


def _jsonable(v):
    """JSON-safe conversion for collected Spark values: temporal →
    ISO strings, Decimal → string (exactness survives the wire — the
    decimal-sum policy is the engine's correctness story; a float
    round-trip would undo it), bytes → base64, Row/struct → dict,
    containers recursively. Non-finite floats map to null: strict JSON
    has no NaN/Infinity tokens, and the layer's audience is non-Python
    NDJSON clients whose parsers reject them (VERDICT r13)."""
    if isinstance(v, float):
        return v if math.isfinite(v) else None
    if v is None or isinstance(v, (bool, int, str)):
        return v
    if isinstance(v, decimal.Decimal):
        return str(v)
    if isinstance(v, (_dt.datetime, _dt.date, _dt.time)):
        return v.isoformat()
    if isinstance(v, (bytes, bytearray)):
        return base64.b64encode(bytes(v)).decode("ascii")
    if hasattr(v, "asDict"):  # pyspark Row
        return {k: _jsonable(x) for k, x in v.asDict().items()}
    if isinstance(v, dict):
        return {str(k): _jsonable(x) for k, x in v.items()}
    if isinstance(v, (list, tuple, set)):
        return [_jsonable(x) for x in v]
    return str(v)


class _BadRequest(Exception):
    """A malformed request (missing field) — distinct from engine
    KeyError/LookupError so a deep lookup miss can't masquerade as a
    protocol error (and vice versa)."""


class _RWLock:
    """WRITE-PREFERRING reader-writer lock for the service's
    concurrency contract (VERDICT r13 task 7): read-only ops
    (query/explain/read) run CONCURRENTLY — Spark schedules concurrent
    actions from multiple threads fine — while mutating ops
    (create/drop/refresh/apply_cdc/materialize/advise) are exclusive,
    serialized against both each other and in-flight reads, so a query
    never observes a cube mid-drop.

    Writer preference is LOAD-BEARING (r15, found by
    tools/soak_service.py): the first cut admitted new readers while a
    writer waited, so two clients polling aggregate queries every
    ~150 ms — each read a ~300 ms Spark action, sections overlapping
    indefinitely — starved every CDC pump FOREVER. A busy dashboard
    must not block ingestion. With preference, arriving readers queue
    behind a waiting writer; the flip side (a continuous write stream
    delaying reads) is bounded because writes are batch-scoped and
    drain. The stdio transport is a single thread either way — this
    matters for the socket transport's thread-per-connection model."""

    def __init__(self):
        self._cond = threading.Condition()
        self._readers = 0
        self._writer = False
        self._writers_waiting = 0

    def acquire_read(self):
        with self._cond:
            while self._writer or self._writers_waiting:
                self._cond.wait()
            self._readers += 1

    def release_read(self):
        with self._cond:
            self._readers -= 1
            if not self._readers:
                self._cond.notify_all()

    def acquire_write(self):
        with self._cond:
            self._writers_waiting += 1
            try:
                while self._writer or self._readers:
                    self._cond.wait()
            finally:
                self._writers_waiting -= 1
            self._writer = True

    def release_write(self):
        with self._cond:
            self._writer = False
            self._cond.notify_all()


def _field(req, name):
    try:
        return req[name]
    except KeyError:
        raise _BadRequest(f"missing request field {name!r}") from None


class OlapService:
    """Engine-side request handler: ``handle(request_dict) → response
    dict``. Pure dispatch — transports (stdio/socket) wrap it.

    Source names resolve in order: the engine's materialized
    collection store ($out/$merge results are queryable, like the
    reference's cube-state collections), then the testdata table set
    under ``data_dir`` via :func:`sources.tables.load_table` (which
    normalizes the events.ts physical forms). Resolution is cached —
    one logical plan per table per service lifetime."""

    #: ops that never mutate engine state — they run under the shared
    #: (concurrent) side of the RW lock; everything else is exclusive.
    #: ``advise`` mutates only with apply=true, but classifying it by
    #: request payload would make the concurrency contract data-
    #: dependent — it stays exclusive.
    _READ_OPS = frozenset({
        "ping", "list_cubes", "query", "query_pipeline", "explain",
        "read_collection", "list_versions",
    })
    #: bound on CONCURRENT read ops (socket transport): each read is a
    #: Spark action on the shared session — a cap keeps a burst of
    #: clients from queueing hundreds of jobs at once. Reads beyond the
    #: cap block at the semaphore (backpressure), they don't error.
    _MAX_CONCURRENT_READS = 8

    def __init__(self, engine, data_dir: str):
        self.engine = engine
        self.data_dir = data_dir
        self._sources: dict = {}
        self._rw = _RWLock()  # socket transport is threaded
        self._read_slots = threading.BoundedSemaphore(
            self._MAX_CONCURRENT_READS)

    # -- source resolution -------------------------------------------------

    def _source_df(self, name: str):
        # concurrent readers may race on the cache dict: dict get/set
        # are atomic under the GIL and a duplicate resolution is benign
        # (same logical plan, last write wins) — no lock needed
        from mongo_olap_spark.sources.tables import TABLES, load_table

        if name in self._sources:
            return self._sources[name]
        try:
            df = self.engine.store.read(name)
        except FileNotFoundError:
            # only the store's missing-collection signal falls through
            # to the table set — a genuine read failure on a
            # materialized collection must surface as an error, not
            # silently serve base-table data for a shadowing name
            # (ADVICE r13)
            if name not in TABLES:
                raise LookupError(
                    f"unknown source {name!r}: not a materialized "
                    f"collection and not one of {sorted(TABLES)}"
                ) from None
            df = load_table(self.engine.spark, self.data_dir, name)
        self._sources[name] = df
        return df

    # -- rows payload --------------------------------------------------------

    def _rows_payload(self, df, limit: int) -> dict:
        if not isinstance(limit, int) or limit <= 0:
            raise ValueError(f"limit must be a positive int, got {limit!r}")
        rows = df.limit(limit + 1).collect()
        truncated = len(rows) > limit
        rows = rows[:limit]
        cols = df.columns
        return {
            "columns": cols,
            "types": [f.dataType.simpleString() for f in df.schema.fields],
            "rows": [[_jsonable(r[c]) for c in cols] for r in rows],
            "row_count": len(rows),
            "truncated": truncated,
        }

    # -- ops -----------------------------------------------------------------

    def _op_ping(self, req):
        return "pong"

    def _op_list_cubes(self, req):
        return self.engine.list_cubes()

    def _op_create_cube(self, req):
        from mongo_olap_spark.cube import CubeSpec

        spec = _field(req, "spec")
        spec = CubeSpec.from_json(
            spec if isinstance(spec, str) else json.dumps(spec))
        cells = self.engine.create_cube(spec, self._source_df(spec.source))
        return {"cube": spec.name, "cells": cells.count()}

    def _op_create_cube_from_pipeline(self, req):
        cells = self.engine.create_cube_from_pipeline(
            _field(req, "name"), _field(req, "source"), _field(req, "pipeline"),
            self._source_df(_field(req, "source")))
        return {"cube": _field(req, "name"), "cells": cells.count()}

    def _op_drop_cube(self, req):
        name = _field(req, "name")
        if name not in self.engine.list_cubes():
            raise LookupError(f"unknown cube {name!r}")
        self.engine.drop_cube(name)
        return {"dropped": name}

    def _op_refresh_cube(self, req):
        name = _field(req, "name")
        spec = self.engine.catalog.get_spec(name)
        cells = self.engine.refresh_cube(name, self._source_df(spec.source))
        return {"cube": name, "cells": cells.count()}

    def _op_evolve_cube(self, req):
        """r15: add/drop measures on a live cube. Runs under the
        service's exclusive write lock, which IS the quiesced-writes
        contract catalog.evolve documents. ``add`` is a list of
        measure docs (same shape as create_cube's spec measures);
        ``drop`` a list of measure names."""
        from mongo_olap_spark.cube.spec import Measure

        name = _field(req, "name")
        if name not in self.engine.list_cubes():
            raise LookupError(f"unknown cube {name!r}")
        add_docs = req.get("add") or []
        drop = req.get("drop") or []
        if not isinstance(add_docs, list) or not isinstance(drop, list):
            raise _BadRequest("evolve_cube: add/drop must be lists")
        if not all(isinstance(d, str) for d in drop):
            raise _BadRequest("evolve_cube: drop must be measure names")
        try:
            add = [Measure(**d) for d in add_docs]
        except TypeError as exc:  # unknown/missing measure-doc keys
            raise _BadRequest(
                f"evolve_cube: bad measure doc: {exc}") from exc
        spec = self.engine.catalog.get_spec(name)
        source = self._source_df(spec.source) if add else None
        cells = self.engine.evolve_cube(name, add=add, drop=drop,
                                        source=source)
        return {"cube": name, "cells": cells.count(),
                "version": self.engine.catalog.current_version(name),
                "measures": [m.name for m in
                             self.engine.catalog.get_spec(name).measures]}

    def _op_query(self, req):
        as_of = req.get("as_of")
        # bool subclasses int in Python, so {"as_of": true} would
        # otherwise be treated as snapshot version 1 (ADVICE r14).
        if as_of is not None and (not isinstance(as_of, int)
                                  or isinstance(as_of, bool)):
            raise _BadRequest(
                f"query: as_of must be an int snapshot version, "
                f"got {as_of!r}")
        if as_of is not None and not req.get("cube"):
            raise _BadRequest(
                "query: as_of pins a CUBE snapshot version; pass cube=")
        df = self.engine.query(
            cube=req.get("cube"),
            source=req.get("source"),
            group_by=req.get("group_by"),
            where=req.get("where"),
            measures=[tuple(m) if isinstance(m, list) else m
                      for m in (req.get("measures") or [])] or None,
            source_df=(self._source_df(_field(req, "source"))
                       if req.get("source") else None),
            as_of=as_of,
        )
        return self._rows_payload(df, req.get("limit", _DEFAULT_LIMIT))

    def _op_list_versions(self, req):
        name = _field(req, "name")
        if name not in self.engine.catalog.list_cubes():
            raise KeyError(f"cube {name!r} not found")
        return {"cube": name,
                "versions": self.engine.catalog.list_versions(name),
                "current": self.engine.catalog.current_version(name)}

    def _op_query_pipeline(self, req):
        df = self.engine.query_pipeline(
            _field(req, "source"), _field(req, "pipeline"),
            source_df=self._source_df(_field(req, "source")))
        return self._rows_payload(df, req.get("limit", _DEFAULT_LIMIT))

    def _op_explain(self, req):
        return _jsonable(self.engine.explain(_field(req, "source"), _field(req, "pipeline")))

    def _op_materialize(self, req):
        version = self.engine.materialize_pipeline(
            self._source_df(_field(req, "source")), _field(req, "pipeline"))
        return {"version": version}

    def _op_read_collection(self, req):
        try:
            df = self.engine.store.read(_field(req, "name"))
        except FileNotFoundError:
            # missing-collection only: any other store failure is a
            # genuine internal error, not not_found (ADVICE r13)
            raise LookupError(
                f"unknown collection {req['name']!r}") from None
        return self._rows_payload(df, req.get("limit", _DEFAULT_LIMIT))

    def _op_apply_cdc(self, req):
        """Apply one CDC batch (§3.2's entry point over the wire):
        ``batch`` is a list of JSON documents carrying the source's
        columns plus ``mult`` (+1 insert / −1 delete; an update is the
        ±1 pair). Rows coerce against the SOURCE schema (ISO
        timestamps/dates parsed) so wire ingestion and file ingestion
        agree on types. createDataFrame, not an RDD: the service stays
        inside the Connect-compatible API surface."""
        from pyspark.sql.types import (
            DateType,
            IntegerType,
            StructField,
            StructType,
            TimestampType,
        )

        name = _field(req, "cube")
        spec = self.engine.catalog.get_spec(name)
        rows = _field(req, "batch")
        if not isinstance(rows, list) or not rows:
            raise ValueError("apply_cdc: batch must be a non-empty list "
                             "of {doc columns..., mult: ±1} objects")
        # batch_id omitted → auto-increment past the cube's committed
        # watermark, so a client streaming batches without ids never
        # trips the idempotence skip (ADVICE r13: the old default of 0
        # silently dropped every batch after the first while the
        # response still claimed applied=N)
        batch_id = req.get("batch_id")
        if batch_id is None:
            batch_id = self.engine.catalog.last_batch_id(name) + 1
        elif not isinstance(batch_id, int):
            raise _BadRequest(
                f"apply_cdc: batch_id must be an int, got {batch_id!r}")
        src = self._source_df(spec.source)
        schema = StructType(
            list(src.schema.fields) + [StructField("mult", IntegerType())])

        def coerce(v, dt):
            if isinstance(v, str) and isinstance(dt, TimestampType):
                return _dt.datetime.fromisoformat(v)
            if isinstance(v, str) and isinstance(dt, DateType):
                return _dt.date.fromisoformat(v)
            return v

        data = [
            tuple(coerce(r.get(f.name), f.dataType) for f in schema.fields)
            for r in rows
        ]
        batch = self.engine.spark.createDataFrame(data, schema)
        applied = self.engine.apply_cdc(
            name, batch, batch_id, source_for_repair=src)
        # honest wire contract: a replayed batch_id reports applied=0 +
        # skipped_replay=true, never "rows applied" for a no-op
        return {"cube": name, "applied": len(rows) if applied else 0,
                "batch_id": batch_id, "skipped_replay": not applied}

    def _op_pump_cdc(self, req):
        """Drain a file-landed change stream into a cube (r14, VERDICT
        r13 task 4 — the subscribe-style op, pull-shaped because NDJSON
        is one response per request): ``path`` is a parquet directory
        of CDC-shaped rows (``sources.adapters.FileChangeStreamSource``);
        resume comes from the cube's own committed watermark, so
        calling this op repeatedly — including after a service kill —
        applies every change exactly once. Returns
        ``{batches, changes, resume_token}``."""
        from mongo_olap_spark.sources.adapters import FileChangeStreamSource

        name = _field(req, "cube")
        spec = self.engine.catalog.get_spec(name)
        stream = FileChangeStreamSource(_field(req, "path"))
        mb = req.get("max_batches")
        return self.engine.pump_cdc(
            name, stream,
            max_changes=int(req.get("max_changes", 10_000)),
            max_batches=int(mb) if mb is not None else None,
            source_for_repair=self._source_df(spec.source),
        )

    def _op_advise(self, req):
        """Advisor over the wire: ``workload`` entries are
        ``[source, pipeline]`` or ``[source, pipeline, weight]`` (the
        same shapes ``OlapEngine.advise_cubes`` takes)."""
        wl = [tuple(e) for e in _field(req, "workload")]
        sources = {e[0]: self._source_df(e[0]) for e in wl}
        advice = self.engine.advise_cubes(
            wl, sources,
            cell_budget=req.get("cell_budget"),
            sample_fraction=req.get("sample_fraction"),
            apply=bool(req.get("apply", False)),
        )
        return {
            "cubes": [json.loads(c.to_json()) for c in advice.cubes],
            "assignment": {str(k): v for k, v in advice.assignment.items()},
            "est_cells": advice.est_cells,
            "coverage": advice.coverage,
            "dropped_candidates": advice.dropped_candidates,
            "sketch_alternatives": [
                {"query_index": a.query_index,
                 "exact_cells": a.exact_cells,
                 "spec": json.loads(a.spec.to_json()),
                 "est_cells": a.est_cells,
                 "error_envelope": list(a.error_envelope)}
                for a in advice.sketch_alternatives
            ],
        }

    def _op_apply_sketch_alternative(self, req):
        """Opt into a FLAGGED sketch alternative from a prior ``advise``
        response (r14): the client sends back the alternative's ``spec``
        (as advertised, placeholders and all) and optionally
        ``quantile_ranges: {measure: [lo, hi]}``; the engine resolves
        placeholder histogram ranges (one min/max scan when omitted),
        materializes the cube, and the priced-out query routes to it."""
        from mongo_olap_spark.cube import CubeSpec

        spec = _field(req, "spec")
        spec = CubeSpec.from_json(
            spec if isinstance(spec, str) else json.dumps(spec))
        ranges = {
            str(k): (float(v[0]), float(v[1]))
            for k, v in (req.get("quantile_ranges") or {}).items()
        }
        created = self.engine.apply_sketch_alternative(
            spec, self._source_df(spec.source),
            quantile_ranges=ranges or None)
        return {"cube": created.name,
                "cells": self.engine.catalog.cell_count(created.name),
                "spec": json.loads(created.to_json())}

    def _op_shutdown(self, req):
        return "bye"

    # -- dispatch ------------------------------------------------------------

    @staticmethod
    def _err(rid, code, message) -> dict:
        return {"id": rid, "ok": False,
                "error": {"code": code, "message": message}}

    def _map_error(self, rid, e: Exception) -> dict:
        """One exception → one error envelope (the wire taxonomy)."""
        from mongo_olap_spark.plans.pipeline_compiler import PipelineError

        if isinstance(e, PipelineError):
            return self._err(rid, "refused", str(e))
        if isinstance(e, _BadRequest):
            return self._err(rid, "bad_request", str(e))
        if isinstance(e, (LookupError, FileNotFoundError)):
            # incl. engine KeyErrors: unknown cube spec file, unknown
            # measure/dimension name in a cube-mode query
            return self._err(rid, "not_found", str(e))
        if isinstance(e, ValueError):
            return self._err(rid, "invalid", str(e))
        return self._err(rid, "internal", f"{type(e).__name__}: {e}")

    def handle(self, req) -> dict:
        """One request → one response dict (never raises). For the
        streamed ``subscribe`` op this drains the event stream and
        returns only the FINAL response (the one-shot compatibility
        shape for in-process callers); transports use
        :meth:`handle_stream` to push every line."""
        resp = None
        for resp in self.handle_stream(req):
            pass
        return resp

    def handle_stream(self, req):
        """One request → one OR MORE response dicts (never raises).
        Every op yields exactly one response except ``subscribe``,
        which yields one ``event: "batch"`` line per applied CDC batch
        followed by a terminal event-less response."""
        rid = req.get("id") if isinstance(req, dict) else None

        if not isinstance(req, dict):
            yield self._err(rid, "bad_request", "request must be a JSON object")
            return
        op = req.get("op")
        if op == "subscribe":
            yield from self._stream_subscribe(rid, req)
            return
        fn = getattr(self, f"_op_{op}", None) if isinstance(op, str) else None
        if fn is None:
            ops = sorted([n[4:] for n in dir(self) if n.startswith("_op_")]
                         + ["subscribe"])
            yield self._err(rid, "bad_request", f"unknown op {op!r}; ops: {ops}")
            return
        try:
            if op in self._READ_OPS:
                with self._read_slots:
                    self._rw.acquire_read()
                    try:
                        result = fn(req)
                    finally:
                        self._rw.release_read()
            else:
                self._rw.acquire_write()
                try:
                    result = fn(req)
                finally:
                    self._rw.release_write()
        except Exception as e:
            yield self._map_error(rid, e)
            return
        yield {"id": rid, "ok": True, "result": result}

    def _stream_subscribe(self, rid, req):
        """The push op: apply pending CDC batches one at a time, pushing
        an event line per commit. Each batch takes the exclusive lock
        individually, so reads on other connections interleave between
        batches; resume is the cube's committed watermark (exactly-once,
        same fence as pump_cdc), so a re-subscribe after a disconnect
        pushes only uncommitted changes."""
        from mongo_olap_spark.sources.adapters import FileChangeStreamSource

        import time

        try:
            name = _field(req, "cube")
            spec = self.engine.catalog.get_spec(name)
            stream = FileChangeStreamSource(_field(req, "path"))
            max_changes = int(req.get("max_changes", 10_000))
            mb = req.get("max_batches")
            max_batches = int(mb) if mb is not None else None
            follow = req.get("follow")
            if follow is not None and not isinstance(follow, dict):
                raise _BadRequest("subscribe: follow must be an object "
                                  "{poll_ms?, idle_timeout_ms?}")
            poll_s = (float((follow or {}).get("poll_ms", 500)) / 1e3
                      if follow is not None else None)
            idle_budget_s = (float((follow or {}).get("idle_timeout_ms",
                                                      10_000)) / 1e3
                             if follow is not None else None)
            src = self._source_df(spec.source)
        except Exception as e:
            yield self._map_error(rid, e)
            return
        batches = changes = 0
        token = None
        idle_since = None
        while max_batches is None or batches < max_batches:
            self._rw.acquire_write()
            try:
                step = self.engine.pump_cdc(
                    name, stream, max_changes=max_changes, max_batches=1,
                    source_for_repair=src)
            except Exception as e:
                yield self._map_error(rid, e)
                return
            finally:
                self._rw.release_write()
            token = step["resume_token"]
            if step["batches"] == 0:
                # drained. Not following → done; following → poll the
                # landing directory until the idle budget runs out.
                if poll_s is None:
                    break
                now = time.monotonic()
                idle_since = idle_since if idle_since is not None else now
                if now - idle_since >= idle_budget_s:
                    break
                time.sleep(poll_s)
                continue
            idle_since = None
            batches += 1
            changes += step["changes"]
            yield {"id": rid, "ok": True, "event": "batch",
                   "result": {"batch_id": token,
                              "changes": step["changes"],
                              "resume_token": token}}
        yield {"id": rid, "ok": True,
               "result": {"batches": batches, "changes": changes,
                          "resume_token": token, "done": True}}


# ---------------------------------------------------------------------------
# transports
# ---------------------------------------------------------------------------

def _dumps(resp: dict) -> str:
    """Serialize one protocol line as STRICT JSON (``allow_nan=False``
    — ``NaN``/``Infinity`` tokens are invalid JSON that non-Python
    NDJSON clients reject at parse time, VERDICT r13). Row values are
    already finite via :func:`_jsonable`; any non-finite float that
    reaches here through another result shape (explain/advise
    envelopes) is mapped to null by one recursive pass, never emitted
    raw."""
    try:
        return json.dumps(resp, separators=(",", ":"), allow_nan=False)
    except ValueError:
        def finite(v):
            if isinstance(v, float):
                return v if math.isfinite(v) else None
            if isinstance(v, dict):
                return {k: finite(x) for k, x in v.items()}
            if isinstance(v, (list, tuple)):
                return [finite(x) for x in v]
            return v
        return json.dumps(finite(resp), separators=(",", ":"),
                          allow_nan=False)


def _handle_line(service: OlapService, line: str):
    """Parse one protocol line, dispatch, and yield ``(response,
    stop)`` pairs — one pair per pushed line (only ``subscribe`` pushes
    more than one; ``stop`` is True on a successful shutdown)."""
    try:
        req = json.loads(line)
    except json.JSONDecodeError as e:
        yield ({"id": None, "ok": False,
                "error": {"code": "bad_request", "message": f"bad JSON: {e}"}},
               False)
        return
    for resp in service.handle_stream(req):
        stop = (isinstance(req, dict) and req.get("op") == "shutdown"
                and resp["ok"])
        yield resp, stop


def serve_stdio(service: OlapService, infile=None, outfile=None) -> None:
    """NDJSON loop: one request line in, one response line out (the
    ``subscribe`` op pushes several — see the protocol note above).
    Exits on EOF or a successful ``shutdown``."""
    infile = infile if infile is not None else sys.stdin
    outfile = outfile if outfile is not None else sys.stdout
    for line in infile:
        line = line.strip()
        if not line:
            continue
        stop = False
        for resp, stop in _handle_line(service, line):
            outfile.write(_dumps(resp) + "\n")
            outfile.flush()
        if stop:
            break


def serve_socket(service: OlapService, host: str = "127.0.0.1",
                 port: int = 0):
    """Threaded local-socket transport (same NDJSON protocol; one
    connection per client, requests serialized through the service
    lock). Returns the bound server; call ``server.shutdown()`` (or
    send the ``shutdown`` op) to stop. ``port=0`` binds an ephemeral
    port — read it back from ``server.server_address``."""
    import socketserver

    class Handler(socketserver.StreamRequestHandler):
        def handle(self):
            for raw in self.rfile:
                line = raw.decode("utf-8").strip()
                if not line:
                    continue
                stop = False
                for resp, stop in _handle_line(service, line):
                    self.wfile.write((_dumps(resp) + "\n").encode("utf-8"))
                    self.wfile.flush()
                if stop:
                    threading.Thread(target=server.shutdown,
                                     daemon=True).start()
                    return

    class Server(socketserver.ThreadingTCPServer):
        allow_reuse_address = True
        daemon_threads = True

    server = Server((host, port), Handler)
    return server


def main(argv=None) -> int:
    import argparse

    ap = argparse.ArgumentParser(
        description="mongo_olap_spark service: NDJSON request loop "
                    "over stdio (default) or a local TCP socket")
    ap.add_argument("--data-dir", required=True,
                    help="directory of source parquet tables")
    ap.add_argument("--root", required=True,
                    help="engine root (cube catalog + collection store)")
    ap.add_argument("--port", type=int, default=None,
                    help="serve a local TCP socket on this port "
                         "instead of stdio (0 = ephemeral; the bound "
                         "port prints to stderr)")
    ap.add_argument("--master", default="local[*]")
    ap.add_argument("--shuffle-partitions", default="32")
    args = ap.parse_args(argv)

    from pyspark.sql import SparkSession

    from mongo_olap_spark.engine import OlapEngine

    spark = (
        SparkSession.builder.master(args.master)
        .appName("mongo-olap-spark-service")
        .config("spark.sql.shuffle.partitions", args.shuffle_partitions)
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    service = OlapService(OlapEngine(spark, args.root), args.data_dir)
    try:
        if args.port is None:
            print("READY", file=sys.stderr, flush=True)
            serve_stdio(service)
        else:
            server = serve_socket(service, port=args.port)
            print(f"READY {server.server_address[1]}",
                  file=sys.stderr, flush=True)
            server.serve_forever()
    finally:
        spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
