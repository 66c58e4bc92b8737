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
only. Responses are written in request order (the loop is
synchronous — the reference's single-threaded event-loop shape).

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
                        limit?}                   → rows payload
    query_pipeline     {source, pipeline, limit?} → rows payload
    explain            {source, pipeline}         → route/stages/refusals
    materialize        {source, pipeline}         → {version}
    read_collection    {name, limit?}             → rows payload
    apply_cdc          {cube, batch, batch_id?}   → {applied}
    advise             {workload, cell_budget?, apply?}
                                                  → advice document
    shutdown                                      → "bye" (loop exits)

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
import sys
import threading

__all__ = ["OlapService", "serve_stdio", "serve_socket", "main"]

_DEFAULT_LIMIT = 10_000


def _jsonable(v):
    """JSON-safe conversion for collected Spark values: temporal →
    ISO strings, Decimal → string (exactness survives the wire — the
    decimal-sum policy is the engine's correctness story; a float
    round-trip would undo it), bytes → base64, Row/struct → dict,
    containers recursively."""
    if v is None or isinstance(v, (bool, int, float, str)):
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

    def __init__(self, engine, data_dir: str):
        self.engine = engine
        self.data_dir = data_dir
        self._sources: dict = {}
        self._lock = threading.Lock()  # socket transport is threaded

    # -- source resolution -------------------------------------------------

    def _source_df(self, name: str):
        from mongo_olap_spark.sources.tables import TABLES, load_table

        if name in self._sources:
            return self._sources[name]
        try:
            df = self.engine.store.read(name)
        except Exception:
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

    def _op_query(self, req):
        df = self.engine.query(
            cube=req.get("cube"),
            source=req.get("source"),
            group_by=req.get("group_by"),
            where=req.get("where"),
            measures=[tuple(m) if isinstance(m, list) else m
                      for m in (req.get("measures") or [])] or None,
            source_df=(self._source_df(_field(req, "source"))
                       if req.get("source") else None),
        )
        return self._rows_payload(df, req.get("limit", _DEFAULT_LIMIT))

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
        except Exception:
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
        batch_id = req.get("batch_id", 0)
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
        self.engine.apply_cdc(name, batch, batch_id, source_for_repair=src)
        return {"cube": name, "applied": len(rows), "batch_id": batch_id}

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

    def _op_shutdown(self, req):
        return "bye"

    # -- dispatch ------------------------------------------------------------

    def handle(self, req) -> dict:
        """One request → one response dict (never raises)."""
        from mongo_olap_spark.plans.pipeline_compiler import PipelineError

        rid = req.get("id") if isinstance(req, dict) else None

        def err(code, message):
            return {"id": rid, "ok": False,
                    "error": {"code": code, "message": message}}

        if not isinstance(req, dict):
            return err("bad_request", "request must be a JSON object")
        op = req.get("op")
        fn = getattr(self, f"_op_{op}", None) if isinstance(op, str) else None
        if fn is None:
            ops = sorted(n[4:] for n in dir(self) if n.startswith("_op_"))
            return err("bad_request", f"unknown op {op!r}; ops: {ops}")
        try:
            with self._lock:
                result = fn(req)
        except PipelineError as e:
            return err("refused", str(e))
        except _BadRequest as e:
            return err("bad_request", str(e))
        except (LookupError, FileNotFoundError) as e:
            # incl. engine KeyErrors: unknown cube spec file, unknown
            # measure/dimension name in a cube-mode query
            return err("not_found", str(e))
        except ValueError as e:
            return err("invalid", str(e))
        except Exception as e:  # pragma: no cover - bug surface
            return err("internal", f"{type(e).__name__}: {e}")
        return {"id": rid, "ok": True, "result": result}


# ---------------------------------------------------------------------------
# transports
# ---------------------------------------------------------------------------

def _handle_line(service: OlapService, line: str) -> tuple[dict, bool]:
    """Parse one protocol line, dispatch, and report whether the loop
    should exit (a successful shutdown)."""
    try:
        req = json.loads(line)
    except json.JSONDecodeError as e:
        return ({"id": None, "ok": False,
                 "error": {"code": "bad_request", "message": f"bad JSON: {e}"}},
                False)
    resp = service.handle(req)
    stop = (isinstance(req, dict) and req.get("op") == "shutdown"
            and resp["ok"])
    return resp, stop


def serve_stdio(service: OlapService, infile=None, outfile=None) -> None:
    """NDJSON loop: one request line in, one response line out.
    Exits on EOF or a successful ``shutdown``."""
    infile = infile if infile is not None else sys.stdin
    outfile = outfile if outfile is not None else sys.stdout
    for line in infile:
        line = line.strip()
        if not line:
            continue
        resp, stop = _handle_line(service, line)
        outfile.write(json.dumps(resp, separators=(",", ":")) + "\n")
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
                resp, stop = _handle_line(service, line)
                self.wfile.write(
                    (json.dumps(resp, separators=(",", ":")) + "\n")
                    .encode("utf-8"))
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
