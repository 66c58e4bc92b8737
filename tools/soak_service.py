"""Subscribe/pump soak under churn (r15, VERDICT r14 task 7).

The r14 service tests cover each op in isolation; this soak certifies
the TRANSPORT under sustained concurrent churn — the shape a real
deployment runs:

- a WRITER thread keeps landing new CDC segments (parquet files with
  monotone change_id ranges) into one landing directory while
  everything else runs;
- N subscriber clients, one cube each over that directory, consume in
  three styles: a FOLLOW-mode live tail, a chunky DISCONNECT-AND-
  RESUME consumer (new connection every 2 batches — the reconnect
  path), and an ABRUPT consumer that drops its socket mid-push and
  re-subscribes (the watermark must make the torn batch invisible);
- a SHARED cube consumed by a direct pump_cdc writer AND a follow
  subscriber at once — the committed watermark must make their
  combined application exactly-once;
- READER clients interleave queries against every cube throughout;
- VACUUM fires on every cube mid-stream (grace-windowed);
- r16 (VERDICT r15 task 7): an EVOLVE fires mid-stream — a fifth cube
  carries an extra ``avg`` measure that is DROPPED over the wire
  while its follower tails and pumps run. Asserted: the evolve
  commits (the service's exclusive lock serializes it against pumps;
  the r16 CAS would refuse, never overwrite, without it), the
  surviving measures keep serving, the dropped measure refuses BY
  NAME immediately after, the PRE-evolve snapshot still answers the
  dropped measure via as_of time travel (pinned spec), and the
  follower's exactly-once tally is unaffected by the evolution.

Asserted, not eyeballed:
  (a) exactly-once per subscriber: each clean consumer's summed
      ``changes`` equals the total landed changes; resume tokens are
      strictly increasing within each consumer;
  (b) exactly-once on the shared cube: writer + subscriber changes
      sum to the landed total (no batch applied twice or lost);
  (c) every cube's final routed answer equals the closed-form net
      state (inserts minus the %10==9 deletes);
  (d) no stalls: every reader query returns ok, and the soak drains
      within the wall budget.

Usage:
    python tools/soak_service.py [--segments 10] [--out SOAK_SERVICE.json]
"""

from __future__ import annotations

import argparse
import json
import os
import socket
import sys
import threading
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF = "/root/testdata/sf0.01"
PIPE = [{"$group": {"_id": {"et": "$event_type"},
                    "n": {"$sum": 1}, "total": {"$sum": "$value"}}}]

VIOLATIONS: list[str] = []
_vlock = threading.Lock()


def violate(msg: str) -> None:
    with _vlock:
        VIOLATIONS.append(msg)
    print(f"VIOLATION: {msg}", flush=True)


class Client:
    """One NDJSON socket connection."""

    def __init__(self, port: int):
        self.sock = socket.create_connection(("127.0.0.1", port))
        self.f = self.sock.makefile("rwb")

    def send(self, req: dict) -> None:
        self.f.write((json.dumps(req) + "\n").encode())
        self.f.flush()

    def recv(self) -> dict | None:
        line = self.f.readline()
        return json.loads(line) if line else None

    def rpc(self, req: dict) -> dict:
        self.send(req)
        r = self.recv()
        assert r is not None, "server closed"
        return r

    def close(self) -> None:
        try:
            self.sock.close()
        except OSError:
            pass


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--segments", type=int, default=10)
    ap.add_argument("--max-changes", type=int, default=2000)
    ap.add_argument("--land-gap-s", type=float, default=2.0)
    ap.add_argument("--out", default="SOAK_SERVICE.json")
    args = ap.parse_args()

    import tempfile

    from mongo_olap_spark.engine import OlapEngine
    from mongo_olap_spark.service import OlapService, serve_socket
    from mongo_olap_spark.session import get_spark
    from mongo_olap_spark.sources.tables import load_table
    from mongo_olap_spark.streaming.cdc import cdc_from_events

    t_start = time.time()
    spark = get_spark("soak-service", shuffle_partitions=8)
    root = tempfile.mkdtemp(prefix="soak_service_root_")
    land = tempfile.mkdtemp(prefix="soak_service_cdc_")
    engine = OlapEngine(spark, root)
    service = OlapService(engine, SF)
    server = serve_socket(service)
    port = server.server_address[1]
    threading.Thread(target=server.serve_forever, daemon=True).start()

    events = load_table(spark, SF, "events")
    n_events = events.count()
    seg_rows = n_events // args.segments
    total_changes = cdc_from_events(events).count()

    cubes = ["soak_follow", "soak_chunky", "soak_abrupt", "soak_shared",
             "soak_evolve"]
    evolve_pipe = [{"$group": {"_id": {"et": "$event_type"},
                               "n": {"$sum": 1},
                               "total": {"$sum": "$value"},
                               "avg": {"$avg": "$value"}}}]
    boot = Client(port)
    for c in cubes:
        r = boot.rpc({"id": f"mk_{c}", "op": "create_cube_from_pipeline",
                      "name": c, "source": "events",
                      "pipeline": evolve_pipe if c == "soak_evolve"
                      else PIPE})
        assert r["ok"], r
        # zero the initial build: the landed stream is the one truth
        engine.refresh_cube(c, events.limit(0))
    boot.close()

    writer_done = threading.Event()
    landed = {"segments": 0}

    def land_segments():
        from pyspark.sql import functions as F

        for k in range(args.segments):
            lo, hi = k * seg_rows, ((k + 1) * seg_rows
                                    if k < args.segments - 1 else n_events)
            seg = events.filter((F.col("event_id") >= lo)
                                & (F.col("event_id") < hi))
            cdc_from_events(seg).write.mode("append").parquet(land)
            landed["segments"] = k + 1
            time.sleep(args.land_gap_s)
        writer_done.set()

    results: dict[str, dict] = {}

    def check_tokens(name: str, toks: list) -> None:
        nums = [t for t in toks if t is not None]
        if any(b <= a for a, b in zip(nums, nums[1:])):
            violate(f"{name}: resume tokens not strictly increasing")

    def follow_consumer(cube: str, style: str):
        """FOLLOW live tail; 'abrupt' drops the socket every few
        events and re-subscribes."""
        changes = batches = reconnects = 0
        toks: list = []
        while True:
            cl = Client(port)
            cl.send({"id": 1, "op": "subscribe", "cube": cube,
                     "path": land, "max_changes": args.max_changes,
                     "follow": {"poll_ms": 200,
                                "idle_timeout_ms": 8000}})
            events_seen = 0
            terminal = None
            while True:
                r = cl.recv()
                if r is None:
                    break
                if not r.get("ok"):
                    violate(f"{cube}: error mid-stream {r}")
                    break
                if "event" not in r:
                    terminal = r
                    break
                changes += r["result"]["changes"]
                toks.append(r["result"]["resume_token"])
                batches += 1
                events_seen += 1
                if style == "abrupt" and events_seen >= 3:
                    break  # drop the socket mid-stream
            cl.close()
            if terminal is not None and writer_done.is_set():
                break
            reconnects += 1
            if style != "abrupt":
                time.sleep(0.3)
        check_tokens(cube, toks)
        results[cube] = {"style": style, "changes": changes,
                         "batches": batches, "reconnects": reconnects,
                         "final_token": toks[-1] if toks else None}

    def chunky_consumer(cube: str):
        """No follow: a fresh connection every request, 2 batches per
        subscribe — the disconnect-and-resume path."""
        changes = batches = conns = 0
        toks: list = []
        while True:
            cl = Client(port)
            conns += 1
            cl.send({"id": 1, "op": "subscribe", "cube": cube,
                     "path": land, "max_changes": args.max_changes,
                     "max_batches": 2})
            got = 0
            while True:
                r = cl.recv()
                if r is None or not r.get("ok"):
                    violate(f"{cube}: stream error {r}")
                    break
                if "event" not in r:
                    break
                changes += r["result"]["changes"]
                toks.append(r["result"]["resume_token"])
                batches += 1
                got += 1
            cl.close()
            if got == 0:
                if writer_done.is_set():
                    break
                time.sleep(0.4)
        check_tokens(cube, toks)
        results[cube] = {"style": "chunky", "changes": changes,
                         "batches": batches, "connections": conns,
                         "final_token": toks[-1] if toks else None}

    def shared_writer(cube: str):
        """Direct pump_cdc against the cube a follow subscriber also
        consumes — combined application must be exactly-once."""
        changes = 0
        cl = Client(port)
        while True:
            r = cl.rpc({"id": 1, "op": "pump_cdc", "cube": cube,
                        "path": land, "max_changes": args.max_changes,
                        "max_batches": 1})
            if not r["ok"]:
                violate(f"shared pump error {r}")
                break
            changes += r["result"]["changes"]
            if r["result"]["batches"] == 0:
                # only probe the (Spark-job) drain check while idle
                if writer_done.is_set() and changes_done(cube):
                    break
                time.sleep(0.4)
        cl.close()
        results["shared_pump"] = {"style": "pump", "changes": changes}

    def changes_done(cube: str) -> bool:
        from mongo_olap_spark.sources.adapters import FileChangeStreamSource

        tok = engine.catalog.last_batch_id(cube, "pump")
        # max_changes=None: token = max(change_id) — no TakeOrdered
        _, latest = FileChangeStreamSource(land).read_change_stream(
            spark, resume_after=None, max_changes=None)
        return latest is not None and tok >= latest

    stop_aux = threading.Event()
    reader_stats = {"ok": 0}

    def reader():
        cl = Client(port)
        i = 0
        while not stop_aux.is_set():
            c = cubes[i % len(cubes)]
            i += 1
            r = cl.rpc({"id": 1, "op": "query", "cube": c,
                        "group_by": ["et"], "measures": ["n", "total"]})
            if not r["ok"]:
                violate(f"reader error on {c}: {r}")
            else:
                reader_stats["ok"] += 1
            time.sleep(0.15)
        cl.close()

    vacuums = {"n": 0}

    def vacuumer():
        while not stop_aux.is_set():
            # soak_evolve is excluded: the evolve phase's pinned
            # time-travel assertion needs the PRE-evolve snapshot
            # alive (vacuum reclaiming it is a legitimate, separately
            # tested refusal — not what this soak measures)
            for c in cubes:
                if c == "soak_evolve":
                    continue
                try:
                    engine.catalog.vacuum(c, min_age_s=10)
                    vacuums["n"] += 1
                except Exception as e:  # noqa: BLE001
                    violate(f"vacuum {c}: {e}")
            time.sleep(3)

    evolve_stats: dict = {}

    def evolver():
        """Mid-stream spec evolution over the wire, while the cube's
        follower tails and its pumps run."""
        while (landed["segments"] < max(2, args.segments // 2)
               and not writer_done.is_set()):
            time.sleep(0.3)
        # the pinned-read assertion needs a PRE-evolve snapshot with
        # real cells: wait for the follower to have applied >=1 batch
        # (create=1, zero-refresh=2, first pump commit=3)
        t_wait = time.time()
        while (engine.catalog.current_version("soak_evolve") < 3
               and time.time() - t_wait < 60):
            time.sleep(0.3)
        cl = Client(port)
        pre = engine.catalog.current_version("soak_evolve")
        r = cl.rpc({"id": 1, "op": "evolve_cube", "name": "soak_evolve",
                    "drop": ["avg"]})
        if not r["ok"]:
            violate(f"evolve_cube failed mid-stream: {r}")
            cl.close()
            return
        evolve_stats.update(
            pre_version=pre, post_version=r["result"]["version"],
            measures=r["result"]["measures"],
            at_segment=landed["segments"])
        if "avg" in r["result"]["measures"]:
            violate("evolve reported 'avg' still present")
        q = cl.rpc({"id": 2, "op": "query", "cube": "soak_evolve",
                    "group_by": ["et"], "measures": ["n", "total"]})
        if not q["ok"]:
            violate(f"post-evolve surviving measures refused: {q}")
        qa = cl.rpc({"id": 3, "op": "query", "cube": "soak_evolve",
                     "group_by": ["et"], "measures": ["avg"]})
        if qa.get("ok"):
            violate("dropped measure 'avg' still served post-evolve")
        elif "avg" not in str(qa.get("error", "")):
            violate(f"dropped-measure refusal does not name it: {qa}")
        tt = cl.rpc({"id": 4, "op": "query", "cube": "soak_evolve",
                     "as_of": pre, "group_by": ["et"],
                     "measures": ["avg"]})
        if not tt.get("ok"):
            violate(f"time travel to pre-evolve 'avg' failed: {tt}")
        else:
            evolve_stats["pinned_avg_groups"] = len(tt["result"]["rows"])
            if pre >= 3 and not tt["result"]["rows"]:
                violate("pinned pre-evolve read returned no groups "
                        "despite applied batches")
        cl.close()

    main_threads = [
        threading.Thread(target=land_segments),
        threading.Thread(target=follow_consumer,
                         args=("soak_follow", "follow")),
        threading.Thread(target=follow_consumer,
                         args=("soak_abrupt", "abrupt")),
        threading.Thread(target=chunky_consumer, args=("soak_chunky",)),
        threading.Thread(target=follow_consumer,
                         args=("soak_shared", "follow")),
        threading.Thread(target=shared_writer, args=("soak_shared",)),
        threading.Thread(target=follow_consumer,
                         args=("soak_evolve", "follow")),
        threading.Thread(target=evolver),
    ]
    aux_threads = [
        threading.Thread(target=reader, daemon=True),
        threading.Thread(target=reader, daemon=True),
        threading.Thread(target=vacuumer, daemon=True),
    ]
    for t in main_threads + aux_threads:
        t.start()
    deadline = time.time() + 600
    for t in main_threads:
        t.join(timeout=max(1.0, deadline - time.time()))
        if t.is_alive():
            violate(f"stall: {t} did not finish within the wall budget")
    stop_aux.set()

    # (a) exactly-once per clean subscriber — the evolved cube's
    # follower included: the mid-stream spec change must not cost or
    # duplicate a batch
    for c in ("soak_follow", "soak_chunky", "soak_evolve"):
        if results.get(c, {}).get("changes") != total_changes:
            violate(f"{c}: consumed {results.get(c, {}).get('changes')} "
                    f"of {total_changes} changes")
    # (b) shared cube: combined exactly-once
    shared = (results.get("soak_shared", {}).get("changes", 0)
              + results.get("shared_pump", {}).get("changes", 0))
    if shared != total_changes:
        violate(f"shared cube applied {shared} != landed {total_changes}")
    # abrupt consumer: torn pushes may undercount its own tally — the
    # STATE assertion below is its exactly-once proof; its watermark
    # must still have drained everything
    if not changes_done("soak_abrupt"):
        violate("soak_abrupt: watermark below the landed stream head")

    # (c) final state == closed-form net, every cube
    from pyspark.sql import functions as F

    net = events.filter(F.col("event_id") % 10 != 9)
    want = {r["et"]: (r["n"], round(r["total"], 2)) for r in
            net.groupBy(F.col("event_type").alias("et"))
            .agg(F.count(F.lit(1)).alias("n"),
                 F.sum("value").alias("total")).collect()}
    final = Client(port)
    for c in cubes:
        r = final.rpc({"id": 1, "op": "query", "cube": c,
                       "group_by": ["et"], "measures": ["n", "total"]})
        if not r["ok"]:
            violate(f"final query {c}: {r}")
            continue
        got = {row[0]: (row[1], round(float(row[2]), 2))
               for row in r["result"]["rows"]}
        if got != want:
            violate(f"{c}: final state != closed-form net "
                    f"(got {len(got)} groups)")
    final.rpc({"id": 99, "op": "shutdown"})
    final.close()

    out = {
        "segments": landed["segments"],
        "total_changes": total_changes,
        "consumers": results,
        "reader_queries_ok": reader_stats["ok"],
        "vacuum_passes": vacuums["n"],
        "evolve": evolve_stats,
        "violations": VIOLATIONS,
        "wall_s": round(time.time() - t_start, 1),
    }
    with open(os.path.join(REPO, args.out), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))
    return 1 if VIOLATIONS else 0


if __name__ == "__main__":
    sys.exit(main())
