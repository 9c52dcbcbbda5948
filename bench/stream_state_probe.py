#!/usr/bin/env python
"""Streaming-STATE family scale probe (VERDICT r9 item 3) — the heavy
family that had no third-decade row: runs the stateful rigs against a
scaled SF dir and records, per entry, wall-clock AND the state store's
maximum ``numRowsTotal`` across every state operator of every query the
entry runs (captured with a StreamingQueryListener, so no rig needs to
expose its query handle).

Usage: python bench/stream_state_probe.py [sf_dir]
           [--only name1,name2] [--out results.json]

Default entry set = the map-state/funnel/changelog/TTL/chained rigs the
r9 verdict names; timings land in SCALE.md's measured-scaling tables
with the ×10 (full sweep) and ×100/×1000 (this instrument) decades.
State-size capture matters as much as time here: a stateful operator
whose numRowsTotal grows with STREAM LIFETIME instead of open-window /
open-session count is the 100 TB failure mode (unbounded state → OOM on
a real cluster), and wall-clock alone can look linear while state
quietly accumulates.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
import traceback
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql.streaming import StreamingQueryListener

from s4_spark.queries import REGISTRY
from s4_spark.session import get_spark

DEFAULT_ENTRIES = [
    "q234_streaming_funnel",
    "q235_streaming_funnel_reordered",
    "q241_transform_with_map_state_timers",
    "q251_rocksdb_changelog_restart",
    "q252_state_ttl_eviction",
    "q258_chained_streaming_aggs",
    "q269_join_then_window_chain",
    # r13: the last streaming-state entry with no x1000 row (q251/q258
    # gained theirs in r10; VERDICT r12 item 6)
    "q273_multi_watermark_policy",
]


class _StateCapture(StreamingQueryListener):
    """Records the max numRowsTotal per state operator across every
    progress event observed while attached. Listener dispatch is
    asynchronous — callers settle briefly before reading."""

    def __init__(self) -> None:
        self.ops: dict[str, int] = defaultdict(int)

    def onQueryStarted(self, event) -> None:
        pass

    def onQueryProgress(self, event) -> None:
        for op in event.progress.stateOperators:
            name = op.operatorName or "state"
            self.ops[name] = max(self.ops[name], op.numRowsTotal)

    def onQueryIdle(self, event) -> None:
        pass

    def onQueryTerminated(self, event) -> None:
        pass


class _BatchProfile(StreamingQueryListener):
    """Per-micro-batch profile: (query, batchId) -> input rows, trigger
    execution ms, state rows/bytes. Lets a probe attribute an entry's
    wall-clock to its phases (e.g. q235: append-only data batches vs
    the watermark-release fold batch) instead of guessing from totals."""

    def __init__(self) -> None:
        self.batches: list[dict] = []

    def onQueryStarted(self, event) -> None:
        pass

    def onQueryProgress(self, event) -> None:
        p = event.progress
        self.batches.append(
            {
                "name": p.name,
                "batchId": p.batchId,
                "inputRows": p.numInputRows,
                "ms": (p.durationMs or {}).get("triggerExecution"),
                "stateRows": max(
                    (op.numRowsTotal for op in p.stateOperators), default=0
                ),
                "stateBytes": max(
                    (op.memoryUsedBytes for op in p.stateOperators), default=0
                ),
            }
        )

    def onQueryIdle(self, event) -> None:
        pass

    def onQueryTerminated(self, event) -> None:
        pass


def q269_chunked_probe(spark, sf_dir: str, chunks: int) -> dict:
    """Close q269's at-scale state contract with a MEASURED row
    (VERDICT r10 item 3). The registry entry's availableNow rig replays
    the whole feed as ONE micro-batch, so the stream-stream join pays
    worst-case state by construction (39.9M rows at x1000) — the
    watermark only advances BETWEEN batches. This rig replays the same
    feed through the same `_q269_chain` plan in `chunks` time-ordered
    micro-batches (repartitionByRange on ts -> one file per range;
    mtimes bumped in range order because the file source processes
    files in modification-time order; maxFilesPerTrigger=1), so the
    watermark advances per chunk and the listener observes the real
    interval-bounded join state: ~2 chunks of feed + the 10-minute
    interval population, orders of magnitude under worst case."""
    import glob

    from pyspark.sql import functions as F

    from s4_spark.catalog import table
    from s4_spark.queries.streaming import _q269_chain
    from s4_spark.streaming.rigs import ntz_as_utc_instant, scratch

    ev = table(spark, sf_dir, "events")
    if ev.schema["ts"].dataType.typeName() == "timestamp_ntz":
        ev = ev.withColumn("ts", ntz_as_utc_instant("ts"))
    feed_rows = ev.filter(F.col("event_type").isin("click", "purchase")).count()

    landing = scratch(f"q269chunked_{os.path.basename(sf_dir.rstrip('/'))}")
    ev.repartitionByRange(chunks, "ts").write.mode("overwrite").parquet(landing)
    parts = sorted(glob.glob(os.path.join(landing, "part-*.parquet")))
    base = time.time() - len(parts) - 10
    for i, p in enumerate(parts):
        os.utime(p, (base + i, base + i))

    cap = _StateCapture()
    spark.streams.addListener(cap)
    try:
        stream = (
            spark.readStream.schema(ev.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(landing)
        )
        name = f"s4_q269probe_{os.getpid()}"
        t0 = time.time()
        q = (
            _q269_chain(stream)
            .writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .trigger(availableNow=True)
            .option("checkpointLocation", scratch(f"ckpt_{name}"))
            .start()
        )
        q.awaitTermination()
        sec = round(time.time() - t0, 2)
        n_out = spark.table(name).count()
        time.sleep(2.0)  # async listener dispatch
    finally:
        spark.streams.removeListener(cap)

    join_ops = {k: v for k, v in cap.ops.items() if "join" in k.lower()}
    join_max = max(join_ops.values(), default=0)
    res = {
        "sec": sec,
        "chunks": len(parts),
        "feed_rows_click_purchase": feed_rows,
        "out_rows": n_out,
        "state_ops": dict(sorted(cap.ops.items())),
        "join_state_max": join_max,
        "join_state_vs_worst_case": round(join_max / feed_rows, 4)
        if feed_rows
        else None,
    }
    # the measured contract: chunked replay keeps join state an order
    # of magnitude (at least) under the whole-feed worst case
    assert join_max < feed_rows / 10, (
        f"join state {join_max} not interval-bounded vs feed {feed_rows}"
    )
    return res


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("sf_dir", nargs="?", default="/tmp/s4_scaleprobe/sf10")
    ap.add_argument("--only", default=None)
    ap.add_argument("--out", default=None)
    ap.add_argument(
        "--batch-profile",
        action="store_true",
        help="also record a per-micro-batch profile (input rows, trigger "
        "ms, state rows/bytes) for each probed entry",
    )
    ap.add_argument(
        "--q269-chunked",
        type=int,
        default=None,
        metavar="K",
        help="run ONLY the chunked q269 state-contract rig with K "
        "time-ordered micro-batches (see q269_chunked_probe)",
    )
    ap.add_argument(
        "--cpus", type=int, default=int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    )
    ap.add_argument(
        "--shuffle-partitions",
        type=int,
        default=None,
        help="override spark.sql.shuffle.partitions for this probe run. "
        "Stateful operators pin their partition count at the first batch "
        "and AQE is disabled for them, so the session default (= cpus) "
        "fixes per-task state-op input share at corpus/cpus — which at "
        "x1000 on one JVM exceeds the heap (q241 OOM'd at 100M events). "
        "A real cluster bounds that share by executor width; this flag "
        "is the local analog.",
    )
    args = ap.parse_args()

    names = list(DEFAULT_ENTRIES)
    if args.only:
        names = [n for n in args.only.split(",") if n]
    unknown = [n for n in names if n not in REGISTRY]
    if unknown:
        sys.exit(f"not in the registry: {unknown}")

    extra = (
        {"spark.sql.shuffle.partitions": str(args.shuffle_partitions)}
        if args.shuffle_partitions
        else None
    )
    spark = get_spark(
        app_name="s4_stream_state_probe", cpus=args.cpus, extra_conf=extra
    )
    if args.q269_chunked:
        res = q269_chunked_probe(spark, args.sf_dir, args.q269_chunked)
        out = {"sf_dir": args.sf_dir, "q269_chunked": res}
        line = json.dumps(out)
        print(line)
        if args.out:
            with open(args.out, "w") as f:
                f.write(line + "\n")
        return
    results: dict[str, dict] = {}
    for name in names:
        spark.catalog.clearCache()
        cap = _StateCapture()
        spark.streams.addListener(cap)
        prof = None
        if args.batch_profile:
            prof = _BatchProfile()
            spark.streams.addListener(prof)
        t0 = time.time()
        try:
            REGISTRY[name].fn(spark, args.sf_dir).write.mode("overwrite").format(
                "noop"
            ).save()
            sec = round(time.time() - t0, 2)
            time.sleep(2.0)  # let async listener dispatch settle
            results[name] = {
                "sec": sec,
                "state_rows_max": max(cap.ops.values(), default=0),
                "state_ops": dict(sorted(cap.ops.items())),
            }
            if prof is not None:
                results[name]["batches"] = prof.batches
            print(f"{name}: {sec}s state_max={results[name]['state_rows_max']}",
                  file=sys.stderr)
        except Exception:
            results[name] = {"sec": None, "error": traceback.format_exc(limit=3)}
            print(f"FAIL {name}", file=sys.stderr)
            traceback.print_exc()
        finally:
            spark.streams.removeListener(cap)
            if prof is not None:
                spark.streams.removeListener(prof)

    out = {"sf_dir": args.sf_dir, "results": results}
    line = json.dumps(out)
    print(line)
    if args.out:
        with open(args.out, "w") as f:
            f.write(line + "\n")


if __name__ == "__main__":
    main()
