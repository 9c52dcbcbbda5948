#!/usr/bin/env python
"""r14 item 2 instrument: A/B the stream-stream replay rig mechanics
(q165_stream_stream_outer_join, q106_stream_stream_join) — the two wall
dominators of the driver's correctness sim.

Variants (semantics untouched — same build_query, same phases, same
RocksDB provider):
  base    : tree as-is
  sp4/sp2 : spark.sql.shuffle.partitions scoped to the rig invocation
            (set before the entry fn, restored after) — fewer state-store
            partitions means fewer RocksDB open/commit cycles per
            micro-batch (8 partitions x 4 join stores x ~3 batches each)

Usage: python bench/r14_rig_probe.py --sf /root/testdata/sf0.01 --reps 2
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ENTRIES = ["q165_stream_stream_outer_join", "q106_stream_stream_join"]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--cpus", type=int, default=8)
    ap.add_argument("--variants", default="base,sp4,sp2")
    args = ap.parse_args()

    from s4_spark.queries import REGISTRY
    from s4_spark.session import get_spark

    spark = get_spark(app_name="r14_rig_probe", cpus=args.cpus)
    conf_key = "spark.sql.shuffle.partitions"

    def run(name: str, nparts: int | None) -> tuple[float, int]:
        saved = spark.conf.get(conf_key)
        try:
            if nparts is not None:
                spark.conf.set(conf_key, str(nparts))
            t0 = time.time()
            rows = len(REGISTRY[name].fn(spark, args.sf).collect())
            return time.time() - t0, rows
        finally:
            spark.conf.set(conf_key, saved)

    variants = {"base": None, "sp4": 4, "sp2": 2, "sp1": 1}
    out: dict = {}
    for name in ENTRIES:
        out[name] = {}
        for v in args.variants.split(","):
            times, rowss = [], []
            for _ in range(args.reps):
                spark.sparkContext.setJobDescription(f"rig:{name}:{v}")
                dt, rows = run(name, variants[v])
                times.append(round(dt, 2))
                rowss.append(rows)
            out[name][v] = {"times": times, "rows": rowss}
            print(name, v, times, "rows", rowss, flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
