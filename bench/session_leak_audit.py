#!/usr/bin/env python
"""Session-contamination audit (round 13): run every registry entry in
ONE long-lived session and diff the session's SQL confs (and the live
Hadoop conf's s3a keys) before/after each entry.

Why this exists: the r13 ×1000 probe caught q251 leaving
``stateStore.rocksdb.changelogCheckpointing.enabled=true`` at session
scope — every later streaming query in the same session silently ran in
changelog mode and a q258 measurement inflated 8× with an unchanged
plan. Any deployment that runs registry entries back-to-back in one
SparkSession (the probe harness, bench.py, a notebook, a real job
server) inherits whatever confs an entry forgets to restore, so "no
entry changes the session it runs in" is a contract worth enforcing
mechanically, not by review.

Exemptions (reported separately, not failures):
- same-value sets: setting a conf to the value it already had
  (providerClass pins for vanilla-session self-sufficiency);
- ``spark.sql.shuffle.partitions`` if restored to its starting value.

Usage: python bench/session_leak_audit.py [sf_dir] [--only a,b] [--out f]
Exit code 1 if any entry leaks a changed conf.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from s4_spark.queries import REGISTRY
from s4_spark.session import get_spark


def sql_confs(spark) -> dict[str, str]:
    """All SET session confs (java map -> dict). getAll returns only
    explicitly-set entries, which is exactly the leak surface — a conf
    never touched never appears, one set-then-unset disappears again."""
    jconf = spark._jsparkSession.conf().getAll()
    it = jconf.iterator()
    out = {}
    while it.hasNext():
        kv = it.next()
        out[kv._1()] = kv._2()
    return out


def hadoop_s3a(spark) -> dict[str, str]:
    hconf = spark._jsc.hadoopConfiguration()
    out = {}
    it = hconf.iterator()
    while it.hasNext():
        e = it.next()
        k = e.getKey()
        if k.startswith("fs.s3a."):
            out[k] = e.getValue()
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("sf_dir", nargs="?", default="/root/testdata/sf0.001")
    ap.add_argument("--only", default=None)
    ap.add_argument("--out", default=None)
    ap.add_argument("--cpus", type=int, default=8)
    args = ap.parse_args()

    names = list(REGISTRY)
    if args.only:
        names = [n for n in args.only.split(",") if n]
    unknown = [n for n in names if n not in REGISTRY]
    if unknown:
        sys.exit(f"not in the registry: {unknown}")

    spark = get_spark(app_name="s4_leak_audit", cpus=args.cpus)
    leaks: dict[str, dict] = {}
    errors: dict[str, str] = {}
    for name in names:
        before = sql_confs(spark)
        before_h = hadoop_s3a(spark)
        try:
            REGISTRY[name].fn(spark, args.sf_dir).collect()
        except Exception:
            errors[name] = traceback.format_exc(limit=2)
            # still check: a crashed entry can leak too
        after = sql_confs(spark)
        after_h = hadoop_s3a(spark)
        diff = {}
        for k in set(before) | set(after):
            b, a = before.get(k), after.get(k)
            if b != a:
                diff[k] = {"before": b, "after": a}
        for k in set(before_h) | set(after_h):
            b, a = before_h.get(k), after_h.get(k)
            if b != a:
                diff["hadoop:" + k] = {"before": b, "after": a}
        if diff:
            leaks[name] = diff
            print(f"LEAK {name}: {json.dumps(diff)}", flush=True)
    result = {
        "sf_dir": args.sf_dir,
        "n": len(names),
        "leaking": leaks,
        "errors": {k: v.splitlines()[-1] for k, v in errors.items()},
    }
    line = json.dumps(result)
    print(line[:1900])
    if args.out:
        with open(args.out, "w") as f:
            f.write(json.dumps(result, indent=1) + "\n")
    if errors:
        sys.exit(2)
    if leaks:
        sys.exit(1)


if __name__ == "__main__":
    main()
