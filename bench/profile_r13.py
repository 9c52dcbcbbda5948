#!/usr/bin/env python
"""Round-13 optimization profiler (guide §1): per headline/extended query,
split wall-clock into (build = plan construction incl. driver-side work,
run1 = cold noop execution, run2 = warm noop execution), count Spark jobs,
and dump .explain("formatted") to plans/r13/<name>_<tag>.txt.

Usage: python bench/profile_r13.py [tag] [query ...]
  tag defaults to "before"; with no query args profiles HEADLINE+EXTENDED.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from s4_spark.queries import REGISTRY
from s4_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
PLANS_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r13"
)


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    if len(sys.argv) > 2:
        names = sys.argv[2:]
    else:
        import importlib.util

        spec = importlib.util.spec_from_file_location(
            "benchmod",
            os.path.join(
                os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "bench.py"
            ),
        )
        benchmod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(benchmod)
        names = benchmod.HEADLINE + benchmod.EXTENDED

    os.makedirs(PLANS_DIR, exist_ok=True)
    spark = get_spark(app_name="s4_profile_r13", cpus=CPUS)
    spark.read.parquet(os.path.join(SF_DIR, "region.parquet")).count()
    tracker = spark.sparkContext.statusTracker()

    out: dict[str, dict] = {}
    for name in names:
        fn = REGISTRY[name].fn
        spark.catalog.clearCache()
        spark.sparkContext.setJobDescription(f"{name}:{tag}")
        j0 = tracker.getJobIdsForGroup(None)
        t0 = time.time()
        df = fn(spark, SF_DIR)
        t1 = time.time()
        df.write.mode("overwrite").format("noop").save()
        t2 = time.time()
        df2 = fn(spark, SF_DIR)
        t3 = time.time()
        df2.write.mode("overwrite").format("noop").save()
        t4 = time.time()
        jobs = len(tracker.getJobIdsForGroup(None)) - len(j0)
        rec = {
            "build": round(t1 - t0, 3),
            "run1": round(t2 - t1, 3),
            "build2": round(t3 - t2, 3),
            "run2": round(t4 - t3, 3),
            "jobs_total": jobs,
        }
        out[name] = rec
        try:
            p = df2._sc._jvm.PythonSQLUtils.explainString(
                df2._jdf.queryExecution(), "formatted"
            )
            with open(os.path.join(PLANS_DIR, f"{name}_{tag}.txt"), "w") as f:
                f.write(p)
            rec["exchanges"] = p.count("Exchange") - p.count("ReusedExchange")
            rec["reused"] = p.count("ReusedExchange")
            rec["python_nodes"] = (
                p.count("BatchEvalPython")
                + p.count("ArrowEvalPython")
                + p.count("MapInPandas")
                + p.count("MapInArrow")
                + p.count("FlatMapGroupsInPandas")
                + p.count("FlatMapGroupsInArrow")
            )
        except Exception as e:  # plan capture must never kill the profile
            rec["plan_err"] = str(e)[:200]
        print(json.dumps({name: rec}), flush=True)
        spark.sparkContext.setJobDescription(None)

    with open(os.path.join(PLANS_DIR, f"profile_{tag}.json"), "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
