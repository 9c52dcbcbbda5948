#!/usr/bin/env python
"""Events-ONLY scaled build — the composition step for event-analytics
probes (windowed funnels, sessionization, streaks, CUSUM, gap-fill,
stream rigs) that read nothing but the events table; mirrors
bench/make_docs_scaled.py / make_emb_scaled.py for the third table the
probe program scales independently.

Usage: python bench/make_events_scaled.py <src_dir> <out_dir> <k>

Scaling model is IDENTICAL to bench/make_scaled_sf.py's events rule:
k copies with event_id/user_id shifted by i * (max+1) per key domain —
k-times MORE USERS over the SAME time range, so per-bucket volumes grow
like a real event feed while PER-USER history (the window-partition /
session-state grain) stays constant. No salt is needed: key-domain
shifts compose injectively by construction (shift moduli grow with
each level's max key). <src_dir> needs just events.parquet.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def build_events(spark, src: str, out: str, k: int) -> int:
    ev = spark.read.parquet(os.path.join(src, "events.parquet"))
    max_event = ev.agg(F.max("event_id")).first()[0]
    max_user = ev.agg(F.max("user_id")).first()[0]
    parts = [
        ev.withColumn("event_id", F.col("event_id") + F.lit(i * (max_event + 1)))
        .withColumn("user_id", F.col("user_id") + F.lit(i * (max_user + 1)))
        for i in range(k)
    ]
    scaled = parts[0]
    for p in parts[1:]:
        scaled = scaled.unionByName(p)
    dst = os.path.join(out, "events.parquet")
    scaled.write.mode("overwrite").parquet(dst)
    return spark.read.parquet(dst).count()


def main() -> None:
    src, out, k = sys.argv[1], sys.argv[2], int(sys.argv[3])
    from s4_spark.session import get_spark

    spark = get_spark(app_name="make_events_scaled", cpus=16)
    n = build_events(spark, src, out, k)
    print(f"events: {n} rows -> {out}")


if __name__ == "__main__":
    main()
