#!/usr/bin/env python
"""r14 item 5 instrument: where should the LSH/CC lineage cut sit?

q148's connected_components() lazily localCheckpoints the symmetrized
edges; that cut's plan->RDD compile covers the WHOLE LSH pipeline
(shingles -> 96-expr minhash agg -> bands -> bucket grouping -> verify),
measured ~1.4 s warm driver time in r13. VERDICT r14 item 5: try cutting
BEFORE pair generation so the big compile covers a smaller subtree (and
the doubled reference inside verify_pairs_jaccard sees a LogicalRDD).

Variants (all produce the identical pair set; lazy cuts only):
  base     : tree as-is
  candcut  : cands.localCheckpoint(eager=False) before verify
  paircut  : verified pairs localCheckpoint(eager=False) before CC
  sigcut   : sig.localCheckpoint(eager=False) before banding
  cand+pair, sig+cand ... combinations via flags

Times the q148-shaped pipeline end-to-end (build + collect) at sf0.1,
several reps, plus q111-shaped (verify only, no CC) for the family view.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def pipeline(spark, sf_dir, cc, *, sigcut=False, candcut=False, paircut=False):
    from s4_spark.operators import dedup as D
    from s4_spark.queries.helpers import ts

    docs = ts(spark, sf_dir, "documents")
    ex = D.shingles_exploded(docs, "doc_id")
    sig = D.with_minhash_signature(ex, "doc_id")
    if sigcut:
        sig = sig.localCheckpoint(eager=False)
    cands = D.lsh_candidate_pairs(sig, "doc_id", bands=24, rows=4)
    if candcut:
        cands = cands.localCheckpoint(eager=False)
    pairs = (
        D.verify_pairs_jaccard(cands, docs, "doc_id")
        .filter(F.col("jac") >= 0.5)
        .select("id_a", "id_b")
    )
    if not cc:
        return pairs
    if paircut:
        pairs = pairs.localCheckpoint(eager=False)
    labels = D.connected_components(pairs)
    return (
        labels.groupBy("label")
        .agg(F.count("*").alias("n_members"))
        .select(
            F.col("label").alias("canonical"),
            "n_members",
            (F.col("n_members") - 1).alias("n_removed"),
        )
        .orderBy("canonical")
    )


VARIANTS = {
    "base": {},
    "sigcut": {"sigcut": True},
    "candcut": {"candcut": True},
    "paircut": {"paircut": True},
    "cand+pair": {"candcut": True, "paircut": True},
    "sig+cand": {"sigcut": True, "candcut": True},
}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--cpus", type=int, default=32)
    ap.add_argument("--variants", default="base,candcut,paircut,cand+pair")
    ap.add_argument("--cc", action="store_true", default=True)
    args = ap.parse_args()

    from s4_spark.session import get_spark

    spark = get_spark(app_name="r14_q148_probe", cpus=args.cpus)
    # warm the reader/codegen paths like bench.py
    warm = spark.read.parquet(os.path.join(args.sf, "region.parquet"))
    warm.count()
    warm.write.mode("overwrite").format("noop").save()

    out: dict = {}
    rowset = {}
    for v in args.variants.split(","):
        kw = VARIANTS[v]
        times = []
        for _ in range(args.reps):
            spark.catalog.clearCache()
            spark.sparkContext.setJobDescription(f"q148probe:{v}")
            t0 = time.time()
            rows = pipeline(spark, args.sf, cc=True, **kw).collect()
            times.append(round(time.time() - t0, 2))
            key = tuple(sorted(map(tuple, rows)))
            rowset.setdefault(v, key)
        out[v] = times
        print(v, times, "rows", len(rowset[v]), flush=True)
    base_rows = rowset.get("base")
    for v, k in rowset.items():
        assert base_rows is None or k == base_rows, f"ROWSET MISMATCH {v}"
    print(json.dumps(out))


if __name__ == "__main__":
    main()
