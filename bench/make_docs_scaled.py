#!/usr/bin/env python
"""Documents-ONLY scaled build — the composition step for corpus probes
that read nothing but the documents table (q130's flagship pipeline, the
dup-rate family), where building the full TPC-H side (600M lineitem rows
at x1000) would waste an hour of probe budget on tables the entry never
touches.

Usage: python bench/make_docs_scaled.py <src_dir> <out_dir> <k> [salt]

Scaling model is IDENTICAL to bench/make_scaled_sf.py's documents rule
(doc_id shift + salt-keyed INJECTIVE per-copy vocab rename, salt
defaulting to the output dir basename so composed levels stay injective
— see make_scaled_sf.build for the round-10 collision this fixes);
only the table set differs. <src_dir> needs just documents.parquet.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, functions as F


def build_docs(spark, src: str, out: str, k: int, salt: str | None = None) -> int:
    salt = salt if salt is not None else os.path.basename(out.rstrip("/"))
    docs = spark.read.parquet(os.path.join(src, "documents.parquet"))
    max_id = docs.agg(F.max("doc_id")).first()[0]

    def doc_copy(df: DataFrame, i: int) -> DataFrame:
        o = df.withColumn("doc_id", F.col("doc_id") + F.lit(i * (max_id + 1)))
        if i == 0:
            return o
        renamed = F.array_join(
            F.transform(
                F.split(F.col("text"), " "),
                lambda x: F.concat(x, F.lit(f"_{salt}c{i}")),
            ),
            " ",
        )
        return o.withColumn("text", renamed).withColumn("n_chars", F.length("text"))

    parts = [doc_copy(docs, i) for i in range(k)]
    scaled = parts[0]
    for p in parts[1:]:
        scaled = scaled.unionByName(p)
    dst = os.path.join(out, "documents.parquet")
    scaled.write.mode("overwrite").parquet(dst)
    return spark.read.parquet(dst).count()


def main() -> None:
    src, out, k = sys.argv[1], sys.argv[2], int(sys.argv[3])
    salt = sys.argv[4] if len(sys.argv) > 4 else None
    from s4_spark.session import get_spark

    spark = get_spark(app_name="make_docs_scaled", cpus=16)
    n = build_docs(spark, src, out, k, salt=salt)
    print(f"documents: {n} rows -> {out}")


if __name__ == "__main__":
    main()
