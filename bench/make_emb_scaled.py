#!/usr/bin/env python
"""Embeddings-ONLY scaled build — the composition step for ANN-family
probes (q112/q113/q128/q129/q162/q170) that read nothing but the
embeddings table, mirroring bench/make_docs_scaled.py for documents.

Usage: python bench/make_emb_scaled.py <src_dir> <out_dir> <k> [salt]

Scaling model is IDENTICAL to bench/make_scaled_sf.py's embeddings rule
(vec_id shift + salt-keyed ORTHOGONAL per-copy transform: rotate by a
salt-derived odd step, then a salt-derived sign flip — within-copy
geometry exact, cross-copy geometry scrambled, so ANN selectivity
scales like a genuinely larger corpus); only the table set differs.
<src_dir> needs just embeddings.parquet.
"""

from __future__ import annotations

import hashlib
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, functions as F


def build_embeddings(spark, src: str, out: str, k: int, salt: str | None = None) -> int:
    salt = salt if salt is not None else os.path.basename(out.rstrip("/"))
    emb = spark.read.parquet(os.path.join(src, "embeddings.parquet"))
    max_id = emb.agg(F.max("vec_id")).first()[0]
    dim = len(emb.select("embedding").first()[0])

    def emb_copy(df: DataFrame, i: int) -> DataFrame:
        o = df.withColumn("vec_id", F.col("vec_id") + F.lit(i * (max_id + 1)))
        if i == 0:
            return o
        h = int.from_bytes(hashlib.md5(f"{salt}:{i}".encode()).digest()[:8], "big")
        step = (h % (dim - 1)) + 1
        r = (i * step) % dim
        rotated = (
            F.concat(
                F.slice(F.col("embedding"), r + 1, dim - r),
                F.slice(F.col("embedding"), 1, r),
            )
            if r
            else F.col("embedding")
        )
        signs = [-1.0 if (h >> (8 + (j % 48))) & 1 else 1.0 for j in range(dim)]
        rotated = F.zip_with(
            rotated,
            F.array(*[F.lit(s) for s in signs]),
            lambda x, s: (x * s).cast("float"),
        )
        return o.withColumn("embedding", rotated)

    parts = [emb_copy(emb, i) for i in range(k)]
    scaled = parts[0]
    for p in parts[1:]:
        scaled = scaled.unionByName(p)
    dst = os.path.join(out, "embeddings.parquet")
    scaled.write.mode("overwrite").parquet(dst)
    return spark.read.parquet(dst).count()


def main() -> None:
    src, out, k = sys.argv[1], sys.argv[2], int(sys.argv[3])
    salt = sys.argv[4] if len(sys.argv) > 4 else None
    from s4_spark.session import get_spark

    spark = get_spark(app_name="make_emb_scaled", cpus=16)
    n = build_embeddings(spark, src, out, k, salt=salt)
    print(f"embeddings: {n} rows -> {out}")


if __name__ == "__main__":
    main()
