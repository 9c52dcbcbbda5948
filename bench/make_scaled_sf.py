#!/usr/bin/env python
"""Build a k-times scaled copy of a test SF directory for scale probes.

Usage: python bench/make_scaled_sf.py <src_sf_dir> <out_dir> <k>

The driver ships sf0.001/0.01/0.1 only; the 100 TB mandate needs
evidence the headline plans keep their shape ANOTHER decade (or two) up,
so this builds an sf1/sf10-equivalent from sf0.1 with per-table rules
that preserve each operator family's workload *character* (dup-rate,
join fan-in, group cardinality growth) rather than naively duplicating
rows:

- region/nation: unchanged (TPC-H holds dimensions fixed across SF).
- supplier/part/customer/orders/lineitem: k copies with every key
  column shifted by i * (max_key + 1) per key domain, exactly how a
  bigger TPC-H SF grows (more entities, same distributions; referential
  integrity preserved because both sides of every FK shift together).
- events: k copies, event_id/user_id shifted -> k-times users over the
  same time range, so per-bucket volumes and per-user sessions grow the
  way real event feeds grow.
- documents: doc_id shifted; copy i > 0 gets an INJECTIVE VOCAB RENAME
  (every token suffixed `_<salt>c<i>` — the salt, defaulting to the
  output dir basename and overridable as a 4th CLI arg, keeps the
  rename injective across COMPOSED build levels; see build()'s comment
  for the round-10 collision this fixes). Shingle equality is invariant under
  injective renaming, so each copy reproduces the source's internal
  near-dup structure exactly while sharing zero shingles/tokens across
  copies: dup-rate stays constant as the corpus grows -- the honest
  model for a bigger crawl. n_chars is recomputed (the source keeps
  n_chars == length(text)).
- embeddings: vec_id shifted; copy i applies an ORTHOGONAL transform
  (rotate coordinates by i mod dim, then a sign pattern drawn from the
  high bits of i for k > dim) -- distances/cosines within a copy are
  exactly preserved, cross-copy geometry is scrambled, so ANN index
  selectivity and topk tie structure scale like a genuinely larger
  corpus instead of k exact duplicates of every vector.

Outputs <out_dir>/<table>.parquet directories readable by the same
catalog loaders the queries use. Probe results are recorded in SCALE.md
("Measured scaling"); run bench.py against the output via
SPARK_GRAFT_SF_DIR=<out_dir>.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, functions as F

PLAIN = ("region", "nation")


def _shift(df: DataFrame, i: int, shifts: dict[str, int]) -> DataFrame:
    out = df
    for c, m in shifts.items():
        if c in out.columns:
            out = out.withColumn(c, F.col(c) + F.lit(i * (m + 1)))
    return out


def _copies(df: DataFrame, k: int, fn) -> DataFrame:
    parts = [fn(df, i) for i in range(k)]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def build(spark, src: str, out: str, k: int, salt: str | None = None) -> None:
    # ``salt`` keys the per-copy text rename and embedding transform so
    # COMPOSED builds (sf1 → sf10 → sf100) stay injective across levels.
    # Round-10 finding: without it, copy paths with the same non-zero
    # index subsequence collide — at ×1000 composed in three ×10 levels,
    # paths (1,0,0)/(0,1,0)/(0,0,1) all rename tokens `w → w_c1`, so 270
    # of the C(1000,2) copy pairs were token-IDENTICAL corpora and the
    # documents table carried 1,488,240 cross-copy true near-dup pairs
    # (the q120 recall certification derived and matched that number
    # exactly — see SCALE.md). Harder-than-declared dup-rate is
    # conservative for timing probes but wrong for the "dup-rate stays
    # constant" model; distinct salts per level (default: the output
    # dir's basename) restore it.
    salt = salt if salt is not None else os.path.basename(out.rstrip("/"))
    read = lambda t: spark.read.parquet(os.path.join(src, f"{t}.parquet"))
    write = lambda df, t: df.write.mode("overwrite").parquet(
        os.path.join(out, f"{t}.parquet")
    )

    for t in PLAIN:
        write(read(t), t)

    # one max per key domain, shared by every table referencing it
    maxes = {
        "supp": read("supplier").agg(F.max("s_suppkey")).first()[0],
        "part": read("part").agg(F.max("p_partkey")).first()[0],
        "cust": read("customer").agg(F.max("c_custkey")).first()[0],
        "ord": read("orders").agg(F.max("o_orderkey")).first()[0],
        "event": read("events").agg(F.max("event_id")).first()[0],
        "user": read("events").agg(F.max("user_id")).first()[0],
        "doc": read("documents").agg(F.max("doc_id")).first()[0],
        "vec": read("embeddings").agg(F.max("vec_id")).first()[0],
    }

    domains = {
        "supplier": {"s_suppkey": maxes["supp"]},
        "part": {"p_partkey": maxes["part"]},
        "customer": {"c_custkey": maxes["cust"]},
        "orders": {"o_orderkey": maxes["ord"], "o_custkey": maxes["cust"]},
        "lineitem": {
            "l_orderkey": maxes["ord"],
            "l_partkey": maxes["part"],
            "l_suppkey": maxes["supp"],
        },
        "events": {"event_id": maxes["event"], "user_id": maxes["user"]},
    }
    for t, shifts in domains.items():
        write(_copies(read(t), k, lambda df, i: _shift(df, i, shifts)), t)

    def doc_copy(df: DataFrame, i: int) -> DataFrame:
        out = df.withColumn("doc_id", F.col("doc_id") + F.lit(i * (maxes["doc"] + 1)))
        if i == 0:
            return out
        # salt makes the suffix level-unique: `_sf10c1` from one build
        # level can never equal `_sf100c1` from the next, so composing
        # builds keeps zero cross-copy token overlap (copy 0 stays
        # un-renamed, which is safe once salts differ per level)
        renamed = F.array_join(
            F.transform(
                F.split(F.col("text"), " "),
                lambda x: F.concat(x, F.lit(f"_{salt}c{i}")),
            ),
            " ",
        )
        return out.withColumn("text", renamed).withColumn(
            "n_chars", F.length("text")
        )

    write(_copies(read("documents"), k, doc_copy), "documents")

    dim = len(read("embeddings").select("embedding").first()[0])

    import hashlib

    def emb_copy(df: DataFrame, i: int) -> DataFrame:
        out = df.withColumn("vec_id", F.col("vec_id") + F.lit(i * (maxes["vec"] + 1)))
        if i == 0:
            return out
        # Rotation step and sign pattern are keyed by (salt, i): plain
        # rotate-by-i composed across levels collides exactly like the
        # token suffixes (rotate i then j == rotate j then i == rotate
        # i+j, so paths with equal index sums were coordinate-identical
        # vectors). A salt-keyed odd step de-aliases rotation amounts
        # across levels and the per-copy sign flip (still orthogonal —
        # within-copy geometry exact) makes a residual rotation
        # collision across levels vanishingly unlikely instead of
        # structural.
        h = int.from_bytes(
            hashlib.md5(f"{salt}:{i}".encode()).digest()[:8], "big"
        )
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
        return out.withColumn("embedding", rotated)

    write(_copies(read("embeddings"), k, emb_copy), "embeddings")


def main() -> None:
    src, out, k = sys.argv[1], sys.argv[2], int(sys.argv[3])
    salt = sys.argv[4] if len(sys.argv) > 4 else None
    from s4_spark.session import get_spark

    spark = get_spark(app_name="make_scaled_sf", cpus=16)
    build(spark, src, out, k, salt=salt)
    for t in PLAIN + tuple(
        ["supplier", "part", "customer", "orders", "lineitem", "events",
         "documents", "embeddings"]
    ):
        n = spark.read.parquet(os.path.join(out, f"{t}.parquet")).count()
        print(f"{t}: {n} rows")


if __name__ == "__main__":
    main()
