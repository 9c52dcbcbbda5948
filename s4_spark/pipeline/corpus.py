"""Corpus-prep pipeline as a reusable job (the q130 stages, importable):
quality filter → exact dedup → MinHash-LSH near-dup removal. q130 keeps
its own inline copy as the oracle-checked specification; this module is
the OPERATIONAL form the CLI runs over an arbitrary documents directory
(the reference's whole program is one such ingest job, main.go:106-140 —
this is its training-data descendant).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from s4_spark.operators import dedup as D
from s4_spark.operators import text as X


def prepare_corpus(
    docs: DataFrame,
    min_tokens: int = 5,
    max_punct_ratio: float = 0.5,
    jaccard_threshold: float = 0.5,
) -> DataFrame:
    """Returns the cleaned corpus (same schema as input plus the quality
    feature columns). Stages and plan shapes are q130's — see its
    docstring and SCALE.md §B12 for the 100 TB argument per stage."""
    d = X.quality_features(docs).filter(
        (F.col("n_tokens") >= min_tokens)
        & (F.col("punct_ratio") <= max_punct_ratio)
    )
    w = Window.partitionBy(F.sha2("text", 256)).orderBy("doc_id")
    kept = (
        d.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )
    sig = D.with_minhash_signature(D.shingles_exploded(kept, "doc_id"), "doc_id")
    cands = D.lsh_candidate_pairs(sig, "doc_id", bands=24, rows=4).localCheckpoint(
        eager=False
    )
    removed = (
        D.verify_pairs_jaccard(cands, kept, "doc_id")
        .filter(F.col("jac") >= jaccard_threshold)
        .select(F.col("id_b").alias("doc_id"))
        .distinct()
    )
    return kept.join(removed, "doc_id", "left_anti")
