"""Training-data pipeline queries (q131-q157 range) — the corpus-preparation
stages a 100 TB LLM data pipeline runs between raw ingest (the
reference's whole job, /root/reference/main.go:106-140) and tokenized
shards: chunking, deterministic sampling/mixing, sequence packing, PII
redaction, embedding quantization, tf-idf retrieval, benchmark
contamination checks, repetition-based quality signals, semantic dedup.

Every query is a thin aggregation over one operator in
``s4_spark.operators.corpus`` so the oracle checks the operator's full
row-level output (the aggregate hash only matches if every per-row value
matches).
"""

from __future__ import annotations

import os

from pyspark.sql import Window
from pyspark.sql import functions as F

from s4_spark.operators import corpus as C
from s4_spark.operators import dedup as D
from s4_spark.operators import similarity as S
from s4_spark.queries.helpers import ordered_small, davg, sql_davg, t, ts
from s4_spark.queries.registry import query
from s4_spark.scratch import scratch_root

# DuckDB mirror of operators/corpus.hash_bucket (md5-prefix bucket).
_DUCK_HB = "(('0x' || substr(md5(text), 1, 6))::BIGINT % 1000)"


@query(
    "q131_doc_chunking",
    oracle="""
    WITH w AS (SELECT lang, string_split(text, ' ') AS w FROM documents),
    c AS (SELECT lang, len(w) AS n,
                 unnest([i for i in generate_series(1, len(w), 24)]) AS start
          FROM w),
    ch AS (SELECT lang, least(32, n - start + 1) AS chunk_len FROM c)
    SELECT lang, count(*) AS n_chunks,
           CAST(sum(chunk_len) AS BIGINT) AS sum_chunk_tokens,
           CAST(sum(CASE WHEN chunk_len = 32 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_full_chunks
    FROM ch GROUP BY lang ORDER BY lang
    """,
    section="B12-training",
)
def q131(spark, sf_dir):
    """Overlap chunking (32-token windows every 24 tokens) over documents;
    per-language chunk counts and token volumes. The operator emits the
    materialized chunk text; the check aggregates its per-chunk sizes."""
    ch = C.chunk_documents(t(spark, sf_dir, "documents"), chunk_size=32, stride=24)
    return (
        ch.groupBy("lang")
        .agg(
            F.count("*").alias("n_chunks"),
            F.sum("n_chunk_tokens").cast("long").alias("sum_chunk_tokens"),
            F.sum((F.col("n_chunk_tokens") == 32).cast("int"))
            .cast("long")
            .alias("n_full_chunks"),
        )
        # bounded result (one row per language)
        .transform(ordered_small, "lang")
    )


@query(
    "q132_stratified_sample",
    oracle=f"""
    SELECT lang, count(*) AS n_total,
           CAST(sum(CASE WHEN {_DUCK_HB} <
                 (CASE lang WHEN 'en' THEN 500 WHEN 'zh' THEN 100 ELSE 250 END)
                 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
    FROM documents GROUP BY lang ORDER BY lang
    """,
    section="B12-training",
)
def q132(spark, sf_dir):
    """Deterministic stratified sampling: per-language keep rates (en 50%,
    zh 10%, rest 25%) applied via content-hash buckets, so retries and
    re-runs select identical rows — the idempotence property rand()-based
    sampling lacks on a 1000-executor cluster with task retries."""
    d = t(spark, sf_dir, "documents")
    rate = (
        F.when(F.col("lang") == "en", 500)
        .when(F.col("lang") == "zh", 100)
        .otherwise(250)
    )
    kept = C.sample_by_hash(d, "text", rate)
    totals = d.groupBy("lang").agg(F.count("*").alias("n_total"))
    kcounts = kept.groupBy("lang").agg(F.count("*").alias("n_kept"))
    return (
        totals.join(kcounts, "lang", "left")
        .select("lang", "n_total", F.coalesce("n_kept", F.lit(0)).alias("n_kept"))
        # bounded result (one row per language)
        .transform(ordered_small, "lang")
    )


@query(
    "q133_data_mixing",
    oracle=f"""
    WITH tagged AS (
      SELECT CASE WHEN source IN ('src0','src1','src2','src3','src4')
                  THEN 'high' ELSE 'low' END AS mixture,
             CASE WHEN source IN ('src0','src1','src2','src3','src4')
                  THEN 800 ELSE 300 END AS permille,
             len(string_split(text, ' ')) AS n_tokens, text
      FROM documents)
    SELECT mixture, count(*) AS n_kept,
           CAST(sum(n_tokens) AS BIGINT) AS sum_tokens
    FROM tagged WHERE {_DUCK_HB} < permille
    GROUP BY mixture ORDER BY mixture
    """,
    section="B12-training",
)
def q133(spark, sf_dir):
    """Weighted data mixing: two source tiers sampled at different rates
    (80% / 30%) and unioned under a mixture tag — the recipe step that
    upsamples curated sources against web crawl. Built as two hash-sampled
    branches + unionByName, so each branch's rate is independent."""
    d = t(spark, sf_dir, "documents").withColumn(
        "n_tokens", F.size(F.split("text", " "))
    )
    high_srcs = ["src0", "src1", "src2", "src3", "src4"]
    high = C.sample_by_hash(
        d.filter(F.col("source").isin(high_srcs)), "text", F.lit(800)
    ).withColumn("mixture", F.lit("high"))
    low = C.sample_by_hash(
        d.filter(~F.col("source").isin(high_srcs)), "text", F.lit(300)
    ).withColumn("mixture", F.lit("low"))
    return (
        high.unionByName(low)
        .groupBy("mixture")
        .agg(
            F.count("*").alias("n_kept"),
            F.sum("n_tokens").cast("long").alias("sum_tokens"),
        )
        # bounded result (two mixture tiers)
        .transform(ordered_small, "mixture")
    )


@query(
    "q134_sequence_packing",
    oracle="""
    WITH d AS (SELECT lang, doc_id,
                      len(string_split(text, ' ')) AS n_tokens
               FROM documents),
    packed AS (
      SELECT lang, n_tokens,
             CAST(floor((sum(n_tokens) OVER
                 (PARTITION BY lang ORDER BY doc_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               - n_tokens) / 2048.0) AS BIGINT) AS pack_bin
      FROM d)
    SELECT lang, count(DISTINCT pack_bin) AS n_bins, count(*) AS n_docs,
           CAST(sum(n_tokens) AS BIGINT) AS total_tokens
    FROM packed GROUP BY lang ORDER BY lang
    """,
    section="B12-training",
)
def q134(spark, sf_dir):
    """Sequence packing into 2048-token context windows, sharded per
    language (the shard key bounds the sequential window — see
    operators/corpus.pack_sequences for the 100 TB sharding argument)."""
    d = t(spark, sf_dir, "documents").withColumn(
        "n_tokens", F.size(F.split("text", " "))
    )
    packed = C.pack_sequences(d, "lang", "doc_id", "n_tokens", capacity=2048)
    return (
        packed.groupBy("lang")
        .agg(
            F.countDistinct("pack_bin").alias("n_bins"),
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").cast("long").alias("total_tokens"),
        )
        .orderBy("lang")
    )


@query(
    "q135_pii_redaction",
    oracle=r"""
    WITH aug AS (
      SELECT text
             || CASE WHEN doc_id % 7 = 0
                     THEN ' contact user' || doc_id || '@example.com' ELSE '' END
             || CASE WHEN doc_id % 11 = 0
                     THEN ' see https://ex.org/d/' || doc_id ELSE '' END AS text2
      FROM documents),
    red AS (
      SELECT text2,
             regexp_replace(regexp_replace(text2,
               '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
               'https?://[^ ]+', '<URL>', 'g') AS redacted,
             len(regexp_extract_all(text2,
               '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS n_emails,
             len(regexp_extract_all(text2, 'https?://[^ ]+')) AS n_urls
      FROM aug)
    SELECT CAST(sum(CASE WHEN redacted <> text2 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_docs_redacted,
           CAST(sum(n_emails) AS BIGINT) AS n_emails,
           CAST(sum(n_urls) AS BIGINT) AS n_urls,
           CAST(sum(length(text2) - length(redacted)) AS BIGINT) AS chars_delta
    FROM red
    """,
    section="B12-training",
)
def q135(spark, sf_dir):
    """PII redaction (emails, URLs → typed tags). The test corpus carries
    no PII, so both engines deterministically inject synthetic emails/URLs
    into a doc_id-keyed subset, then redact and count — checking the regex
    surface itself, not the injection."""
    d = ts(spark, sf_dir, "documents")
    text2 = F.concat(
        F.col("text"),
        F.when(
            F.col("doc_id") % 7 == 0,
            F.concat(F.lit(" contact user"), F.col("doc_id"), F.lit("@example.com")),
        ).otherwise(""),
        F.when(
            F.col("doc_id") % 11 == 0,
            F.concat(F.lit(" see https://ex.org/d/"), F.col("doc_id")),
        ).otherwise(""),
    )
    aug = d.select(text2.alias("text2"))
    red = aug.select(
        "text2",
        C.redact_pii(F.col("text2")).alias("redacted"),
        F.regexp_count(F.col("text2"), F.lit(C.EMAIL_RE)).alias("n_emails"),
        F.regexp_count(F.col("text2"), F.lit(C.URL_RE)).alias("n_urls"),
    )
    return red.agg(
        F.sum((F.col("redacted") != F.col("text2")).cast("int"))
        .cast("long")
        .alias("n_docs_redacted"),
        F.sum("n_emails").cast("long").alias("n_emails"),
        F.sum("n_urls").cast("long").alias("n_urls"),
        F.sum(F.length("text2") - F.length("redacted"))
        .cast("long")
        .alias("chars_delta"),
    )


@query(
    "q136_stopword_coverage",
    oracle="""
    WITH toks AS (
      SELECT lang, unnest(string_split(text, ' ')) AS w FROM documents)
    SELECT lang, count(*) AS n_tokens,
           CAST(sum(CASE WHEN w IN ('the','a','and','of','to')
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_stop,
           round(CAST(sum(CASE WHEN w IN ('the','a','and','of','to')
                              THEN 1 ELSE 0 END) AS DOUBLE) / count(*), 6)
             AS stop_ratio
    FROM toks GROUP BY lang ORDER BY lang
    """,
    section="B12-training",
)
def q136(spark, sf_dir):
    """Stopword coverage per language — token-level (multiset) counts,
    complementing q124's per-doc distinct-kind quality feature. Explode +
    count: one partial+final aggregate, integer-exact."""
    toks = t(spark, sf_dir, "documents").select(
        "lang", F.explode(F.split("text", " ")).alias("w")
    )
    is_stop = F.col("w").isin("the", "a", "and", "of", "to").cast("int")
    return (
        toks.groupBy("lang")
        .agg(
            F.count("*").alias("n_tokens"),
            F.sum(is_stop).cast("long").alias("n_stop"),
            F.round(
                F.sum(is_stop).cast("double") / F.count("*"), 6
            ).alias("stop_ratio"),
        )
        # bounded result (one row per language)
        .transform(ordered_small, "lang")
    )


@query(
    "q137_embedding_quantize",
    oracle="""
    WITH q AS (
      SELECT label,
             CASE WHEN list_max(list_transform(embedding,
                                x -> abs(CAST(x AS DOUBLE)))) > 0
                  THEN list_transform(embedding, x ->
                    CAST(floor(CAST(x AS DOUBLE)
                      / (list_max(list_transform(embedding,
                           y -> abs(CAST(y AS DOUBLE)))) / 127) + 0.5) AS INTEGER))
                  ELSE list_transform(embedding, x -> 0) END AS qv
      FROM embeddings),
    e AS (SELECT label, unnest(qv) AS qi FROM q)
    SELECT label, CAST(count(*) / 64 AS BIGINT) AS n_vecs,
           CAST(sum(qi) AS BIGINT) AS sum_q,
           CAST(sum(CASE WHEN abs(qi) = 127 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_saturated
    FROM e GROUP BY label ORDER BY label
    """,
    section="B12-training",
)
def q137(spark, sf_dir):
    """Symmetric int8 embedding quantization (scale = max|x|/127 per
    vector, floor(x/scale + .5) so ties break identically everywhere).
    The check sums the integer codes and counts saturated lanes per
    label — integer-exact, so any single-element mismatch flips the hash.

    Zero higher-order functions (r13, guide §1.2 per-task work): the
    prior shape folded per-vector sums via interpreted HOF lambdas
    (transform/aggregate/filter never enter whole-stage codegen;
    ~640k lambda invocations ≈ 0.6 s of the query's 0.67 s at sf0.1).
    Now max|x| is greatest(array_max, -array_min) — pure codegen —
    and a posexplode streams elements through codegen floor/compare
    straight into the label aggregate, which partial-aggregates
    map-side to |labels| rows before the only shuffle. The explode
    never materializes (rows stream through the pipeline), so the
    memory-pressure mode the earlier exploded form hit (which re-grouped
    by vector) does not apply. Bit-exact: float→double casts are
    value-preserving, so the scale and every floor(x/scale + 0.5)
    match the per-vector HOF formulation digit for digit."""
    e = t(spark, sf_dir, "embeddings")
    mx = F.greatest(F.array_max("embedding"), -F.array_min("embedding")).cast(
        "double"
    )
    ex = e.select(
        "label",
        mx.alias("mx"),
        F.explode("embedding").alias("x"),
    )
    qcode = F.when(
        F.col("mx") > 0,
        F.floor(F.col("x").cast("double") / (F.col("mx") / 127) + 0.5).cast("int"),
    ).otherwise(F.lit(0))
    qq = ex.select("label", qcode.alias("q"))
    return (
        qq.groupBy("label")
        .agg(
            (F.count("*") / 64).cast("long").alias("n_vecs"),
            F.sum("q").alias("sum_q"),
            F.sum(F.when(F.abs("q") == 127, 1).otherwise(0))
            .cast("long")
            .alias("n_saturated"),
        )
        # bounded result (one row per quantization label)
        .transform(ordered_small, "label")
    )


@query(
    "q138_tfidf_retrieval",
    oracle="""
    WITH toks AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents),
    tf AS (SELECT doc_id, w, count(*) AS tf FROM toks
           WHERE w IN ('hash','merge','vector') GROUP BY doc_id, w),
    dfreq AS (SELECT w, count(DISTINCT doc_id) AS df FROM tf GROUP BY w),
    n AS (SELECT count(*) AS n_docs FROM documents),
    idf AS (SELECT w, ln(CAST(n_docs AS DOUBLE) / df) AS idf FROM dfreq, n),
    scored AS (
      SELECT tf.doc_id, round(sum(tf.tf * idf.idf), 6) AS score
      FROM tf JOIN idf USING (w) GROUP BY tf.doc_id)
    SELECT doc_id, score FROM scored
    ORDER BY score DESC, doc_id LIMIT 10
    """,
    section="B12-training",
)
def q138(spark, sf_dir):
    """tf-idf keyword retrieval: top-10 documents for the query bag
    {hash, merge, vector}. df/N are broadcast back onto the pre-filtered
    tf side (operators/corpus.tfidf_scores) — the shuffled volume is the
    matching postings, not the corpus."""
    scores = C.tfidf_scores(t(spark, sf_dir, "documents"), ["hash", "merge", "vector"])
    return scores.orderBy(F.desc("score"), "doc_id").limit(10)


@query(
    "q139_contamination_check",
    oracle="""
    WITH w AS (SELECT doc_id, lang, string_split(text, ' ') AS w
               FROM documents),
    g AS (SELECT doc_id,
                 unnest([w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' '
                         || w[i+3] || ' ' || w[i+4]
                         for i in range(1, len(w) - 3)]) AS gram
          FROM w),
    bg AS (SELECT DISTINCT gram FROM g WHERE doc_id % 97 = 0),
    cont AS (SELECT DISTINCT g.doc_id FROM g JOIN bg USING (gram)
             WHERE g.doc_id % 97 <> 0)
    SELECT lang, count(*) AS n_train,
           CAST(sum(CASE WHEN doc_id IN (SELECT doc_id FROM cont)
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_contaminated,
           round(CAST(sum(CASE WHEN doc_id IN (SELECT doc_id FROM cont)
                              THEN 1 ELSE 0 END) AS DOUBLE) / count(*), 6)
             AS contamination_rate
    FROM documents WHERE doc_id % 97 <> 0
    GROUP BY lang ORDER BY lang
    """,
    section="B12-training",
)
def q139(spark, sf_dir):
    """Benchmark-contamination check: flag training docs sharing any
    word 5-gram with a held-out benchmark set (here the deterministic
    ``doc_id % 97 = 0`` slice standing in for an eval suite).

    Scale shape: the benchmark's distinct 5-gram set is tiny relative to
    the corpus (eval suites are ~10^6-10^7 grams), so it is BROADCAST and
    the corpus side is a map-side left-semi probe — no shuffle of corpus
    grams, no quadratic doc×doc comparison. The only shuffle is the
    contaminated-doc-id distinct, bounded by corpus row count."""
    d = t(spark, sf_dir, "documents")
    train = d.filter(F.col("doc_id") % 97 != 0)
    bench = d.filter(F.col("doc_id") % 97 == 0)
    # no .distinct() before the broadcast LEFT SEMI probe: the broadcast
    # hash relation dedups its keys, so the distinct paid an exchange +
    # AQE stage for nothing (guide §2.4; same fix as verify_pairs_jaccard)
    bench_grams = D.shingles_exploded(bench, "doc_id", n=5).select("shingle")
    hit_ids = (
        D.shingles_exploded(train, "doc_id", n=5)
        .join(F.broadcast(bench_grams), "shingle", "left_semi")
        .select("doc_id")
        .distinct()
        .withColumn("hit", F.lit(1))
    )
    return (
        train.join(hit_ids, "doc_id", "left")
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_train"),
            F.sum(F.coalesce("hit", F.lit(0))).cast("long").alias("n_contaminated"),
            F.round(
                F.sum(F.coalesce("hit", F.lit(0))).cast("double") / F.count("*"), 6
            ).alias("contamination_rate"),
        )
        # bounded result (one row per language)
        .transform(ordered_small, "lang")
    )


@query(
    "q140_repetition_signals",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents),
    tc AS (SELECT doc_id, w, count(*) AS c FROM toks GROUP BY doc_id, w),
    per_tok AS (SELECT doc_id, max(c) AS max_c,
                       CAST(sum(c) AS BIGINT) AS n_tokens
                FROM tc GROUP BY doc_id),
    w3 AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
    g3 AS (SELECT doc_id,
                  unnest([w[i] || ' ' || w[i+1] || ' ' || w[i+2]
                          for i in range(1, len(w) - 1)]) AS g
           FROM w3),
    per_tri AS (SELECT doc_id, count(*) AS n_tri,
                       count(DISTINCT g) AS n_tri_distinct
                FROM g3 GROUP BY doc_id),
    feats AS (
      SELECT d.lang,
             CAST(p.max_c AS DOUBLE) / p.n_tokens AS top_token_frac,
             1.0 - CAST(t3.n_tri_distinct AS DOUBLE) / t3.n_tri AS dup_tri_frac
      FROM documents d
      JOIN per_tok p USING (doc_id) JOIN per_tri t3 USING (doc_id))
    SELECT lang, count(*) AS n_docs,
           round({sql_davg('top_token_frac')}, 6) AS avg_top_token_frac,
           round({sql_davg('dup_tri_frac')}, 6) AS avg_dup_tri_frac,
           CAST(sum(CASE WHEN top_token_frac > 0.2 OR dup_tri_frac > 0.3
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_flagged
    FROM feats GROUP BY lang ORDER BY lang
    """,
    section="B12-training",
)
def q140(spark, sf_dir):
    """Repetition-based quality signals (the Gopher/MassiveText rules):
    per-doc top-token fraction and duplicate-trigram fraction, averaged
    per language plus a flagged count at the published-style thresholds
    (top token > 0.2 or duplicate trigrams > 0.3).

    Both features are ratios of exact integer counts — one division per
    doc, bit-identical across engines — and the per-language averages go
    through the decimal-exact sum (helpers.davg), so the hash match is
    exact with no tolerance row. Scale shape (r13, guide §2.3/§2.4):
    token and trigram rows UNION into one tagged gram stream, so ONE
    (doc, tag, gram) count aggregate and ONE doc-keyed rollup replace
    the old two independent explode+groupBy chains (which shuffled the
    same doc-keyed volume twice and re-joined) — same shuffled bytes,
    half the shuffle rounds, one fewer corpus scan; everything
    whole-stage codegen, no Python. Docs too short for a trigram have
    no tag=1 rows (NULL n_tri after the rollup) and are filtered out,
    matching the old inner join against the trigram chain."""
    d = ts(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id",
        F.lit(0).alias("tag"),
        F.explode(F.split("text", " ")).alias("g"),
    )
    tri = D.shingles_exploded(d, "doc_id", n=3).select(
        "doc_id", F.lit(1).alias("tag"), F.col("shingle").alias("g")
    )
    per_doc = (
        toks.unionByName(tri)
        .groupBy("doc_id", "tag", "g")
        .count()
        .groupBy("doc_id")
        .agg(
            F.max(F.when(F.col("tag") == 0, F.col("count"))).alias("max_c"),
            F.sum(F.when(F.col("tag") == 0, F.col("count")))
            .cast("long")
            .alias("n_tokens"),
            F.sum(F.when(F.col("tag") == 1, F.col("count")))
            .cast("long")
            .alias("n_tri"),
            F.count(F.when(F.col("tag") == 1, F.lit(1))).alias("n_tri_distinct"),
        )
    )
    feats = (
        d.select("doc_id", "lang")
        .join(per_doc, "doc_id")
        .filter(F.col("n_tri").isNotNull())
        .select(
            "lang",
            (F.col("max_c").cast("double") / F.col("n_tokens")).alias("top_token_frac"),
            (
                F.lit(1.0)
                - F.col("n_tri_distinct").cast("double") / F.col("n_tri")
            ).alias("dup_tri_frac"),
        )
    )
    flagged = (
        (F.col("top_token_frac") > 0.2) | (F.col("dup_tri_frac") > 0.3)
    ).cast("int")
    return (
        feats.groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.round(davg("top_token_frac"), 6).alias("avg_top_token_frac"),
            F.round(davg("dup_tri_frac"), 6).alias("avg_dup_tri_frac"),
            F.sum(flagged).cast("long").alias("n_flagged"),
        )
        # bounded result (one row per language)
        .transform(ordered_small, "lang")
    )


#: q141's gate regime: at or below this many vectors the entry keeps the
#: round-7 formulation bit-identically (k=16 cells seeded from vec_ids
#: 100-116, interpreted ivf_assign, whole-corpus exact reference) — that
#: covers every driver-gate SF AND the ×10 probe. Above it, cells scale
#: as √N (vectorized assignment) and the recall certification dispatches
#: to a hash-bucketed ~this-many-vector subsample, because the exact
#: all-pairs reference is its own declared-quadratic baseline (959 s at
#: 200k vectors, measured r8).
Q141_GATE_ROWS = 20_000


def _q141_candidate_top10(e, n_rows, *, fixed_seed_ids, force_gate=False):
    """Cluster-pruned candidate global top-10 for a corpus (slice) of
    ``n_rows`` vectors. In the gate regime this is the round-7 plan
    verbatim; above it, k = √N cells keep per-cell work bounded (work
    ∝ N²/k = N^1.5 total with N·√N assignment cost — the standard IVF
    balance; k ∝ N would make assignment the new quadratic) and the
    assignment runs through the vectorized ivf_assign_batched.
    ``fixed_seed_ids`` keeps the vec_id-100-115 seeds only on the
    full-corpus gate path; slices (whose ids are hash-filtered) and
    scaled paths seed from a hash-ordered TakeOrderedAndProject —
    deterministic and spread uniformly across the id domain."""
    def _q141_cell_topk(pdf):
        """Per-cell top-10 pair scorer (grouped-map kernel): vectorized
        matmul in the HOF fold's left-to-right fp accumulation order, row
        chunked so the chunk × |cell| score block stays ~32 MB."""
        import numpy as np
        import pandas as pd

        M = np.asarray(pdf["embedding"].tolist(), dtype=np.float64)
        ids = pdf["vec_id"].to_numpy(dtype=np.int64)
        nrm = np.zeros(len(ids))
        for j in range(M.shape[1]):  # left-to-right, the HOF fold's order
            nrm += M[:, j] * M[:, j]
        nrm = np.sqrt(nrm)
        step = max(1, 4_000_000 // max(len(ids), 1))
        frames = []
        for lo in range(0, len(ids), step):
            hi = min(lo + step, len(ids))
            acc = np.zeros((hi - lo, len(ids)))
            for j in range(M.shape[1]):
                acc += np.outer(M[lo:hi, j], M[:, j])
            cos = np.round(acc / np.outer(nrm[lo:hi], nrm), 6)
            ia, ib = np.nonzero(ids[lo:hi, None] < ids[None, :])
            if not len(ia):
                continue
            s = cos[ia, ib]
            order = np.lexsort((ids[ib], ids[lo + ia], -s))[:10]
            frames.append(
                pd.DataFrame(
                    {"id_a": ids[lo + ia][order], "id_b": ids[ib][order],
                     "cos": s[order]}
                )
            )
        if not frames:
            return pd.DataFrame({"id_a": [], "id_b": [], "cos": []}).astype(
                {"id_a": "int64", "id_b": "int64", "cos": "float64"}
            )
        out = pd.concat(frames, ignore_index=True)
        order = np.lexsort(
            (out["id_b"].to_numpy(), out["id_a"].to_numpy(), -out["cos"].to_numpy())
        )[:10]
        return out.iloc[order].reset_index(drop=True)

    import math

    # force_gate pins the 16-cell gate mechanism regardless of n_rows:
    # the recall-certification arm samples ceil(N/GATE) hash buckets,
    # whose bucket-0 size is binomial around GATE — at the ×1000 probe
    # it landed at 20,241 (> 20,000), silently flipping the cert run
    # into the √N-cell regime (142 cells), whose recall on near-uniform
    # vectors is NOT the contract being certified (measured recall_ok
    # false at ×1000, round 12). The cert's documented intent is "a
    # gate-shaped candidate run on the subsample"; the caller now says
    # so explicitly instead of depending on sampling variance.
    gate = force_gate or n_rows <= Q141_GATE_ROWS
    k_cells = 16 if gate else max(16, math.isqrt(n_rows))
    # branch on the regime itself, not k_cells == 16 (a proxy that
    # inverts for gates below 257, where isqrt(n_rows) <= 16 on a
    # corpus that is past the gate)
    if fixed_seed_ids and gate:
        cents = [
            r.embedding
            for r in e.filter((F.col("vec_id") >= 100) & (F.col("vec_id") < 116))
            .orderBy("vec_id")
            .select("embedding")
            .collect()
        ]
        assigned = S.ivf_assign(
            e.select("vec_id", "embedding"), "embedding", cents, n_probe=2
        )
    else:
        cents = [
            list(r.embedding)
            for r in e.select("vec_id", "embedding")
            .orderBy(F.md5(F.col("vec_id").cast("string")), "vec_id")
            .limit(k_cells)
            .collect()
        ]
        assigned = S.ivf_assign_batched(
            e, "vec_id", "embedding", cents, n_probe=2
        )
    cand = (
        assigned.select("vec_id", "embedding", F.explode("ivf_cell").alias("cell"))
        .groupBy("cell")
        .applyInPandas(_q141_cell_topk, "id_a long, id_b long, cos double")
    )
    return (
        cand.dropDuplicates(["id_a", "id_b"])
        .orderBy(F.col("cos").desc(), "id_a", "id_b")
        .limit(10)
    )


@query(
    "q141_semantic_dedup_clustered",
    oracle="SELECT CAST(10 AS BIGINT) AS n_pairs, true AS recall_ok",
    section="B12-training",
)
def q141(spark, sf_dir):
    """Semantic (embedding-space) dedup, cluster-pruned — the 100 TB shape
    of q122's all-pairs join: vectors are coarse-quantized to their 2
    nearest of 16 IVF cells (n_probe=2 so a pair is caught whenever the
    cell sets intersect), pairs form only WITHIN a cell, and survivors are
    exact-cosine verified. The pair space shrinks from N²/2 to
    Σ_cell |cell|²/2 — with balanced cells, a 1/16 reduction per probe,
    and the join key (cell id) is bounded and uniform.

    Contract (q128-style tol row): of the exact top-10 most-similar pairs
    (q122's oracle list), the cluster-pruned candidate set must recover
    ≥ 6. Measured 2026-08-13: 8/10 at sf0.01 (the driver's gate SF) and
    6/10 at sf0.001, with the candidate space pruned to ~24% of all
    pairs — near-uniform vectors (max pair cosine ≈ 0.51) are IVF's hard
    regime; on a corpus with real planted duplicates (cosine ≥ 0.99) the
    duplicate pair lands in the same cell essentially always.

    Scale shape (round-7 probe rework): the within-cell pair space was
    previously materialized as a self-join carrying BOTH embedding
    arrays per pair row — Σ|cell|² rows x ~1 KB through the shuffle
    (~48 GB at a 20k-vector corpus) scored by the interpreted HOF
    cosine (968 s at x10). Cells now score LOCALLY: one applyInPandas
    per cell computes the within-cell pair cosines as a vectorized
    matmul in the task (same left-to-right fp accumulation as the HOF
    fold, so pre-rounding values are bit-identical; np.round's
    half-to-even vs F.round's HALF_UP can differ only on an exact half
    at the 6th decimal — measure-zero on real cosines, pinned by the
    3-SF equality tests, r7 advice) and emits only the cell's top-10
    pairs — the shuffle moves N x n_probe vector rows in and
    k_cells x 10 candidate rows out. Per-cell top-10 under the final
    total order is a lossless pre-filter for the global candidate top-10
    (dedup across the <= n_probe shared cells of a pair happens on the
    k_cells x 10 remainder). The exact reference list comes from
    allpairs_topk_cosine — the same vectorized kernel the q122 dispatch
    uses — instead of a second quadratic crossJoin.

    Scale shape (round-8 ×100 probe rework): at the SECOND decade the
    round-7 form was still quadratic twice over — 16 FIXED cells mean
    cell size ∝ N (candidate stage 413 s at 200k vectors), and the
    whole-corpus exact reference is quadratic by definition (959 s).
    Above Q141_GATE_ROWS the entry now (a) scales cells as k = √N with
    vectorized assignment (ivf_assign_batched) — measured at ×100:
    candidate stage 9 s, recall 10/10 against the exact list — and
    (b) dispatches the recall CERTIFICATION to a deterministic
    hash-bucketed ~20k-vector subsample (ceil(N/20k) md5-prefix buckets,
    bucket 0): the exact reference and a gate-shaped candidate run both
    execute on the subsample, where all-pairs is the kernel's
    comfortable regime, while the operator's own full-corpus candidate
    stage still runs at scale and feeds n_pairs. The cert run pins its
    regime with force_gate=True (round-12 fix): bucket-0 size is
    binomial around 20k, and at the ×1000 probe it drew 20,241 —
    crossing the gate by sampling variance silently re-pointed the
    certification at the √N-cell mechanism (recall_ok false at 2M
    vectors; re-measured true after the pin). At or below
    Q141_GATE_ROWS (every driver-gate SF and the ×10 probe) bucket
    count is 1, the subsample IS the corpus, and the whole entry is the
    round-7 formulation value-for-value."""
    e = t(spark, sf_dir, "embeddings")
    n = e.count()
    approx_full = _q141_candidate_top10(e, n, fixed_seed_ids=True)
    n_buckets = -(-n // Q141_GATE_ROWS)  # ceil
    if n_buckets == 1:
        # the same ≤10-row frame feeds BOTH the n_pairs count and the
        # recall intersect below; cache it so the per-cell matmul — the
        # entry's dominant gate-regime cost — runs once, not twice
        cert_corpus, cert_approx, n_cert = e, approx_full.cache(), n
    else:
        cert_corpus = e.filter(
            C.hash_bucket(F.col("vec_id").cast("string"), n_buckets) == 0
        )
        n_cert = cert_corpus.count()
        cert_approx = _q141_candidate_top10(
            cert_corpus, n_cert, fixed_seed_ids=False, force_gate=True
        )
    exact10 = S.allpairs_topk_cosine(cert_corpus, k=10, known_rows=n_cert)
    hits = cert_approx.select("id_a", "id_b").intersect(
        exact10.select("id_a", "id_b")
    )
    # both scalars from ONE aggregation over a tagged union of the two
    # (≤10-row) frames — a scalar crossJoin/constant-key join would
    # compile to the BroadcastNestedLoopJoin this entry's plan pin bans
    # outright
    tagged = approx_full.select(F.lit("full").alias("src")).unionByName(
        hits.select(F.lit("hit").alias("src"))
    )
    return tagged.agg(
        F.count(F.when(F.col("src") == "full", 1)).cast("long").alias("n_pairs"),
        (F.count(F.when(F.col("src") == "hit", 1)) >= 6).alias("recall_ok"),
    )


@query(
    "q143_segment_dedup",
    oracle="""
    WITH w AS (SELECT doc_id, lang, string_split(text, ' ') AS w
               FROM documents),
    segs AS (
      SELECT doc_id, lang,
             unnest([i for i in range(1, len(w) + 1)
                     if (i - 1) % 8 = 0]) AS pos,
             unnest([array_to_string(w[i:i+7], ' ')
                     for i in range(1, len(w) + 1)
                     if (i - 1) % 8 = 0]) AS seg
      FROM w),
    r AS (SELECT lang, seg,
                 row_number() OVER (PARTITION BY seg ORDER BY doc_id, pos)
                   AS rn
          FROM segs)
    SELECT lang,
           count(*) AS n_segments,
           CAST(sum(CASE WHEN rn > 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_removed,
           CAST(sum(CASE WHEN rn = 1 THEN len(string_split(seg, ' '))
                         ELSE 0 END) AS BIGINT) AS kept_tokens
    FROM r GROUP BY lang ORDER BY lang
    """,
    section="B12-training",
)
def q143(spark, sf_dir):
    """C4-style exact segment-level dedup: docs split into non-overlapping
    8-token segments; only the FIRST corpus-wide occurrence of each
    segment survives (first = lowest (doc_id, pos), the deterministic
    keep rule). Boilerplate lines repeated across pages — headers,
    navigation, license blurbs — are removed even when the containing
    documents are not duplicates, which doc-level dedup (q110/q111)
    cannot do.

    Scale shape: one explode (narrow) then ONE shuffle keyed by segment
    text for the row_number window — exact-dedup volume, same as q110.
    At 100 TB the window key swaps for xxhash64(seg) (collision-safe at
    2^64) so the shuffle carries 8-byte keys instead of raw segments,
    and AQE skew-split handles viral segments; the keep-first contract
    is unchanged."""
    from pyspark.sql import Window

    d = t(spark, sf_dir, "documents")
    w = F.split("text", " ")
    segs = d.select(
        "doc_id",
        "lang",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), (F.ceil(F.size(w) / F.lit(8)) - 1).cast("int")),
                lambda i: F.struct(
                    (i * 8 + 1).alias("pos"),
                    F.concat_ws(" ", F.slice(w, i * 8 + 1, 8)).alias("seg"),
                ),
            )
        ).alias("s"),
    ).select("doc_id", "lang", "s.pos", "s.seg")
    win = Window.partitionBy("seg").orderBy("doc_id", "pos")
    r = segs.withColumn("rn", F.row_number().over(win))
    return (
        r.groupBy("lang")
        .agg(
            F.count("*").alias("n_segments"),
            F.sum((F.col("rn") > 1).cast("int")).cast("long").alias("n_removed"),
            F.sum(
                F.when(F.col("rn") == 1, F.size(F.split("seg", " "))).otherwise(0)
            )
            .cast("long")
            .alias("kept_tokens"),
        )
        # bounded result (one row per language)
        .transform(ordered_small, "lang")
    )


@query(
    "q150_temperature_rebalance",
    oracle=f"""
    WITH c AS (SELECT lang, count(*) AS n FROM documents GROUP BY lang),
    m AS (SELECT min(n) AS nmin FROM c),
    r AS (SELECT lang, n,
                 CAST(floor(1000 * sqrt(CAST(nmin AS DOUBLE) / n)) AS INT)
                   AS permille
          FROM c, m)
    SELECT d.lang, r.n AS n_total, r.permille,
           CAST(sum(CASE WHEN {_DUCK_HB} < r.permille THEN 1 ELSE 0 END)
                AS BIGINT) AS n_kept
    FROM documents d JOIN r ON d.lang = r.lang
    GROUP BY d.lang, r.n, r.permille ORDER BY d.lang
    """,
    section="B12-training",
)
def q150(spark, sf_dir):
    """Temperature-based language rebalancing (the multilingual-training
    sampling step, temperature tau=2): keep rate per language
    proportional to sqrt(n_min/n_l), so high-resource languages are
    downsampled toward the alpha=0.5 mixture and the rarest language
    keeps (nearly) everything. Rates are derived FROM the data (one
    tiny count-aggregate, broadcast back), then applied with the same
    deterministic content-hash Bernoulli as q132 — task retries keep
    identical rows. floor to integer permille keeps the threshold
    compare integer-exact across engines; the sqrt itself is IEEE
    correctly-rounded, so both engines derive identical rates."""
    d = t(spark, sf_dir, "documents")
    counts = d.groupBy("lang").agg(F.count("*").alias("n"))
    nmin = counts.agg(F.min("n").alias("nmin"))
    rates = counts.crossJoin(F.broadcast(nmin)).select(
        "lang",
        "n",
        F.floor(
            1000 * F.sqrt(F.col("nmin").cast("double") / F.col("n"))
        )
        .cast("int")
        .alias("permille"),
    )
    tagged = d.join(F.broadcast(rates), "lang")
    kept = C.sample_by_hash(tagged, "text", F.col("permille"))
    kcounts = kept.groupBy("lang").agg(F.count("*").alias("n_kept"))
    return (
        rates.join(kcounts, "lang", "left")
        .select(
            "lang",
            F.col("n").alias("n_total"),
            "permille",
            F.coalesce("n_kept", F.lit(0)).alias("n_kept"),
        )
        # bounded result (one row per language)
        .transform(ordered_small, "lang")
    )


@query(
    "q151_snapshot_diff",
    oracle="""
    WITH old AS (SELECT doc_id, lang, sha256(text) AS h FROM documents
                 WHERE doc_id % 5 <> 0),
    new AS (SELECT doc_id, lang,
                   sha256(CASE WHEN doc_id % 7 = 0
                               THEN text || ' v2' ELSE text END) AS h
            FROM documents WHERE doc_id % 5 <> 1),
    j AS (SELECT coalesce(old.lang, new.lang) AS lang,
                 CASE WHEN old.doc_id IS NULL THEN 'added'
                      WHEN new.doc_id IS NULL THEN 'removed'
                      WHEN old.h <> new.h THEN 'changed'
                      ELSE 'unchanged' END AS change
          FROM old FULL JOIN new ON old.doc_id = new.doc_id)
    SELECT lang, change, count(*) AS n
    FROM j GROUP BY lang, change ORDER BY lang, change
    """,
    section="B12-training",
)
def q151(spark, sf_dir):
    """Snapshot diff (CDC without a table format): two corpus versions
    compared by doc_id full-outer join + content-hash equality, emitting
    added/removed/changed/unchanged per language — the change feed that
    drives incremental downstream recomputation (only 'changed'+'added'
    docs re-enter dedup/quality stages; q149 consumes exactly that feed).

    Shape: one full-outer join keyed on doc_id (uniform key, shuffles
    hashes not text — 32 B/row) + a small agg. The join is hinted
    SHUFFLE_HASH: full-outer SMJ sorts BOTH sides before merging, and
    with uniform unique keys those sorts are pure overhead — SHJ builds
    a hash map per partition instead (measured at sf0.1: 0.65→0.47 s
    warm, 2.5→0.8 s cold; this was the round-3 bench's closest-to-gate
    query). At 100 TB both snapshots are bucketed by doc_id so the join
    is co-located and zero-shuffle; content hashes are precomputed at
    ingest, so the diff never touches the text column at all (ReadSchema
    prunes to id+lang+hash)."""
    d = t(spark, sf_dir, "documents")
    old = d.filter(F.col("doc_id") % 5 != 0).select(
        "doc_id", "lang", F.sha2("text", 256).alias("h")
    )
    new = d.filter(F.col("doc_id") % 5 != 1).select(
        "doc_id",
        "lang",
        F.sha2(
            F.when(F.col("doc_id") % 7 == 0, F.concat("text", F.lit(" v2")))
            .otherwise(F.col("text")),
            256,
        ).alias("h"),
    )
    o, n = old.alias("o").hint("SHUFFLE_HASH"), new.alias("n")
    j = o.join(n, F.col("o.doc_id") == F.col("n.doc_id"), "full").select(
        F.coalesce(F.col("o.lang"), F.col("n.lang")).alias("lang"),
        F.when(F.col("o.doc_id").isNull(), "added")
        .when(F.col("n.doc_id").isNull(), "removed")
        .when(F.col("o.h") != F.col("n.h"), "changed")
        .otherwise("unchanged")
        .alias("change"),
    )
    return (
        j.groupBy("lang", "change")
        .agg(F.count("*").alias("n"))
        # bounded result (languages x change kinds)
        .transform(ordered_small, "lang", "change")
    )


@query(
    "q155_postings_retrieval",
    oracle="""
    WITH toks AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents),
    postings AS (SELECT w, doc_id, count(*) AS tf
                 FROM toks GROUP BY w, doc_id),
    q AS (SELECT w, tf, doc_id FROM postings
          WHERE w IN ('hash','merge','vector')),
    dfreq AS (SELECT w, count(*) AS df FROM q GROUP BY w),
    n AS (SELECT count(*) AS n_docs FROM documents),
    idf AS (SELECT w, ln(CAST(n_docs AS DOUBLE) / df) AS idf FROM dfreq, n),
    scored AS (SELECT q.doc_id, round(sum(q.tf * idf.idf), 6) AS score
               FROM q JOIN idf USING (w) GROUP BY q.doc_id)
    SELECT doc_id, score FROM scored
    ORDER BY score DESC, doc_id LIMIT 10
    """,
    section="B12-training",
)
def q155(spark, sf_dir):
    """Retrieval from a MATERIALIZED postings table — the 100 TB form of
    q138: the inverted index (term, doc_id, tf) is built ONCE as a
    bucketed table (one corpus scan, amortized over every later query),
    and each query is a term-pruned index lookup + broadcast-idf join +
    top-k. The corpus text is never touched at query time.

    Written `bucketBy(16, "w")` so term lookups hit a bounded bucket set
    and repeated term-keyed joins are shuffle-free; at real scale the
    postings build is the same explode+agg as q115 and the per-query
    cost is proportional to the matched postings only. Result contract:
    identical to scoring directly off the corpus (q138's formula; the
    oracle recomputes df from the pruned postings, which equals q138's
    corpus-wide df for these terms)."""
    import shutil

    docs = t(spark, sf_dir, "documents")
    tag = os.path.basename(sf_dir).replace(".", "_")
    tbl = f"s4_postings_{tag}"
    if not spark.catalog.tableExists(tbl):
        # explicit path (q045 pattern): a fresh session's in-memory
        # metastore forgets the table while the old dir survives, so the
        # build clears its own location instead of tripping on it
        path = os.path.join(scratch_root(), f"postings_{tag}")
        shutil.rmtree(path, ignore_errors=True)
        toks = docs.select(
            "doc_id", F.explode(F.split("text", " ")).alias("w")
        )
        postings = toks.groupBy("w", "doc_id").agg(F.count("*").alias("tf"))
        (
            postings.write.mode("overwrite")
            .bucketBy(16, "w")
            .sortBy("w")
            .option("path", path)
            .saveAsTable(tbl)
        )
    q = spark.table(tbl).filter(F.col("w").isin(["hash", "merge", "vector"]))
    dfreq = q.groupBy("w").agg(F.count("*").alias("df"))
    n = docs.select(F.count("*").alias("n_docs"))
    idf = dfreq.crossJoin(F.broadcast(n)).select(
        "w", F.log(F.col("n_docs").cast("double") / F.col("df")).alias("idf")
    )
    scored = (
        q.join(F.broadcast(idf), "w")
        .groupBy("doc_id")
        .agg(F.round(F.sum(F.col("tf") * F.col("idf")), 6).alias("score"))
    )
    return scored.orderBy(F.desc("score"), "doc_id").limit(10)


@query(
    "q156_exact_k_sample",
    oracle=f"""
    WITH ranked AS (
      SELECT lang, doc_id,
             row_number() OVER (PARTITION BY lang ORDER BY {_DUCK_HB}, doc_id)
               AS rn
      FROM documents)
    SELECT lang, count(*) AS n_sampled,
           CAST(sum(doc_id) AS BIGINT) AS sum_ids
    FROM ranked WHERE rn <= 25
    GROUP BY lang ORDER BY lang
    """,
    section="B12-training",
)
def q156(spark, sf_dir):
    """Exact-k deterministic sample per stratum (fixed-size eval/dev
    subsets): rank docs within each language by content-hash bucket
    (ties broken by doc_id) and take the first k — re-runs, retries,
    and corpus APPENDS that don't touch the winning hashes all select
    identical rows, unlike LIMIT (plan-order-dependent) or rand().

    Shape: one window shuffle keyed by stratum. At 100 TB with k ≪
    stratum size, the rank-over-everything form swaps for a two-phase
    top-k (per-partition heap of k, then merge k x partitions rows) —
    same contract, shuffle bounded by k x partitions, the
    TakeOrderedAndProject pattern applied per group."""
    from s4_spark.operators.corpus import hash_bucket

    d = t(spark, sf_dir, "documents")
    w = Window.partitionBy("lang").orderBy(hash_bucket(F.col("text")), "doc_id")
    return (
        d.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 25)
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_sampled"),
            F.sum("doc_id").cast("long").alias("sum_ids"),
        )
        .orderBy("lang")
    )


@query(
    "q157_text_normalize",
    oracle="""
    WITH n AS (
      SELECT lang,
             trim(regexp_replace(
               regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'),
               ' +', ' ', 'g')) AS norm
      FROM documents)
    SELECT lang, count(*) AS n_docs,
           CAST(sum(length(norm)) AS BIGINT) AS sum_norm_chars,
           min(md5(norm)) AS min_norm_md5
    FROM n GROUP BY lang ORDER BY lang
    """,
    section="B12-training",
)
def q157(spark, sf_dir):
    """Text normalization battery (the pre-tokenization cleanup pass):
    casefold -> strip non-alphanumerics -> collapse whitespace -> trim,
    all JVM-side regexp/string builtins (whole-stage codegen, no UDF).
    The md5-of-normalized-text in the check makes the contract
    byte-exact — any divergence in any document flips the hash. Narrow
    (no shuffle until the per-lang agg); at 100 TB this runs fused into
    the ingest scan."""
    d = t(spark, sf_dir, "documents")
    norm = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower(F.col("text")), "[^a-z0-9 ]", " "),
            " +",
            " ",
        )
    )
    return (
        d.select("lang", norm.alias("norm"))
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(F.length("norm")).cast("long").alias("sum_norm_chars"),
            F.min(F.md5("norm")).alias("min_norm_md5"),
        )
        # bounded result (one row per language)
        .transform(ordered_small, "lang")
    )


@query(
    "q169_source_cap",
    oracle="""
    WITH r AS (
      SELECT source, lang,
             row_number() OVER (PARTITION BY source
                                ORDER BY n_chars DESC, doc_id) AS rn
      FROM documents)
    SELECT source,
           count(*) AS n_total,
           CAST(sum(CASE WHEN rn <= 20 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_kept,
           CAST(sum(CASE WHEN rn <= 20 THEN 0 ELSE 1 END) AS BIGINT)
             AS n_dropped
    FROM r GROUP BY source ORDER BY source
    """,
    section="B12-training",
)
def q169(spark, sf_dir):
    """Per-source document cap — the HARD dominance ceiling of corpus
    curation (cap pages per domain so no single crawl source swamps the
    mixture), complementing q132's fractional sampling and q150's
    temperature reweighting which only scale proportionally. Keep rule is
    deterministic: the K=20 largest documents per source (ties broken by
    doc_id), so task retries and both engines select identical rows.

    Scale shape: the cap is APPLIED as a rank filter, which Spark
    rewrites to a two-stage WindowGroupLimit (per-map-task top-K BELOW
    the shuffle, final above — plan-pinned in test_plans like q062), so
    the capped branch shuffles at most K rows per source per map task,
    not the corpus; totals come from a plain partial-aggregated count.
    The stats join is |sources|-sized."""
    from pyspark.sql import Window

    d = t(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy(
        F.col("n_chars").desc(), F.col("doc_id")
    )
    capped = (
        d.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 20)  # the operator output (WindowGroupLimit)
    )
    kept = capped.groupBy("source").agg(F.count("*").alias("n_kept"))
    totals = d.groupBy("source").agg(F.count("*").alias("n_total"))
    return (
        totals.join(kept, "source")
        .select(
            "source",
            "n_total",
            "n_kept",
            (F.col("n_total") - F.col("n_kept")).alias("n_dropped"),
        )
        .orderBy("source")
    )


@query(
    "q175_repeated_ngram_spans",
    oracle="""
    WITH words AS (
      SELECT doc_id, source, string_split(text, ' ') AS ws FROM documents),
    idx AS (
      SELECT doc_id, source, ws,
             unnest([i for i in generate_series(1, len(ws) - 7)]) AS i
      FROM words WHERE len(ws) >= 8),
    grams AS (
      SELECT doc_id, source,
             array_to_string(list_slice(ws, i, i + 7), ' ') AS gram
      FROM idx),
    rep AS (SELECT gram FROM grams GROUP BY gram
            HAVING count(DISTINCT doc_id) > 1),
    cover AS (
      SELECT g.doc_id, g.source, count(*) AS n_grams,
             sum(CASE WHEN r.gram IS NOT NULL THEN 1 ELSE 0 END) AS n_rep
      FROM grams g LEFT JOIN rep r USING (gram)
      GROUP BY g.doc_id, g.source)
    SELECT source,
           count(*) AS n_docs,
           CAST(sum(CASE WHEN n_rep > 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_docs_with_repeats,
           round(avg(CAST(n_rep AS DOUBLE) / n_grams), 6) AS avg_repeat_frac
    FROM cover GROUP BY source ORDER BY source
    """,
    section="B12-training",
)
def q175(spark, sf_dir):
    """Cross-document repeated-passage detection — the exact-substring
    dedup signal of Lee et al. 2022 ("Deduplicating Training Data Makes
    Language Models Better"), distinct from q139 (contamination vs a
    benchmark) and q143 (whole-paragraph dedup): every 8-word window is
    keyed, windows appearing in MORE THAN ONE document mark repeated
    spans, and each doc reports the fraction of its windows that are
    corpus-repeated (the quantity thresholded to clip/drop boilerplate,
    licenses, chain letters).

    Scale shape: gram keys are xxhash64 of the window text, so the
    repeat-inventory shuffle carries (int64, doc_id) pairs — never the
    window strings (the oracle keys on raw grams; identical aggregates
    modulo 64-bit collisions, ~1e-9 at sf0.01). Both aggs partial-
    combine; the grams->rep join is int64-keyed. At 100 TB this is the
    suffix-array alternative that stays in one shuffle: inventory once,
    then every doc's coverage is a map-side lookup against the repeated
    set (bucketed or bloom-pruned as in q139's blocklist join)."""
    d = (
        t(spark, sf_dir, "documents")
        .select("doc_id", "source", F.split("text", " ").alias("ws"))
        .filter(F.size("ws") >= 8)
    )
    grams = d.select(
        "doc_id",
        "source",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.size("ws") - F.lit(7)),
                lambda i: F.xxhash64(F.concat_ws(" ", F.slice("ws", i, 8))),
            )
        ).alias("gh"),
    )
    rep = (
        grams.groupBy("gh")
        .agg(F.count_distinct("doc_id").alias("nd"))
        .filter(F.col("nd") > 1)
        .select("gh")
    )
    cover = (
        grams.join(rep.withColumn("is_rep", F.lit(1)), "gh", "left")
        .groupBy("doc_id", "source")
        .agg(
            F.count("*").alias("n_grams"),
            F.sum(F.coalesce(F.col("is_rep"), F.lit(0))).alias("n_rep"),
        )
    )
    return (
        cover.groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum((F.col("n_rep") > 0).cast("int"))
            .cast("long")
            .alias("n_docs_with_repeats"),
            F.round(F.avg(F.col("n_rep") / F.col("n_grams")), 6).alias(
                "avg_repeat_frac"
            ),
        )
        # bounded result (one row per source)
        .transform(ordered_small, "source")
    )


@query(
    "q176_training_shard_export",
    oracle="""
    WITH d AS (SELECT lang, doc_id,
                      len(string_split(text, ' ')) AS n_tokens
               FROM documents),
    packed AS (
      SELECT lang, doc_id, n_tokens,
             CAST(floor((sum(n_tokens) OVER
                 (PARTITION BY lang ORDER BY doc_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               - n_tokens) / 2048.0) AS BIGINT) AS pack_bin
      FROM d)
    SELECT lang, pack_bin % 4 AS shard, count(*) AS n_docs,
           count(DISTINCT pack_bin) AS n_bins,
           CAST(sum(n_tokens) AS BIGINT) AS total_tokens
    FROM packed GROUP BY lang, shard ORDER BY lang, shard
    """,
    section="B12-training",
)
def q176(spark, sf_dir):
    """Training-shard EXPORT — the write path q134's packing feeds: packed
    context windows land as a Hive-partitioned parquet tree
    (``lang=/shard=``) and the shard manifest (docs, bins, tokens per
    shard) is computed from a RE-READ of the committed files, so the
    check covers layout, partition-column round-trip, and losslessness,
    not just the bin math. Shard id is ``pack_bin % n`` — deterministic
    in the data (no rand/taskId), so task retries and re-runs land every
    doc in the same shard (same idempotence argument as q132's hash
    sampling).

    At 100 TB this is the terminal pipeline stage: each (lang, shard)
    directory is one training-reader stream, the partitioned layout
    gives shard-pruned reads for free, and the manifest (a tiny
    aggregate of the re-read) is the audit artifact checked against the
    upstream token ledger before a run starts. The export itself is one
    shuffle (the packing window) + a partitioned write; manifest cost is
    a scan of the written shards only."""
    import shutil as _shutil

    d = t(spark, sf_dir, "documents").withColumn(
        "n_tokens", F.size(F.split("text", " "))
    )
    packed = C.pack_sequences(d, "lang", "doc_id", "n_tokens", capacity=2048)
    shards = packed.select(
        "doc_id",
        "lang",
        "n_tokens",
        "pack_bin",
        F.pmod("pack_bin", F.lit(4)).alias("shard"),
    )
    path = os.path.join(scratch_root(), f"shards_{os.path.basename(sf_dir)}")
    _shutil.rmtree(path, ignore_errors=True)
    shards.write.partitionBy("lang", "shard").mode("overwrite").parquet(path)
    back = spark.read.parquet(path)
    return (
        back.groupBy("lang", "shard")
        .agg(
            F.count("*").alias("n_docs"),
            F.countDistinct("pack_bin").alias("n_bins"),
            F.sum("n_tokens").cast("long").alias("total_tokens"),
        )
        .select(
            "lang",
            F.col("shard").cast("long").alias("shard"),
            "n_docs",
            "n_bins",
            "total_tokens",
        )
        # bounded result (languages x 4 shards)
        .transform(ordered_small, "lang", "shard")
    )


@query(
    "q177_vocab_induction_oov",
    oracle="""
    WITH toks AS (SELECT lang, unnest(string_split(text, ' ')) AS w
                  FROM documents),
    freq AS (SELECT w, count(*) AS n FROM toks GROUP BY w),
    vocab AS (SELECT w FROM freq ORDER BY n DESC, w LIMIT 512),
    cover AS (SELECT lang, CASE WHEN v.w IS NOT NULL THEN 1 ELSE 0 END AS iv
              FROM toks t LEFT JOIN vocab v USING (w))
    SELECT lang, count(*) AS n_tokens,
           CAST(sum(iv) AS BIGINT) AS n_in_vocab,
           round(1 - sum(iv) / CAST(count(*) AS DOUBLE), 6) AS oov_rate
    FROM cover GROUP BY lang ORDER BY lang
    """,
    section="B12-training",
)
def q177(spark, sf_dir):
    """Vocabulary induction + OOV audit — the tokenizer-prep stage: the
    top-512 corpus tokens (frequency, deterministic token tie-break)
    become the vocab, then every language reports its token count and
    out-of-vocabulary rate — the coverage number that decides whether a
    tokenizer/vocab budget is adequate per language before training.

    Scale shape: the frequency table partial-combines (token keys,
    map-side); the vocab cut is a TakeOrdered top-k, never a global
    sort; and coverage is a BROADCAST membership probe on the token
    stream (vocab is budget-sized by construction) + a per-lang partial
    agg — the corpus token stream is never shuffled. Real BPE induction
    iterates merges on exactly this frequency substrate; the vocab/OOV
    accounting here is the part that matters at 100 TB (the merge loop
    runs on the sampled frequency table, driver-side like q162's
    centroids)."""
    toks = t(spark, sf_dir, "documents").select(
        "lang", F.explode(F.split("text", " ")).alias("w")
    )
    freq = toks.groupBy("w").agg(F.count("*").alias("n"))
    vocab = freq.orderBy(F.desc("n"), "w").limit(512).select("w")
    cover = toks.join(
        F.broadcast(vocab.withColumn("iv", F.lit(1))), "w", "left"
    )
    return (
        cover.groupBy("lang")
        .agg(
            F.count("*").alias("n_tokens"),
            F.sum(F.coalesce("iv", F.lit(0))).cast("long").alias("n_in_vocab"),
            F.round(
                1 - F.sum(F.coalesce("iv", F.lit(0))) / F.count("*"), 6
            ).alias("oov_rate"),
        )
        # bounded result (one row per language)
        .transform(ordered_small, "lang")
    )


@query(
    "q178_train_val_test_split",
    oracle=f"""
    WITH b AS (SELECT lang, {_DUCK_HB} AS bucket,
                      len(string_split(text, ' ')) AS n_tokens
               FROM documents),
    s AS (SELECT lang, n_tokens,
                 CASE WHEN bucket < 900 THEN 'train'
                      WHEN bucket < 950 THEN 'val'
                      ELSE 'test' END AS split
          FROM b)
    SELECT split, count(*) AS n_docs,
           count(DISTINCT lang) AS n_langs,
           CAST(sum(n_tokens) AS BIGINT) AS sum_tokens
    FROM s GROUP BY split ORDER BY split
    """,
    section="B12-training",
)
def q178(spark, sf_dir):
    """Deterministic train/val/test split (90/5/5) — the holdout-carving
    stage run before any training job. Membership is a pure function of
    document CONTENT (md5 bucket), which buys three properties rand()
    or row-position splits lack at 100 TB: (1) task retries and re-runs
    produce identical splits; (2) appending new data never moves an old
    document across splits (no silent eval contamination on refresh);
    (3) an exact duplicate always lands in the same split, so
    train/test leakage via duplicates is structurally impossible even
    BEFORE dedup runs. Every doc lands in exactly one split (the CASE is
    total), so coverage/disjointness is by construction and the oracle's
    per-split counts prove the partition sums to the corpus.

    Shape: one narrow scan (bucket is codegen'd md5 arithmetic, no
    shuffle) + a 3-group partial agg."""
    b = t(spark, sf_dir, "documents").select(
        "lang",
        C.hash_bucket(F.col("text")).alias("bucket"),
        F.size(F.split("text", " ")).alias("n_tokens"),
    )
    s = b.withColumn(
        "split",
        F.when(F.col("bucket") < 900, "train")
        .when(F.col("bucket") < 950, "val")
        .otherwise("test"),
    )
    return (
        s.groupBy("split")
        .agg(
            F.count("*").alias("n_docs"),
            F.countDistinct("lang").alias("n_langs"),
            F.sum("n_tokens").cast("long").alias("sum_tokens"),
        )
        # bounded result (three splits)
        .transform(ordered_small, "split")
    )


@query(
    "q180_bm25_retrieval",
    oracle="""
    WITH toks AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents),
    dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY doc_id),
    stats AS (SELECT count(*) AS n_docs, avg(CAST(dl AS DOUBLE)) AS avgdl
              FROM dl),
    tf AS (SELECT doc_id, w, count(*) AS tf FROM toks
           WHERE w IN ('hash','merge','vector') GROUP BY doc_id, w),
    dfreq AS (SELECT w, count(DISTINCT doc_id) AS df FROM tf GROUP BY w),
    idf AS (SELECT w,
                   ln((n_docs - df + 0.5) / (df + 0.5) + 1.0) AS idf
            FROM dfreq, stats),
    scored AS (
      SELECT tf.doc_id,
             round(sum(idf.idf * tf.tf * 2.2 /
                       (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / stats.avgdl))),
                   6) AS score
      FROM tf
      JOIN idf USING (w)
      JOIN dl USING (doc_id), stats
      GROUP BY tf.doc_id)
    SELECT doc_id, score FROM scored
    ORDER BY score DESC, doc_id LIMIT 10
    """,
    section="B12-training",
)
def q180(spark, sf_dir):
    """BM25 retrieval (k1=1.2, b=0.75) for the query bag {hash, merge,
    vector} — the scorer behind benchmark-similarity data curation and
    retrieval-based corpus selection; upgrades q138's raw tf-idf with tf
    saturation (k1) and document-length normalization (b), the two
    effects that matter on web corpora with wildly varying doc lengths.

    Scale shape mirrors q138: tf is pre-filtered to query terms BELOW
    aggregation so the shuffle carries matching postings only; idf
    (|terms| rows) and the corpus stats (1 row: N, avgdl) broadcast onto
    the postings; doc length joins on doc_id. Per-doc lengths would be a
    stored column at real scale (computed at ingest, like content
    hashes) — here the dl aggregate stands in for that column."""
    d = t(spark, sf_dir, "documents")
    terms = ["hash", "merge", "vector"]
    toks = d.select("doc_id", F.explode(F.split("text", " ")).alias("w"))
    dl = toks.groupBy("doc_id").agg(F.count("*").alias("dl"))
    n_docs, avgdl = dl.agg(
        F.count("*"), F.avg(F.col("dl").cast("double"))
    ).collect()[0]
    tf = (
        toks.filter(F.col("w").isin(terms))
        .groupBy("doc_id", "w")
        .agg(F.count("*").alias("tf"))
    )
    idf = tf.groupBy("w").agg(
        F.log(
            (F.lit(float(n_docs)) - F.count_distinct("doc_id") + 0.5)
            / (F.count_distinct("doc_id") + 0.5)
            + 1.0
        ).alias("idf")
    )
    k1, b = 1.2, 0.75
    scored = (
        tf.join(F.broadcast(idf), "w")
        .join(dl, "doc_id")
        .groupBy("doc_id")
        .agg(
            F.round(
                F.sum(
                    F.col("idf")
                    * F.col("tf")
                    * (k1 + 1)
                    / (
                        F.col("tf")
                        + k1
                        * (1 - b + b * F.col("dl") / F.lit(float(avgdl)))
                    )
                ),
                6,
            ).alias("score")
        )
    )
    return scored.orderBy(F.desc("score"), "doc_id").limit(10)


def incremental_shard_dir(sf_dir: str) -> str:
    """Deterministic output dir for q181's incremental refresh, shared
    with the partition-pruned-overwrite test (tests/test_plans.py).
    Not routed through a scratch-clearing helper — the test resolves the
    path without destroying the output (q173's bloom_sink_dir pattern)."""
    return os.path.join(
        scratch_root(), f"incr_shards_{os.path.basename(sf_dir)}"
    )


@query(
    "q181_incremental_shard_refresh",
    oracle="""
    WITH cur AS (
      SELECT lang, doc_id,
             CASE WHEN lang = 'en' AND doc_id % 7 = 0
                  THEN text || ' v2' ELSE text END AS text2
      FROM documents)
    SELECT lang, doc_id % 4 AS shard, count(*) AS n_docs,
           CAST(sum(len(string_split(text2, ' '))) AS BIGINT) AS sum_tokens
    FROM cur GROUP BY lang, shard ORDER BY lang, shard
    """,
    section="B12-training",
)
def q181(spark, sf_dir):
    """Incremental shard refresh via DYNAMIC partition overwrite — the
    nightly-update path q176's full export can't afford at 100 TB: when
    one source re-crawls (here: lang 'en' re-ingested with some docs
    changed), only that source's partitions are recomputed and swapped;
    every other partition's files are untouched (asserted by file-listing
    identity in tests/test_plans.py). Spark's
    ``partitionOverwriteMode=dynamic`` replaces exactly the partitions
    PRESENT in the write, instead of static overwrite's truncate-all.

    Shard assignment is doc_id % n — STABLE under content updates (a
    changed doc stays in its shard), which is what makes a sparse delta
    touch few partitions; pack-bin sharding (q176) would cascade a
    content change through the lang's whole packing order, so the
    incremental table keys on identity, and packing runs downstream per
    refreshed partition. The conf flip is saved/restored — no session
    leak (same hygiene as the nanos conf, ADVICE r3)."""
    import shutil as _shutil

    d = t(spark, sf_dir, "documents").select(
        "doc_id",
        "lang",
        F.size(F.split("text", " ")).alias("n_tokens"),
        F.pmod("doc_id", F.lit(4)).alias("shard"),
    )
    path = incremental_shard_dir(sf_dir)
    _shutil.rmtree(path, ignore_errors=True)
    # full build (v1)
    d.write.partitionBy("lang", "shard").mode("overwrite").parquet(path)
    # delta: lang 'en' re-crawled, every doc_id % 7 == 0 doc changed
    delta = (
        t(spark, sf_dir, "documents")
        .filter(F.col("lang") == "en")
        .select(
            "doc_id",
            "lang",
            F.size(
                F.split(
                    F.when(
                        F.col("doc_id") % 7 == 0,
                        F.concat("text", F.lit(" v2")),
                    ).otherwise(F.col("text")),
                    " ",
                )
            ).alias("n_tokens"),
            F.pmod("doc_id", F.lit(4)).alias("shard"),
        )
    )
    conf = "spark.sql.sources.partitionOverwriteMode"
    saved = spark.conf.get(conf, None)
    try:
        spark.conf.set(conf, "dynamic")
        delta.write.partitionBy("lang", "shard").mode("overwrite").parquet(path)
    finally:
        if saved is None:
            spark.conf.unset(conf)
        else:
            spark.conf.set(conf, saved)
    back = spark.read.parquet(path)
    return (
        back.groupBy("lang", "shard")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").cast("long").alias("sum_tokens"),
        )
        .select(
            "lang",
            F.col("shard").cast("long").alias("shard"),
            "n_docs",
            "sum_tokens",
        )
        # bounded result (languages x 4 shards)
        .transform(ordered_small, "lang", "shard")
    )


@query(
    "q182_global_row_number",
    oracle="""
    WITH numbered AS (
      SELECT lang, doc_id,
             row_number() OVER (ORDER BY doc_id) - 1 AS rid
      FROM documents)
    SELECT lang, count(*) AS n_docs,
           CAST(min(rid) AS BIGINT) AS min_rid,
           CAST(max(rid) AS BIGINT) AS max_rid,
           CAST(sum(rid) AS BIGINT) AS sum_rid
    FROM numbered GROUP BY lang ORDER BY lang
    """,
    section="B12-training",
)
def q182(spark, sf_dir):
    """Global contiguous row numbering WITHOUT a global sort — the
    scalable zipWithIndex, needed wherever a corpus gets stable dense
    ids (example packing order, shard-internal offsets, matrix row
    indices for embedding dumps). ``row_number() OVER (ORDER BY ...)``
    funnels the whole table through ONE reducer; the two-phase form
    never does:

      1. bucket rows by range (bounds from one tiny quantile probe —
         the same sampling a global sort's range partitioner performs);
      2. count per bucket (partial agg), prefix-sum the counts
         driver-side (|buckets| integers) into bucket offsets;
      3. number rows within their bucket (per-bucket window — each
         bucket sorts independently, in parallel) and add the offset.

    Result is bit-identical to the single-reducer window (the oracle IS
    row_number over the global order) while the largest single sort is
    one bucket. Buckets come from explicit collected bounds, not
    repartitionByRange, so phase-1/phase-2 assignment can't drift with
    sampling. Bucket assignment and offset lookup are both BROADCAST
    JOINS against tiny (|buckets|-row) driver-built tables, not chained
    CASE WHENs — a `when` chain is one py4j call and one extra
    expression-tree level PER BUCKET, which at thousands of range
    buckets (a realistic 100 TB numbering job) hits the analyzer/codegen
    depth tax this repo measured in round 2 (VERDICT r4 item 2); the
    join form is O(1) plan nodes regardless of bucket count. The
    two-phase machinery is shared with q191 via
    s4_spark/operators/prefix.py."""
    from s4_spark.operators.prefix import with_global_prefix

    d = t(spark, sf_dir, "documents").select("lang", "doc_id")
    numbered = with_global_prefix(d, "doc_id", ["doc_id"])
    return (
        numbered.groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.min("rid").cast("long").alias("min_rid"),
            F.max("rid").cast("long").alias("max_rid"),
            F.sum("rid").cast("long").alias("sum_rid"),
        )
        # bounded result (one row per language)
        .transform(ordered_small, "lang")
    )


@query(
    "q183_epoch_shuffle",
    oracle="""
    WITH e1 AS (
      SELECT doc_id, md5('epoch1:' || CAST(doc_id AS VARCHAR)) AS k
      FROM documents),
    top1 AS (SELECT doc_id, k FROM e1 ORDER BY k, doc_id LIMIT 10),
    e2 AS (
      SELECT doc_id, md5('epoch2:' || CAST(doc_id AS VARCHAR)) AS k
      FROM documents),
    top2 AS (SELECT doc_id, k FROM e2 ORDER BY k, doc_id LIMIT 10)
    SELECT 1 AS epoch, doc_id, k FROM top1
    UNION ALL
    SELECT 2 AS epoch, doc_id, k FROM top2
    ORDER BY epoch, k, doc_id
    """,
    section="B12-training",
)
def q183(spark, sf_dir):
    """Deterministic per-epoch corpus shuffle — training-order
    reproducibility: each epoch orders the corpus by a seeded content
    key (md5 of "epoch<N>:" + doc_id), so (1) any run, restart, or
    backfill regenerates the SAME order for the same epoch (rand()
    cannot — task retries reshuffle); (2) different epochs get
    independent permutations; (3) the order needs no stored state — the
    key recomputes anywhere. The check pins the head of two epochs'
    orders cross-engine, which locks the entire permutation (any
    upstream change to the key formula moves the head).

    Scale shape: an epoch's order materializes as sort keys at export
    (q176's shard tree sorted within shards by the epoch key), never as
    a global sorted table; the head-of-order check compiles to
    TakeOrdered (per-partition heap + driver merge), no global sort."""
    d = t(spark, sf_dir, "documents")

    def top(epoch: int):
        return (
            d.select(
                F.lit(epoch).alias("epoch"),
                "doc_id",
                F.md5(
                    F.concat(F.lit(f"epoch{epoch}:"), F.col("doc_id").cast("string"))
                ).alias("k"),
            )
            .orderBy("k", "doc_id")
            .limit(10)
        )

    # bounded result (two 10-row epoch heads)
    return ordered_small(top(1).unionByName(top(2)), "epoch", "k", "doc_id")


@query(
    "q184_file_provenance",
    oracle="""
    SELECT lang, doc_id % 4 AS shard, count(*) AS n_rows,
           CAST(1 AS BIGINT) AS files_present,
           CAST(0 AS BIGINT) AS n_provenance_mismatches
    FROM documents GROUP BY lang, shard ORDER BY lang, shard
    """,
    section="B12-training",
)
def q184(spark, sf_dir):
    """Row-level file provenance via the parquet ``_metadata`` column —
    the lineage primitive behind takedown requests, corrupted-file
    quarantine, and per-source audits on a multi-million-file corpus:
    every row reports WHICH physical file it came from, with no stored
    lineage table (the reader synthesizes it from the scan).

    The check round-trips a Hive-partitioned write (one file per
    (lang, shard) leaf via repartition on the partition keys), re-reads
    with ``_metadata.file_path``, and re-derives the partition values by
    PARSING THE PATH — `n_provenance_mismatches` counts rows whose
    path-derived (lang, shard) disagrees with their column values, which
    the oracle pins to zero. `files_present` pins that every leaf carries
    ≥1 provenance-bearing file — deliberately NOT an exact file count:
    file rolling (spark.sql.files.maxRecordsPerFile, bigger SF) may
    legitimately split a leaf into several part-files without breaking
    provenance (ADVICE r4). At 100 TB `_metadata` joins rows to a file
    manifest (size, mtime, checksum) for incremental re-validation —
    the same manifest q142's docstring describes for binary corpora."""
    import shutil as _shutil

    d = t(spark, sf_dir, "documents").select(
        "doc_id", "lang", F.pmod("doc_id", F.lit(4)).alias("shard")
    )
    path = os.path.join(scratch_root(), f"prov_{os.path.basename(sf_dir)}")
    _shutil.rmtree(path, ignore_errors=True)
    (
        d.repartition("lang", "shard")
        .write.partitionBy("lang", "shard")
        .mode("overwrite")
        .parquet(path)
    )
    back = spark.read.parquet(path).select(
        "doc_id",
        "lang",
        "shard",
        F.col("_metadata.file_path").alias("fp"),
    )
    parsed = back.select(
        "lang",
        "shard",
        "fp",
        F.regexp_extract("fp", r"lang=([^/]+)/", 1).alias("p_lang"),
        F.regexp_extract("fp", r"shard=(\d+)/", 1).cast("int").alias("p_shard"),
    )
    return (
        parsed.groupBy("lang", "shard")
        .agg(
            F.count("*").alias("n_rows"),
            (F.countDistinct("fp") >= 1).cast("long").alias("files_present"),
            F.sum(
                (
                    (F.col("p_lang") != F.col("lang"))
                    | (F.col("p_shard") != F.col("shard"))
                ).cast("int")
            )
            .cast("long")
            .alias("n_provenance_mismatches"),
        )
        .select(
            "lang",
            F.col("shard").cast("long").alias("shard"),
            "n_rows",
            "files_present",
            "n_provenance_mismatches",
        )
        # bounded result (languages x 4 shards)
        .transform(ordered_small, "lang", "shard")
    )


# ---------------------------------------------------------------------------
# BPE merge induction (q186/q187) — completes the q177 tokenizer-prep story.
# The oracle re-learns the merges in DuckDB with an UNROLLED k-stage CTE
# chain over the identical substrate, using only primitives whose semantics
# the three engines share bit-for-bit (string_split, replace, binary-collation
# ORDER BY); see s4_spark/operators/bpe.py for the single-scan merge contract.

_BPE_V, _BPE_K = 256, 8


def _bpe_learn_ctes(k: int) -> str:
    """WITH-fragments that build the merge-learning chain b0..b{k-1}."""
    parts = [
        "toks AS (SELECT lang, unnest(string_split(text, ' ')) AS w"
        " FROM documents)",
        "freq AS (SELECT w, count(*) AS n FROM toks GROUP BY w)",
        f"topv AS (SELECT w, n FROM freq ORDER BY n DESC, w LIMIT {_BPE_V})",
        "s0 AS MATERIALIZED (SELECT n,"
        " rtrim(regexp_replace(w, '(.)', '\\1 ', 'g')) AS seg FROM topv)",
    ]
    for i in range(k):
        parts += [
            f"x{i} AS (SELECT n, string_split(seg, ' ') AS sy FROM s{i})",
            f"e{i} AS (SELECT n, sy,"
            f" unnest(generate_series(1, len(sy) - 1)) AS j FROM x{i})",
            f"p{i} AS (SELECT sy[j] || ' ' || sy[j + 1] AS p, sum(n) AS c"
            f" FROM e{i} GROUP BY 1)",
            f"b{i} AS MATERIALIZED (SELECT p FROM p{i} ORDER BY c DESC, p LIMIT 1)",
            f"s{i + 1} AS MATERIALIZED (SELECT n,"
            f" rtrim(ltrim(replace(' ' || seg || ' ',"
            f" ' ' || coalesce((SELECT p FROM b{i}), chr(1)) || ' ',"
            f" ' ' || coalesce((SELECT replace(p, ' ', '') FROM b{i}), chr(1))"
            f" || ' '))) AS seg FROM s{i})",
        ]
    return ",\n    ".join(parts)


def _bpe_learn_oracle(k: int) -> str:
    ranks = "\n    UNION ALL\n    ".join(
        f"SELECT CAST({i + 1} AS BIGINT) AS merge_rank,"
        f" string_split(p, ' ')[1] AS lhs, string_split(p, ' ')[2] AS rhs,"
        f" replace(p, ' ', '') AS merged FROM b{i}"
        for i in range(k)
    )
    return (
        f"WITH {_bpe_learn_ctes(k)}\n    "
        f"SELECT * FROM (\n    {ranks}\n    ) ORDER BY merge_rank"
    )


def _bpe_apply_oracle(k: int) -> str:
    apply_chain = []
    for i in range(k):
        apply_chain.append(
            f"a{i + 1} AS MATERIALIZED (SELECT lang, cnt, n_chars,"
            f" rtrim(ltrim(replace(' ' || seg || ' ',"
            f" ' ' || coalesce((SELECT p FROM b{i}), chr(1)) || ' ',"
            f" ' ' || coalesce((SELECT replace(p, ' ', '') FROM b{i}), chr(1))"
            f" || ' '))) AS seg FROM a{i})"
        )
    chain = ",\n    ".join(apply_chain)
    return f"""
    WITH {_bpe_learn_ctes(k)},
    allw AS (SELECT lang, w, count(*) AS cnt FROM toks GROUP BY lang, w),
    a0 AS MATERIALIZED (SELECT lang, cnt, length(w) AS n_chars,
           rtrim(regexp_replace(w, '(.)', '\\1 ', 'g')) AS seg FROM allw),
    {chain}
    SELECT lang,
           CAST(sum(cnt) AS BIGINT) AS n_tokens,
           CAST(sum(cnt * n_chars) AS BIGINT) AS sum_chars,
           CAST(sum(cnt * len(string_split(seg, ' '))) AS BIGINT)
             AS sum_symbols,
           round(sum(cnt * len(string_split(seg, ' ')))
                 / CAST(sum(cnt * n_chars) AS DOUBLE), 6) AS symbols_per_char
    FROM a{k} GROUP BY lang ORDER BY lang
    """


def _bpe_substrate(spark, sf_dir):
    """Top-V (word, freq) merge-learning sample, collected driver-side.

    One partial-combined groupBy + a TakeOrdered top-V — the collect is
    V rows (256), inside the repo's bounded-driver-state budget; the
    corpus token stream itself never leaves the executors."""
    toks = t(spark, sf_dir, "documents").select(
        "lang", F.explode(F.split("text", " ")).alias("w")
    )
    freq = toks.groupBy("w").agg(F.count("*").alias("n"))
    top = freq.orderBy(F.desc("n"), "w").limit(_BPE_V).collect()
    return toks, [(r.w, r.n) for r in top]


@query(
    "q186_bpe_merge_learn",
    oracle=_bpe_learn_oracle(_BPE_K),
    section="B12-training",
)
def q186(spark, sf_dir):
    """BPE merge-sequence induction (Sennrich et al. 2016) — the
    tokenizer-prep stage q177's docstring deferred: learn the k most
    frequent symbol merges from the top-V word-frequency sample and
    emit the ordered merge table (what a tokenizer ships as
    ``merges.txt``). The loop is driver-side on V collected rows —
    q162's centroid pattern — one best-pair reduction per round; pair
    counting, tie-breaking and application follow the single-scan
    contract in s4_spark/operators/bpe.py so the DuckDB oracle can
    re-learn the identical sequence with an unrolled CTE chain.

    Scale: the distributed work is ONE token-keyed partial-agg + top-V
    (TakeOrdered); learning cost is O(k · V · avg_len) driver time,
    independent of corpus size — at 100 TB the sample simply comes from
    the same frequency table sketched over more files."""
    from s4_spark.operators.bpe import learn_merges

    _, top = _bpe_substrate(spark, sf_dir)
    merges = learn_merges(top, _BPE_K)
    rows = [(i + 1, l, r, m) for i, (l, r, m) in enumerate(merges)]
    # bounded result (k merge rows, driver-built)
    return ordered_small(
        spark.createDataFrame(
            rows, "merge_rank long, lhs string, rhs string, merged string"
        ),
        "merge_rank",
    )


@query(
    "q187_bpe_apply_compression",
    oracle=_bpe_apply_oracle(_BPE_K),
    section="B12-training",
)
def q187(spark, sf_dir):
    """Corpus-wide application of the learned BPE merges + per-language
    compression audit — the number that tells you whether a merge
    budget is adequate per language (symbols/char falls as merges
    land; 1.0 = no compression). Monotonicity of this quantity in k is
    property-tested in tests/test_bpe.py.

    Scale shape: merges apply to the DISTINCT-word table (Heaps-law
    sized), not the token stream — a chain of k codegen'd literal
    ``replace`` expressions (no UDF, no shuffle beyond the (lang, word)
    partial-agg); per-language totals then weight each word by its
    occurrence count. The token stream itself is aggregated once and
    never re-scanned per merge."""
    from s4_spark.operators.bpe import learn_merges

    toks, top = _bpe_substrate(spark, sf_dir)
    merges = learn_merges(top, _BPE_K)
    allw = toks.groupBy("lang", "w").agg(F.count("*").alias("cnt"))
    padded = F.concat(
        F.lit(" "), F.rtrim(F.regexp_replace(F.col("w"), "(.)", "$1 ")), F.lit(" ")
    )
    for left, right, merged in merges:
        padded = F.replace(
            padded, F.lit(f" {left} {right} "), F.lit(f" {merged} ")
        )
    segged = allw.select(
        "lang",
        "cnt",
        F.length("w").alias("n_chars"),
        F.size(F.split(F.trim(padded), " ")).alias("n_symbols"),
    )
    return (
        segged.groupBy("lang")
        .agg(
            F.sum("cnt").cast("long").alias("n_tokens"),
            F.sum(F.col("cnt") * F.col("n_chars")).cast("long").alias("sum_chars"),
            F.sum(F.col("cnt") * F.col("n_symbols"))
            .cast("long")
            .alias("sum_symbols"),
            F.round(
                F.sum(F.col("cnt") * F.col("n_symbols"))
                / F.sum(F.col("cnt") * F.col("n_chars")).cast("double"),
                6,
            ).alias("symbols_per_char"),
        )
        # bounded result (one row per language)
        .transform(ordered_small, "lang")
    )


_LM_V, _LM_TAU = 1000, 0.002  # smoothing pseudo-vocab, low-familiarity cut


@query(
    "q188_lm_familiarity_filter",
    oracle=f"""
    WITH ref AS (SELECT text FROM documents WHERE lang = 'en'),
    rsy AS (SELECT string_split(text, ' ') AS sy FROM ref),
    rbi AS (SELECT sy[j] AS w1, sy[j] || ' ' || sy[j + 1] AS bg
            FROM (SELECT sy, unnest(generate_series(1, len(sy) - 1)) AS j
                  FROM rsy)),
    bg_c AS (SELECT bg, count(*) AS c2 FROM rbi GROUP BY bg),
    w1_c AS (SELECT w1, count(*) AS c1 FROM rbi GROUP BY w1),
    dsy AS (SELECT doc_id, source, string_split(text, ' ') AS sy
            FROM documents),
    dbi AS (SELECT doc_id, source, sy[j] AS w1,
                   sy[j] || ' ' || sy[j + 1] AS bg
            FROM (SELECT doc_id, source, sy,
                         unnest(generate_series(1, len(sy) - 1)) AS j
                  FROM dsy)),
    scored AS (SELECT d.doc_id, d.source,
                      coalesce(b.c2, 0) AS num,
                      coalesce(w.c1, 0) + {_LM_V} AS den
               FROM dbi d
               LEFT JOIN bg_c b USING (bg)
               LEFT JOIN w1_c w USING (w1)),
    per_doc AS (SELECT doc_id, source,
                       CAST(sum(num) AS BIGINT) AS s_num,
                       CAST(sum(den) AS BIGINT) AS s_den
                FROM scored GROUP BY doc_id, source)
    SELECT source, count(*) AS n_docs,
           CAST(sum(s_num) AS BIGINT) AS sum_hits,
           CAST(sum(s_den) AS BIGINT) AS sum_mass,
           CAST(sum(CASE WHEN s_num / CAST(s_den AS DOUBLE) < {_LM_TAU}
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_flagged,
           round(sum(s_num) / CAST(sum(s_den) AS DOUBLE), 6) AS familiarity
    FROM per_doc GROUP BY source ORDER BY source
    """,
    section="B12-training",
)
def q188(spark, sf_dir):
    """Reference-LM familiarity scoring — the CCNet/LLaMA-prep quality
    gate: train a bigram model on a trusted reference slice (here the
    'en' docs), score EVERY document's n-grams against it, and flag the
    least-familiar docs per source for down-weighting/removal.

    Determinism design: classic perplexity sums per-bigram log-probs —
    doubles whose addition order differs between Spark's partial aggs
    and DuckDB, so equality would be luck. The score here is the
    integer-exact analog: per doc, Σ observed-bigram counts over
    Σ smoothed prefix mass (both BIGINT sums), with ONE double division
    at the end — IEEE division of exact integers is bit-reproducible
    cross-engine, and the filter decision (ratio < τ) is a monotone
    transform of add-one-smoothed bigram likelihood, so the ranking
    signal is the same one the log-space formulation yields.

    Scale shape: the reference LM is built from a bounded trusted slice
    (partial-agg bigram/prefix counts) and BROADCAST to the scorer; the
    corpus side is one explode + two broadcast probes + a doc-keyed
    partial agg — the token stream shuffles once (doc_id), never on the
    bigram key. A reference LM too large to broadcast falls back to a
    bigram-keyed shuffle join; CCNet itself caps the LM (sampled wiki),
    matching the broadcast path."""
    docs = t(spark, sf_dir, "documents")

    def bigrams(df, *keys):
        sy = F.split("text", " ")
        bg = F.expr(
            "zip_with(slice(sy, 1, size(sy) - 1), slice(sy, 2, size(sy) - 1),"
            " (a, b) -> concat(a, ' ', b))"
        )
        return (
            df.select(*keys, sy.alias("sy"))
            .select(*keys, F.explode(bg).alias("bg"))
            .withColumn("w1", F.split("bg", " ")[0])
        )

    ref_bi = bigrams(docs.filter(F.col("lang") == "en"))
    bg_c = ref_bi.groupBy("bg").agg(F.count("*").alias("c2"))
    w1_c = ref_bi.groupBy("w1").agg(F.count("*").alias("c1"))
    scored = (
        bigrams(docs, "doc_id", "source")
        .join(F.broadcast(bg_c), "bg", "left")
        .join(F.broadcast(w1_c), "w1", "left")
        .select(
            "doc_id",
            "source",
            F.coalesce("c2", F.lit(0)).alias("num"),
            (F.coalesce("c1", F.lit(0)) + F.lit(_LM_V)).alias("den"),
        )
    )
    per_doc = scored.groupBy("doc_id", "source").agg(
        F.sum("num").cast("long").alias("s_num"),
        F.sum("den").cast("long").alias("s_den"),
    )
    return (
        per_doc.groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("s_num").cast("long").alias("sum_hits"),
            F.sum("s_den").cast("long").alias("sum_mass"),
            F.sum(
                (
                    (F.col("s_num") / F.col("s_den").cast("double")) < _LM_TAU
                ).cast("int")
            )
            .cast("long")
            .alias("n_flagged"),
            F.round(
                F.sum("s_num") / F.sum("s_den").cast("double"), 6
            ).alias("familiarity"),
        )
        # bounded result (one row per source)
        .transform(ordered_small, "source")
    )


@query(
    "q189_dataset_card_profile",
    oracle="""
    WITH b AS (SELECT source, lang,
                      CAST(floor(log2(n_chars)) AS INT) AS len_bucket,
                      n_chars, length(string_split(text, ' ')) AS n_toks
               FROM documents WHERE n_chars > 0)
    SELECT source, len_bucket, count(*) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS sum_chars,
           CAST(sum(n_toks) AS BIGINT) AS sum_tokens,
           CAST(count(DISTINCT lang) AS BIGINT) AS n_langs
    FROM b GROUP BY source, len_bucket ORDER BY source, len_bucket
    """,
    section="B12-training",
)
def q189(spark, sf_dir):
    """Dataset-card profiling — the per-source length-distribution /
    volume / language-spread summary a corpus datasheet ships (and the
    first artifact reviewed before a mixing decision): docs bucketed by
    log2 of length (power-of-two histogram — log2 of an exact integer
    floors identically in every IEEE engine), with per-bucket doc/char/
    token volumes and per-source language spread.

    Scale shape: one narrow scan (no text materialized beyond the token
    count), one (source, bucket)-keyed partial agg; count(DISTINCT lang)
    over ≤ a handful of langs per group expands, not explodes. At
    100 TB this runs per-snapshot and diffs against the prior card —
    the drift alarm for a corpus refresh."""
    d = t(spark, sf_dir, "documents").filter(F.col("n_chars") > 0)
    b = d.select(
        "source",
        "lang",
        F.floor(F.log2("n_chars")).cast("int").alias("len_bucket"),
        "n_chars",
        F.size(F.split("text", " ")).alias("n_toks"),
    )
    return (
        b.groupBy("source", "len_bucket")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").cast("long").alias("sum_chars"),
            F.sum("n_toks").cast("long").alias("sum_tokens"),
            F.countDistinct("lang").cast("long").alias("n_langs"),
        )
        # bounded result (sources x log2 length buckets)
        .transform(ordered_small, "source", "len_bucket")
    )


@query(
    "q190_fuzzy_decontamination",
    oracle="""
    WITH w AS (SELECT doc_id, lang, string_split(text, ' ') AS w
               FROM documents),
    sh AS (SELECT doc_id, lang,
             list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2]
                            for i in range(1, len(w) - 1)]) AS ws
           FROM w),
    ev AS (SELECT * FROM sh WHERE doc_id % 5 = 0),
    co AS (SELECT * FROM sh WHERE doc_id % 5 <> 0),
    pairs AS (
      SELECT co.doc_id AS did, co.lang,
             CAST(len(list_intersect(ev.ws, co.ws)) AS DOUBLE)
               / (len(ev.ws) + len(co.ws) - len(list_intersect(ev.ws, co.ws)))
               AS jac
      FROM ev, co),
    cont AS (SELECT DISTINCT did, lang FROM pairs WHERE jac >= 0.8)
    SELECT lang, count(*) AS n_contaminated,
           CAST(sum(did) AS BIGINT) AS id_sum
    FROM cont GROUP BY lang ORDER BY lang
    """,
    section="B12-training",
)
def q190(spark, sf_dir):
    """FUZZY eval-set decontamination — the near-duplicate complement of
    q139's exact 5-gram screen: a paraphrased or lightly-edited copy of
    a benchmark item shares few exact 5-grams but keeps high shingle
    Jaccard, so exact screens miss it. Protected set = doc_id % 5 == 0
    (the stand-in benchmark); corpus docs with verified Jaccard ≥ 0.8
    against ANY protected doc are flagged per language.

    Pipeline: MinHash signatures on both sets (q111's one-SQL-string
    builder) → cross-set banded LSH join (24×4 — P(miss | jac 0.8) ≈
    3e-6, and every planted pair here sits at ≥ 0.9 where the miss
    probability is ~1e-11, so the exact all-pairs oracle is matched) →
    exact-Jaccard verification of candidates only.

    Scale shape: at 100 TB the protected side is benchmark-sized
    (thousands of docs) — its band table broadcasts, so the corpus
    streams through the probe without a corpus-wide shuffle; the
    verify stage touches candidates only (q111's semi-join prefilter).
    The shuffle never carries shingles, only 96-int signatures."""
    docs = ts(spark, sf_dir, "documents")
    ev = docs.filter(F.col("doc_id") % 5 == 0)
    corpus = docs.filter(F.col("doc_id") % 5 != 0)
    sig_e = D.with_minhash_signature(D.shingles_exploded(ev, "doc_id"), "doc_id")
    sig_c = D.with_minhash_signature(
        D.shingles_exploded(corpus, "doc_id"), "doc_id"
    )
    # no barrier: ReusedExchange dedups the double-referenced candidate
    # subtree and the lazy localCheckpoint cost a plan-to-RDD compile at
    # build (r13, same measurement as q111)
    cands = D.lsh_candidate_pairs_between(sig_e, sig_c, "doc_id")
    verified = D.verify_pairs_jaccard(cands, docs, "doc_id")
    contaminated = (
        verified.filter(F.col("jac") >= 0.8)
        .select(F.col("id_b").alias("doc_id"))
        .distinct()
    )
    return (
        contaminated.join(corpus.select("doc_id", "lang"), "doc_id")
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_contaminated"),
            F.sum("doc_id").cast("long").alias("id_sum"),
        )
        # bounded result (one row per language)
        .transform(ordered_small, "lang")
    )


@query(
    "q191_token_budget_prefix_cut",
    oracle="""
    WITH toks AS (SELECT doc_id, lang,
                         md5('budget:' || CAST(doc_id AS VARCHAR)) AS k,
                         length(string_split(text, ' ')) AS n_toks
                  FROM documents),
    tot AS (SELECT CAST(sum(n_toks) AS BIGINT) AS total FROM toks),
    cum AS (SELECT doc_id, lang, n_toks,
                   CAST(sum(n_toks) OVER (ORDER BY k, doc_id
                        ROWS UNBOUNDED PRECEDING) AS BIGINT) AS run_sum
            FROM toks),
    kept AS (SELECT * FROM cum
             WHERE run_sum * 10 <= (SELECT total FROM tot))
    SELECT lang, count(*) AS n_docs_kept,
           CAST(sum(n_toks) AS BIGINT) AS tokens_kept
    FROM kept GROUP BY lang ORDER BY lang
    """,
    section="B12-training",
)
def q191(spark, sf_dir):
    """Deterministic token-budget subsampling — fit a fixed training
    budget (here 10% of corpus tokens) by cutting a PREFIX of the
    deterministically-shuffled corpus: order docs by a seeded content
    key (q183's epoch-key construction), keep every doc whose inclusive
    running token total fits the budget. Reproducible across runs,
    retries and engines (the key and the cut are pure functions of the
    data); the budget comparison is integer-exact
    (``run_sum * 10 <= total`` — no float ratio).

    Scale shape: the running sum is the two-phase global prefix
    (operators/prefix.py — q182's machinery with a value column): range
    buckets on an integer prefix of the hash key (monotone with the
    full-key order), per-bucket parallel windows, |buckets| offsets
    driver-side. No single-reducer sort anywhere; the corpus shuffles
    once on the bucket key."""
    from s4_spark.operators.prefix import with_global_prefix

    d = t(spark, sf_dir, "documents").select(
        "doc_id",
        "lang",
        F.md5(F.concat(F.lit("budget:"), F.col("doc_id").cast("string"))).alias(
            "k"
        ),
        F.size(F.split("text", " ")).alias("n_toks"),
    )
    # lowercase-hex md5 orders identically as a string and as the
    # integer value of its head, so an 8-hex-digit prefix is a valid
    # monotone bucketing proxy for the (k, doc_id) total order
    d = d.withColumn("kp", F.conv(F.substring("k", 1, 8), 16, 10).cast("long"))
    total = d.agg(F.sum("n_toks").cast("long")).collect()[0][0]
    cum = with_global_prefix(
        d, "kp", ["k", "doc_id"], value_col="n_toks"
    )
    kept = cum.filter(F.col("run_sum") * 10 <= F.lit(total))
    return (
        kept.groupBy("lang")
        .agg(
            F.count("*").alias("n_docs_kept"),
            F.sum("n_toks").cast("long").alias("tokens_kept"),
        )
        # bounded result (one row per language)
        .transform(ordered_small, "lang")
    )


@query(
    "q195_cdc_apply",
    oracle="""
    WITH mx AS (SELECT max(doc_id) AS m FROM documents),
    updates AS (SELECT doc_id, text || ' v2' AS text, lang, 'u' AS op
                FROM documents WHERE doc_id % 7 = 0),
    deletes AS (SELECT doc_id, NULL AS text, NULL AS lang, 'd' AS op
                FROM documents WHERE doc_id % 11 = 0 AND doc_id % 7 <> 0),
    inserts AS (SELECT doc_id + (SELECT m FROM mx) + 1 AS doc_id,
                       text, lang, 'i' AS op
                FROM documents WHERE doc_id % 13 = 0),
    delta AS (SELECT * FROM updates UNION ALL SELECT * FROM deletes
              UNION ALL SELECT * FROM inserts),
    applied AS (
      SELECT coalesce(d.doc_id, s.doc_id) AS doc_id,
             CASE WHEN d.op IN ('u', 'i') THEN d.text ELSE s.text END AS text,
             CASE WHEN d.op IN ('u', 'i') THEN d.lang ELSE s.lang END AS lang
      FROM documents s FULL JOIN delta d USING (doc_id)
      WHERE d.op IS NULL OR d.op <> 'd')
    SELECT lang, count(*) AS n_docs,
           CAST(sum(length(text)) AS BIGINT) AS sum_chars,
           CAST(sum(CAST(('0x' || substr(md5(text), 1, 8)) AS BIGINT))
                AS BIGINT) AS content_fp
    FROM applied GROUP BY lang ORDER BY lang
    """,
    section="B12-training",
)
def q195(spark, sf_dir):
    """CDC delta application (MERGE-INTO semantics without a table
    format): a change feed of upserts/deletes/inserts is applied to the
    corpus snapshot in ONE full-outer join on the key — delta wins on
    update/insert, delete drops the row, untouched rows pass through.
    The complement of q151 (which DERIVES the change feed by diffing
    snapshots); together they are the refresh loop a 100 TB corpus runs
    per re-crawl. Per-lang content fingerprints (md5-prefix integer
    sums — exact cross-engine) prove the applied state, not just its
    row counts.

    Scale shape: one doc_id-keyed shuffle join (bucketed co-location at
    scale, as q151's docstring details); the delta is change-sized, so
    AQE broadcast-converts it when small. Delete/update/insert markers
    are resolved in the join projection — no second pass, no
    anti-join + union-of-three plan. The join is hinted SHUFFLE_HASH for
    the same reason as q151: a full-outer SMJ sorts BOTH sides before
    merging, and on unique uniform keys that sort buys nothing — the
    hash form skips it (q151 measured 0.33 s vs 0.81 s)."""
    docs = t(spark, sf_dir, "documents").select("doc_id", "text", "lang")
    m = docs.agg(F.max("doc_id")).collect()[0][0]
    updates = docs.filter(F.col("doc_id") % 7 == 0).select(
        "doc_id",
        F.concat("text", F.lit(" v2")).alias("text"),
        "lang",
        F.lit("u").alias("op"),
    )
    deletes = docs.filter(
        (F.col("doc_id") % 11 == 0) & (F.col("doc_id") % 7 != 0)
    ).select(
        "doc_id",
        F.lit(None).cast("string").alias("text"),
        F.lit(None).cast("string").alias("lang"),
        F.lit("d").alias("op"),
    )
    inserts = docs.filter(F.col("doc_id") % 13 == 0).select(
        (F.col("doc_id") + F.lit(m + 1)).alias("doc_id"),
        "text",
        "lang",
        F.lit("i").alias("op"),
    )
    delta = updates.unionByName(deletes).unionByName(inserts)
    s, d = docs.alias("s").hint("SHUFFLE_HASH"), delta.alias("d")
    applied = (
        s.join(d, F.col("s.doc_id") == F.col("d.doc_id"), "full_outer")
        .filter(F.col("d.op").isNull() | (F.col("d.op") != "d"))
        .select(
            F.when(
                F.col("d.op").isin("u", "i"), F.col("d.text")
            ).otherwise(F.col("s.text")).alias("text"),
            F.when(
                F.col("d.op").isin("u", "i"), F.col("d.lang")
            ).otherwise(F.col("s.lang")).alias("lang"),
        )
    )
    return (
        applied.groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(F.length("text")).cast("long").alias("sum_chars"),
            F.sum(
                F.conv(F.substring(F.md5("text"), 1, 8), 16, 10).cast("long")
            )
            .cast("long")
            .alias("content_fp"),
        )
        # bounded result (one row per language)
        .transform(ordered_small, "lang")
    )


@query(
    "q203_snapshot_index_dedup",
    oracle="""
    WITH half AS (SELECT count(*) // 2 AS h FROM documents),
    w AS (SELECT doc_id, lang, string_split(text, ' ') AS w
          FROM documents),
    sh AS (SELECT doc_id, lang,
             list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2]
                            for i in range(1, len(w) - 1)]) AS ws
           FROM w),
    old AS (SELECT * FROM sh WHERE doc_id < (SELECT h FROM half)),
    new AS (SELECT * FROM sh WHERE doc_id >= (SELECT h FROM half)),
    pairs AS (
      SELECT new.doc_id AS did, new.lang,
             CAST(len(list_intersect(old.ws, new.ws)) AS DOUBLE)
               / (len(old.ws) + len(new.ws)
                  - len(list_intersect(old.ws, new.ws))) AS jac
      FROM old, new),
    dup AS (SELECT DISTINCT did, lang FROM pairs WHERE jac >= 0.8)
    SELECT lang, count(*) AS n_new_dups,
           CAST(sum(did) AS BIGINT) AS id_sum
    FROM dup GROUP BY lang ORDER BY lang
    """,
    section="B12-training",
)
def q203(spark, sf_dir):
    """Cross-snapshot dedup against a PERSISTED LSH index — the
    production shape for a corpus that grows by snapshots: the existing
    corpus's banded MinHash index is written once
    (operators/dedup.py ``banded_signatures`` — (id, band_id, band_key)
    rows in parquet) and each new batch hashes ONLY ITSELF, probes the
    index, and exact-verifies the candidates. Re-shingling or
    re-signing the old corpus per ingest — what q111's self-join form
    would require — is O(corpus) per batch; this is O(batch + index
    probe).

    Fixture: old snapshot = doc_id < n/2, new batch = the rest (the
    planted near-dup pairs straddle the split). The index round-trips
    through parquet to prove the persisted artifact, not the in-memory
    lineage, is what gets probed; the cache guard keys on the _SUCCESS
    marker, not bare directory existence — a failed/interrupted write
    leaves a dir but no marker, and latching on the dir would silently
    probe a truncated index on every later call in the process.

    Recall contract (why the exact all-pairs oracle is matchable): the
    verify threshold is 0.8, where the 24-band/4-row scheme misses a
    qualifying pair with P ≈ 3e-6, and every planted fixture pair sits
    at jac ≥ 0.9 (miss ≈ 1e-11) — same argument as q190. At 0.5 the
    banded miss probability is ~0.2/pair and an exact oracle would be
    hash-seed luck, so that regime is deliberately out of contract.

    Scale shape: the index is laid out by (band_id, band_key) — the
    probe is a plain equi-join on uniform hash keys (bucketable on disk
    so the probe co-locates without a full index shuffle); the verify
    stage builds shingle sets for CANDIDATE docs only (semi-join
    prefilter inside verify_pairs_jaccard). The new batch never
    all-pairs-compares with the corpus; the shuffle carries band keys
    and 96-int signatures, never shingles."""
    docs = t(spark, sf_dir, "documents")
    half = docs.count() // 2
    old = docs.filter(F.col("doc_id") < half)
    new = docs.filter(F.col("doc_id") >= half)

    index_path = os.path.join(
        scratch_root(), f"lsh_index_{os.path.basename(sf_dir)}"
    )
    if not os.path.isfile(os.path.join(index_path, "_SUCCESS")):
        sig_old = D.with_minhash_signature(
            D.shingles_exploded(old, "doc_id"), "doc_id"
        )
        D.banded_signatures(sig_old, "doc_id").write.mode("overwrite").parquet(
            index_path
        )
    index = spark.read.parquet(index_path)

    sig_new = D.with_minhash_signature(
        D.shingles_exploded(new, "doc_id"), "doc_id"
    )
    probe = D.banded_signatures(sig_new, "doc_id")
    cands = (
        index.alias("a")
        .join(
            probe.alias("b"),
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_key") == F.col("b.band_key")),
        )
        .select(
            F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b")
        )
        # no barrier: ReusedExchange dedups the double-referenced
        # candidate subtree (r13, same measurement as q111)
        .distinct()
    )
    verified = D.verify_pairs_jaccard(cands, docs, "doc_id")
    dups = (
        verified.filter(F.col("jac") >= 0.8)
        .select(F.col("id_b").alias("doc_id"))
        .distinct()
    )
    return (
        dups.join(new.select("doc_id", "lang"), "doc_id")
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_new_dups"),
            F.sum("doc_id").cast("long").alias("id_sum"),
        )
        # bounded result (one row per language)
        .transform(ordered_small, "lang")
    )


@query(
    "q206_quality_classifier_filter",
    oracle="""
    WITH toks AS (SELECT doc_id, lang, unnest(string_split(text, ' ')) AS tok
                  FROM documents),
    feat AS (SELECT doc_id, lang,
                    count(*) AS n_tok,
                    count(DISTINCT tok) AS n_uniq,
                    sum(CASE WHEN tok IN ('the', 'a', 'and', 'of', 'to')
                             THEN 1 ELSE 0 END) AS n_stop
             FROM toks GROUP BY doc_id, lang),
    scored AS (SELECT doc_id, lang,
                      50 * n_stop - 4 * n_tok + 2 * n_uniq AS margin
               FROM feat)
    SELECT lang, count(*) AS n_docs,
           CAST(sum(CASE WHEN margin > 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_kept,
           CAST(sum(margin) AS BIGINT) AS margin_sum,
           CAST(sum(CASE WHEN margin > 0 THEN doc_id ELSE 0 END) AS BIGINT)
             AS kept_id_sum
    FROM scored GROUP BY lang ORDER BY lang
    """,
    section="B12-training",
)
def q206(spark, sf_dir):
    """Model-based quality filtering — the classifier-inference stage of
    a modern pretraining pipeline (fasttext/DCLM/fineweb-edu style):
    a tiny trained model's weights BROADCAST to every executor and
    applied as a pure map over the corpus; docs below the decision
    boundary drop before the expensive dedup/tokenize stages.

    The stand-in model is a linear scorer over exact token features
    (margin = 50·n_stop − 4·n_tok + 2·n_uniq, integer weights) so the
    decision boundary is integer-exact cross-engine; a real fasttext /
    logistic model is the same plan with float weights and a sigmoid —
    a monotone map that moves no row across the boundary rankings.
    Features come from one explode + groupBy(doc) pass (count, distinct
    count, stoplist membership sum) — all codegen'd builtins.

    Scale shape: feature extraction partial-aggregates per partition
    before the single doc-keyed shuffle; the model itself is bytes
    (weights in the plan as literals — the broadcast degenerate case);
    scoring and the keep/drop decision never shuffle. At 100 TB this
    is embarrassingly parallel and I/O-bound, exactly what a filter
    pass should be. The per-lang audit (kept counts, margin mass,
    kept-id checksum) is the 6-group rollup a pipeline dashboard
    reads."""
    toks = t(spark, sf_dir, "documents").select(
        "doc_id", "lang", F.explode(F.split("text", " ")).alias("tok")
    )
    stop = ["the", "a", "and", "of", "to"]
    feat = toks.groupBy("doc_id", "lang").agg(
        F.count("*").alias("n_tok"),
        F.countDistinct("tok").alias("n_uniq"),
        F.sum(F.col("tok").isin(stop).cast("int")).alias("n_stop"),
    )
    scored = feat.select(
        "doc_id",
        "lang",
        (
            50 * F.col("n_stop") - 4 * F.col("n_tok") + 2 * F.col("n_uniq")
        ).alias("margin"),
    )
    return (
        scored.groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum((F.col("margin") > 0).cast("int")).cast("long").alias("n_kept"),
            F.sum("margin").cast("long").alias("margin_sum"),
            F.sum(F.when(F.col("margin") > 0, F.col("doc_id")).otherwise(0))
            .cast("long")
            .alias("kept_id_sum"),
        )
        # bounded result (one row per language)
        .transform(ordered_small, "lang")
    )


@query(
    "q207_trigram_novelty",
    oracle="""
    WITH w AS (SELECT doc_id, lang, string_split(text, ' ') AS w
               FROM documents),
    sh AS (SELECT doc_id, lang,
             unnest(list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2]
                                   for i in range(1, len(w) - 1)])) AS g
           FROM w),
    dfc AS (SELECT g, count(*) AS df FROM sh GROUP BY g),
    per_doc AS (SELECT s.doc_id, s.lang,
                       count(*) AS total,
                       sum(CASE WHEN dfc.df = 1 THEN 1 ELSE 0 END) AS uniq
                FROM sh s JOIN dfc USING (g)
                GROUP BY s.doc_id, s.lang)
    SELECT lang, count(*) AS n_docs,
           CAST(sum(uniq) AS BIGINT) AS sum_unique,
           CAST(sum(total) AS BIGINT) AS sum_total,
           round(sum(uniq) / CAST(sum(total) AS DOUBLE), 6) AS novelty,
           CAST(sum(CASE WHEN 2 * uniq < total THEN 1 ELSE 0 END) AS BIGINT)
             AS n_derivative
    FROM per_doc GROUP BY lang ORDER BY lang
    """,
    section="B12-training",
)
def q207(spark, sf_dir):
    """Cross-document n-gram novelty — the memorization-risk /
    boilerplate signal that doc-level dedup misses: a document whose
    trigrams mostly appear in OTHER documents is template/derivative
    content even when no single pair crosses a dedup threshold.
    Per doc: the fraction of its DISTINCT trigrams that are
    corpus-unique (document frequency = 1); per lang: micro-averaged
    novelty (integer sums, ONE final division — never an average of
    per-doc float ratios, whose summation order is engine-dependent)
    and the count of derivative docs (under half their trigrams
    unique). Novelty complements q175 (within-doc repeats), q111
    (pairwise near-dup) and q203 (cross-snapshot): it is a POINTWISE
    corpus-frequency score, usable as a sampling weight (soft dedup,
    à la SemDeDup/D4 weighting) rather than a hard drop.

    Scale shape: (doc, gram)-distinct explode → gram-keyed df count
    (partial-agg compresses each partition to its distinct grams) →
    doc-keyed rollup. Two shuffles, both on uniform hash keys; grams
    could ride q175's xxhash64-int64 trick at 100 TB (ints, not
    strings, through the exchange) — kept as strings here because the
    oracle pins values, not layout."""
    docs = t(spark, sf_dir, "documents")
    sh = D.shingles_exploded(docs, "doc_id").distinct()
    dfc = sh.groupBy("shingle").agg(F.count("*").alias("df"))
    per_doc = (
        sh.join(dfc, "shingle")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("total"),
            F.sum((F.col("df") == 1).cast("int")).alias("uniq"),
        )
        .join(docs.select("doc_id", "lang"), "doc_id")
    )
    return (
        per_doc.groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("uniq").cast("long").alias("sum_unique"),
            F.sum("total").cast("long").alias("sum_total"),
            F.round(
                F.sum("uniq") / F.sum("total").cast("double"), 6
            ).alias("novelty"),
            F.sum((2 * F.col("uniq") < F.col("total")).cast("int"))
            .cast("long")
            .alias("n_derivative"),
        )
        # bounded result (one row per language)
        .transform(ordered_small, "lang")
    )


@query(
    "q212_packed_loss_masks",
    oracle="""
    WITH d AS (SELECT doc_id,
                      len(string_split(text, ' ')) AS n_tok
               FROM documents),
    pos AS (SELECT doc_id, n_tok,
                   CAST(sum(n_tok + 1) OVER (ORDER BY doc_id
                        ROWS UNBOUNDED PRECEDING) AS BIGINT) - (n_tok + 1)
                     AS start_pos
            FROM d),
    marks AS (SELECT doc_id,
                     start_pos // 128 AS start_seq,
                     (start_pos + n_tok) // 128 AS sep_seq,
                     (start_pos + n_tok) % 128 AS sep_off
              FROM pos),
    starts AS (SELECT start_seq AS seq_id, count(*) AS n_doc_starts
               FROM marks GROUP BY start_seq),
    seps AS (SELECT sep_seq AS seq_id, count(*) AS n_seps,
                    CAST(sum(sep_off) AS BIGINT) AS sep_offset_sum
             FROM marks GROUP BY sep_seq)
    SELECT coalesce(st.seq_id, sp.seq_id) AS seq_id,
           CAST(coalesce(st.n_doc_starts, 0) AS BIGINT) AS n_doc_starts,
           CAST(coalesce(sp.n_seps, 0) AS BIGINT) AS n_seps,
           CAST(coalesce(sp.sep_offset_sum, 0) AS BIGINT) AS sep_offset_sum
    FROM starts st FULL JOIN seps sp USING (seq_id)
    ORDER BY seq_id
    """,
    section="B12-training",
)
def q212(spark, sf_dir):
    """Packed-sequence LOSS-MASK construction — the per-token metadata a
    dataloader actually ships with q134's packed bins: documents
    concatenate in deterministic doc_id order with one separator token
    each, the stream chops into fixed 128-token sequences (GPT-style
    concat-then-chop), and every sequence reports its document-start
    count (attention-reset boundaries) and separator positions (the
    loss-masked offsets). Packing bugs live exactly at these
    boundaries — a dataloader that mis-slices by one token silently
    trains on separators — so the check pins the boundary positions
    themselves (offset checksums), not just bin counts.

    All arithmetic is integer-exact: doc start = running Σ(n_tok+1) via
    the shared two-phase global prefix (operators/prefix.py — q182/q191's
    machinery; NEVER a single-reducer window), then seq assignment and
    in-seq offsets are div/mod. Per-seq stats are two uniform groupBys
    on seq ids + a seq-count-sized full-outer merge.

    At 100 TB the prefix operator is the only global coordination
    (|buckets| driver-side offsets); everything downstream is
    embarrassingly parallel, and the emitted (seq_id, mask metadata)
    table is exactly what the shard exporter (q176) co-writes next to
    the token shards."""
    from s4_spark.operators.prefix import with_global_prefix

    L = 128
    d = t(spark, sf_dir, "documents").select(
        "doc_id",
        (F.size(F.split("text", " ")) + 1).alias("n_tok1"),
    )
    cum = with_global_prefix(d, "doc_id", ["doc_id"], value_col="n_tok1")
    marks = cum.select(
        "doc_id",
        (F.col("run_sum") - F.col("n_tok1")).alias("start_pos"),
        (F.col("run_sum") - 1).alias("sep_pos"),
    ).select(
        F.expr(f"start_pos div {L}").alias("start_seq"),
        F.expr(f"sep_pos div {L}").alias("sep_seq"),
        F.expr(f"sep_pos % {L}").alias("sep_off"),
    )
    starts = marks.groupBy(F.col("start_seq").alias("seq_id")).agg(
        F.count("*").alias("n_doc_starts")
    )
    seps = marks.groupBy(F.col("sep_seq").alias("seq_id")).agg(
        F.count("*").alias("n_seps"),
        F.sum("sep_off").cast("long").alias("sep_offset_sum"),
    )
    return (
        starts.join(seps, "seq_id", "full")
        .select(
            "seq_id",
            F.coalesce("n_doc_starts", F.lit(0)).cast("long").alias(
                "n_doc_starts"
            ),
            F.coalesce("n_seps", F.lit(0)).cast("long").alias("n_seps"),
            F.coalesce("sep_offset_sum", F.lit(0)).cast("long").alias(
                "sep_offset_sum"
            ),
        )
        .orderBy("seq_id")
    )


@query(
    "q215_per_group_regression",
    oracle="""
    WITH d AS (SELECT lang,
                      CAST(len(string_split(text, ' ')) AS BIGINT) AS x,
                      CAST(length(text) AS BIGINT) AS y
               FROM documents),
    s AS (SELECT lang, count(*) AS n,
                 CAST(sum(x) AS BIGINT) AS sx,
                 CAST(sum(y) AS BIGINT) AS sy,
                 CAST(sum(x * y) AS BIGINT) AS sxy,
                 CAST(sum(x * x) AS BIGINT) AS sxx
          FROM d GROUP BY lang)
    SELECT lang, n,
           round((n * sxy - sx * sy)
                 / CAST(NULLIF(n * sxx - sx * sx, 0) AS DOUBLE), 6) AS slope,
           round((sy * sxx - sx * sxy)
                 / CAST(NULLIF(n * sxx - sx * sx, 0) AS DOUBLE), 6)
             AS intercept
    FROM s ORDER BY lang
    """,
    section="B12-training",
)
def q215(spark, sf_dir):
    """Per-group closed-form model fit — distributed OLS of chars on
    tokens per language, the aggregate-only form of grouped model
    fitting: the fit reduces to five integer sufficient statistics per
    group (n, Σx, Σy, Σxy, Σx²), each a partial-aggregated sum, and the
    slope/intercept are ONE final IEEE division each (the repo's
    cross-engine float rule — never sum doubles, divide once at the
    end). Chars-per-token slope per language is the drift diagnostic a
    corpus pipeline tracks across snapshots: a slope shift flags a
    tokenizer or source-mix change before it reaches training.

    The contrast with q103 (applyInPandas grouped-map) is the point:
    when a model has a sufficient-statistic form, fit it as an
    AGGREGATION — the shuffle carries 5 longs per (partition, group)
    and no group ever materializes on one worker; reach for grouped
    Pandas only when the model genuinely needs the group's rows (and
    then a giant group is a real memory wall). At 100 TB this fit is
    exactly as scalable as a groupBy count."""
    d = t(spark, sf_dir, "documents").select(
        "lang",
        F.size(F.split("text", " ")).cast("long").alias("x"),
        F.length("text").cast("long").alias("y"),
    )
    s = d.groupBy("lang").agg(
        F.count("*").alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("long").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
    )
    # det == 0 (a group with one doc, or zero x-variance) must yield
    # NULL, not a runtime error: Spark 4's ANSI default makes /0 THROW,
    # killing every other group's result; the oracle NULLIFs the same
    # denominator so both engines agree on NULL.
    det = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    safe_det = F.when(det != 0, det.cast("double"))
    return s.select(
        "lang",
        "n",
        F.round(
            (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy"))
            / safe_det,
            6,
        ).alias("slope"),
        F.round(
            (F.col("sy") * F.col("sxx") - F.col("sx") * F.col("sxy"))
            / safe_det,
            6,
        ).alias("intercept"),
        # bounded result (one row per language)
    ).transform(ordered_small, "lang")


@query(
    "q216_contrastive_pair_mining",
    oracle="""
    WITH w AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
    sh AS (SELECT doc_id,
             list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2]
                            for i in range(1, len(w) - 1)]) AS ws
           FROM w),
    pairs AS (
      SELECT a.doc_id AS anchor_id, b.doc_id AS positive_id
      FROM sh a JOIN sh b ON a.doc_id < b.doc_id
      WHERE CAST(len(list_intersect(a.ws, b.ws)) AS DOUBLE)
              / (len(a.ws) + len(b.ws) - len(list_intersect(a.ws, b.ws)))
            >= 0.8),
    anchors AS (SELECT anchor_id, min(positive_id) AS positive_id
                FROM pairs GROUP BY anchor_id),
    nb AS (SELECT greatest(1, count(*) // 64) AS b FROM documents),
    cands AS (
      SELECT an.anchor_id, an.positive_id, d.doc_id AS cand,
             md5(CAST(an.anchor_id AS VARCHAR) || ':'
                 || CAST(d.doc_id AS VARCHAR)) AS k
      FROM anchors an, documents d, nb
      WHERE (('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 12))::BIGINT
               % nb.b)
          = (('0x' || substr(md5(CAST(an.anchor_id AS VARCHAR)), 1, 12))::BIGINT
               % nb.b)
        AND d.doc_id <> an.anchor_id AND d.doc_id <> an.positive_id
        AND NOT EXISTS (SELECT 1 FROM pairs p
                        WHERE (p.anchor_id = an.anchor_id
                               AND p.positive_id = d.doc_id)
                           OR (p.positive_id = an.anchor_id
                               AND p.anchor_id = d.doc_id))),
    ranked AS (
      SELECT anchor_id, positive_id, cand,
             row_number() OVER (PARTITION BY anchor_id ORDER BY k, cand)
               AS neg_rank
      FROM cands)
    SELECT anchor_id, positive_id, CAST(neg_rank AS BIGINT) AS neg_rank,
           cand AS negative_id
    FROM ranked WHERE neg_rank <= 3
    ORDER BY anchor_id, neg_rank
    """,
    section="B12-training",
)
def q216(spark, sf_dir):
    """Contrastive training-pair mining — the dataset-construction stage
    for embedding/retrieval model training (DPR/SimCLR shape): every
    anchor
    needs a POSITIVE (a verified near-duplicate — the LSH stack's
    output becomes supervision, not just a dedup decision) and k
    deterministic NEGATIVES (md5(anchor:candidate)-ranked, so the pair
    set is reproducible across runs/retries and never leaks a known
    near-dup in as a false negative).

    Positives: q111's banded-LSH candidates, exact-verified at ≥ 0.8
    (recall argument as q203: planted pairs sit ≥ 0.9, banded miss
    ~1e-11); anchor = the smaller id, positive = its smallest verified
    partner. Negatives: hash-ranked over the corpus minus self,
    positive, and ANY verified near-dup of the anchor.

    Scale shape — hash-bucketed per-anchor pools (round-8 rework): the
    round-7 formulation drew every anchor's negatives from the WHOLE
    corpus (anchor × corpus crossJoin), and since the anchor count is
    itself corpus-proportional the pool was QUADRATIC — the r8 ×10
    sweep measured it at 7.6 s → 116.6 s (15.4× for 10× data: 2,440
    anchors × 50k docs = 122M generated+md5-hashed rows, the one entry
    left brushing the outlier line after the q122/q141 fixes). Now the
    corpus is split into B = max(1, N/64) buckets on an md5-prefix of
    doc_id (operators/corpus.hash_bucket, same arithmetic in the DuckDB
    oracle) and each anchor draws negatives ONLY from its own bucket
    (~64 docs regardless of N), so the pool is A×64 — linear — via an
    EQUI-join on the bucket key that BROADCASTS the pair-sized anchor
    table and never shuffles the corpus. Per-anchor hash-ranking within
    the pool is unchanged (reproducible, near-dup-excluding), the pool
    stays corpus-uniform because bucket membership is a content hash,
    and the per-anchor top-3 still compiles to WindowGroupLimit below
    the one anchor-keyed exchange (both pinned in tests/test_plans.py).
    The driver count() for B is one bounded scalar, same pattern as
    q191's offsets.

    Bucket-key space (r8 advice): the md5 prefix is 12 hex digits =
    16^12 ≈ 2.8e14 values (the 6-digit default saturates at N ≈ 1.07e9
    docs, where N/64 buckets exceed 16.7M keys and pools silently grow
    ∝ N/16.7M again); 12 digits push saturation to N ≈ 1.8e16 —
    four decades past the ~5e10 docs of the 100 TB mandate — and keep
    modulo bias negligible (buckets ≪ key space). The DuckDB oracle
    mirrors the 12-digit arithmetic.

    Declared trade vs the round-7 whole-corpus pool (r8 advice): an
    anchor whose ~64-doc bucket holds fewer than 3 eligible candidates
    (after excluding self, its positive, and its verified near-dups)
    emits fewer than 3 negatives — the whole-corpus pool guaranteed 3.
    With corpus-uniform hash bucketing the pool is short only when a
    bucket is pathologically dup-dense; a consumer needing a hard
    3-negative floor should raise the per-bucket target (N/256 buckets
    → ~256-doc pools) and pay the proportional pool cost."""
    docs = t(spark, sf_dir, "documents")
    sig = D.with_minhash_signature(D.shingles_exploded(docs, "doc_id"), "doc_id")
    cands = D.lsh_candidate_pairs(sig, "doc_id")
    verified = (
        D.verify_pairs_jaccard(cands, docs, "doc_id")
        .filter(F.col("jac") >= 0.8)
        .select("id_a", "id_b")
    )
    anchors = (
        verified.groupBy(F.col("id_a").alias("anchor_id"))
        .agg(F.min("id_b").alias("positive_id"))
    )
    # every verified near-dup of an anchor (either direction) is banned
    # from its negative pool
    banned = verified.unionByName(
        verified.select(
            F.col("id_b").alias("id_a"), F.col("id_a").alias("id_b")
        )
    ).select(F.col("id_a").alias("anchor_id"), F.col("id_b").alias("banned_id"))
    n_buckets = max(1, docs.count() // 64)
    pool_docs = docs.select(
        F.col("doc_id").alias("cand"),
        C.hash_bucket(
            F.col("doc_id").cast("string"), n_buckets, hex_digits=12
        ).alias("nb"),
    )
    pool = (
        F.broadcast(
            anchors.withColumn(
                "nb",
                C.hash_bucket(
                    F.col("anchor_id").cast("string"), n_buckets, hex_digits=12
                ),
            )
        )
        .join(pool_docs, "nb")
        .filter(
            (F.col("cand") != F.col("anchor_id"))
            & (F.col("cand") != F.col("positive_id"))
        )
        .alias("p")
        .join(
            F.broadcast(banned).alias("bn"),
            (F.col("p.anchor_id") == F.col("bn.anchor_id"))
            & (F.col("p.cand") == F.col("bn.banned_id")),
            "left_anti",
        )
        .withColumn(
            "k",
            F.md5(
                F.concat(
                    F.col("anchor_id").cast("string"),
                    F.lit(":"),
                    F.col("cand").cast("string"),
                )
            ),
        )
    )
    w = Window.partitionBy("anchor_id").orderBy("k", "cand")
    return (
        pool.withColumn("neg_rank", F.row_number().over(w))
        .filter(F.col("neg_rank") <= 3)
        .select(
            "anchor_id",
            "positive_id",
            F.col("neg_rank").cast("long").alias("neg_rank"),
            F.col("cand").alias("negative_id"),
        )
        .orderBy("anchor_id", "neg_rank")
    )


@query(
    "q221_domain_quality_propagation",
    oracle="""
    WITH d AS (
      SELECT lang, source, len(string_split(text, ' ')) AS n_tok
      FROM documents),
    src AS (
      SELECT source,
             CAST(CAST(SUM(n_tok) AS BIGINT) AS DOUBLE)
               / count(*) AS src_avg
      FROM d GROUP BY source),
    g AS (
      SELECT CAST(CAST(SUM(n_tok) AS BIGINT) AS DOUBLE)
               / count(*) AS g_avg
      FROM d),
    flagged AS (
      SELECT d.lang,
             CASE WHEN s.src_avg >= 0.95 * g.g_avg THEN 1 ELSE 0 END
               AS keep
      FROM d JOIN src s ON d.source = s.source CROSS JOIN g)
    SELECT lang, count(*) AS n_docs,
           CAST(sum(keep) AS BIGINT) AS n_kept
    FROM flagged GROUP BY lang ORDER BY lang
    """,
    section="B12-training",
)
def q221(spark, sf_dir):
    """Domain-level quality propagation (RefinedWeb/CCNet-style host
    filtering): a document's fate depends on its SOURCE's aggregate
    quality, not just its own — sources whose mean token count falls
    below 95% of the corpus mean are dropped wholesale. This catches
    boilerplate farms whose individual pages each look plausible.

    Scale shape: doc-level token counts are codegen'd builtins; the
    per-source stats collapse to |sources| rows via partial+final agg,
    and the corpus mean to ONE row — both then broadcast back onto the
    document scan (explicit F.broadcast), so the only full-data shuffle
    is the final per-lang agg of partials. The quality signal is a
    ratio of exact integer sums (one division), so the 0.95-threshold
    comparison is bit-identical across engines; at 100 TB the same
    two-level "aggregate up to the domain, broadcast the verdict back
    down" needs no change — |domains| << |docs| always."""
    d = t(spark, sf_dir, "documents").select(
        "lang", "source", F.size(F.split("text", " ")).alias("n_tok")
    )
    src = d.groupBy("source").agg(
        (F.sum("n_tok").cast("double") / F.count("*")).alias("src_avg")
    )
    g = d.agg(
        (F.sum("n_tok").cast("double") / F.count("*")).alias("g_avg")
    )
    flagged = (
        d.join(F.broadcast(src), "source")
        .crossJoin(F.broadcast(g))
        .select(
            "lang",
            (F.col("src_avg") >= 0.95 * F.col("g_avg"))
            .cast("int")
            .alias("keep"),
        )
    )
    return (
        flagged.groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("keep").cast("long").alias("n_kept"),
        )
        # bounded result (one row per language)
        .transform(ordered_small, "lang")
    )


@query(
    "q225_rank_blend_quality",
    oracle="""
    WITH sig AS (
      SELECT doc_id, lang, n_chars,
             CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
               / len(string_split(text, ' ')) AS ttr
      FROM documents),
    ranked AS (
      SELECT doc_id, lang,
             percent_rank() OVER (PARTITION BY lang ORDER BY n_chars)
               AS pr_len,
             percent_rank() OVER (PARTITION BY lang ORDER BY ttr)
               AS pr_ttr
      FROM sig),
    blended AS (
      SELECT doc_id, lang,
             (pr_len + pr_ttr) / 2 AS blend,
             row_number() OVER (PARTITION BY lang
               ORDER BY (pr_len + pr_ttr) / 2 DESC, doc_id) AS rn
      FROM ranked)
    SELECT lang, doc_id, round(blend, 6) AS blend
    FROM blended WHERE rn <= 5 ORDER BY lang, doc_id
    """,
    section="B12-training",
)
def q225(spark, sf_dir):
    """Rank-blended quality scoring: two raw quality signals on
    incomparable scales (document length, type-token ratio) are each
    percent-rank-normalized WITHIN language, then averaged — the
    scale-free signal fusion that makes a length signal and a ratio
    signal addable without hand-tuned weights, and keeps one language's
    distribution from dominating another's (FineWeb-style per-language
    calibration). Top-5 per language by the blend.

    Scale shape: all three windows (two percent_ranks, the top-5
    row_number) share the lang partition, so ONE shuffle on lang
    carries every window sort; the rn<=5 filter compiles to
    WindowGroupLimit, which caps each lang's sorted run at 5 rows
    before the row_number window materializes (the blend is computed
    post-shuffle, so the limit cannot move below the exchange — but
    the exchange is shared with the rank windows, costing nothing
    extra). Ranks are rational values (k/(n-1)) computed identically in both
    engines; ties in a signal get identical percent_rank by
    definition, and the final order is doc_id-tie-broken."""
    sig = t(spark, sf_dir, "documents").select(
        "doc_id",
        "lang",
        "n_chars",
        (
            F.size(F.array_distinct(F.split("text", " "))).cast("double")
            / F.size(F.split("text", " "))
        ).alias("ttr"),
    )
    wl = Window.partitionBy("lang")
    ranked = sig.select(
        "doc_id",
        "lang",
        F.percent_rank().over(wl.orderBy("n_chars")).alias("pr_len"),
        F.percent_rank().over(wl.orderBy("ttr")).alias("pr_ttr"),
    )
    blend = ((F.col("pr_len") + F.col("pr_ttr")) / 2).alias("blend")
    blended = ranked.select("doc_id", "lang", blend).select(
        "doc_id",
        "lang",
        "blend",
        F.row_number()
        .over(wl.orderBy(F.col("blend").desc(), "doc_id"))
        .alias("rn"),
    )
    return (
        blended.filter(F.col("rn") <= 5)
        .select("lang", "doc_id", F.round("blend", 6).alias("blend"))
        .orderBy("lang", "doc_id")
    )


@query(
    "q228_weighted_sample",
    oracle="""
    WITH keyed AS (
      SELECT doc_id, lang, n_chars,
             round(
               ln((('0x' || substr(md5(text), 1, 12))::BIGINT + 0.5)
                  / 281474976710656.0) / greatest(n_chars, 1),
               6) + 0.0 AS es_key
      FROM documents)
    SELECT doc_id, lang, n_chars, es_key
    FROM keyed ORDER BY es_key DESC, doc_id LIMIT 10
    """,
    section="B12-training",
)
def q228(spark, sf_dir):
    """Deterministic weighted sampling WITHOUT replacement (Efraimidis-
    Spirakis A-ES): each doc draws a content-hash uniform u in (0,1)
    and ranks by ln(u)/weight (monotone-equivalent to the classic
    u^(1/w) key); the top-k ranked docs ARE a weighted sample without
    replacement, here weighted by n_chars so longer documents are
    proportionally likelier — the length-weighted corpus subsampling
    that uniform row sampling (q132) cannot express.

    The uniform comes from the md5-prefix hash (corpus.hash_bucket's
    48-bit extension), NOT rand(): task retries, re-runs, and engines
    agree on every draw, so the sample is reproducible — the same
    idempotence argument as q132/q178. Keys are rounded to 6 dp BEFORE
    ranking on both engines (ln is the one non-correctly-rounded libm
    call in the pipeline; at 6 dp the JVM and C library agree, and any
    rounding tie breaks on doc_id identically).

    Scale shape: the key is a narrow per-row projection (no shuffle);
    top-k compiles to TakeOrderedAndProject — per-partition heaps of k,
    never a global sort. At 100 TB this is one scan + a k-row result,
    and per-stratum variants just add the stratum to a window
    partitionBy."""
    u = (
        F.conv(F.substring(F.md5("text"), 1, 12), 16, 10).cast("double")
        + 0.5
    ) / F.lit(281474976710656.0)
    keyed = t(spark, sf_dir, "documents").select(
        "doc_id",
        "lang",
        "n_chars",
        # greatest(.,1): ANSI mode throws on /0 — a zero-length doc
        # (possible on other corpora) must degrade to weight 1, not
        # kill the job (SCALE.md division audit).
        # + 0.0 canonicalizes IEEE signed zero: a tiny negative key
        # rounds to -0.0 in DuckDB but +0.0 in Spark (BigDecimal
        # HALF_UP), and the driver's string compare sees them differ.
        (
            F.round(F.log(u) / F.greatest(F.col("n_chars"), F.lit(1)), 6)
            + F.lit(0.0)
        ).alias("es_key"),
    )
    return keyed.orderBy(F.col("es_key").desc(), "doc_id").limit(10)


@query(
    "q233_training_pipeline_e2e",
    oracle="""
    WITH q AS (
      SELECT doc_id, lang, source, text,
             len(string_split(text, ' ')) AS n_tok,
             CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
               / len(string_split(text, ' ')) AS ttr
      FROM documents),
    f AS (SELECT * FROM q WHERE n_tok >= 20 AND ttr >= 0.25),
    src AS (
      SELECT source,
             CAST(CAST(SUM(n_tok) AS BIGINT) AS DOUBLE) / count(*) AS savg
      FROM f GROUP BY source),
    g AS (
      SELECT CAST(CAST(SUM(n_tok) AS BIGINT) AS DOUBLE) / count(*) AS gavg
      FROM f),
    dom AS (
      SELECT f.* FROM f JOIN src ON f.source = src.source CROSS JOIN g
      WHERE src.savg >= 0.95 * g.gavg),
    dd AS (
      SELECT * FROM dom
      WHERE doc_id IN (SELECT min(doc_id) FROM dom GROUP BY md5(text))),
    sp AS (
      SELECT lang, n_tok,
             CASE WHEN (('0x' || substr(md5(text), 1, 6))::BIGINT % 1000)
                       < 900
                  THEN 'train' ELSE 'val' END AS split
      FROM dd)
    SELECT split, lang, count(*) AS n_docs,
           CAST(SUM(n_tok) AS BIGINT) AS sum_tokens
    FROM sp GROUP BY split, lang ORDER BY split, lang
    """,
    section="B12-training",
)
def q233(spark, sf_dir):
    """End-to-end training-corpus pipeline, second flagship beside q130:
    doc-level quality gate (length + type-token ratio) → domain-level
    quality propagation (q221's rule over the SURVIVORS — stage order
    matters: a domain is judged on its post-filter docs) → exact dedup
    (keep lowest doc_id per content hash) → deterministic train/val
    split (q132/q178's content-hash buckets) → per-(split, lang)
    counts and token volume. The oracle rebuilds all five stages as
    CTEs, so the hash match certifies the COMPOSITION, not just each
    stage alone — the class of bug it catches is a stage reordering or
    a filter applied to the wrong frame, which per-stage oracles can't.

    Scale shape: one doc-sized scan feeds everything; the two quality
    verdicts broadcast back (|sources| + 1 rows); dedup is one
    md5-keyed partial+final agg and a left-semi join on doc_id (the
    kept-id set, AQE-broadcast when small); the split adds no shuffle
    (hash bucket is a projection). Nothing in the chain materializes —
    Catalyst pipelines the five stages into one job."""
    d = t(spark, sf_dir, "documents")
    w = F.split("text", " ")
    q = d.select(
        "doc_id",
        "lang",
        "source",
        "text",
        F.size(w).alias("n_tok"),
        (F.size(F.array_distinct(w)).cast("double") / F.size(w)).alias("ttr"),
    )
    f = q.filter((F.col("n_tok") >= 20) & (F.col("ttr") >= 0.25))
    src = f.groupBy("source").agg(
        (F.sum("n_tok").cast("double") / F.count("*")).alias("savg")
    )
    g = f.agg((F.sum("n_tok").cast("double") / F.count("*")).alias("gavg"))
    dom = (
        f.join(F.broadcast(src), "source")
        .crossJoin(F.broadcast(g))
        .filter(F.col("savg") >= 0.95 * F.col("gavg"))
    )
    keeps = (
        dom.groupBy(F.md5("text").alias("h"))
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id")
    )
    dd = dom.join(keeps, "doc_id", "left_semi")
    sp = dd.select(
        "lang",
        "n_tok",
        F.when(C.hash_bucket(F.col("text")) < 900, "train")
        .otherwise("val")
        .alias("split"),
    )
    return (
        sp.groupBy("split", "lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tok").cast("long").alias("sum_tokens"),
        )
        # bounded result (splits x languages)
        .transform(ordered_small, "split", "lang")
    )


@query(
    "q253_chi2_token_association",
    # Contingency cells stay integers; every product is computed in
    # DECIMAL(38,0) (exact in both engines) and only the FINAL chi2
    # ratio touches IEEE doubles — the same correctly-rounded
    # decimal->double conversion on both sides, then round(6).
    oracle="""
    WITH pres AS (
      SELECT DISTINCT doc_id, lang = 'en' AS is_en, tok
      FROM (SELECT doc_id, lang, unnest(string_split(text, ' ')) AS tok
            FROM documents)
      WHERE tok <> ''
    ),
    tot AS (SELECT count(*) AS n,
                   sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS n_en
            FROM documents),
    cells AS (
      SELECT tok,
             sum(CASE WHEN is_en THEN 1 ELSE 0 END)::BIGINT AS a,
             sum(CASE WHEN is_en THEN 0 ELSE 1 END)::BIGINT AS b
      FROM pres GROUP BY tok
    ),
    chi AS (
      SELECT tok, a, b, n_en - a AS c, n - n_en - b AS d,
             round(CAST(CAST(n AS DECIMAL(38,0))
                        * (CAST(a AS DECIMAL(38,0))*d - CAST(b AS DECIMAL(38,0))*c)
                        * (CAST(a AS DECIMAL(38,0))*d - CAST(b AS DECIMAL(38,0))*c)
                        AS DOUBLE)
                   / CAST(NULLIF(CAST(a+b AS DECIMAL(38,0)) * (c+d)
                                 * (a+c) * (b+d), 0) AS DOUBLE), 6) AS chi2
      FROM cells, tot
    )
    SELECT tok, a AS n_en_with, b AS n_rest_with, chi2
    FROM chi ORDER BY chi2 DESC, tok LIMIT 20
    """,
    section="B12-training",
)
def q253(spark, sf_dir):
    """Chi-square feature selection — which tokens are most associated
    with a document class (here lang='en' vs rest): the classic filter
    step before training a quality/domain classifier on corpus text
    (select the k most class-discriminative n-grams as features). For
    each token the 2x2 contingency table is [docs-with-token x class]:
    a = en docs containing it, b = other docs containing it, c/d the
    complements; chi2 = N*(ad-bc)^2 / ((a+b)(c+d)(a+c)(b+d)).

    Scale shape: presence (not frequency) is established JVM-side with
    ZERO dedup shuffle — ``array_distinct`` before the explode makes
    (doc, tok) pairs unique by construction (doc_id is the table's key,
    so within-doc repeats are the only duplicate source), where a
    post-explode DISTINCT would add a full-width (doc, is_en, tok)
    exchange ahead of the tok one (plan-pinned: the only
    hashpartitioning exchange in the plan is tok-keyed). The per-token
    contingency row is then one partial-aggregated tok-keyed
    conditional-sum shuffle, and the corpus totals (N, N_en) are a
    1-row broadcast joined onto the per-token table. All contingency
    math stays in exact DECIMAL(38,0) until one final double division,
    so the ranking cannot flip on float noise; top-20 ties break on the
    token itself. At 100 TB this is the same two-pass shape as q115's
    document-frequency top-k with an extra broadcast — no all-pairs, no
    driver state."""
    docs = t(spark, sf_dir, "documents")
    pres = (
        docs.select(
            "doc_id",
            (F.col("lang") == "en").alias("is_en"),
            F.explode(F.array_distinct(F.split("text", " "))).alias("tok"),
        )
        .filter(F.col("tok") != "")
    )
    cells = pres.groupBy("tok").agg(
        F.sum(F.col("is_en").cast("int")).cast("long").alias("a"),
        F.sum((~F.col("is_en")).cast("int")).cast("long").alias("b"),
    )
    tot = docs.agg(
        F.count("*").alias("n"),
        F.sum((F.col("lang") == "en").cast("int")).cast("long").alias("n_en"),
    )
    dec = "decimal(38,0)"
    j = cells.crossJoin(F.broadcast(tot))
    chi = j.select(
        "tok",
        "a",
        "b",
        (F.col("n_en") - F.col("a")).alias("c"),
        (F.col("n") - F.col("n_en") - F.col("b")).alias("d"),
        "n",
    ).select(
        "tok",
        "a",
        "b",
        F.round(
            (
                F.col("n").cast(dec)
                * (F.col("a").cast(dec) * F.col("d") - F.col("b").cast(dec) * F.col("c"))
                * (F.col("a").cast(dec) * F.col("d") - F.col("b").cast(dec) * F.col("c"))
            ).cast("double")
            / F.nullif(
                (
                    (F.col("a") + F.col("b")).cast(dec)
                    * (F.col("c") + F.col("d"))
                    * (F.col("a") + F.col("c"))
                    * (F.col("b") + F.col("d"))
                ),
                F.lit(0).cast(dec),
            ).cast("double"),
            6,
        ).alias("chi2"),
    )
    return (
        chi.select(
            "tok",
            F.col("a").alias("n_en_with"),
            F.col("b").alias("n_rest_with"),
            "chi2",
        )
        .orderBy(F.col("chi2").desc(), "tok")
        .limit(20)
    )
