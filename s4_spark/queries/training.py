"""Training-data pipeline queries (q131-q138) — the corpus-preparation
stages a 100 TB LLM data pipeline runs between raw ingest (the
reference's whole job, /root/reference/main.go:106-140) and tokenized
shards: chunking, deterministic sampling/mixing, sequence packing, PII
redaction, embedding quantization, tf-idf retrieval.

Every query is a thin aggregation over one operator in
``s4_spark.operators.corpus`` so the oracle checks the operator's full
row-level output (the aggregate hash only matches if every per-row value
matches).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from s4_spark.operators import corpus as C
from s4_spark.queries.helpers import t
from s4_spark.queries.registry import query

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
        .orderBy("lang")
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
        .orderBy("lang")
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
        .orderBy("mixture")
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
    d = t(spark, sf_dir, "documents")
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
        .orderBy("lang")
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
    label — integer-exact, so any single-element mismatch flips the hash."""
    e = t(spark, sf_dir, "embeddings")
    q = e.select("label", C.quantize_embedding(F.col("embedding")).alias("qv"))
    ex = q.select("label", F.explode("qv").alias("qi"))
    return (
        ex.groupBy("label")
        .agg(
            (F.count("*") / 64).cast("long").alias("n_vecs"),
            F.sum("qi").cast("long").alias("sum_q"),
            F.sum((F.abs(F.col("qi")) == 127).cast("int"))
            .cast("long")
            .alias("n_saturated"),
        )
        .orderBy("label")
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
