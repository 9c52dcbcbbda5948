"""Text analysis operators for LLM-data pipelines (SURVEY.md §2-B11 Q114-
Q115 and the training-data mandate): token counting, quality scoring,
language-ID, document fingerprinting. All JVM-side expressions.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# BPE-ish pre-tokenizer: word pieces, numbers, or single non-space symbols
# (the GPT-2 pre-tokenizer shape, simplified to what a regex can express).
BPE_ISH_PATTERN = r"[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]"


def whitespace_tokens(text: Column) -> Column:
    return F.split(text, " ")


def bpe_ish_tokens(text: Column) -> Column:
    # group index 0 = whole match (the pattern has no capture groups)
    return F.regexp_extract_all(text, F.lit(BPE_ISH_PATTERN), F.lit(0))


def quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Deterministic quality signals: length, token stats, punctuation and
    stopword ratios, mean word length — the standard pre-filter features
    for web-scale corpus cleaning."""
    text = F.col(text_col)
    toks = whitespace_tokens(text)
    n_tok = F.size(toks)
    stop = F.array(*[F.lit(w) for w in ("the", "a", "and", "of", "to")])
    n_stop = F.size(F.array_intersect(F.array_distinct(toks), stop))
    return (
        df.withColumn("n_chars_calc", F.length(text))
        .withColumn("n_tokens", n_tok)
        .withColumn(
            "mean_word_len",
            F.round((F.length(text) - (n_tok - 1)).cast("double") / n_tok, 6),
        )
        .withColumn(
            "punct_ratio",
            F.round(
                (
                    F.length(text)
                    - F.length(F.regexp_replace(text, r"[^\w\s]", ""))
                ).cast("double")
                / F.length(text),
                6,
            ),
        )
        .withColumn("n_stopword_kinds", n_stop)
    )


def lang_word_profiles(docs: DataFrame, text_col: str = "text",
                       lang_col: str = "lang") -> DataFrame:
    """Per-language word-frequency profile learned from labeled docs:
    P(word | lang) with add-one smoothing, as (lang, word, logp) rows."""
    words = docs.select(
        F.col(lang_col), F.explode(whitespace_tokens(F.col(text_col))).alias("w")
    )
    counts = words.groupBy(lang_col, "w").agg(F.count("*").alias("c"))
    totals = words.groupBy(lang_col).agg(F.count("*").alias("tot"))
    return counts.join(totals, lang_col).select(
        lang_col,
        "w",
        F.log((F.col("c") + 1).cast("double") / (F.col("tot") + 1)).alias("logp"),
    )


def predict_lang(docs: DataFrame, profiles: DataFrame, id_col: str = "doc_id",
                 text_col: str = "text") -> DataFrame:
    """Naive-Bayes language ID: argmax_lang Σ log P(word|lang). The profile
    table is small (|langs| × |vocab|) — broadcast join, no shuffle of the
    corpus side beyond the explode/agg."""
    words = docs.select(
        F.col(id_col), F.explode(whitespace_tokens(F.col(text_col))).alias("w")
    )
    scored = (
        words.join(F.broadcast(profiles), "w")
        .groupBy(id_col, "lang")
        .agg(F.round(F.sum(F.col("logp")), 9).alias("score"))
    )
    from pyspark.sql import Window

    w = Window.partitionBy(id_col).orderBy(F.col("score").desc(), F.col("lang"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(id_col, F.col("lang").alias("pred_lang"), "score")
    )


def rolling_hash_fingerprint(text: Column, mod: int = 1 << 31) -> Column:
    """Polynomial rolling hash h = (h*31 + code) % 2^31 over characters —
    a deterministic document fingerprint computable by any engine (the
    oracle mirrors it with list_reduce)."""
    chars = F.split(text, "")
    return F.aggregate(
        chars,
        F.lit(0).cast("long"),
        lambda acc, c: (acc * 31 + F.ascii(c)) % F.lit(mod),
    )
