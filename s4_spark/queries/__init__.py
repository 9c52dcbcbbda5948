"""Declared query surface. Importing this package populates the registry."""

from s4_spark.queries.registry import REGISTRY, oracle_sql, queries, query  # noqa: F401

# Each import registers its family's queries (SURVEY.md §2-B sections).
from s4_spark.queries import (  # noqa: F401,E402
    scans,
    filters,
    joins,
    aggregates,
    windows,
    setops,
    functions,
    udfs,
    llm,
    streaming,
    training,
)

# The round driver oracle-checks the FIRST 50 registry entries only; module
# import order alone put scans/filters/joins/aggregates there, so windows,
# setops, functions, streaming, UDFs and the entire LLM/training surface
# never had a driver-verified row (round-2 finding: the streaming family
# broke and the driver gate stayed green). DRIVER_WINDOW pins a curated
# sample — every §2-B family represented, all entries oracle-backed, all
# outputs hashable scalars (the driver's pandas hash cannot sort/hash
# array, map, or binary cells) — and the reorder below puts it first.
# tests/test_driver_window.py enforces all three properties.
# Round-4 rotation: rounds 1-3 drove 84 distinct entries green; this window
# is built from the 63 entries with NO green row in any CORRECTNESS_r0*.json
# (48 of the 60 oracle-backed ones — the 12 overflow plus the 3 declared
# rows-only entries rotate in next round). B2/B3 have no never-verified
# entries left, so one fast already-green canary keeps each family covered.
# Round-5 rotation queue (all pre-verified on a vanilla session this round):
# q041 q042 q048 q049 q106 q109 q159 q163 q167-q169 q171 (r3 leftovers),
# q173 q175-q182 (new this round), q094/q162/q165 (rows-only), then fill
# with canaries; test_window_maximizes_never_verified_entries recomputes
# the exact set from the committed CORRECTNESS_r0*.json files.
DRIVER_WINDOW = (
    # B1-scans (q108 = listen-mode fan-in, round-3 source work)
    "q108_unix_socket_listen_stream",
    # B2-projection-filter (canary — driver-green r3)
    "q011_filter_comparison",
    # B3-joins (canary — driver-green r3)
    "q021_broadcast_join",
    # B4-aggregations
    "q040_partial_final_agg",
    "q144_time_rollup",
    "q147_hll_sketch_rollup",
    "q160_gap_fill",
    # B5-windows
    "q051_ntile_percent_rank",
    "q054_range_frame",
    # B6-sorts
    "q060_global_sort",
    # B7-setops
    "q072_except",
    # B8-functions
    "q082_math_functions",
    "q083_array_functions",
    "q084_map_functions",
    "q085_json_functions",
    "q087_hash_functions",
    "q158_pii_tokenization",
    # B9-streaming
    "q095_streaming_dedup",
    "q097_arbitrary_stateful",
    "q099_foreachbatch_sink",
    "q149_incremental_ingest_dedup",
    # B10-udfs
    "q102_grouped_agg_pandas_udf",
    "q104_udtf_split_to_rows",
    "q105_mapInPandas",
    # B11-llm
    "q113_lsh_ann",
    "q115_token_df_topk",
    "q116_binary_columns",
    "q117_embedding_normalize",
    "q120_simhash_neardup",
    "q121_ngram_jaccard_exact",
    "q122_embedding_neardup_pairs",
    "q124_quality_score",
    "q126_doc_fingerprint",
    "q127_multimodal_decode_stub",
    "q128_ivf_ann",
    "q129_cosine_topk_blocked",
    "q148_dedup_cluster_cc",
    # B12-training
    "q131_doc_chunking",
    "q132_stratified_sample",
    "q134_sequence_packing",
    "q135_pii_redaction",
    "q136_stopword_coverage",
    "q137_embedding_quantize",
    "q138_tfidf_retrieval",
    "q141_semantic_dedup_clustered",
    "q143_segment_dedup",
    "q151_snapshot_diff",
    "q155_postings_retrieval",
    "q156_exact_k_sample",
    "q157_text_normalize",
)


def _reorder() -> None:
    missing = [n for n in DRIVER_WINDOW if n not in REGISTRY]
    if missing:
        raise RuntimeError(f"DRIVER_WINDOW names not registered: {missing}")
    ordered = {n: REGISTRY[n] for n in DRIVER_WINDOW}
    ordered.update((n, q) for n, q in REGISTRY.items() if n not in ordered)
    REGISTRY.clear()
    REGISTRY.update(ordered)


_reorder()
