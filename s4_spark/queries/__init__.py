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
# Round-7 rotation: CORRECTNESS_r06 came back 50/50, so every r6-windowed
# entry is driver-green and the 27 entries pinned in the r6
# NEXT_WINDOW_QUEUE (q253, q257-q282 — all sf0.001..sf0.1 oracle-checked
# and vanilla-Chicago certified late round 6) rotate in, plus
# q008_console_sink and q162_kmeans_ivf_fit (upgraded rows-only ->
# oracle-backed this round, so never-verified by definition). That is
# 29 never-verified entries; the
# 21 remaining slots hold already-green canaries for the four families
# the queue misses (B2/B6/B7 + B11) and fillers, preferring entries whose
# IMPLEMENTATION changed this round (q112 scale dispatch, q120 probe
# banding, q148 pointer-doubling CC) and bench-headline representatives
# so driver verification doubles as a regression watch. After the
# round-7 driver run the driver-verified union covers the entire
# oracled registry (255/255) — no rows-only entries remain.
# NEXT_WINDOW_QUEUE pins entries that should rotate into the NEXT
# round's window when never-verified entries outnumber the 50 slots;
# empty now (all never-verified entries fit this window) — new entries
# added this round displace fillers as they land.
NEXT_WINDOW_QUEUE: tuple = ()

DRIVER_WINDOW = (
    # ---- never-verified: the 27 r6-queue entries ----
    # B1-scans
    "q263_bucket_pruning",
    "q271_column_defaults",
    "q274_columnar_cache_reuse",
    # B3-joins
    "q260_aqe_skew_join",
    "q261_tpch_q15_shape",
    "q270_aqe_join_strategy_switch",
    "q272_null_safe_join",
    "q279_runtime_bloom_filter_join",
    "q281_tpch_q7_shape",
    "q282_tpch_q8_shape",
    # B4-aggregations
    "q257_approx_top_k_sketch",
    "q266_listagg",
    # B5-windows
    "q259_ewma_smoothing",
    # B8-functions
    "q265_parameterized_sql",
    "q267_convert_timezone",
    "q276_sql_ergonomics",
    "q277_recursive_cte",
    "q278_sql_udf",
    "q280_xml_roundtrip",
    # B9-streaming
    "q258_chained_streaming_aggs",
    "q268_stream_to_table",
    "q269_join_then_window_chain",
    "q273_multi_watermark_policy",
    # B10-udfs
    "q262_grouped_applyInArrow",
    "q264_iter_pandas_udf",
    "q275_pandas_api_on_spark",
    # B12-training
    "q253_chi2_token_association",
    # ---- never-verified: upgraded rows-only -> oracled this round ----
    # B1-scans
    "q008_console_sink",
    # B11-llm (certified-invariants oracle, q113/q170 pattern)
    "q162_kmeans_ivf_fit",
    # ---- canaries (families with no never-verified entries left) ----
    # B2-projection-filter
    "q011_filter_comparison",
    # B6-sorts
    "q061_topk",
    # B7-setops
    "q070_union",
    # ---- fillers: implementation changed this round (re-verify) ----
    # B11-llm: brute-force scale dispatch, probe-banded SimHash,
    # pointer-doubled connected components
    "q112_cosine_topk_bruteforce",
    "q120_simhash_neardup",
    "q148_dedup_cluster_cc",
    # ---- fillers: bench-headline / family representatives ----
    "q005_partitioned_parquet_sink",
    "q020_inner_join_tpch_q3",
    "q028_asof_join",
    "q030_hash_agg_tpch_q1",
    "q054_range_frame",
    "q090_s4_pipeline_parity",
    "q095_streaming_dedup",
    "q101_pandas_udf",
    "q111_minhash_lsh_neardup",
    "q115_token_df_topk",
    "q130_corpus_prep",
    "q134_sequence_packing",
    "q147_hll_sketch_rollup",
    "q166_tpch_q5_shape",
    "q182_global_row_number",
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
