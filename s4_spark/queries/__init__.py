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
DRIVER_WINDOW = (
    # B1-scans
    "q001_parquet_scan",
    "q005_partitioned_parquet_sink",
    "q007_streaming_file_source",
    "q142_binaryfile_ingest",
    # B2-projection-filter
    "q011_filter_comparison",
    "q015_case_when",
    # B3-joins
    "q020_inner_join_tpch_q3",
    "q021_broadcast_join",
    "q027_range_join",
    "q028_asof_join",
    "q045_bucketed_join",
    "q166_tpch_q5_shape",
    # B4-aggregations
    "q030_hash_agg_tpch_q1",
    "q033_grouping_sets",
    "q037_collect_set_sorted",
    "q038_percentiles",
    "q145_funnel",
    "q146_retention_cohorts",
    # B5-windows
    "q050_ranking",
    "q052_lag_lead",
    "q053_running_sum",
    # B6-sorts
    "q061_topk",
    "q062_per_group_topk",
    # B7-setops
    "q070_union",
    "q071_intersect",
    # B8-functions
    "q080_string_functions",
    "q081_datetime_functions",
    "q086_cast_conversions",
    # B4 (bitmap exact-distinct rollup — flagship sketch-path entry)
    "q172_bitmap_distinct_rollup",
    # B9-streaming
    "q090_s4_pipeline_parity",
    "q091_tumbling_window",
    "q092_sliding_window",
    "q093_session_window",
    "q096_output_modes",
    "q098_stream_static_join",
    # B10-udfs
    "q100_python_udf",
    "q101_pandas_udf",
    "q103_grouped_map_applyInPandas",
    # B11-llm
    "q110_exact_dedup",
    "q111_minhash_lsh_neardup",
    "q112_cosine_topk_bruteforce",
    "q114_text_stats",
    "q123_language_id",
    "q125_token_counting",
    "q130_corpus_prep",
    "q170_pq_ann",
    # B12-training
    "q133_data_mixing",
    "q139_contamination_check",
    "q140_repetition_signals",
    "q150_temperature_rebalance",
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
