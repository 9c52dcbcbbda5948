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
# Round-5 rotation: rounds 1-4 drove 132 distinct entries green; this
# window holds 48 of the 57 never-verified oracle-backed entries
# (q041 q042 q048 q049 q106 q109 q159 q163 q167 q168 q169 q171 q173
# q175-q185 minus the rows-only ones, plus new q186-q209) and 2
# already-green canaries for the families with no never-verified
# entries left (B2: q011, B6: q061). q210_balanced_write,
# q211_audio_segment_plumbing, q212_packed_loss_masks,
# q213_image_resize_features, q214_manifest_time_travel,
# q215_per_group_regression, q216_contrastive_pair_mining,
# q217_point_in_time_join, q218_asof_join_tolerance, plus the
# post-rotation additions q219_windowed_funnel, q220_cohort_retention,
# q221_domain_quality_propagation, q222_event_transitions,
# q223_tpch_q18_shape, q225_rank_blend_quality,
# q227_rfm_segmentation, q228_weighted_sample,
# q229_event_streaks, q230_winsorized_stats, q231_cusum_changepoint,
# q232_tpch_q21_shape, q233_training_pipeline_e2e, and
# q234_streaming_funnel are the
# never-verified entries the 50 slots cannot fit — they ARE the r6 rotation queue. After this round
# only those plus the 4 rows-only-by-design entries (q008 console
# sink, q094 watermark replay rig, q162 k-means property tests, q165
# stream-stream outer replay rig) lack a driver row.
DRIVER_WINDOW = (
    # B1-scans: never-verified
    "q173_bloom_filter_write",
    "q185_corrupt_parquet_quarantine",
    "q200_dynamic_partition_pruning",
    "q202_zone_map_skipping",
    # B2-projection-filter (canary — driver-green r4)
    "q011_filter_comparison",
    # B3-joins (never-verified)
    "q194_runtime_bloom_join",
    "q201_cbo_join_reorder",
    # B4-aggregations: never-verified
    "q041_pivot",
    "q042_unpivot",
    "q048_recursive_cte",
    "q049_pipe_sql",
    "q163_observed_metrics",
    "q167_incremental_agg_maintenance",
    "q168_approx_quantile_profile",
    "q192_exact_median_twophase",
    "q204_count_min_sketch",
    "q205_kmv_sketch_setops",
    # B5-windows (never-verified)
    "q196_scd2_history",
    "q197_batch_sessionization",
    # B6-sorts (canaries)
    "q061_topk",
    # B7-setops (never-verified)
    "q208_setops_multiset",
    # B8-functions: 2 never-verified + fillers
    "q109_variant_json",
    "q159_data_quality_audit",
    # B9-streaming: never-verified
    "q106_stream_stream_join",
    "q171_state_store_introspection",
    "q179_dedup_within_watermark",
    "q209_streaming_index_maintenance",
    # B10-udfs (never-verified)
    "q199_arrow_python_udf",
    # B11-llm (never-verified)
    "q193_heavy_hitters_twopass",
    "q198_video_frame_sampling",
    # B12-training: never-verified
    "q169_source_cap",
    "q175_repeated_ngram_spans",
    "q176_training_shard_export",
    "q177_vocab_induction_oov",
    "q178_train_val_test_split",
    "q180_bm25_retrieval",
    "q181_incremental_shard_refresh",
    "q182_global_row_number",
    "q183_epoch_shuffle",
    "q184_file_provenance",
    "q195_cdc_apply",
    "q186_bpe_merge_learn",
    "q187_bpe_apply_compression",
    "q188_lm_familiarity_filter",
    "q189_dataset_card_profile",
    "q190_fuzzy_decontamination",
    "q191_token_budget_prefix_cut",
    "q203_snapshot_index_dedup",
    "q206_quality_classifier_filter",
    "q207_trigram_novelty",
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
