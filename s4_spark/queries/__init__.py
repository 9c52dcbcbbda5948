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
# Round-12 rotation (saturation steady state, standing rule "window
# priority = code changed since last driver row, then staleness" —
# VERDICT r8 item 1, applied per VERDICT r11 item 2). Leads: the 6
# entries whose implementation changed THIS round — q121 (Σdf²-measured
# scale dispatch to the LSH-verified arm + metadata-only broadcast
# gate, VERDICT r11 item 5 / ADVICE r11), q211/q213 (per-element Python
# loops vectorized to numpy inside the same mapInPandas iterators,
# VERDICT r11 item 4; q198 windowed too — its mapInPandas shares the
# reviewed shape even though its per-frame sha256 loop was already not
# per-element), and q241/q252 (rigs.read_batched_parquet now reads only
# COMMITTED b{N} dirs, never a leftover .tmp from a mid-commit stop —
# ADVICE r11). Then the ENTIRE 23-entry r6-vintage cohort (every entry
# whose latest driver row is r6, per the CORRECTNESS_r01..r11 union —
# VERDICT r11 item 2's floor cohort). Then 18 of the 29 once-verified
# r7 entries, chosen for family spread (B5: q259; B8: q265/q267/q276/
# q277/q278/q280; B10: q262/q264/q275; the rest by name order), plus
# three canaries for families with no r6/r7-stale survivors (B2: q013
# r8, B6: q060 r9, B7: q071 r8). After this window lands, the
# registry's latest-row floor rises to r7.
# NEXT_WINDOW_QUEUE pins entries that should rotate into the NEXT
# round's window when NEVER-VERIFIED entries outnumber the 50 slots;
# empty (nothing is never-verified — saturation steady state). The
# round-13 rotation, per the standing priority rule (changed-code
# first, then staleness): LEAD with the 4 entries whose implementation
# changed AFTER this round's driver window was frozen — q141 (cert
# force_gate pin), q249 (battery above top-k), q168 (subsampled exact
# reference), q192 (fused counts + bracket materialization) — then the
# 11 once-verified r7 entries that did not fit this round's slots
# (q266, q268, q269, q270, q271, q272, q273, q274, q279, q281, q282),
# then the r8 cohort.
NEXT_WINDOW_QUEUE: tuple = ()

DRIVER_WINDOW = (
    # ---- implementation changed this round (round 12) ----
    "q121_ngram_jaccard_exact",
    "q198_video_frame_sampling",
    "q211_audio_segment_plumbing",
    "q213_image_resize_features",
    "q241_transform_with_map_state_timers",
    "q252_state_ttl_eviction",
    # ---- the full r6-vintage cohort (latest driver row = r6) ----
    "q094_watermark_late_drop",
    "q165_stream_stream_outer_join",
    "q174_transform_with_state",
    "q210_balanced_write",
    "q212_packed_loss_masks",
    "q214_manifest_time_travel",
    "q215_per_group_regression",
    "q220_cohort_retention",
    "q221_domain_quality_propagation",
    "q225_rank_blend_quality",
    "q227_rfm_segmentation",
    "q228_weighted_sample",
    "q230_winsorized_stats",
    "q233_training_pipeline_e2e",
    "q234_streaming_funnel",
    "q235_streaming_funnel_reordered",
    "q238_funnel_state_introspection",
    "q240_transform_with_list_state",
    "q247_transform_with_initial_state",
    "q248_streaming_progress_metrics",
    "q251_rocksdb_changelog_restart",
    "q255_tpch_q13_shape",
    "q256_tpch_q19_shape",
    # ---- stalest r7 (once-verified; family spread first) ----
    "q008_console_sink",
    "q162_kmeans_ivf_fit",
    "q253_chi2_token_association",
    "q257_approx_top_k_sketch",
    "q258_chained_streaming_aggs",
    "q259_ewma_smoothing",
    "q260_aqe_skew_join",
    "q261_tpch_q15_shape",
    "q262_grouped_applyInArrow",
    "q263_bucket_pruning",
    "q264_iter_pandas_udf",
    "q265_parameterized_sql",
    "q267_convert_timezone",
    "q275_pandas_api_on_spark",
    "q276_sql_ergonomics",
    "q277_recursive_cte",
    "q278_sql_udf",
    "q280_xml_roundtrip",
    # ---- canaries (B2/B6/B7 have no r6/r7-stale survivors) ----
    "q013_null_predicates",
    "q060_global_sort",
    "q071_intersect",
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
