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
# Round-10 rotation (saturation steady state, standing rule "window
# priority = code changed since last driver row, then staleness" —
# VERDICT r8 item 1, applied per VERDICT r9 item 1). Leads: the 4
# entries whose implementation changed THIS round — q107/q108 (the
# unix-socket streaming source promoted from the driver-side Simple
# reader to the partition-parallel DataSourceStreamReader), q120 (the
# above-gate MinHash regime re-banded 24×4 → 32×3 for the 0.5
# threshold, ADVICE r9), q026 (empty-input coalesce in the
# order-statistics helper, ADVICE r9). Then the ENTIRE 20-entry
# r4-vintage cohort (every entry whose latest driver row is r4 —
# VERDICT r9 item 2's list corrected against the CORRECTNESS union:
# q021 and q158 are r4-vintage; q134 is not). Then 24 r5-vintage
# fillers chosen so every §2-B family keeps a row, plus two r7 canaries
# for the families with nothing older (B2: q011, B6: q061). After this
# window lands, the registry's latest-row floor rises to r5.
# NEXT_WINDOW_QUEUE pins entries that should rotate into the NEXT
# round's window when never-verified entries outnumber the 50 slots;
# empty (nothing is never-verified) — new entries added this round
# displace fillers as they land.
NEXT_WINDOW_QUEUE: tuple = ()

DRIVER_WINDOW = (
    # ---- implementation changed this round (round 10) ----
    # (q241/q252 joined mid-round: the ×1000 streaming-state probe
    # caught q252's fixed drain deadline and q241's driver-collecting
    # memory sink; both fixed, so both displace same-family r5 fillers
    # per the standing changed-code-first rule)
    "q107_unix_socket_source",
    "q108_unix_socket_listen_stream",
    "q120_simhash_neardup",
    "q026_theta_join",
    "q241_transform_with_map_state_timers",
    "q252_state_ttl_eviction",
    # ---- the full r4-vintage cohort (latest driver row = r4) ----
    "q021_broadcast_join",
    "q121_ngram_jaccard_exact",
    "q124_quality_score",
    "q126_doc_fingerprint",
    "q127_multimodal_decode_stub",
    "q128_ivf_ann",
    "q132_stratified_sample",
    "q135_pii_redaction",
    "q136_stopword_coverage",
    "q137_embedding_quantize",
    "q138_tfidf_retrieval",
    "q143_segment_dedup",
    "q144_time_rollup",
    "q149_incremental_ingest_dedup",
    "q151_snapshot_diff",
    "q155_postings_retrieval",
    "q156_exact_k_sample",
    "q157_text_normalize",
    "q158_pii_tokenization",
    "q160_gap_fill",
    # ---- r5-vintage fillers (every family keeps a row) ----
    # B1-scans
    "q173_bloom_filter_write",
    "q185_corrupt_parquet_quarantine",
    "q200_dynamic_partition_pruning",
    "q202_zone_map_skipping",
    # B3-joins
    "q194_runtime_bloom_join",
    "q201_cbo_join_reorder",
    # B4-aggregations
    "q163_observed_metrics",
    "q167_incremental_agg_maintenance",
    "q168_approx_quantile_profile",
    "q192_exact_median_twophase",
    "q204_count_min_sketch",
    "q205_kmv_sketch_setops",
    # B5-windows
    "q196_scd2_history",
    "q197_batch_sessionization",
    # B7-setops
    "q208_setops_multiset",
    # B8-functions
    "q109_variant_json",
    "q159_data_quality_audit",
    # B9-streaming
    "q106_stream_stream_join",
    "q171_state_store_introspection",
    # B10-udfs
    "q199_arrow_python_udf",
    # B11-llm
    "q193_heavy_hitters_twopass",
    "q198_video_frame_sampling",
    # ---- r7 canaries (B2/B6 have no r4/r5 survivors) ----
    "q011_filter_comparison",
    "q061_topk",
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
