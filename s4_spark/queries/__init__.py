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
# Round-14 rotation (saturation steady state, standing rule "window
# priority = code changed since last driver row, then staleness" —
# VERDICT r8 item 1). Leads: the 13 entries whose RESULT-PRODUCING code
# was restructured in the r14 optimization round — q145 (whale-safe
# window funnel), q144 (NOSORT constant split), the seven
# verify_pairs_jaccard callers q111/q121/q130/q148/q190/q203/q216
# (lazy candidate cut + hot-bucket guard), the replay-rig consumers
# q094/q165/q273 (rig-scoped shuffle partitions), and q246 (Arrow-batch
# source reads). The ~88 bounded-sort sweep conversions are covered by
# the full-registry pytest oracle (the r13-verified invariant for
# outside-window rewrites); the leads are the entries whose PLAN
# restructuring goes beyond the machine-checked ordered_small pattern.
# Then the FULL remaining r8-vintage cohort (27 entries after q246
# moved into the leads; latest driver row = r8 per the
# CORRECTNESS_r01..r13 union — after this window lands the staleness
# floor rises to r9). Then 10 r9-cohort entries by family spread,
# preferring sweep-converted ones (q015/q037/q096/q102), plus the
# stalest B6/B7 canaries (q060 r12, q071 r12 — q071 is also a sweep
# conversion).
# NEXT_WINDOW_QUEUE pins entries that should rotate into the NEXT
# round's window when NEVER-VERIFIED entries outnumber the 50 slots;
# empty (nothing is never-verified — saturation steady state). The
# round-15 rotation, per the standing priority rule: lead with any
# entry whose code changes after this round's window freezes, then the
# remaining r9 cohort by family spread.
NEXT_WINDOW_QUEUE: tuple = ()

DRIVER_WINDOW = (
    # ---- implementation restructured in round 14 (13) ----
    "q145_funnel",
    "q144_time_rollup",
    "q111_minhash_lsh_neardup",
    "q121_ngram_jaccard_exact",
    "q130_corpus_prep",
    "q148_dedup_cluster_cc",
    "q190_fuzzy_decontamination",
    "q203_snapshot_index_dedup",
    "q216_contrastive_pair_mining",
    "q094_watermark_late_drop",
    "q165_stream_stream_outer_join",
    "q273_multi_watermark_policy",
    "q246_offset_managed_stream_source",
    # ---- the FULL remaining r8-vintage cohort (27) ----
    "q002_csv_roundtrip",
    "q003_jsonl_roundtrip",
    "q004_text_scan",
    "q006_gzip_text_sink",
    "q007_streaming_file_source",
    "q009_orc_roundtrip",
    "q014_like_regex",
    "q016_distinct",
    "q019_xml_roundtrip",
    "q023_full_outer_join",
    "q024_left_semi_join",
    "q025_left_anti_join",
    "q029_cross_join",
    "q032_approx_count_distinct",
    "q034_rollup",
    "q035_cube",
    "q039_stats_agg",
    "q043_scalar_subquery",
    "q044_correlated_subquery",
    "q047_lateral_join",
    "q152_zorder_layout",
    "q153_small_file_compaction",
    "q154_schema_evolution",
    "q161_fuzzy_join_blocked",
    "q164_permissive_corrupt_records",
    "q242_python_datasource_sink",
    "q243_python_datasource_stream_sink",
    # ---- r9 cohort by family spread (8), sweep-converted first ----
    "q015_case_when",
    "q037_collect_set_sorted",
    "q051_ntile_percent_rank",
    "q081_datetime_functions",
    "q087_hash_functions",
    "q096_output_modes",
    "q102_grouped_agg_pandas_udf",
    "q104_udtf_split_to_rows",
    # ---- canaries (B6/B7 have no r8/r9-stale entries; both r12) ----
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
