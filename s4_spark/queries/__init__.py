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
# Round-9 rotation (saturation steady state, standing rule "window
# priority = code changed since last driver row, then staleness" —
# VERDICT r8 item 1). Leads: the 4 entries whose implementation changed
# THIS round — q026 (order-statistics count regime above Q026_GATE_ROWS),
# q120 (MinHash candidate regime above Q120_GATE_ROWS), q216 (12-hex-digit
# bucket keys on both engine sides, r8 advice), q141 (empty-Arrow-batch
# guard in its ivf_assign_batched kernel), plus q232 (single-pass Q21
# rewrite after the ×1000 relational probe caught the two-pass form
# executing its 600M-row fact join twice — displaced the q021 filler,
# B3 keeps four rows). Then the 27 stalest entries
# (latest driver row ≤ r3), then 19 r4-vintage fillers chosen so every
# §2-B family keeps a row (B6/B7/B10 have no ≤r3 survivors: q060/q072
# and the three B10 pandas-UDF entries cover them). q170, listed below
# with its stale B11 cohort, is ALSO changed this round (√N re-rank
# depth — the ×1000 probe measured the fixed-64 shortlist under the
# recall floor at 2M vectors).
# NEXT_WINDOW_QUEUE pins entries that should rotate into the NEXT
# round's window when never-verified entries outnumber the 50 slots;
# empty (nothing is never-verified) — new entries added this round
# displace fillers as they land.
NEXT_WINDOW_QUEUE: tuple = ()

DRIVER_WINDOW = (
    # ---- implementation changed this round (round 9) ----
    "q026_theta_join",
    "q120_simhash_neardup",
    "q216_contrastive_pair_mining",
    "q141_semantic_dedup_clustered",
    "q232_tpch_q21_shape",
    # ---- stalest: latest driver row ≤ r3 ----
    # B1-scans
    "q001_parquet_scan",
    "q142_binaryfile_ingest",
    # B2-projection-filter
    "q015_case_when",
    # B3-joins
    "q027_range_join",
    "q045_bucketed_join",
    # B4-aggregations
    "q033_grouping_sets",
    "q037_collect_set_sorted",
    "q038_percentiles",
    "q145_funnel",
    "q146_retention_cohorts",
    "q172_bitmap_distinct_rollup",
    # B5-windows
    "q052_lag_lead",
    "q053_running_sum",
    # B8-functions
    "q081_datetime_functions",
    "q086_cast_conversions",
    # B9-streaming
    "q092_sliding_window",
    "q096_output_modes",
    "q098_stream_static_join",
    # B11-llm
    "q110_exact_dedup",
    "q114_text_stats",
    "q123_language_id",
    "q125_token_counting",
    "q170_pq_ann",
    # B12-training
    "q133_data_mixing",
    "q139_contamination_check",
    "q140_repetition_signals",
    "q150_temperature_rebalance",
    # ---- r4-vintage fillers (family coverage: B6/B7/B10 live here) ----
    "q040_partial_final_agg",
    "q051_ntile_percent_rank",
    "q060_global_sort",
    "q072_except",
    "q082_math_functions",
    "q083_array_functions",
    "q084_map_functions",
    "q085_json_functions",
    "q087_hash_functions",
    "q097_arbitrary_stateful",
    "q099_foreachbatch_sink",
    "q102_grouped_agg_pandas_udf",
    "q104_udtf_split_to_rows",
    "q105_mapInPandas",
    "q108_unix_socket_listen_stream",
    "q113_lsh_ann",
    "q116_binary_columns",
    "q131_doc_chunking",
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
