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
# Round-13 rotation (saturation steady state, standing rule "window
# priority = code changed since last driver row, then staleness" —
# VERDICT r8 item 1). Leads: the 4 entries whose implementation changed
# AFTER the r12 window froze — q141 (cert force_gate pin), q249
# (battery above top-k), q168 (subsampled exact reference), q192
# (fused counts + bracket materialization) — plus q168 changed again
# this round (hex_digits=12 cert bucketing, single-scan ungated shape,
# ADVICE r12) and q241/q252, whose rig-sink commit protocol moved from
# a POSIX directory rename to a Hadoop-FS zero-byte commit marker
# (VERDICT r12 item 2). Then the FULL 28-entry r7-vintage cohort (the
# staleness floor per the CORRECTNESS_r01..r12 union; the r12 note
# undercounted it as 11 — the other 17 were r7 too). Then 16 of the
# 42-entry r8 cohort, family spread first (B5: q050; B8: q080; B9:
# q091/q093; B10: q100/q103; B11: q117/q122/q129; B2: q012/q016; B3:
# q022/q046; B4: q031/q036 — q002/q016 dropped for the B6/B7
# canaries q061 (r10) and q072 (r9), the stalest in their families).
# After this window lands, the registry's latest-row floor rises to r8
# except the 15 r8 entries deferred to r14.
# NEXT_WINDOW_QUEUE pins entries that should rotate into the NEXT
# round's window when NEVER-VERIFIED entries outnumber the 50 slots;
# empty (nothing is never-verified — saturation steady state). The
# round-14 rotation, per the standing priority rule: lead with any
# entry whose code changes after this round's window freezes, then the
# 26 remaining r8-cohort entries (q003, q004, q006, q007, q009, q014,
# q019, q023, q024, q025, q029, q032, q034, q035, q039, q043, q044,
# q047, q152, q153, q154, q161, q164, q242, q243, q246), then the r9
# cohort (46 entries) by family spread.
NEXT_WINDOW_QUEUE: tuple = ()

DRIVER_WINDOW = (
    # ---- implementation changed after the r12 window froze (4) or in
    # round 13 itself (q168 again — hex_digits + single-scan ungated
    # shape; q241/q252 — the rig sink's commit protocol moved from a
    # POSIX rename to a Hadoop-FS zero-byte marker) ----
    "q141_semantic_dedup_clustered",
    "q249_try_functions",
    "q168_approx_quantile_profile",
    "q192_exact_median_twophase",
    "q241_transform_with_map_state_timers",
    "q252_state_ttl_eviction",
    # ---- the FULL r7-vintage cohort (latest driver row = r7; 28
    # entries per the CORRECTNESS_r01..r12 union — after this window
    # lands the registry's staleness floor rises to r8) ----
    "q005_partitioned_parquet_sink",
    "q020_inner_join_tpch_q3",
    "q028_asof_join",
    "q030_hash_agg_tpch_q1",
    "q054_range_frame",
    "q090_s4_pipeline_parity",
    "q095_streaming_dedup",
    "q101_pandas_udf",
    "q111_minhash_lsh_neardup",
    "q112_cosine_topk_bruteforce",
    "q115_token_df_topk",
    "q130_corpus_prep",
    "q134_sequence_packing",
    "q147_hll_sketch_rollup",
    "q148_dedup_cluster_cc",
    "q166_tpch_q5_shape",
    "q182_global_row_number",
    "q266_listagg",
    "q268_stream_to_table",
    "q269_join_then_window_chain",
    "q270_aqe_join_strategy_switch",
    "q271_column_defaults",
    "q272_null_safe_join",
    "q273_multi_watermark_policy",
    "q274_columnar_cache_reuse",
    "q279_runtime_bloom_filter_join",
    "q281_tpch_q7_shape",
    "q282_tpch_q8_shape",
    # ---- 16 of the 42-entry r8 cohort, family spread first ----
    "q050_ranking",
    "q080_string_functions",
    "q091_tumbling_window",
    "q093_session_window",
    "q100_python_udf",
    "q103_grouped_map_applyInPandas",
    "q117_embedding_normalize",
    "q122_embedding_neardup_pairs",
    "q129_cosine_topk_blocked",
    "q012_in_predicate",
    "q022_left_outer_join",
    "q046_salted_join",
    "q031_count_distinct",
    "q036_filtered_agg",
    # ---- canaries (B6/B7 have no r7/r8-stale entries) ----
    "q061_topk",
    "q072_except",
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
