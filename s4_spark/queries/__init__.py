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
# Round-11 rotation (saturation steady state, standing rule "window
# priority = code changed since last driver row, then staleness" —
# VERDICT r8 item 1, applied per VERDICT r10 item 2). Leads: the 5
# entries whose implementation changed THIS round — q107/q108 (the
# unix-socket executor read now asserts full-slice length and fails the
# task on persistent truncation instead of silently dropping records,
# ADVICE r10), q241 (rigs.run_to_parquet sink rebuilt batchId-keyed
# idempotent, ADVICE r10), q252 (unconditional hour-scale drain guard +
# the same idempotent sink inline, ADVICE r10), and q121 (rebuilt as
# the inverted-index OVERLAP-COUNT exact join — jac closed-form from
# o/(|A|+|B|−o), no per-pair set materialization — after the old
# candidates-then-verify spelling moved O(800 GB) of shingle arrays at
# ×1000 and died on spill disk; pinned by a threshold-boundary test).
# Then the ENTIRE 25-entry r5-vintage
# cohort (every entry whose latest driver row is r5, per the
# CORRECTNESS_r01..r10 union — VERDICT r10 item 2's list).
# Then 17 r6-vintage fillers chosen for family spread (B3 ×7, B5 ×4,
# B8 ×3, B10 ×1, B11 ×2), plus three canaries for families with no
# r5/r6 survivors (B2: q010 r8, B6: q062 r8, B7: q070 r7). After this
# window lands, the registry's latest-row floor rises to r6.
# NEXT_WINDOW_QUEUE pins entries that should rotate into the NEXT
# round's window when never-verified entries outnumber the 50 slots;
# empty (nothing is never-verified) — new entries added this round
# displace fillers as they land.
NEXT_WINDOW_QUEUE: tuple = ()

DRIVER_WINDOW = (
    # ---- implementation changed this round (round 11) ----
    "q107_unix_socket_source",
    "q108_unix_socket_listen_stream",
    "q241_transform_with_map_state_timers",
    "q252_state_ttl_eviction",
    "q121_ngram_jaccard_exact",
    # ---- the full r5-vintage cohort (latest driver row = r5) ----
    "q041_pivot",
    "q042_unpivot",
    "q048_recursive_cte",
    "q049_pipe_sql",
    "q169_source_cap",
    "q175_repeated_ngram_spans",
    "q176_training_shard_export",
    "q177_vocab_induction_oov",
    "q178_train_val_test_split",
    "q179_dedup_within_watermark",
    "q180_bm25_retrieval",
    "q181_incremental_shard_refresh",
    "q183_epoch_shuffle",
    "q184_file_provenance",
    "q186_bpe_merge_learn",
    "q187_bpe_apply_compression",
    "q188_lm_familiarity_filter",
    "q189_dataset_card_profile",
    "q190_fuzzy_decontamination",
    "q191_token_budget_prefix_cut",
    "q195_cdc_apply",
    "q203_snapshot_index_dedup",
    "q206_quality_classifier_filter",
    "q207_trigram_novelty",
    "q209_streaming_index_maintenance",
    # ---- r6-vintage fillers (staleness next; family spread) ----
    # B3-joins
    "q217_point_in_time_join",
    "q218_asof_join_tolerance",
    "q223_tpch_q18_shape",
    "q236_tpch_q17_shape",
    "q237_tpch_q20_shape",
    "q239_tpch_q22_shape",
    "q254_tpch_q4_shape",
    # B5-windows
    "q219_windowed_funnel",
    "q222_event_transitions",
    "q229_event_streaks",
    "q231_cusum_changepoint",
    # B8-functions
    "q244_sql_scripting",
    "q249_try_functions",
    "q250_collated_strings",
    # B10-udfs
    "q245_polymorphic_udtf",
    # B11-llm
    "q211_audio_segment_plumbing",
    "q213_image_resize_features",
    # ---- canaries (B2/B6/B7 have no r5/r6 survivors) ----
    "q010_projection",
    "q062_per_group_topk",
    "q070_union",
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
