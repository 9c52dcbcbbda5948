#!/usr/bin/env python
"""r14 sweep probe (guide §1): per-entry driver-style timing + plan dumps
for the bounded-sort sweep.

For each entry named on the command line (or the built-in TOUCHED list):
  - build the DataFrame (driver-side plan construction, timed),
  - collect() it (the driver's correctness-run action, timed),
  - dump .explain("formatted") to --plandir/<name>_<tag>.txt,
  - count Exchange / rangepartitioning / Coalesce occurrences in the plan.

Emits one JSON file with {name: {build_s, collect_s, rows, exchanges,
range_exchanges, coalesce}} so before/after states of the tree can be
diffed. Not part of the bench contract; /tmp-style instrument.

Usage: python bench/r14_sweep_probe.py --sf /root/testdata/sf0.01 \
          --out /tmp/r14_before.json --plandir plans/r14 --tag before
"""

from __future__ import annotations

import argparse
import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TOUCHED = [
    # training
    "q133_data_mixing", "q136_stopword_coverage", "q157_text_normalize",
    "q175_repeated_ngram_spans", "q176_training_shard_export",
    "q177_vocab_induction_oov", "q178_train_val_test_split",
    "q181_incremental_shard_refresh", "q182_global_row_number",
    "q183_epoch_shuffle", "q184_file_provenance", "q186_bpe_merge_learn",
    "q187_bpe_apply_compression", "q188_lm_familiarity_filter",
    "q189_dataset_card_profile", "q190_fuzzy_decontamination",
    "q191_token_budget_prefix_cut", "q195_cdc_apply",
    "q203_snapshot_index_dedup", "q206_quality_classifier_filter",
    "q207_trigram_novelty", "q215_per_group_regression",
    "q221_domain_quality_propagation", "q233_training_pipeline_e2e",
    # windows
    "q219_windowed_funnel", "q222_event_transitions",
    # aggregates
    "q034_rollup", "q035_cube", "q036_filtered_agg",
    "q037_collect_set_sorted", "q038_percentiles",
    "q040_partial_final_agg", "q041_pivot", "q042_unpivot",
    "q048_recursive_cte", "q144_time_rollup", "q163_observed_metrics",
    "q167_incremental_agg_maintenance", "q168_approx_quantile_profile",
    "q172_bitmap_distinct_rollup", "q204_count_min_sketch",
    "q220_cohort_retention", "q230_winsorized_stats", "q266_listagg",
    # joins
    "q045_bucketed_join", "q046_salted_join", "q161_fuzzy_join_blocked",
    "q194_runtime_bloom_join", "q239_tpch_q22_shape", "q254_tpch_q4_shape",
    "q255_tpch_q13_shape", "q260_aqe_skew_join",
    "q270_aqe_join_strategy_switch",
    # functions
    "q109_variant_json", "q158_pii_tokenization", "q159_data_quality_audit",
    "q250_collated_strings", "q267_convert_timezone", "q280_xml_roundtrip",
    # filters / setops / udfs
    "q015_case_when", "q016_distinct", "q071_intersect",
    "q102_grouped_agg_pandas_udf", "q264_iter_pandas_udf",
    # scans
    "q005_partitioned_parquet_sink", "q019_xml_roundtrip",
    "q107_unix_socket_source", "q108_unix_socket_listen_stream",
    "q153_small_file_compaction", "q154_schema_evolution",
    "q200_dynamic_partition_pruning", "q202_zone_map_skipping",
    # llm
    "q114_text_stats", "q193_heavy_hitters_twopass",
    # streaming
    "q091_tumbling_window", "q092_sliding_window",
    "q094_watermark_late_drop", "q096_output_modes",
    "q098_stream_static_join", "q099_foreachbatch_sink",
    "q149_incremental_ingest_dedup", "q171_state_store_introspection",
    "q234_streaming_funnel", "q235_streaming_funnel_reordered",
    "q258_chained_streaming_aggs", "q268_stream_to_table",
    "q269_join_then_window_chain", "q273_multi_watermark_policy",
]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--out", required=True)
    ap.add_argument("--plandir", default=None)
    ap.add_argument("--tag", default="probe")
    ap.add_argument("--cpus", type=int, default=8)
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    from s4_spark.queries import REGISTRY  # noqa: E402
    from s4_spark.session import get_spark  # noqa: E402

    spark = get_spark(app_name="r14_sweep_probe", cpus=args.cpus)
    names = args.names or [n for n in TOUCHED if n in REGISTRY]
    missing = [n for n in (args.names or TOUCHED) if n not in REGISTRY]
    if missing:
        print("MISSING:", missing, file=sys.stderr)
    if args.plandir:
        os.makedirs(args.plandir, exist_ok=True)
    out: dict = {}
    for name in names:
        spark.catalog.clearCache()
        spark.sparkContext.setJobDescription(f"r14probe:{name}")
        t0 = time.time()
        try:
            df = REGISTRY[name].fn(spark, args.sf)
            t1 = time.time()
            plan = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted"
                )
            )
            rows = len(df.collect())
            t2 = time.time()
        except Exception as e:  # noqa: BLE001
            out[name] = {"error": repr(e)[:300]}
            print(f"{name}: ERROR {e!r}", file=sys.stderr)
            continue
        rec = {
            "build_s": round(t1 - t0, 3),
            "collect_s": round(t2 - t1, 3),
            "total_s": round(t2 - t0, 3),
            "rows": rows,
            "exchanges": len(re.findall(r"\bExchange\b", plan)),
            "range_exchanges": len(re.findall(r"rangepartitioning", plan)),
            "coalesce": len(re.findall(r"\bCoalesce\b", plan)),
        }
        out[name] = rec
        if args.plandir:
            with open(
                os.path.join(args.plandir, f"{name}_{args.tag}.txt"), "w"
            ) as f:
                f.write(plan)
        print(f"{name}: {rec['total_s']}s rows={rows} "
              f"rx={rec['range_exchanges']} co={rec['coalesce']}")
    total = round(sum(r.get("total_s", 0) for r in out.values()), 2)
    out["__total__"] = {"total_s": total, "n": len(names)}
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    print("TOTAL", total, "s over", len(names), "entries")


if __name__ == "__main__":
    main()
