"""Guards on the driver's 50-query verification window.

The round driver oracle-checks the FIRST 50 entries of ``queries()``:
row count + schema + a pandas value-hash that sorts collected cells, so a
window entry must (a) exist, (b) carry an oracle, (c) emit only hashable
scalar columns — a raw array/map/binary cell kills the driver harness
(round-1/2 q037 failure mode). These tests pin all three so a registry
edit can't silently eject a family from driver verification or push an
unhashable column into the window.
"""

from __future__ import annotations

import glob
import json
import os

import pytest

from s4_spark.queries import DRIVER_WINDOW, REGISTRY
from tests.conftest import SMOKE_SF_DIR

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

EXPECTED_SECTIONS = {
    "B1-scans",
    "B2-projection-filter",
    "B3-joins",
    "B4-aggregations",
    "B5-windows",
    "B6-sorts",
    "B7-setops",
    "B8-functions",
    "B9-streaming",
    "B10-udfs",
    "B11-llm",
    "B12-training",
}

UNHASHABLE_TYPES = ("array", "map", "binary", "struct")


def test_window_is_first_50_and_oracle_backed():
    names = list(REGISTRY)
    assert len(DRIVER_WINDOW) == 50
    assert names[:50] == list(DRIVER_WINDOW)
    for n in DRIVER_WINDOW:
        assert REGISTRY[n].oracle is not None, f"{n} has no oracle"


def test_window_covers_every_family():
    got = {REGISTRY[n].section for n in DRIVER_WINDOW}
    assert got == EXPECTED_SECTIONS, EXPECTED_SECTIONS - got


def test_window_maximizes_never_verified_entries():
    """Rotation guard: the window must spend its 50 slots on entries that have
    never earned a driver-green CORRECTNESS row. An already-verified entry may
    occupy a slot only as a family canary (when its §2-B family has no
    never-verified oracle-backed entries left) or as filler once fewer
    never-verified entries exist than slots. Fails if a registry edit quietly
    re-inserts already-green entries at the expense of never-verified ones."""
    seen: set[str] = set()
    for path in sorted(glob.glob(os.path.join(REPO_ROOT, "CORRECTNESS_r0*.json"))):
        with open(path) as f:
            seen |= set(json.load(f))
    never = [n for n, q in REGISTRY.items() if n not in seen and q.oracle is not None]
    canary_sections = EXPECTED_SECTIONS - {REGISTRY[n].section for n in never}
    budget = max(len(canary_sections), len(DRIVER_WINDOW) - len(never))
    already = sorted(n for n in DRIVER_WINDOW if n in seen)
    assert len(already) <= budget, (
        f"window wastes slots on already-verified entries {already} "
        f"(budget {budget}) while {len(never)} never-verified entries exist"
    )


@pytest.mark.parametrize("name", sorted(DRIVER_WINDOW))
def test_window_outputs_are_hashable_scalars(spark, name):
    df = REGISTRY[name].fn(spark, SMOKE_SF_DIR)
    bad = [
        f.name
        for f in df.schema.fields
        if f.dataType.typeName().startswith(UNHASHABLE_TYPES)
    ]
    assert not bad, f"{name} emits unhashable columns {bad}"


# The r6 rotation queue (the never-verified oracle-backed entries the
# current 50 slots cannot fit — mirrors the comment in
# s4_spark/queries/__init__.py). They WILL be windowed next round, so
# their outputs must already satisfy the driver's hashable-scalar
# constraint; catching an array/map/binary column now beats a red
# CORRECTNESS row after rotation. This list self-obsoletes when the
# rotation lands and DRIVER_WINDOW covers these names.
R6_QUEUE = [
    "q210_balanced_write",
    "q211_audio_segment_plumbing",
    "q212_packed_loss_masks",
    "q213_image_resize_features",
    "q214_manifest_time_travel",
    "q215_per_group_regression",
    "q216_contrastive_pair_mining",
    "q217_point_in_time_join",
    "q218_asof_join_tolerance",
    "q219_windowed_funnel",
    "q220_cohort_retention",
    "q221_domain_quality_propagation",
    "q222_event_transitions",
    "q223_tpch_q18_shape",
    "q225_rank_blend_quality",
    "q227_rfm_segmentation",
    "q228_weighted_sample",
    "q229_event_streaks",
    "q230_winsorized_stats",
    "q231_cusum_changepoint",
    "q232_tpch_q21_shape",
    "q233_training_pipeline_e2e",
    "q234_streaming_funnel",
]


def test_r6_queue_is_exactly_the_never_windowed_oracled_entries():
    windowed = set(DRIVER_WINDOW)
    expect = sorted(
        n
        for n, q in REGISTRY.items()
        if q.oracle is not None and n not in windowed and n not in ORACLED_SEEN
    )
    assert sorted(R6_QUEUE) == expect, (set(R6_QUEUE) ^ set(expect))


def _correctness_seen() -> set[str]:
    seen: set[str] = set()
    for path in sorted(glob.glob(os.path.join(REPO_ROOT, "CORRECTNESS_r0*.json"))):
        with open(path) as f:
            seen |= set(json.load(f))
    return seen


ORACLED_SEEN = _correctness_seen()


@pytest.mark.parametrize("name", R6_QUEUE)
def test_r6_queue_outputs_are_hashable_scalars(spark, name):
    df = REGISTRY[name].fn(spark, SMOKE_SF_DIR)
    bad = [
        f.name
        for f in df.schema.fields
        if f.dataType.typeName().startswith(UNHASHABLE_TYPES)
    ]
    assert not bad, f"{name} emits unhashable columns {bad}"
