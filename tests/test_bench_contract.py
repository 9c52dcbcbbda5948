"""bench.py stdout-line contract (VERDICT r11 item 1).

The round driver captures only a 2,000-char tail of bench.py's stdout;
round 11's line grew to ~4 KB (the full idle per-query series was
embedded) and arrived truncated, so BENCH_r11.json recorded
``parsed: null``. These tests pin the emission contract: the line must
stay under 1,800 chars even with worst-case numeric widths, and must
carry the fields the driver and BASELINE.md consumers rely on — live
total, live per-query maps, idle_value, idle_git_sha.

No SparkSession needed: bench.build_payload/emit_line are pure.
"""

import json
import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench


def _worst_case_payload():
    # Every continuity key (36 queries + stream_ingest_1m) and every
    # extended key at a pessimistic 5-digit-seconds width; idle scalars
    # present. This is strictly wider than any plausible sf0.1 run.
    results = {name: 99999.999 for name in bench.HEADLINE}
    results["stream_ingest_1m"] = 99999.999
    extended = {name: 99999.999 for name in bench.EXTENDED}
    # idle series present WITH per-query maps, so the contamination
    # summary fields (n_over_2x_idle / worst_vs_idle) are emitted at
    # their widest plausible size
    idle = {
        "value": 99999.999,
        "git_sha": "0123456789ab",
        "queries": {k: 0.001 for k in results},
        "queries_extended": {k: 0.001 for k in extended},
    }
    return bench.build_payload(
        round(sum(results.values()), 3),
        results,
        extended,
        "0.1",
        "4.1.2",
        idle,
    )


def test_line_fits_driver_tail_capture():
    line = bench.emit_line(_worst_case_payload())
    assert len(line) < 1800, (
        f"bench stdout line is {len(line)} chars; the driver tail capture "
        "is 2,000 — keep headroom (full idle series belongs in "
        "bench/idle-sf*.json, never on stdout)"
    )
    # and it must be a single line
    assert "\n" not in line


def test_line_round_trips_with_required_fields():
    payload = _worst_case_payload()
    parsed = json.loads(bench.emit_line(payload))
    for field in (
        "metric",
        "value",
        "unit",
        "queries",
        "queries_extended",
        "extended_total",
        "sf",
        "idle_value",
        "idle_git_sha",
    ):
        assert field in parsed, field
    assert parsed["unit"] == "sec"
    assert parsed["sf"] == 0.1
    # continuity invariant: value == sum(queries.values())
    assert parsed["value"] == pytest.approx(sum(parsed["queries"].values()))
    # the full idle series must NOT be embedded (that is what overflowed)
    assert "idle" not in parsed
    assert isinstance(parsed["idle_value"], float)


def test_contamination_summary_fields():
    """VERDICT r13 item 4: a host stall must be visible from the emitted
    line alone — n_over_2x_idle counts queries running >2x their recorded
    idle seconds, worst_vs_idle names the worst offender."""
    parsed = json.loads(bench.emit_line(_worst_case_payload()))
    n_keys = len(parsed["queries"]) + len(parsed["queries_extended"])
    assert parsed["n_over_2x_idle"] == n_keys  # every key is 10^8x idle here
    name, ratio = parsed["worst_vs_idle"].rsplit(":", 1)
    assert name in parsed["queries"] or name in parsed["queries_extended"]
    assert float(ratio) > 2
    # absent when the idle recording carries no per-query series
    bare_idle = {"value": 1.0, "git_sha": "abc"}
    p2 = bench.build_payload(1.0, {"q001_parquet_scan": 1.0}, {}, "0.1",
                             "4.1.2", bare_idle)
    assert "n_over_2x_idle" not in p2 and "worst_vs_idle" not in p2


def test_idle_scalars_omitted_when_no_recording():
    payload = bench.build_payload(1.0, {"q001_parquet_scan": 1.0}, {}, "0.1", "4.1.2", None)
    parsed = json.loads(bench.emit_line(payload))
    assert "idle_value" not in parsed
    assert "idle" not in parsed


def test_recorded_idle_file_matches_emitted_scalars():
    """The checked-in idle recording must itself be consistent with what
    the emission path would surface from it."""
    idle_path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "bench",
        "idle-sf0.1.json",
    )
    if not os.path.exists(idle_path):
        pytest.skip("no idle recording present")
    with open(idle_path) as f:
        idle = json.load(f)
    payload = bench.build_payload(30.0, {"q001_parquet_scan": 30.0}, {}, "0.1", "4.1.2", idle)
    assert payload["idle_value"] == idle["value"]
    assert payload["idle_git_sha"] == idle["git_sha"]
    # the recording keeps the full series for triage
    assert set(idle["queries"]) == set(bench.HEADLINE) | {"stream_ingest_1m"}


def test_box_fingerprint_keys():
    """VERDICT r12 item 7: the idle series must carry a box-condition
    fingerprint so cross-round drift is attributable from the recorded
    JSON alone. bench.main() stamps box_fingerprint() into
    bench/idle-sf{sf}.json under "box"; pin the keys here (and that
    scale_sweep shares the implementation rather than forking it)."""
    fp = bench.box_fingerprint()
    assert {"load1", "mem_free_mb", "page_cache_mb",
            "other_python_java_procs"} <= set(fp)
    assert all(v is not None for v in fp.values()), fp
    src = open(os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "bench", "scale_sweep.py")).read()
    assert "from bench import box_fingerprint" in src
    src_bench = open(os.path.join(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))), "bench.py")).read()
    # captured pre-session (box_fingerprint() before get_spark in main),
    # stamped into the idle write as "box"
    assert '"box": box,' in src_bench
    assert src_bench.index("box = box_fingerprint()") < src_bench.index(
        'get_spark(app_name="s4_bench"')
