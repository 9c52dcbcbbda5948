"""Session-timezone independence of every timestamp-touching query.

The round driver may run the contract on a VANILLA session whose
`spark.sql.session.timeZone` is the JVM default, not our UTC — and the
DuckDB oracle always computes on naive timestamps (effectively UTC wall
clocks). Round 2's NTZ regression was exactly this class of bug. These
tests re-run the timestamp-heavy queries with the session timezone
flipped to Asia/Tokyo (+9, no DST) and assert the oracle still matches:
any hidden dependence on the session zone (unix_timestamp on NTZ, an
LTZ cast, window bounds emitted as LTZ) shifts results by 9 h and fails
loudly here.
"""

from __future__ import annotations

import pytest

from s4_spark.queries import REGISTRY
from tests.conftest import SF_DIR, assert_oracle_match

# every oracle-backed query whose plan touches ts / dates materially
TZ_SENSITIVE = [
    "q081_datetime_functions",
    "q054_range_frame",
    "q091_tumbling_window",
    "q093_session_window",
    "q144_time_rollup",
    "q145_funnel",
    "q146_retention_cohorts",
    "q160_gap_fill",
    "q171_state_store_introspection",
    "q196_scd2_history",
    "q197_batch_sessionization",
    "q219_windowed_funnel",
    "q220_cohort_retention",
    "q222_event_transitions",
    "q227_rfm_segmentation",
    "q229_event_streaks",
    "q231_cusum_changepoint",
]


@pytest.mark.parametrize("name", TZ_SENSITIVE)
def test_query_is_session_timezone_independent(spark, duck, name):
    saved = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "Asia/Tokyo")
    try:
        q = REGISTRY[name]
        assert_oracle_match(q.fn(spark, SF_DIR), duck, q.oracle, name)
    finally:
        spark.conf.set("spark.sql.session.timeZone", saved)


def test_adaptive_parquet_read_keeps_session_conf_clean(spark):
    """ADVICE r3: the old unconditional ``nanosAsLong=true`` in
    events_stream/_events_stream_raw/table() leaked legacy parquet-read
    behavior into every later scan on a shared session. With µs/NTZ-typed
    data (current generator) the adaptive read must touch no conf at all."""
    from s4_spark.catalog import _NANOS_CONF, table
    from s4_spark.streaming.rigs import events_stream
    from tests.conftest import SMOKE_SF_DIR

    try:
        spark.conf.unset(_NANOS_CONF)
    except Exception:
        pass
    table(spark, SMOKE_SF_DIR, "events").limit(1).collect()
    events_stream(spark, SMOKE_SF_DIR)  # schema probe happens eagerly
    assert spark.conf.get(_NANOS_CONF, "false") == "false"


def test_adaptive_read_handles_nanos_typed_parquet(spark, tmp_path):
    """The events generator has stored ts as parquet TIMESTAMP(NANOS) in
    past rounds and may flip back. Pin the fallback: a plain read of a
    nanos-typed file fails schema inference, read_parquet_adaptive then
    enables the legacy conf (and leaves it on — execution re-reads it),
    the column scans as int64, and normalize_events floors to the same
    µs NTZ wall clock the native path yields."""
    import datetime

    import pyarrow as pa
    import pyarrow.parquet as pq

    from s4_spark.catalog import _NANOS_CONF, normalize_events, read_parquet_adaptive

    ts = datetime.datetime(2024, 3, 1, 12, 34, 56, 789012)
    tbl = pa.table(
        {
            "event_id": pa.array([1], pa.int64()),
            "ts": pa.array([ts], pa.timestamp("ns")),
            "user_id": pa.array([7], pa.int64()),
            "event_type": pa.array(["click"], pa.string()),
            "value": pa.array([1.5], pa.float64()),
            "props": pa.array(["{}"], pa.string()),
        }
    )
    path = str(tmp_path / "events_nanos.parquet")
    pq.write_table(tbl, path, coerce_timestamps=None)
    try:
        spark.conf.unset(_NANOS_CONF)
    except Exception:
        pass
    try:
        df = normalize_events(read_parquet_adaptive(spark, path))
        assert df.schema["ts"].dataType.typeName() == "timestamp_ntz"
        [row] = df.collect()
        assert row.ts == ts and row.event_id == 1
        # the conf must remain on: the scan consults it at execution time
        assert spark.conf.get(_NANOS_CONF) == "true"
    finally:
        spark.conf.unset(_NANOS_CONF)


class _CountingSession:
    """Proxy exposing exactly the surface read_parquet_adaptive touches
    (``.read`` and ``.conf``) with call counting, so the happy-path
    contract — ONE read attempt, ZERO conf mutations — is pinned
    directly rather than inferred from end-state."""

    def __init__(self, spark):
        self._spark = spark
        self.read_attempts = 0
        self.conf_sets = 0
        outer = self

        class _Conf:
            def get(self, k, d=None):
                return outer._spark.conf.get(k, d)

            def set(self, k, v):
                outer.conf_sets += 1
                outer._spark.conf.set(k, v)

            def unset(self, k):
                outer.conf_sets += 1
                outer._spark.conf.unset(k)

        self.conf = _Conf()

    @property
    def read(self):
        self.read_attempts += 1
        return self._spark.read


def test_adaptive_read_happy_path_is_one_attempt_no_conf_flip(spark):
    """VERDICT r4 item 7: on µs/NTZ-typed data (the current generator)
    the adaptive probe must cost nothing — exactly one read attempt and
    no conf mutation — so the fallback machinery can never regress into
    a double-read or the r3 conf leak."""
    from s4_spark.catalog import _NANOS_CONF, read_parquet_adaptive
    from tests.conftest import SMOKE_SF_DIR
    import os

    try:
        spark.conf.unset(_NANOS_CONF)
    except Exception:
        pass
    proxy = _CountingSession(spark)
    df = read_parquet_adaptive(proxy, os.path.join(SMOKE_SF_DIR, "events.parquet"))
    df.limit(1).collect()
    assert proxy.read_attempts == 1
    assert proxy.conf_sets == 0
    assert spark.conf.get(_NANOS_CONF, "false") == "false"


def test_adaptive_read_reraises_non_nanos_errors_without_conf_flip(spark):
    """ADVICE r4: a failure whose message does NOT match the
    TIMESTAMP(NANOS) signature (here: missing path) must re-raise
    unchanged — flipping the legacy conf on it would both mask the real
    error and leak nanos-as-long semantics onto µs-typed data."""
    import pytest as _pytest

    from s4_spark.catalog import _NANOS_CONF, read_parquet_adaptive

    try:
        spark.conf.unset(_NANOS_CONF)
    except Exception:
        pass
    proxy = _CountingSession(spark)
    with _pytest.raises(Exception) as exc_info:
        read_parquet_adaptive(proxy, "/nonexistent/s4_spark/no_such.parquet")
    assert "nanos" not in str(exc_info.value).lower()
    assert proxy.conf_sets == 0
    assert spark.conf.get(_NANOS_CONF, "false") == "false"
