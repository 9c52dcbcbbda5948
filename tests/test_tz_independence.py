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
