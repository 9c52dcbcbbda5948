"""B9 — streaming (SURVEY.md §2-B9, Q090-Q099): S4 pipeline parity plus
the Structured Streaming operator surface. All checks are batch-equiv
(availableNow over the static events table); the watermark replay rigs
(q094/q165) are deterministic by construction, so since round 6 even
their final tables carry DuckDB oracles over the phase-known feeds.
"""

from __future__ import annotations

import os
import sys

import pandas as pd

from pyspark.sql import functions as F

from s4_spark.queries.helpers import dsum, ordered_small, sql_dsum, t
from s4_spark.queries.registry import query
from s4_spark.streaming.rigs import (
    events_stream,
    instant_as_utc_ntz,
    ntz_as_utc_instant,
    run_to_memory,
    run_to_parquet,
    scratch,
)


@query(
    "q090_s4_pipeline_parity",
    oracle="""
    WITH feed AS (SELECT * FROM events),
    out AS (
      SELECT CAST(year(ts) AS INT) AS year, CAST(month(ts) AS INT) AS month,
             CAST(day(ts) AS INT) AS day, event_id, value
      FROM feed)
    SELECT count(*) AS n_records,
           count(DISTINCT (year, month, day)) AS n_partitions,
           CAST(sum(event_id) AS BIGINT) AS sum_ids,
           {sv} AS sum_value
    FROM out
    """.format(sv=sql_dsum("value")),
    section="B9-streaming",
)
def q090(spark, sf_dir):
    """S4 pipeline parity, end to end (mirrors A4+A8+A12+A16-A18):

    events → JSON-lines feed (+4 malformed records: top-level array,
    scalar, string, truncated object — the reference's drop cases,
    /root/reference/river/jsonr.go:106-109) → streaming text source →
    JSON validation (malformed silently dropped) → gzip text sink
    partitioned year=/month=/day= by event time → re-read and aggregate.
    The oracle sees only the original events table: equality proves the
    malformed records were dropped and everything else survived the
    gzip/partition round trip byte-exactly."""
    from s4_spark.pipeline.s4 import S4Config, run_once

    landing = scratch(f"q090_landing_{os.path.basename(sf_dir)}")
    os.makedirs(landing, exist_ok=True)
    ev = t(spark, sf_dir, "events").select(
        F.to_json(
            F.struct("event_id", "ts", "user_id", "event_type", "value", "props")
        ).alias("value")
    )
    ev.coalesce(4).write.mode("overwrite").text(landing)
    with open(os.path.join(landing, "malformed.txt"), "w") as f:
        f.write('[1, 2]\n42\n"str"\n{"event_id":\n')  # FIXTURES.md §2 drop cases

    out_dir = scratch(f"q090_out_{os.path.basename(sf_dir)}")
    cfg = S4Config(
        input_path=landing,
        output_path=out_dir,
        checkpoint_path=scratch(f"q090_ckpt_{os.path.basename(sf_dir)}"),
        record_type="json",
        json_schema="event_id long, ts timestamp, user_id long, "
        "event_type string, value double, props string",
        event_time_col="ts",
    )
    run_once(spark, cfg)

    parsed_back = spark.read.text(out_dir).withColumn(
        "__row",
        F.from_json(
            "value",
            "event_id long, ts timestamp, user_id long, event_type string, "
            "value double, props string",
        ),
    )
    return parsed_back.agg(
        F.count("*").alias("n_records"),
        F.countDistinct(
            F.struct(
                F.year("__row.ts").alias("year"),
                F.month("__row.ts").alias("month"),
                F.dayofmonth("__row.ts").alias("day"),
            )
        ).alias("n_partitions"),
        F.sum("__row.event_id").cast("long").alias("sum_ids"),
        dsum(F.col("__row.value")).alias("sum_value"),
    )


@query(
    "q091_tumbling_window",
    oracle="""
    SELECT time_bucket(INTERVAL 10 MINUTE, ts) AS w_start,
           count(*) AS n, {sv} AS sum_value
    FROM events GROUP BY w_start ORDER BY w_start
    """.format(sv=sql_dsum("value")),
    section="B9-streaming",
)
def q091(spark, sf_dir):
    """Streaming tumbling-window aggregate (10 min), complete mode,
    availableNow — batch-equivalent to DuckDB time_bucket."""
    ev = events_stream(spark, sf_dir)
    agg = (
        ev.groupBy(F.window("ts", "10 minutes").alias("w"))
        .agg(F.count("*").alias("n"), dsum("value").alias("sum_value"))
        .select(instant_as_utc_ntz("w.start").alias("w_start"), "n", "sum_value")
    )
    # bounded result (calendar-sized window buckets)
    return ordered_small(run_to_memory(agg, mode="complete", tag="q091"), "w_start")


@query(
    "q092_sliding_window",
    oracle="""
    WITH b AS (
      SELECT time_bucket(INTERVAL 5 MINUTE, ts) AS w_start, value FROM events
      UNION ALL
      SELECT time_bucket(INTERVAL 5 MINUTE, ts) - INTERVAL 5 MINUTE, value
      FROM events)
    SELECT w_start, count(*) AS n, {sv} AS sum_value
    FROM b GROUP BY w_start ORDER BY w_start
    """.format(sv=sql_dsum("value")),
    section="B9-streaming",
)
def q092(spark, sf_dir):
    """Sliding window (10 min width, 5 min slide): every event belongs to
    two windows; the oracle materializes both memberships explicitly."""
    ev = events_stream(spark, sf_dir)
    agg = (
        ev.groupBy(F.window("ts", "10 minutes", "5 minutes").alias("w"))
        .agg(F.count("*").alias("n"), dsum("value").alias("sum_value"))
        .select(instant_as_utc_ntz("w.start").alias("w_start"), "n", "sum_value")
    )
    # bounded result (calendar-sized window buckets)
    return ordered_small(run_to_memory(agg, mode="complete", tag="q092"), "w_start")


@query(
    "q093_session_window",
    oracle="""
    WITH g AS (
      SELECT user_id, ts,
             CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                       > INTERVAL 30 MINUTE OR
                  lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
             THEN 1 ELSE 0 END AS new_session
      FROM events),
    s AS (
      SELECT user_id, ts,
             sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
      FROM g)
    SELECT user_id, min(ts) AS session_start, count(*) AS n
    FROM s GROUP BY user_id, session_id
    ORDER BY user_id, session_start
    """,
    section="B9-streaming",
)
def q093(spark, sf_dir):
    """Session windows (30-min gap) per user — checked against the
    classic gaps-and-islands SQL."""
    ev = events_stream(spark, sf_dir)
    agg = (
        ev.groupBy("user_id", F.session_window("ts", "30 minutes").alias("w"))
        .agg(F.count("*").alias("n"))
        .select(
            "user_id", instant_as_utc_ntz("w.start").alias("session_start"), "n"
        )
    )
    return run_to_memory(agg, mode="complete", tag="q093").orderBy(
        "user_id", "session_start"
    )


@query(
    "q094_watermark_late_drop",
    oracle="""
    WITH lo AS (SELECT min(ts) AS lo FROM events),
    p1 AS (
      SELECT lo + INTERVAL 1 MINUTE *
             ((row_number() OVER (ORDER BY event_id) - 1) % 60) AS ts
      FROM events, lo)
    SELECT time_bucket(INTERVAL 10 MINUTE, ts) AS w_start, count(*) AS n
    FROM p1 GROUP BY w_start ORDER BY w_start
    """,
    section="B9-streaming",
)
def q094(spark, sf_dir):
    """Watermark semantics via the two-phase replay rig (SURVEY §7 risk 2).

    Phase 1: every events row, with its event time synthesized as
    lo + (row_number % 60) minutes (row_number ordered by event_id) —
    exactly one hour of data at EVERY scale factor, so the watermark
    after phase 1 sits at 00:49 regardless of the real table's span
    (the previous feed reused raw timestamps and broke at sf0.001,
    whose events span under 20 minutes — the "late" rows weren't
    late there). Phase 2: 50 replay rows at 00:05 (window end 00:10 <
    watermark 00:49 → dropped) plus 100 fresh rows at 02:00, pushing
    the final watermark to 01:50 so every phase-1 window closes; the
    02:00 window itself (end 02:10 > 01:50) stays open and never
    reaches append output.

    The final append table is therefore exactly the 10-minute windows
    over the synthesized PHASE-1 feed — the oracle above (round-5
    verdict item 4: upgraded from rows-only; the phase-known feed makes
    the dropped/kept partition fully oracle-expressible). The pytest
    rig additionally asserts the dropped set row-for-row vs a batch
    run. The global row_number is feed construction (sf-bounded test
    producer), not a query-path pattern."""
    from pyspark.sql import Window as W

    ev = t(spark, sf_dir, "events").select("event_id", "ts")
    if ev.schema["ts"].dataType.typeName() == "timestamp_ntz":
        # event time (withWatermark) requires TIMESTAMP; pin wall clock=UTC
        ev = ev.withColumn("ts", ntz_as_utc_instant("ts"))
    lo = ev.agg(F.min("ts")).collect()[0][0]
    base = F.lit(lo).cast("timestamp")
    p1 = ev.select(
        "event_id",
        F.timestamp_add(
            "MINUTE",
            ((F.row_number().over(W.orderBy("event_id")) - F.lit(1)) % 60).cast("int"),
            base,
        ).alias("ts"),
    )
    late = (
        spark.range(50)
        .select(
            (F.col("id") - 1000000).alias("event_id"),
            F.timestamp_add("MINUTE", F.lit(5), base).alias("ts"),
        )
    )
    fresh = spark.range(100).select(
        (F.col("id") - 2000000).alias("event_id"),
        F.timestamp_add("HOUR", F.lit(2), base).alias("ts"),
    )
    p2 = late.unionByName(fresh)

    from s4_spark.streaming.rigs import two_phase_replay

    def build(stream):
        return (
            stream.withWatermark("ts", "10 minutes")
            .groupBy(F.window("ts", "10 minutes").alias("w"))
            .agg(F.count("*").alias("n"))
            .select(instant_as_utc_ntz("w.start").alias("w_start"), "n")
        )

    # bounded result (calendar-sized window buckets)
    return ordered_small(two_phase_replay(spark, p1, p2, build, tag="q094"), "w_start")


@query(
    "q095_streaming_dedup",
    oracle="""
    SELECT count(*) AS n_after_dedup FROM events
    """,
    section="B9-streaming",
)
def q095(spark, sf_dir):
    """Streaming dropDuplicates over a doubled feed: the source replays
    every event twice; state-backed dedup on event_id restores exactly
    the distinct set. (Distinct AGGREGATES are unsupported on streams —
    dedup state is the streaming-native spelling.)"""
    ev = events_stream(spark, sf_dir)
    doubled = ev.unionByName(ev)
    deduped = doubled.dropDuplicates(["event_id"])
    agg = deduped.agg(F.count("*").alias("n_after_dedup"))
    return run_to_memory(agg, mode="complete", tag="q095")


@query(
    "q096_output_modes",
    oracle="""
    SELECT event_type, count(*) AS n FROM events
    GROUP BY event_type ORDER BY event_type
    """,
    section="B9-streaming",
)
def q096(spark, sf_dir):
    """Stateful agg output modes: complete-mode final state equals the
    batch aggregate (update mode exercised by the q094 rig; append mode
    by q099's file sink)."""
    ev = events_stream(spark, sf_dir)
    agg = ev.groupBy("event_type").agg(F.count("*").alias("n"))
    # bounded result (one row per event type)
    return ordered_small(
        run_to_memory(agg, mode="complete", tag="q096"), "event_type"
    )


@query(
    "q097_arbitrary_stateful",
    oracle="""
    SELECT user_id, max(value) AS running_max, count(*) AS n_seen
    FROM events GROUP BY user_id ORDER BY user_id
    """,
    section="B9-streaming",
)
def q097(spark, sf_dir):
    """Arbitrary stateful op via applyInPandasWithState: per-user running
    max + seen-count kept in explicit GroupState; the availableNow final
    snapshot equals the batch aggregate."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    ev = events_stream(spark, sf_dir).select("user_id", "value")

    def running_max(key, pdfs, state: GroupState):
        mx, n = state.get if state.exists else (float("-inf"), 0)
        for pdf in pdfs:
            if len(pdf):
                mx = max(mx, float(pdf["value"].max()))
                n += len(pdf)
        state.update((mx, n))
        yield pd.DataFrame(
            {"user_id": [key[0]], "running_max": [mx], "n_seen": [n]}
        )

    out = ev.groupBy("user_id").applyInPandasWithState(
        running_max,
        outputStructType="user_id long, running_max double, n_seen long",
        stateStructType="mx double, n long",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    return run_to_memory(out, mode="update", tag="q097").orderBy("user_id")


@query(
    "q098_stream_static_join",
    oracle="""
    SELECT n.n_name, count(*) AS n_events
    FROM events e
    JOIN customer c ON e.user_id = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    GROUP BY n.n_name ORDER BY n.n_name
    """,
    section="B9-streaming",
)
def q098(spark, sf_dir):
    """Stream-static join: streaming events against the static customer/
    nation dims (broadcast — the dims are loaded per micro-batch, so at
    100 TB they must be broadcast-sized or pre-bucketed)."""
    ev = events_stream(spark, sf_dir)
    c = t(spark, sf_dir, "customer")
    n = t(spark, sf_dir, "nation")
    joined = (
        ev.join(F.broadcast(c), ev.user_id == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(F.count("*").alias("n_events"))
    )
    # bounded result (one row per nation)
    return ordered_small(run_to_memory(joined, mode="complete", tag="q098"), "n_name")


@query(
    "q099_foreachbatch_sink",
    oracle="""
    SELECT event_type, count(*) AS n, {sv} AS sum_value
    FROM events GROUP BY event_type ORDER BY event_type
    """.format(sv=sql_dsum("value")),
    section="B9-streaming",
)
def q099(spark, sf_dir):
    """foreachBatch custom sink: each micro-batch is written as parquet
    keyed by batchId (idempotent on retry — the exactly-once upgrade of
    the reference's log-and-drop error policy, main.go:88-104); the
    re-read equals the batch aggregate."""
    out_dir = scratch(f"q099_out_{os.path.basename(sf_dir)}")
    ev = events_stream(spark, sf_dir)

    def write_batch(batch_df, batch_id: int):
        (
            batch_df.write.mode("overwrite").parquet(
                os.path.join(out_dir, f"batch={batch_id}")
            )
        )

    q = (
        ev.writeStream.foreachBatch(write_batch)
        .trigger(availableNow=True)
        .option("checkpointLocation", scratch(f"q099_ckpt_{os.path.basename(sf_dir)}"))
        .start()
    )
    q.awaitTermination()
    back = spark.read.parquet(out_dir + "/batch=*")
    return (
        back.groupBy("event_type")
        .agg(F.count("*").alias("n"), dsum("value").alias("sum_value"))
        # bounded result (one row per event type)
        .transform(ordered_small, "event_type")
    )


@query(
    "q106_stream_stream_join",
    oracle="""
    SELECT a.user_id, count(*) AS n_pairs
    FROM events a JOIN events b
    ON a.user_id = b.user_id
    AND b.ts > a.ts AND b.ts <= a.ts + INTERVAL 1 MINUTE
    GROUP BY a.user_id ORDER BY a.user_id
    """,
    section="B9-streaming",
)
def q106(spark, sf_dir):
    """Stream-stream inner join: two event streams joined per user within
    a 1-minute time bound, both sides watermarked so the state store can
    evict rows older than (watermark - bound) — THE requirement for an
    unbounded join at 100 TB. Batch-equiv check: availableNow over the
    static events file, joined pairs land in a memory sink and are
    summarized per user (single source file -> single micro-batch, so
    the initial watermark drops nothing and the result equals the batch
    self-join)."""
    a = events_stream(spark, sf_dir).select(
        F.col("user_id").alias("a_user"), F.col("ts").alias("a_ts")
    ).withWatermark("a_ts", "1 hour")
    b = events_stream(spark, sf_dir).select(
        F.col("user_id").alias("b_user"), F.col("ts").alias("b_ts")
    ).withWatermark("b_ts", "1 hour")
    pairs = a.join(
        b,
        (F.col("a_user") == F.col("b_user"))
        & (F.col("b_ts") > F.col("a_ts"))
        & (F.col("b_ts") <= F.col("a_ts") + F.expr("INTERVAL 1 MINUTE")),
    )
    sunk = run_to_memory(pairs, mode="append", tag="q106")
    return (
        sunk.groupBy(F.col("a_user").alias("user_id"))
        .agg(F.count("*").alias("n_pairs"))
        .orderBy("user_id")
    )


@query(
    "q149_incremental_ingest_dedup",
    oracle="""
    WITH hist AS (SELECT DISTINCT sha256(text) AS h FROM documents
                  WHERE doc_id % 3 = 0)
    SELECT lang, count(DISTINCT sha256(text)) AS n_new
    FROM documents
    WHERE sha256(text) NOT IN (SELECT h FROM hist)
    GROUP BY lang ORDER BY lang
    """,
    section="B9-streaming",
)
def q149(spark, sf_dir):
    """Incremental ingest dedup — the streaming form of q110: newly
    arriving documents are content-hashed, dropped if the hash exists in
    the HISTORICAL corpus (stream-static left-anti against the hash
    manifest), and deduped within the stream itself
    (``dropDuplicates`` on the hash — state bounded by new-data hashes).

    At 100 TB the historical manifest is a hash-bucketed table, far
    smaller than the corpus (32 B/doc); the anti-join broadcasts when it
    fits, else pre-bucketed storage co-locates it with a hash-
    repartitioned stream. This is how every nightly corpus refresh
    avoids re-deduplicating the full archive."""
    docs_dir = scratch(f"q149_landing_{os.path.basename(sf_dir)}")
    os.makedirs(docs_dir, exist_ok=True)
    docs = t(spark, sf_dir, "documents")
    docs.write.mode("overwrite").parquet(os.path.join(docs_dir, "new"))
    history = (
        docs.filter(F.col("doc_id") % 3 == 0)
        .select(F.sha2("text", 256).alias("h"))
        .distinct()
    )
    stream = (
        spark.readStream.schema(docs.schema)
        .format("parquet")
        .load(os.path.join(docs_dir, "new"))
        .withColumn("h", F.sha2("text", 256))
    )
    fresh = (
        stream.join(F.broadcast(history), "h", "left_anti")
        .dropDuplicates(["h", "lang"])
        .groupBy("lang")
        .agg(F.count("*").alias("n_new"))
    )
    out = run_to_memory(fresh.select("lang", "n_new"), mode="complete", tag="q149")
    # bounded result (one row per language)
    return ordered_small(out, "lang")


@query(
    "q165_stream_stream_outer_join",
    oracle="""
    WITH ev AS (SELECT min(ts) AS lo FROM events),
    l AS (SELECT range::int AS user_id, lo AS lts, range::int * 10 AS l_val
          FROM range(20), ev),
    r AS (SELECT range::int AS r_user, lo + INTERVAL 5 MINUTE AS rts,
                 range::int * 100 AS r_val
          FROM range(10), ev)
    SELECT l.user_id, l.l_val, r.r_val
    FROM l LEFT JOIN r
      ON l.user_id = r.r_user
     AND r.rts >= l.lts AND r.rts <= l.lts + INTERVAL 10 MINUTE
    ORDER BY user_id
    """,
    section="B9-streaming",
)
def q165(spark, sf_dir):
    """Watermarked stream-stream LEFT OUTER join — the hard half of the
    join matrix (q106 covers inner): matched pairs emit immediately;
    unmatched left rows emit null-padded only once BOTH watermarks pass
    the join window's expiry, which the two-stream replay rig forces
    deterministically with a far-future sentinel phase.

    Construction: 20 left rows at t0; right matches for users 0-9 at
    t0+5min; phase 2 is a +2h sentinel on each side (disjoint user ids,
    so sentinels never join) that advances both watermarks past
    t0 + 10min window + 5min delay. The oracle rebuilds the phase-1
    universe and applies the interval-join predicate verbatim — the
    streaming result must equal that batch LEFT JOIN exactly (10 matched
    + 10 null-padded rows; round-5 verdict item 4 upgraded this from
    rows-only). The sentinels themselves cannot appear: their own
    expiry (t0+2h +10min window +5min delay) is past the final
    watermark t0+1h55m, so Spark still holds them as open state.
    State cleanup is bounded by the both-sided time condition
    (Spark evicts left rows once the right watermark clears their
    window) — the property that makes this run forever at 100 TB."""
    ev = t(spark, sf_dir, "events").select("ts").orderBy("ts")
    lo = ev.limit(1).collect()[0][0]
    base = F.lit(lo).cast("timestamp")

    mk = lambda rows, schema: spark.createDataFrame(rows, schema)  # noqa: E731
    l1 = spark.range(20).select(
        F.col("id").cast("int").alias("user_id"),
        base.alias("lts"),
        (F.col("id") * 10).cast("int").alias("l_val"),
    )
    r1 = spark.range(10).select(
        F.col("id").cast("int").alias("r_user"),
        F.timestamp_add("MINUTE", F.lit(5), base).alias("rts"),
        (F.col("id") * 100).cast("int").alias("r_val"),
    )
    l2 = spark.range(1).select(
        F.lit(999).alias("user_id"),
        F.timestamp_add("HOUR", F.lit(2), base).alias("lts"),
        F.lit(-1).alias("l_val"),
    )
    r2 = spark.range(1).select(
        F.lit(998).alias("r_user"),
        F.timestamp_add("HOUR", F.lit(2), base).alias("rts"),
        F.lit(-1).alias("r_val"),
    )

    from s4_spark.streaming.rigs import two_stream_two_phase

    def build(ls, rs):
        lw = ls.withWatermark("lts", "5 minutes")
        rw = rs.withWatermark("rts", "5 minutes")
        return lw.join(
            rw,
            (F.col("user_id") == F.col("r_user"))
            & (F.col("rts") >= F.col("lts"))
            & (F.col("rts") <= F.col("lts") + F.expr("INTERVAL 10 MINUTES")),
            "left_outer",
        ).select("user_id", "l_val", "r_val")

    return two_stream_two_phase(spark, l1, r1, l2, r2, build, tag="q165").orderBy(
        "user_id"
    )


@query(
    "q171_state_store_introspection",
    oracle="""
    SELECT event_type, count(*) AS n FROM events
    GROUP BY event_type ORDER BY event_type
    """,
    section="B9-streaming",
)
def q171(spark, sf_dir):
    """State-store introspection (Spark 4 `statestore` reader): run a
    stateful streaming aggregation to its checkpoint, then read the
    RocksDB state store BACK as a DataFrame — per-key aggregation
    buffers equal the batch aggregate exactly.

    This is the operational debugging surface a production streaming
    deployment needs (inspect/audit live state without stopping the
    query) and the closest Spark analog to reading the reference's
    LevelDB buffer directly (river/jsonr.go's durable store — here the
    state store is queryable with the full DataFrame API instead of a
    custom dump tool). At 100 TB state scale the reader lists one
    RocksDB snapshot per shuffle partition — parallel, no driver
    materialization."""
    from s4_spark.streaming.rigs import _counter

    ev = events_stream(spark, sf_dir)
    run_id = f"{os.path.basename(sf_dir)}_{next(_counter)}".replace(".", "_")
    ckpt = scratch(f"q171_ckpt_{run_id}")
    agg = ev.groupBy("event_type").agg(F.count("*").alias("n"))
    name = f"s4_q171_{run_id}"
    q = (
        agg.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .option("checkpointLocation", ckpt)
        .start()
    )
    q.awaitTermination()
    state = spark.read.format("statestore").load(ckpt)
    return (
        state.select(
            F.col("key.event_type").alias("event_type"),
            F.col("value.count").alias("n"),
        )
        # bounded result (one state row per event type)
        .transform(ordered_small, "event_type")
    )


VENDOR_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "_vendor"
)


def transform_with_state_available() -> bool:
    """Spark 4's transformWithStateInPandas drives its state-server
    protocol over protobuf; without the ``protobuf`` package the Python
    driver worker crashes at import. A real installation wins; when the
    import fails we fall back to the vendored minimal runtime under
    s4_spark/_vendor (round-5 verdict item 3 — declaring the dependency
    in requirements.txt demonstrably did not make the container satisfy
    it). The fallback also prepends the vendor dir to PYTHONPATH so a
    JVM (and its Python worker daemon) launched AFTER this import
    inherits it; for sessions that are already running, _q174 ships the
    same files to workers via addPyFile."""
    try:
        import google.protobuf  # noqa: F401

        return True
    except ImportError:
        pass
    if not os.path.isdir(os.path.join(VENDOR_DIR, "google", "protobuf")):
        return False
    if VENDOR_DIR not in sys.path:
        sys.path.insert(0, VENDOR_DIR)
    env_path = os.environ.get("PYTHONPATH", "")
    if VENDOR_DIR not in env_path.split(os.pathsep):
        os.environ["PYTHONPATH"] = (
            VENDOR_DIR + (os.pathsep + env_path if env_path else "")
        )
    try:
        import google.protobuf  # noqa: F401

        return True
    except ImportError:
        return False


def _ship_vendored_protobuf(spark) -> None:
    """Make the vendored google.protobuf importable in Python workers of
    an ALREADY-RUNNING session (whose daemon env predates the gate's
    PYTHONPATH edit): zip the vendor tree once per process and addPyFile
    it — Spark inserts the zip into every worker's sys.path. No-op when
    the real package resolved (workers then see it the same way)."""
    if VENDOR_DIR not in sys.path:
        return
    import zipfile

    from s4_spark.scratch import scratch_root

    zip_path = os.path.join(scratch_root(), "vendored_protobuf.zip")
    if not os.path.exists(zip_path):
        os.makedirs(os.path.dirname(zip_path), exist_ok=True)
        tmp = zip_path + ".tmp"
        with zipfile.ZipFile(tmp, "w") as zf:
            for root, _dirs, files in os.walk(os.path.join(VENDOR_DIR, "google")):
                for fname in files:
                    if fname.endswith(".py"):
                        full = os.path.join(root, fname)
                        zf.write(full, os.path.relpath(full, VENDOR_DIR))
        os.replace(tmp, zip_path)
    sc = spark.sparkContext
    sc.addPyFile(zip_path)
    # The transformWithState DRIVER worker is launched by PythonWorkerFactory
    # with the PythonFunction's envVars = sc.environment (captured when the
    # stateful processor is wrapped, i.e. after this call) — PYTHONPATH here
    # is merged with the Spark python path JVM-side, so it reaches that
    # worker even when the JVM env predates the vendor-dir fallback.
    env_path = sc.environment.get("PYTHONPATH", "")
    if VENDOR_DIR not in env_path.split(os.pathsep):
        sc.environment["PYTHONPATH"] = (
            VENDOR_DIR + (os.pathsep + env_path if env_path else "")
        )


def _q174(spark, sf_dir):
    """Arbitrary stateful op on Spark 4's transformWithStateInPandas —
    the successor API to q097's applyInPandasWithState: state lives in
    named handles (value/list/map state, timers, TTL) on the RocksDB
    state store instead of one opaque GroupState tuple. Same declared
    contract as q097 (per-user running max + seen-count; availableNow
    final snapshot equals the batch aggregate), so the two entries pin
    batch-equivalence of BOTH stateful APIs side by side.

    The provider conf is set here — not only in get_spark() — because
    transformWithState REQUIRES RocksDB and the driver may run this on a
    vanilla session (same self-sufficiency rationale as catalog.table)."""
    from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle

    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    _ship_vendored_protobuf(spark)
    ev = events_stream(spark, sf_dir).select("user_id", "value")

    class RunningMax(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._state = handle.getValueState("agg", "mx double, n long")

        def handleInputRows(self, key, rows, timer_values):
            if self._state.exists():
                mx, n = self._state.get()
            else:
                mx, n = float("-inf"), 0
            for pdf in rows:
                if len(pdf):
                    mx = max(mx, float(pdf["value"].max()))
                    n += len(pdf)
            self._state.update((mx, n))
            yield pd.DataFrame(
                {"user_id": [key[0]], "running_max": [mx], "n_seen": [n]}
            )

        def close(self) -> None:
            pass

    out = ev.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=RunningMax(),
        outputStructType="user_id long, running_max double, n_seen long",
        outputMode="Update",
        timeMode="None",
    )
    return run_to_memory(out, mode="update", tag="q174").orderBy("user_id")


if transform_with_state_available():  # pragma: no cover - env-dependent
    query(
        "q174_transform_with_state",
        oracle="""
    SELECT user_id, max(value) AS running_max, count(*) AS n_seen
    FROM events GROUP BY user_id ORDER BY user_id
    """,
        section="B9-streaming",
    )(_q174)


@query(
    "q179_dedup_within_watermark",
    oracle="""
    SELECT count(*) AS n_after_dedup FROM events
    """,
    section="B9-streaming",
)
def q179(spark, sf_dir):
    """Streaming dedup with WATERMARK-BOUNDED state
    (``dropDuplicatesWithinWatermark``, Spark 3.5+) — the form that
    survives 100 TB: q095's plain ``dropDuplicates`` keeps every key
    seen FOREVER (state grows with the stream's lifetime; on an
    unbounded ingest that is an OOM with a delay fuse), while this
    operator evicts a key's state once the watermark passes its event
    time + delay, bounding state to the duplicate-arrival window (here
    10 minutes — the realistic at-least-once-redelivery horizon, not
    corpus history). The doubled feed replays every event twice inside
    the window, so the deduped count equals the distinct set exactly —
    same oracle as q095, different state contract."""
    ev = events_stream(spark, sf_dir)
    doubled = ev.unionByName(ev).withWatermark("ts", "10 minutes")
    deduped = doubled.dropDuplicatesWithinWatermark(["event_id"])
    agg = deduped.agg(F.count("*").alias("n_after_dedup"))
    return run_to_memory(agg, mode="complete", tag="q179")


@query(
    "q209_streaming_index_maintenance",
    oracle="""
    SELECT CAST(count(*) AS BIGINT) AS n_docs,
           CAST(count(*) * 24 AS BIGINT) AS n_band_rows,
           CAST(24 AS BIGINT) AS bands_per_doc,
           CAST(min(doc_id) AS BIGINT) AS min_doc,
           CAST(max(doc_id) AS BIGINT) AS max_doc
    FROM documents
    """,
    section="B9-streaming",
)
def q209(spark, sf_dir):
    """Streaming maintenance of the q203 LSH dedup index — the piece
    that makes cross-snapshot dedup CONTINUOUS: new documents stream
    in, each micro-batch minhash-signs ONLY ITSELF and appends its band
    rows to the persisted index, so the index is always current without
    any corpus-wide rebuild (the kappa pairing of q203's batch
    snapshot split, exactly as q197 pairs q093).

    Exactly-once: each micro-batch writes to a ``batch_id=<N>`` leaf
    with overwrite — a replayed batch (sink failure after write,
    before commit) rewrites the SAME leaf with the SAME deterministic
    rows (xxhash signatures, no rand), so duplication is structurally
    impossible; blind ``mode("append")`` would double-index on replay.
    The seed snapshot (first corpus half) lands as leaf batch_id=-1 by
    the same path.

    The check re-reads the maintained index and pins its global
    invariants (every doc indexed exactly once, exactly 24 band rows
    each, id range) against the corpus — hash-dependent band values
    themselves are never oracled, per the B11 methodology. At 100 TB
    the index partitions by band_key range under each batch leaf, and
    compaction (q153) folds old batch leaves together."""
    docs = t(spark, sf_dir, "documents")
    half = docs.count() // 2
    name = os.path.basename(sf_dir)
    landing = scratch(f"q209_landing_{name}")
    index_dir = scratch(f"q209_index_{name}")
    os.makedirs(index_dir, exist_ok=True)

    from s4_spark.operators import dedup as D

    def band_rows(df):
        sig = D.with_minhash_signature(
            D.shingles_exploded(df, "doc_id"), "doc_id"
        )
        return D.banded_signatures(sig, "doc_id")

    band_rows(docs.filter(F.col("doc_id") < half)).write.mode(
        "overwrite"
    ).parquet(os.path.join(index_dir, "batch_id=-1"))

    os.makedirs(landing, exist_ok=True)
    docs.filter(F.col("doc_id") >= half).write.mode("overwrite").parquet(
        os.path.join(landing, "new")
    )
    stream = (
        spark.readStream.schema(docs.schema)
        .format("parquet")
        .load(os.path.join(landing, "new"))
    )

    def upsert(batch_df, batch_id):
        band_rows(batch_df).write.mode("overwrite").parquet(
            os.path.join(index_dir, f"batch_id={batch_id}")
        )

    q = (
        stream.writeStream.foreachBatch(upsert)
        .trigger(availableNow=True)
        .option("checkpointLocation", scratch(f"q209_ckpt_{name}"))
        .start()
    )
    q.awaitTermination()

    index = spark.read.parquet(index_dir).select("doc_id")
    return index.agg(
        F.countDistinct("doc_id").cast("long").alias("n_docs"),
        F.count("*").cast("long").alias("n_band_rows"),
        (F.count("*") / F.countDistinct("doc_id")).cast("long").alias(
            "bands_per_doc"
        ),
        F.min("doc_id").cast("long").alias("min_doc"),
        F.max("doc_id").cast("long").alias("max_doc"),
    )


def _funnel_stateful_stream(spark, sf_dir):
    """The q234 funnel state machine as a streaming DataFrame: per-user
    GroupState = three write-once microsecond instants (first view,
    first in-deadline click, first in-deadline purchase). Shared by
    q234 (aggregate batch-equivalence) and q238 (statestore
    introspection of the same state).

    Event time crosses into Python as ``unix_micros(ts)`` — a plain
    int64 — NOT as a timestamp column: Arrow renders TIMESTAMP values
    session-timezone-naive inside applyInPandas workers, so pandas
    epoch math silently shifts by the session offset on any non-UTC
    session (caught by the round-6 vanilla-session check via q238,
    whose ABSOLUTE timestamps expose the shift that q234's
    shift-invariant lags masked)."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    DEADLINE_US = 48 * 3600 * 1_000_000
    ev = events_stream(spark, sf_dir).select(
        "user_id", "event_type", F.unix_micros("ts").alias("ts_us"), "event_id"
    )

    def funnel(key, pdfs, state: GroupState):
        t1, t2, t3 = state.get if state.exists else (-1, -1, -1)
        batch = [pdf for pdf in pdfs if len(pdf)]
        if batch:
            pdf = pd.concat(batch).sort_values(["ts_us", "event_id"])
            for et, t_us in zip(pdf["event_type"].values, pdf["ts_us"].values):
                t_us = int(t_us)
                if t1 < 0:
                    if et == "view":
                        t1 = t_us
                elif t2 < 0:
                    if et == "click" and t1 < t_us <= t1 + DEADLINE_US:
                        t2 = t_us
                elif t3 < 0:
                    if et == "purchase" and t2 < t_us <= t2 + DEADLINE_US:
                        t3 = t_us
        state.update((t1, t2, t3))
        yield pd.DataFrame(
            {"user_id": [key[0]], "t1": [t1], "t2": [t2], "t3": [t3]}
        )

    return ev.groupBy("user_id").applyInPandasWithState(
        funnel,
        outputStructType="user_id long, t1 long, t2 long, t3 long",
        stateStructType="t1 long, t2 long, t3 long",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


@query(
    "q234_streaming_funnel",
    # Identical SQL to q219's batch windowed funnel: the stream's final
    # state must equal the batch computation (kappa pairing).
    oracle="""
    WITH s1 AS (
      SELECT user_id, min(ts) AS t1 FROM events
      WHERE event_type = 'view' GROUP BY user_id),
    s2 AS (
      SELECT e.user_id, min(e.ts) AS t2, min(s1.t1) AS t1
      FROM events e JOIN s1 ON e.user_id = s1.user_id
        AND e.ts > s1.t1 AND e.ts <= s1.t1 + INTERVAL 48 HOUR
      WHERE e.event_type = 'click' GROUP BY e.user_id),
    s3 AS (
      SELECT e.user_id, min(e.ts) AS t3, min(s2.t1) AS t1
      FROM events e JOIN s2 ON e.user_id = s2.user_id
        AND e.ts > s2.t2 AND e.ts <= s2.t2 + INTERVAL 48 HOUR
      WHERE e.event_type = 'purchase' GROUP BY e.user_id)
    SELECT * FROM (
      SELECT 'step1_view' AS step, count(*) AS n_users,
             CAST(0 AS BIGINT) AS total_lag_us FROM s1
      UNION ALL
      SELECT 'step2_click', count(*),
             CAST(sum(epoch_us(t2) - epoch_us(t1)) AS BIGINT) FROM s2
      UNION ALL
      SELECT 'step3_purchase', count(*),
             CAST(sum(epoch_us(t3) - epoch_us(t1)) AS BIGINT) FROM s3
    ) ORDER BY step
    """,
    section="B9-streaming",
)
def q234(spark, sf_dir):
    """Streaming windowed funnel (the real-time twin of q219): each
    user's funnel progress lives in GroupState as three timestamps —
    first view, first in-deadline click after it, first in-deadline
    purchase after that. The state machine advances monotonically
    (each slot is written once), so in update mode the latest emission
    per user IS the funnel position, and the availableNow final state
    aggregates to exactly the batch funnel — the oracle is q219's SQL
    verbatim, which is the strongest batch-equivalence check the
    driver can run on a stateful stream.

    State per user is THREE int64 microsecond instants — O(1)
    regardless of event volume, the property that lets this run
    forever on an unbounded stream (no per-user event buffer; compare
    q179's watermark-evicted dedup state). Within a micro-batch rows
    sort by (ts, event_id) before the fold; cross-batch order relies
    on source order, the standard in-order-ingest caveat every
    event-time state machine documents (a production deployment pairs
    it with a watermark reordering buffer). Lag math is pure integer
    microseconds on UTC-pinned instants — session-timezone-safe."""
    snap = run_to_memory(_funnel_stateful_stream(spark, sf_dir), mode="update", tag="q234")
    # Update mode may emit one row per user per micro-batch; slots are
    # write-once so max() recovers the final state under any batching.
    final = snap.groupBy("user_id").agg(
        F.max("t1").alias("t1"), F.max("t2").alias("t2"), F.max("t3").alias("t3")
    )

    def step(flag_col, label, end_col):
        lag = (
            F.lit(0).cast("long")
            if end_col is None
            else F.sum(
                F.when(F.col(flag_col) >= 0, F.col(end_col) - F.col("t1"))
            ).cast("long")
        )
        return final.filter(F.col(flag_col) >= 0).agg(
            F.lit(label).alias("step"),
            F.count("*").alias("n_users"),
            lag.alias("total_lag_us"),
        )

    return (
        step("t1", "step1_view", None)
        .unionAll(step("t2", "step2_click", "t2"))
        .unionAll(step("t3", "step3_purchase", "t3"))
        # bounded result (one row per funnel step)
        .transform(ordered_small, "step")
    )


# q219's batch windowed-funnel SQL, shared verbatim by the streaming
# twins (q234 in-order, q235 reordering-buffer): the stream's final
# state must equal the batch computation (kappa pairing).
_FUNNEL_ORACLE = """
    WITH s1 AS (
      SELECT user_id, min(ts) AS t1 FROM events
      WHERE event_type = 'view' GROUP BY user_id),
    s2 AS (
      SELECT e.user_id, min(e.ts) AS t2, min(s1.t1) AS t1
      FROM events e JOIN s1 ON e.user_id = s1.user_id
        AND e.ts > s1.t1 AND e.ts <= s1.t1 + INTERVAL 48 HOUR
      WHERE e.event_type = 'click' GROUP BY e.user_id),
    s3 AS (
      SELECT e.user_id, min(e.ts) AS t3, min(s2.t1) AS t1
      FROM events e JOIN s2 ON e.user_id = s2.user_id
        AND e.ts > s2.t2 AND e.ts <= s2.t2 + INTERVAL 48 HOUR
      WHERE e.event_type = 'purchase' GROUP BY e.user_id)
    SELECT * FROM (
      SELECT 'step1_view' AS step, count(*) AS n_users,
             CAST(0 AS BIGINT) AS total_lag_us FROM s1
      UNION ALL
      SELECT 'step2_click', count(*),
             CAST(sum(epoch_us(t2) - epoch_us(t1)) AS BIGINT) FROM s2
      UNION ALL
      SELECT 'step3_purchase', count(*),
             CAST(sum(epoch_us(t3) - epoch_us(t1)) AS BIGINT) FROM s3
    ) ORDER BY step
    """


def _funnel_rollup(final):
    """Shared step-rollup for the funnel twins: per-user (t1,t2,t3)
    microsecond slots -> the 3-row step/n_users/total_lag_us table."""

    def step(flag_col, label, end_col):
        lag = (
            F.lit(0).cast("long")
            if end_col is None
            else F.sum(
                F.when(F.col(flag_col) >= 0, F.col(end_col) - F.col("t1"))
            ).cast("long")
        )
        return final.filter(F.col(flag_col) >= 0).agg(
            F.lit(label).alias("step"),
            F.count("*").alias("n_users"),
            lag.alias("total_lag_us"),
        )

    return (
        step("t1", "step1_view", None)
        .unionAll(step("t2", "step2_click", "t2"))
        .unionAll(step("t3", "step3_purchase", "t3"))
        # bounded result (one row per funnel step)
        .transform(ordered_small, "step")
    )


@query("q235_streaming_funnel_reordered", oracle=_FUNNEL_ORACLE, section="B9-streaming")
def q235(spark, sf_dir):
    """Out-of-order-hardened streaming funnel (round-5 verdict item 5:
    q234 documents an in-order-ingest caveat; this entry REMOVES it).

    The feed is deliberately hostile: events split into three landing
    files by hash(event_id) % 3 — each micro-batch spans the WHOLE time
    range, so cross-batch arrival order is maximally shuffled — plus a
    far-future watermark sentinel and a final empty tick. The state
    machine cannot fold on arrival; instead each user's GroupState
    carries a REORDERING BUFFER (event-time/event-id arrays) alongside
    the three funnel slots. Events are appended on arrival and folded —
    sorted by (ts, event_id) — only when an event-time timeout fires
    with the watermark past them; the allowed lateness (watermark
    delay ≥ the corpus span, here) guarantees no event is ever released
    before every earlier event has arrived, so ANY arrival order yields
    the batch answer: the oracle is q219's funnel SQL verbatim.

    Scale shape: buffered state is bounded by events inside the
    allowed-lateness horizon (rate × lateness), NOT stream lifetime —
    the watermark releases and prunes the buffer as it advances. That
    is the standard cost of out-of-order tolerance; q234 remains the
    O(1)-state variant for in-order sources, and the lateness knob
    trades memory for disorder tolerance. All shuffles are on user_id;
    the fold is Arrow-batched per group.

    Reference parity: the reference's river buffers and re-sequences
    socket frames before its flush loop (river/jsonr.go) — this is the
    event-time analog with exactly-once state."""
    import os
    import shutil

    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    from s4_spark.streaming.rigs import scratch

    DEADLINE_US = 48 * 3600 * 1_000_000

    ev = t(spark, sf_dir, "events").select("user_id", "event_type", "ts", "event_id")
    if ev.schema["ts"].dataType.typeName() == "timestamp_ntz":
        ev = ev.withColumn("ts", ntz_as_utc_instant("ts"))
    bounds = ev.agg(F.min("ts").alias("lo"), F.max("ts").alias("hi")).collect()[0]
    span_hours = int((bounds["hi"] - bounds["lo"]).total_seconds() // 3600) + 2
    hi = F.lit(bounds["hi"]).cast("timestamp")

    landing = scratch("q235_landing")
    os.makedirs(landing, exist_ok=True)

    def drop(df, fname, mtime):
        stage = scratch("q235_stage")
        df.coalesce(1).write.mode("overwrite").parquet(stage)
        part = next(
            p for p in os.listdir(stage)
            if p.startswith("part-") and p.endswith(".parquet")
        )
        dest = os.path.join(landing, fname)
        shutil.copyfile(os.path.join(stage, part), dest)
        os.utime(dest, (mtime, mtime))

    # three hash-split (time-interleaved) batches, then the watermark
    # sentinel, then an empty tick so the release timeout fires in a
    # deterministic final micro-batch; strictly increasing mtimes pin
    # FileStreamSource's processing order
    for i in range(3):
        drop(ev.filter(F.abs(F.xxhash64("event_id")) % 3 == i), f"{i:03d}.parquet", 1_000_000 + i)
    sentinel = spark.range(1).select(
        F.lit(-1).cast("long").alias("user_id"),
        F.lit("sentinel").alias("event_type"),
        F.timestamp_add("HOUR", F.lit(span_hours + 1), hi).alias("ts"),
        F.lit(-1).cast("long").alias("event_id"),
    )
    drop(sentinel, "003.parquet", 1_000_003)
    drop(ev.limit(0), "004.parquet", 1_000_004)

    stream = (
        spark.readStream.schema(
            "user_id long, event_type string, ts timestamp, event_id long"
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(landing)
        .withWatermark("ts", f"{span_hours} hours")
        # event time crosses into Python as int64 epoch micros — Arrow
        # renders TIMESTAMP session-tz-naive in the state worker, which
        # would shift the buffer-vs-watermark comparison on non-UTC
        # sessions (round-6 vanilla-session finding)
        .withColumn("ts_us", F.unix_micros("ts"))
    )

    def funnel(key, pdfs, state: GroupState):
        if state.exists:
            t1, t2, t3, buf_ts, buf_id, buf_et = state.get
            buf_ts, buf_id, buf_et = list(buf_ts), list(buf_id), list(buf_et)
        else:
            t1, t2, t3, buf_ts, buf_id, buf_et = -1, -1, -1, [], [], []
        for pdf in pdfs:
            if not len(pdf):
                continue
            buf_ts.extend(int(v) for v in pdf["ts_us"].values)
            buf_id.extend(int(v) for v in pdf["event_id"].values)
            buf_et.extend(pdf["event_type"].values.tolist())
        wm_us = state.getCurrentWatermarkMs() * 1000
        if wm_us > 0:
            ready = sorted(
                (pair for pair in zip(buf_ts, buf_id, buf_et) if pair[0] <= wm_us),
            )
            kept = [pair for pair in zip(buf_ts, buf_id, buf_et) if pair[0] > wm_us]
            for t_us, _eid, et in ready:
                if t1 < 0:
                    if et == "view":
                        t1 = t_us
                elif t2 < 0:
                    if et == "click" and t1 < t_us <= t1 + DEADLINE_US:
                        t2 = t_us
                elif t3 < 0:
                    if et == "purchase" and t2 < t_us <= t2 + DEADLINE_US:
                        t3 = t_us
            buf_ts = [p[0] for p in kept]
            buf_id = [p[1] for p in kept]
            buf_et = [p[2] for p in kept]
        state.update((t1, t2, t3, buf_ts, buf_id, buf_et))
        if buf_ts:
            # release the remainder once the watermark passes it
            state.setTimeoutTimestamp(state.getCurrentWatermarkMs() + 1)
        yield pd.DataFrame({"user_id": [key[0]], "t1": [t1], "t2": [t2], "t3": [t3]})

    out = stream.groupBy("user_id").applyInPandasWithState(
        funnel,
        outputStructType="user_id long, t1 long, t2 long, t3 long",
        stateStructType=(
            "t1 long, t2 long, t3 long, buf_ts array<long>, "
            "buf_id array<long>, buf_et array<string>"
        ),
        outputMode="update",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
    snap = run_to_memory(out, mode="update", tag="q235")
    final = (
        snap.filter(F.col("user_id") >= 0)
        .groupBy("user_id")
        .agg(
            F.max("t1").alias("t1"),
            F.max("t2").alias("t2"),
            F.max("t3").alias("t3"),
        )
    )
    return _funnel_rollup(final)


@query(
    "q238_funnel_state_introspection",
    # Per-user funnel state (not the step rollup): the strongest form of
    # the q219/q234 kappa pairing — the oracle rebuilds each user's
    # three state slots from batch SQL, and the Spark side reads them
    # BACK OUT of the RocksDB state store after the stream commits.
    oracle="""
    WITH s1 AS (
      SELECT user_id, min(ts) AS t1 FROM events
      WHERE event_type = 'view' GROUP BY user_id),
    s2 AS (
      SELECT e.user_id, min(e.ts) AS t2
      FROM events e JOIN s1 ON e.user_id = s1.user_id
        AND e.ts > s1.t1 AND e.ts <= s1.t1 + INTERVAL 48 HOUR
      WHERE e.event_type = 'click' GROUP BY e.user_id),
    s3 AS (
      SELECT e.user_id, min(e.ts) AS t3
      FROM events e JOIN s2 ON e.user_id = s2.user_id
        AND e.ts > s2.t2 AND e.ts <= s2.t2 + INTERVAL 48 HOUR
      WHERE e.event_type = 'purchase' GROUP BY e.user_id),
    u AS (SELECT DISTINCT user_id FROM events)
    SELECT u.user_id,
           coalesce(epoch_us(s1.t1), -1) AS t1_us,
           coalesce(epoch_us(s2.t2), -1) AS t2_us,
           coalesce(epoch_us(s3.t3), -1) AS t3_us
    FROM u
    LEFT JOIN s1 USING (user_id)
    LEFT JOIN s2 USING (user_id)
    LEFT JOIN s3 USING (user_id)
    ORDER BY u.user_id
    """,
    section="B9-streaming",
)
def q238(spark, sf_dir):
    """Funnel state introspection (round-5 verdict item 8): run q234's
    stateful funnel to its checkpoint, then read the per-user GroupState
    back out of the state store with Spark 4's `statestore` reader and
    hash-match it against the batch funnel's PER-USER timestamps — not
    the 3-row step rollup q234 checks, but every user's individual
    (t1, t2, t3) slots. This pairs q171's introspection surface (which
    reads a built-in streaming agg's buffers) with custom
    applyInPandasWithState state: the layout is
    key.user_id / value.groupState.{t1,t2,t3}, pinned here.

    Operationally this is the audit a production deployment runs when a
    funnel number looks wrong: inspect live state directly instead of
    trusting emissions. At 100 TB state scale the reader lists one
    store's files per partition — no shuffle, no driver collect; the
    comparison join is per-user, keyed like every other shuffle in the
    funnel family."""
    name = f"s4_mem_q238_{os.getpid()}"
    ckpt = scratch(f"ckpt_{name}")
    q = (
        _funnel_stateful_stream(spark, sf_dir)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("update")
        .trigger(availableNow=True)
        .option("checkpointLocation", ckpt)
        .start()
    )
    q.awaitTermination()
    st = spark.read.format("statestore").load(ckpt)
    return st.select(
        F.col("key.user_id").alias("user_id"),
        F.col("value.groupState.t1").alias("t1_us"),
        F.col("value.groupState.t2").alias("t2_us"),
        F.col("value.groupState.t3").alias("t3_us"),
    ).orderBy("user_id")


def _q240(spark, sf_dir):
    """Per-user top-3 values maintained in transformWithState LIST state
    — the multi-row state handle q174's ValueState doesn't touch. Each
    micro-batch merges arriving (value, event_id) pairs into the stored
    list, trims to the 3 largest (value desc, event_id asc tie-break),
    and emits the current podium; every top-k slot is monotone
    non-decreasing as the set grows, so max() per user recovers the
    final state under any batching (same argument as q234).

    Protocol-wise this exercises the ListState client — ListStatePut /
    ListStateGet with Arrow-encoded rows over the state server socket —
    which on protobuf-less containers runs entirely through the
    vendored runtime (s4_spark/_vendor), making this entry its hardest
    in-repo integration test. O(k) state per user; shuffles only on
    user_id."""
    from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle

    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    _ship_vendored_protobuf(spark)
    ev = events_stream(spark, sf_dir).select("user_id", "value", "event_id")

    class TopK(StatefulProcessor):
        K = 3

        def init(self, handle: StatefulProcessorHandle) -> None:
            self._top = handle.getListState("top", "value double, event_id long")

        def handleInputRows(self, key, rows, timer_values):
            pairs = list(self._top.get()) if self._top.exists() else []
            for pdf in rows:
                pairs.extend(
                    zip(
                        (float(v) for v in pdf["value"].values),
                        (int(i) for i in pdf["event_id"].values),
                    )
                )
            pairs.sort(key=lambda p: (-p[0], p[1]))
            pairs = pairs[: self.K]
            self._top.put(pairs)
            vals = [p[0] for p in pairs] + [None] * (self.K - len(pairs))
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "top1": [vals[0]],
                    "top2": [vals[1]],
                    "top3": [vals[2]],
                }
            )

        def close(self) -> None:
            pass

    out = ev.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=TopK(),
        outputStructType="user_id long, top1 double, top2 double, top3 double",
        outputMode="Update",
        timeMode="None",
    )
    snap = run_to_memory(out, mode="update", tag="q240")
    return (
        snap.groupBy("user_id")
        .agg(
            F.max("top1").alias("top1"),
            F.max("top2").alias("top2"),
            F.max("top3").alias("top3"),
        )
        .orderBy("user_id")
    )


if transform_with_state_available():  # pragma: no cover - env-dependent
    query(
        "q240_transform_with_list_state",
        oracle="""
    WITH ranked AS (
      SELECT user_id, value,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY value DESC, event_id) AS rn
      FROM events)
    SELECT user_id,
           max(CASE WHEN rn = 1 THEN value END) AS top1,
           max(CASE WHEN rn = 2 THEN value END) AS top2,
           max(CASE WHEN rn = 3 THEN value END) AS top3
    FROM ranked WHERE rn <= 3
    GROUP BY user_id ORDER BY user_id
    """,
        section="B9-streaming",
    )(_q240)


def _q241(spark, sf_dir):
    """Sessionization on transformWithState MAP state + EVENT-TIME
    TIMERS — the remaining cells of the state-handle matrix after
    q174 (ValueState) and q240 (ListState). Per user, the OPEN
    session's per-event-type counts live in MapState (updateValue /
    iterator / clear — each a state-server round trip through the
    protobuf protocol) beside a ValueState (start, last, n). Sessions
    close two ways: a >30-min event-time gap inside the fold emits
    immediately, and the LAST session of every user closes when its
    event-time timer (last event + 30 min) fires — registered with
    registerTimer after clearing stale timers via listTimers /
    deleteTimer, and delivered to handleExpiredTimer in the batch
    after the watermark sentinel. Each closed session is emitted
    exactly once with its start, size, distinct types, and dominant
    type (count desc, name asc — deterministic).

    The oracle is the gaps-and-islands sessionization SQL (q093's
    shape) extended with per-session top-type, so the timer-driven
    close must agree row-for-row with the pure-batch computation.
    State per user is O(open-session types); timers are O(1) per user.
    """
    from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle

    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    _ship_vendored_protobuf(spark)

    GAP_US = 30 * 60 * 1_000_000
    GAP_MS = 30 * 60 * 1000

    ev = t(spark, sf_dir, "events").select("user_id", "event_type", "ts", "event_id")
    if ev.schema["ts"].dataType.typeName() == "timestamp_ntz":
        ev = ev.withColumn("ts", ntz_as_utc_instant("ts"))
    hi = ev.agg(F.max("ts")).collect()[0][0]

    import shutil

    landing = scratch("q241_landing")
    os.makedirs(landing, exist_ok=True)

    def drop(df, fname, mtime):
        stage = scratch("q241_stage")
        df.coalesce(1).write.mode("overwrite").parquet(stage)
        part = next(
            p for p in os.listdir(stage)
            if p.startswith("part-") and p.endswith(".parquet")
        )
        dest = os.path.join(landing, fname)
        shutil.copyfile(os.path.join(stage, part), dest)
        os.utime(dest, (mtime, mtime))

    drop(ev, "000.parquet", 1_000_000)
    sentinel = spark.range(1).select(
        F.lit(-1).cast("long").alias("user_id"),
        F.lit("sentinel").alias("event_type"),
        F.timestamp_add("HOUR", F.lit(40), F.lit(hi).cast("timestamp")).alias("ts"),
        F.lit(-1).cast("long").alias("event_id"),
    )
    drop(sentinel, "001.parquet", 1_000_001)
    drop(ev.limit(0), "002.parquet", 1_000_002)

    stream = (
        spark.readStream.schema(
            "user_id long, event_type string, ts timestamp, event_id long"
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(landing)
        .withWatermark("ts", "0 seconds")
        # int64 epoch micros for the worker — Arrow's session-tz-naive
        # timestamp rendering would shift timer registration on non-UTC
        # sessions (round-6 vanilla-session finding)
        .withColumn("ts_us", F.unix_micros("ts"))
    )

    def emit_row(key, start, n, counts):
        top = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[0][0]
        return pd.DataFrame(
            {
                "user_id": [key],
                "session_start_us": [start],
                "n_events": [n],
                "n_types": [len(counts)],
                "top_type": [top],
            }
        )

    class Sessionizer(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._handle = handle
            self._sess = handle.getValueState("sess", "start long, last long, n long")
            self._counts = handle.getMapState("counts", "event_type string", "n long")

        def handleInputRows(self, key, rows, timer_values):
            if self._sess.exists():
                start, last, n = self._sess.get()
                counts = {k[0]: v[0] for k, v in self._counts.iterator()}
            else:
                start, last, n, counts = -1, -1, 0, {}
            batch = [pdf for pdf in rows if len(pdf)]
            if batch:
                pdf = pd.concat(batch).sort_values(["ts_us", "event_id"])
                for et, t_us in zip(pdf["event_type"].values, pdf["ts_us"].values):
                    t_us = int(t_us)
                    if start >= 0 and t_us - last > GAP_US:
                        yield emit_row(key[0], start, n, counts)
                        start, last, n, counts = -1, -1, 0, {}
                    if start < 0:
                        start = t_us
                    last = t_us
                    n += 1
                    counts[et] = counts.get(et, 0) + 1
            self._sess.update((start, last, n))
            self._counts.clear()
            for et, c in counts.items():
                self._counts.updateValue((et,), (c,))
            for expiry in list(self._handle.listTimers()):
                self._handle.deleteTimer(expiry)
            if start >= 0:
                self._handle.registerTimer(last // 1000 + GAP_MS)

        def handleExpiredTimer(self, key, timerValues, expiredTimerInfo):
            if self._sess.exists():
                start, last, n = self._sess.get()
                if start >= 0:
                    counts = {k[0]: v[0] for k, v in self._counts.iterator()}
                    yield emit_row(key[0], start, n, counts)
                self._sess.clear()
                self._counts.clear()

        def close(self) -> None:
            pass

    out = stream.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=Sessionizer(),
        outputStructType=(
            "user_id long, session_start_us long, n_events long, "
            "n_types long, top_type string"
        ),
        outputMode="Update",
        timeMode="EventTime",
    )
    # parquet-backed rig sink (round-10 ×1000 probe): q241's emission
    # set is session-proportional — the memory sink's driver collect
    # hit maxResultSize at 100M events (~30M sessions) while the
    # operator itself was healthy; run_to_parquet keeps emissions
    # executor-side, same update-mode row set
    snap = run_to_parquet(out, mode="update", tag="q241")
    return snap.filter(F.col("user_id") >= 0).orderBy("user_id", "session_start_us")


if transform_with_state_available():  # pragma: no cover - env-dependent
    query(
        "q241_transform_with_map_state_timers",
        oracle="""
    WITH g AS (
      SELECT user_id, ts, event_id, event_type,
             CASE WHEN lag(ts) OVER w IS NULL
                    OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
             THEN 1 ELSE 0 END AS ns
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
    s AS (
      SELECT user_id, ts, event_type,
             sum(ns) OVER (PARTITION BY user_id ORDER BY ts, event_id
                           ROWS UNBOUNDED PRECEDING) AS sid
      FROM g),
    agg AS (
      SELECT user_id, sid, epoch_us(min(ts)) AS session_start_us,
             count(*) AS n_events,
             count(DISTINCT event_type) AS n_types
      FROM s GROUP BY user_id, sid),
    top AS (
      SELECT user_id, sid, event_type AS top_type,
             row_number() OVER (PARTITION BY user_id, sid
                                ORDER BY count(*) DESC, event_type) AS rn
      FROM s GROUP BY user_id, sid, event_type
      QUALIFY rn = 1)
    SELECT a.user_id, a.session_start_us, a.n_events, a.n_types, t.top_type
    FROM agg a JOIN top t USING (user_id, sid)
    ORDER BY a.user_id, a.session_start_us
    """,
        section="B9-streaming",
    )(_q241)


def _q247(spark, sf_dir):
    """Warm-start state migration (kappa backfill→live handoff): the
    funnel's per-user state is BATCH-COMPUTED over the first half of
    the event log (three chained min-aggregations — the q219 shape),
    handed to ``transformWithStateInPandas(initialState=...)``, and
    the stream replays ONLY the second half. ``handleInitialState``
    seeds each user's ValueState before any input row; the final
    per-user slots are then read back out of the state store
    (``stateVarName`` readback, q238's technique — required here
    because warm users with no second-half events never emit) and must
    roll up to the batch funnel over the WHOLE log: the oracle is
    q219's SQL verbatim.

    This is the migration path a production deployment actually runs —
    bootstrap stateful streaming from a backfill instead of replaying
    history through the stream — and it certifies the fold identity
    fold(second | fold(first)) == fold(all). Event time crosses as
    int64 micros end-to-end (no timestamp ever enters the worker).
    Initial-state build is three user_id-keyed aggregations; the
    stream shuffles once on user_id; state stays 3 int64s per user."""
    from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle

    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    _ship_vendored_protobuf(spark)

    DEADLINE_US = 48 * 3600 * 1_000_000

    ev = t(spark, sf_dir, "events").select("user_id", "event_type", "ts", "event_id")
    if ev.schema["ts"].dataType.typeName() == "timestamp_ntz":
        ev = ev.withColumn("ts", ntz_as_utc_instant("ts"))
    ev = ev.select(
        "user_id", "event_type", F.unix_micros("ts").alias("ts_us"), "event_id"
    )
    lo, hi = ev.agg(F.min("ts_us"), F.max("ts_us")).collect()[0]
    mid = (int(lo) + int(hi)) // 2

    first = ev.filter(F.col("ts_us") < mid)
    w1 = (
        first.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts_us").alias("t1"))
    )
    w2 = (
        first.filter(F.col("event_type") == "click")
        .join(w1, "user_id")
        .filter(
            (F.col("ts_us") > F.col("t1"))
            & (F.col("ts_us") <= F.col("t1") + F.lit(DEADLINE_US))
        )
        .groupBy("user_id")
        .agg(F.min("ts_us").alias("t2"))
    )
    w3 = (
        first.filter(F.col("event_type") == "purchase")
        .join(w2, "user_id")
        .filter(
            (F.col("ts_us") > F.col("t2"))
            & (F.col("ts_us") <= F.col("t2") + F.lit(DEADLINE_US))
        )
        .groupBy("user_id")
        .agg(F.min("ts_us").alias("t3"))
    )
    warm = (
        w1.join(w2, "user_id", "left")
        .join(w3, "user_id", "left")
        .select(
            "user_id",
            F.col("t1"),
            F.coalesce("t2", F.lit(-1)).alias("t2"),
            F.coalesce("t3", F.lit(-1)).alias("t3"),
        )
    )

    import shutil

    landing = scratch("q247_landing")
    os.makedirs(landing, exist_ok=True)
    stage = scratch("q247_stage")
    ev.filter(F.col("ts_us") >= mid).coalesce(1).write.mode("overwrite").parquet(stage)
    part = next(
        p for p in os.listdir(stage)
        if p.startswith("part-") and p.endswith(".parquet")
    )
    shutil.copyfile(os.path.join(stage, part), os.path.join(landing, "p1.parquet"))

    stream = spark.readStream.schema(
        "user_id long, event_type string, ts_us long, event_id long"
    ).parquet(landing)

    class WarmFunnel(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._state = handle.getValueState("agg", "t1 long, t2 long, t3 long")

        def handleInitialState(self, key, initialState, timerValues) -> None:
            self._state.update(
                (
                    int(initialState["t1"].iloc[0]),
                    int(initialState["t2"].iloc[0]),
                    int(initialState["t3"].iloc[0]),
                )
            )

        def handleInputRows(self, key, rows, timerValues):
            t1, t2, t3 = self._state.get() if self._state.exists() else (-1, -1, -1)
            batch = [pdf for pdf in rows if len(pdf)]
            if batch:
                pdf = pd.concat(batch).sort_values(["ts_us", "event_id"])
                for et, t_us in zip(pdf["event_type"].values, pdf["ts_us"].values):
                    t_us = int(t_us)
                    if t1 < 0:
                        if et == "view":
                            t1 = t_us
                    elif t2 < 0:
                        if et == "click" and t1 < t_us <= t1 + DEADLINE_US:
                            t2 = t_us
                    elif t3 < 0:
                        if et == "purchase" and t2 < t_us <= t2 + DEADLINE_US:
                            t3 = t_us
            self._state.update((t1, t2, t3))
            yield from ()

        def close(self) -> None:
            pass

    out = stream.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=WarmFunnel(),
        outputStructType="user_id long",
        outputMode="Update",
        timeMode="None",
        initialState=warm.groupBy("user_id"),
    )
    name = f"s4_mem_q247_{os.getpid()}"
    ckpt = scratch(f"ckpt_{name}")
    q = (
        out.writeStream.format("memory")
        .queryName(name)
        .outputMode("update")
        .trigger(availableNow=True)
        .option("checkpointLocation", ckpt)
        .start()
    )
    q.awaitTermination()
    st = spark.read.format("statestore").option("stateVarName", "agg").load(ckpt)
    final = st.select(
        F.col("key.user_id").alias("user_id"),
        F.col("value.t1").alias("t1"),
        F.col("value.t2").alias("t2"),
        F.col("value.t3").alias("t3"),
    )
    return _funnel_rollup(final)


if transform_with_state_available():  # pragma: no cover - env-dependent
    query(
        "q247_transform_with_initial_state",
        oracle=_FUNNEL_ORACLE,
        section="B9-streaming",
    )(_q247)


@query(
    "q248_streaming_progress_metrics",
    oracle="""
    SELECT count(*) AS listener_input_rows,
           count(DISTINCT event_type) AS state_rows
    FROM events
    """,
    section="B9-streaming",
)
def q248(spark, sf_dir):
    """Streaming OBSERVABILITY contract: the query-progress API
    (StreamingQuery.recentProgress — what a production monitor scrapes)
    must account for every ingested row and every state-store row.
    Run the availableNow event_type aggregation to completion, then sum
    numInputRows across all progress events and read the stateOperators'
    numRowsTotal from the final progress: the SOURCE-side count equals
    the table cardinality exactly (no row enters unobserved) and the
    state row count equals the distinct group count. Extends q163
    (batch observed metrics) and q171 (state introspection) to the
    live metrics surface — the reference's counterpart is its flush
    logging (river.go's per-batch record counts), which operators
    alert on; here the numbers are oracle-checked, not just emitted.

    Driver-side cost is O(progress events); nothing is collected from
    executors beyond the metrics Spark already aggregates."""
    ev = events_stream(spark, sf_dir)
    agg = ev.groupBy("event_type").agg(F.count("*").alias("n"))
    name = f"s4_mem_q248_{os.getpid()}"
    q = (
        agg.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .option("checkpointLocation", scratch(f"ckpt_{name}"))
        .start()
    )
    q.awaitTermination()
    progresses = [p for p in q.recentProgress if p is not None]
    input_rows = sum(int(p["numInputRows"]) for p in progresses)
    state_rows = 0
    for p in reversed(progresses):
        ops = p.get("stateOperators") or []
        if ops:
            state_rows = int(ops[0]["numRowsTotal"])
            break
    return spark.createDataFrame(
        [(input_rows, state_rows)], "listener_input_rows long, state_rows long"
    )


@query(
    "q251_rocksdb_changelog_restart",
    # Full-table per-user totals — but the stream reaches them across a
    # QUERY RESTART (run 2 starts from the checkpoint and processes only
    # the phase-2 file), so the hash matches ONLY if run 2 restored
    # run 1's aggregation state from the RocksDB changelog. A lost
    # state store would report phase-2-only counts.
    oracle="""
    SELECT user_id, count(*) AS n_events, {vsum} AS value_sum
    FROM events GROUP BY user_id ORDER BY user_id
    """.format(vsum=sql_dsum("value")),
    section="B9-streaming",
)
def q251(spark, sf_dir):
    """Streaming state on the RocksDB state store with CHANGELOG
    checkpointing and a restart in the middle: per-user running totals
    are built in run 1 (phase-1 events only), the query stops, and a
    NEW query over the same checkpoint ingests phase 2 — correct final
    totals require the restarted store to rebuild run-1 state by
    replaying the changelog against the last snapshot.

    This is the 100 TB streaming-state design, stated concretely: with
    millions of keys, uploading a full state snapshot per micro-batch
    (the default HDFS-backed store's behavior) makes checkpoint cost
    O(total state); changelog checkpointing uploads only each batch's
    DELTA (O(updates)) and snapshots in the background, which is what
    keeps commit latency flat as state grows. The entry turns the conf
    on explicitly, drives the restart, and the paired pytest rig
    asserts .changelog files actually landed in the checkpoint's state
    directory (the conf not merely set but exercised). Counts and the
    exact-decimal value sums shuffle once on user_id; the memory sink
    reads the complete-mode state table after the second run."""
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    # Restored in the finally: this conf leaked at session scope and an
    # r13 x1000 probe measured the blast radius — a q258 run AFTER q251
    # in one session took 188 s vs 23 s solo (changelog mode defers
    # snapshot work to the shared background maintenance thread, and
    # q251's 1.5M-row complete-mode stores keep it busy long after this
    # entry returns). providerClass above is left set deliberately: it
    # matches get_spark()'s default and exists for vanilla sessions.
    _CHANGELOG_CONF = (
        "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled"
    )
    saved = spark.conf.get(_CHANGELOG_CONF, None)
    spark.conf.set(_CHANGELOG_CONF, "true")
    try:
        ev = t(spark, sf_dir, "events").select("event_id", "user_id", "value")
        landing = scratch(f"q251_landing_{os.path.basename(sf_dir)}")
        ckpt = scratch(f"q251_ckpt_{os.path.basename(sf_dir)}")
        os.makedirs(landing, exist_ok=True)

        def drop_phase(pred, fname):
            stage = scratch(f"q251_stage_{fname}")
            ev.filter(pred).coalesce(1).write.mode("overwrite").parquet(stage)
            part = next(
                p for p in os.listdir(stage)
                if p.startswith("part-") and p.endswith(".parquet")
            )
            os.replace(os.path.join(stage, part), os.path.join(landing, fname))

        def run(name):
            agg = (
                spark.readStream.schema(ev.schema)
                .parquet(landing)
                .groupBy("user_id")
                .agg(
                    F.count("*").alias("n_events"),
                    dsum("value").alias("value_sum"),
                )
            )
            q = (
                agg.writeStream.format("memory")
                .queryName(name)
                .outputMode("complete")
                .trigger(availableNow=True)
                .option("checkpointLocation", ckpt)
                .start()
            )
            q.awaitTermination()

        drop_phase(F.col("event_id") % 2 == 0, "phase1.parquet")
        run(f"s4_mem_q251a_{os.getpid()}")
        drop_phase(F.col("event_id") % 2 != 0, "phase2.parquet")
        final = f"s4_mem_q251b_{os.getpid()}"
        run(final)
        return spark.table(final).orderBy("user_id")
    finally:
        if saved is None:
            spark.conf.unset(_CHANGELOG_CONF)
        else:
            spark.conf.set(_CHANGELOG_CONF, saved)


def q251_checkpoint_dir(sf_dir: str) -> str:
    """The checkpoint q251 writes (for the changelog-evidence test)."""
    from s4_spark.streaming.rigs import scratch as stream_scratch  # noqa: F401
    from s4_spark.scratch import scratch_root

    return os.path.join(
        scratch_root(), "stream", f"q251_ckpt_{os.path.basename(sf_dir)}"
    )


def _q252(spark, sf_dir):
    """State TTL on transformWithState: the per-user counter's
    ValueState is declared with ttlDurationMs=1000, run 1 counts the
    phase-1 events, the rig then WAITS past the TTL and feeds phase 2
    through the same checkpoint — the restored store must treat the
    expired value as absent, so phase-2 counts restart from zero.
    q251 proves state SURVIVES a restart (totals accumulate across
    runs); this entry proves the complementary lifecycle bound:
    with a TTL, state is dropped without any user code deleting it.

    TTL is the knob that keeps 100 TB streaming state finite when keys
    are unbounded (user/session/device IDs churn forever): eviction
    happens inside the store (RocksDB compaction-time filtering +
    read-time guard), costs no shuffle, and needs no bookkeeping
    column. Event-time alternatives (watermark eviction, q179;
    explicit timers, q241) cover replay determinism; processing-time
    TTL covers operational caps — the three eviction mechanisms are
    now all pinned. Output: per-user counts labeled by run phase;
    phase 2 matching the phase-2-only aggregate IS the eviction
    proof (un-evicted state would carry phase-1 counts over)."""
    from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle

    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    _ship_vendored_protobuf(spark)
    ev = t(spark, sf_dir, "events").select("event_id", "user_id")
    landing = scratch(f"q252_landing_{os.path.basename(sf_dir)}")
    ckpt = scratch(f"q252_ckpt_{os.path.basename(sf_dir)}")
    os.makedirs(landing, exist_ok=True)

    class TtlCounter(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._cnt = handle.getValueState("cnt", "n long", ttlDurationMs=1000)

        def handleInputRows(self, key, rows, timer_values):
            n = self._cnt.get()[0] if self._cnt.exists() else 0
            for pdf in rows:
                n += len(pdf)
            self._cnt.update((n,))
            yield pd.DataFrame({"user_id": [key[0]], "n": [n]})

        def close(self) -> None:
            pass

    def drop_phase(pred, fname):
        stage = scratch(f"q252_stage_{fname}")
        ev.filter(pred).coalesce(1).write.mode("overwrite").parquet(stage)
        part = next(
            p for p in os.listdir(stage)
            if p.startswith("part-") and p.endswith(".parquet")
        )
        os.replace(os.path.join(stage, part), os.path.join(landing, fname))

    def run(name, outdir):
        out = (
            spark.readStream.schema(ev.schema)
            .parquet(landing)
            .groupBy("user_id")
            .transformWithStateInPandas(
                statefulProcessor=TtlCounter(),
                outputStructType="user_id long, n long",
                outputMode="Update",
                timeMode="ProcessingTime",
            )
        )

        from s4_spark.streaming.rigs import (
            idempotent_batch_sink,
            read_batched_parquet,
        )

        sink = idempotent_batch_sink(outdir)

        # Two quirks force this runner's shape. (1) ProcessingTime mode
        # keeps scheduling zero-row "cleaning up state" batches for TTL
        # maintenance, so an availableNow query NEVER self-terminates
        # (observed: 100+ cleanup batches per minute) — drain
        # explicitly: wait until the new file's data batch committed
        # (a later progress reports 0 input rows), then stop. (2) That
        # stop can land mid-cleanup-batch, leaving an offsets entry
        # whose commit is missing; the memory sink REFUSES to recover
        # such a checkpoint, so each run's rows land in a per-phase
        # parquet dir via foreachBatch (restart-safe) instead.
        os.makedirs(outdir, exist_ok=True)
        q = (
            out.writeStream.foreachBatch(sink)
            .queryName(name)
            .outputMode("update")
            .trigger(availableNow=True)
            .option("checkpointLocation", ckpt)
            .start()
        )
        # Drain on BATCH-COMPLETION signals, with no bound on the data
        # batch itself (round-10 ×1000 probe catch: the previous fixed
        # 120 s total deadline was a hidden scale constant — at 100M
        # events the data batch outlives it, the loop stopped the query
        # mid-batch, phase 2 landed nothing, and the old
        # ``drained or not q.isActive`` assert was vacuously true after
        # stop()). "Drained" = a zero-input batch committed AFTER a
        # data batch — the TTL cleanup batches that follow the data are
        # exactly that signal. The hour-scale hang stop applies
        # UNCONDITIONALLY (ADVICE r10): a query that stalls mid- or
        # post-data-batch (executor stall, state-store lock) must still
        # terminate the loop; guard_tripped keeps the
        # clean-self-termination fallback from vacuously passing a
        # guard-stopped run, so `assert drained` fails loudly instead
        # of the round-close gate hanging forever.
        drained = False
        saw_data = False
        guard_tripped = False
        hang_guard = time.time() + 3600
        while q.isActive:
            for p in q.recentProgress:
                if p and int(p["numInputRows"]) > 0:
                    saw_data = True
            lp = q.lastProgress
            if saw_data and lp is not None and int(lp["numInputRows"]) == 0:
                drained = True
                break
            if time.time() > hang_guard:
                guard_tripped = True
                break
            time.sleep(0.2)
        q.stop()
        q.awaitTermination()
        if not drained and not guard_tripped:
            # the query ended on its own: a clean availableNow
            # termination implies every available record was processed
            # even if no trailing zero-input batch was observed
            for p in q.recentProgress:
                if p and int(p["numInputRows"]) > 0:
                    saw_data = True
            drained = saw_data and q.exception() is None
        assert drained, f"{name}: data batch never committed"
        return read_batched_parquet(spark, outdir, out.schema)

    import time

    out1 = scratch(f"q252_out1_{os.path.basename(sf_dir)}")
    out2 = scratch(f"q252_out2_{os.path.basename(sf_dir)}")
    drop_phase(F.col("event_id") % 2 == 0, "phase1.parquet")
    p1 = run(f"s4_q252a_{os.getpid()}", out1).select(
        F.lit(1).alias("phase"), "user_id", "n"
    )
    time.sleep(2.5)  # let the 1000 ms TTL lapse before phase 2 arrives
    drop_phase(F.col("event_id") % 2 != 0, "phase2.parquet")
    p2 = run(f"s4_q252b_{os.getpid()}", out2).select(
        F.lit(2).alias("phase"), "user_id", "n"
    )
    return p1.union(p2).orderBy("phase", "user_id")


if transform_with_state_available():  # pragma: no cover - env-dependent
    query(
        "q252_state_ttl_eviction",
        oracle="""
    SELECT 1 AS phase, user_id, count(*) AS n
    FROM events WHERE event_id % 2 = 0 GROUP BY user_id
    UNION ALL
    SELECT 2 AS phase, user_id, count(*) AS n
    FROM events WHERE event_id % 2 <> 0 GROUP BY user_id
    ORDER BY phase, user_id
    """,
        section="B9-streaming",
    )(_q252)


@query(
    "q258_chained_streaming_aggs",
    # Append-mode semantics decide which windows are visible: the
    # final watermark of an availableNow run is max(ts), so only
    # HOUR windows whose end <= max(ts) have emitted (every 10-min
    # window inside such an hour closed with it). The oracle carries
    # the same horizon predicate.
    oracle="""
    SELECT time_bucket(INTERVAL 60 MINUTE, ts) AS h_start,
           event_type, count(*) AS n, {sv} AS sum_value
    FROM events, (SELECT max(ts) AS mx FROM events)
    WHERE time_bucket(INTERVAL 60 MINUTE, ts) + INTERVAL 60 MINUTE <= mx
    GROUP BY h_start, event_type ORDER BY h_start, event_type
    """.format(sv=sql_dsum("value")),
    section="B9-streaming",
)
def q258(spark, sf_dir):
    """CHAINED streaming windowed aggregations — two stateful
    operators in ONE query (Spark 3.4+ multiple-stateful-operator
    support): 10-minute tumbling counts/sums per event type cascade
    into an hourly rollup by re-windowing on the inner WINDOW COLUMN
    (`window(window, '60 minutes')`), both levels in append mode with
    one watermark. Before 3.4 this took two queries stitched through
    an intermediate sink (the kappa topology q144's docstring
    sketches); in-query chaining removes the sink hop AND the second
    query's re-read.

    Scale shape: level 1 compresses the event stream to one row per
    (10-min window, type) — partial-aggregated before its shuffle;
    level 2 aggregates 6 rows per (hour, type) group. State: level 1
    holds open windows only (watermark-evicted), level 2 holds open
    HOURS only. The hourly output is what a dashboard reads; the
    10-min granularity exists only as flowing state, never landed.
    Emission horizon: append mode releases a window when the
    watermark (max ts at availableNow end) passes its end — the
    oracle pins the same horizon, so the hash also verifies WHICH
    hours closed, not just their totals."""
    ev = events_stream(spark, sf_dir).withWatermark("ts", "0 seconds")
    ten = (
        ev.groupBy(F.window("ts", "10 minutes").alias("w10"), "event_type")
        .agg(F.count("*").alias("n10"), dsum("value").alias("sv10"))
    )
    hourly = (
        ten.groupBy(F.window("w10", "60 minutes").alias("wh"), "event_type")
        .agg(
            F.sum("n10").alias("n"),
            F.sum(F.col("sv10").cast("decimal(30,6)")).cast("double").alias("sum_value"),
        )
        .select(
            instant_as_utc_ntz("wh.start").alias("h_start"),
            "event_type",
            "n",
            "sum_value",
        )
    )
    # inlined run_to_memory so the query handle is observable: the
    # progress report must show TWO state operators (the 10-min agg and
    # the hourly rollup) — pinned by tests/test_streaming.py
    name = f"s4_mem_q258_{os.getpid()}"
    q = (
        hourly.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", scratch(f"ckpt_{name}"))
        .start()
    )
    q.awaitTermination()
    counts = [
        len(p.get("stateOperators") or [])
        for p in q.recentProgress
        if p is not None
    ]
    q258.last_state_operator_count = max(counts, default=0)
    # bounded result (calendar hours x event types)
    return ordered_small(spark.table(name), "h_start", "event_type")


@query(
    "q268_stream_to_table",
    oracle="""
    SELECT event_type, count(*) AS n FROM events
    GROUP BY event_type ORDER BY event_type
    """,
    section="B9-streaming",
)
def q268(spark, sf_dir):
    """Streaming into a CATALOG TABLE (``writeStream.toTable``, Spark
    3.3+) — the unified batch/stream table surface: the stream commits
    micro-batches into a managed table any batch query can read by
    NAME, no path plumbing, exactly-once via the file-sink commit log
    the table's reader respects (uncommitted files are invisible). This
    is the lakehouse ingestion front door the reference's S3 sink
    approximates with paths; the catalog entry is what downstream
    pipelines join against (q045/q201/q263's table discipline, now fed
    by a stream).

    The check re-reads the table BY NAME in batch and aggregates —
    counts match the source exactly iff commit atomicity held. Same
    pid-namespaced warehouse + rebuild guard as the other table
    entries."""
    from s4_spark.scratch import scratch_root

    tag = os.path.basename(sf_dir.rstrip("/")).replace(".", "_")
    name = f"events_stream_tbl_{tag}"
    path = os.path.join(scratch_root(), f"stream_tbl_{tag}")
    spark.sql(f"DROP TABLE IF EXISTS {name}")
    import shutil

    shutil.rmtree(path, ignore_errors=True)
    ev = events_stream(spark, sf_dir).select("event_id", "user_id", "event_type")
    q = (
        ev.writeStream.trigger(availableNow=True)
        .option("checkpointLocation", scratch(f"q268_ckpt_{tag}"))
        .option("path", path)
        .toTable(name)
    )
    q.awaitTermination()
    return (
        spark.table(name)
        .groupBy("event_type")
        .agg(F.count("*").alias("n"))
        # bounded result (one row per event type)
        .transform(ordered_small, "event_type")
    )


def _q269_chain(ev):
    """The q269 operator chain, parameterized by the event stream so the
    scale probe (bench/stream_state_probe.py --q269-chunked) can drive
    the SAME two-state-operator plan through a chunked, time-ordered
    replay: clicks joined to purchases within 10 minutes per user
    (watermarked stream-stream interval join), rolled up to hourly
    conversion counts (windowed agg)."""
    clicks = (
        ev.filter(F.col("event_type") == "click")
        .select("user_id", F.col("ts").alias("click_ts"))
        .withWatermark("click_ts", "0 seconds")
    )
    purch = (
        ev.filter(F.col("event_type") == "purchase")
        .select(F.col("user_id").alias("p_user"), F.col("ts").alias("p_ts"))
        .withWatermark("p_ts", "0 seconds")
    )
    pairs = clicks.join(
        purch,
        (F.col("user_id") == F.col("p_user"))
        & (F.col("p_ts") >= F.col("click_ts"))
        & (F.col("p_ts") < F.col("click_ts") + F.expr("INTERVAL 10 MINUTES")),
    )
    return (
        pairs.groupBy(F.window("click_ts", "60 minutes").alias("w"))
        .agg(F.count("*").alias("n_pairs"))
        .select(instant_as_utc_ntz("w.start").alias("h_start"), "n_pairs")
    )


@query(
    "q269_join_then_window_chain",
    # Horizon discipline: append mode emits a window once the
    # post-join watermark passes its end, and the join itself holds
    # the watermark back by its 10-min bound. Both sides apply the
    # SAME explicit conservative horizon (bucket end <= max ts - 70
    # min = window length + join bound) so the visible set is
    # deterministic at every SF regardless of where Spark's internal
    # watermark lands between (max ts - 10 min) and max ts.
    oracle="""
    WITH c AS (SELECT user_id, ts AS click_ts FROM events
               WHERE event_type = 'click'),
         p AS (SELECT user_id, ts AS p_ts FROM events
               WHERE event_type = 'purchase'),
         m AS (SELECT max(ts) AS mx FROM events),
    pairs AS (SELECT c.click_ts FROM c JOIN p ON p.user_id = c.user_id
               AND p.p_ts >= c.click_ts
               AND p.p_ts <  c.click_ts + INTERVAL 10 MINUTE)
    SELECT time_bucket(INTERVAL 60 MINUTE, click_ts) AS h_start,
           count(*) AS n_pairs
    FROM pairs, m
    WHERE time_bucket(INTERVAL 60 MINUTE, click_ts) + INTERVAL 60 MINUTE
          <= mx - INTERVAL 70 MINUTE
    GROUP BY h_start ORDER BY h_start
    """,
    section="B9-streaming",
)
def q269(spark, sf_dir):
    """The OTHER multiple-stateful-operator chain (Spark 3.4+): a
    watermarked STREAM-STREAM INTERVAL JOIN feeding a windowed
    aggregation in the same query — click→purchase attribution pairs
    (purchase within 10 min of the click, per user) rolled up to
    hourly conversion counts. q258 chains agg→agg; this pins join→agg,
    which exercises the cross-operator watermark bookkeeping the
    single-op queries never touch: the join must hold the downstream
    watermark back by its own time bound or late pairs would be
    dropped by the window before the join could emit them.

    Scale shape: the join keeps per-user state bounded by the 10-min
    interval (watermark-evicted both sides), shuffles once on user_id;
    the rollup's input is pairs (already tiny), its state is open
    hours only. Pre-3.4 this chain forced an intermediate sink +
    second query (double ingest cost at 100 TB/day). Both engines
    apply one conservative emission horizon (see oracle comment), so
    the batch hash certifies which hours CLOSED, not just their
    counts."""
    ev = events_stream(spark, sf_dir)
    mx = (
        t(spark, sf_dir, "events").agg(F.max("ts").alias("mx")).collect()[0]["mx"]
    )
    hourly = _q269_chain(ev)
    # inlined run_to_memory so the query handle is observable: the
    # progress report must show TWO state operators (the interval join
    # and the hourly rollup) — pinned by tests/test_streaming.py
    name = f"s4_mem_q269_{os.getpid()}"
    q = (
        hourly.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", scratch(f"ckpt_{name}"))
        .start()
    )
    q.awaitTermination()
    counts = [
        len(p.get("stateOperators") or [])
        for p in q.recentProgress
        if p is not None
    ]
    q269.last_state_operator_count = max(counts, default=0)
    out = spark.table(name)
    # string -> NTZ parse, never F.lit(datetime): a naive-datetime
    # literal becomes session-tz-interpreted TIMESTAMP and the NTZ
    # comparison would silently cast through the session zone
    horizon = (
        F.lit(mx.strftime("%Y-%m-%d %H:%M:%S.%f")).cast("timestamp_ntz")
        - F.expr("INTERVAL 70 MINUTES")
    )
    return (
        out.filter(F.col("h_start") + F.expr("INTERVAL 60 MINUTES") <= horizon)
        # bounded result (calendar-sized hour buckets)
        .transform(ordered_small, "h_start")
    )


@query(
    "q273_multi_watermark_policy",
    oracle="""
    WITH lo AS (SELECT min(ts) AS lo FROM events),
    c AS (SELECT 'click' AS etype,
            lo + INTERVAL 1 MINUTE *
              ((row_number() OVER (ORDER BY event_id) - 1) % 180) AS ts
          FROM events, lo WHERE event_type = 'click'),
    p AS (SELECT 'purchase' AS etype,
            lo + INTERVAL 1 MINUTE *
              ((row_number() OVER (ORDER BY event_id) - 1) % 180) AS ts
          FROM events, lo WHERE event_type = 'purchase'),
    u AS (SELECT * FROM c UNION ALL SELECT * FROM p),
    wm AS (SELECT least((SELECT max(ts) - INTERVAL 1 MINUTE FROM c),
                        (SELECT max(ts) - INTERVAL 65 MINUTE FROM p)) AS wm)
    SELECT time_bucket(INTERVAL 1 HOUR, ts) AS w_start, etype, count(*) AS n
    FROM u GROUP BY w_start, etype
    HAVING w_start + INTERVAL 1 HOUR <= (SELECT wm FROM wm)
    ORDER BY w_start, etype
    """,
    section="B9-streaming",
)
def q273(spark, sf_dir):
    """MULTI-SOURCE WATERMARK POLICY: a union of two independently
    watermarked streams — a low-latency click feed (1-min bound) and a
    laggy purchase feed (65-min bound, the shape of any ingest that
    batches upstream) — under the default ``min`` global-watermark
    policy: the query's event-time clock is the MINIMUM of the
    per-source watermarks, so the slow feed governs when windows close
    for BOTH. That is the correct default at 100 TB (append output is
    never emitted while a lagging source could still contribute rows
    to the window — no silent undercounts), and its cost is honest:
    end-to-end latency degrades to the laggiest source, and a stalled
    source freezes eviction so state grows until it resumes — the
    operational reason the ``max`` policy exists (trade completeness
    for liveness). The companion test pins the mechanism live: the
    same feeds with a tight purchase bound emit one more window than
    the laggy bound, proving the purchase watermark is what withholds
    it, and the run's final global watermark equals
    min(max_click - 1min, max_purchase - 65min).

    Feed construction mirrors q094 (synthesized minute offsets so the
    span is identical at every SF; the global row_number is the
    sf-bounded test producer, not a query path). Emitted set =
    hour windows whose end <= final global watermark, expressed
    verbatim in the oracle's HAVING."""
    from pyspark.sql import Window as W

    from s4_spark.streaming.rigs import two_stream_two_phase

    ev = t(spark, sf_dir, "events").select("event_id", "ts", "event_type")
    if ev.schema["ts"].dataType.typeName() == "timestamp_ntz":
        ev = ev.withColumn("ts", ntz_as_utc_instant("ts"))
    lo = ev.agg(F.min("ts")).collect()[0][0]
    base = F.lit(lo).cast("timestamp")

    def feed(etype):
        return ev.filter(F.col("event_type") == etype).select(
            F.lit(etype).alias("etype"),
            F.timestamp_add(
                "MINUTE",
                ((F.row_number().over(W.orderBy("event_id")) - F.lit(1)) % 180).cast(
                    "int"
                ),
                base,
            ).alias("ts"),
        )

    clicks, purch = feed("click"), feed("purchase")

    def build(ls, rs):
        u = ls.withWatermark("ts", "1 minute").unionByName(
            rs.withWatermark("ts", "65 minutes")
        )
        return (
            u.groupBy(F.window("ts", "1 hour").alias("w"), "etype")
            .agg(F.count("*").alias("n"))
            .select(instant_as_utc_ntz("w.start").alias("w_start"), "etype", "n")
        )

    # bounded result (calendar windows x event types)
    return ordered_small(
        two_stream_two_phase(
            spark, clicks, purch, clicks.limit(0), purch.limit(0), build, tag="q273"
        ),
        "w_start",
        "etype",
    )
