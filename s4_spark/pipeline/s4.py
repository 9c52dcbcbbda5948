"""S4-parity pipeline on Structured Streaming.

The reference (findcoo/S4) is one dataflow: unix-socket line records →
durable local buffer (append-file or LevelDB) → ticker-driven drain →
gzip → time-partitioned S3 object (SURVEY.md §0). This module reproduces
that pipeline's semantics idiomatically:

| reference                                  | here |
|--------------------------------------------|------|
| unix socket source (input/unix.go:19-82)   | `unixline` custom DataSource (connect = client A22, listen = server A23 fan-in); file/text stream over a landing dir (the "S3 source" north star); `socket` format for dev |
| line framing (input/unix.go:91-103)        | readStream.text lineSep="\n" |
| JSON validation, drop malformed (river/jsonr.go:99-116) | from_json(schema) + isNotNull filter (DROPMALFORMED semantics) |
| durable buffer (river/liner.go, jsonr.go)  | source WAL + checkpointLocation (upgrades at-most-once → exactly-once, fixes Appendix-B races) |
| 5-min ticker (river/river.go:52-59, main.go:44-49) | trigger(processingTime="5 minutes") |
| gzip corpus (lake/lake.go:66-73)           | writer option compression=gzip |
| year=/month=/day= S3 key (lake/lake.go:75-81) | partitionBy("year","month","day"), UTC (fixes local-clock quirk) |
| console sink (lake/lake.go:42-45)          | format("console") |
| flush-on-cancel (river/river.go:57)        | graceful query.stop() — last micro-batch commits |

Deliberately NOT replicated (reference quirks, SURVEY.md Appendix B):
at-most-once drops, lexicographic batch reordering, same-minute S3 key
overwrites, the LineRiver truncate race.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType
from pyspark.sql.streaming import StreamingQuery

# Mirrors river.Config (/root/reference/river/river.go:22-27) +
# the CLI flag surface (/root/reference/main.go:20-57).
@dataclass
class S4Config:
    input_path: str  # landing dir (or host:port for socket mode)
    output_path: str  # sink dir / s3a:// URI ("s3Path")
    checkpoint_path: str  # "bufferPath" analog — durable progress
    record_type: str = "line"  # "line" | "json"  (--type)
    flush_interval: str = "5 minutes"  # --flush (ticker default, main.go:44-49)
    sink: str = "lake"  # "lake" (gzip text, partitioned) | "console"
    json_schema: str | None = None  # schema for json mode (None -> permissive map)
    available_now: bool = False  # test/backfill mode: drain and stop
    source_format: str = "text"  # "text" | "unixline" | "socket" (dev only)
    socket_mode: str = "connect"  # unixline only: "connect" (A22 client) |
    # "listen" (A23 server — bind + fan-in of N producer connections)
    max_files_per_trigger: int | None = None  # 100 TB listing control
    event_time_col: str | None = None  # partition by this instead of arrival time
    single_object_per_flush: bool = False  # A13/A18 literal batch-shape parity


def read_records(spark: SparkSession, cfg: S4Config) -> DataFrame:
    """A1/A2/A4: attach the record stream with newline framing.

    ``unixline`` is the direct reference parity path: the custom unix-
    domain-socket DataSource with the durable spool (exactly-once), in
    connect mode (`s4 client`, main.go:106-122) or listen mode
    (`s4 server`, main.go:124-140 — the source binds and fans in every
    producer connection)."""
    if cfg.source_format == "unixline":
        import s4_spark.sources as sources

        sources.register(spark)
        return (
            spark.readStream.format("s4_unixline")
            .option("path", cfg.input_path)
            .option("mode", cfg.socket_mode)
            .load()
        )
    if cfg.source_format == "socket":
        host, port = cfg.input_path.split(":")
        return (
            spark.readStream.format("socket")
            .option("host", host)
            .option("port", int(port))
            .load()
        )
    reader = spark.readStream.format("text").option("lineSep", "\n")
    if cfg.max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", cfg.max_files_per_trigger)
    return reader.load(cfg.input_path)


def validate_json(records: DataFrame, cfg: S4Config) -> DataFrame:
    """A8: JSON-object validation with silent drop of malformed records
    (reference drops via panic/recover, river/jsonr.go:100-108; here the
    drop is an explicit filter on parse failure). Non-object top-level
    JSON (arrays, scalars) fails the struct/map parse, matching the
    reference's map[string]interface{} unmarshal target.

    Always validates against map<string,string>: a struct schema would
    NOT work — PERMISSIVE from_json yields a null-FIELD row (not a null
    struct) for malformed input, silently keeping bad records.

    The parsed map is KEPT (``__parsed``) so the partitioning stage can
    extract the event-time field from it instead of running a second
    full ``from_json`` over every record (r13, guide §4: JSON parse is
    the pipeline's dominant per-row CPU; one parse, not two). Sinks
    select the payload columns explicitly, so the helper column never
    reaches storage."""
    parsed = records.withColumn(
        "__parsed", F.from_json("value", "map<string,string>")
    )
    return parsed.filter(F.col("__parsed").isNotNull())


def with_time_partitions(df: DataFrame, cfg: S4Config) -> DataFrame:
    """A17: year=/month=/day= keys — from a field of the (JSON) record
    when ``event_time_col`` is configured, else processing time (the
    reference uses the local wall clock, lake/lake.go:79; we use UTC and
    prefer event time so the layout is reproducible and prunable)."""
    if cfg.event_time_col:
        if not cfg.json_schema:
            raise ValueError("event_time_col requires json_schema")
        if "__parsed" in df.columns:
            # one-parse path: the validation stage already parsed the
            # record into a string map; a typed extraction of the one
            # needed field replaces a second full-schema from_json per
            # record. try_element_at + try_cast mirror from_json's
            # null-on-missing / null-on-unparseable semantics exactly
            # (a plain [] access or cast would THROW under ANSI mode
            # where from_json yields NULL).
            field_type = {
                f.name: f.dataType.simpleString()
                for f in StructType.fromDDL(cfg.json_schema).fields
            }[cfg.event_time_col]
            ts = F.try_element_at(
                F.col("__parsed"), F.lit(cfg.event_time_col)
            ).try_cast(field_type)
        else:
            ts = F.from_json("value", cfg.json_schema)[cfg.event_time_col]
    else:
        ts = F.current_timestamp()
    return (
        df.withColumn("year", F.year(ts))
        .withColumn("month", F.month(ts))
        .withColumn("day", F.dayofmonth(ts))
    )


def build_pipeline(spark: SparkSession, cfg: S4Config) -> DataFrame:
    records = read_records(spark, cfg)
    if cfg.record_type == "json":
        records = validate_json(records, cfg)
    return records


def single_object_batch_sink(cfg: S4Config):
    """SURVEY §4.3 compat mode for the reference's literal
    one-object-per-flush batch shape (river/jsonr.go:70-78 drains the
    whole buffer into ONE body per ticker fire; lake/lake.go:65-90 PUTs
    it as one S3 object). The default lake sink is semantically
    equivalent — one file-SET per epoch — but writes N part-files;
    here each trigger lands exactly one gzip'd text object per
    partition dir, named ``b{batchId}.txt.gz``.

    Mechanics: ``coalesce(1)`` collapses the batch to one task (the
    compat mode trades away write parallelism by definition — that is
    the reference's shape; don't enable it for throughput), the task
    writes a staged ``year=/month=/day=`` tree, and the driver moves
    each staged part-file to ``<out>/<partition>/b{batchId}.txt.gz``
    through the Hadoop FileSystem API. The batchId-keyed fixed name
    makes a retried batch overwrite its own object rather than
    duplicate it — idempotent like rigs.idempotent_batch_sink, and
    scheme-agnostic the same way."""
    from s4_spark.streaming.rigs import hadoop_fs

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        fs, Path = hadoop_fs(spark, cfg.output_path)
        staged = f"{cfg.output_path}/_staging_b{batch_id}"
        (
            batch_df.coalesce(1)
            .write.mode("overwrite")
            .partitionBy("year", "month", "day")
            .option("compression", "gzip")
            .text(staged)
        )
        for st in fs.globStatus(Path(f"{staged}/year=*/month=*/day=*/part-*")):
            part = st.getPath()
            day = part.getParent()
            rel = f"{day.getParent().getParent().getName()}/{day.getParent().getName()}/{day.getName()}"
            dest_dir = Path(f"{cfg.output_path}/{rel}")
            fs.mkdirs(dest_dir)
            dest = Path(f"{cfg.output_path}/{rel}/b{batch_id}.txt.gz")
            if fs.exists(dest):
                fs.delete(dest, False)
            fs.rename(part, dest)
        fs.delete(Path(staged), True)

    return sink


def start(spark: SparkSession, cfg: S4Config) -> StreamingQuery:
    """Wire source → validation → sink and start the query (the analog of
    `s4 client|server` wiring in /root/reference/main.go:106-140)."""
    df = build_pipeline(spark, cfg)
    if cfg.sink == "console":
        # the validation helper column must not reach the console
        writer = df.drop("__parsed").writeStream.format("console")
    else:
        df = with_time_partitions(df, cfg)
        # text sink: exactly one data column ("value") + partition keys —
        # one gzip'd line-file set per epoch, the A13/A18 batch shape
        df = df.select("value", "year", "month", "day")
        if cfg.single_object_per_flush:
            writer = df.writeStream.foreachBatch(single_object_batch_sink(cfg))
        else:
            writer = (
                df.writeStream.format("text")
                .option("path", cfg.output_path)
                .option("compression", "gzip")
                .partitionBy("year", "month", "day")
            )
    writer = writer.option("checkpointLocation", cfg.checkpoint_path)
    if cfg.available_now:
        writer = writer.trigger(availableNow=True)
    else:
        writer = writer.trigger(processingTime=cfg.flush_interval)
    return writer.start()


def run_once(spark: SparkSession, cfg: S4Config) -> None:
    """Drain everything currently in the landing dir and stop (test /
    backfill mode; also how the e2e parity check runs the pipeline)."""
    cfg.available_now = True
    q = start(spark, cfg)
    q.awaitTermination()
