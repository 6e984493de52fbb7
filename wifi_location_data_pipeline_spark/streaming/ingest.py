"""Streaming ingest: raw zone → wifi_measurements, exactly-once per micro-batch.

Replaces the reference's Kafka→Firehose→S3→SQS→transformer→Firehose chain
(SURVEY.md §3.1) with one Structured Streaming job:

    readStream.text(raw_zone) → decode → transform → writeStream(parquet/table)

Semantics mapping (§2.8):
- micro-batching: trigger(processingTime=…) ≈ the SQS/Firehose batch cadence
  (availableNow for backfill runs)
- dedup: dropDuplicatesWithinWatermark on the deterministic event_id inside
  the reference's 5 s window (application.yml:171)
- late/stale data: the same stage-1 timestamp filter; watermark bounds state
- exactly-once: file-sink (or lakehouse table) commit per micro-batch replaces
  Firehose retry/backoff machinery

A Kafka source variant is provided behind the same transform for deployments
with the kafka connector on the classpath (spark-sql-kafka package).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from wifi_location_data_pipeline_spark import config as C
from wifi_location_data_pipeline_spark.operators.transform import (
    conform_to_measurements_schema,
    transform_documents,
)
from wifi_location_data_pipeline_spark.sources.codec import decode_scan_lines
from wifi_location_data_pipeline_spark.sources.raw_scan import read_raw_scan_documents_stream


def streaming_measurements(
    spark: SparkSession,
    raw_path: str,
    cfg: C.EngineConfig = C.DEFAULT_CONFIG,
) -> DataFrame:
    """Streaming DataFrame of validated measurements from a raw file zone.

    Batch dedup is replaced by watermarked streaming dedup (state is bounded
    by the reference's 5 s dedup window over event time).
    """
    docs = read_raw_scan_documents_stream(spark, raw_path)
    measurements = transform_documents(docs, cfg=cfg, dedup=False)
    with_event_time = measurements.withColumn(
        "event_time", F.timestamp_millis(F.col("measurement_timestamp"))
    )
    return (
        with_event_time.withWatermark("event_time", f"{cfg.dedup_window_seconds} seconds")
        .dropDuplicatesWithinWatermark(["event_id", "connection_status"])
        .drop("event_time")
    )


def start_ingest(
    spark: SparkSession,
    raw_path: str,
    table_path: str,
    checkpoint_path: str,
    trigger_seconds: int | None = 5,
    available_now: bool = False,
) -> StreamingQuery:
    """Launch the ingest job writing day-partitioned parquet with checkpointing."""
    stream = streaming_measurements(spark, raw_path)
    out = conform_to_measurements_schema(stream).withColumn(
        "ingestion_date", F.to_date("ingestion_timestamp")
    )
    writer = (
        out.writeStream.outputMode("append")
        .format("parquet")
        .option("path", table_path)
        .option("checkpointLocation", checkpoint_path)
        .partitionBy("ingestion_date")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    elif trigger_seconds:
        writer = writer.trigger(processingTime=f"{trigger_seconds} seconds")
    return writer.start()


def kafka_reader_options(
    bootstrap_servers: str, topic: str, max_offsets_per_trigger: int = 150
) -> dict[str, str]:
    """Kafka source options, factored out so the wiring is unit-testable
    without the connector jar (no broker in the test sandbox).

    ``maxOffsetsPerTrigger`` mirrors the reference consumer's 150-records/poll
    (wifi-scan-queue-consumer application.yml:96)."""
    return {
        "kafka.bootstrap.servers": bootstrap_servers,
        "subscribe": topic,
        "maxOffsetsPerTrigger": str(max_offsets_per_trigger),
    }


def read_kafka_scan_stream(
    spark: SparkSession, bootstrap_servers: str, topic: str, max_offsets_per_trigger: int = 150
) -> DataFrame:
    """Kafka source variant: value = base64(gzip(json)) message bodies.

    Requires the Kafka connector jar; fails at ``load()``, not module load.
    """
    reader = spark.readStream.format("kafka")
    for k, v in kafka_reader_options(bootstrap_servers, topic, max_offsets_per_trigger).items():
        reader = reader.option(k, v)
    raw = reader.load()
    lines = raw.select(F.col("value").cast("string").alias("value"))
    return decode_scan_lines(lines)
