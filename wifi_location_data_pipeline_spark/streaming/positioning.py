"""Streaming positioning: request JSON zone → positions, per micro-batch.

The reference serves positioning as a long-lived HTTP API
(`wifi-positioning-service`, PositioningController.java:30-49 →
PositioningServiceImpl.calculatePosition:168-190; SURVEY §3.2). The
Spark-first equivalent of "requests arrive continuously, answers leave
continuously" is Structured Streaming over a request zone:

    readStream.json(request_zone, POSITIONING_REQUEST_SCHEMA)
      → foreachBatch: position_requests_onepass ⋈ broadcast(AP dimension)
      → per-batch_id overwrite sink (idempotent under foreachBatch's
        at-least-once replay ⇒ effectively exactly-once results)

foreachBatch rather than a stateless map: the ensemble is a multi-stage
aggregation (pack → context/selection/algorithms → combine) with an
optional Arrow tier, which the streaming planner cannot express as a
continuous query — per-batch execution of the BATCH plan is the supported
Spark shape for this (and mirrors the reference's request-batched executor,
WifiPositioningCalculator.java:106-176).

The AP dimension is loaded ONCE and broadcast per batch — the analog of the
service's DynamoDB lookup path with its long-lived client. The per-request
diagnostics (``with_reasons``) ride along identically to the batch path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery

from wifi_location_data_pipeline_spark.positioning.onepass import (
    position_requests_onepass,
)
from wifi_location_data_pipeline_spark.schemas import POSITIONING_REQUEST_SCHEMA


def start_positioning_stream(
    spark: SparkSession,
    request_zone: str,
    access_points: DataFrame,
    out_path: str,
    checkpoint: str,
    with_reasons: bool = False,
    available_now: bool = True,
    max_files_per_trigger: int | None = None,
    numeric_tier: str = "eager",
    sink_coalesce: int | None = None,
) -> StreamingQuery:
    """Answer positioning requests from a streaming file zone.

    ``available_now=True`` drains the zone and stops (backfill / test mode);
    ``False`` runs continuously with the default trigger — new request files
    are answered in the next micro-batch, the streaming analog of the
    service's request loop.

    ``numeric_tier`` defaults to "eager": a serving micro-batch is bounded
    (maxFilesPerTrigger), so skipping the per-batch numeric-count job in
    favor of an always-on 2-task Python branch cuts one whole Spark job of
    latency per batch (see position_requests_onepass). Pass "auto" for
    large backfill drains where tier sizing matters.
    """
    reader = spark.readStream.schema(POSITIONING_REQUEST_SCHEMA)
    if max_files_per_trigger is not None:
        # bound the arrival batch (the analog of the reference's Kafka
        # max-poll / SQS batch limits); also gives the latency bench one
        # micro-batch per request file
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    requests = reader.json(request_zone)

    def _answer(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        staged: list = []
        try:
            out = position_requests_onepass(
                batch_df, access_points,
                with_reasons=with_reasons, staged_sink=staged,
                numeric_tier=numeric_tier,
            )
            # foreachBatch is AT-LEAST-once: a batch that fails after the
            # write but before the checkpoint commit REPLAYS. Writing each
            # batch to its own batch_id=N partition directory with overwrite
            # makes the replay idempotent — the second attempt replaces the
            # first attempt's files instead of appending duplicates, so the
            # sink as a whole is effectively exactly-once.
            if sink_coalesce is not None:
                # bounded serving micro-batches produce a few hundred rows;
                # writing them as shuffle-partition-many files bills one
                # task + one file-commit each for near-empty outputs
                out = out.coalesce(sink_coalesce)
            out.write.mode("overwrite").parquet(f"{out_path}/batch_id={batch_id}")
        finally:
            # one interior cache point is registered per call; unpersist it
            # or a continuous stream pins one plan + blocks per micro-batch
            for df in staged:
                df.unpersist()

    writer = (
        requests.writeStream.foreachBatch(_answer)
        .option("checkpointLocation", checkpoint)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
