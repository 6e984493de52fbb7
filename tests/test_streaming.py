"""Streaming ingest + stateful AP refinement, driven synchronously with
availableNow/processAllAvailable (SURVEY §2.8; memory-sink smoke pattern)."""

import base64
import gzip
import os
import shutil

import pytest
from pyspark.sql import functions as F

from tests.wifi_fixtures import documents_as_json_lines, make_documents
from wifi_location_data_pipeline_spark.streaming.ingest import start_ingest
from wifi_location_data_pipeline_spark.streaming.state import streaming_ap_state


@pytest.fixture()
def tmpzone(tmp_path):
    return str(tmp_path)


def _write_raw(zone, name, lines):
    with open(os.path.join(zone, name), "w") as f:
        for line in lines:
            f.write(base64.b64encode(gzip.compress(line.encode(), mtime=0)).decode() + "\n")


def test_streaming_ingest_end_to_end(spark, tmpzone):
    raw = os.path.join(tmpzone, "raw"); os.makedirs(raw)
    out = os.path.join(tmpzone, "table")
    ckpt = os.path.join(tmpzone, "ckpt")
    lines = documents_as_json_lines(make_documents(n_docs=12))
    _write_raw(raw, "a.txt", lines[:6])
    _write_raw(raw, "b.txt", lines[6:])

    q = start_ingest(spark, raw, out, ckpt, available_now=True)
    q.awaitTermination(120)
    table = spark.read.parquet(out)
    n1 = table.count()
    assert n1 > 0
    assert table.filter(F.col("bssid").isNull()).count() == 0

    # incremental: a new file arriving is processed exactly once. Timestamps
    # must advance past the restored watermark or the rows are (correctly)
    # discarded as late — shift the new batch +2 days.
    shift = 2 * 86_400_000
    new_docs = make_documents(n_docs=3, seed=7)[:3]  # drop edge-case docs (dup event ids)
    for d in new_docs:
        for ev in d["wifiConnectedEvents"]:
            ev["timestamp"] += shift
            ev["location"]["time"] += shift
        for sr in d["scanResults"]:
            sr["timestamp"] += shift
            sr["location"]["time"] += shift
            for r in sr["results"]:
                r["scantime"] += shift
    _write_raw(raw, "c.txt", documents_as_json_lines(new_docs))
    q2 = start_ingest(spark, raw, out, ckpt, available_now=True)
    q2.awaitTermination(120)
    n2 = spark.read.parquet(out).count()
    assert n2 > n1

    # re-running with the same checkpoint and no new data adds nothing (exactly-once)
    q3 = start_ingest(spark, raw, out, ckpt, available_now=True)
    q3.awaitTermination(120)
    assert spark.read.parquet(out).count() == n2


def test_streaming_ap_state_kalman(spark, tmpzone):
    src = os.path.join(tmpzone, "estimates"); os.makedirs(src)
    ckpt = os.path.join(tmpzone, "ckpt2")
    est1 = spark.createDataFrame(
        [("ap1", 40.0, -74.0, 10.0, 1), ("ap1", 40.0002, -74.0002, 10.0, 2),
         ("ap2", 41.0, -75.0, 5.0, 1)],
        "bssid string, latitude double, longitude double, horizontal_accuracy double, batch_ts int",
    )
    est1.write.parquet(os.path.join(src, "batch1"))

    stream = (
        spark.readStream.schema(est1.schema).parquet(src + "/*")
    )
    refined = streaming_ap_state(stream)
    q = (
        refined.writeStream.outputMode("append").format("memory")
        .queryName("ap_state_out").option("checkpointLocation", ckpt).start()
    )
    try:
        q.processAllAvailable()
        rows = {r["bssid"]: r for r in spark.sql("select * from ap_state_out").collect()}
        assert rows["ap1"]["n_updates"] == 2
        assert 40.0 < rows["ap1"]["latitude"] < 40.0002      # fused between the two
        assert rows["ap1"]["p_var_m2"] < 100.0               # variance contracted
        assert rows["ap2"]["n_updates"] == 1
        assert not rows["ap1"]["relocated"]
    finally:
        q.stop()


def test_kafka_reader_option_wiring():
    """No broker/jar in the sandbox: assert the source options match the
    reference consumer's poll contract (application.yml:96)."""
    from wifi_location_data_pipeline_spark.streaming.ingest import kafka_reader_options

    opts = kafka_reader_options("broker-1:9092,broker-2:9092", "wifi-scans")
    assert opts == {
        "kafka.bootstrap.servers": "broker-1:9092,broker-2:9092",
        "subscribe": "wifi-scans",
        "maxOffsetsPerTrigger": "150",
    }
    assert kafka_reader_options("b:9092", "t", 500)["maxOffsetsPerTrigger"] == "500"


def test_session_window_stream_twin(spark, tmpzone):
    """The session_window expression used by the batch `session_window_agg`
    query runs unchanged under readStream + watermark: stream a slice of
    the events table through availableNow and compare the finalized
    sessions to the batch computation on the same slice (docstring claim
    in plans.queries._session_window_fn, substantiated)."""
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR_TESTS", "/root/testdata/sf0.001")
    src = os.path.join(tmpzone, "events_slice")
    # watermarks require TIMESTAMP (not NTZ); session TZ is pinned UTC so
    # the cast is value-preserving
    batch_events = (
        spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
        .filter(F.col("user_id") < 4)
        .select("user_id", F.col("ts").cast("timestamp").alias("ts"), "value")
    )
    batch_events.write.parquet(src)

    agg = lambda df: (  # noqa: E731 — the ONE expression both modes share
        df.groupBy("user_id", F.session_window("ts", "4 hours").alias("w")).agg(
            F.count("*").alias("n_events"),
            (F.floor(F.sum("value") * 10000.0 + 0.5) / 10000.0).alias("total_value"),
        )
    )

    stream = (
        spark.readStream.schema(batch_events.schema)
        .parquet(src)
        .withWatermark("ts", "0 seconds")
    )
    q = (
        agg(stream)
        .writeStream.outputMode("complete")
        .format("memory")
        .queryName("sess_twin")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    canon = lambda df: sorted(  # noqa: E731
        (r.user_id, str(r.w.start), str(r.w.end), r.n_events, r.total_value)
        for r in df.collect()
    )
    got = canon(spark.sql("SELECT * FROM sess_twin"))
    want = canon(agg(batch_events))
    assert got == want and len(got) > 0


def test_streaming_positioning_answers_requests(spark, tmpzone):
    """§3.2 online positioning as a streaming job: requests land as JSON
    files, each micro-batch answers them through the REAL one-pass ensemble
    against a broadcast AP dimension, commits append-exactly-once, and a
    re-run with the same checkpoint adds nothing."""
    import json

    from tests.wifi_fixtures import make_access_points
    from wifi_location_data_pipeline_spark.schemas import WIFI_ACCESS_POINTS_SCHEMA
    from wifi_location_data_pipeline_spark.streaming.positioning import (
        start_positioning_stream,
    )

    zone = os.path.join(tmpzone, "reqs"); os.makedirs(zone)
    out = os.path.join(tmpzone, "positions")
    ckpt = os.path.join(tmpzone, "pos_ckpt")
    aps = spark.createDataFrame(make_access_points(), WIFI_ACCESS_POINTS_SCHEMA)
    macs = [
        r["mac_addr"]
        for r in aps.filter(F.col("status") == "active").limit(3).collect()
    ]

    def req(rid, n):
        return {
            "requestId": rid, "client": "stream", "application": "test",
            "calculationDetail": True,
            "wifiScanResults": [
                {"macAddress": m, "signalStrength": -60.0 - 3 * i,
                 "frequency": 2437, "ssid": "t", "linkSpeed": None,
                 "channelWidth": None}
                for i, m in enumerate(macs[:n])
            ],
        }

    with open(os.path.join(zone, "batch1.json"), "w") as f:
        f.write(json.dumps(req("s1", 1)) + "\n" + json.dumps(req("s2", 2)) + "\n")

    q = start_positioning_stream(spark, zone, aps, out, ckpt, with_reasons=True)
    q.awaitTermination(120)
    first = {r["request_id"]: r for r in spark.read.parquet(out).collect()}
    assert set(first) == {"s1", "s2"}
    assert first["s1"]["selection_context"]["ap_count_class"] == "SINGLE_AP"
    assert any(e["selected"] for e in first["s1"]["selection_info"])

    # a new request file is answered incrementally, exactly once
    with open(os.path.join(zone, "batch2.json"), "w") as f:
        f.write(json.dumps(req("s3", 3)) + "\n")
    q2 = start_positioning_stream(spark, zone, aps, out, ckpt, with_reasons=True)
    q2.awaitTermination(120)
    rows = spark.read.parquet(out).collect()
    assert sorted(r["request_id"] for r in rows) == ["s1", "s2", "s3"]

    q3 = start_positioning_stream(spark, zone, aps, out, ckpt, with_reasons=True)
    q3.awaitTermination(120)
    assert spark.read.parquet(out).count() == 3


def test_streaming_ap_state_survives_restart(spark, tmpzone):
    """applyInPandasWithState recovery: the per-AP Kalman state (x-hat, P,
    n_updates) must be RESTORED from the state store when the query
    restarts on the same checkpoint — the new batch continues the filter
    (n_updates 2 -> 3, variance keeps contracting) instead of
    re-bootstrapping from scratch. This is the persistence contract the
    reference keeps in its AP-state table (kalman_update_step's batch
    twin); GroupState recovery is the streaming analog."""
    src = os.path.join(tmpzone, "estimates_r"); os.makedirs(src)
    ckpt = os.path.join(tmpzone, "ckpt_r")
    schema = (
        "bssid string, latitude double, longitude double,"
        " horizontal_accuracy double, batch_ts int"
    )
    spark.createDataFrame(
        [("ap1", 40.0, -74.0, 10.0, 1), ("ap1", 40.0002, -74.0002, 10.0, 2)],
        schema,
    ).write.parquet(os.path.join(src, "batch1"))

    out = os.path.join(tmpzone, "ap_state_out_r")

    def run_once():
        # a real (parquet) sink: the memory sink cannot recover from a
        # checkpoint, and recovery is exactly what this test pins
        stream = spark.readStream.schema(schema).parquet(src + "/*")
        q = (
            streaming_ap_state(stream)
            .writeStream.outputMode("append").format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        # each state flush appends one row per updated AP; the LATEST
        # n_updates per bssid is the live state
        rows = spark.read.parquet(out).collect()
        latest = {}
        for r in rows:
            if r["bssid"] not in latest or r["n_updates"] > latest[r["bssid"]]["n_updates"]:
                latest[r["bssid"]] = r
        return latest

    first = run_once()
    assert first["ap1"]["n_updates"] == 2
    p_after_two = first["ap1"]["p_var_m2"]

    # new arrival AFTER the restart — the restored state must absorb it
    spark.createDataFrame(
        [("ap1", 40.0001, -74.0001, 10.0, 3)], schema
    ).write.parquet(os.path.join(src, "batch2"))
    second = run_once()
    assert second["ap1"]["n_updates"] == 3, "state was not restored on restart"
    assert second["ap1"]["p_var_m2"] < p_after_two  # variance kept contracting
    assert 40.0 < second["ap1"]["latitude"] < 40.0002


def test_streaming_session_emission_boundary(spark, tmp_path):
    """Pins the session-window emission boundary the
    streaming_session_counts oracle reproduces: with Trigger.AvailableNow
    and append mode, a session whose end falls EXACTLY on the final
    watermark (max event time - delay) IS emitted — the predicate is
    end <= watermark, inclusive. If a Spark upgrade ever flips this to
    strict less-than, this test fails before the cross-engine gate does."""
    from pyspark.sql import functions as F

    d = str(tmp_path / "src")
    df = spark.createDataFrame(
        [(1, "2024-01-01 00:00:00"), (2, "2024-01-01 00:31:00")],
        "user_id long, s string",
    ).selectExpr("user_id", "CAST(s AS TIMESTAMP) AS ets")
    df.write.mode("overwrite").parquet(d)
    agg = (
        spark.readStream.schema(df.schema).parquet(d)
        .withWatermark("ets", "1 minute")
        .groupBy(F.session_window("ets", "30 minutes").alias("w"), "user_id")
        .count()
    )
    q = (
        agg.writeStream.format("memory").queryName("ssw_boundary")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination()
    rows = spark.sql(
        "SELECT user_id, CAST(w.end AS STRING) AS e FROM ssw_boundary"
    ).collect()
    # user 1's session end (00:30:00) == final watermark (00:31 - 1 min):
    # emitted. user 2's session (end 01:01) is still in state: not emitted.
    assert [(r.user_id, r.e) for r in rows] == [(1, "2024-01-01 00:30:00")]


def test_streaming_session_boundary_sub_ms(spark, tmp_path):
    """Pins the MILLISECOND floor in the watermark base (ADVICE r8): Spark
    tracks event-time watermarks in whole ms (max event time truncated to
    ms, minus the delay), so a session ending in the sub-ms gap below the
    exact-microsecond MAX(ts) - delay must NOT be emitted. Events at
    00:00:00.000300 and 00:31:00.000500: session 1 ends 00:30:00.000300;
    the exact-micros watermark (00:30:00.000500) would emit it, but the
    real watermark floors to 00:30:00.000 and holds it in state. The
    streaming_session_counts oracle reproduces the floor — asserted here
    against DuckDB on the same two rows."""
    from pyspark.sql import functions as F

    d = str(tmp_path / "src_subms")
    df = spark.createDataFrame(
        [(1, "2024-01-01 00:00:00.000300"), (2, "2024-01-01 00:31:00.000500")],
        "user_id long, s string",
    ).selectExpr("user_id", "CAST(s AS TIMESTAMP) AS ets")
    df.write.mode("overwrite").parquet(d)
    agg = (
        spark.readStream.schema(df.schema).parquet(d)
        .withWatermark("ets", "1 minute")
        .groupBy(F.session_window("ets", "30 minutes").alias("w"), "user_id")
        .count()
    )
    q = (
        agg.writeStream.format("memory").queryName("ssw_subms")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination()
    assert spark.sql("SELECT * FROM ssw_subms").count() == 0

    # the oracle's ms-floored predicate agrees: same rows, zero sessions
    import duckdb

    from wifi_location_data_pipeline_spark.plans.queries import QUERIES

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM (VALUES "
        "(1::BIGINT, TIMESTAMP '2024-01-01 00:00:00.000300'), "
        "(2::BIGINT, TIMESTAMP '2024-01-01 00:31:00.000500')"
        ") AS t(user_id, ts)"
    )
    oracle = QUERIES["streaming_session_counts"].oracle()
    assert con.execute(oracle).fetchall() == []


def test_interval_join_multi_batch_state_retention(spark, tmp_path):
    """Stream-stream interval join across MICRO-BATCH boundaries: clicks
    arriving in batch k must match purchases arriving in batch k+1 as
    long as the pair is inside the 1-hour interval (join state retained
    until the watermark passes click_ts + 1h). Events are staged as
    three TIME-ORDERED files consumed one per trigger — the arrival
    order a real file stream has — so no row is late and the streaming
    result must equal the batch self-join exactly."""
    from pyspark.sql import functions as F2

    events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    ordered = events.orderBy("ts").withColumn(
        "part", F2.ntile(3).over(__import__("pyspark").sql.Window.orderBy("ts"))
    )
    stage = str(tmp_path / "stage")
    for p in (1, 2, 3):
        ordered.filter(F2.col("part") == p).drop("part").coalesce(1).write.mode(
            "append" if p > 1 else "overwrite"
        ).parquet(stage)

    def side(event_type, alias):
        return (
            spark.readStream.schema(events.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(stage)
            .filter(F2.col("event_type") == event_type)
            .select(
                F2.col("user_id").alias(f"{alias}_user"),
                F2.col("event_id").alias(f"{alias}_id"),
                F2.col("ts").cast("timestamp").alias(f"{alias}_ts"),
            )
            .withWatermark(f"{alias}_ts", "1 hour")
        )

    joined = side("click", "c").join(
        side("purchase", "p"),
        F2.expr("p_user = c_user AND p_ts > c_ts AND p_ts <= c_ts + INTERVAL 1 HOUR"),
        "inner",
    )
    q = (
        joined.writeStream.format("memory")
        .queryName("ivj_multibatch")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = spark.sql(
        "SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(c_id) AS BIGINT) AS cs,"
        " CAST(SUM(p_id) AS BIGINT) AS ps FROM ivj_multibatch"
    ).collect()[0]

    c = events.filter("event_type = 'click'").select(
        F2.col("user_id").alias("cu"), F2.col("event_id").alias("ci"),
        F2.col("ts").cast("timestamp").alias("ct"),
    )
    p = events.filter("event_type = 'purchase'").select(
        F2.col("user_id").alias("pu"), F2.col("event_id").alias("pi"),
        F2.col("ts").cast("timestamp").alias("pt"),
    )
    want = (
        c.join(p, F2.expr("pu = cu AND pt > ct AND pt <= ct + INTERVAL 1 HOUR"))
        .agg(
            F2.count("*").cast("long").alias("n"),
            F2.sum("ci").cast("long").alias("cs"),
            F2.sum("pi").cast("long").alias("ps"),
        )
        .collect()[0]
    )
    assert got.n == want.n and got.n > 0
    assert got.cs == want.cs and got.ps == want.ps


def test_left_interval_join_emits_only_after_interval_expires(spark, tmp_path):
    """LEFT OUTER interval join eviction contract across RESTARTS: an
    unmatched click must NOT emit while the watermark is inside its
    one-hour interval, and MUST emit NULL-padded once later arrivals
    push the watermark past the interval end. Two availableNow runs
    share one checkpoint: run 1 sees only the click (plus a purchase
    for a different user, so both sides carry a watermark) and emits
    nothing; run 2 sees +3 h events on both sides and must emit exactly
    the NULL-padded click from run 1."""
    import datetime as dt

    from pyspark.sql import Row
    from pyspark.sql import functions as F2

    schema = (
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string"
    )
    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)
    stage = str(tmp_path / "stage")
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")
    batch1 = [
        Row(event_id=1, ts=t0, user_id=1, event_type="click", value=1.0, props=""),
        Row(event_id=2, ts=t0 + dt.timedelta(minutes=5), user_id=2,
            event_type="purchase", value=1.0, props=""),
    ]
    batch2 = [
        Row(event_id=3, ts=t0 + dt.timedelta(hours=3), user_id=3,
            event_type="click", value=1.0, props=""),
        Row(event_id=4, ts=t0 + dt.timedelta(hours=3), user_id=4,
            event_type="purchase", value=1.0, props=""),
    ]

    def run():
        def side(et, alias):
            return (
                spark.readStream.schema(schema)
                .parquet(stage)
                .filter(F2.col("event_type") == et)
                .select(
                    F2.col("user_id").alias(f"{alias}_user"),
                    F2.col("event_id").alias(f"{alias}_id"),
                    F2.col("ts").cast("timestamp").alias(f"{alias}_ts"),
                )
                .withWatermark(f"{alias}_ts", "1 hour")
            )

        j = side("click", "c").join(
            side("purchase", "p"),
            F2.expr(
                "p_user = c_user AND p_ts > c_ts"
                " AND p_ts <= c_ts + INTERVAL 1 HOUR"
            ),
            "leftOuter",
        )
        q = (
            j.writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)

    spark.createDataFrame(batch1, schema).coalesce(1).write.mode(
        "overwrite"
    ).parquet(stage)
    run()
    got1 = spark.read.parquet(out).collect()
    # the click's interval [t0, t0+1h] has not closed: nothing may emit
    assert got1 == []

    spark.createDataFrame(batch2, schema).coalesce(1).write.mode(
        "append"
    ).parquet(stage)
    run()
    got2 = spark.read.parquet(out).collect()
    # exactly the run-1 click, NULL-padded; the run-2 click's interval is
    # still open, so it must NOT appear
    assert len(got2) == 1
    r = got2[0]
    assert r.c_id == 1 and r.c_user == 1 and r.p_id is None and r.p_user is None
