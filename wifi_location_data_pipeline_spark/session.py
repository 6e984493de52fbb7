"""SparkSession factory tuned for the engine.

Local-mode defaults follow the driver environment (single JVM, many cores);
cluster deployments override via ``extra_conf``. Every knob here matters at
100 TB: AQE for runtime re-planning and skew joins, UTC session timezone so
results are oracle-comparable, Arrow for the pandas-UDF tier.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def build_session(
    app_name: str = "wifi_location_data_pipeline_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Create (or reuse) a SparkSession with engine defaults.

    Defaults are environment-driven so tests, bench, and the driver's
    harness can shape the session without code changes:

    - ``SPARK_GRAFT_CPUS``  → ``local[N]`` master and shuffle parallelism
    - ``SPARK_GRAFT_DRIVER_MEM`` → driver heap (local mode = the only heap)
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS")
    if master is None:
        master = f"local[{cpus}]" if cpus else "local[*]"
    if shuffle_partitions is None:
        shuffle_partitions = int(cpus) if cpus else (os.cpu_count() or 8)
    driver_mem = os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g")

    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # coalesce small shuffles down to the advisory size instead of pinning
        # them at default parallelism: multi-stage plans over modest data spend
        # more wall-clock on task scheduling than on work otherwise. CPU-heavy
        # narrow stages that need fan-out (the pandas numeric tier) ask for it
        # explicitly with repartition().
        .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
        # shuffle-partition sizing (advisoryPartitionSizeInBytes) and scan
        # split sizing (files.openCostInBytes) are corpus-dependent: what a
        # tiny test corpus wants (coarse — fixed cost dominates) serializes
        # CPU-heavy stages at scale. sources.tables.configure_for_corpus
        # sets both per corpus; the session keeps Spark's defaults.
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # answer filterless MIN/MAX/COUNT from parquet footer stats instead
        # of a full column scan (the fixture-population MAX(user_id) and any
        # stats probe). NOTE: this only engages on the DSv2 parquet reader;
        # the local suite reads parquet via the V1 source (parquet is in the
        # default spark.sql.sources.useV1SourceList), where it is a no-op —
        # verified by the absence of PushedAggregation in the MAX plan. The
        # single-column MAX scan it would save costs ~0.1 s per query here;
        # kept for deployments that run the DSv2 reader.
        .config("spark.sql.parquet.aggregatePushdown", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", driver_mem)
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # collect_list/collect_set aggregates (the packed positioning plan,
        # session packing) run as ObjectHashAggregate; the default 128-entry
        # in-memory map spills to sort-based aggregation as soon as a
        # partition holds >128 groups, adding a sort per partition. Typed
        # object maps of a few thousand packed rows fit comfortably in
        # executor memory at any sane partition sizing.
        .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "4096")
        # error-context capture walks the Python stack AND makes an extra
        # py4j call per DataFrame operation; the array-native positioning
        # plan issues ~25k ops, where this wrapper alone cost ~40% of the
        # driver-side plan build
        .config("spark.python.sql.dataFrameDebugging.enabled", "false")
        # single-node: every task is process-local, so the delay-scheduling
        # wait is pure added latency per scheduling round. Cluster
        # deployments reading off HDFS-style locality should override via
        # extra_conf.
        .config("spark.locality.wait", "0s")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    # pin the corpus-config restore target NOW (r10 ADVICE): if the first
    # configure_for_corpus call happened after some code had transiently
    # tuned shuffle.partitions, that transient value would otherwise become
    # the permanent at-scale restore target for the session's lifetime
    if not hasattr(spark, "_graft_default_shuffle_partitions"):
        spark._graft_default_shuffle_partitions = spark.conf.get(
            "spark.sql.shuffle.partitions"
        )
    return spark
