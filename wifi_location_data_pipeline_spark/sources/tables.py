"""Parquet table access for the driver's synthetic corpus and engine tables.

The test corpus (TESTDATA.md) is one parquet file per table under
``/root/testdata/sf*/``. At production scale these would be partitioned
lakehouse tables; the loader keeps the interface identical.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TESTDATA_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one corpus table. Must work on ANY caller-supplied session (the
    correctness driver hands us a vanilla one), so nothing here may depend on
    builder-time confs. The corpus timestamps are TIMESTAMP(MICROS,
    isAdjustedToUTC=false) → TIMESTAMP_NTZ, readable everywhere; downstream
    SQL treats them timezone-free (see plans.dialect.epoch_s).

    Applies configure_for_corpus once per (session, corpus) BEFORE the read:
    queries that load tables directly (the mapInPandas/aggregation families)
    otherwise plan their scans with the default 4 MB file-open cost, which
    floors a 6 MB at-scale fact table at 2 splits — measured 2.2 s for a
    3-aggregation query in a fresh one-shot session vs 1.3 s inside a bench
    session where an earlier register_views caller had already sized the
    config. The driver's one-shot correctness runs are exactly that fresh
    session."""
    if getattr(spark, "_graft_conf_sf_dir", None) != sf_dir:
        configure_for_corpus(spark, sf_dir)
        spark._graft_conf_sf_dir = sf_dir
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TESTDATA_TABLES}


# largest fact-table parquet size above which the corpus is "at scale":
# per-stage CPU then outweighs per-task scheduling and AQE's runtime
# re-planning starts earning its job rounds. The r10 threshold (4 MB) put
# the 10x replica corpus (~25 MB facts) into AQE mode, where EVERY exchange
# materializes as its own scheduled job over shuffles of a few MB — an
# interleaved A/B at sf1 (same queries, same session policy) measures
# 0.2-0.5 s of pure job-round overhead per small multi-stage query with no
# compensating re-planning win (there is nothing to coalesce or skew-split
# in a 5 MB shuffle). AQE's features price in when a single shuffle is big
# enough to have sizing problems — hundreds of MB — so the default crossover
# is 256 MB of largest fact table: below it, a size-derived STATIC partition
# count (8 per 8 MB of fact data, cores-capped) keeps partitions in the
# tens-of-MB range the tuning guide targets without per-exchange jobs;
# above it, AQE + advisory sizing + skew joins take over (the 100 TB
# features). Env-tunable for deployments whose scheduling/network economics
# differ: SPARK_GRAFT_SCALE_MODE_MIN_BYTES.
_SCALE_MODE_MIN_BYTES = int(
    os.environ.get("SPARK_GRAFT_SCALE_MODE_MIN_BYTES", str(256 << 20))
)


def _row_group_open_cost(sf_dir: str) -> int:
    """Average row-group byte size of the largest fact table, clamped to
    [256 KB, 4 MB] — the openCost that makes Spark's maxSplitBytes land on
    row-group boundaries (splits track row groups, per the optimization
    guide's file-layout rule). Falls back to the 4 MB coarse default when
    the footer can't be read."""
    try:
        import pyarrow.parquet as pq

        path = max(
            (
                os.path.join(sf_dir, f"{t}.parquet")
                for t in ("events", "documents", "embeddings")
                if os.path.exists(os.path.join(sf_dir, f"{t}.parquet"))
            ),
            key=os.path.getsize,
        )
        meta = pq.ParquetFile(path).metadata
        avg_rg = os.path.getsize(path) // max(1, meta.num_row_groups)
        return max(256 << 10, min(4 << 20, avg_rg))
    except Exception:
        return 4 << 20


def configure_for_corpus(spark: SparkSession, sf_dir: str) -> None:
    """Size shuffle coalescing and scan splits to the corpus, once per
    (session, corpus).

    At-scale corpora get 2 MB advisory post-shuffle partitions (the 64 MB
    default coalesces a ~25 MB CPU-heavy pre-window shuffle to ONE
    partition, serializing the sort on one core of 32 — measured 3x on the
    sf1 window/selection family) and a 256 KB file-open cost so splits
    track row groups instead of flooring single-digit-MB files at 1-3
    splits. Small corpora keep Spark's defaults: fixed cost dominates and
    coarse stages win there. An IO-bound multi-executor cluster should
    override both after its session is built — this helper tunes the
    single-node CPU-heavy profile the engine is benched on.
    """
    # judge scale by the FACT tables the workload actually scales on
    # (events/documents/embeddings — the replicated axes of
    # make_scale_corpus); the static TPC-H side tables are the same size
    # at every scale factor and would misclassify sf0.1 as at-scale
    try:
        largest = max(
            os.path.getsize(os.path.join(sf_dir, f"{t}.parquet"))
            for t in ("events", "documents", "embeddings")
            if os.path.exists(os.path.join(sf_dir, f"{t}.parquet"))
        )
    except ValueError:
        return
    # remember the session's build-time parallelism so the at-scale branch
    # can restore it after a small-corpus run in the same session (bench
    # runs sf0.1 then the sf1 replica). build_session pins this attribute
    # eagerly at construction (r10 ADVICE); this first-call capture is only
    # the fallback for caller-supplied vanilla sessions (the driver's gate)
    if not hasattr(spark, "_graft_default_shuffle_partitions"):
        spark._graft_default_shuffle_partitions = spark.conf.get(
            "spark.sql.shuffle.partitions"
        )
    if largest >= _SCALE_MODE_MIN_BYTES:
        spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "2MB")
        spark.conf.set("spark.sql.files.openCostInBytes", str(256 * 1024))
        spark.conf.set("spark.sql.adaptive.enabled", "true")
        spark.conf.set(
            "spark.sql.shuffle.partitions",
            spark._graft_default_shuffle_partitions,
        )
    else:
        spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "64MB")
        # openCost sized to the corpus's ROW-GROUP granularity: parquet
        # byte-range splits only parallelize down to row groups, so the
        # useful split floor is the average row-group size of the largest
        # fact table (events — the scaling axis). A single-row-group
        # corpus (the sf<=0.1 test data) then gets ONE split per file —
        # finer splitting there only adds empty task rounds (the r11
        # coarse-mode rationale) — while a multi-row-group replica (the
        # 10x corpus: 32 events / 13 documents row groups) gets one task
        # per row group, which the CPU-heavy scan queries need (measured
        # at the 10x replica, same-session A/B: bssid_format_filter 2.0 s
        # -> 0.6 s, codec/event_dedup/timestamp each -0.2-1.2 s vs the
        # fixed 4 MB openCost that floored those scans at 2-6 splits).
        # Clamped to [256 KB, 4 MB]: the r10/r11 endpoints.
        spark.conf.set(
            "spark.sql.files.openCostInBytes",
            os.environ.get(
                "SPARK_GRAFT_SMALL_OPENCOST", str(_row_group_open_cost(sf_dir))
            ),
        )
        # Below the scale threshold the AQE machinery is pure overhead:
        # each exchange materializes as its OWN scheduled job (a 2-shuffle
        # query pays 3-4 job rounds), and runtime coalescing/skew handling
        # have nothing to do on single-digit-MB inputs. Interleaved A/B at
        # sf0.1 (same session, best-of-2 per mode): AQE off saves ~0.04 s
        # and 8 static shuffle partitions save ~0.05-0.1 s per sub-second
        # query, with no heavy-family regression. At-scale corpora keep
        # AQE on — skew joins and runtime re-planning are 100 TB features,
        # and the sf1 replica crosses the threshold.
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        # size-derived static partition count: 8 below 32 MB of facts
        # (fixed cost dominates), growing one partition per 4 MB beyond so
        # per-partition shuffle data stays in the low-MB range, capped at
        # the session's core count. Each reduce task costs ~8-12 ms of
        # scheduling in local mode (micro-bench: a 50-group aggregate over
        # the 10x replica runs 0.33/0.29/0.45/0.58 s at 1/4/20/32 static
        # partitions), so the derived count errs low. Two interleaved A/Bs
        # at the replica anchor the endpoints: 2 partitions/MB (40 -> 32)
        # LOST on the shuffle-bound family (dedup_clusters 2.04 -> 2.39 s,
        # retention_cohorts 0.71 -> 1.01, minhash 1.59 -> 1.75 best-of-3),
        # and the r11 1/MB value (20) lost to 8 everywhere it was re-A/B'd
        # (best-of-2 interleaved: minhash 1.57 -> 1.22, strategy_agreement
        # 2.47 -> 1.98, simhash 1.74 -> 1.49, substring 1.35 -> 1.06,
        # session_window 0.65 -> 0.52; scan-agg tail -0.1 to -0.3 each;
        # only embedding_cosine +0.12, within noise). Python-kernel stages
        # that need cores-level fan-out request it explicitly at their
        # repartition sites (codec, localization, the spread view) and are
        # unaffected. Deployments can pin SPARK_GRAFT_SMALL_SHUFFLE_PARTS
        # to override the derived count.
        parts_env = os.environ.get("SPARK_GRAFT_SMALL_SHUFFLE_PARTS")
        parts = (
            int(parts_env)
            if parts_env
            else max(
                8, min(int(largest >> 22), spark.sparkContext.defaultParallelism)
            )
        )
        spark.conf.set("spark.sql.shuffle.partitions", str(parts))


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every test table as a temp view for spark.sql queries.

    Idempotent per (session, sf_dir): every registry query calls this, and
    re-reading ten parquet footers per query adds a constant planning tax
    across the 50+ query suite."""
    registered = getattr(spark, "_graft_views_sf_dir", None)
    if registered == sf_dir:
        return
    configure_for_corpus(spark, sf_dir)
    for name in TESTDATA_TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
    spark._graft_views_sf_dir = sf_dir
