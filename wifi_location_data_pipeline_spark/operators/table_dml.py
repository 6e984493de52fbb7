"""Row-level table mutation emulated over parquet (SURVEY.md §2.1 Iceberg DML).

The reference mutates its Iceberg table with UPDATE (outlier flags, CASE per
event_id), DELETE (outliers / hotspot BSSIDs), and upserts the AP dimension
via DynamoDB batch puts → MERGE semantics (table schema doc :111-143).

This container ships no Delta/Iceberg jars, so the engine expresses the same
*logical* DML as join-based DataFrame rewrites; on a lakehouse deployment each
function body becomes the corresponding MERGE INTO / UPDATE / DELETE statement
(merge-on-read, day-partition pruned) without changing call sites.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def update_columns_by_key(
    target: DataFrame, updates: DataFrame, key_cols: list[str], update_cols: list[str]
) -> DataFrame:
    """UPDATE target SET col = updates.col WHERE key matches.

    Rows without a match keep their original values (left join + coalesce-free
    replacement only on matched rows).
    """
    upd = updates.select(
        *key_cols, *[F.col(c).alias(f"_new_{c}") for c in update_cols]
    ).withColumn("_matched", F.lit(True))
    joined = target.join(upd, key_cols, "left")
    out = joined
    for c in update_cols:
        out = out.withColumn(
            c, F.when(F.col("_matched"), F.col(f"_new_{c}")).otherwise(F.col(c))
        ).drop(f"_new_{c}")
    return out.drop("_matched")


def delete_by_key(target: DataFrame, keys: DataFrame, key_cols: list[str]) -> DataFrame:
    """DELETE FROM target WHERE key IN keys — anti-join."""
    return target.join(F.broadcast(keys.select(*key_cols).distinct()), key_cols, "left_anti")


def merge_upsert(
    target: DataFrame, source: DataFrame, key_cols: list[str]
) -> DataFrame:
    """MERGE INTO target USING source: matched → replace row, not matched → insert.

    Column sets must match (conform first). The anti-join + union shape is the
    standard lakehouse-free emulation; Delta/Iceberg replaces it with a real
    MERGE for transactional row-level updates.
    """
    missing = set(target.columns) ^ set(source.columns)
    if missing:
        raise ValueError(f"merge_upsert schema mismatch on: {sorted(missing)}")
    kept = target.join(source.select(*key_cols).distinct(), key_cols, "left_anti")
    return kept.unionByName(source.select(*target.columns))
