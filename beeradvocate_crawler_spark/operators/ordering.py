"""Deterministic global ordering / crawl-order ledger (SURVEY.md §2 A12/A20).

The batch order is a TOTAL order — (-priority, depth, parent_ord,
link_pos, url) — with a full tie-break chain, so no hash-partition
iteration order can leak into results (§4.2).  Two physical
strategies:

- small batch (the common, politeness-bounded case): one-task window
  sort.  A round's batch is bounded by the politeness budget, so this
  is NOT a scale hazard: 10^10 frontier rows never sort globally, only
  the admitted batch does.
- big batch: two-phase range-partitioned rank — sort within range
  partitions, then offset each partition by the total count of rows in
  lower ranges.  Partition boundaries come from sampling and are not
  themselves deterministic, but the produced RANK is a pure function
  of the total order, so outputs stay parallelism-invariant.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

ORDER_COLS = ["priority", "depth", "parent_ord", "link_pos", "url"]


def order_key(df: DataFrame) -> list:
    return [
        F.col("priority").desc(),
        F.col("depth").asc(),
        F.col("parent_ord").asc(),
        F.col("link_pos").asc(),
        F.col("url").asc(),
    ]


def with_global_rank(
    df: DataFrame,
    start_rank: int,
    batch_rows: int,
    big_batch_threshold: int = 1 << 20,
    n_range_partitions: int = 64,
) -> DataFrame:
    """Adds ``rank`` = start_rank + position in the total order."""
    key = order_key(df)
    if batch_rows <= big_batch_threshold:
        w = Window.orderBy(*key)
        return df.withColumn(
            "rank", (F.row_number().over(w) - 1 + F.lit(start_rank)).cast("long")
        )
    # two-phase: range partition on the order key, local sort, offset by
    # cumulative lower-partition counts (collects n_range_partitions ints)
    d = (
        df.repartitionByRange(
            n_range_partitions,
            F.col("priority").desc(),
            "depth",
            "parent_ord",
            "link_pos",
            "url",
        )
        .withColumn("_pid", F.spark_partition_id())
        .persist()
    )
    counts = {r["_pid"]: r["cnt"] for r in d.groupBy("_pid").agg(F.count("*").alias("cnt")).collect()}
    offsets, acc = {}, 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]
    off = F.create_map(*[F.lit(x) for kv in offsets.items() for x in kv])
    w = Window.partitionBy("_pid").orderBy(*key)
    out = d.withColumn(
        "rank",
        (
            F.row_number().over(w) - 1 + off[F.col("_pid")] + F.lit(start_rank)
        ).cast("long"),
    ).drop("_pid")
    return out
