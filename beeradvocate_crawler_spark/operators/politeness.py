"""Robots compliance + per-host politeness token bucket + top-k
admission (SURVEY.md §2 A10/A11/A12).

All decisions are functions of table state and the round index only —
never wall-clock or task scheduling — which is what makes admission
deterministic and cluster-size-invariant (§4.2).  Semantics mirror
oracle.crawl step-for-step (that equivalence is the e2e differential
test).

Physical notes for the 100 TB case:
- the rules table is tiny per host and broadcast into the blocking join;
- the admission window partitions by host — the single hot host
  (ba.example by construction) makes this one fat partition.  The
  quota cap bounds it: only PENDING rows compete, and the window's
  input is pre-filtered to hosts with tokens, so the sort is
  O(pending-per-host), not O(frontier).  AQE skew-join handles the
  fetch side; parse-side salting happens in plans/crawl.py (A14).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .links import path_query_expr
from .ordering import order_key

TOKEN_BURST_FACTOR = 2.0


def mark_robots_blocked(
    pending: DataFrame, host_state: DataFrame, rules: DataFrame | None
) -> DataFrame:
    """URLs of PENDING non-robots rows on robots-known hosts that the
    host's rules disallow (longest-prefix wins; tie -> Allow)."""
    known = host_state.filter(F.col("robots_done")).select("host")
    cand = (
        pending.filter(F.col("page_type") != "robots")
        .join(F.broadcast(known), "host")
        .select("url", "host", path_query_expr(F.col("url")).alias("pq"))
    )
    if rules is None:
        return cand.select("url").limit(0)
    matched = cand.join(
        F.broadcast(rules), on=["host"], how="inner"
    ).where(F.col("pq").startswith(F.col("prefix")))
    w = Window.partitionBy("url").orderBy(
        F.length("prefix").desc(), F.col("allow").desc()
    )
    decided = (
        matched.withColumn("rn", F.row_number().over(w))
        .where((F.col("rn") == 1) & (~F.col("allow")))
        .select("url")
    )
    return decided


def admit(
    pending: DataFrame,
    host_state: DataFrame,
    round_seconds: int,
) -> tuple[DataFrame, DataFrame]:
    """One round of token-bucket admission.

    Returns (admitted rows, host token/refill updates).  Candidates per
    host are its robots row(s) until robots_done, else all pending rows;
    hosts WITHOUT candidates this round do not refill (oracle parity).
    """
    cand = pending.join(
        F.broadcast(host_state.select("host", "tokens", "crawl_delay", "robots_done")),
        "host",
    ).where(F.col("robots_done") | (F.col("page_type") == "robots"))

    refill = F.lit(float(round_seconds)) / F.col("crawl_delay")
    budgets = (
        cand.groupBy("host")
        .agg(
            F.count("*").alias("n_cand"),
            F.first("tokens").alias("tokens"),
            F.first("crawl_delay").alias("crawl_delay"),
        )
        .withColumn(
            "tokens_refilled",
            F.least(F.lit(TOKEN_BURST_FACTOR) * refill, F.col("tokens") + refill),
        )
        .withColumn("quota", F.floor("tokens_refilled").cast("int"))
    )

    w = Window.partitionBy("host").orderBy(*order_key(cand))
    admitted = (
        cand.join(F.broadcast(budgets.select("host", "quota")), "host")
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= F.col("quota"))
        .drop("rn", "quota", "tokens", "crawl_delay", "robots_done")
    )
    spent = admitted.groupBy("host").agg(F.count("*").alias("n_admitted"))
    host_updates = (
        budgets.join(spent, "host", "left")
        .withColumn(
            "tokens_after",
            F.col("tokens_refilled") - F.coalesce(F.col("n_admitted"), F.lit(0)),
        )
        .select("host", "tokens_after")
    )
    return admitted, host_updates
