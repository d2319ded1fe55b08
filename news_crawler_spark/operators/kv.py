"""KV latest-value cache with TTL (SURVEY.md K6).

Reference: the TGJU price collector polls currency/gold/coin prices and
caches the latest value per symbol in Redis with an expiry
(collectors/tgju_collector.py:96-108, redis_cache_manager.py:24-40
``set(key, value, ex=ttl)``) so readers always see "the latest price,
unless stale".

Spark restatement: the cache is a snapshot TABLE, not a server —

- ``upsert_latest``: price observations → one row per key holding the
  newest (ts, value). ``max_by(struct(payload), struct(ts, tiebreak))``
  aggregate: map-side combine keeps one candidate per key per partition,
  so the shuffle carries |keys| rows, not |observations| (same pattern as
  seen_set.dedup_first_wins — never a window). Deterministic tie-break on
  equal ts (larger observation id wins = last-write-wins analog).
- ``merge_latest``: fold a new observation batch into an existing cache
  snapshot (the per-poll MERGE; at scale an Iceberg MERGE INTO keyed by
  the symbol).
- ``valid_at``: the TTL read-side filter — Redis expiry restated as
  ``ts >= as_of - ttl`` (expiry enforced at read, the snapshot keeps
  history of nothing: one row per key).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def upsert_latest(
    obs: DataFrame,
    key: str = "symbol",
    ts_col: str = "ts",
    tiebreak: str | None = None,
) -> DataFrame:
    """Observations → latest row per key (the KV PUT, batched)."""
    cols = obs.columns
    order = [F.col(ts_col)] + ([F.col(tiebreak)] if tiebreak else [])
    pick = F.max_by(F.struct(*cols), F.struct(*order)).alias("__r")
    return obs.groupBy(key).agg(pick).select("__r.*")


def merge_latest(
    cache: DataFrame,
    batch: DataFrame,
    key: str = "symbol",
    ts_col: str = "ts",
    tiebreak: str | None = None,
) -> DataFrame:
    """Fold a new batch into the cache snapshot: per key, keep whichever
    side is newer (ties → the batch, last-write-wins like Redis SET).

    The LWW guarantee is enforced with an internal origin flag (cache=0,
    batch=1) as the FINAL tie-break key — without it, ``max_by`` over
    equal (ts, tiebreak) tuples picks nondeterministically between the
    cache row and the batch re-write of the same value's key.
    """
    cols = cache.columns
    tagged = cache.withColumn("__origin", F.lit(0)).unionByName(
        batch.withColumn("__origin", F.lit(1))
    )
    order = (
        [F.col(ts_col)]
        + ([F.col(tiebreak)] if tiebreak else [])
        + [F.col("__origin")]
    )
    pick = F.max_by(F.struct(*cols), F.struct(*order)).alias("__r")
    return tagged.groupBy(key).agg(pick).select("__r.*")


def valid_at(
    cache: DataFrame,
    as_of: Column,
    ttl_seconds: int,
    ts_col: str = "ts",
) -> DataFrame:
    """TTL read filter: entries older than ``ttl_seconds`` at ``as_of``
    are expired (Redis ``ex=`` restated declaratively)."""
    return cache.filter(
        F.col(ts_col) >= as_of - F.expr(f"INTERVAL {int(ttl_seconds)} SECONDS")
    )
