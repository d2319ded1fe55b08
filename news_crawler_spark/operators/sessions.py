"""Gap-based sessionization — group a key's event stream into sessions
split wherever the inter-event gap exceeds a threshold.

Reference justification: the reference's fresh-links scheduler reasons
about per-source crawl "visits" by wall-clock proximity (its Prometheus
rate windows, news_fresh_links_scheduler.py:29-68); sessionization is the
batch restatement every event pipeline needs — per-user/host activity
sessions, crawl bursts per source, rate-limit episodes.

Plan shape: ONE shuffle on the key, then two window passes over the same
(key, ts, tiebreak) sort order — Catalyst fuses them into a single
Window operator chain with one sort:

1. ``lag`` of the truncated-second timestamp → a 0/1 "new session" flag
   wherever the gap exceeds ``gap_seconds`` (or no predecessor);
2. a running sum of that flag → the session ordinal per key.

Skew note: one key's whole history sorts inside one task. Unlike the
as-of join, sessions cannot be time-bucketed without a boundary-merge
pass (a session may straddle any bucket edge), so for a pathological key
(one user = 10% of events) pre-split by a coarse period and stitch
sessions whose gap spans the boundary — not implemented here because the
frontier/user keys this engine sees are politeness-bounded per round.

Gap semantics are whole-second (timestamps truncate before differencing)
so the a8 DuckDB oracle replays them exactly — events.ts carries
microseconds and IEEE/epoch-fraction arithmetic would diverge.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["sessionize"]


def sessionize(
    events: DataFrame,
    key: str = "user_id",
    ts_col: str = "ts",
    gap_seconds: int = 1800,
    tiebreak: str | None = None,
    out_col: str = "session_no",
) -> DataFrame:
    """Events + ``out_col``: 1-based session ordinal per key, split where
    the whole-second gap to the previous event exceeds ``gap_seconds``.
    ``tiebreak`` pins the order of equal timestamps (required for a
    deterministic split when gaps touch the threshold at equal ts)."""
    order = [F.col(ts_col)] + ([F.col(tiebreak)] if tiebreak else [])
    w = Window.partitionBy(key).orderBy(*order)
    tl = F.col(ts_col).cast("timestamp").cast("long")
    prev = F.lag(tl).over(w)
    is_new = F.when(
        prev.isNull() | (tl - prev > int(gap_seconds)), F.lit(1)
    ).otherwise(F.lit(0))
    running = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return events.withColumn(
        out_col, F.sum(is_new).over(running).cast("long")
    )
