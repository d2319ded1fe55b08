"""Temporal joins Spark lacks as built-ins: as-of join and range join.

Reference justification: the reference does point-in-time lookups against
its Redis price cache — "the latest TGJU quote known when this row is
processed" (collectors/tgju_collector.py:96-108, redis_cache_manager.py:
24-40). Restated over tables that is the AS-OF join: for every probe row,
the newest quote with ``quote_ts <= probe_ts`` on the same key (the k1
price-cache gate covers the single-as-of-instant special case; this
operator covers the general per-row case). The RANGE join is the dual
shape the outage detector implies (SURVEY.md A5: which fetch events fall
inside a detected outage window) — match points to the intervals that
contain them.

Why not just ``probes.join(quotes, key AND qts <= pts)`` + argmax?
Catalyst plans a non-equi join as BroadcastNestedLoopJoin or
CartesianProduct — O(|probes|·|quotes|) comparisons per key. Both
operators here reduce to equi-shuffles + sorts:

- :func:`asof_join` — union-tag-window. Quotes and probes are unioned on
  the key, sorted once per key partition by ``(ts, side, tiebreak)``, and
  the match is a running ``last(quote, ignorenulls=True)``. ONE shuffle
  per side, no range explosion, sort-based so it spills gracefully. The
  limit: a hot key serializes inside one task — hence
- :func:`asof_join_bucketed` — the 100 TB path. Rows are hashed into
  ``(key, time_bucket)`` partitions so a hot key parallelizes across its
  time range; each bucket's window is seeded with a carry-in quote (the
  newest quote from any earlier bucket), computed by a second window over
  BUCKET SUMMARIES only (``|keys × buckets|`` rows — thousands, not
  billions). Result is row-identical to :func:`asof_join` (property-
  tested in tests/test_joins.py).
- :func:`range_join_bucketed` — intervals explode into every time bucket
  they cover, points land in exactly ONE bucket, so the bucket equi-join
  emits each qualifying (point, interval) pair at most once — no dedup
  pass — and the exact containment predicate is re-checked inside the
  join. Cost is O(|points| + Σ interval_len/bucket); pick
  ``bucket_seconds`` near the median interval length.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["asof_join", "asof_join_bucketed", "range_join_bucketed"]


def _keys(on: str | list[str]) -> list[str]:
    return [on] if isinstance(on, str) else list(on)


def _epoch(c: Column) -> Column:
    """Whole-second epoch of a TIMESTAMP or TIMESTAMP_NTZ column (NTZ
    reads as session-tz, which this engine pins to UTC — session.py)."""
    return c.cast("timestamp").cast("long")


def _quote_side(
    quotes: DataFrame,
    keys: list[str],
    quote_ts: str,
    quote_tiebreak: str | None,
) -> tuple[DataFrame, list[str]]:
    """Quotes reshaped to (keys, __ts, __tb, __side=0, __q=struct(payload)).

    Payload keeps EVERY non-key quote column (incl. the timestamp) so the
    caller gets the matched quote verbatim. With duplicate (key, ts)
    quotes the match is the one with the LARGEST tiebreak (deterministic
    last-write-wins, like kv.merge_latest); without a tiebreak, callers
    must guarantee (key, ts) uniqueness on the quote side.
    """
    payload = [c for c in quotes.columns if c not in keys]
    tb = F.col(quote_tiebreak) if quote_tiebreak else F.lit(0)
    q = quotes.select(
        *keys,
        F.col(quote_ts).alias("__ts"),
        tb.cast("long").alias("__tb"),
        F.lit(0).alias("__side"),
        F.struct(*payload).alias("__q"),
    )
    return q, payload


def _probe_side(probes: DataFrame, probe_ts: str) -> DataFrame:
    reserved = {"__ts", "__tb", "__side", "__q", "__bkt", "__pos", "__m"}
    clash = reserved & set(probes.columns)
    if clash:
        raise ValueError(f"probe columns clash with internals: {clash}")
    return probes.select(
        *probes.columns,
        F.col(probe_ts).alias("__ts"),
        # probes sort AFTER quotes at equal ts (inclusive <=) and after
        # every tiebreak value a quote could carry
        F.lit(2**63 - 1).alias("__tb"),
        F.lit(1).alias("__side"),
    )


def _emit(
    matched: DataFrame,
    probe_cols: list[str],
    payload: list[str],
    quote_ts: str,
    tolerance_seconds: int | None,
    prefix: str,
) -> DataFrame:
    m = F.col("__m")
    if tolerance_seconds is not None:
        # a match older than the tolerance window is NO match
        fresh = _epoch(F.col(f"__m.{quote_ts}")) >= (
            _epoch(F.col("__ts")) - F.lit(int(tolerance_seconds))
        )
        m = F.when(fresh, F.col("__m"))
    out = matched.withColumn("__m", m)
    return out.select(
        *probe_cols, *[F.col(f"__m.{c}").alias(prefix + c) for c in payload]
    )


def asof_join(
    probes: DataFrame,
    quotes: DataFrame,
    on: str | list[str],
    probe_ts: str = "ts",
    quote_ts: str = "ts",
    tolerance_seconds: int | None = None,
    quote_tiebreak: str | None = None,
    prefix: str = "q_",
) -> DataFrame:
    """Backward as-of join: each probe row gains the newest quote with
    ``quote_ts <= probe_ts`` on the same key (NULLs when none, or when
    the newest one is older than ``tolerance_seconds``).

    Union-tag-window plan: one shuffle per side on the key, one sort per
    key partition, zero range comparisons. Quote payload columns come
    back ``prefix``-renamed. Hot single keys serialize — use
    :func:`asof_join_bucketed` when one key dominates.
    """
    keys = _keys(on)
    q, payload = _quote_side(quotes, keys, quote_ts, quote_tiebreak)
    p = _probe_side(probes, probe_ts)
    u = p.unionByName(q, allowMissingColumns=True)
    w = (
        Window.partitionBy(*keys)
        .orderBy("__ts", "__side", "__tb")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = u.withColumn("__m", F.last("__q", ignorenulls=True).over(w)).filter(
        F.col("__side") == 1
    )
    return _emit(matched, probes.columns, payload, quote_ts, tolerance_seconds, prefix)


def asof_join_bucketed(
    probes: DataFrame,
    quotes: DataFrame,
    on: str | list[str],
    bucket_seconds: int,
    probe_ts: str = "ts",
    quote_ts: str = "ts",
    tolerance_seconds: int | None = None,
    quote_tiebreak: str | None = None,
    prefix: str = "q_",
) -> DataFrame:
    """:func:`asof_join` with time-bucketed parallelism — row-identical
    output, but windows partition on ``(key, floor(ts / bucket_seconds))``
    so a hot key's work spreads across its time range.

    Carry-in: each bucket's window is seeded with the newest quote from
    any EARLIER bucket, computed by (1) ``max_by`` per (key, bucket) —
    map-side combinable, shuffles one row per populated bucket — then
    (2) a running ``last(ignorenulls)`` over the per-key bucket timeline
    (a frame of |keys × buckets| summary rows, the only per-key serial
    step). Carry rows enter each bucket's sort with ``__pos = 0`` so they
    order before every real row regardless of timestamp.
    """
    keys = _keys(on)
    bkt = lambda ts: F.floor(  # noqa: E731 — local, used twice
        _epoch(F.col(ts)) / F.lit(int(bucket_seconds))
    ).alias("__bkt")

    q, payload = _quote_side(quotes, keys, quote_ts, quote_tiebreak)
    q = q.withColumn("__bkt", bkt("__ts"))
    p = _probe_side(probes, probe_ts).withColumn("__bkt", bkt("__ts"))

    # (1) newest quote per populated (key, bucket)
    last_q = q.groupBy(*keys, "__bkt").agg(
        F.max_by("__q", F.struct("__ts", "__tb")).alias("__q")
    )
    # (2) carry-in per bucket that holds ANY probe or quote
    timeline = (
        p.select(*keys, "__bkt")
        .distinct()
        .unionByName(last_q.select(*keys, "__bkt"))
        .distinct()
        .join(last_q, [*keys, "__bkt"], "left")
    )
    wprev = (
        Window.partitionBy(*keys)
        .orderBy("__bkt")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    carry = (
        timeline.withColumn("__q", F.last("__q", ignorenulls=True).over(wprev))
        .filter(F.col("__q").isNotNull())
        .select(
            *keys,
            "__bkt",
            F.lit(0).alias("__pos"),
            # __ts intentionally absent (null after unionByName): carry
            # rows order FIRST via __pos, so their timestamp is never read
            F.lit(-1).cast("long").alias("__tb"),
            F.lit(0).alias("__side"),
            "__q",
        )
    )

    u = (
        p.withColumn("__pos", F.lit(1))
        .unionByName(q.withColumn("__pos", F.lit(1)), allowMissingColumns=True)
        .unionByName(carry, allowMissingColumns=True)
    )
    w = (
        Window.partitionBy(*keys, "__bkt")
        .orderBy("__pos", "__ts", "__side", "__tb")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = u.withColumn("__m", F.last("__q", ignorenulls=True).over(w)).filter(
        F.col("__side") == 1
    )
    return _emit(matched, probes.columns, payload, quote_ts, tolerance_seconds, prefix)


def range_join_bucketed(
    points: DataFrame,
    intervals: DataFrame,
    bucket_seconds: int,
    on: str | list[str] | None = None,
    point_ts: str = "ts",
    start_col: str = "start_ts",
    end_col: str = "end_ts",
    closed: str = "both",
    prefix: str = "i_",
) -> DataFrame:
    """Containment join: every (point, interval) pair with
    ``start <= ts <= end`` (``closed='both'``) or ``start <= ts < end``
    (``closed='left'``), optionally also equi-matched on ``on``.

    Plan: intervals explode into the time buckets they cover
    (``F.sequence`` — one row per covered bucket), points get their single
    bucket, and the match is a plain equi-join on (keys, bucket) with the
    exact predicate re-checked inside — SortMergeJoin/BroadcastHashJoin,
    never BroadcastNestedLoop. Each pair appears at most once because a
    point has exactly one bucket. Interval columns come back
    ``prefix``-renamed.
    """
    if closed not in ("both", "left"):
        raise ValueError("closed must be 'both' or 'left'")
    keys = _keys(on) if on is not None else []
    width = int(bucket_seconds)

    payload = [c for c in intervals.columns if c not in keys]
    iv = intervals.select(
        *keys, *[F.col(c).alias(prefix + c) for c in payload]
    ).withColumn(
        "__bkt",
        F.explode(
            F.sequence(
                F.floor(_epoch(F.col(prefix + start_col)) / width),
                F.floor(_epoch(F.col(prefix + end_col)) / width),
            )
        ),
    )
    pt = points.withColumn(
        "__bkt", F.floor(_epoch(F.col(point_ts)) / width)
    )
    ts, lo, hi = F.col(point_ts), F.col(prefix + start_col), F.col(prefix + end_col)
    exact = (ts >= lo) & ((ts <= hi) if closed == "both" else (ts < hi))
    return pt.join(iv, [*keys, "__bkt"]).filter(exact).drop("__bkt")
