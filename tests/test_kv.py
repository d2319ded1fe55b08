"""K6 KV latest-value cache: upsert/merge/TTL semantics vs plain dicts."""

from datetime import datetime, timedelta

from pyspark.sql import functions as F

from news_crawler_spark.operators import kv

T0 = datetime(2024, 6, 1, 12, 0, 0)


def _obs(spark, rows):
    return spark.createDataFrame(
        rows, "symbol string, price double, ts timestamp, obs_id long"
    )


def test_upsert_latest_keeps_newest_per_key(spark):
    df = _obs(spark, [
        ("usd", 1.0, T0, 1),
        ("usd", 2.0, T0 + timedelta(seconds=5), 2),
        ("gold", 9.0, T0, 3),
        ("gold", 8.0, T0 - timedelta(seconds=5), 4),   # older → loses
        ("usd", 3.0, T0 + timedelta(seconds=5), 5),    # ts tie → obs_id 5 wins
    ])
    got = {r.symbol: (r.price, r.obs_id)
           for r in kv.upsert_latest(df, tiebreak="obs_id").collect()}
    assert got == {"usd": (3.0, 5), "gold": (9.0, 3)}


def test_merge_latest_is_last_write_wins(spark):
    cache = kv.upsert_latest(_obs(spark, [("usd", 1.0, T0, 1)]), tiebreak="obs_id")
    batch = _obs(spark, [
        ("usd", 5.0, T0 + timedelta(seconds=30), 2),   # newer → replaces
        ("btc", 7.0, T0, 3),                            # new key → inserted
    ])
    got = {r.symbol: r.price
           for r in kv.merge_latest(cache, batch, tiebreak="obs_id").collect()}
    assert got == {"usd": 5.0, "btc": 7.0}
    # stale batch must NOT clobber a newer cache entry
    stale = _obs(spark, [("usd", 0.5, T0 - timedelta(hours=1), 4)])
    cache2 = kv.merge_latest(cache, stale, tiebreak="obs_id")
    assert {r.symbol: r.price for r in cache2.collect()} == {"usd": 1.0}


def test_merge_equal_ts_batch_wins(spark):
    """Redis SET semantics: a batch write at exactly the cached ts must
    deterministically replace the cache row (origin flag breaks the tie;
    without it max_by picks arbitrarily between equal tuples)."""
    cache = kv.upsert_latest(_obs(spark, [("usd", 1.0, T0, 7)]), tiebreak="obs_id")
    batch = _obs(spark, [("usd", 2.0, T0, 7)])  # same ts, same obs_id
    got = kv.merge_latest(cache, batch, tiebreak="obs_id").collect()
    assert [(r.symbol, r.price) for r in got] == [("usd", 2.0)]
    # and with no tiebreak column at all
    got2 = kv.merge_latest(cache, batch).collect()
    assert [(r.symbol, r.price) for r in got2] == [("usd", 2.0)]


def test_ttl_expiry(spark):
    cache = kv.upsert_latest(_obs(spark, [
        ("usd", 1.0, T0, 1),
        ("gold", 2.0, T0 - timedelta(seconds=120), 2),
    ]), tiebreak="obs_id")
    fresh = kv.valid_at(cache, F.lit(T0 + timedelta(seconds=30)), ttl_seconds=60)
    assert {r.symbol for r in fresh.collect()} == {"usd"}   # gold expired
    all_fresh = kv.valid_at(cache, F.lit(T0), ttl_seconds=600)
    assert all_fresh.count() == 2


def test_price_feed_through_cache(spark):
    """K7-style end-to-end: the synthetic TGJU price feed folds into the
    cache as latest-per-symbol, matching a pure-python fold of the same
    deterministic observations."""
    from news_crawler_spark import synth

    obs = synth.price_observations(spark, polls=8)
    first = obs.filter(F.col("obs_id") < 4 * len(synth.PRICE_SYMBOLS))
    rest = obs.filter(F.col("obs_id") >= 4 * len(synth.PRICE_SYMBOLS))
    cache = kv.merge_latest(
        kv.upsert_latest(first, tiebreak="obs_id"), rest, tiebreak="obs_id"
    )
    got = {r.symbol: (r.price, r.ts) for r in cache.collect()}
    want = {}
    for p in range(8):
        for s in synth.PRICE_SYMBOLS:
            r = synth.price_row(s, p)
            if s not in want or r["ts"] > want[s][1]:
                want[s] = (r["price"], r["ts"])
    assert got == want and len(got) == len(synth.PRICE_SYMBOLS)
    # TTL: at the last poll + 1h every entry is stale at ttl=30min
    last_ts = max(ts for _, ts in want.values())
    from datetime import timedelta
    stale = kv.valid_at(cache, F.lit(last_ts + timedelta(hours=1)), ttl_seconds=1800)
    assert stale.count() == 0
