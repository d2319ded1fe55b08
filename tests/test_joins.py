"""operators/joins.py — as-of and range joins vs a pure-Python oracle,
plus the load-bearing equivalence: the time-bucketed as-of (the 100 TB
path) must be row-identical to the plain union-tag-window form for every
bucket width."""

import datetime as dt
import hashlib

import pytest
from pyspark.sql import functions as F

from news_crawler_spark.operators import joins

EPOCH = dt.datetime(2024, 1, 1)


def _t(seconds: float) -> dt.datetime:
    return EPOCH + dt.timedelta(seconds=seconds)


def _h(s: str, mod: int) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16) % mod


def _mk_frames(spark, n_quotes=120, n_probes=200, keys=("a", "b", "c")):
    """Deterministic synthetic quotes/probes: md5-spread timestamps over
    ~1 h, duplicate (key, ts) quotes planted every 10th quote to exercise
    the tiebreak, one key ('c') probe-only."""
    quotes = []
    for i in range(n_quotes):
        k = keys[_h(f"qk{i}", len(keys) - 1)]  # never 'c'
        ts = _h(f"qt{i}", 3600)
        quotes.append((k, _t(ts), float(i), i))
        if i % 10 == 0:  # duplicate (key, ts), larger qid must win
            quotes.append((k, _t(ts), float(i) + 0.5, i + 100000))
    probes = [
        (keys[_h(f"pk{i}", len(keys))], _t(_h(f"pt{i}", 3700)), i)
        for i in range(n_probes)
    ]
    q = spark.createDataFrame(quotes, "k string, ts timestamp, px double, qid long")
    p = spark.createDataFrame(probes, "k string, ts timestamp, pid long")
    return q, p, quotes, probes


def _py_asof(quotes, probes, tol=None):
    """Oracle: per probe, the max-(ts, qid) quote with ts <= probe ts."""
    out = {}
    for k, pts, pid in probes:
        best = None
        for qk, qts, px, qid in quotes:
            if qk == k and qts <= pts and (best is None or (qts, qid) > best[:2]):
                best = (qts, qid, px)
        if best and tol is not None:
            if int(pts.timestamp()) - int(best[0].timestamp()) > tol:
                best = None
        out[pid] = best and (best[0], best[2], best[1])  # (q_ts, q_px, q_qid)
    return out


def _rows_asof(df):
    return {
        r.pid: (None if r.q_ts is None else (r.q_ts, r.q_px, r.q_qid))
        for r in df.collect()
    }


class TestAsofJoin:
    def test_matches_python_oracle(self, spark):
        q, p, quotes, probes = _mk_frames(spark)
        got = _rows_asof(joins.asof_join(p, q, "k", quote_tiebreak="qid"))
        assert got == _py_asof(quotes, probes)

    def test_tolerance_nulls_stale_matches(self, spark):
        q, p, quotes, probes = _mk_frames(spark)
        got = _rows_asof(
            joins.asof_join(p, q, "k", quote_tiebreak="qid", tolerance_seconds=300)
        )
        want = _py_asof(quotes, probes, tol=300)
        assert got == want
        # the tolerance must actually bite somewhere in this data
        assert any(v is None for v in want.values())
        assert any(v is not None for v in want.values())

    @pytest.mark.parametrize("bucket", [7, 60, 601, 86400])
    def test_bucketed_equals_plain(self, spark, bucket):
        q, p, quotes, probes = _mk_frames(spark)
        plain = _rows_asof(joins.asof_join(p, q, "k", quote_tiebreak="qid"))
        bucketed = _rows_asof(
            joins.asof_join_bucketed(
                p, q, "k", bucket_seconds=bucket, quote_tiebreak="qid"
            )
        )
        assert bucketed == plain

    @pytest.mark.parametrize("bucket", [60, 3600])
    def test_bucketed_equals_plain_with_tolerance(self, spark, bucket):
        q, p, quotes, probes = _mk_frames(spark)
        kw = dict(quote_tiebreak="qid", tolerance_seconds=120)
        plain = _rows_asof(joins.asof_join(p, q, "k", **kw))
        bucketed = _rows_asof(
            joins.asof_join_bucketed(p, q, "k", bucket_seconds=bucket, **kw)
        )
        assert bucketed == plain

    def test_probe_only_key_gets_nulls(self, spark):
        q, p, quotes, probes = _mk_frames(spark)
        got = joins.asof_join(p, q, "k").filter("k = 'c'")
        assert got.count() > 0
        assert got.filter(F.col("q_qid").isNotNull()).count() == 0

    def test_equal_ts_quote_matches_inclusively(self, spark):
        q = spark.createDataFrame(
            [("a", _t(10), 1.0, 1)], "k string, ts timestamp, px double, qid long"
        )
        p = spark.createDataFrame([("a", _t(10), 1)], "k string, ts timestamp, pid long")
        [r] = joins.asof_join(p, q, "k").collect()
        assert r.q_qid == 1

    def test_reserved_column_clash_raises(self, spark):
        p = spark.createDataFrame([("a", _t(1), 1)], "k string, ts timestamp, __q long")
        q = spark.createDataFrame([("a", _t(0), 1.0)], "k string, ts timestamp, px double")
        with pytest.raises(ValueError, match="__q"):
            joins.asof_join(p, q, "k")


def _py_range(points, intervals, closed="both"):
    out = set()
    for k, pts, pid in points:
        for ik, s, e, iid in intervals:
            hi_ok = pts <= e if closed == "both" else pts < e
            if ik == k and s <= pts and hi_ok:
                out.add((pid, iid))
    return out


class TestRangeJoin:
    def _mk(self, spark, n_iv=40, n_pts=300):
        intervals = [
            (
                "ab"[_h(f"ik{i}", 2)],
                _t(_h(f"is{i}", 3000)),
                _t(_h(f"is{i}", 3000) + 30 + _h(f"id{i}", 900)),
                i,
            )
            for i in range(n_iv)
        ]
        points = [
            ("ab"[_h(f"rk{i}", 2)], _t(_h(f"rt{i}", 4000)), i) for i in range(n_pts)
        ]
        iv = spark.createDataFrame(
            intervals, "k string, start_ts timestamp, end_ts timestamp, iid long"
        )
        pt = spark.createDataFrame(points, "k string, ts timestamp, pid long")
        return iv, pt, intervals, points

    @pytest.mark.parametrize("bucket", [17, 300, 7200])
    def test_matches_python_oracle(self, spark, bucket):
        iv, pt, intervals, points = self._mk(spark)
        got = {
            (r.pid, r.i_iid)
            for r in joins.range_join_bucketed(
                pt, iv, bucket_seconds=bucket, on="k"
            ).collect()
        }
        assert got == _py_range(points, intervals)

    def test_left_closed_drops_end_boundary(self, spark):
        iv = spark.createDataFrame(
            [("a", _t(0), _t(10), 1)],
            "k string, start_ts timestamp, end_ts timestamp, iid long",
        )
        pt = spark.createDataFrame(
            [("a", _t(0), 1), ("a", _t(10), 2), ("a", _t(11), 3)],
            "k string, ts timestamp, pid long",
        )
        both = {r.pid for r in joins.range_join_bucketed(pt, iv, 60, on="k").collect()}
        left = {
            r.pid
            for r in joins.range_join_bucketed(
                pt, iv, 60, on="k", closed="left"
            ).collect()
        }
        assert both == {1, 2} and left == {1}

    def test_no_key_joins_on_time_only(self, spark):
        iv = spark.createDataFrame(
            [(_t(0), _t(100), 1)], "start_ts timestamp, end_ts timestamp, iid long"
        )
        pt = spark.createDataFrame(
            [(_t(50), 1), (_t(150), 2)], "ts timestamp, pid long"
        )
        got = {r.pid for r in joins.range_join_bucketed(pt, iv, 30).collect()}
        assert got == {1}

    def test_each_pair_emitted_once(self, spark):
        """An interval spanning many buckets must not duplicate pairs."""
        iv, pt, intervals, points = self._mk(spark)
        rows = joins.range_join_bucketed(pt, iv, bucket_seconds=13, on="k").collect()
        pairs = [(r.pid, r.i_iid) for r in rows]
        assert len(pairs) == len(set(pairs))

    def test_bad_closed_raises(self, spark):
        iv, pt, *_ = self._mk(spark, n_iv=1, n_pts=1)
        with pytest.raises(ValueError, match="closed"):
            joins.range_join_bucketed(pt, iv, 60, closed="right")
