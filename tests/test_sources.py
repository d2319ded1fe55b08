"""Discovery-source operators: S1-S6 scan semantics, P4-P6 filters,
T3 cursor cut vs a pure-python oracle, T4 cursor extraction."""

from datetime import timedelta

import pytest
from pyspark.sql import functions as F

from news_crawler_spark import sources


@pytest.fixture(scope="module")
def pages(spark):
    return sources.synth_feed_pages(spark, days=3, pages_per_day=4).cache()


@pytest.fixture(scope="module")
def links(spark, pages):
    return sources.collect_links(pages).cache()


def test_filters_applied(spark, pages, links):
    rows = links.collect()
    assert len(rows) > 0
    for r in rows:
        assert r.published_ts.date() == r.day          # P4 + P5
        assert any(ch.isdigit() for ch in r.url)       # P6
    # the raw pages DID contain noise that the filters removed
    raw = pages.select(F.explode("items").alias("it"), "day").collect()
    assert any(x.it.published_ts.date() != x.day for x in raw)
    assert any(not any(c.isdigit() for c in x.it.url) for x in raw)
    assert len(rows) < len(raw)


def test_all_feed_kinds_present(spark, pages):
    kinds = {r.feed_kind for r in pages.select("feed_kind").distinct().collect()}
    assert kinds == {"archive", "rss", "sitemap", "sitemap_index", "sitemap_b64"}


def test_cursor_cut_matches_python_oracle(spark, links):
    ordered = {}
    for r in links.collect():
        ordered.setdefault(r.source, []).append(r)
    for s in ordered:
        ordered[s].sort(key=lambda r: (-r.published_ts.timestamp(), r.url))
    # cursor = the 5th-newest link per source
    cursors = [
        {"source": s, "last_url": rs[4].url} for s, rs in ordered.items() if len(rs) > 5
    ]
    cur_df = spark.createDataFrame(cursors, "source string, last_url string")
    got = sources.cursor_cut(links, cur_df)
    got_by_src = {}
    for r in got.collect():
        got_by_src.setdefault(r.source, set()).add(r.url)
    for s, rs in ordered.items():
        if len(rs) > 5:
            want = {r.url for r in rs[:4]}  # strictly newer than the cursor
            assert got_by_src.get(s, set()) == want, s
        else:
            assert got_by_src.get(s, set()) == {r.url for r in rs}


def test_latest_cursors(spark, links):
    cur = {r.source: r.last_url for r in sources.latest_cursors(links).collect()}
    rows = links.collect()
    for s in cur:
        newest = max(
            (r for r in rows if r.source == s),
            key=lambda r: (r.published_ts, r.url),
        )
        assert cur[s] == newest.url


def test_discover_feeds_engine(spark, pages, tmp_path):
    from news_crawler_spark.engine import CrawlEngine

    fresh, cursors = sources.discover(spark, pages)
    eng = CrawlEngine(spark, str(tmp_path / "wd"))
    eng.ingest(fresh)
    pend = eng.catalog.read("pending", 0)
    n = pend.count()
    assert 0 < n <= fresh.count()  # dedup may collapse rediscoveries
    assert pend.select("canonical_url").distinct().count() == n
    assert cursors.count() == 5
