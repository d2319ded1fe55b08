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
    assert any(
        x.it.published_ts is not None and x.it.published_ts.date() != x.day
        for x in raw
    )
    assert any(not any(c.isdigit() for c in x.it.url) for x in raw)
    assert len(rows) < len(raw)
    # F5: RSS/sitemap items arrive with STRING dates only — the typed
    # published_ts in the output had to come from the parse path
    assert any(x.it.published_ts is None and x.it.pub_raw is not None for x in raw)


def test_string_date_parsing_golden(spark):
    """F5 golden: RFC-822 (RSS pubDate) and ISO-8601 (sitemap lastmod)
    strings parse to the exact UTC instant; garbage parses to NULL."""
    from datetime import datetime

    df = spark.createDataFrame(
        [
            ("rss", "Mon, 03 Jun 2024 14:22:05 +0000"),
            ("rss", "Tue, 31 Dec 2024 23:59:59 +0330"),
            ("sitemap", "2024-06-03T14:22:05+00:00"),
            ("sitemap_index", "2024-06-03T17:52:05+03:30"),
            ("sitemap_b64", "2024-02-29T00:00:00+00:00"),
            ("rss", "not a date"),
            ("sitemap", "2024-13-99T99:00:00+00:00"),
        ],
        "feed_kind string, pub_raw string",
    )
    got = [
        r.ts
        for r in df.select(
            sources.parse_pub_date("feed_kind", "pub_raw").alias("ts")
        ).collect()
    ]
    assert got == [
        datetime(2024, 6, 3, 14, 22, 5),
        datetime(2024, 12, 31, 20, 29, 59),   # +0330 → UTC
        datetime(2024, 6, 3, 14, 22, 5),
        datetime(2024, 6, 3, 14, 22, 5),      # +03:30 → UTC
        datetime(2024, 2, 29, 0, 0),
        None,
        None,
    ]


def test_all_feed_kinds_present(spark, pages):
    kinds = {r.feed_kind for r in pages.select("feed_kind").distinct().collect()}
    assert kinds == {"archive", "rss", "sitemap", "sitemap_index", "sitemap_b64"}


def test_cursor_cut_matches_python_oracle(spark, links):
    ordered = {}
    for r in links.collect():
        ordered.setdefault(r.source, []).append(r)
    for s in ordered:
        # feed order = (published_ts, url) tuple DESC — the one tie-break
        # direction shared by cursor_cut / latest_cursors / streaming
        ordered[s].sort(key=lambda r: (r.published_ts, r.url), reverse=True)
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


def test_cursor_tie_break_matches_streaming(spark):
    """A link that TIES the cursor's published_ts is kept iff its url is
    tuple-greater — the same rule streaming.cursor_cut_stream applies, so
    a late same-timestamp link is never permanently dropped by the batch
    path while the stream path would admit it (ADVICE round-1 item)."""
    from datetime import datetime

    ts = datetime(2024, 6, 1, 12, 0)
    links = spark.createDataFrame(
        [
            ("s", "https://h/9-old", datetime(2024, 6, 1, 11, 0)),
            ("s", "https://h/1-tie-below", ts),
            ("s", "https://h/5-cursor", ts),
            ("s", "https://h/7-tie-above", ts),
            ("s", "https://h/2-newer", datetime(2024, 6, 1, 13, 0)),
        ],
        "source string, url string, published_ts timestamp",
    )
    cur = spark.createDataFrame(
        [("s", "https://h/5-cursor")], "source string, last_url string"
    )
    got = {r.url for r in sources.cursor_cut(links, cur).collect()}
    assert got == {"https://h/2-newer", "https://h/7-tie-above"}
    # and latest_cursors picks the tuple-max, consistent with the cut
    new_cur = sources.latest_cursors(links).collect()[0]
    assert new_cur.last_url == "https://h/2-newer"


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


def test_recrawl_schedule_clamps_and_ceil(spark):
    """Interval math vs hand computation: exact ceil-div, min/max clamps,
    and zero-recent sources absent from the output."""
    import datetime as dt

    from news_crawler_spark import sources

    base = dt.datetime(2024, 1, 10, 0, 0, 0)
    rows = []
    # 'hot': 100 events inside the window -> ceil(50*3600/100) = 1800
    rows += [("hot", base - dt.timedelta(seconds=i)) for i in range(100)]
    # 'cold': 1 event inside -> ceil(180000/1) clamped to max_s
    rows += [("cold", base - dt.timedelta(seconds=30))]
    # 'firehose': 4000 inside -> ceil(180000/4000)=45 clamped to min_s
    rows += [("firehose", base - dt.timedelta(seconds=i % 3000)) for i in range(4000)]
    # 'stale': only events OUTSIDE the window -> absent
    rows += [("stale", base - dt.timedelta(seconds=4000))]
    df = spark.createDataFrame(rows, "event_type string, ts timestamp")
    got = {
        r.source: (r.n_recent, r.next_poll_s)
        for r in sources.recrawl_schedule(
            df, window_s=3600, target_batch=50, min_s=60, max_s=7200
        ).collect()
    }
    assert got == {
        "hot": (100, 1800),
        "cold": (1, 7200),
        "firehose": (4000, 60),
    }, got


def test_change_rate_schedule_estimator_edges(spark):
    """The CGM estimator's branch structure: a never-changed page takes
    the explicit max branch (lam_micro == 0, no division), an
    every-poll changer clamps to the minimum interval, and a middling
    page matches the closed-form integer arithmetic exactly."""
    import math

    from news_crawler_spark import sources as src

    rows = (
        [("never", False)] * 10
        + [("always", True)] * 10
        + [("some", True)] * 2
        + [("some", False)] * 8
        + [("once", True)]
    )
    df = spark.createDataFrame(rows, "page_id string, changed boolean")
    got = {
        r.page_id: (r.n_polls, r.n_changed, r.lam_micro, r.next_interval_s)
        for r in src.change_rate_schedule(df, interval_s=3600, max_factor=30).collect()
    }
    L = lambda x: round(math.log(x) * 1_000_000)  # noqa: E731

    def expect(n, x):
        lam = L(2 * n + 1) - L(2 * (n - x) + 1)
        nxt = 108000 if lam == 0 else min(108000, max(3600, 3600 * 1_000_000 // lam))
        return (n, x, lam, nxt)

    assert got == {
        "never": expect(10, 0),
        "always": expect(10, 10),
        "some": expect(10, 2),
        "once": expect(1, 1),
    }
    assert got["never"][2] == 0 and got["never"][3] == 108000
    assert got["always"][3] == 3600  # min clamp: lam >> 10^6


# ---------------------------------------------------------------------------
# sitemap_tree


def _tree(spark, edges, roots, **kw):
    e = spark.createDataFrame(edges, "loc string, child string, kind string")
    r = spark.createDataFrame([(x,) for x in roots], "root string")
    return {
        (row.root, row.url): row.depth
        for row in sources.sitemap_tree(e, r, **kw).collect()
    }


def test_sitemap_tree_expands_nested_indexes(spark):
    edges = [
        ("r", "i1", "sitemap"), ("r", "i2", "sitemap"), ("r", "u0", "url"),
        ("i1", "s1", "sitemap"), ("i2", "s1", "sitemap"),  # diamond
        ("s1", "u1", "url"), ("s1", "u2", "url"),
        ("i2", "u3", "url"),
        ("orphan", "u9", "url"),  # not reachable from any root
    ]
    out = _tree(spark, edges, ["r"])
    assert out == {
        ("r", "u0"): 1,   # directly in the root file
        ("r", "u3"): 2,   # via i2
        ("r", "u1"): 3,   # via i1/i2 -> s1 (diamond deduped to min)
        ("r", "u2"): 3,
    }


def test_sitemap_tree_two_roots_attribute_separately(spark):
    edges = [
        ("a", "shared", "sitemap"), ("b", "shared", "sitemap"),
        ("shared", "u", "url"), ("b", "ub", "url"),
    ]
    out = _tree(spark, edges, ["a", "b"])
    assert out == {("a", "u"): 2, ("b", "u"): 2, ("b", "ub"): 1}


def test_sitemap_tree_cycle_is_cut_by_visited_set(spark):
    edges = [
        ("r", "i", "sitemap"),
        ("i", "r", "sitemap"),   # points back at the root
        ("i", "i", "sitemap"),   # and at itself
        ("i", "u", "url"), ("r", "u0", "url"),
    ]
    out = _tree(spark, edges, ["r"], max_depth=10)
    assert out == {("r", "u0"): 1, ("r", "u"): 2}


def test_sitemap_tree_depth_cap(spark):
    edges = [("n%d" % i, "n%d" % (i + 1), "sitemap") for i in range(6)]
    edges += [("n%d" % i, "u%d" % i, "url") for i in range(7)]
    out = _tree(spark, edges, ["n0"], max_depth=3)
    # files n0(d1) n1(d2) n2(d3) expanded; deeper files never fetched
    assert out == {("n0", "u0"): 1, ("n0", "u1"): 2, ("n0", "u2"): 3}


# ---------------------------------------------------------------------------
# refresh_allocation


def _alloc(spark, lam_by_page, budget, **kw):
    p = spark.createDataFrame(
        [(k, v) for k, v in lam_by_page.items()], "page_id long, lam long"
    )
    return {
        r.page_id: r.f_alloc
        for r in sources.refresh_allocation(p, budget, **kw).collect()
    }


def test_refresh_allocation_prefers_slow_changers(spark):
    # the Cho result: under a tight budget the fast-changing page loses
    out = _alloc(spark, {1: 2, 2: 50}, budget=2, f_max=3)
    assert out == {1: 2, 2: 0}
    out = _alloc(spark, {1: 2, 2: 50}, budget=4, f_max=3)
    assert out == {1: 3, 2: 1}


def test_refresh_allocation_exhausts_exactly_the_budget(spark):
    lam = {i: 1 + (i * 13) % 20 for i in range(40)}
    out = _alloc(spark, lam, budget=37, f_max=4)
    assert sum(out.values()) == 37
    assert all(0 <= f <= 4 for f in out.values())


def test_refresh_allocation_tie_break_is_by_page_id(spark):
    out = _alloc(spark, {1: 5, 2: 5, 3: 5}, budget=2, f_max=1)
    assert out == {1: 1, 2: 1, 3: 0}


def test_refresh_allocation_never_buys_zero_gain(spark):
    # scale=10, lam=1: integer gains are [5, 1, 0] — the third crawl is
    # worth < 1/scale freshness and must not be bought even with budget
    out = _alloc(spark, {7: 1}, budget=10, f_max=3, scale=10)
    assert out == {7: 2}


def test_refresh_allocation_zero_budget(spark):
    out = _alloc(spark, {1: 3, 2: 9}, budget=0, f_max=4)
    assert out == {1: 0, 2: 0}


# ---------------------------------------------------------------------------
# outlinks_of


def test_outlinks_of_matches_the_python_twin(spark):
    from news_crawler_spark import synth

    urls = [synth.clean_url(k)[2] for k in range(25)]
    docs = spark.createDataFrame([(u,) for u in urls], "url string")
    got = sorted(
        (r.url, r.source, r.published_ts)
        for r in sources.outlinks_of(docs, universe=50).collect()
    )
    exp = sorted(
        (d["url"], d["source"], d["published_ts"])
        for u in urls
        for d in synth.page_outlinks(u, universe=50)
    )
    assert got == exp and len(exp) > 0


def test_outlinks_of_failed_pages_and_empty_input(spark):
    from news_crawler_spark import synth

    bad = [synth.clean_url(k)[2] for k in range(300) if not synth.page_ok(synth.clean_url(k)[2])][:5]
    assert bad
    docs = spark.createDataFrame([(u,) for u in bad], "url string")
    assert sources.outlinks_of(docs).count() == 0
    empty = spark.createDataFrame([], "url string")
    assert sources.outlinks_of(empty).count() == 0
