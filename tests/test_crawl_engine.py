"""End-to-end crawl fixtures: seen-set, ordering, spans, state machine,
resume — Spark engine vs the pure-Python reference-semantics oracle
(FIXTURES.md §3 contracts 1-4)."""

import pytest
from pyspark.sql import functions as F

from news_crawler_spark import oracle, synth
from news_crawler_spark.engine import CrawlEngine
from news_crawler_spark.schemas import STATUS_COMPLETED, STATUS_FAILED, STATUS_PENDING

N_SEED = 400


@pytest.fixture(scope="module")
def seed_rows():
    return [synth.seed_row(i) for i in range(N_SEED)]


@pytest.fixture(scope="module")
def oracle_result(seed_rows):
    return oracle.crawl(seed_rows)


@pytest.fixture(scope="module")
def engine_run(spark, tmp_path_factory, seed_rows):
    wd = str(tmp_path_factory.mktemp("engine"))
    eng = CrawlEngine(spark, wd)
    eng.ingest(synth.build_seed_list(spark, N_SEED))
    stats = eng.run()
    return eng, stats


def test_seed_generator_matches_spark_side(spark, seed_rows):
    df = synth.build_seed_list(spark, N_SEED).orderBy("discovery_time").collect()
    assert len(df) == N_SEED
    for got, want in zip(df, seed_rows):
        assert got.url == want["url"]
        assert got.source == want["source"]
        assert got.published_ts == want["published_ts"]


def test_url_seen_set_exact_match(engine_run, oracle_result):
    """Contract 1: engine's admitted canonical set == oracle's (first wins)."""
    eng, _ = engine_run
    # the admitted set survives in the live frontier (pending ∪ done);
    # the round-0 pending snapshot itself is GC'd once superseded
    frontier = eng.final_frontier()
    got = {r.canonical_url for r in frontier.select("canonical_url").collect()}
    assert got == set(oracle_result.seen.keys())
    # first-discovered wins: spot-check discovery times match the oracle's
    disc = {r.canonical_url: r.discovery_time for r in
            frontier.select("canonical_url", "discovery_time").collect()}
    for cu, e in oracle_result.seen.items():
        assert disc[cu] == e.discovery_time, f"wrong winner for {cu}"


def test_crawl_ordering_exact_match(engine_run, oracle_result):
    """Contract 2: the (round, host, url) pop sequence matches exactly."""
    eng, _ = engine_run
    got = [(r.round, r.host, r.canonical_url)
           for r in eng.pops_in_order().collect()]
    want = sorted(
        oracle_result.pops,
        key=lambda p: (p[0], p[1]),
    )  # stable: within (round, host) oracle order is already the pop order
    assert len(got) == len(want)
    assert got == want


def test_final_state_machine(engine_run, oracle_result):
    """Retry semantics: completed/failed/tried_count match the oracle."""
    eng, _ = engine_run
    rows = eng.final_frontier().select(
        "canonical_url", "status", "tried_count"
    ).collect()
    got = {r.canonical_url: (r.status, r.tried_count) for r in rows}
    robots = synth.robots_rows()
    for cu, e in oracle_result.seen.items():
        if not oracle._robots_allows(robots, e.host, cu):
            # robots-denied URLs stay pending forever (never popped)
            assert got[cu] == (STATUS_PENDING, 0)
        else:
            assert got[cu] == (e.status, e.tried_count), cu
    assert len(got) == len(oracle_result.seen)
    # failure injection really exercised both branches
    statuses = {s for s, _ in got.values()}
    assert STATUS_COMPLETED in statuses and STATUS_FAILED in statuses


def test_span_sequence_equality(engine_run, oracle_result):
    """Contract 3: per-document spans match the independent oracle extractor
    on (kind, text, media_ref, order)."""
    eng, _ = engine_run
    got_docs = {
        r.doc_id: [(s.kind, s.text, s.media_ref, s.offset) for s in r.spans]
        for r in eng.documents().select("doc_id", "spans").collect()
    }
    want_docs = {d[0]: d[2] for d in oracle_result.docs}
    assert set(got_docs) == set(want_docs)
    for doc_id, want in want_docs.items():
        assert got_docs[doc_id] == want, f"span mismatch in {doc_id}"
    # interleaving is real: some doc has both kinds
    assert any(
        {k for k, *_ in spans} == {"text", "image"} for spans in got_docs.values()
    )


def test_lineage_totals(engine_run, oracle_result):
    eng, _ = engine_run
    got = eng.lineage().agg(
        F.sum("popped").alias("p"), F.sum("fetched_ok").alias("ok"),
        F.sum("fetched_fail").alias("fail"), F.sum("marked_failed").alias("mf"),
    ).collect()[0]
    want_p = sum(l[2] for l in oracle_result.lineage)
    want_ok = sum(l[3] for l in oracle_result.lineage)
    want_fail = sum(l[4] for l in oracle_result.lineage)
    want_mf = sum(l[5] for l in oracle_result.lineage)
    assert (got.p, got.ok, got.fail, got.mf) == (want_p, want_ok, want_fail, want_mf)


def test_resume_equals_uninterrupted(spark, seed_rows, engine_run, tmp_path_factory):
    """Contract 4: stop after 2 rounds, resume with a fresh engine →
    identical pop log and final frontier."""
    eng_full, _ = engine_run
    wd = str(tmp_path_factory.mktemp("resume"))
    eng1 = CrawlEngine(spark, wd)
    eng1.ingest(synth.build_seed_list(spark, N_SEED))
    eng1.step(1)
    eng1.step(2)
    # simulate a crash: partially written round 3 without commit
    eng1.catalog.write("pops", 3, eng1.catalog.read("pops", 2))
    del eng1
    eng2 = CrawlEngine(spark, wd)
    eng2.run()
    got = [(r.round, r.host, r.canonical_url) for r in eng2.pops_in_order().collect()]
    want = [(r.round, r.host, r.canonical_url) for r in eng_full.pops_in_order().collect()]
    assert got == want
    f1 = {(r.canonical_url, r.status, r.tried_count)
          for r in eng_full.final_frontier().collect()}
    f2 = {(r.canonical_url, r.status, r.tried_count)
          for r in eng2.final_frontier().collect()}
    assert f1 == f2


def test_incremental_ingest_dedups(spark, engine_run):
    """ST2/ST3: re-delivered links are absorbed; only new URLs admitted."""
    eng, _ = engine_run
    redelivered = synth.build_seed_list(spark, 50)  # all already seen
    n = eng.ingest_incremental(redelivered)
    assert n == 0
    fresh = synth.build_seed_list(spark, N_SEED + 40).filter(
        F.col("discovery_time")
        >= F.lit(synth.seed_row(N_SEED)["discovery_time"])
    )
    n2 = eng.ingest_incremental(fresh)
    # the 40 new indexes contain some duplicates of earlier articles
    assert 0 < n2 <= 40
    eng.run()
    # every robots-allowed URL drained; only denied ones may stay pending
    from news_crawler_spark.operators import frontier as fops
    left = fops.allowed_by_robots(
        fops.eligible(eng.catalog.read("pending", eng.catalog.latest_round())),
        eng.robots,
    ).count()
    assert left == 0


def test_first_wins_dedup_nulls_lose(spark):
    """A NULL discovery_time must LOSE first-wins dedup (asc_nulls_last),
    not win via struct comparison's nulls-first field ordering."""
    from datetime import datetime

    from news_crawler_spark.operators.seen_set import dedup_first_wins

    batch = spark.createDataFrame(
        [
            (1, "https://h/a", "https://h/a", None),
            (1, "https://h/a", "https://h/a", datetime(2024, 6, 1)),
            (2, "https://h/b", "https://h/b", None),
        ],
        "url_hash long, canonical_url string, url string, discovery_time timestamp",
    )
    got = {r.url_hash: r.discovery_time for r in dedup_first_wins(batch).collect()}
    assert got[1] == datetime(2024, 6, 1)   # real timestamp beats NULL
    assert got[2] is None                    # all-NULL group still survives


def test_mor_mode_equals_cow(spark, oracle_result, tmp_path_factory):
    """Merge-on-read pending (tombstone/addition deltas + periodic
    compaction) must be observation-equivalent to the reference-semantics
    oracle (which the cow engine is pinned to by the fixtures above):
    same pop sequence, same final state machine — while writing only
    O(|popped|) pending bytes on delta rounds. (Compared against the
    oracle, not the shared engine_run fixture: a later test mutates that
    engine with incremental ingests.)"""
    wd = str(tmp_path_factory.mktemp("engine_mor"))
    eng = CrawlEngine(spark, wd, merge_mode="mor", compact_every=3)
    eng.ingest(synth.build_seed_list(spark, N_SEED))
    stats = eng.run()
    assert len(stats) > 3  # deltas AND a compaction round both exercised
    got_pops = [(r.round, r.host, r.canonical_url)
                for r in eng.pops_in_order().collect()]
    want_pops = sorted(oracle_result.pops, key=lambda p: (p[0], p[1]))
    assert got_pops == want_pops
    got = {r.canonical_url: (r.status, r.tried_count)
           for r in eng.final_frontier().collect()}
    robots = synth.robots_rows()
    for cu, e in oracle_result.seen.items():
        if not oracle._robots_allows(robots, e.host, cu):
            assert got[cu] == (STATUS_PENDING, 0)
        else:
            assert got[cu] == (e.status, e.tried_count), cu
    assert len(got) == len(oracle_result.seen)
    assert eng.documents().count() == len(oracle_result.docs)
    # delta rounds really skipped the full-slice write
    import os
    pend_rounds = set(os.listdir(os.path.join(wd, "pending")))
    assert "round=1" not in pend_rounds            # delta round
    # only full snapshots from compaction rounds exist, and post-commit GC
    # keeps just the newest (older fulls are unreachable by any read)
    nums = sorted(int(d.split("=")[1]) for d in pend_rounds)
    assert len(nums) == 1 and nums[0] % 3 == 0, pend_rounds


def test_rfc9309_grammar_equals_prefix_on_prefix_rules(
    spark, oracle_result, tmp_path_factory
):
    """robots_grammar="rfc9309" on a prefix-only rule set must produce
    the IDENTICAL crawl (plain prefixes are a strict subset of the
    wildcard grammar: no '*', no trailing '$' → pure startswith, same
    longest-match/tie semantics) — pinned against the same
    reference-semantics oracle the prefix engine is pinned to."""
    wd = str(tmp_path_factory.mktemp("engine_rfc"))
    eng = CrawlEngine(spark, wd, robots_grammar="rfc9309")
    eng.ingest(synth.build_seed_list(spark, N_SEED))
    eng.run()
    got_pops = [(r.round, r.host, r.canonical_url)
                for r in eng.pops_in_order().collect()]
    want_pops = sorted(oracle_result.pops, key=lambda p: (p[0], p[1]))
    assert got_pops == want_pops
    assert eng.documents().count() == len(oracle_result.docs)


def test_mor_resume_equals_uninterrupted(spark, tmp_path_factory):
    """Kill/resume in mor mode: crash after a committed DELTA round (the
    hard case — resume must reconstruct pending from base + deltas)."""
    seeds = synth.build_seed_list(spark, N_SEED)
    wd = str(tmp_path_factory.mktemp("mor_resume"))
    eng = CrawlEngine(spark, wd, merge_mode="mor", compact_every=4)
    eng.ingest(seeds)
    eng.step(1)
    eng.step(2)  # committed delta round; round 4 compaction not reached
    # dangling uncommitted junk from the "crash"
    eng.catalog.write("pending_tomb", 3,
                      spark.createDataFrame([], "url_hash long, canonical_url string"))

    eng2 = CrawlEngine(spark, wd, merge_mode="mor", compact_every=4)
    eng2.run()  # resumes from round 2

    wd_full = str(tmp_path_factory.mktemp("mor_full"))
    eng_full = CrawlEngine(spark, wd_full, merge_mode="mor", compact_every=4)
    eng_full.ingest(seeds)
    eng_full.run()
    got = [(r.round, r.host, r.canonical_url) for r in eng2.pops_in_order().collect()]
    want = [(r.round, r.host, r.canonical_url) for r in eng_full.pops_in_order().collect()]
    assert got == want
    f1 = {(r.canonical_url, r.status, r.tried_count)
          for r in eng_full.final_frontier().collect()}
    f2 = {(r.canonical_url, r.status, r.tried_count)
          for r in eng2.final_frontier().collect()}
    assert f1 == f2


def test_seen_prefilter_modes_identical(spark, tmp_path_factory):
    """Engine incremental ingest admits the identical set with no
    prefilter, the bloom pre-pass, or the cuckoo pre-pass (approximate
    structures only divert definite-negatives around the exact join)."""
    results = {}
    for pf in (None, "bloom", "cuckoo"):
        wd = str(tmp_path_factory.mktemp(f"pf_{pf}"))
        eng = CrawlEngine(spark, wd, seen_prefilter=pf)
        eng.ingest(synth.build_seed_list(spark, 300))
        n = eng.ingest_incremental(synth.build_seed_list(spark, 400))
        pend = eng.catalog.read("pending", eng.catalog.latest_round())
        urls = frozenset(r.canonical_url for r in pend.collect())
        results[pf] = (n, urls)
    assert results[None] == results["bloom"] == results["cuckoo"]
    assert results[None][0] > 0  # the batch really admitted new URLs


def test_apportion_budget_hamilton_exact(spark):
    """Largest-remainder apportionment: budgets sum to the total
    exactly, quotas never under-allocate the floor, leftovers go to the
    largest remainders with host tie-break — checked against a python
    twin on a skewed rank vector, plus the all-equal tie edge."""
    from news_crawler_spark.operators import frontier as fops

    ranks = {"h%02d" % i: (i + 1) ** 2 for i in range(17)}
    df = spark.createDataFrame(list(ranks.items()), "host string, rank long")
    total = 103
    got = {r.host: r.budget for r in fops.apportion_budget(df, total).collect()}

    R = sum(ranks.values())
    quota = {h: total * r // R for h, r in ranks.items()}
    rem = {h: total * r % R for h, r in ranks.items()}
    left = total - sum(quota.values())
    plus = sorted(ranks, key=lambda h: (-rem[h], h))[:left]
    want = {h: quota[h] + (1 if h in plus else 0) for h in ranks}
    assert got == want, (got, want)
    assert sum(got.values()) == total

    # all-equal ranks, total not divisible: ties broken by host name
    eq = spark.createDataFrame(
        [("a", 5), ("b", 5), ("c", 5)], "host string, rank long"
    )
    got_eq = {r.host: r.budget for r in fops.apportion_budget(eq, 10).collect()}
    assert got_eq == {"a": 4, "b": 3, "c": 3}, got_eq


def test_apportioned_budgets_drive_pop_round(spark):
    """Composition: rank → apportion_budget → pop_round. The per-host
    popped counts equal min(budget, pending(host)) and the global pop
    total never exceeds the apportioned ceiling — the g2→T1 loop a
    globally-QPS-capped crawl runs every round."""
    import datetime as dt

    from pyspark.sql import functions as F

    from news_crawler_spark.operators import frontier as fops

    ranks = spark.createDataFrame(
        [("a.example", 60), ("b.example", 30), ("c.example", 10)],
        "host string, rank long",
    )
    budgets = fops.apportion_budget(ranks, 10)
    got_b = {r.host: r.budget for r in budgets.collect()}
    assert got_b == {"a.example": 6, "b.example": 3, "c.example": 1}, got_b

    base = dt.datetime(2024, 1, 1)
    rows = [
        (h, i, base + dt.timedelta(seconds=i))
        for h in ("a.example", "b.example", "c.example")
        for i in range(8)
    ]
    pend = spark.createDataFrame(
        rows, "host string, url_hash long, published_ts timestamp"
    ).select(
        "host",
        "url_hash",
        F.lit(0).cast("int").alias("priority"),
        "published_ts",
        F.lit("pending").alias("status"),
        F.lit(0).alias("tried_count"),
    )
    popped = fops.pop_round(fops.eligible(pend), budgets, salts=4)
    per_host = {
        r.host: r.n
        for r in popped.groupBy("host").agg(F.count("*").alias("n")).collect()
    }
    assert per_host == {"a.example": 6, "b.example": 3, "c.example": 1}, per_host


def test_apportion_budget_empty_and_zero_rank(spark):
    """Empty or all-zero rank input apportions nothing instead of
    raising (the guard a composed pipeline hits when a quality gate
    filters a corpus to zero rows)."""
    from news_crawler_spark.operators import frontier as fops

    empty = spark.createDataFrame([], "host string, rank long")
    assert fops.apportion_budget(empty, 100).count() == 0
    zeros = spark.createDataFrame([("a", 0), ("b", 0)], "host string, rank long")
    got = {r.host: r.budget for r in fops.apportion_budget(zeros, 100).collect()}
    assert got == {"a": 0, "b": 0}


def test_crawl_delay_tokens_precedence_and_edges(spark):
    """Every parse path of frontier.crawl_delay_tokens: agent section
    beats *, * fallback, default when no delay anywhere, mixed-case
    directives, a malformed delay dropped by try_cast (falls through
    to the * value), smallest-delay tie-break within a precedence,
    and the refill cap."""
    from news_crawler_spark.operators import frontier as fops

    rows = [
        # agent section (5) beats * (3): delay 5, tokens 30 div 5 = 6
        ("a", "User-agent: *\nCrawl-delay: 3\nUser-Agent: NewsBot\nCrawl-Delay: 5"),
        # * only: delay 3, tokens 10 (30 div 3 = 10, at the cap)
        ("b", "user-agent: *\ncrawl-delay: 3\ndisallow: /x"),
        # no delay anywhere: default 2, tokens 10 (15 capped)
        ("c", "User-agent: *\nDisallow: /private"),
        # malformed agent delay -> try_cast NULL -> * wins: delay 4
        ("d", "User-agent: newsbot\nCrawl-delay: soon\nUser-agent: *\nCrawl-delay: 4"),
        # two delays in the SAME section: smallest wins -> 1, capped 10
        ("e", "User-agent: newsbot\nCrawl-delay: 9\nCrawl-delay: 1"),
        # delay for an unrelated agent only: default 2
        ("f", "User-agent: otherbot\nCrawl-delay: 9"),
    ]
    df = spark.createDataFrame(rows, "host string, robots_txt string")
    got = {
        r.host: (r.delay, r.tokens)
        for r in fops.crawl_delay_tokens(
            df, agent="newsbot", default_delay=2, round_seconds=30, cap=10
        ).collect()
    }
    assert got == {
        "a": (5, 6),
        "b": (3, 10),
        "c": (2, 10),
        "d": (4, 7),
        "e": (1, 10),
        "f": (2, 10),
    }


def test_robots_sitemaps_every_parse_path(spark):
    """Every parse path of frontier.robots_sitemaps: plain directive,
    mixed-case field with whitespace before the colon and a tab after
    it, a full CRLF body (every line carries \\r — the trap plain
    space-only trim() drops), a cross-host CDN reference flagged not
    dropped, URL path bytes preserved while the advertised host folds
    case, sitemap-index: near-miss ignored, relative and ftp values
    dropped, duplicate lines collapsed, and a host with no directive
    absent from the output."""
    from news_crawler_spark.operators import frontier as fops

    rows = [
        ("a.example", "User-agent: *\nSitemap: https://a.example/s1.xml\n"
                      "Sitemap: https://a.example/s1.xml"),
        ("b.example", "SiteMap :\thttps://B.EXAMPLE/News-7.XML"),
        ("c.example", "User-agent: *\r\nsitemap:https://cdn.example/c/s.xml\r\n"
                      "Disallow: /x\r"),
        ("d.example", "sitemap-index: https://d.example/no.xml\n"
                      "Sitemap: /relative.xml\nSitemap: ftp://d.example/s.xml"),
        ("e.example", "User-agent: *\nDisallow: /private"),
    ]
    df = spark.createDataFrame(rows, "host string, robots_txt string")
    got = {
        (r.host, r.sitemap_url): (r.sitemap_host, r.cross_host)
        for r in fops.robots_sitemaps(df).collect()
    }
    assert got == {
        ("a.example", "https://a.example/s1.xml"): ("a.example", 0),
        ("b.example", "https://B.EXAMPLE/News-7.XML"): ("b.example", 0),
        ("c.example", "https://cdn.example/c/s.xml"): ("cdn.example", 1),
    }


def test_robots_sitemaps_feeds_discovery_hosts(spark):
    """The discovery seam: extracted same-host sitemap URLs group per
    host into the per-source scan list shape (one host, n sitemaps)
    that sources-side scans consume."""
    from news_crawler_spark.operators import frontier as fops

    df = spark.createDataFrame(
        [("t.example", "Sitemap: https://t.example/a.xml\n"
                       "Sitemap: https://t.example/b.xml")],
        "host string, robots_txt string",
    )
    per_host = (
        fops.robots_sitemaps(df)
        .where(F.col("cross_host") == 0)
        .groupBy("host")
        .agg(F.sort_array(F.collect_list("sitemap_url")).alias("sitemaps"))
        .collect()
    )
    assert per_host[0].host == "t.example"
    assert per_host[0].sitemaps == [
        "https://t.example/a.xml", "https://t.example/b.xml",
    ]


def test_rendezvous_resize_moves_only_to_the_new_shard(spark):
    """The property hash-mod lacks and rendezvous guarantees: growing
    the fleet 8→9 moves ONLY the hosts the new shard wins — every
    moved host moves TO shard 8, nobody relocates between old shards —
    and the moved fraction is ≈1/9 of the keys. Assignment must also
    be perfectly stable across recomputation (pure function)."""
    from news_crawler_spark.operators import frontier as fops

    hosts = spark.createDataFrame(
        [(f"host-{i}.example",) for i in range(500)], "host string"
    )
    s8 = {r.host: r.shard for r in fops.rendezvous_assign(hosts, n_shards=8).collect()}
    s8b = {r.host: r.shard for r in fops.rendezvous_assign(hosts, n_shards=8).collect()}
    s9 = {r.host: r.shard for r in fops.rendezvous_assign(hosts, n_shards=9).collect()}
    assert s8 == s8b
    moved = {h for h in s8 if s8[h] != s9[h]}
    assert moved and all(s9[h] == 8 for h in moved)
    # E[moved] = 500/9 ≈ 56; generous determinstic-band check
    assert 25 <= len(moved) <= 95
    # balance: every shard owns someone in the 8-world
    assert set(s8.values()) == set(range(8))


def test_drain_report_matches_frontier_state(
    spark, engine_run, tmp_path_factory
):
    """Fresh ingest: the report covers exactly the robots-eligible
    pending backlog at round-1 budgets, the forecast upper-bounds the
    real drain (budgets only grow with carry), and a quiesced engine
    reports empty."""
    import math

    from news_crawler_spark.operators import frontier as frontier_ops

    wd = str(tmp_path_factory.mktemp("drain"))
    eng = CrawlEngine(spark, wd)
    eng.ingest(synth.build_seed_list(spark, 300))
    report = {r.host: r for r in eng.drain_report(rounds_cap=3).collect()}
    assert report, "fresh ingest must have pending backlog"
    # per-host backlog must equal the robots-eligible pending count
    pending = eng.final_frontier().filter(F.col("status") == "pending")
    allowed = frontier_ops.allowed_by_robots(
        frontier_ops.eligible(pending), eng.robots
    )
    truth = {r.host: r.n for r in allowed.groupBy("host").count()
             .withColumnRenamed("count", "n").collect()}
    assert {h: r.n_pending for h, r in report.items()} == truth
    for r in report.values():
        assert r.budget > 0
        assert r.rounds_to_drain == math.ceil(r.n_pending / r.budget)
        assert r.over_cap == (r.rounds_to_drain > 3)
    # the forecast never claims a faster drain than actually happened
    done_eng, stats = engine_run
    assert max(r.rounds_to_drain for r in report.values()) <= len(stats) * 2
    # quiesced engine: robots-denied leftovers are filtered -> empty
    assert done_eng.drain_report().collect() == []


def test_snowball_reaches_the_oracle_closure(spark, tmp_path_factory):
    """Open-web mode: run_snowball must land exactly on the BFS fixpoint
    of the synthetic link graph — seen/completed/failed/blocked sets all
    equal to oracle.snowball's closure, regardless of cycle batching."""
    from news_crawler_spark import oracle

    wd = str(tmp_path_factory.mktemp("snowball"))
    eng = CrawlEngine(spark, wd)
    eng.ingest(synth.build_seed_list(spark, 40))
    eng.run_snowball(max_cycles=20, universe=150)

    exp = oracle.snowball(
        [synth.seed_row(i) for i in range(40)], universe=150
    )
    ff = eng.final_frontier().select("canonical_url", "status").collect()
    got = {
        "seen": {r.canonical_url for r in ff},
        "completed": {r.canonical_url for r in ff if r.status == "completed"},
        "failed": {r.canonical_url for r in ff if r.status == "failed"},
        "blocked_pending": {
            r.canonical_url for r in ff if r.status == "pending"
        },
    }
    assert got == exp
    # discovery genuinely expanded the frontier beyond the seed set
    assert len(exp["seen"]) > 40


def test_snowball_resumes_after_kill_between_run_and_ingest(
    spark, tmp_path_factory
):
    """Crash window: pages fetched but their links never admitted. A
    fresh attach must still reach the full closure — the first cycle
    reprocesses all docs' links (idempotent through the seen set)."""
    from news_crawler_spark import oracle

    wd = str(tmp_path_factory.mktemp("snowball_resume"))
    e1 = CrawlEngine(spark, wd)
    e1.ingest(synth.build_seed_list(spark, 40))
    # simulate the crash: crawl to quiescence, then DIE before the
    # discovery ingest ever runs
    for _ in e1.run():
        pass

    e2 = CrawlEngine(spark, wd)  # fresh attach on the same catalog
    e2.run_snowball(max_cycles=20, universe=150)
    exp = oracle.snowball(
        [synth.seed_row(i) for i in range(40)], universe=150
    )
    ff = e2.final_frontier().select("canonical_url", "status").collect()
    assert {r.canonical_url for r in ff} == exp["seen"]
    assert {
        r.canonical_url for r in ff if r.status == "completed"
    } == exp["completed"]


def test_snowball_with_mor_and_cuckoo_prefilter(spark, tmp_path_factory):
    """Feature-matrix composition: open-web discovery through the
    merge-on-read pending state AND the persistent cuckoo seen-filter
    must land on the identical closure — the prefilter's probe/fold
    path is exercised by every discovery cycle's ingest_incremental."""
    from news_crawler_spark import oracle

    wd = str(tmp_path_factory.mktemp("snowball_mor"))
    eng = CrawlEngine(
        spark, wd, merge_mode="mor", seen_prefilter="cuckoo", compact_every=3
    )
    eng.ingest(synth.build_seed_list(spark, 40))
    eng.run_snowball(max_cycles=20, universe=150)
    exp = oracle.snowball(
        [synth.seed_row(i) for i in range(40)], universe=150
    )
    ff = eng.final_frontier().select("canonical_url", "status").collect()
    assert {r.canonical_url for r in ff} == exp["seen"]
    assert {
        r.canonical_url for r in ff if r.status == "completed"
    } == exp["completed"]
