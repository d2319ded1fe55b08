"""Link-discovery sources: archive/RSS/sitemap scans as dataflow
(SURVEY.md §2.1 S1-S6, §2.2 P4-P6, §2.5 T2-T4).

The reference discovers links by paginating per-day HTML archives (ISNA
collectors/isna/daily_links_collector.py:138-186, IRNA :122-175), RSS
feeds (collectors/irna/fresh_links_collector.py:28-103), and per-day
sitemaps (Tasnim collectors/tasnim/daily_links_collector.py:23-67, Donya
:62-118, Shargh :61-166) — per-row Python loops over parsed pages.

Spark restatement: discovery snapshots land as ONE table
``feed_pages(source, feed_kind, day, page_idx, items array<struct<...>>)``
(each row = one fetched archive page / feed / sitemap, whatever the
transport), and link collection is a single declarative pass:
explode → day-window filter (P4) → future-date skip (P5) → non-article
URL filter (P6) → newest-first order (T2) → per-source cursor cut (T3)
→ new cursors (T4). In-sandbox the snapshots are synthesized
deterministically from the same hash functions as the page corpus.
"""

from __future__ import annotations

from datetime import date, datetime, time, timedelta
from typing import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from . import synth
from .functions.xxh64 import xxh64_str

FEED_PAGES_SCHEMA = (
    "source string, feed_kind string, day date, page_idx int, "
    "items array<struct<url:string,published_ts:timestamp,pub_raw:string>>"
)

# F5: raw date-string transports, per feed kind. RSS pubDate arrives as
# RFC-822 (collectors/irna/fresh_links_collector.py:73-77); sitemap
# lastmod as ISO-8601 (donyaye_eghtesad/daily_links_collector.py:77,105).
# Archive pages carry Persian datetimes, parsed upstream (functions/
# persian.py) into typed timestamps.
_RFC822_KINDS = ("rss",)
_ISO_KINDS = ("sitemap", "sitemap_index", "sitemap_b64")

_FEED_KIND = {"isna": "archive", "irna": "rss", "tasnim": "sitemap",
              "donya": "sitemap_index", "shargh": "sitemap_b64"}

_EPOCH_DAY = date(2024, 6, 1)


def _u(h: int) -> int:
    return h & 0xFFFFFFFFFFFFFFFF


def feed_page_items(source: str, day: date, page_idx: int) -> list[dict]:
    """Deterministic items of one discovery page: mostly same-day article
    URLs, plus the noise the reference filters out — a few next-day items
    (P5 future-date skip), prev-day spillover (P4 day-window), and
    digit-free section URLs (P6 non-article filter)."""
    key = f"page:{source}:{day.isoformat()}:{page_idx}"
    n = 6 + _u(xxh64_str(key)) % 6
    items = []
    for slot in range(n):
        h = _u(xxh64_str(f"{key}:{slot}"))
        art_key = h % 5000
        src, _host, url = synth.clean_url(art_key)
        if src != source:  # keep per-source pages on their own URLs
            url = url.replace(_host_of(src), _host_of(source))
        kind = h % 10
        if kind == 7:  # non-article URL: no digits (P6)
            url = f"https://{_host_of(source)}/section/politics-overview"
            ts = datetime.combine(day, time(12, 0))
        elif kind == 8:  # future-dated leak (P5)
            ts = datetime.combine(day + timedelta(days=1), time(1, 0))
        elif kind == 9:  # previous-day spillover (P4)
            ts = datetime.combine(day - timedelta(days=1), time(23, 0))
        else:
            ts = datetime.combine(day, time(0, 0)) + timedelta(
                seconds=int(h % 86400)
            )
        # F5: RSS/sitemap transports carry the date as a STRING only —
        # the typed timestamp must come from parsing it (collect_links);
        # archive items are born typed (Persian datetime path).
        fk = _FEED_KIND[source]
        if fk in _RFC822_KINDS:
            items.append({
                "url": url, "published_ts": None,
                "pub_raw": ts.strftime("%a, %d %b %Y %H:%M:%S +0000"),
            })
        elif fk in _ISO_KINDS:
            items.append({
                "url": url, "published_ts": None,
                "pub_raw": ts.strftime("%Y-%m-%dT%H:%M:%S+00:00"),
            })
        else:
            items.append({"url": url, "published_ts": ts, "pub_raw": None})
    return items


def _host_of(source: str) -> str:
    return {s: h for s, h, _w in synth.SOURCES}[source]


def synth_feed_pages(
    spark: SparkSession, days: int = 3, pages_per_day: int = 4
) -> DataFrame:
    """Synthetic discovery snapshot table — distributed generation, one
    row per (source, day, page)."""
    srcs = [s for s, _h, _w in synth.SOURCES]
    n = len(srcs) * days * pages_per_day
    rng = spark.range(0, n, numPartitions=spark.sparkContext.defaultParallelism)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i in pdf["id"]:
                i = int(i)
                source = srcs[i % len(srcs)]
                day = _EPOCH_DAY + timedelta(days=(i // len(srcs)) % days)
                page_idx = i // (len(srcs) * days)
                rows.append(
                    {
                        "source": source,
                        "feed_kind": _FEED_KIND[source],
                        "day": day,
                        "page_idx": page_idx,
                        "items": feed_page_items(source, day, page_idx),
                    }
                )
            yield pd.DataFrame(rows)

    return rng.mapInPandas(gen, schema=FEED_PAGES_SCHEMA)


def parse_pub_date(feed_kind: Column | str, pub_raw: Column | str) -> Column:
    """F5: typed timestamp from the transport's raw date string.

    RSS pubDate is RFC-822 ("Mon, 03 Jun 2024 14:22:05 +0000",
    collectors/irna/fresh_links_collector.py:73-77); sitemap lastmod is
    ISO-8601 ("2024-06-03T14:22:05+00:00",
    donyaye_eghtesad/daily_links_collector.py:77,105). Spark's pattern
    letter 'E' is format-only, so the RFC-822 weekday prefix is stripped
    before ``to_timestamp`` — exactly what feedparser does with it
    (ignores it; the date fields are authoritative). Unparseable strings
    → NULL → dropped by the day-window filter, never a job abort:
    ``try_to_timestamp``, because ANSI ``to_timestamp`` aborts the whole
    job on one malformed feed entry — at web scale there is always one.
    """
    kind = F.col(feed_kind) if isinstance(feed_kind, str) else feed_kind
    raw = F.col(pub_raw) if isinstance(pub_raw, str) else pub_raw
    rfc822 = F.try_to_timestamp(
        F.regexp_replace(raw, r"^[A-Za-z]{3},\s*", ""),
        F.lit("dd MMM yyyy HH:mm:ss Z"),
    )
    iso = F.try_to_timestamp(raw, F.lit("yyyy-MM-dd'T'HH:mm:ssXXX"))
    return F.when(kind.isin(*_RFC822_KINDS), rfc822).otherwise(iso)


def collect_links(feed_pages: DataFrame) -> DataFrame:
    """S1-S6 link collection as one declarative pass.

    explode(items) → type the publish date (born-typed for archive kinds,
    string-parsed RFC-822/ISO for RSS/sitemap kinds — F5) → keep same-day
    articles only (P4+P5: ``to_date(ts) == page day`` subsumes both the
    day-window and the future-date skip) → drop URLs without a digit (P6,
    shargh/historical_links_collector.py:133-136) → newest-first (T2).
    One scan, no python.
    """
    it = F.explode("items").alias("it")
    return (
        feed_pages.select("source", "feed_kind", "day", it)
        .select(
            "source",
            "day",
            F.col("it.url").alias("url"),
            F.coalesce(
                F.col("it.published_ts"),
                parse_pub_date(F.col("feed_kind"), F.col("it.pub_raw")),
            ).alias("published_ts"),
        )
        .filter(F.to_date("published_ts") == F.col("day"))     # P4 + P5
        .filter(F.col("url").rlike("[0-9]"))                    # P6
        .orderBy(F.desc("published_ts"), F.desc("url"))         # T2
    )


def cursor_cut(links: DataFrame, cursors: DataFrame) -> DataFrame:
    """T3: per-source 'take until last seen' — keep links strictly newer
    in the feed order than the cursor URL (the reference iterates
    newest→oldest and stops at ``last_seen_link``,
    collectors/irna/fresh_links_collector.py:125-137).

    ``cursors`` is small (one row per source: source, last_url) →
    broadcast. Links whose source has no cursor pass through whole.

    Feed order is (published_ts DESC, url DESC) — ONE tie-break direction
    everywhere: "newer" means the tuple (published_ts, url) is strictly
    greater, which is exactly what ``latest_cursors`` maximizes and what
    ``streaming.cursor_cut_stream`` keeps. A late link that ties the
    cursor's timestamp is kept iff its url sorts above the cursor url —
    identical in batch and streaming, so no permanent drops from
    batch/stream disagreement.
    """
    w = Window.partitionBy("source").orderBy(
        F.desc("published_ts"), F.desc("url")
    )
    ranked = links.withColumn("__rn", F.row_number().over(w))
    cur = ranked.join(
        F.broadcast(cursors.select("source", "last_url")), "source", "left"
    )
    cut_rank = (
        cur.filter(F.col("url") == F.col("last_url"))
        .groupBy("source")
        .agg(F.min("__rn").alias("__cut"))
    )
    return (
        cur.join(F.broadcast(cut_rank), "source", "left")
        .filter(F.col("__cut").isNull() | (F.col("__rn") < F.col("__cut")))
        .drop("__rn", "__cut", "last_url")
    )


def latest_cursors(links: DataFrame) -> DataFrame:
    """T4: the new per-source cursor = newest link in this sweep."""
    return links.groupBy("source").agg(
        F.max_by("url", F.struct("published_ts", "url")).alias("last_url"),
        F.max("published_ts").alias("last_ts"),
    )


def discover(
    spark: SparkSession,
    feed_pages: DataFrame,
    cursors: DataFrame | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Full discovery sweep: (fresh links ready for engine ingest, new
    cursors). The output schema matches schemas.SEED_LIST + day."""
    links = collect_links(feed_pages)
    if cursors is not None:
        links = cursor_cut(links, cursors)
    fresh = links.select(
        "source",
        "url",
        "published_ts",
        F.col("published_ts").alias("discovery_time"),
    )
    return fresh, latest_cursors(links)


def recrawl_schedule(
    events: DataFrame,
    key_col: str = "event_type",
    ts_col: str = "ts",
    window_s: int = 3 * 86400,
    target_batch: int = 50,
    min_s: int = 60,
    max_s: int = 86400,
) -> DataFrame:
    """Freshness-driven recrawl scheduling: pick each source's next poll
    interval so a poll catches ~``target_batch`` new items, from the
    discovery rate observed over the trailing ``window_s`` — the
    decision the reference's fresh-links scheduler makes per feed
    (news_fresh_links_scheduler.py:29-68 polls on a fixed cadence and
    counts fresh links; this closes the loop rate → cadence). A source
    discovering n items per window gets interval
    clamp(⌈target·window/n⌉, min_s, max_s) — exact integer ceil-div on
    epoch seconds, so a SQL twin replays every interval bit-for-bit.

    Scale shape: one 1-row max aggregate broadcast back, a pushed-down
    timestamp filter, one per-source count — O(sources) output. Sources
    with zero recent discoveries are absent (poll them at max_s by
    default at the call site).

    Returns ``(source, n_recent, next_poll_s)``.
    """
    mx = events.agg(F.max(ts_col).alias("__mx"))
    # .cast("timestamp").cast("long"): NTZ→long needs the two-step (the
    # a8 epoch recipe, matches the twin's floor(epoch(...)))
    tl = F.col(ts_col).cast("timestamp").cast("long")
    n = (
        events.join(F.broadcast(mx))
        .filter(tl > F.col("__mx").cast("timestamp").cast("long") - window_s)
        .groupBy(F.col(key_col).alias("source"))
        .agg(F.count("*").alias("n_recent"))
    )
    a = int(window_s) * int(target_batch)
    delay = F.least(
        F.lit(max_s).cast("long"),
        F.greatest(
            F.lit(min_s).cast("long"),
            F.expr(f"(cast({a} as bigint) + n_recent - 1) div n_recent"),
        ),
    )
    return n.select("source", "n_recent", delay.alias("next_poll_s"))


def change_rate_schedule(
    polls: DataFrame,
    interval_s: int = 3600,
    max_factor: int = 30,
) -> DataFrame:
    """Per-PAGE adaptive recrawl from observed change rates — the
    Cho & Garcia-Molina Poisson estimator (the page-granular
    counterpart of :func:`recrawl_schedule`'s per-source rate loop):
    a page polled ``n`` times at interval I that showed a change on
    ``X`` of them has estimated change rate
    λ̂·I = −ln((n−X+½)/(n+½)), and the next visit is scheduled at
    ≈1/λ̂, clamped to [I, max_factor·I].

    Exact-integer formulation (the x25 micro-nat discipline): doubling
    clears the ½-corrections, so with L(x) = round(ln(x)·10⁶),
    ``lam_micro = L(2n+1) − L(2(n−X)+1)`` is λ̂·I in integer micro-nats
    and ``next_interval_s = clamp(I·10⁶ div lam_micro)`` is one integer
    division — no float ratio ever materializes, and a never-changed
    page (X=0 ⇒ lam_micro=0) takes the max-interval branch explicitly
    instead of dividing by zero (which ANSI mode would fail).

    Input ``(page_id, changed)`` — one row per poll; output
    ``(page_id, n_polls, n_changed, lam_micro, next_interval_s)``.
    Scale shape: one partial-agg groupBy(page_id) over the poll log,
    then a pure projection; the poll log is the big table and it is
    touched exactly once."""
    lmicro = lambda c: F.round(  # noqa: E731
        F.log(c.cast("double")) * F.lit(1_000_000.0)
    ).cast("long")
    agg = polls.groupBy("page_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_polls"),
        F.sum(F.col("changed").cast("long")).cast("long").alias("n_changed"),
    )
    lam = agg.select(
        "page_id",
        "n_polls",
        "n_changed",
        (
            lmicro(F.lit(2) * F.col("n_polls") + 1)
            - lmicro(F.lit(2) * (F.col("n_polls") - F.col("n_changed")) + 1)
        ).alias("lam_micro"),
    )
    lo, hi = interval_s, interval_s * max_factor
    nxt = F.when(
        F.col("lam_micro") > 0,
        F.least(
            F.lit(hi).cast("long"),
            F.greatest(
                F.lit(lo).cast("long"),
                F.expr(f"cast({interval_s} as bigint) * 1000000 div lam_micro"),
            ),
        ),
    ).otherwise(F.lit(hi).cast("long"))
    return lam.select(
        "page_id", "n_polls", "n_changed", "lam_micro", nxt.alias("next_interval_s")
    )


def sitemap_staleness(
    entries: DataFrame, captures: DataFrame
) -> DataFrame:
    """Sitemap-lastmod-driven recrawl selection: join what the host
    ADVERTISES changed (sitemap ``<lastmod>``) against what the archive
    HOLDS (the latest-capture table ``archive.cdx_resolve`` produces)
    and classify every advertised URL — ``unseen`` (never captured →
    crawl), ``stale`` (lastmod newer than our latest capture →
    refetch; ``staleness_s`` = how far behind), ``fresh`` (no fetch
    needed). This closes the third recrawl loop: ``recrawl_schedule``
    paces by observed discovery rate, ``change_rate_schedule`` by
    per-page change history, and this one by what the origin itself
    declares — the cheapest signal (one sitemap fetch covers 50k URLs)
    and the reference ignores it entirely (its sitemap collectors read
    URLs and dates for DISCOVERY only; nothing compares lastmod to
    stored state).

    Input: ``entries (url, lastmod_ts)`` — a sitemap batch (duplicate
    urls collapse to max lastmod here: sitemap files may repeat a URL);
    ``captures (url, latest_ts)`` — the latest-capture table. Output:
    one row per advertised URL: ``(url, lastmod_ts, latest_ts, status,
    staleness_s)``.

    Scale shape: the archive side is NEVER shuffled — a sitemap batch
    is bounded (≤50k URLs/file by spec), so the capture table is
    pruned with a broadcast left-semi join (the scan streams past the
    broadcast URL set; on a urlkey-partitioned layout the runtime
    filter prunes files too), and the surviving ≤|entries| capture
    rows broadcast back into the left join that preserves every entry.
    Two broadcasts of the bounded side; zero exchanges of the big
    one."""
    e = entries.groupBy("url").agg(F.max("lastmod_ts").alias("lastmod_ts"))
    matched = captures.join(
        F.broadcast(e.select("url")), "url", "left_semi"
    ).select("url", "latest_ts")
    j = e.join(F.broadcast(matched), "url", "left")
    status = (
        F.when(F.col("latest_ts").isNull(), "unseen")
        .when(F.col("lastmod_ts") > F.col("latest_ts"), "stale")
        .otherwise("fresh")
    )
    staleness = F.when(
        F.col("latest_ts").isNotNull()
        & (F.col("lastmod_ts") > F.col("latest_ts")),
        F.col("lastmod_ts") - F.col("latest_ts"),
    ).otherwise(F.lit(0))
    return j.select(
        "url",
        "lastmod_ts",
        "latest_ts",
        status.alias("status"),
        staleness.cast("long").alias("staleness_s"),
    )


def sitemap_tree(
    edges: DataFrame, roots: DataFrame, max_depth: int = 5
) -> DataFrame:
    """Expand nested sitemap INDEXES to their page URLs, attributing
    every URL to the root index it came from: ``(root, url, depth)``
    where depth = how many sitemap FILES were fetched on the shortest
    path (the root itself is fetch #1, so a urlset entry directly in
    the root has depth 1).

    Input ``edges (loc, child, kind)``: one row per entry of a fetched
    sitemap file — ``kind='sitemap'`` is a ``<sitemapindex>`` child
    (another file to fetch), ``kind='url'`` is a ``<urlset>`` page URL.
    ``roots (root)``: the index URLs advertised in robots.txt
    (``archive.robots_sitemaps`` produces exactly this). The protocol
    CAPS everything: 50k entries per file forces big sites into index
    trees (the reference's sources each fit one flat sitemap,
    collectors/*/sitemap readers, so it never recurses; an open crawl
    must), and ``max_depth`` bounds the walk — malformed or adversarial
    indexes that cycle (a child pointing back at an ancestor) are cut
    by the visited set, not by the depth cap alone.

    Spark-first shape: level-unrolled BFS like graph.bfs_depth, but
    keyed per (root, loc) because attribution matters — the frontier is
    |sitemap FILES| rows (≤ tens of thousands for even a huge site:
    50k² URLs via one nesting level), so it stays broadcast-side
    against the edge list; page URLs (the 10^9-row output) are emitted
    once per level and only union+min-deduped at the end — they never
    enter the iterated frontier. The visited anti-join per level keeps
    a cyclic index from amplifying: each (root, loc) is expanded at
    most once, at its minimum depth (BFS order guarantees first visit =
    min depth, so the end min() over URL emissions only reconciles
    DIAMOND re-discoveries — two indexes listing the same child file)."""
    idx = edges.filter(F.col("kind") == "sitemap").select(
        F.col("loc").alias("loc"), F.col("child").alias("child")
    )
    leaves = edges.filter(F.col("kind") == "url").select(
        F.col("loc").alias("loc"), F.col("child").alias("url")
    )
    frontier = (
        roots.select(F.col("root"))
        .distinct()
        .select("root", F.col("root").alias("loc"), F.lit(1).cast("long").alias("depth"))
        .localCheckpoint(eager=True)
    )
    visited = frontier.select("root", "loc").localCheckpoint(eager=True)
    urls = [
        frontier.join(leaves, "loc").select("root", "url", "depth")
    ]
    for level in range(2, max_depth + 1):
        nxt = (
            frontier.join(idx, "loc")
            .select("root", F.col("child").alias("loc"))
            .distinct()
            .join(visited, ["root", "loc"], "left_anti")
            .withColumn("depth", F.lit(level).cast("long"))
            .localCheckpoint(eager=True)
        )
        if nxt.limit(1).count() == 0:
            break
        visited = visited.unionByName(nxt.select("root", "loc")).localCheckpoint(
            eager=True
        )
        urls.append(nxt.join(leaves, "loc").select("root", "url", "depth"))
        frontier = nxt
    out = urls[0]
    for u in urls[1:]:
        out = out.unionByName(u)
    return out.groupBy("root", "url").agg(
        F.min("depth").cast("long").alias("depth")
    )


def refresh_allocation(
    pages: DataFrame,
    budget: int,
    f_max: int = 8,
    scale: int = 10**9,
) -> DataFrame:
    """Allocate a global recrawl budget across pages to maximize
    steady-state freshness (Cho & Garcia-Molina, "Effective Page
    Refresh Policies for Web Crawlers", TODS'03): input
    ``pages (page_id, lam)`` with ``lam`` = observed changes per period
    (``change_rate_schedule``'s integer estimator feeds this), output
    ``(page_id, lam, f_alloc)`` with Σ f_alloc ≤ budget, f_alloc ≤
    f_max. The reference refreshes every source on one fixed 15 s
    cadence regardless of change rate or capacity
    (news_fresh_links_scheduler.py:175); at five sources that is fine,
    at 10^10 pages the budget IS the constraint and allocation is the
    policy.

    Freshness model: a page crawled ``f`` times per period with change
    rate ``lam`` is fresh f/(f+lam) of the time; the marginal gain of
    the f-th crawl is lam/((f+lam)(f+lam-1)) — concave in f, so the
    global optimum is exactly the budget-many LARGEST marginal gains,
    and since the gain of the FIRST crawl is 1/(1+lam), the famous
    counterintuitive result falls out: under a tight budget the
    fastest-changing pages get FEWER crawls, not more (chasing a page
    that changes faster than you can fetch buys almost no freshness).
    t8/t9/t10 SCORE pages; this operator ALLOCATES — the step that
    turns change-rate estimates into a crawl plan that respects the
    fleet's actual capacity.

    Spark-first shape — never a global sort: gains are exact scaled
    integers (``scale·lam div ((f+lam)(f+lam-1))`` — floor division in
    both engines, so the DuckDB twin is bit-identical), and the
    selection threshold θ* (the Lagrange multiplier) is found by
    BINARY SEARCH over integer gain values: O(log scale) ≈ 30 probes,
    each ONE combiner-reduced aggregate over the page table (the
    per-page gains live in a length-f_max array column, counted with a
    codegen'd filter+size — no explode). Only the TIE BOUNDARY (steps
    whose gain equals θ*−1) is ever exploded and sorted — a sliver,
    deterministically ordered by (page_id, f) so the greedy tie-break
    is reproducible. Steps with zero integer gain are never allocated
    even under a loose budget (a crawl buying < 1/scale freshness is
    not worth a fetch)."""
    gains = F.array(
        *[
            F.expr(
                f"CAST({scale} AS BIGINT) * lam "
                f"DIV ((lam + {f}) * (lam + {f} - 1))"
            )
            for f in range(1, f_max + 1)
        ]
    )
    base = (
        pages.select(
            F.col("page_id").cast("long").alias("page_id"),
            F.col("lam").cast("long").alias("lam"),
        )
        .withColumn("gains", gains)
        .localCheckpoint(eager=True)
    )

    def count_at_least(theta: int) -> int:
        return base.agg(
            F.sum(
                F.size(F.filter("gains", lambda g: g >= F.lit(int(theta))))
            ).alias("n")
        ).collect()[0]["n"]

    lo, hi = 1, scale + 1  # smallest θ with count(gain ≥ θ) ≤ budget
    while lo < hi:
        mid = (lo + hi) // 2
        if count_at_least(mid) > budget:
            lo = mid + 1
        else:
            hi = mid
    theta = lo
    f_base = F.size(F.filter("gains", lambda g: g >= F.lit(int(theta))))
    alloc = base.select("page_id", "lam", f_base.alias("f_alloc"))
    n_hi = count_at_least(theta)
    remaining = budget - n_hi
    if remaining > 0 and theta > 1:
        t = theta - 1
        ties = (
            base.select(
                "page_id", F.posexplode("gains").alias("f0", "g")
            )
            .filter(F.col("g") == t)
            .select("page_id", (F.col("f0") + 1).alias("f"))
        )
        # the boundary sliver: a window over ties only, never the table
        from pyspark.sql import Window

        picked = (
            ties.withColumn(
                "rn",
                F.row_number().over(
                    Window.orderBy(F.col("page_id"), F.col("f"))
                ),
            )
            .filter(F.col("rn") <= remaining)
            .groupBy("page_id")
            .agg(F.count("*").alias("f_tie"))
        )
        alloc = (
            alloc.join(picked, "page_id", "left")
            .select(
                "page_id",
                "lam",
                (F.col("f_alloc") + F.coalesce("f_tie", F.lit(0)))
                .cast("long")
                .alias("f_alloc"),
            )
        )
    else:
        alloc = alloc.select(
            "page_id", "lam", F.col("f_alloc").cast("long").alias("f_alloc")
        )
    return alloc


def outlinks_of(docs: DataFrame, universe: int = 400) -> DataFrame:
    """Seed-list-shaped outlinks of fetched pages — the discovery stage
    of a snowball crawl. In production this parses ``<a href>`` out of
    the stored payload (the fused fetch stage already runs every page
    through python, so extraction is a column away); against the
    synthetic network it replays ``synth.page_outlinks`` — the same
    pure function of the page the closure oracle uses, which is what
    makes the engine-vs-oracle fixpoint comparison exact.

    Scale shape: one ``mapInPandas`` pass over (url) — column-pruned to
    8 bytes + string per doc — emitting ≤3 rows per page; everything
    downstream (canonicalize, first-wins, seen anti-join, filter fold)
    is ``ingest_incremental``'s existing machinery. The links table is
    never collected."""
    from . import schemas

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: list[dict] = []
            for u in pdf["url"]:
                rows.extend(synth.page_outlinks(u, universe))
            if rows:
                yield pd.DataFrame(rows)

    return docs.select("url").mapInPandas(gen, schema=schemas.SEED_LIST)
