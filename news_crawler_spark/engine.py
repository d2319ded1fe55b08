"""The crawl engine: deterministic round-based frontier iteration.

One round = one pure-DataFrame job, the Spark restatement of the
reference's ``process_batch`` loop
(news_historical_page_scheduler.py:268-528, SURVEY.md §3.2):

  pending ∧ tried<3  ──robots──▶  per-host top-k pop (token budgets)
        ──fetch (mapInPandas)──▶  ok? extract spans → documents
                                  fail? tried_count+1 (FAILED at 3)
        ──MERGE status──▶ next frontier snapshot (+ lineage, pops, tokens)

Determinism contract: every pop is ranked by the total order
(priority, published_ts, url_hash) within a host, budgets evolve by the
same token arithmetic as the oracle, and fetch outcomes are a pure function
of the canonical URL — so the (round, host, url) pop sequence and the final
seen-set/status map are bit-reproducible under any partitioning, any
parallelism, and across kill/resume.

Scale shape (10^10-row frontier):
- only the *pending* slice is ever rewritten; completed/failed rows are
  append-only (catalog.py) — per-round I/O is O(|pending| + |popped|),
  not O(|frontier|).
- per-round dataflow: one broadcast join (budgets), one two-phase salted
  top-k (parallelism = hosts × salts, never just hosts), one
  hash-partitioned anti-join keyed by url_hash (popped side broadcasts
  when small). Robots rules evaluate as a broadcast join + higher-order
  functions — zero shuffle on the frontier side. The fetch stage is ONE
  fused python pass (fetch+extract), explicitly partitioned by rows (not
  bytes — AQE's byte-based coalescing undersizes CPU-bound python stages).
  No driver-side row materialization anywhere — counters come from
  lineage aggregates.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import schemas, synth
from .catalog import SnapshotCatalog
from .functions.urls import with_url_columns
from .operators import frontier as frontier_ops
from .operators import seen_set
from .operators.extract import documents_from_fetch_extract
from .operators.fetch import fetch_extract_pages
from .operators.seen_filter import SeenFilterStore


@dataclass
class RoundStats:
    round_no: int
    popped: int
    fetched_ok: int
    fetched_fail: int
    pending_left: int


def merge_pending(
    spark: SparkSession,
    base: DataFrame,
    adds: list[DataFrame],
    tombs: list[DataFrame],
) -> DataFrame:
    """Latest-event-wins merge-on-read reconstruction (the Iceberg MOR
    analog): base snapshot ⊖ any key with a delta event, ⊕ the rows
    whose NEWEST event is an addition. ``adds``/``tombs`` carry an
    ``__r`` round column; a round pops a row (tombstone) and may re-pend
    it (addition) in the same round — the addition wins ties
    (``__ar >= __tr``). Module-level so the oracle gate
    (analytics.j13_mor_merge) replays the exact reconstruction the
    engine's mor mode runs per round; key-grouped aggregates get
    map-side partial combine and only delta keys ever shuffle — the
    base joins the (small) touched-key set broadcast-anti."""
    keys = ["url_hash", "canonical_url"]
    cols = base.columns
    empty_add = spark.createDataFrame([], base.schema).withColumn("__r", F.lit(0))
    add_all = empty_add
    for a in adds:
        add_all = add_all.unionByName(a)
    latest_add = add_all.groupBy(*keys).agg(
        F.max_by(F.struct(*cols), F.col("__r")).alias("__row"),
        F.max("__r").alias("__ar"),
    )
    if tombs:
        tomb_all = tombs[0]
        for t in tombs[1:]:
            tomb_all = tomb_all.unionByName(t)
        latest_tomb = tomb_all.groupBy(*keys).agg(F.max("__r").alias("__tr"))
    else:
        latest_tomb = spark.createDataFrame(
            [], "url_hash long, canonical_url string, __tr int"
        )
    ev = latest_add.join(latest_tomb, keys, "full")
    survivors = ev.filter(
        F.col("__ar").isNotNull()
        & (F.col("__tr").isNull() | (F.col("__ar") >= F.col("__tr")))
    ).select("__row.*")
    touched = ev.select(*keys)
    return base.join(touched, keys, "left_anti").unionByName(survivors)


class CrawlEngine:
    def __init__(
        self,
        spark: SparkSession,
        workdir: str,
        robots: DataFrame | None = None,
        politeness: DataFrame | None = None,
        default_refill: int = 20,
        max_retries: int = schemas.MAX_RETRIES,
        merge_mode: str = "cow",
        compact_every: int = 8,
        seen_prefilter: str | None = None,
        filter_buckets: int = 64,
        filter_capacity: int = 1 << 17,
        robots_grammar: str = "prefix",
        param_rules: DataFrame | None = None,
    ):
        """``merge_mode``:

        - ``"cow"`` (default): copy-on-write — the pending slice is
          rewritten whole each round (simple; write I/O O(|pending|)).
        - ``"mor"``: merge-on-read — each round writes only a tombstone
          delta (popped keys) and an addition delta (retry re-pends),
          write I/O O(|popped|); reads reconstruct base ⊖ tombstones ⊕
          additions, and every ``compact_every`` rounds the state is
          compacted back to a full snapshot (bounding read depth). This
          is the Iceberg MERGE-on-read analog and the mode that matters
          at 10^10 pending rows, where rewriting the slice per round IS
          the I/O bill. Equivalence with cow is fixture-pinned
          (tests/test_crawl_engine.py).
        """
        if robots_grammar not in ("prefix", "rfc9309"):
            raise ValueError(f"unknown robots_grammar: {robots_grammar!r}")
        self.spark = spark
        self.catalog = SnapshotCatalog(spark, workdir)
        # "rfc9309" evaluates rules through the wildcard matcher
        # (frontier.allowed_by_robots_wildcards: '*' / trailing '$');
        # plain prefixes are a strict subset of that grammar, so on
        # prefix-only rule sets the two modes produce the identical
        # crawl (order-equivalence pinned in test_crawl_engine).
        self.robots_grammar = robots_grammar
        # learned DUST strip rules (a prior crawl's dust_rules() output):
        # applied to absolute seed URLs BEFORE canonicalization, so
        # learned session-id aliases collapse into one seen-set key and
        # are never fetched twice (dust.apply_param_rules; rules are
        # broadcast — the seed stream is never shuffled by this)
        self.param_rules = param_rules
        self.robots = robots if robots is not None else synth.robots_df(spark)
        self.politeness = (
            politeness if politeness is not None else synth.politeness_df(spark)
        )
        self.default_refill = default_refill
        self.max_retries = max_retries
        if merge_mode not in ("cow", "mor"):
            raise ValueError(f"merge_mode must be cow|mor, got {merge_mode!r}")
        self.merge_mode = merge_mode
        self.compact_every = max(1, compact_every)
        # approximate-membership pre-pass for the incremental-ingest
        # anti-join ("bloom" | "cuckoo" | None): PERSISTENT per-bucket
        # filter state in the catalog, folded incrementally per committed
        # ingest — probing costs O(|batch| + filter state), never a
        # seen-set shuffle (round-2 verdict item 1). Output identical to
        # the exact path either way.
        self.seen_prefilter = seen_prefilter
        self.filter_store = (
            SeenFilterStore(
                self.catalog,
                kind=seen_prefilter,
                n_buckets=filter_buckets,
                capacity_per_bucket=filter_capacity,
                compact_every=self.compact_every,
            )
            if seen_prefilter
            else None
        )
        # cached eligible-pending count, maintained by lineage arithmetic
        # (eligible' = eligible - popped + re-pended); None = recount once
        self._eligible_left: int | None = None
        # pop_round salt count sized to the largest configured budget
        # (salts × budget bounds the phase-2 re-rank input per host);
        # resolved lazily from the politeness table on first step — one
        # 1-row agg, once per engine lifetime
        self._pop_salts: int | None = None

    # ------------------------------------------------------------- pending io
    def _read_pending(self, round_no: int) -> DataFrame:
        """The pending slice as of ``round_no``. cow: read the snapshot.
        mor: latest-event-wins reconstruction — base snapshot ⊖ any key
        with a delta event, ⊕ the rows whose newest event is an addition
        (a round pops a row [tombstone] and may re-pend it [addition] in
        the same round: the addition wins ties)."""
        if self.merge_mode != "mor":
            return self.catalog.read("pending", round_no)
        base_r = next(
            r for r in range(round_no, -1, -1)
            if self.catalog.exists("pending", r)
        )
        base = self.catalog.read("pending", base_r)
        adds, tombs = [], []
        for r in range(base_r + 1, round_no + 1):
            if self.catalog.exists("pending_add", r):
                adds.append(
                    self.catalog.read("pending_add", r).withColumn("__r", F.lit(r))
                )
            if self.catalog.exists("pending_tomb", r):
                tombs.append(
                    self.catalog.read("pending_tomb", r).withColumn("__r", F.lit(r))
                )
        if not adds and not tombs:
            return base
        return merge_pending(self.spark, base, adds, tombs)

    def _write_pending(
        self,
        round_no: int,
        next_pending: DataFrame,
        tombstones: DataFrame,
        additions: DataFrame,
    ) -> None:
        """cow / mor-compaction rounds: materialize the full slice.
        mor delta rounds: write only O(|popped|) tombstone keys +
        re-pend rows."""
        if self.merge_mode == "mor" and round_no % self.compact_every != 0:
            self.catalog.write(
                "pending_tomb", round_no, tombstones.coalesce(4)
            )
            self.catalog.write("pending_add", round_no, additions.coalesce(4))
        else:
            self.catalog.write("pending", round_no, next_pending)

    def _read_accreted(self, table: str, upto_round: int) -> DataFrame:
        """Generic base+delta read for an append-only table folded on the
        compaction cadence: newest ``{table}_base`` snapshot ⊕ per-round
        deltas after it. Bounds the read to O(compact_every) dirs however
        many rounds have run (done since round 2 for ``done``; round 4
        extends it to the ``pops``/``lineage`` logs)."""
        if upto_round is None:
            # callers pass catalog.latest_round(): None = nothing committed
            # yet — the same clean signal the old read_all path raised
            # (ADVICE round 4: range(lo+1, None+1) was a TypeError)
            raise FileNotFoundError(f"no committed snapshots for {table}")
        base_r = self.catalog.latest_existing(f"{table}_base", upto_round)
        df, lo = None, -1
        if base_r is not None:
            df = self.catalog.read(f"{table}_base", base_r)
            lo = base_r
        for r in range(lo + 1, upto_round + 1):
            if self.catalog.exists(table, r):
                d = self.catalog.read(table, r)
                df = d if df is None else df.unionByName(d)
        if df is None:
            raise FileNotFoundError(f"no committed snapshots for {table}")
        return df

    def _read_done(self, upto_round: int) -> DataFrame:
        """All completed/failed rows through ``upto_round``."""
        return self._read_accreted("done", upto_round)

    # --------------------------------------------------------------- seen keys
    # ``seen_keys`` = every (url_hash, canonical_url) ever admitted — the
    # reference's unique link index (db_models.py:40). Kept as one range-
    # sorted base snapshot + O(compact_every) per-ingest deltas, so the
    # per-poll seen side reads a BOUNDED number of snapshots instead of
    # unioning one `done` dir per round forever (round-2 verdict item 2).
    def _read_seen_keys(self, upto_round: int) -> DataFrame:
        base_r = self.catalog.latest_existing("seen_keys", upto_round)
        if base_r is None:
            raise RuntimeError("no seen_keys base — ingest() first")
        df = self.catalog.read("seen_keys", base_r)
        for r in range(base_r + 1, upto_round + 1):
            if self.catalog.exists("seen_keys_delta", r):
                df = df.unionByName(self.catalog.read("seen_keys_delta", r))
        return df

    def _write_seen_keys(
        self, round_no: int, new_keys: DataFrame, seen_prev: DataFrame
    ) -> None:
        """Delta write; every ``compact_every``-th ingest folds base+deltas
        into a fresh base, range-sorted on url_hash so parquet min/max
        stats prune the confirm-scan's row groups."""
        base_r = self.catalog.latest_existing("seen_keys", round_no - 1)
        n_deltas = sum(
            1
            for r in range(base_r + 1, round_no)
            if self.catalog.exists("seen_keys_delta", r)
        )
        if n_deltas + 1 >= self.compact_every:
            parts = max(4, self.spark.sparkContext.defaultParallelism)
            self.catalog.write(
                "seen_keys",
                round_no,
                seen_prev.unionByName(new_keys)
                .repartitionByRange(parts, "url_hash")
                .sortWithinPartitions("url_hash"),
            )
        else:
            self.catalog.write("seen_keys_delta", round_no, new_keys.coalesce(4))

    def _prune_seen_deltas(self) -> None:
        """Post-commit: drop snapshots superseded by a newer base/fold —
        deltas at or before the newest seen_keys base, older bases, and
        older filter-state rounds (read paths only ever touch the newest
        of each, so a crash mid-prune just leaves unread garbage)."""
        latest = self.catalog.latest_round()
        if latest is None:
            return
        base_r = self.catalog.latest_existing("seen_keys", latest)
        if base_r is not None:
            self.catalog.prune_upto("seen_keys_delta", base_r)
            self.catalog.prune_upto("seen_keys", base_r - 1)
        # filter-state pruning lives in SeenFilterStore (it prunes its
        # own superseded bases/deltas at compaction/rebuild time)
        cur_r = self.catalog.latest_existing("cursors", latest)
        if cur_r is not None:
            self.catalog.prune_upto("cursors", cur_r - 1)
        self.catalog.prune_upto("tokens", latest - 1)
        if self.merge_mode != "mor":
            self.catalog.prune_upto("pending", latest - 1)

    # ----------------------------------------------------------------- cursors
    # cursors(source, last_url, published_ts, url_hash, round): the newest
    # admitted link per source under the (published_ts, url_hash) total
    # order. The ordering keys are persisted precisely so the next batch
    # FOLDS into them (prev ⊕ batch-max) instead of re-aggregating the
    # whole pending slice per poll (round-2 verdict item 3).
    @staticmethod
    def _cursor_rows(admitted: DataFrame) -> DataFrame:
        pick = F.max_by(
            F.struct(
                F.col("canonical_url").alias("last_url"),
                "published_ts",
                "url_hash",
            ),
            F.struct("published_ts", "url_hash"),
        ).alias("__c")
        return admitted.groupBy("source").agg(pick).select("source", "__c.*")

    def _fold_cursors(
        self, prev_cursors: DataFrame, new_rows: DataFrame, round_no: int
    ) -> DataFrame:
        both = prev_cursors.select(
            "source", "last_url", "published_ts", "url_hash"
        ).unionByName(self._cursor_rows(new_rows))
        pick = F.max_by(
            F.struct("last_url", "published_ts", "url_hash"),
            F.struct("published_ts", "url_hash"),
        ).alias("__c")
        return (
            both.groupBy("source")
            .agg(pick)
            .select("source", "__c.*")
            .withColumn("round", F.lit(round_no))
        )

    # ------------------------------------------------------------------ ingest
    def _with_learned_rules(self, seed: DataFrame) -> DataFrame:
        """Apply learned DUST strip rules (if configured) to the seed
        batch's absolute URLs before canonicalization — the consumption
        side of :meth:`dust_rules`. Rules are broadcast; scheme-less
        dirty spellings pass through untouched (the canonicalizer owns
        those)."""
        if self.param_rules is None:
            return seed
        from .operators import dust as dust_ops

        out = dust_ops.apply_param_rules(seed, self.param_rules)
        return out.withColumn("url", F.col("rewritten_url")).drop(
            "rewritten_url"
        )

    def ingest(self, seed: DataFrame) -> None:
        """Seed list → frontier round 0: canonicalize, hash, first-wins
        dedup (the URL-seen set), initial pending state, seen-keys base,
        filter state, per-source cursors.
        """
        cand = with_url_columns(self._with_learned_rules(seed), "url")
        fresh = seen_set.ingest_batch(cand, seen=None)
        frontier = fresh.select(
            "url",
            "canonical_url",
            "url_hash",
            "host",
            "source",
            F.pmod(F.col("url_hash"), F.lit(3)).cast("int").alias("priority"),
            "published_ts",
            "discovery_time",
            F.lit(schemas.STATUS_PENDING).alias("status"),
            F.lit(0).alias("tried_count"),
            F.lit(None).cast("int").alias("last_tried_round"),
        )
        self.catalog.write("pending", 0, frontier)
        empty = self.spark.createDataFrame([], frontier.schema)
        self.catalog.write("done", 0, empty)
        # derive downstream state from the WRITTEN snapshot — recomputing
        # from `frontier` would re-run seed→canonicalize→dedup each time
        admitted = self.catalog.read("pending", 0)
        keys0 = admitted.select("url_hash", "canonical_url")
        parts = max(4, self.spark.sparkContext.defaultParallelism)
        self.catalog.write(
            "seen_keys",
            0,
            keys0.repartitionByRange(parts, "url_hash").sortWithinPartitions(
                "url_hash"
            ),
        )
        if self.filter_store is not None:
            self.filter_store.fold(0, keys0)
        cursors = self._cursor_rows(admitted).withColumn("round", F.lit(0))
        self.catalog.write("cursors", 0, cursors.coalesce(1))
        tokens = self.spark.createDataFrame([], "host string, tokens int")
        self.catalog.write("tokens", 0, tokens)
        self.catalog.commit(0)
        self._eligible_left = None  # recount on first step

    def ingest_incremental(self, seed: DataFrame) -> int:
        """Fresh-pipeline ingest (ST2/ST3): a new seed batch becomes its own
        committed *discovery round* — deduped against every canonical URL
        ever admitted and merged into the pending slice. Returns the number
        of new URLs admitted.

        This is the engine analog of the 15 s link-poll: at-least-once
        re-delivery of old links is absorbed here exactly like the
        reference's ON CONFLICT DO NOTHING (database_manager.py:272-273).
        Steady-state cost per poll is O(|batch|) work + a bounded number
        of snapshot reads: the seen side is the compacted ``seen_keys``
        base ⊕ ≤compact_every deltas (never a per-round `done` union),
        the optional bloom/cuckoo pre-pass probes PERSISTED filter state
        and folds this batch's keys back in (never rebuilding from the
        seen set), and the cursors fold prev ⊕ batch instead of
        re-scanning pending.
        """
        # a crashed earlier attempt may have left uncommitted round dirs;
        # every read below resolves strictly ≤ the last committed round,
        # but the mor pending-base probe scans raw dirs — clean first so
        # a direct ingest_incremental() after a crash (without run())
        # never reads a half-written snapshot
        self.catalog.drop_uncommitted()
        prev = self.catalog.latest_round()
        if prev is None:
            raise RuntimeError("ingest() first — no committed round 0")
        round_no = prev + 1
        prev_pending = self._read_pending(prev)
        seen = self._read_seen_keys(prev)
        cand = with_url_columns(self._with_learned_rules(seed), "url")
        fresh = seen_set.dedup_first_wins(cand)
        if self.filter_store is not None:
            self._ensure_filter_fresh(prev, seen)
            fresh = self.filter_store.unseen(fresh, seen, prev)
        else:
            fresh = seen_set.unseen_only(fresh, seen)
        new_rows = fresh.select(
            "url", "canonical_url", "url_hash", "host", "source",
            F.pmod(F.col("url_hash"), F.lit(3)).cast("int").alias("priority"),
            "published_ts", "discovery_time",
            F.lit(schemas.STATUS_PENDING).alias("status"),
            F.lit(0).alias("tried_count"),
            F.lit(None).cast("int").alias("last_tried_round"),
        ).cache()
        n_new = new_rows.count()
        merged = prev_pending.unionByName(new_rows)
        # discovery round = pure additions (nothing popped)
        empty_keys = self.spark.createDataFrame(
            [], "url_hash long, canonical_url string"
        )
        self._write_pending(round_no, merged, empty_keys, new_rows)
        # tokens are unchanged by a discovery round — metadata-only copy,
        # not a Spark read+write job
        self.catalog.copy_snapshot("tokens", prev, round_no)
        new_keys = new_rows.select("url_hash", "canonical_url")
        self._write_seen_keys(round_no, new_keys, seen)
        if self.filter_store is not None:
            self.filter_store.fold(round_no, new_keys)
            # overflow check on the compaction cadence only — it is a
            # driver round-trip, and a filter a few polls past 0.9 load
            # just degrades fpr (never correctness)
            if (
                round_no % self.compact_every == 0
                and self.filter_store.max_load(round_no) > 0.9
            ):
                # doubling rebuild from the full key set — amortized
                # O(1)/key; the only O(|seen|) step left, and it is rare
                self.filter_store.rebuild(
                    round_no, seen.unionByName(new_keys)
                )
        prev_cur_r = self.catalog.latest_existing("cursors", prev)
        cursors = self._fold_cursors(
            self.catalog.read("cursors", prev_cur_r), new_rows, round_no
        )
        self.catalog.write("cursors", round_no, cursors.coalesce(1))
        self.catalog.commit(round_no)
        self._prune_seen_deltas()
        new_rows.unpersist()
        if self._eligible_left is not None:
            self._eligible_left += n_new  # admitted rows are all eligible
        return n_new

    def _ensure_filter_fresh(self, prev: int, seen: DataFrame) -> None:
        """Rebuild filter state when it lags the seen_keys table — a
        store attached to a pre-existing catalog (or re-enabled after
        exact-path ingests, or orphaned by a crash between a compaction's
        base write and its commit) would otherwise re-admit every key
        that was never folded (round-3 advice bug). Newest-write
        comparison only — two directory probes, no data read."""
        seen_rounds = [
            r
            for r in (
                self.catalog.latest_existing("seen_keys", prev),
                self.catalog.latest_existing("seen_keys_delta", prev),
            )
            if r is not None
        ]
        if not seen_rounds:
            return
        filt_r = self.filter_store.latest_state_round(prev)
        if filt_r is None or filt_r < max(seen_rounds):
            self.filter_store.rebuild(
                prev, seen, capacity_per_bucket=self.filter_store.capacity
            )

    # ------------------------------------------------------------------ rounds
    def _budgets(self, pending: DataFrame, prev_tokens: DataFrame) -> DataFrame:
        """Token-bucket refill: budget = min(cap, carry + refill) per host
        with pending work. Small (one row per live host) → broadcast."""
        hosts = pending.select("host").distinct()
        b = (
            hosts.join(prev_tokens, "host", "left")
            .join(self.politeness, "host", "left")
            .select(
                "host",
                F.least(
                    F.coalesce(F.col("bucket_capacity"), F.lit(2 * self.default_refill)),
                    F.coalesce(F.col("tokens"), F.lit(0))
                    + F.coalesce(F.col("max_per_round"), F.lit(self.default_refill)),
                ).alias("budget"),
            )
        )
        return b

    def step(self, round_no: int) -> RoundStats:
        """Execute round ``round_no`` (requires round ``round_no-1``
        committed). Idempotent: re-running after a crash overwrites the
        uncommitted outputs and commits once."""
        prev = round_no - 1
        pending = self._read_pending(prev)
        if self.merge_mode == "mor":
            # the reconstructed slice feeds two actions this round (pop
            # materialization + next-pending write); persist so the
            # base⊖tombs⊕adds plan runs once, spilling if large
            pending = pending.persist()
        prev_tokens = self.catalog.read("tokens", prev)

        eligible = frontier_ops.eligible(pending, self.max_retries)
        if self.robots_grammar == "rfc9309":
            allowed = frontier_ops.allowed_by_robots_wildcards(
                eligible,
                self.robots.withColumnRenamed("path_prefix", "pattern"),
            )
        else:
            allowed = frontier_ops.allowed_by_robots(eligible, self.robots)
        budgets = self._budgets(allowed, prev_tokens)
        if self._pop_salts is None:
            max_cap = (
                self.politeness.agg(F.max("bucket_capacity")).first()[0] or 0
            )
            self._pop_salts = frontier_ops.salts_for_budget(
                max(max_cap, 2 * self.default_refill)
            )
        popped = frontier_ops.pop_round(
            allowed, budgets, salts=self._pop_salts
        ).cache()

        # size the python fetch stage by ROWS, not bytes (each row costs
        # ~1 ms of python): ~500 rows/task, capped at 2×cores; tiny rounds
        # stay single-task instead of paying 2×cores task launches. The
        # count also materializes the popped cache before fan-out.
        n_popped = popped.count()
        sc = self.spark.sparkContext
        parts = max(1, min(2 * sc.defaultParallelism, (n_popped + 499) // 500))
        fetched = fetch_extract_pages(popped, partitions=parts).cache()
        docs = documents_from_fetch_extract(fetched).withColumn(
            "fetched_round", F.lit(round_no)
        )

        # ---- MERGE-equivalent state transition ----------------------------
        outcomes = fetched.select(
            "url_hash",
            "canonical_url",
            F.col("ok"),
        )
        updated = (
            popped.join(outcomes, ["url_hash", "canonical_url"], "inner")
            .withColumn(
                "tried_count",
                F.when(F.col("ok"), F.col("tried_count")).otherwise(
                    F.col("tried_count") + 1
                ),
            )
            .withColumn(
                "status",
                F.when(F.col("ok"), F.lit(schemas.STATUS_COMPLETED))
                .when(
                    F.col("tried_count") >= self.max_retries,
                    F.lit(schemas.STATUS_FAILED),
                )
                .otherwise(F.lit(schemas.STATUS_PENDING)),
            )
            .withColumn("last_tried_round", F.lit(round_no))
            .drop("ok")
        )
        still_pending = updated.filter(F.col("status") == schemas.STATUS_PENDING)
        finished = updated.filter(F.col("status") != schemas.STATUS_PENDING)

        next_pending = (
            pending.join(
                popped.select("url_hash", "canonical_url"),
                ["url_hash", "canonical_url"],
                "left_anti",
            )
            .unionByName(still_pending)
        )

        # ---- per-round accounting ------------------------------------------
        pop_counts = popped.groupBy("host").agg(F.count("*").alias("n_popped"))
        tokens_next = (
            budgets.join(pop_counts, "host", "left")
            .select(
                "host",
                (F.col("budget") - F.coalesce(F.col("n_popped"), F.lit(0)))
                .cast("int")
                .alias("tokens"),
            )
        )
        lineage = (
            fetched.groupBy("host")
            .agg(
                F.count("*").alias("popped"),
                F.sum(F.col("ok").cast("long")).alias("fetched_ok"),
                F.sum((~F.col("ok")).cast("long")).alias("fetched_fail"),
                F.sum(
                    ((~F.col("ok")) & (F.col("tried_count") + 1 >= self.max_retries))
                    .cast("long")
                ).alias("marked_failed"),
            )
            .withColumn("round", F.lit(round_no))
            .select("round", "host", "popped", "fetched_ok", "fetched_fail", "marked_failed")
        )
        pops_log = popped.select(
            F.lit(round_no).alias("round"),
            "host",
            "canonical_url",
            "priority",
            "published_ts",
            "url_hash",
        )

        self._write_pending(
            round_no,
            next_pending,
            tombstones=popped.select("url_hash", "canonical_url"),
            additions=still_pending,
        )
        # done is append-only; on the compaction cadence the per-round
        # snapshots fold into a ``done_base`` snapshot so the read path
        # touches O(compact_every) dirs, not one per round forever. The
        # base/delta split (instead of an in-place merged "done" write)
        # keeps a crash between commit and prune from double-counting:
        # the read path ignores deltas at or before the newest base.
        compact_done = round_no % self.compact_every == 0
        if compact_done:
            self.catalog.write(
                "done_base",
                round_no,
                self._read_done(prev).unionByName(finished),
            )
        else:
            self.catalog.write("done", round_no, finished.coalesce(4))
        self.catalog.write("docs", round_no, docs)
        self.catalog.write("pops", round_no, pops_log.coalesce(4))
        self.catalog.write("lineage", round_no, lineage.coalesce(1))
        self.catalog.write("tokens", round_no, tokens_next.coalesce(1))
        if compact_done:
            # fold the pops/lineage LOGS on the same cadence (round-4 GC:
            # without this, one tiny dir per round accretes forever — at
            # 10^6 polls that is 10^6 directories of metadata). docs is
            # exempt: it is the append-only DATA product (Iceberg-append
            # analog), not a log.
            parts = max(4, self.spark.sparkContext.defaultParallelism)
            for table, delta in (("pops", pops_log), ("lineage", lineage)):
                try:
                    prior = self._read_accreted(table, prev)
                    merged = prior.unionByName(delta)
                except FileNotFoundError:
                    merged = delta
                self.catalog.write(
                    f"{table}_base", round_no, merged.coalesce(parts)
                )

        # fetch stats come from the (tiny) written lineage — no extra
        # count job over the cached fetched lineage
        agg = (
            self.catalog.read("lineage", round_no)
            .agg(
                F.sum("fetched_ok").alias("ok"),
                F.sum("fetched_fail").alias("fail"),
                F.sum("marked_failed").alias("mf"),
            )
            .collect()[0]
        )
        n_ok = int(agg.ok or 0)
        n_fail = int(agg.fail or 0)
        n_marked_failed = int(agg.mf or 0)
        # pending_left by lineage arithmetic — NOT a rescan of the written
        # pending slice (at 10^10 rows that second scan per round is real
        # I/O): every popped row leaves the eligible set, and the failed-
        # but-retryable ones re-enter it. The baseline is counted once per
        # engine lifetime (fresh start or resume), then carried.
        if self._eligible_left is None:
            self._eligible_left = pending.filter(
                (F.col("status") == schemas.STATUS_PENDING)
                & (F.col("tried_count") < self.max_retries)
            ).count()
        pending_left = self._eligible_left - n_popped + (n_fail - n_marked_failed)
        self.catalog.commit(round_no)
        # post-commit GC: every prune below removes only snapshots that a
        # read at any committed round can no longer resolve to (the newer
        # base/snapshot this round just committed supersedes them), so a
        # crash mid-prune just leaves unread garbage for the next round.
        if compact_done:
            self.catalog.prune_upto("done", round_no)
            self.catalog.prune_upto("done_base", round_no - 1)
            for table in ("pops", "lineage"):
                self.catalog.prune_upto(table, round_no)
                self.catalog.prune_upto(f"{table}_base", round_no - 1)
        # tokens: only the newest snapshot is ever read (next step's prev)
        self.catalog.prune_upto("tokens", round_no - 1)
        # pending: cow rereads only the newest slice; mor needs the newest
        # FULL snapshot (a compact round) plus the tomb/add deltas after it
        if self.merge_mode != "mor":
            self.catalog.prune_upto("pending", round_no - 1)
        elif compact_done:
            self.catalog.prune_upto("pending", round_no - 1)
            self.catalog.prune_upto("pending_tomb", round_no)
            self.catalog.prune_upto("pending_add", round_no)
        # cache update only after the commit: a failed commit + step retry
        # would otherwise apply the recurrence twice
        self._eligible_left = pending_left
        popped.unpersist()
        fetched.unpersist()
        if self.merge_mode == "mor":
            pending.unpersist()
        return RoundStats(round_no, n_popped, n_ok, n_popped - n_ok, pending_left)

    def run(self, max_rounds: int = 1000) -> list[RoundStats]:
        """Run from the last committed round to quiescence. Safe to call on
        a fresh engine (after ingest) or on a crashed workdir (resume)."""
        self.catalog.drop_uncommitted()
        start = self.catalog.latest_round()
        if start is None:
            raise RuntimeError("ingest() first — no committed round 0")
        stats: list[RoundStats] = []
        rnd = start + 1
        while rnd <= start + max_rounds:
            s = self.step(rnd)
            stats.append(s)
            if s.popped == 0 or s.pending_left == 0:
                break
            rnd += 1
        return stats

    # ------------------------------------------------------------------ views
    def pops_in_order(self) -> DataFrame:
        """The authoritative crawl-order log: (round, host, url) sorted by
        the same total order the oracle uses."""
        return self._read_accreted("pops", self.catalog.latest_round()).orderBy(
            "round", "host", "priority", "published_ts", "url_hash"
        )

    def lineage(self) -> DataFrame:
        """Per-(round, host) fetch counters — the Prometheus-metrics
        analog (base ⊕ deltas; folded on the compaction cadence)."""
        return self._read_accreted("lineage", self.catalog.latest_round())

    def final_frontier(self) -> DataFrame:
        last = self.catalog.latest_round()
        pending = self._read_pending(last)
        done = self._read_done(last)
        return pending.unionByName(done)

    def documents(self) -> DataFrame:
        return self.catalog.read_all("docs")

    def drain_report(self, rounds_cap: int = 100) -> DataFrame:
        """Per-host drain ETA over the live frontier — the c5 planning
        operator (operators/frontier.drain_eta) wired to engine state:
        robots-eligible pending backlog ÷ the NEXT round's token budget
        (carry + refill, capped — exactly what step() would issue), with
        the over-cap flag marking hosts whose queue cannot drain within
        ``rounds_cap`` rounds no matter the executor count (their
        ceiling is politeness, not compute). Steady-state note: the
        budget is round-one's; hosts at bucket cap drain slightly
        faster than the estimate, never slower — the flag is
        conservative in the safe direction."""
        last = self.catalog.latest_round()
        if last is None:
            raise FileNotFoundError("no committed rounds — ingest() first")
        pending = self._read_pending(last)
        eligible = frontier_ops.eligible(pending, self.max_retries)
        if self.robots_grammar == "rfc9309":
            allowed = frontier_ops.allowed_by_robots_wildcards(
                eligible,
                self.robots.withColumnRenamed("path_prefix", "pattern"),
            )
        else:
            allowed = frontier_ops.allowed_by_robots(eligible, self.robots)
        budgets = self._budgets(allowed, self.catalog.read("tokens", last))
        return frontier_ops.drain_eta(
            allowed, budgets, self.default_refill, rounds_cap
        )

    def dust_rules(self, min_support: int = 3) -> DataFrame:
        """Mine per-host content-neutral query parameters from THIS
        crawl's own output (operators/dust.mine_param_rules): url +
        span-sequence digest — the north-rule identity column — as the
        evidence table. The loop this closes: a site-local session
        param defeats both the static tracking strip-list
        (functions/urls.py) and the seen-set (every alias is a new
        64-bit key), so each crawl cycle refetches pages it already
        holds; rules learned here feed dust.apply_param_rules ahead of
        the NEXT cycle's canonicalization, turning yesterday's wasted
        fetches into tomorrow's strip rules. Evidence never leaves the
        cluster: one explode + one 8-byte-key equi-join + one tiny
        groupBy over the docs table (see PLANS.md p16)."""
        from .operators import dust as dust_ops

        docs = self.catalog.read_all("docs")
        pages = docs.select(
            "url",
            F.xxhash64(F.to_json("spans")).cast("string").alias("digest"),
        )
        return dust_ops.mine_param_rules(pages, min_support)

    def run_snowball(
        self,
        max_cycles: int = 12,
        universe: int = 400,
        max_rounds: int = 1000,
    ) -> list[RoundStats]:
        """Open-web mode: crawl the frontier to quiescence, extract the
        links embedded in the pages just fetched, admit the unseen ones
        (exactly the ``ingest_incremental`` path a discovery poll uses —
        seen anti-join, filter fold, cursor fold all included), and
        repeat until a cycle discovers nothing new.

        The reference never snowballs — its collectors enumerate
        closed per-source lists (archives/RSS/sitemaps) and the page
        fetcher walks only what they produced. An open crawl is this
        loop: fetch → extract links → frontier. Cycle-batched expansion
        reaches the same fixpoint as any BFS order because links are a
        function of the page and admission is first-wins
        (oracle.snowball pins engine ≡ closure on seen/completed/
        failed/blocked sets). Each cycle's discovery cost is one
        column-pruned pass over the NEW docs only (fetched_round
        watermark), so re-crawling nothing and re-discovering nothing
        is O(new work), not O(history)."""
        from . import sources as src

        all_stats: list[RoundStats] = []
        if self.catalog.latest_round() is None:
            raise FileNotFoundError("no committed rounds — ingest() first")
        # resume safety: the FIRST cycle reprocesses every doc's links
        # (watermark -1), because a crash between run() and the link
        # ingest would otherwise lose the last batch's discoveries on a
        # fresh attach. Reprocessing is idempotent (the seen anti-join
        # re-admits nothing) and costs one column-pruned pass over the
        # docs table per attach; steady-state cycles stay O(new docs).
        watermark = -1
        for _cycle in range(max_cycles):
            all_stats.extend(self.run(max_rounds=max_rounds))
            new_docs = self.documents().filter(
                F.col("fetched_round") > watermark
            )
            watermark = self.catalog.latest_round()
            links = src.outlinks_of(new_docs, universe=universe)
            if self.ingest_incremental(links) == 0:
                break
        return all_stats
