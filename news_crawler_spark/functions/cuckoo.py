"""Partition-local cuckoo filter for the URL-seen set — the bloom's
sibling pre-pass (the reference design calls for a "bloom-filter +
cuckoo-hash URL-seen set"; functions/bloom.py is the bloom half).

Why a cuckoo filter next to a bloom: same no-false-negative contract and
similar space at ~1% fpr, but it additionally supports DELETE — the
operation a long-lived crawl needs when URLs are retired from the seen
set (domain removed, robots change, GDPR erasure) without rebuilding the
filter. A bloom cannot unset bits; a cuckoo filter removes one
fingerprint copy exactly.

Same distribution shape as bloom.py: candidates and seen keys cogroup on
``pmod(url_hash, n_buckets)``; each task builds its bucket's filter from
the seen slice and probes its candidate slice — no global state, no
driver round-trip, filters die with the task. At 10^10 seen URLs / 4096
cogroup buckets each cuckoo table holds ~2.4M keys ≈ 5 MB (4 slots ×
16-bit fingerprints at 95% load) — in-task.

All key material derives from the 64-bit ``url_hash`` the engine already
carries (fingerprint = high 16 bits forced nonzero; bucket1 = low bits;
bucket2 = bucket1 XOR mix(fingerprint), the standard partial-key cuckoo
so either bucket recovers the other). Semantics contract (property-tested
in tests/test_cuckoo.py): "not present" ⇒ definitely NOT seen; "present"
⇒ confirmed by the exact anti-join — output bit-identical to the exact
path.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SLOTS = 4
_FP_MASK = np.uint64(0xFFFF)
_MIX = np.uint64(0x5BD1E995)  # fingerprint → bucket-delta mix (odd)
_MAX_KICKS = 500


def _fingerprints(hashes: np.ndarray) -> np.ndarray:
    """16-bit nonzero fingerprint from the high bits of url_hash."""
    u = hashes.astype(np.int64).view(np.uint64)
    fp = (u >> np.uint64(48)) & _FP_MASK
    return np.where(fp == 0, np.uint64(1), fp).astype(np.uint64)


def _bucket1(hashes: np.ndarray, m: int) -> np.ndarray:
    u = hashes.astype(np.int64).view(np.uint64)
    return (u & np.uint64(m - 1)).astype(np.int64)  # m is a power of two


def _alt_bucket(bucket: np.ndarray, fp: np.ndarray, m: int) -> np.ndarray:
    return (bucket.astype(np.uint64) ^ ((fp * _MIX) & np.uint64(m - 1))).astype(
        np.int64
    ) & (m - 1)


class CuckooFilter:
    """In-task cuckoo filter over 64-bit key hashes. ``m`` buckets × 4
    16-bit slots; 0 = empty. Not thread-safe; lives inside one task."""

    def __init__(self, n_keys: int, load: float = 0.84):
        m = 1
        while m * _SLOTS * load < max(n_keys, 1):
            m *= 2
        self.m = m
        self.table = np.zeros((m, _SLOTS), dtype=np.uint64)

    # -- single-key ops (insert is inherently sequential: eviction chain) --
    def _insert_one(self, b1: int, fp: np.uint64) -> bool:
        b2 = int(_alt_bucket(np.array([b1]), np.array([fp]), self.m)[0])
        for b in (b1, b2):
            row = self.table[b]
            empty = np.where(row == 0)[0]
            if len(empty):
                row[empty[0]] = fp
                return True
        # evict: random-free walk, deterministic via the fp itself
        b = b1 if (int(fp) & 1) else b2
        cur = fp
        for kick in range(_MAX_KICKS):
            slot = (int(cur) + kick) % _SLOTS
            cur, self.table[b][slot] = self.table[b][slot], cur
            b = int(_alt_bucket(np.array([b]), np.array([cur]), self.m)[0])
            row = self.table[b]
            empty = np.where(row == 0)[0]
            if len(empty):
                row[empty[0]] = cur
                return True
        return False  # table over-full (callers size with headroom)

    def build(self, hashes: np.ndarray) -> int:
        """Insert all; returns the number that could not be placed (0 in
        practice at the sizing above — a failed insert falls back to the
        exact join side, so correctness never depends on it)."""
        fps = _fingerprints(hashes)
        b1s = _bucket1(hashes, self.m)
        failed = 0
        for b1, fp in zip(b1s, fps):
            if not self._insert_one(int(b1), fp):
                failed += 1
        return failed

    def contains(self, hashes: np.ndarray) -> np.ndarray:
        """Vectorized membership probe: fp present in either bucket."""
        if not len(hashes):
            return np.zeros(0, dtype=bool)
        fps = _fingerprints(hashes)
        b1 = _bucket1(hashes, self.m)
        b2 = _alt_bucket(b1, fps, self.m)
        in1 = (self.table[b1] == fps[:, None]).any(axis=1)
        in2 = (self.table[b2] == fps[:, None]).any(axis=1)
        return in1 | in2

    def delete(self, hashes: np.ndarray) -> np.ndarray:
        """Remove ONE fingerprint copy per key (the op blooms cannot do).
        Returns per-key success. Only delete keys that were inserted —
        deleting a never-inserted key may evict a colliding twin (the
        documented cuckoo-filter contract)."""
        out = np.zeros(len(hashes), dtype=bool)
        fps = _fingerprints(hashes)
        b1s = _bucket1(hashes, self.m)
        b2s = _alt_bucket(b1s, fps, self.m)
        for i, (b1, b2, fp) in enumerate(zip(b1s, b2s, fps)):
            for b in (int(b1), int(b2)):
                row = self.table[b]
                hit = np.where(row == fp)[0]
                if len(hit):
                    row[hit[0]] = 0
                    out[i] = True
                    break
        return out


def cuckoo_split(
    candidates: DataFrame,
    seen: DataFrame,
    n_buckets: int = 256,
) -> DataFrame:
    """Tag candidates with ``maybe_seen`` via per-cogroup cuckoo filters:
    False ⇒ definitely new; True ⇒ confirm exactly. Insert failures (an
    over-full table) conservatively tag the whole bucket's candidates via
    the filter OR the failure fallback — no false negatives ever."""
    bucket = lambda df: df.withColumn(  # noqa: E731
        "__bucket", F.pmod(F.col("url_hash"), F.lit(n_buckets)).cast("int")
    )
    cand_b = bucket(candidates)
    seen_b = bucket(seen.select("url_hash"))
    out_schema = cand_b.drop("__bucket").schema.add("maybe_seen", "boolean")
    cand_cols = [f.name for f in out_schema.fields if f.name != "maybe_seen"]

    def split(cand_pdf: pd.DataFrame, seen_pdf: pd.DataFrame) -> pd.DataFrame:
        cand_pdf = cand_pdf.drop(columns="__bucket")
        n_seen = len(seen_pdf)
        if n_seen == 0:
            cand_pdf["maybe_seen"] = False
            return cand_pdf[cand_cols + ["maybe_seen"]]
        cf = CuckooFilter(n_seen)
        failed = cf.build(seen_pdf["url_hash"].to_numpy())
        maybe = cf.contains(cand_pdf["url_hash"].to_numpy())
        if failed:
            # any unplaced seen key ⇒ cannot prove "definitely new" here
            maybe = np.ones_like(maybe)
        cand_pdf["maybe_seen"] = maybe
        return cand_pdf[cand_cols + ["maybe_seen"]]

    return (
        cand_b.groupBy("__bucket")
        .cogroup(seen_b.groupBy("__bucket"))
        .applyInPandas(lambda c, s: split(c, s), schema=out_schema)
    )


def cuckoo_unseen(
    candidates: DataFrame,
    seen: DataFrame,
    n_buckets: int = 256,
) -> DataFrame:
    """Exact unseen-set semantics with a cuckoo fast path — same contract
    as bloom.bloom_unseen: definitely-new rows skip the join; the 'maybe'
    sliver pays the exact anti-join on (url_hash, canonical_url)."""
    tagged = cuckoo_split(candidates, seen, n_buckets)
    definitely_new = tagged.filter(~F.col("maybe_seen")).drop("maybe_seen")
    maybe = tagged.filter(F.col("maybe_seen")).drop("maybe_seen")
    confirmed_new = maybe.join(
        seen.select("url_hash", "canonical_url"),
        ["url_hash", "canonical_url"],
        "left_anti",
    )
    return definitely_new.unionByName(confirmed_new)
