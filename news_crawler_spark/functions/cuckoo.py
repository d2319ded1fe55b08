"""Partition-local cuckoo filter for the URL-seen set — the bloom's
sibling pre-pass (the reference design calls for a "bloom-filter +
cuckoo-hash URL-seen set"; functions/bloom.py is the bloom half).

Why a cuckoo filter next to a bloom: same no-false-negative contract and
similar space at ~1% fpr, but it additionally supports DELETE — the
operation a long-lived crawl needs when URLs are retired from the seen
set (domain removed, robots change, GDPR erasure) without rebuilding the
filter. A bloom cannot unset bits; a cuckoo filter removes one
fingerprint copy exactly.

Distribution shape: candidates and seen keys cogroup on
``pmod(url_hash, n_buckets)``; each task builds (or, via
operators/seen_filter.py, *loads*) its bucket's filter and probes its
candidate slice. Because the cogroup key IS the low bits of url_hash,
every in-filter derivation here mixes the hash first (Fibonacci
multiplicative hash) — deriving table buckets straight from the low bits
would concentrate all of a task's keys on m/n_buckets of the table and
overflow it (measured: 311/5000 insert failures with the unmixed low
bits, 0 with the mix).

All key material derives from the 64-bit ``url_hash`` the engine already
carries (fingerprint = high 16 bits forced nonzero; bucket1 = top bits of
the mixed hash; bucket2 = bucket1 XOR mix(fingerprint), the standard
partial-key cuckoo so either bucket recovers the other). The rare key
that still cannot be placed after the eviction walk lands in a stash of
full 64-bit hashes — membership stays exact per-key, so one pathological
key never degrades its whole bucket. Semantics contract (property-tested
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
_PHI = np.uint64(0x9E3779B97F4A7C15)  # Fibonacci hashing constant (odd)
_MAX_KICKS = 500


def _fingerprints(hashes: np.ndarray) -> np.ndarray:
    """16-bit nonzero fingerprint from the high bits of url_hash."""
    u = hashes.astype(np.int64).view(np.uint64)
    fp = (u >> np.uint64(48)) & _FP_MASK
    return np.where(fp == 0, np.uint64(1), fp).astype(np.uint64)


def _bucket1(hashes: np.ndarray, m: int) -> np.ndarray:
    """Primary bucket from the TOP bits of the Fibonacci-mixed hash —
    independent of the low bits the Spark cogroup partitions on (using
    the low bits raw would give every key in a task the same low
    log2(n_buckets) bits and pile primary buckets onto m/n_buckets of
    the table)."""
    u = hashes.astype(np.int64).view(np.uint64)
    shift = np.uint64(64 - (m - 1).bit_length()) if m > 1 else np.uint64(63)
    return ((u * _PHI) >> shift).astype(np.int64) & (m - 1)


def _alt_bucket(bucket: np.ndarray, fp: np.ndarray, m: int) -> np.ndarray:
    return (bucket.astype(np.uint64) ^ ((fp * _MIX) & np.uint64(m - 1))).astype(
        np.int64
    ) & (m - 1)


class CuckooFilter:
    """In-task cuckoo filter over 64-bit key hashes. ``m`` buckets × 4
    16-bit slots; 0 = empty; overflow keys live in an exact stash.
    Not thread-safe; lives inside one task. Serializable via
    ``to_bytes``/``from_bytes`` so operators/seen_filter.py can persist
    per-bucket state across rounds instead of rebuilding it."""

    def __init__(self, n_keys: int, load: float = 0.84):
        m = 1
        while m * _SLOTS * load < max(n_keys, 1):
            m *= 2
        self.m = m
        self.table = np.zeros((m, _SLOTS), dtype=np.uint16)
        self.stash: list[np.uint64] = []
        self.n_keys = 0

    # -- serialization (operators/seen_filter.py persistence) ------------
    def to_bytes(self) -> bytes:
        stash = np.array(self.stash, dtype=np.uint64)
        header = np.array([self.m, len(stash), self.n_keys], dtype=np.uint64)
        return header.tobytes() + self.table.tobytes() + stash.tobytes()

    @classmethod
    def from_bytes(cls, data: bytes) -> "CuckooFilter":
        m, n_stash, n_keys = np.frombuffer(data, dtype=np.uint64, count=3)
        self = cls.__new__(cls)
        self.m = int(m)
        off = 24
        tbl_bytes = self.m * _SLOTS * 2
        self.table = (
            np.frombuffer(data, dtype=np.uint16, count=self.m * _SLOTS, offset=off)
            .reshape(self.m, _SLOTS)
            .copy()
        )
        self.stash = list(
            np.frombuffer(data, dtype=np.uint64, count=int(n_stash), offset=off + tbl_bytes)
        )
        self.n_keys = int(n_keys)
        return self

    @property
    def load(self) -> float:
        return self.n_keys / (self.m * _SLOTS)

    # -- single-key ops (insert is inherently sequential: eviction chain) --
    def _insert_one(self, b1: int, fp: np.uint64) -> bool:
        b2 = int(_alt_bucket(np.array([b1]), np.array([fp]), self.m)[0])
        for b in (b1, b2):
            row = self.table[b]
            empty = np.where(row == 0)[0]
            if len(empty):
                row[empty[0]] = fp
                return True
        # evict: random-free walk, deterministic via the fp itself; every
        # swap is journaled so a failed walk can be undone — otherwise the
        # walk's final displaced fingerprint (some OTHER key's) would be
        # dropped and that key would become a false negative
        b = b1 if (int(fp) & 1) else b2
        cur = np.uint64(fp)
        journal: list[tuple[int, int]] = []
        for kick in range(_MAX_KICKS):
            slot = (int(cur) + kick) % _SLOTS
            journal.append((b, slot))
            cur, self.table[b][slot] = np.uint64(self.table[b][slot]), cur
            b = int(_alt_bucket(np.array([b]), np.array([cur]), self.m)[0])
            row = self.table[b]
            empty = np.where(row == 0)[0]
            if len(empty):
                row[empty[0]] = cur
                return True
        for jb, jslot in reversed(journal):  # roll back, then stash the key
            cur, self.table[jb][jslot] = np.uint64(self.table[jb][jslot]), cur
        return False

    def build(self, hashes: np.ndarray) -> int:
        """Insert all; returns the number that went to the stash (0 in
        practice at the sizing above). Stashed keys stay exactly
        queryable — a failed placement never costs correctness, only the
        stash's O(|stash|) probe."""
        fps = _fingerprints(hashes)
        b1s = _bucket1(hashes, self.m)
        u = hashes.astype(np.int64).view(np.uint64)
        stashed = 0
        for i, (b1, fp) in enumerate(zip(b1s, fps)):
            if self._insert_one(int(b1), fp):
                pass
            else:
                # the eviction walk displaced SOME key's fingerprint; we
                # cannot know whose — stash this key's full hash so the
                # no-false-negative contract holds per-key
                self.stash.append(u[i])
                stashed += 1
            self.n_keys += 1
        return stashed

    # build() and insert() are the same op; insert() is the incremental-
    # fold spelling used by seen_filter.py
    insert = build

    def contains(self, hashes: np.ndarray) -> np.ndarray:
        """Vectorized membership probe: fp present in either bucket, or
        full hash present in the stash."""
        if not len(hashes):
            return np.zeros(0, dtype=bool)
        fps = _fingerprints(hashes).astype(np.uint16)
        b1 = _bucket1(hashes, self.m)
        b2 = _alt_bucket(b1, _fingerprints(hashes), self.m)
        in1 = (self.table[b1] == fps[:, None]).any(axis=1)
        in2 = (self.table[b2] == fps[:, None]).any(axis=1)
        out = in1 | in2
        if self.stash:
            u = hashes.astype(np.int64).view(np.uint64)
            out |= np.isin(u, np.array(self.stash, dtype=np.uint64))
        return out

    def delete(self, hashes: np.ndarray) -> np.ndarray:
        """Remove ONE fingerprint copy per key (the op blooms cannot do).
        Returns per-key success. Only delete keys that were inserted —
        deleting a never-inserted key may evict a colliding twin (the
        documented cuckoo-filter contract)."""
        out = np.zeros(len(hashes), dtype=bool)
        fps = _fingerprints(hashes)
        b1s = _bucket1(hashes, self.m)
        b2s = _alt_bucket(b1s, fps, self.m)
        u = hashes.astype(np.int64).view(np.uint64)
        for i, (b1, b2, fp) in enumerate(zip(b1s, b2s, fps)):
            if u[i] in self.stash:
                self.stash.remove(u[i])
                out[i] = True
                self.n_keys -= 1
                continue
            for b in (int(b1), int(b2)):
                row = self.table[b]
                hit = np.where(row == np.uint16(fp))[0]
                if len(hit):
                    row[hit[0]] = 0
                    out[i] = True
                    self.n_keys -= 1
                    break
        return out


def cuckoo_split(
    candidates: DataFrame,
    seen: DataFrame,
    n_buckets: int = 256,
) -> DataFrame:
    """Tag candidates with ``maybe_seen`` via per-cogroup cuckoo filters:
    False ⇒ definitely new; True ⇒ confirm exactly. Keys the eviction
    walk cannot place are stash-probed exactly, so one over-full bucket
    never blankets its candidates with maybe_seen=True — and never a
    false negative."""
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
        cf.build(seen_pdf["url_hash"].to_numpy())
        cand_pdf["maybe_seen"] = cf.contains(cand_pdf["url_hash"].to_numpy())
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
