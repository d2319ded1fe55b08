"""Partition-local bloom filter for the URL-seen set (SURVEY.md §4).

Spark's runtime bloom-filter join injection
(``spark.sql.optimizer.runtime.bloomFilter.enabled``, on in session.py)
covers the common case; this module is the *explicit* pre-pass for engines
where that rule is unavailable or the seen side is reused across many
rounds (operators/seen_filter.py persists these filters per bucket).
Semantics contract: the bloom is only ever used to prove "definitely NOT
seen" — a "maybe seen" always falls through to the exact anti-join, so
the result is bit-identical to the exact path (asserted by
tests/test_bloom.py property tests).

Shape: candidates and seen keys are cogrouped on ``pmod(url_hash,
n_buckets)`` — one co-partitioned shuffle on each side, then a
numpy-vectorized build+probe per bucket (no global bitmap, no driver
state, no mergeable-bloom problem: each bucket's bloom lives and dies
inside its cogroup task — or is loaded from the persisted store). At
10^10 seen URLs and 4096 buckets each bucket holds ~2.4M keys → a 3 MB
bitmap at 10 bits/key — comfortably in-task.

Hashing: double hashing off the Fibonacci-MIXED 64-bit url_hash
(h1 = low 32 of the mix, h2 = high 32 | 1). The mix matters: the cogroup
key is the RAW low bits of url_hash, so unmixed h1 values within a task
would share their low log2(n_buckets) bits and the i=0 probe position
would concentrate on 1/n_buckets of the bitmap — saturating it and
silently wasting one of the k hashes.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_PHI = np.uint64(0x9E3779B97F4A7C15)  # Fibonacci hashing constant (odd)


def _positions(hashes: np.ndarray, m: int, k: int) -> np.ndarray:
    """(n, k) bit positions via double hashing: (h1 + i·h2) mod m, off a
    multiplicative mix so positions are independent of the raw low bits
    (= the Spark cogroup key)."""
    u = hashes.astype(np.int64).view(np.uint64) * _PHI
    h1 = (u & np.uint64(0xFFFFFFFF)).astype(np.uint64)
    h2 = ((u >> np.uint64(32)) | np.uint64(1)).astype(np.uint64)
    i = np.arange(k, dtype=np.uint64)[None, :]
    return ((h1[:, None] + i * h2[:, None]) % np.uint64(m)).astype(np.int64)


def _build(hashes: np.ndarray, m: int, k: int) -> np.ndarray:
    bits = np.zeros(m, dtype=bool)
    if len(hashes):
        bits[_positions(hashes, m, k).ravel()] = True
    return bits


def _probe(bits: np.ndarray, hashes: np.ndarray, m: int, k: int) -> np.ndarray:
    """True where ALL k bits set ('maybe seen')."""
    if not len(hashes):
        return np.zeros(0, dtype=bool)
    return bits[_positions(hashes, m, k)].all(axis=1)


class BloomFilter:
    """Fixed-size bloom over 64-bit key hashes, serializable so
    operators/seen_filter.py can persist one per bucket and fold new
    keys in incrementally (insert = OR bits — blooms merge for free).
    Exceeding ``capacity`` degrades fpr (more rows pay the exact join),
    never correctness; the store rebuilds at 2× when that happens.

    The bitmap stays PACKED (uint8, np.packbits bit order: bit i → byte
    i>>3, mask 0x80>>(i&7)) in memory and on disk: probing indexes the
    packed bytes directly, so deserializing a large persisted bucket
    never materializes an 8× bool array (measured: the 16M-key probe
    spent most of its 10 s unpacking 40 MB of state into 320 MB of
    bools)."""

    def __init__(self, capacity: int, bits_per_key: int = 10, num_hashes: int = 7):
        self.m = max(64, int(capacity) * bits_per_key)
        self.k = num_hashes
        self.capacity = int(capacity)
        self.n_keys = 0
        self.packed = np.zeros((self.m + 7) // 8, dtype=np.uint8)

    def insert(self, hashes: np.ndarray) -> int:
        if len(hashes):
            idx = _positions(hashes, self.m, self.k).ravel()
            # ufunc.at: repeated byte indexes within one batch must OR
            # cumulatively (plain fancy-index |= drops duplicates)
            np.bitwise_or.at(
                self.packed, idx >> 3, (0x80 >> (idx & 7)).astype(np.uint8)
            )
            self.n_keys += len(hashes)
        return 0  # blooms never fail to place — signature parity w/ cuckoo

    def contains(self, hashes: np.ndarray) -> np.ndarray:
        if not len(hashes):
            return np.zeros(0, dtype=bool)
        idx = _positions(hashes, self.m, self.k)
        hit = (self.packed[idx >> 3] & (0x80 >> (idx & 7)).astype(np.uint8)) != 0
        return hit.all(axis=1)

    @property
    def load(self) -> float:
        return self.n_keys / max(self.capacity, 1)

    def to_bytes(self) -> bytes:
        header = np.array(
            [self.m, self.k, self.capacity, self.n_keys], dtype=np.uint64
        )
        return header.tobytes() + self.packed.tobytes()

    @classmethod
    def from_bytes(cls, data: bytes) -> "BloomFilter":
        m, k, capacity, n_keys = np.frombuffer(data, dtype=np.uint64, count=4)
        self = cls.__new__(cls)
        self.m, self.k = int(m), int(k)
        self.capacity, self.n_keys = int(capacity), int(n_keys)
        self.packed = np.frombuffer(data, dtype=np.uint8, offset=32).copy()
        return self


def bloom_split(
    candidates: DataFrame,
    seen: DataFrame,
    n_buckets: int = 256,
    bits_per_key: int = 10,
    num_hashes: int = 7,
) -> DataFrame:
    """Tag each candidate with ``maybe_seen``: False ⇒ *definitely* new
    (bloom has no false negatives), True ⇒ must be confirmed exactly.

    One cogrouped pass on ``pmod(url_hash, n_buckets)``; the per-bucket
    bloom is sized from that bucket's actual seen count.
    """
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
        m = max(64, n_seen * bits_per_key)
        bits = _build(seen_pdf["url_hash"].to_numpy(), m, num_hashes)
        cand_pdf["maybe_seen"] = _probe(
            bits, cand_pdf["url_hash"].to_numpy(), m, num_hashes
        )
        return cand_pdf[cand_cols + ["maybe_seen"]]

    return (
        cand_b.groupBy("__bucket")
        .cogroup(seen_b.groupBy("__bucket"))
        .applyInPandas(lambda c, s: split(c, s), schema=out_schema)
    )


def bloom_unseen(
    candidates: DataFrame,
    seen: DataFrame,
    n_buckets: int = 256,
    bits_per_key: int = 10,
    num_hashes: int = 7,
) -> DataFrame:
    """Exact unseen-set semantics with a bloom fast path.

    definitely-new rows skip the join entirely; only the ~n·fpr 'maybe'
    sliver pays the exact anti-join on (url_hash, canonical_url). Output
    ≡ ``seen_set.unseen_only`` (the bloom can only divert true negatives
    around the join, never drop a row or admit a seen one).
    """
    tagged = bloom_split(candidates, seen, n_buckets, bits_per_key, num_hashes)
    definitely_new = tagged.filter(~F.col("maybe_seen")).drop("maybe_seen")
    maybe = tagged.filter(F.col("maybe_seen")).drop("maybe_seen")
    confirmed_new = maybe.join(
        seen.select("url_hash", "canonical_url"),
        ["url_hash", "canonical_url"],
        "left_anti",
    )
    return definitely_new.unionByName(confirmed_new)
