"""Cuckoo-filter seen-set pre-pass: local filter properties + the Spark
cogroup path's exact-equality contract (mirrors test_bloom.py)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from news_crawler_spark.functions.cuckoo import CuckooFilter, cuckoo_unseen
from news_crawler_spark.functions.xxh64 import xxh64_str


def _hashes(tag: str, n: int) -> np.ndarray:
    mask = (1 << 64) - 1
    u = np.array(
        [xxh64_str(f"{tag}:{i}") & mask for i in range(n)], dtype=np.uint64
    )
    return u.view(np.int64)


def test_filter_no_false_negatives_and_low_fpr():
    members = _hashes("m", 20_000)
    others = _hashes("o", 20_000)
    cf = CuckooFilter(len(members))
    assert cf.build(members) == 0          # all placed at this sizing
    assert cf.contains(members).all()      # NO false negatives
    fpr = cf.contains(others).mean()
    assert fpr < 0.01, fpr                 # 16-bit fp, 4 slots → ~0.1%


def test_filter_delete_then_absent():
    members = _hashes("d", 5_000)
    cf = CuckooFilter(len(members))
    cf.build(members)
    victims = members[:500]
    assert cf.delete(victims).all()
    # deleted keys are gone (no stale fingerprint copy left behind) —
    # allow rare same-(bucket,fp) twins among the remaining members
    assert cf.contains(victims).mean() < 0.02
    # untouched members still all present
    assert cf.contains(members[500:]).all()


def test_filter_correlated_low_bits_all_placed():
    """The Spark cogroup groups keys by pmod(url_hash, n_buckets), so
    within one task every key shares its low bits. The table-bucket
    derivation must be independent of them (round-2 advice measured
    311/5000 insert failures when bucket1 used the raw low bits)."""
    base = _hashes("c", 50_000).view(np.uint64)
    correlated = ((base >> np.uint64(8)) << np.uint64(8)) | np.uint64(0x2A)
    cf = CuckooFilter(len(correlated))
    assert cf.build(correlated.view(np.int64)) == 0
    assert cf.contains(correlated.view(np.int64)).all()


def test_filter_serialization_roundtrip():
    members = _hashes("s", 10_000)
    others = _hashes("t", 5_000)
    cf = CuckooFilter(len(members))
    cf.build(members)
    cf2 = CuckooFilter.from_bytes(cf.to_bytes())
    assert cf2.m == cf.m and cf2.n_keys == cf.n_keys
    assert cf2.contains(members).all()
    assert (cf2.contains(others) == cf.contains(others)).all()


def test_filter_stash_overflow_stays_exact_per_key():
    """Over-full table → stash absorbs the overflow; membership stays
    exact per-key (never a bucket-wide degradation, never a false
    negative), and the stash survives serialization."""
    members = _hashes("x", 2_000)
    cf = CuckooFilter(4)  # ~8 slots for 2000 keys
    assert cf.build(members) > 0
    assert cf.contains(members).all()
    cf2 = CuckooFilter.from_bytes(cf.to_bytes())
    assert cf2.contains(members).all()


def test_filter_incremental_insert_equals_bulk_build():
    a, b = _hashes("ia", 8_000), _hashes("ib", 8_000)
    both = np.concatenate([a, b])
    bulk = CuckooFilter(len(both))
    bulk.build(both)
    inc = CuckooFilter(len(both))
    inc.insert(a)
    inc.insert(b)
    assert inc.contains(both).all()
    assert inc.n_keys == bulk.n_keys == len(both)


@pytest.fixture()
def cand_seen(spark):
    cand = spark.range(0, 2000).select(
        F.xxhash64(F.concat(F.lit("u"), "id")).alias("url_hash"),
        F.concat(F.lit("https://h/"), "id").alias("canonical_url"),
        F.col("id").alias("payload"),
    )
    seen = spark.range(500, 1200).select(
        F.xxhash64(F.concat(F.lit("u"), "id")).alias("url_hash"),
        F.concat(F.lit("https://h/"), "id").alias("canonical_url"),
    )
    return cand, seen


def test_cuckoo_unseen_equals_exact_anti_join(spark, cand_seen):
    cand, seen = cand_seen
    exact = cand.join(
        seen, ["url_hash", "canonical_url"], "left_anti"
    )
    fast = cuckoo_unseen(cand, seen, n_buckets=16)
    key = lambda df: sorted(  # noqa: E731
        (r.url_hash, r.canonical_url, r.payload) for r in df.collect()
    )
    assert key(fast) == key(exact)
    assert fast.count() == 2000 - 700


def test_cuckoo_unseen_empty_seen(spark, cand_seen):
    cand, _ = cand_seen
    empty = cand.select("url_hash", "canonical_url").limit(0)
    assert cuckoo_unseen(cand, empty, n_buckets=8).count() == cand.count()
