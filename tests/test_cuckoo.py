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
