"""Bloom seen-set pre-pass: bit-exact equivalence with the exact anti-join
(the correctness contract: a bloom 'maybe' is never treated as 'seen')."""

import pytest
from pyspark.sql import functions as F

from news_crawler_spark import synth
from news_crawler_spark.functions.bloom import bloom_split, bloom_unseen
from news_crawler_spark.functions.urls import with_url_columns
from news_crawler_spark.operators.seen_set import dedup_first_wins, unseen_only


@pytest.fixture(scope="module")
def frames(spark):
    cand = dedup_first_wins(
        with_url_columns(synth.build_seed_list(spark, 600))
    ).cache()
    # seen = the first 350 seeds' canonical set (overlaps heavily with cand)
    seen = dedup_first_wins(
        with_url_columns(synth.build_seed_list(spark, 350))
    ).select("url_hash", "canonical_url").cache()
    return cand, seen


def test_bloom_unseen_equals_exact(spark, frames):
    cand, seen = frames
    exact = {r.canonical_url for r in unseen_only(cand, seen).collect()}
    fast = {r.canonical_url for r in bloom_unseen(cand, seen).collect()}
    assert fast == exact and len(exact) > 0


def test_bloom_no_false_negatives(spark, frames):
    cand, seen = frames
    tagged = bloom_split(cand, seen)
    # every candidate actually in the seen set must be flagged maybe_seen
    truly_seen = cand.join(seen, ["url_hash", "canonical_url"], "left_semi")
    missed = truly_seen.join(
        tagged.filter(~F.col("maybe_seen")).select("url_hash", "canonical_url"),
        ["url_hash", "canonical_url"],
        "left_semi",
    ).count()
    assert missed == 0
    assert truly_seen.count() > 0


def test_bloom_diverts_most_negatives(spark, frames):
    """The perf property: with 10 bits/key the false-positive rate is ~1%,
    so nearly all truly-new rows bypass the exact join."""
    cand, seen = frames
    tagged = bloom_split(cand, seen).cache()
    truly_new = cand.join(seen, ["url_hash", "canonical_url"], "left_anti")
    n_new = truly_new.count()
    n_fast = tagged.filter(~F.col("maybe_seen")).count()
    assert n_fast >= 0.9 * n_new


def test_bloom_empty_seen(spark, frames):
    cand, _ = frames
    empty = spark.createDataFrame([], "url_hash long, canonical_url string")
    assert bloom_unseen(cand, empty).count() == cand.count()
