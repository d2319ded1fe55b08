"""Property-based (hypothesis) checks for the bloom/cuckoo filter
primitives — arbitrary key sets and operation interleavings, beyond the
fixed corpora in test_bloom.py / test_cuckoo.py. Pure numpy, no Spark:
hundreds of generated examples run in seconds, hunting the state-machine
corners a fixed fixture never reaches (duplicate inserts, delete of
half-present keys, serialize mid-stash, eviction-rollback interactions).

Every property here is one the SeenFilterStore's correctness argument
leans on: NO FALSE NEGATIVES ever (a false negative re-admits a seen
URL), deletes remove at most the asked keys, and serialization is
behavior-preserving (the store ships blobs between fold/probe
processes).
"""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from news_crawler_spark.functions.bloom import BloomFilter
from news_crawler_spark.functions.cuckoo import CuckooFilter

# arbitrary signed-64 key universes; small magnitudes collide in the
# low bits on purpose (the bucket-correlation regression of round 3)
keys64 = st.integers(min_value=-(1 << 63), max_value=(1 << 63) - 1)
small_keys = st.integers(min_value=-64, max_value=64)
key_sets = st.lists(st.one_of(keys64, small_keys), min_size=0, max_size=300)


def _arr(xs) -> np.ndarray:
    return np.array(sorted(set(xs)), dtype=np.int64)


@settings(max_examples=150, deadline=None)
@given(members=key_sets, probes=key_sets)
def test_bloom_never_false_negative(members, probes):
    m = _arr(members)
    bf = BloomFilter(max(len(m), 1))
    if len(m):
        bf.insert(m)
        assert bf.contains(m).all()
    p = _arr(probes)
    if len(p):
        got = bf.contains(p)
        is_member = np.isin(p, m)
        # no false negatives: every true member reports present
        assert got[is_member].all()


@settings(max_examples=150, deadline=None)
@given(members=key_sets, probes=key_sets)
def test_bloom_roundtrip_preserves_answers(members, probes):
    m, p = _arr(members), _arr(probes)
    bf = BloomFilter(max(len(m), 1))
    if len(m):
        bf.insert(m)
    back = BloomFilter.from_bytes(bf.to_bytes())
    if len(p):
        assert (back.contains(p) == bf.contains(p)).all()


@settings(max_examples=150, deadline=None)
@given(members=key_sets, probes=key_sets)
def test_cuckoo_never_false_negative(members, probes):
    m = _arr(members)
    cf = CuckooFilter(max(2 * len(m), 4))
    if len(m):
        cf.insert(m)
        assert cf.contains(m).all()
    p = _arr(probes)
    if len(p):
        got = cf.contains(p)
        assert got[np.isin(p, m)].all()


@settings(max_examples=150, deadline=None)
@given(members=key_sets, probes=key_sets)
def test_cuckoo_roundtrip_preserves_answers(members, probes):
    m, p = _arr(members), _arr(probes)
    cf = CuckooFilter(max(2 * len(m), 4))
    if len(m):
        cf.insert(m)
    back = CuckooFilter.from_bytes(cf.to_bytes())
    if len(p):
        assert (back.contains(p) == cf.contains(p)).all()
    assert back.n_keys == cf.n_keys


@settings(max_examples=100, deadline=None)
@given(data=st.data(), members=key_sets)
def test_cuckoo_delete_members_then_absent_rest_present(data, members):
    """Delete HALF the inserted keys (the documented contract: only
    delete inserted keys): deleted keys report success; every surviving
    key still reports present (no collateral false negatives — the
    property a counting-free bloom cannot give)."""
    m = _arr(members)
    if not len(m):
        return
    cf = CuckooFilter(max(2 * len(m), 4))
    cf.insert(m)
    k = data.draw(st.integers(min_value=0, max_value=len(m)))
    dele, keep = m[:k], m[k:]
    if len(dele):
        ok = cf.delete(dele)
        assert ok.all()
    if len(keep):
        assert cf.contains(keep).all()
    assert cf.n_keys == len(keep)


@settings(max_examples=100, deadline=None)
@given(chunks=st.lists(key_sets, min_size=1, max_size=5))
def test_cuckoo_incremental_equals_bulk(chunks):
    """Folding keys in across several inserts answers exactly like one
    bulk build of the union — the SeenFilterStore's compaction step
    (cogroup fold) relies on insert-order insensitivity of membership."""
    all_keys = _arr([x for c in chunks for x in c])
    if not len(all_keys):
        return
    inc = CuckooFilter(max(2 * len(all_keys), 4))
    seen = set()
    for c in chunks:
        fresh = _arr([x for x in c if x not in seen])
        if len(fresh):
            inc.insert(fresh)
            seen.update(fresh.tolist())
    bulk = CuckooFilter(max(2 * len(all_keys), 4))
    bulk.insert(all_keys)
    assert inc.contains(all_keys).all()
    assert bulk.contains(all_keys).all()
    assert inc.n_keys == bulk.n_keys == len(all_keys)
