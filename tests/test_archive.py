"""WARC-style segment archive: byte-exact roundtrip, blob layout,
header walkability, and the one-shuffle plan contract."""

from pyspark.sql import functions as F

from news_crawler_spark.operators import archive


def _docs(spark):
    rows = [
        (1, "hello world"),
        (2, "سلام دنیا — بایت‌ها نه کاراکترها"),  # multi-byte utf-8
        (3, ""),  # empty payload still gets a record
        (4, "line1\nline2\twith tab"),
        (5, "x" * 1000),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_roundtrip_byte_exact(spark):
    """Every doc — including the empty one and the multi-byte Persian
    one — reads back byte-exact through pack → index-join → substring
    → decode."""
    index, segments = archive.pack_segments(_docs(spark), n_segments=2)
    got = {r.doc_id: r.text for r in archive.read_records(index, segments).collect()}
    want = {r.doc_id: r.text for r in _docs(spark).collect()}
    assert got == want


def test_blob_layout_and_walkability(spark):
    """The blob IS the layout the index claims: per segment,
    total_bytes == octet_length(blob) == sum of record lengths, records
    are contiguous (sorted offsets + lengths tile the blob exactly),
    offsets are utf-8 OCTETS not characters, and walking a blob by its
    headers alone (no index) re-derives every (doc_id, payload_length)
    — the self-describing property record headers exist for."""
    index, segments = archive.pack_segments(_docs(spark), n_segments=2)
    idx = sorted(
        index.collect(), key=lambda r: (r.segment_id, r.offset)
    )
    blobs = {r.segment_id: bytes(r.blob) for r in segments.collect()}
    stats = {r.segment_id: (r.n_records, r.total_bytes) for r in segments.collect()}
    per_seg = {}
    for r in idx:
        per_seg.setdefault(r.segment_id, []).append(r)
    for seg, rows in per_seg.items():
        blob = blobs[seg]
        assert stats[seg] == (len(rows), len(blob))
        pos = 0
        for r in rows:
            assert r.offset == pos
            header = blob[r.offset : r.payload_offset].decode()
            tag, did, plen = header.rstrip("\n").split(" ")
            assert (tag, int(did), int(plen)) == ("WARC", r.doc_id, r.payload_length)
            pos += r.length
        assert pos == len(blob)
    # octets, not characters: the Persian doc's payload_length must be
    # its utf-8 byte count, strictly more than its character count
    persian = next(r for r in idx if r.doc_id == 2)
    text = next(r.text for r in _docs(spark).collect() if r.doc_id == 2)
    assert persian.payload_length == len(text.encode()) > len(text)


def test_pack_shuffles_once_on_segment_id(spark):
    """The write path's only exchange is the segment_id partitioning —
    the running-offset window and the blob fold reuse it (one shuffle
    of the record bytes, the unavoidable minimum)."""
    index, segments = archive.pack_segments(_docs(spark), n_segments=2)
    plan = segments._jdf.queryExecution().executedPlan().toString()
    import re

    exchanges = re.findall(r"Exchange hashpartitioning\(([^,]+)", plan)
    assert exchanges and all("segment_id" in e for e in exchanges)
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_read_prunes_to_requested_segment(spark):
    """A filtered index read touches only the matching segment's blob
    row (broadcast side) and returns only that segment's docs."""
    index, segments = archive.pack_segments(_docs(spark), n_segments=2)
    one = index.where(F.col("segment_id") == 0)
    out = archive.read_records(one, segments).collect()
    assert out and all(r.segment_id == 0 for r in out)


# ---------------------------------------------------------------- CDX


def _caps(spark):
    """Hand-built capture history for two urlkeys:

    u1: ts 1 dA, ts 2 dB, ts 3 dA (revisit of ts1), ts 4 dB (revisit of
        ts2) → latest = ts4/dB, payload at ts2, IS a revisit.
    u2: ts 5 dC, ts 6 dD → latest = ts6/dD fresh (payload at ts6).
    """
    rows = [
        ("u1", 1, "dA"),
        ("u1", 2, "dB"),
        ("u1", 3, "dA"),
        ("u1", 4, "dB"),
        ("u2", 5, "dC"),
        ("u2", 6, "dD"),
    ]
    return spark.createDataFrame(
        rows, "urlkey string, capture_ts long, digest string"
    )


def test_cdx_resolve_semantics(spark):
    out = {r.urlkey: r for r in archive.cdx_resolve(_caps(spark)).collect()}
    u1, u2 = out["u1"], out["u2"]
    assert (u1.n_captures, u1.n_digests, u1.n_revisits) == (4, 2, 2)
    assert (u1.latest_ts, u1.latest_digest) == (4, "dB")
    assert u1.latest_payload_ts == 2 and u1.latest_is_revisit
    assert (u2.n_captures, u2.n_digests, u2.n_revisits) == (2, 2, 0)
    assert (u2.latest_ts, u2.latest_digest) == (6, "dD")
    assert u2.latest_payload_ts == 6 and not u2.latest_is_revisit


def test_cdx_resolve_single_capture(spark):
    one = spark.createDataFrame(
        [("u", 9, "d")], "urlkey string, capture_ts long, digest string"
    )
    r = archive.cdx_resolve(one).collect()[0]
    assert (r.n_captures, r.n_revisits, r.latest_is_revisit) == (1, 0, False)
    assert r.latest_payload_ts == 9


def test_cdx_resolve_plan_has_no_window_or_join(spark):
    """The scale contract: two hash aggregations on urlkey — no window
    over the capture stream, no self-join."""
    plan = archive.cdx_resolve(_caps(spark))._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan
    assert "Join" not in plan


# ------------------------------------------------------------- revalidation


def _revcaps(spark):
    # u1: A-B-A — the third capture is a WARC revisit (digest seen
    # before) but NOT a 304 (previous digest was B); u2: A-A — a 304.
    return spark.createDataFrame(
        [
            ("u1", 1, "A", 100),
            ("u1", 2, "B", 110),
            ("u1", 3, "A", 120),
            ("u2", 1, "A", 50),
            ("u2", 2, "A", 55),
            ("u3", 9, "Z", 70),
        ],
        "urlkey string, capture_ts int, digest string, n_bytes int",
    )


def test_revalidation_vs_revisit_semantics(spark):
    """The semantic line this operator exists for: conditional GET only
    carries the PREVIOUS capture's validator, so an A-B-A return
    transfers its full body even though cdx_resolve counts it as a
    revisit."""
    out = {r.urlkey: r for r in archive.revalidation_plan(_revcaps(spark)).collect()}
    u1 = out["u1"]
    assert (u1.n_captures, u1.n_refetches) == (3, 2)
    assert (u1.n_not_modified, u1.n_modified) == (0, 2)
    assert (u1.bytes_saved, u1.bytes_fetched) == (0, 330)
    # cdx_resolve sees one revisit in the same history
    cdx = {r.urlkey: r for r in archive.cdx_resolve(
        _revcaps(spark).drop("n_bytes")).collect()}
    assert cdx["u1"].n_revisits == 1
    u2 = out["u2"]
    assert (u2.n_not_modified, u2.bytes_saved, u2.bytes_fetched) == (1, 55, 50)


def test_revalidation_single_capture(spark):
    u3 = {r.urlkey: r for r in archive.revalidation_plan(_revcaps(spark)).collect()}["u3"]
    assert (u3.n_captures, u3.n_refetches, u3.n_not_modified) == (1, 0, 0)
    assert (u3.bytes_saved, u3.bytes_fetched) == (0, 70)


def test_revalidation_plan_single_exchange(spark):
    """The scale contract: the lag window hash-partitions on urlkey and
    the rollup reuses that partitioning — captures shuffle ONCE."""
    plan = (
        archive.revalidation_plan(_revcaps(spark))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange") == 1, plan


# ------------------------------------------------------------ snapshot diff


def test_snapshot_diff_statuses(spark):
    old = spark.createDataFrame(
        [("a", "d1"), ("b", "d2"), ("c", "d3")], "urlkey string, digest string"
    )
    new = spark.createDataFrame(
        [("b", "d2"), ("c", "dX"), ("d", "d9")], "urlkey string, digest string"
    )
    got = {r.urlkey: r for r in archive.snapshot_diff(old, new).collect()}
    assert {k: v.status for k, v in got.items()} == {
        "a": "gone", "b": "unchanged", "c": "changed", "d": "added"
    }
    assert got["a"].new_digest is None and got["d"].old_digest is None
    assert (got["c"].old_digest, got["c"].new_digest) == ("d3", "dX")


def test_snapshot_diff_empty_old_is_all_added(spark):
    old = spark.createDataFrame([], "urlkey string, digest string")
    new = spark.createDataFrame([("x", "d")], "urlkey string, digest string")
    rows = archive.snapshot_diff(old, new).collect()
    assert len(rows) == 1 and rows[0].status == "added"
