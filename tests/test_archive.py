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
