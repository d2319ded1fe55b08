"""Fetch stage: popped frontier rows → raw pages.

The reference fetches with async Playwright under a semaphore
(collectors/isna/pages_collector.py:55-181 and peers, SURVEY.md S7/S8).
Here the network is replaced in-sandbox by the deterministic synthetic
page generator (synth.page_payload / page_ok) — but the *plumbing* is the
real design: ``mapInPandas`` over the popped batch repartitioned by host,
iterator form so per-partition session setup (browser/HTTP pool in
production) is amortized across Arrow batches, one partition ≈ one polite
client per host group.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .. import synth

# popped columns carried through + fetch results
FETCHED_SCHEMA = (
    "url string, canonical_url string, url_hash long, host string, "
    "source string, priority int, published_ts timestamp, "
    "discovery_time timestamp, tried_count int, "
    "ok boolean, fetch_ms int, payload string"
)

_CARRY = [
    "url", "canonical_url", "url_hash", "host", "source", "priority",
    "published_ts", "discovery_time", "tried_count",
]


def fetch_pages(popped: DataFrame, partitions: int | None = None) -> DataFrame:
    """Fetch every popped URL. Deterministic; failure injection ~5%.

    Repartitions by host so a production fetcher holds one connection pool
    per host per partition (politeness-friendly); the synthetic fetcher
    keeps the same shape.
    """
    src = popped.select(*_CARRY)
    src = src.repartition(partitions, "host") if partitions else src.repartition("host")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # per-partition setup would go here (browser context / HTTP pool)
        for pdf in batches:
            urls = pdf["canonical_url"]
            pdf = pdf.copy()
            pdf["ok"] = urls.map(synth.page_ok)
            pdf["fetch_ms"] = urls.map(synth.page_fetch_ms).astype("int32")
            pdf["payload"] = [
                synth.page_payload(u) if ok else None
                for u, ok in zip(urls, pdf["ok"])
            ]
            yield pdf

    return src.mapInPandas(run, schema=FETCHED_SCHEMA)
