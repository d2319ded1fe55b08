"""news_crawler_spark — a PySpark-native URL-frontier crawl/analytics engine.

A from-scratch reimplementation of the *capabilities* of the reference
crawler (alimoosavi/news-crawler): frontier management (priority +
incremental cursors), URL-seen dedup, per-host politeness, fetch+extract
dataflow into interleaved text+media span documents, retry/failure state,
lineage, and the analytic query workload — re-expressed as DataFrame +
Arrow-UDF dataflow over partitioned parquet tables (Iceberg-shaped API,
parquet fallback when no Iceberg runtime is on the classpath).

Design stance (SURVEY.md §7.0): batch rounds over snapshot tables driven by
a thin driver loop; every round is pure DataFrame ops with deterministic
tie-breaking, so crawl ordering and the URL-seen set are reproducible and
checkpoint/resume-able. All Python execution is vectorized (pandas/Arrow
UDFs); no row-at-a-time Python UDFs anywhere.
"""

__version__ = "0.2.0"

# Public API — the surface a user of the reference system needs
# (lazy imports keep bare `import news_crawler_spark` JVM-free).
__all__ = [
    "CrawlEngine",
    "EmbedScheduler",
    "SnapshotCatalog",
    "get_spark",
]


def __getattr__(name):
    if name == "CrawlEngine":
        from .engine import CrawlEngine
        return CrawlEngine
    if name == "EmbedScheduler":
        from .embed_scheduler import EmbedScheduler
        return EmbedScheduler
    if name == "SnapshotCatalog":
        from .catalog import SnapshotCatalog
        return SnapshotCatalog
    if name == "get_spark":
        from .session import get_spark
        return get_spark
    raise AttributeError(f"module 'news_crawler_spark' has no attribute {name!r}")
