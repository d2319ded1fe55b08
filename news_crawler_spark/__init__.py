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

__version__ = "0.1.0"
