"""Explicit StructTypes for every engine table (no schema inference).

Mirrors the reference's data model (SURVEY.md §1):
- frontier        ← reference `news_links` table (db_models.py:26-81) +
                    retry columns (alembic 20251209175903:30-64), plus the
                    derived columns a distributed engine needs (canonical
                    url, 64-bit hash, host, priority, discovery time).
- documents       ← reference `news` table / `NewsData` (schema.py:14-25),
                    generalized to interleaved text+media span arrays per
                    BASELINE.json input_hint.
- pages           ← synthetic fetch corpus standing in for the network.
- robots_rules / politeness ← validate_link (news_sources/__init__.py:27-29)
                    and the concurrency knobs (config.py:27-36).
- cursors         ← last-link JSON cache (cache_manager.py:12-16,54-69).
- lineage         ← the reference's Prometheus counters / crawl stats
                    (news_historical_page_scheduler.py:410-469) as a table.
"""

from __future__ import annotations

from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# status enum (db_models.py:18-21)
STATUS_PENDING = "pending"
STATUS_COMPLETED = "completed"
STATUS_FAILED = "failed"

MAX_RETRIES = 3  # config.py:31; database_manager.py:25

SPAN = T.StructType(
    [
        T.StructField("kind", T.StringType(), False),       # 'text' | 'image'
        T.StructField("text", T.StringType(), True),
        T.StructField("media_ref", T.StringType(), True),
        T.StructField("offset", T.IntegerType(), False),    # document order
    ]
)

SEED_LIST = T.StructType(
    [
        T.StructField("source", T.StringType(), False),
        T.StructField("url", T.StringType(), False),
        T.StructField("published_ts", T.TimestampType(), True),
        T.StructField("discovery_time", T.TimestampType(), True),
    ]
)

# Fetch-outcome event (the worker-side completion record a fetch stage
# publishes back to the coordinator topic; joined to discoveries in the
# streaming audit join, streaming.fetch_audit_join_stream).
FETCH_OUTCOME = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("fetch_ts", T.TimestampType(), True),
        T.StructField("status", T.StringType(), False),
    ]
)

FRONTIER = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("canonical_url", T.StringType(), False),
        T.StructField("url_hash", T.LongType(), False),     # xxhash64(canonical)
        T.StructField("host", T.StringType(), False),
        T.StructField("source", T.StringType(), False),
        T.StructField("priority", T.IntegerType(), False),
        T.StructField("published_ts", T.TimestampType(), True),
        T.StructField("discovery_time", T.TimestampType(), True),
        T.StructField("status", T.StringType(), False),
        T.StructField("tried_count", T.IntegerType(), False),
        T.StructField("last_tried_round", T.IntegerType(), True),
    ]
)

DOCUMENTS = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),     # hex(xxhash64(url))
        T.StructField("url", T.StringType(), False),
        T.StructField("source", T.StringType(), False),
        T.StructField("host", T.StringType(), False),
        T.StructField("title", T.StringType(), True),
        T.StructField("summary", T.StringType(), True),
        T.StructField("keywords", T.ArrayType(T.StringType()), True),
        T.StructField("spans", T.ArrayType(SPAN), False),
        T.StructField("published_ts", T.TimestampType(), True),
        T.StructField("published_epoch", T.LongType(), True),
        T.StructField("fetched_round", T.IntegerType(), False),
    ]
)

PAGES = T.StructType(
    [
        T.StructField("canonical_url", T.StringType(), False),
        T.StructField("host", T.StringType(), False),
        T.StructField("ok", T.BooleanType(), False),
        T.StructField("fetch_ms", T.IntegerType(), False),
        T.StructField("payload", T.StringType(), True),
    ]
)

ROBOTS_RULES = T.StructType(
    [
        T.StructField("host", T.StringType(), False),
        T.StructField("rule_kind", T.StringType(), False),  # 'allow' | 'deny'
        T.StructField("path_prefix", T.StringType(), False),
    ]
)

POLITENESS = T.StructType(
    [
        T.StructField("host", T.StringType(), False),
        T.StructField("max_per_round", T.IntegerType(), False),   # bucket refill
        T.StructField("bucket_capacity", T.IntegerType(), False), # bucket cap
    ]
)

CURSORS = T.StructType(
    [
        T.StructField("source", T.StringType(), False),
        T.StructField("last_url", T.StringType(), True),
        T.StructField("round", T.IntegerType(), False),
    ]
)

LINEAGE = T.StructType(
    [
        T.StructField("round", T.IntegerType(), False),
        T.StructField("host", T.StringType(), False),
        T.StructField("popped", T.LongType(), False),
        T.StructField("fetched_ok", T.LongType(), False),
        T.StructField("fetched_fail", T.LongType(), False),
        T.StructField("marked_failed", T.LongType(), False),
    ]
)

EMBEDDINGS = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("vector", T.ArrayType(T.FloatType()), False),
        T.StructField("dim", T.IntegerType(), False),
    ]
)
