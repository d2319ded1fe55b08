"""Link-graph analysis for crawl scheduling.

The reference crawls a fixed five-source seed list; a web-scale frontier
needs a signal for WHICH hosts deserve budget first. Host-level PageRank
over the discovered link graph is the classic one (the frontier's
priority column is exactly where it plugs in: ``rank`` joins onto
pending URLs by host and ``frontier.pop_batch`` orders on it).

Expressed Spark-first: per iteration one broadcast join of the (small —
one row per HOST, not per URL) rank vector against the edge list and one
groupBy(dst) sum — map-side partial aggregation absorbs hub-host
in-degree skew the same way the dedup tiers absorb hot shingles. The
rank vector is eagerly localCheckpoint'ed each iteration (O(1)-deep
lineage, the ``duplicate_clusters``/k-means pattern).

All arithmetic is EXACT INTEGER (scaled ranks, ``div`` floor division)
so a DuckDB twin replays every iteration bit-identically — the same
determinism contract as the integer k-means (v10): no IEEE
evaluation-order drift between engines, ever. Dangling mass (nodes with
no out-edges) is dropped rather than redistributed — documented,
deterministic, and identical in both engines; for crawl prioritization
the relative order is what matters.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank_int(
    edges: DataFrame,
    iters: int = 3,
    damping_num: int = 85,
    damping_den: int = 100,
    scale: int = 1_000_000,
) -> DataFrame:
    """Integer PageRank over ``(src, dst)`` edges → ``(node, rank)``.

    rank⁰ = ``scale`` for every node; per iteration each node with
    out-degree d contributes ``rank div d`` to every successor and
    rank' = base + (damping_num · Σ contribs) div damping_den, with
    base = (scale · (den − num)) div den. Every step is integer-exact,
    so the unrolled-CTE SQL twin matches bit-for-bit (analytics.G1_SQL).

    Scale shape: the edge list is the big table — it is joined once with
    the out-degree (computed once, checkpointed) and then per iteration
    ONLY against the broadcast rank vector (|hosts| rows, a few MB for
    10⁷ hosts at 16 B/row); the per-iteration shuffle is the groupBy(dst)
    partial-agg sum. Nothing driver-side, no collect."""
    e = edges.select(
        F.col("src").cast("long").alias("src"),
        F.col("dst").cast("long").alias("dst"),
    )
    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("__outdeg"))
    # (src, dst, outdeg) reused every iteration — cut it once; lazily each
    # iteration would rescan + re-shuffle the degree join
    ej = e.join(deg, "src").localCheckpoint(eager=True)
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    base = (scale * (damping_den - damping_num)) // damping_den
    ranks = nodes.withColumn("rank", F.lit(scale).cast("long"))
    for it in range(iters):
        if it > 0:
            # materialize the PREVIOUS iteration before broadcasting it:
            # O(1)-deep lineage (the duplicate_clusters pattern) and the
            # broadcast input is a plain frame, not a replayed plan. The
            # final iteration stays lazy so callers see its real plan.
            ranks = ranks.localCheckpoint(eager=True)
        contrib = (
            ej.join(F.broadcast(ranks), ej["src"] == ranks["node"])
            .select("dst", F.expr("rank div __outdeg").alias("__share"))
            .groupBy("dst")
            .agg(F.sum("__share").alias("__contrib"))
        )
        # contrib is ≤ |hosts| rows — same size class as the rank vector,
        # so the rank rebuild broadcasts it rather than shuffling nodes
        ranks = nodes.join(
            F.broadcast(contrib), nodes["node"] == contrib["dst"], "left"
        ).select(
            "node",
            (
                F.lit(base)
                + F.expr(
                    f"({damping_num} * coalesce(__contrib, 0L))"
                    f" div {damping_den}"
                )
            ).alias("rank"),
        )
    return ranks
