"""KMV (bottom-k) distinct-count sketch — deterministic and mergeable.

A 100 TB corpus pipeline constantly needs cardinalities that are too
expensive to compute exactly per slice (vocabulary size per source, unique
hosts per crawl day, distinct shingles per shard). The reference keeps
such counters as Redis scalars it increments (redis_cache_manager.py) —
exact but single-writer. The scalable restatement is a mergeable sketch:
each shard summarizes, summaries union, the estimate falls out.

This is the classic KMV / bottom-k estimator (Bar-Yossef et al. 2002;
the same sketch Apache DataSketches ships as *theta*): hash every value
to a uniform 60-bit integer, keep the k smallest DISTINCT hashes, and
estimate ``n ≈ (k-1) · 2^60 / h_k`` where ``h_k`` is the k-th smallest
(relative error ~ 1/sqrt(k-2)). Three properties make it the right fit
here, over HyperLogLog / approx_count_distinct:

- **deterministic**: md5-derived hashes and exact integer floor division
  mean any engine reproduces the estimate bit-for-bit — DuckDB replays
  the whole sketch in the x15 correctness gate (approx_count_distinct's
  HLL++ is engine-internal and ungateable).
- **mergeable**: bottom-k is distributive — ``bottomk(A ∪ B) =
  bottomk(bottomk(A) ∪ bottomk(B))`` — so per-shard sketches union into
  the global sketch with zero error (x15 checks merged ≡ direct).
- **bounded state**: the two-phase aggregation below never materializes
  more than (partitions × k) candidate hashes per group, map-side
  combined, so the shuffle carries sketches, not values.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "md5_hash60",
    "kmv_bottom_k",
    "kmv_merge",
    "with_kmv_estimate",
    "KMV_SPACE",
    "countmin_table",
    "countmin_merge",
    "countmin_estimate",
    "qsketch_bottom_k",
    "qsketch_merge",
    "qsketch_quantiles",
    "HLL_BUCKETS",
    "hll_registers",
    "hll_merge",
    "hll_estimate",
]

# hash space: first 15 md5 hex chars = 60 bits, always positive — chosen
# (like dedup.md5_hash64) so a DuckDB oracle reproduces it exactly via
# ('0x' || substring(md5(v), 1, 15))::BIGINT
KMV_SPACE = 1 << 60


def md5_hash60(value: Column) -> Column:
    """Uniform positive 60-bit hash of a string column."""
    return F.conv(F.substring(F.md5(value), 1, 15), 16, 10).cast("long")


def kmv_bottom_k(
    df: DataFrame, group_cols: list[str], hash_col: str, k: int
) -> DataFrame:
    """Per group: the k smallest distinct values of ``hash_col``, as a
    sorted array ``mins`` (shorter than k when the group has fewer
    distinct hashes — then the sketch IS the exact distinct set).

    Two-phase: per-input-partition bottom-k first (collect_set state is
    bounded by the partition, its output by k), then bottom-k of the
    ≤ partitions × k survivors. Bottom-k is distributive, so the result
    is exact and independent of partitioning.
    """
    dist = df.select(*group_cols, hash_col).distinct()
    per_part = (
        dist.withColumn("__pid", F.spark_partition_id())
        .groupBy(*group_cols, "__pid")
        .agg(F.slice(F.array_sort(F.collect_set(hash_col)), 1, k).alias("__mins"))
    )
    return (
        per_part.select(*group_cols, F.explode("__mins").alias("__h"))
        .groupBy(*group_cols)
        .agg(F.slice(F.array_sort(F.collect_set("__h")), 1, k).alias("mins"))
    )


def kmv_merge(sketches: list[DataFrame], group_cols: list[str], k: int) -> DataFrame:
    """Union per-shard sketches into one: bottom-k of the unioned mins.
    Zero-error merge — ``kmv_merge(shards) ≡ kmv_bottom_k(all rows)``."""
    u = sketches[0]
    for s in sketches[1:]:
        u = u.unionByName(s)
    return (
        u.select(*group_cols, F.explode("mins").alias("__h"))
        .groupBy(*group_cols)
        .agg(F.slice(F.array_sort(F.collect_set("__h")), 1, k).alias("mins"))
    )


def with_kmv_estimate(
    sketch: DataFrame, k: int, mins: str = "mins", out: str = "estimate"
) -> DataFrame:
    """Add the cardinality estimate: ``(k-1)·2^60 div h_k`` when the
    sketch is full, else the exact count (an unfilled sketch holds every
    distinct hash). Exact DECIMAL(38,0) floor division (`div`), never
    floating point — (k-1)·2^60 overflows BIGINT for k > 8, and IEEE
    rounding would break cross-engine determinism."""
    full = F.size(F.col(mins)) >= k
    est = F.expr(
        f"CAST({k - 1} AS DECIMAL(38,0)) * CAST({KMV_SPACE} AS DECIMAL(38,0))"
        f" div CAST(element_at({mins}, {k}) AS DECIMAL(38,0))"
    )
    return sketch.withColumn(
        out, F.when(full, est).otherwise(F.size(F.col(mins)).cast("long"))
    )


# ---------------------------------------------------------------------------
# Count-min: the frequency sketch (Cormode & Muthukrishnan 2005) — the dual
# of KMV. Same three properties: deterministic (row-salted md5 cell hashes,
# integer counts), mergeable (tables add cell-wise), bounded (each group's
# table is exactly depth × width cells no matter how many values flow in).
# Estimates are exact-or-over, never under: est(v) = min over rows of
# cell(v) — the bias a Spark-side exact top-k can verify (the x16 gate
# carries the exact count beside the estimate).


def _cm_cell(value: Column, row: int, width: int) -> Column:
    """Row-salted cell index: md5-derived, so any engine replays it."""
    return F.pmod(
        md5_hash60(F.concat(F.lit(f"cm{row}:"), value)), F.lit(int(width))
    )


def countmin_table(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    depth: int = 4,
    width: int = 64,
) -> DataFrame:
    """Per group: the count-min table as (group, r, c, n) rows — built in
    ONE scan (the depth hashes explode from each input row) and one
    map-side-combinable groupBy; the shuffle carries at most
    |groups| × depth × width rows."""
    v = F.col(value_col).cast("string")
    cells = F.array(
        *[
            F.struct(
                F.lit(i).cast("int").alias("r"),
                _cm_cell(v, i, width).cast("int").alias("c"),
            )
            for i in range(depth)
        ]
    )
    return (
        df.select(*group_cols, F.explode(cells).alias("__rc"))
        .groupBy(*group_cols, F.col("__rc.r").alias("r"), F.col("__rc.c").alias("c"))
        .agg(F.count("*").alias("n"))
    )


def countmin_merge(tables: list[DataFrame], group_cols: list[str]) -> DataFrame:
    """Tables from disjoint shards add cell-wise — zero-error merge."""
    u = tables[0]
    for t in tables[1:]:
        u = u.unionByName(t)
    return u.groupBy(*group_cols, "r", "c").agg(F.sum("n").alias("n"))


def countmin_estimate(
    items: DataFrame,
    table: DataFrame,
    group_cols: list[str],
    value_col: str,
    depth: int = 4,
    width: int = 64,
    out: str = "cm_estimate",
) -> DataFrame:
    """Point queries: for each (group, value) in ``items``, the count-min
    estimate = min over rows of its cell's count. The table is tiny
    (depth × width per group), so the join broadcasts."""
    from pyspark.sql.functions import broadcast

    v = F.col(value_col).cast("string")
    probes = items.select(
        "*",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).cast("int").alias("r"),
                        _cm_cell(v, i, width).cast("int").alias("c"),
                    )
                    for i in range(depth)
                ]
            )
        ).alias("__rc"),
    ).select("*", F.col("__rc.r").alias("r"), F.col("__rc.c").alias("c"))
    joined = probes.join(broadcast(table), [*group_cols, "r", "c"])
    return (
        joined.groupBy(*group_cols, value_col)
        .agg(F.min("n").cast("long").alias(out))
    )


# ---------------------------------------------------------------------------
# Hash-sample quantile sketch — the third leg of the sketch trio
# (KMV = cardinality, count-min = frequency, this = quantiles). x17's
# exact discrete quantiles sort every group; at 100 TB the calibration
# numbers come from a bounded sample instead. KLL/t-digest are the
# classical answer but are ORDER-DEPENDENT (merge-tree shape changes the
# sketch), so no SQL twin could replay them; this sketch trades their
# worst-case bound for the property everything in this repo is built on:
# it is a pure function of the row SET. Keep the k rows whose
# md5(key) is smallest — a uniform without-replacement sample under the
# md5 permutation — and read quantiles off the sample's order
# statistics (error O(1/sqrt(k)) w.h.p.; exact whenever the group has
# ≤ k rows, since then the sample IS the group). Deterministic,
# zero-error mergeable (bottom-k of a union distributes, exactly like
# KMV), bounded (≤ partitions × k pairs per group in flight).
# Contract: ``key_col`` is unique per row (doc_id) — a duplicated key
# would collapse two rows into one sample slot.


def qsketch_bottom_k(
    df: DataFrame, group_cols: list[str], key_col: str, value_col: str, k: int
) -> DataFrame:
    """Per group: the (hash, value) pairs of the k rows with smallest
    md5-derived row-key hash, as a sorted struct array ``sample``.
    Same two-phase bounded aggregation as ``kmv_bottom_k``."""
    pair = F.struct(
        md5_hash60(F.col(key_col).cast("string")).alias("h"),
        F.col(value_col).cast("long").alias("v"),
    )
    pairs = df.select(*group_cols, pair.alias("__p"))
    per_part = (
        pairs.withColumn("__pid", F.spark_partition_id())
        .groupBy(*group_cols, "__pid")
        .agg(F.slice(F.array_sort(F.collect_list("__p")), 1, k).alias("__s"))
    )
    return (
        per_part.select(*group_cols, F.explode("__s").alias("__p"))
        .groupBy(*group_cols)
        .agg(F.slice(F.array_sort(F.collect_list("__p")), 1, k).alias("sample"))
    )


def qsketch_merge(
    sketches: list[DataFrame], group_cols: list[str], k: int
) -> DataFrame:
    """Union per-shard samples into one: bottom-k (by hash) of the
    unioned pairs. Zero-error — equals the direct sketch, because the
    hash order is global and shard keys are disjoint."""
    u = sketches[0]
    for s in sketches[1:]:
        u = u.unionByName(s)
    return (
        u.select(*group_cols, F.explode("sample").alias("__p"))
        .groupBy(*group_cols)
        .agg(F.slice(F.array_sort(F.collect_list("__p")), 1, k).alias("sample"))
    )


def qsketch_quantiles(
    sketch: DataFrame,
    probs: list[tuple[str, int, int]],
    sample: str = "sample",
) -> DataFrame:
    """Read quantile estimates off the sample: for each (name, num, den)
    the sample value at rank ceil(num·s/den) in value order (s = sample
    size) — percentile_disc semantics, pure integer arithmetic (the x17
    rank rule), so a SQL twin reproduces every pick. Adds one column per
    prob plus ``sample_n``."""
    out = sketch.withColumn(
        "__vals", F.array_sort(F.transform(sample, lambda p: p["v"]))
    ).withColumn("sample_n", F.size(sample).cast("int"))
    for name, num, den in probs:
        rank = F.expr(f"({num} * size({sample}) + {den - 1}) div {den}")
        out = out.withColumn(
            name, F.element_at("__vals", rank.cast("int")).cast("long")
        )
    return out.drop("__vals")


# ---------------------------------------------------------------------------
# HyperLogLog — fixed-size registers, md5-derived so the gate can replay it.
#
# KMV (above) was chosen as the PRIMARY cardinality sketch because
# approx_count_distinct's HLL++ registers are engine-internal; this is the
# complementary point in the space, with the SAME determinism discipline:
# the register construction is md5 arithmetic a SQL twin reproduces
# bit-for-bit, so the full register STATE sits under the hard gate (x35) —
# only the final float estimate (one transcendental per group, computed
# from gated integers) stays pytest-land. Why keep both sketches: HLL
# state is FIXED at m registers per group (m=256 → ≤256 tiny int rows,
# ~1.5 kB serialized) vs KMV's k×8 B (k=256 → 2 kB, k=4096 → 32 kB for
# 1.5 % error), and HLL merge is a plain per-bucket MAX — associative,
# commutative, idempotent — so re-delivered shards can't bias it (KMV
# merge needs distinct-before-bottom-k). At 10^10 URLs the frontier's
# per-(host, day) distinct counters are exactly this shape: a groupBy
# whose shuffle carries ≤ m ints per group regardless of group size.
# ---------------------------------------------------------------------------

HLL_BUCKETS = 256  # b = 8 index bits; relative error ≈ 1.04/√256 ≈ 6.5 %
_HLL_FIELD_BITS = 56  # md5 hex chars 3..16 — the rho field


def hll_registers(
    df: DataFrame, group_cols: list[str], value_col: str
) -> DataFrame:
    """Per group: the HLL register file as rows ``(…group, bucket,
    max_rho)`` — only OCCUPIED buckets are emitted (absent bucket ≡
    rho 0). Bucket = first 2 md5 hex chars (8 bits); rho = 1 + count of
    leading zeros in the next 56 bits (all-zero field → 57), computed
    EXACTLY as ``57 - bitlength(suffix)`` via base-2 string conversion
    — no float log anywhere. One groupBy, map-side combined: a
    billion-row group arrives at its reducer as ≤ 256·|partitions|
    partial maxima."""
    h = F.md5(F.col(value_col).cast("string"))
    suffix = F.conv(F.substring(h, 3, 14), 16, 10).cast("long")
    rho = F.when(suffix == 0, F.lit(_HLL_FIELD_BITS + 1)).otherwise(
        F.lit(_HLL_FIELD_BITS + 1) - F.length(F.conv(suffix, 10, 2))
    )
    return (
        df.select(
            *group_cols,
            F.conv(F.substring(h, 1, 2), 16, 10).cast("int").alias("bucket"),
            rho.cast("int").alias("__rho"),
        )
        .groupBy(*group_cols, "bucket")
        .agg(F.max("__rho").cast("int").alias("max_rho"))
    )


def hll_merge(sketches: list[DataFrame], group_cols: list[str]) -> DataFrame:
    """Union register files: per-bucket MAX — associative, commutative,
    idempotent (at-least-once shard delivery cannot bias the estimate,
    unlike additive counters). Equals the direct sketch exactly."""
    u = sketches[0]
    for s in sketches[1:]:
        u = u.unionByName(s)
    return u.groupBy(*group_cols, "bucket").agg(
        F.max("max_rho").cast("int").alias("max_rho")
    )


def hll_estimate(registers: DataFrame, group_cols: list[str]) -> DataFrame:
    """Registers → cardinality estimate (Flajolet et al. 2007, the
    original bias-corrected form): ``E = α_m·m²/Z`` with ``Z = Σ 2^-ρ``
    over all m registers (absent ⇒ ρ=0 ⇒ term 1), switching to linear
    counting ``m·ln(m/V)`` when ``E ≤ 2.5m`` and some register is
    empty. Adds ``(n_buckets_set, estimate)`` per group; float enters
    HERE only — everything upstream is gate-pinned integers."""
    m = HLL_BUCKETS
    alpha = 0.7213 / (1.0 + 1.079 / m)
    agg = registers.groupBy(*group_cols).agg(
        F.count(F.lit(1)).cast("int").alias("n_buckets_set"),
        F.sum(F.pow(F.lit(2.0), -F.col("max_rho"))).alias("__z_set"),
    )
    z = F.col("__z_set") + (F.lit(m) - F.col("n_buckets_set"))
    raw = F.lit(alpha * m * m) / z
    v = F.lit(m) - F.col("n_buckets_set")
    lc = F.lit(float(m)) * F.log(F.lit(float(m)) / v)
    est = F.when((raw <= 2.5 * m) & (v > 0), lc).otherwise(raw)
    return agg.select(
        *group_cols, "n_buckets_set", est.alias("estimate")
    )
