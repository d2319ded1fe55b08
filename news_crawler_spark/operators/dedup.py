"""Document deduplication family for the training-data pipeline.

The reference dedups only URLs (unique link index, db_models.py:40); a
100 TB corpus additionally needs *content* dedup. Four tiers, all
expressed Spark-first:

- exact:       md5-groupBy (one shuffle on a 16-byte key)
- n-gram Jaccard: exact pairwise similarity via a HASHED-shingle
                 inverted-index self-join (the correctness oracle;
                 O(pairs-sharing-a-shingle), not O(n²))
- MinHash+LSH: signature via JVM-side xxhash64 over hashed shingles
               inside higher-order array functions (zero Python), banded
               bucketing, candidate join, exact-Jaccard verify on hashed
               sets — the scale path (O(n·bands) shuffle)
- SimHash:     64-bit per-doc sketch from token hashes (pure
               expressions), banded hamming candidates with COMPLETE
               recall at the named radius (n_bands = max_hamming+1)
- clusters:    connected components over near-dup pairs (iterative
               min-label propagation) — the pipeline's final output

Hash provenance: shingle/MinHash hashes are Spark's builtin ``xxhash64``
(seed 42), bit-identical to the pure-Python twin in functions/xxh64.py;
SimHash token hashes default to md5-derived 64-bit values so the
driver's DuckDB oracle recomputes the sketch exactly (analytics.D4_SQL;
xxhash64 variant retained for speed via ``token_hash="xxhash64"``).
Nothing depends on partitioning.

Scale notes: shingles travel as 8-byte hashes everywhere (3-5× smaller
shuffles than strings; Jaccard identical up to 64-bit collisions, which
the string-side sf0.01 oracle would catch). The inverted index still
explodes ~|doc|·|shingles| rows — at 100 TB use ``minhash_lsh_pairs``
(bounded signature width) and reserve ``ngram_jaccard_pairs`` for
verify-stage candidates. Stop-shingle skew (one shingle shared by k docs
= k²/2 join rows) is capped by ``df_cap`` (on by default).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# XXH64 primes (the public spec) as wrapping uint64 — shared by the
# vectorized kernels below that must reproduce Spark's XxHash64 bit-for-bit
_XX_P1 = np.uint64(0x9E3779B185EBCA87)
_XX_P2 = np.uint64(0xC2B2AE3D27D4EB4F)
_XX_P3 = np.uint64(0x165667B19E3779F9)
_XX_P4 = np.uint64(0x85EBCA77C2B2AE63)
_XX_P5 = np.uint64(0x27D4EB2F165667C5)
_XX_SEED = np.uint64(42)  # Spark's xxhash64 seed


def _xx_rotl(x, r: int):
    return (x << np.uint64(r)) | (x >> np.uint64(64 - r))


def _xxh64_hash_long(v, seed):
    """Spark ``XxHash64`` on a LongType input: ``hashLong(v, seed)`` —
    the 8-byte tail step of the XXH64 spec, vectorized; ``v`` and/or
    ``seed`` may be uint64 arrays, all ops wrap in uint64 (numpy array
    arithmetic wraps silently — the semantics we need)."""
    h = seed + _XX_P5 + np.uint64(8)
    h = h ^ (_xx_rotl(v * _XX_P2, 31) * _XX_P1)
    h = _xx_rotl(h, 27) * _XX_P1 + _XX_P4
    h ^= h >> np.uint64(33)
    h *= _XX_P2
    h ^= h >> np.uint64(29)
    h *= _XX_P3
    h ^= h >> np.uint64(32)
    return h


def _gram_hashes_distinct(toks: list[str], n: int):
    """First-occurrence-distinct chained-xxhash64 word-n-gram hashes of
    a token list, as signed int64 — the ``with_hashed_shingles``
    contract computed in numpy (token hash = XXH64 of the UTF-8 bytes,
    gram hash = Spark's multi-arg chaining: each element's hashLong
    seeds the next, from seed 42). Caller guarantees len(toks) >= n."""
    import pandas as pd

    from ..functions.xxh64 import xxh64

    th = np.array([xxh64(t.encode("utf-8")) for t in toks], dtype=np.uint64)
    m = len(toks) - n + 1
    g = np.full(m, _XX_SEED, dtype=np.uint64)
    for j in range(n):
        g = _xxh64_hash_long(th[j : j + m], g)
    return pd.unique(g.astype(np.int64))


def spread_for_cpu(df: DataFrame) -> DataFrame:
    """Guard for expression-bound stages over small inputs: a tiny
    parquet table scans as ONE partition (file-size-based splitting), so
    a per-row-heavy stage (128-hash MinHash signatures, SimHash bit
    votes, winnowing) serializes on one core — measured as 87% of d3's
    runtime at sf0.1 (11.7 s single-task signature build). Repartition
    up to the cluster parallelism ONLY when the input has fewer
    partitions than cores; at real scale (inputs already ≥ cores
    partitions) this is a no-op, so no extra shuffle is introduced where
    it would hurt."""
    sc = df.sparkSession.sparkContext
    if df.rdd.getNumPartitions() < sc.defaultParallelism:
        return df.repartition(sc.defaultParallelism)
    return df


# --------------------------------------------------------------------------
# exact

def exact_duplicates(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Hash-groupBy exact dedup: one row per distinct text with the
    canonical (minimum) id and the copy count."""
    return (
        docs.select(F.md5(F.col(text_col)).alias("fp"), F.col(id_col))
        .groupBy("fp")
        .agg(F.min(id_col).alias("canonical_id"), F.count("*").alias("n_copies"))
    )


# --------------------------------------------------------------------------
# shingles

def tokens(text_col: str) -> Column:
    return F.split(F.col(text_col), " ")


def shingles_from_tokens(toks: Column, n: int = 3) -> Column:
    """Distinct word n-gram shingles from a *materialized* token array —
    pure higher-order functions (transform over a position sequence).

    ``toks`` MUST be a projected column, not an inline ``split(...)``
    expression: higher-order lambdas re-evaluate captured expressions per
    element, so an inline split turns this into O(tokens²) per row
    (measured 4.4 ms/doc → 0.1 ms/doc after materializing).
    """
    idx = F.sequence(F.lit(0), F.size(toks) - n)
    grams = F.transform(
        idx,
        lambda i: F.concat_ws(
            " ", *[F.element_at(toks, (i + j + 1).cast("int")) for j in range(n)]
        ),
    )
    # guard: docs shorter than n tokens have no shingles (sequence would
    # otherwise count downward and element_at(…,0) would throw)
    return F.when(F.size(toks) >= n, F.array_distinct(grams)).otherwise(
        F.array().cast("array<string>")
    )


def with_shingles(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id", n: int = 3) -> DataFrame:
    toked = docs.select(
        F.col(id_col).alias("doc_id"), tokens(text_col).alias("__toks")
    ).filter(
        # short-doc drop BELOW the shingle projection (≥n tokens ⇔ a
        # non-empty shingle set) — a `size(shingles) > 0` filter above it
        # would be pushed through the Project with the whole shingle
        # expression substituted into the predicate (see
        # with_hashed_shingles)
        F.size("__toks") >= n
    )
    return toked.select(
        "doc_id", shingles_from_tokens(F.col("__toks"), n).alias("shingles")
    )


def with_hashed_shingles(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    passthrough: tuple[str, ...] = (),
) -> DataFrame:
    """(doc_id, sh: array<long>[, *passthrough]) — shingles as 64-bit
    xxhash64 values.

    Everything downstream (inverted index, MinHash signatures, verify
    intersections) operates on the hashes, never the strings: an 8-byte
    long vs a ~25-byte shingle string is a 3-5× smaller shuffle and a
    cheaper sort/intersect, and Jaccard over hashed sets equals Jaccard
    over the strings up to 64-bit collisions (p ≈ m²/2⁶⁴ per doc pair —
    vanishing; the sf0.01 DuckDB string-side oracle would catch any).

    The shingle hash is computed WITHOUT ever materializing the n-gram
    string: each token is hashed once, and a shingle's hash is the
    chained ``xxhash64(th_i, …, th_{i+n-1})`` over the n consecutive
    token hashes (Spark chains multi-arg hashing by feeding the previous
    hash in as the next seed — reproduced by the pytest twin). The
    string path (token slice → concat_ws → hash a ~25-byte string per
    shingle) was measured at 2× the cost of this arithmetic-only form
    at sf0.1 (1.0 s → 0.27 s for the shingle stage, exp round 4): every
    token's bytes are hashed n times either way, but the concat
    allocates and copies each gram before hashing it. Jaccard over
    either hash family is identical up to 64-bit collisions.
    """
    # Drop docs shorter than n tokens HERE, where the predicate is cheap
    # (as the string path does): an empty set has no Jaccard pairs, and
    # an all-NULL MinHash signature must never reach the banding join.
    # The filter must NOT sit above the gram projection: PushDownPredicates
    # substitutes a deterministic predicate straight through a Project
    # (no cost heuristic, unlike CollapseProject), so `size(sh) > 0` above
    # the select re-evaluated the ENTIRE chained-xxhash gram expression
    # per row inside the pushed filter — measured 10-20× on the d3
    # signature stage (14 s vs 0.6 s at sf0.1). ≥n tokens ⇔ sh non-empty,
    # so this placement is semantically identical.
    # Measured note (optimization round): a numpy/pure-python XXH64
    # batch kernel for THIS function was built and benchmarked 1.4-1.6x
    # SLOWER than this expression form (token hashing dominates and
    # F.xxhash64 is codegen'd JVM; the python XXH64 twin is interpreted)
    # — reverted. with_minhash keeps its kernel because the 128-wide
    # signature matrix, not token hashing, dominates there.
    extra = [F.col(c) for c in passthrough]
    toked = (
        spread_for_cpu(docs)
        .select(
            F.col(id_col).alias("doc_id"), tokens(text_col).alias("__toks"), *extra
        )
        .filter(F.size("__toks") >= n)
    )
    th = toked.select(
        "doc_id",
        F.transform("__toks", lambda t: F.xxhash64(t)).alias("__th"),
        *extra,
    )
    idx = F.sequence(F.lit(0), F.size(F.col("__th")) - n)
    # __th is a PROJECTED column (cheap lambda capture — a reference,
    # not a re-evaluated expression; see shingles_from_tokens note)
    grams = F.transform(
        idx,
        lambda i: F.xxhash64(
            *[F.element_at(F.col("__th"), (i + j + 1).cast("int")) for j in range(n)]
        ),
    )
    return th.select("doc_id", F.array_distinct(grams).alias("sh"), *extra)


# --------------------------------------------------------------------------
# cross-table contamination (decontamination pre-pass)

def cross_contamination(
    corpus: DataFrame,
    eval_docs: DataFrame,
    n: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Corpus documents sharing ≥1 distinct n-gram with ANY eval
    document → ``(doc_id, n_shared)`` — the decontamination pre-pass a
    training-data pipeline runs before a benchmark-bearing corpus ships
    (train/test n-gram overlap is the standard leakage check).

    Shape: both sides reduce to hashed n-gram SETS (the same chained
    xxhash64 shingles every dedup tier uses — 8 B/gram, no gram strings
    in flight); the eval side collapses to one distinct gram set and
    BROADCASTS (an eval set is a benchmark — 10³-10⁵ docs — so its gram
    set fits an executor; for a pathological eval side drop the hint
    and this degrades to a plain shuffled semi-join). The corpus side
    is a pure scan → explode → broadcast-join → partial-agg pipeline:
    no corpus-side shuffle of gram rows, only the final per-doc count.
    ``n_shared`` counts the corpus doc's DISTINCT grams seen in eval
    (shingle arrays are distinct by construction).

    The gram arrays are computed ONCE over corpus ∪ eval and cut with an
    eager localCheckpoint before either explode. Two reasons, both
    measured (x9 at sf0.1, 8.0 s → 2.3 s): (a) corpus and eval usually
    filter the same parent frame, so two lazy ``with_hashed_shingles``
    calls tokenize+hash the whole table twice; (b) the optimizer's
    InferFiltersFromGenerate adds ``size(sh) > 0`` above each explode and
    PushDownPredicates substitutes the ENTIRE chained-xxhash gram
    expression into that inferred filter at the scan — a third and fourth
    full evaluation that no source-level filter placement can prevent
    (the filter is optimizer-born). The checkpoint gives the explodes a
    plain column to scan. Same cut as ``ngram_jaccard_pairs``; at scale
    the materialization is ~8 B/gram on executor-local disk, the same
    bytes the exploded shuffle pays anyway."""
    both = corpus.select(
        F.col(id_col).alias("doc_id"),
        F.col(text_col).alias("__text"),
        F.lit(False).alias("__is_eval"),
    ).unionByName(
        eval_docs.select(
            F.col(id_col).alias("doc_id"),
            F.col(text_col).alias("__text"),
            F.lit(True).alias("__is_eval"),
        )
    )
    sh = with_hashed_shingles(
        both, "__text", "doc_id", n, passthrough=("__is_eval",)
    ).localCheckpoint(eager=True)
    tr = sh.filter(~F.col("__is_eval")).select("doc_id", F.explode("sh").alias("g"))
    ev = (
        sh.filter(F.col("__is_eval"))
        .select(F.explode("sh").alias("g"))
        .distinct()
    )
    return tr.join(F.broadcast(ev), "g").groupBy("doc_id").agg(
        F.count("*").alias("n_shared")
    )


# --------------------------------------------------------------------------
# paragraph-level boilerplate dedup (CCNet/RefinedWeb-style line dedup)

def strip_boilerplate(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    group_col: str = "source",
    para_tokens: int = 8,
    min_docs: int = 5,
) -> DataFrame:
    """Line-level (here: fixed paragraph) dedup within a group — the
    CCNet/RefinedWeb boilerplate pass: a paragraph that appears verbatim
    in ≥ ``min_docs`` distinct documents of the same ``group_col``
    (site headers, cookie banners, subscribe footers) is boilerplate and
    is stripped from every document; corpus-level document dedup cannot
    see it because the documents differ outside the shared lines.

    Returns one row per input document:
    ``(doc_id, n_paras, n_kept, text_clean)`` — text_clean is the
    surviving paragraphs rejoined in document order (empty string when
    everything was boilerplate).

    Shape at 100 TB: documents chunk into ``para_tokens``-token
    paragraphs in one projection; the paragraph frame is cut with an
    eager localCheckpoint because it feeds three branches — the
    frequency aggregate, the anti-join, and the rebuild — each of which
    would otherwise replay the explode AND its optimizer-inferred
    ``size(chunks) > 0`` pushed filter with the full chunk expression
    substituted in (the InferFiltersFromGenerate trap, PLANS.md; the
    single materialization still pays that inference once, which is the
    bounded cost). One shuffle on
    (group, md5(para)) for the document-frequency count; the boilerplate
    set is tiny by construction (only paragraphs repeated across
    ``min_docs`` docs) so the strip is a broadcast anti-join; the
    rebuild shuffles once on doc_id with per-doc bounded state. md5 so
    the DuckDB oracle reproduces the paragraph keys exactly.
    """
    toked = docs.select(
        F.col(id_col).alias("doc_id"),
        F.col(group_col).alias("grp"),
        tokens(text_col).alias("__toks"),
    )
    nch = F.ceil(F.size("__toks") / F.lit(float(para_tokens))).cast("int")
    chunks = F.transform(
        F.sequence(F.lit(0), nch - 1),
        lambda c: F.array_join(
            F.slice(F.col("__toks"), (c * para_tokens + 1).cast("int"), para_tokens),
            " ",
        ),
    )
    paras = (
        toked.select("doc_id", "grp", F.posexplode(chunks).alias("pos", "para"))
        .withColumn("ph", F.md5("para"))
        .localCheckpoint(eager=True)
    )
    boiler = (
        paras.groupBy("grp", "ph")
        .agg(F.count_distinct("doc_id").alias("nd"))
        .filter(F.col("nd") >= min_docs)
        .select("grp", "ph")
    )
    kept = paras.join(F.broadcast(boiler), ["grp", "ph"], "left_anti")
    rebuilt = kept.groupBy("doc_id").agg(
        F.count("*").alias("n_kept"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "para"))),
                lambda s: s["para"],
            ),
            " ",
        ).alias("text_clean"),
    )
    totals = paras.groupBy("doc_id").agg(F.count("*").alias("n_paras"))
    return totals.join(rebuilt, "doc_id", "left").select(
        "doc_id",
        "n_paras",
        F.coalesce("n_kept", F.lit(0)).cast("long").alias("n_kept"),
        F.coalesce("text_clean", F.lit("")).alias("text_clean"),
    )


# --------------------------------------------------------------------------
# exact n-gram Jaccard (inverted-index self-join)

def ngram_jaccard_pairs(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    threshold: float = 0.6,
    df_cap: int | None = 100_000,
) -> DataFrame:
    """All pairs (a<b) with Jaccard(shingle sets) >= threshold.

    Inverted index over HASHED shingles (longs, not strings): explode,
    self-join on the hash, count common per pair, then jaccard =
    common / (|A|+|B|-common).

    ``df_cap`` drops shingles whose document frequency exceeds the cap —
    the stop-shingle skew guard: ONE shingle shared by k docs creates
    k²/2 join rows, so a boilerplate phrase in 10⁶ docs is 5·10¹¹ rows
    from a single hot key. Default 100k: a no-op below 100k docs (any
    corpus this oracle tier should see) and a hard ceiling above. Pass
    None only when provably exact output on a skewless corpus matters
    more than not melting the shuffle.
    """
    # materialize the shingle sets ONCE: the plan reads them from five
    # branches (sizes twice, the self-join twice, the df guard), and
    # without the cut each branch re-tokenizes and re-hashes the corpus
    # (52 copies of the hash expression in the optimized plan, d2 the
    # slowest non-iterative gate query before this)
    sh = with_hashed_shingles(docs, text_col, id_col, n).localCheckpoint(eager=True)
    sizes = sh.select("doc_id", F.size("sh").alias("n_sh"))
    inv = sh.select("doc_id", F.explode("sh").alias("shingle"))
    if df_cap is not None:
        freq = inv.groupBy("shingle").agg(F.count("*").alias("df"))
        inv = inv.join(freq.filter(F.col("df") <= df_cap), "shingle", "left_semi")
    pairs = (
        inv.alias("x")
        .join(inv.alias("y"), "shingle")
        .filter(F.col("x.doc_id") < F.col("y.doc_id"))
        .groupBy(F.col("x.doc_id").alias("a_id"), F.col("y.doc_id").alias("b_id"))
        .agg(F.count("*").alias("common"))
    )
    return (
        pairs.join(sizes.withColumnRenamed("doc_id", "a_id").withColumnRenamed("n_sh", "n_a"), "a_id")
        .join(sizes.withColumnRenamed("doc_id", "b_id").withColumnRenamed("n_sh", "n_b"), "b_id")
        .withColumn("jaccard", F.round(F.col("common") / (F.col("n_a") + F.col("n_b") - F.col("common")), 4))
        .filter(F.col("jaccard") >= F.lit(threshold))
        .select("a_id", "b_id", "jaccard")
    )


# --------------------------------------------------------------------------
# MinHash + LSH

def _hash_with_index(value: Column, i: Column) -> Column:
    """h_i(value) = xxhash64(i::long, value) — Spark chains multi-arg
    hashing by using the previous hash as the next seed, reproduced by
    functions/xxh64.py for the pytest oracle."""
    return F.xxhash64(i.cast("long"), value)


def minhash_signature(shingle_hashes: Column, num_hashes: int = 128) -> Column:
    """Array of ``num_hashes`` min-hashes over HASHED shingles — all
    JVM-side higher-order functions: for each i, min over shingles of
    xxhash64(i, shingle_hash). Re-hashing an 8-byte long per (i, shingle)
    instead of the full shingle string cuts the signature cost from
    O(hashes·shingles·strlen) to O(hashes·shingles·8B) — the signature
    build was the measured bulk of d3's runtime."""
    return F.transform(
        F.sequence(F.lit(0), F.lit(num_hashes - 1)),
        lambda i: F.array_min(
            F.transform(shingle_hashes, lambda h: _hash_with_index(h, i))
        ),
    )


def with_minhash(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    num_hashes: int = 128,
) -> DataFrame:
    """(doc_id, sh, sig) — hashed shingle sets plus their
    ``num_hashes``-wide MinHash signatures, built in ONE vectorized
    batch kernel (guide §4.2): token hashes via the pure-python XXH64
    (functions/xxh64.py — bit-identical to ``F.xxhash64`` on strings,
    pinned in tests), gram chaining and the num_hashes×shingles
    signature matrix via the XXH64 long-path recurrence in wrapping
    numpy uint64. Bit-identical to the expression composition
    ``with_hashed_shingles + minhash_signature`` (which remains the
    reference formulation below, exercised by the twin fixtures): the
    interpreted per-(i, shingle) HOF rehash was the measured bulk of
    d3's signature stage. Short docs (< n tokens) drop, shingles are
    first-occurrence distinct — the with_hashed_shingles contract."""
    seeds = _xxh64_hash_long(np.arange(num_hashes, dtype=np.uint64), _XX_SEED)

    def kernel(batches):
        import pandas as pd

        for pdf in batches:
            out_id, out_sh, out_sig = [], [], []
            for did, txt in zip(pdf["doc_id"], pdf[text_col]):
                if txt is None:
                    continue
                toks = txt.split(" ")
                if len(toks) < n:
                    continue
                sh = _gram_hashes_distinct(toks, n)
                sig = (
                    _xxh64_hash_long(
                        sh.astype(np.uint64)[None, :], seeds[:, None]
                    )
                    .astype(np.int64)
                    .min(axis=1)
                )
                out_id.append(did)
                out_sh.append(sh.tolist())
                out_sig.append(sig.tolist())
            if out_id:  # empty frames infer float64 cols → Arrow mismatch
                yield pd.DataFrame(
                    {"doc_id": out_id, "sh": out_sh, "sig": out_sig}
                )

    id_type = docs.select(F.col(id_col)).schema.fields[0].dataType.simpleString()
    return (
        spread_for_cpu(docs)
        .select(F.col(id_col).alias("doc_id"), F.col(text_col))
        .mapInPandas(
            kernel,
            f"doc_id {id_type}, sh array<long>, sig array<long>",
        )
    )


def with_minhash_expr(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    num_hashes: int = 128,
) -> DataFrame:
    """The expression-tier reference formulation of ``with_minhash``
    (with_hashed_shingles + minhash_signature) — kept as the semantics
    the kernel is pinned against in tests."""
    sh = with_hashed_shingles(docs, text_col, id_col, n)
    return sh.select(
        "doc_id",
        "sh",
        minhash_signature(F.col("sh"), num_hashes).alias("sig"),
    )


def minhash_lsh_pairs(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    num_hashes: int = 128,
    rows_per_band: int = 2,
    threshold: float = 0.6,
) -> DataFrame:
    """Near-dup pairs via MinHash banding + exact-Jaccard verification.

    bands b=num_hashes/rows_per_band, rows r=rows_per_band: candidate
    recall for a pair at jaccard j is 1-(1-j^r)^b — at r=2,b=64 a 0.6-pair
    is missed with p≈4e-13, so the verified output matches the exact
    ``ngram_jaccard_pairs`` oracle. The candidate join shuffles
    O(n·bands) band-bucket rows, never O(n²); the verify join ships
    hashed shingle arrays (8 B/shingle), not the strings.
    """
    from pyspark import StorageLevel

    bands = num_hashes // rows_per_band
    # explicit spill-safe persist (computed once, read by banding + verify)
    mh = with_minhash(docs, text_col, id_col, n, num_hashes).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    band_col = F.explode(
        F.transform(
            F.sequence(F.lit(0), F.lit(bands - 1)),
            lambda b: F.struct(
                b.alias("band"),
                F.xxhash64(
                    b.cast("long"),
                    F.slice(F.col("sig"), b * rows_per_band + 1, rows_per_band),
                ).alias("bucket"),
            ),
        )
    )
    buckets = mh.select("doc_id", band_col.alias("bb")).select(
        "doc_id", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket")
    )
    cand = (
        buckets.alias("x")
        .join(buckets.alias("y"), ["band", "bucket"])
        .filter(F.col("x.doc_id") < F.col("y.doc_id"))
        .select(F.col("x.doc_id").alias("a_id"), F.col("y.doc_id").alias("b_id"))
        .distinct()
    )
    sets = mh.select("doc_id", "sh")
    verified = (
        cand.join(sets.withColumnRenamed("doc_id", "a_id").withColumnRenamed("sh", "sh_a"), "a_id")
        .join(sets.withColumnRenamed("doc_id", "b_id").withColumnRenamed("sh", "sh_b"), "b_id")
        .withColumn("common", F.size(F.array_intersect("sh_a", "sh_b")))
        .withColumn(
            "jaccard",
            F.round(F.col("common") / (F.size("sh_a") + F.size("sh_b") - F.col("common")), 4),
        )
        .filter(F.col("jaccard") >= F.lit(threshold))
        .select("a_id", "b_id", "jaccard")
    )
    # materialize the (small, O(|true pairs|)) result, then release the
    # persisted signatures — repeated calls in a long session must not
    # accumulate cached partitions until storage eviction kicks in. The
    # checkpoint also makes downstream iteration (duplicate_clusters)
    # read a materialized pair graph instead of recomputing the LSH.
    verified = verified.localCheckpoint(eager=True)
    mh.unpersist()
    return verified


# --------------------------------------------------------------------------
# duplicate clusters (connected components over near-dup pairs)

def duplicate_clusters(
    pairs: DataFrame, max_iters: int = 50, algorithm: str = "auto"
) -> DataFrame:
    """Near-dup PAIRS → CLUSTERS: (doc_id, cluster_id) where cluster_id =
    the minimum doc_id in the pair-graph's connected component. This is
    the step a real dedup pipeline ends with — pairs say "these two are
    dups", clusters say "keep ONE of these k" (canonical = min id, the
    same survivor rule as ``exact_duplicates``).

    Iterative min-label propagation (the large-star/small-star family
    without the orientation tricks): every node starts labeled with
    itself; each round every node takes the min label in its closed
    neighborhood; converged when no label changes. O(diameter) rounds —
    near-dup components are tiny cliques/chains, so 2-4 rounds in
    practice; ``localCheckpoint`` per round truncates the lineage so the
    plan does not grow with iterations (the classic iterative-Spark
    footgun). Driver-side work per round is ONE scalar count.

    ``algorithm="twostar"`` delegates to
    ``graph.connected_components_twostar`` — same (doc_id, cluster_id =
    component min) contract, agreement pinned in tests/test_graph_cc.py.
    Choose it when the pair graph might hold LONG chains (redirect/
    mirror families) or mega-degree hubs (boilerplate clusters): label
    propagation pays O(diameter) rounds and one full-edge shuffle per
    round; two-star pays O(log²) rounds with min-combiner-absorbed skew.
    For ordinary near-dup output (tiny cliques), label propagation's
    2-4 cheap rounds win.

    ``algorithm="auto"`` (the default) runs label propagation and, if a
    component's diameter exceeds ``max_iters`` (labels still moving at
    the round cap), RE-RUNS via two-star instead of returning the
    silently split clustering — the measured failure mode (a 3k-node
    chain at 60 capped rounds returned 2,940 clusters instead of 1,
    BENCH.md round-5 A/B) is now unreachable from the default path.
    ``algorithm="label"`` keeps the warn-and-return behavior for
    callers that bound diameter themselves (and for the A/B harness).
    """
    if algorithm == "twostar":
        from .graph import connected_components_twostar

        edges = pairs.select(
            F.col("a_id").alias("u"), F.col("b_id").alias("v")
        )
        out = connected_components_twostar(edges, max_rounds=max_iters)
        return out.select(
            F.col("node").alias("doc_id"),
            F.col("component").alias("cluster_id"),
        )
    if algorithm not in ("label", "auto"):
        raise ValueError(
            f"algorithm must be auto|label|twostar, got {algorithm!r}"
        )
    # checkpoint the edge list: every propagation round joins against it,
    # and a LAZY pairs input (e.g. an all-pairs cosine self-join) would
    # otherwise be re-evaluated once per round — measured 146 s instead
    # of ~4 s for x27 at sf0.1 before this cut (callers that already
    # materialized their pairs lose nothing: the checkpoint is one
    # cheap scan of the small edge set)
    edges = (
        pairs.select(F.col("a_id").alias("u"), F.col("b_id").alias("v"))
        .unionByName(pairs.select(F.col("b_id").alias("u"), F.col("a_id").alias("v")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    labels = edges.select(F.col("u").alias("node")).distinct().withColumn(
        "label", F.col("node")
    ).localCheckpoint()
    changed = -1
    for _ in range(max_iters):
        neighbor_min = (
            edges.join(labels, edges.v == labels.node)
            .groupBy(F.col("u").alias("node"))
            .agg(F.min("label").alias("nmin"))
        )
        new_labels = (
            labels.join(neighbor_min, "node", "left")
            .select(
                "node",
                F.least(F.col("label"), F.coalesce("nmin", F.col("label"))).alias(
                    "label"
                ),
                (F.col("label") != F.least(F.col("label"),
                                           F.coalesce("nmin", F.col("label"))))
                .alias("__changed"),
            )
        ).localCheckpoint()
        changed = new_labels.filter(F.col("__changed")).limit(1).count()
        labels = new_labels.drop("__changed")
        if changed == 0:
            break
    if changed != 0:
        import warnings

        if algorithm == "auto":
            # a component's diameter exceeds max_iters: the label answer
            # would be SILENTLY split into several clusters. Fall back
            # to the chain-safe O(log²)-round backend and return the
            # exact components (VERDICT round 5: no code path may
            # return coarser-than-true labels without raising).
            warnings.warn(
                f"duplicate_clusters: label propagation did not converge "
                f"within max_iters={max_iters} (a component's diameter "
                "is longer); re-running via the two-star backend for "
                "exact components.",
                RuntimeWarning,
                stacklevel=2,
            )
            # two-star rounds are O(log² n), not one-hop — its own
            # default cap applies, not the label-sized max_iters
            return duplicate_clusters(pairs, algorithm="twostar")
        # min-label moves one hop per round, so a component whose
        # diameter exceeds max_iters would exit here SILENTLY split into
        # several clusters — surface it instead of returning wrong ids
        warnings.warn(
            f"duplicate_clusters did not converge within max_iters="
            f"{max_iters}: some connected component has a longer "
            "diameter and its labels are still moving — its docs are "
            "split across multiple cluster_ids. Raise max_iters.",
            RuntimeWarning,
            stacklevel=2,
        )
    return labels.select(F.col("node").alias("doc_id"), F.col("label").alias("cluster_id"))


# --------------------------------------------------------------------------
# SimHash

def md5_hash64(value: Column) -> Column:
    """64-bit token hash from the first 16 hex chars of md5 — chosen so a
    DuckDB oracle can reproduce it exactly (DuckDB lacks xxhash64 but has
    md5): hi/lo 32-bit halves parsed from hex, packed into one signed
    long (Java shiftleft wraps bit 63 into the sign, deterministically)."""
    hx = F.md5(value)
    hi = F.conv(F.substring(hx, 1, 8), 16, 10).cast("long")
    lo = F.conv(F.substring(hx, 9, 8), 16, 10).cast("long")
    return F.shiftleft(hi, 32).bitwiseOR(lo)


def simhash64(
    text_col: str, token_hash: str = "md5", hash_fn=None
) -> Column:
    """64-bit SimHash of the whitespace tokens — pure expressions:
    per-token hash, per-bit ±1 vote aggregated with a fold over a
    64-long counter array, sign → bit. No Python, no explode.

    ``token_hash``: "md5" (default — oracle-able in DuckDB, see
    analytics.D4_SQL) or "xxhash64" (cheaper hash; pure-Python twin in
    tests/test_pipeline_ops.py).

    The token hash is materialized ONCE per token (a ``transform`` into
    an array of longs) and the 64 bit-probes run on the bound lambda
    variable. Inlining the hash expression into ``bit_votes`` instead
    re-evaluates it per BIT — 64 md5s per token, measured 10× the whole
    sketch cost (the same captured-expression trap as the O(tokens²)
    shingle bug in round 1)."""
    toks = tokens(text_col)
    hfn = hash_fn or (md5_hash64 if token_hash == "md5" else F.xxhash64)
    hashes = F.transform(toks, lambda t: hfn(t))
    zero = F.array_repeat(F.lit(0).cast("long"), 64)

    def bit_votes(h):
        # h is the fold's bound variable (already-computed long).
        # shiftright needs a literal bit count → unroll the 64 bits in
        # Python; the generated expression stays fully JVM-side.
        return F.array(
            *[
                F.when(
                    F.shiftright(h, b).bitwiseAND(F.lit(1).cast("long")) == 1,
                    F.lit(1).cast("long"),
                ).otherwise(F.lit(-1).cast("long"))
                for b in range(64)
            ]
        )

    votes = F.aggregate(
        hashes, zero, lambda acc, h: F.zip_with(acc, bit_votes(h), lambda a, v: a + v)
    )
    # bit 63 is the sign bit in a Java long → use its signed value
    bit_value = F.array(
        *[F.lit((1 << b) if b < 63 else -(1 << 63)).cast("long") for b in range(64)]
    )
    return F.aggregate(
        F.zip_with(
            votes, bit_value,
            lambda v, bv: F.when(v > 0, bv).otherwise(F.lit(0).cast("long")),
        ),
        F.lit(0).cast("long"),
        lambda acc, x: acc.bitwiseOR(x),
    )


def _with_simhash_md5_kernel(
    docs: DataFrame, text_col: str, id_col: str, words: int
) -> DataFrame:
    """SimHash sketch builder as a vectorized batch kernel (guide §4.2:
    Spark distributes, hashlib+numpy crunch whole batches) — the md5
    fast path behind ``with_simhash``/``with_simhash128``. Bit-identical
    to the ``simhash64`` expression fold (pinned against the same
    pure-python twin in tests/test_pipeline_ops): tokens =
    ``text.split(" ")`` ≡ Spark's limit=-1 regex split on a single
    space (both keep leading/trailing/interior empties), token word w =
    md5 digest bytes [8w, 8w+8) big-endian as a two's-complement int64
    ≡ ``md5_hash64``/``md5_hash64_w2``'s hex-parse + shiftleft wrap,
    per-bit vote ``2·count_set(b) > n_tokens`` ≡ the ±1 fold's
    ``votes > 0`` (a 0 tie leaves the bit clear in both). The
    interpreted per-token 64-when fold measured ~5× this kernel's wall
    at sf0.1 for identical sketches. NULL text sketches NULL, as the
    expression tier's null propagation does."""
    import hashlib

    import numpy as np
    import pandas as pd

    shifts = np.arange(64, dtype=np.uint64)
    out_cols = ["simhash"] if words == 1 else ["sh_w1", "sh_w2"]

    def sketch(batches):
        for pdf in batches:
            outs = [np.zeros(len(pdf), dtype=np.int64) for _ in range(words)]
            nulls = np.zeros(len(pdf), dtype=bool)
            for i, txt in enumerate(pdf[text_col]):
                if txt is None:
                    nulls[i] = True
                    continue
                toks = txt.split(" ")
                buf = b"".join(
                    hashlib.md5(t.encode("utf-8")).digest() for t in toks
                )
                H = np.frombuffer(buf, dtype=">u8").reshape(-1, 2)
                n = len(toks)
                for w in range(words):
                    bits = (
                        (H[:, w].astype(np.uint64)[:, None] >> shifts)
                        & np.uint64(1)
                    ).sum(axis=0)
                    packed = (
                        (2 * bits > n).astype(np.uint64) << shifts
                    ).sum(dtype=np.uint64)
                    outs[w][i] = int(packed.astype(np.int64))
            out = pd.DataFrame({"doc_id": pdf[id_col]})
            for w, c in enumerate(out_cols):
                s = pd.Series(outs[w])
                out[c] = s.where(~nulls, None) if nulls.any() else s
            yield out

    id_type = docs.select(F.col(id_col)).schema.fields[0].dataType.simpleString()
    schema = f"doc_id {id_type}, " + ", ".join(f"{c} long" for c in out_cols)
    return spread_for_cpu(docs).select(F.col(id_col), F.col(text_col)).mapInPandas(
        sketch, schema
    )


def with_simhash(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    token_hash: str = "md5",
) -> DataFrame:
    if token_hash == "md5":
        return _with_simhash_md5_kernel(docs, text_col, id_col, words=1)
    return spread_for_cpu(docs).select(
        F.col(id_col).alias("doc_id"), simhash64(text_col, token_hash).alias("simhash")
    )


# ---- 128-bit variant -------------------------------------------------------
# At 10^9+ docs, complete recall at hamming radius 8 over a 64-bit sketch
# needs 9 bands of ~7 bits → only 128 bucket values per band, so candidate
# volume grows ~n²/128 per band on dissimilar corpora (the scale note on
# simhash_pairs). Doubling the sketch to 128 bits keeps the same pigeonhole
# guarantee with ~14-bit chunks — 16384 bucket values per band, two orders
# of magnitude fewer accidental collisions — at 2× sketch cost.

def md5_hash64_w2(value: Column) -> Column:
    """The SECOND 64-bit word of md5 (hex chars 17-32) — md5 is 128 bits,
    so the two words give two independent 64-bit token hashes for free."""
    hx = F.md5(value)
    hi = F.conv(F.substring(hx, 17, 8), 16, 10).cast("long")
    lo = F.conv(F.substring(hx, 25, 8), 16, 10).cast("long")
    return F.shiftleft(hi, 32).bitwiseOR(lo)


def with_simhash128(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, sh_w1, sh_w2): a 128-bit SimHash as two independent
    64-bit sketches — each bit of a SimHash is independent, so sketching
    the two md5 words separately IS the 128-bit sketch. Built by the
    md5 batch kernel (one digest per token serves BOTH words — the
    expression tier hashed every token twice)."""
    return _with_simhash_md5_kernel(docs, text_col, id_col, words=2)


def simhash128_pairs(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 8,
    n_bands: int | None = None,
) -> DataFrame:
    """ALL pairs with hamming128 <= max_hamming via the banded pigeonhole
    over the 128-bit sketch (same contract and plan order as
    ``simhash_pairs``; chunks never straddle the word boundary, so every
    chunk is one shiftright+mask on one long)."""
    if n_bands is None:
        n_bands = max_hamming + 1
    sh = with_simhash128(docs, text_col, id_col).persist()
    bands_w1 = (n_bands + 1) // 2
    bands_w2 = n_bands - bands_w1

    def word_chunks(col: str, n: int, band_off: int):
        bounds = [b * 64 // n for b in range(n + 1)]
        return [
            F.struct(
                F.lit(band_off + b).alias("band"),
                F.shiftright(F.col(col), bounds[b])
                .bitwiseAND(F.lit((1 << (bounds[b + 1] - bounds[b])) - 1).cast("long"))
                .alias("chunk"),
            )
            for b in range(n)
        ]

    banded = sh.select(
        "doc_id",
        "sh_w1",
        "sh_w2",
        F.explode(
            F.array(
                *word_chunks("sh_w1", bands_w1, 0),
                *word_chunks("sh_w2", bands_w2, bands_w1),
            )
        ).alias("bb"),
    ).select(
        "doc_id", "sh_w1", "sh_w2",
        F.col("bb.band").alias("band"), F.col("bb.chunk").alias("chunk"),
    )
    # verify BEFORE distinct (the d4 lesson: dedupe true pairs, never the
    # raw candidate stream)
    pairs = (
        banded.alias("x")
        .join(banded.alias("y"), ["band", "chunk"])
        .filter(F.col("x.doc_id") < F.col("y.doc_id"))
        .withColumn(
            "hamming",
            F.bit_count(F.col("x.sh_w1").bitwiseXOR(F.col("y.sh_w1")))
            + F.bit_count(F.col("x.sh_w2").bitwiseXOR(F.col("y.sh_w2"))),
        )
        .filter(F.col("hamming") <= max_hamming)
        .select(
            F.col("x.doc_id").alias("a_id"),
            F.col("y.doc_id").alias("b_id"),
            "hamming",
        )
        .distinct()
    )
    pairs = pairs.localCheckpoint(eager=True)
    sh.unpersist()
    return pairs


def _banded64(sh: DataFrame, n_bands: int) -> DataFrame:
    """(doc_id, simhash) → one row per band with the band's exact chunk
    value. Uneven split: chunk b covers bits [bounds[b], bounds[b+1])."""
    bounds = [b * 64 // n_bands for b in range(n_bands + 1)]
    return sh.select(
        "doc_id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.shiftright(F.col("simhash"), bounds[b])
                        .bitwiseAND(
                            F.lit((1 << (bounds[b + 1] - bounds[b])) - 1).cast("long")
                        )
                        .alias("chunk"),
                    )
                    for b in range(n_bands)
                ]
            )
        ).alias("bb"),
    ).select(
        "doc_id",
        "simhash",
        F.col("bb.band").alias("band"),
        F.col("bb.chunk").alias("chunk"),
    )


def simhash_pairs(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 8,
    n_bands: int | None = None,
    token_hash: str = "md5",
) -> DataFrame:
    """ALL pairs with hamming(simhash) <= max_hamming, found via the
    classic banded pigeonhole: split 64 bits into ``n_bands`` chunks; a
    pair differing in at most ``n_bands - 1`` bits must share ≥1 exact
    chunk. Default ``n_bands = max_hamming + 1`` — guaranteed-complete
    recall at the named radius (the verify step is exact bit_count, so no
    false positives either; output == the all-pairs oracle).

    Scale note: complete recall at hamming 8 needs 9 bands of ~7 bits —
    128 bucket values per band, so candidate volume grows ~n²/128 per
    band on dissimilar corpora. At 10^9+ docs either widen the sketch
    (128-bit SimHash → 16-bit chunks) or pass an explicit smaller
    ``n_bands`` and accept probabilistic recall above ``n_bands - 1``.
    """
    if n_bands is None:
        n_bands = max_hamming + 1
    sh = with_simhash(docs, text_col, id_col, token_hash).persist()
    banded = _banded64(sh, n_bands)
    # ORDER MATTERS: the hamming verify (xor + bit_count, codegen'd) runs
    # on the raw banded join output BEFORE the distinct — verifying is a
    # per-row expression, deduping is a shuffle, so the distinct must see
    # only true pairs (thousands), never the full candidate stream
    # (n²/2^chunk_bits per band). Doing distinct first measured 35.8 s at
    # sf0.1; this order is ~3 s for identical output.
    pairs = (
        banded.alias("x")
        .join(banded.alias("y"), ["band", "chunk"])
        .filter(F.col("x.doc_id") < F.col("y.doc_id"))
        .withColumn(
            "hamming",
            F.bit_count(F.col("x.simhash").bitwiseXOR(F.col("y.simhash"))),
        )
        .filter(F.col("hamming") <= max_hamming)
        .select(
            F.col("x.doc_id").alias("a_id"),
            F.col("y.doc_id").alias("b_id"),
            "hamming",
        )
        .distinct()
    )
    # materialize, then release the persisted sketches (cache-lifetime
    # hygiene — same reasoning as minhash_lsh_pairs)
    pairs = pairs.localCheckpoint(eager=True)
    sh.unpersist()
    return pairs


def incremental_simhash_pairs(
    base: DataFrame,
    batch: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 8,
    n_bands: int | None = None,
    token_hash: str = "md5",
) -> DataFrame:
    """Near-dup the NEW batch against the existing corpus WITHOUT
    re-pairing the corpus: every (batch doc, base doc) pair with
    hamming(simhash) <= max_hamming — the content-level analog of the
    URL seen-filter probe (J1's incremental path): each crawl poll asks
    "is this new article a near-copy of anything we already hold?"
    against a base that only ever grows.

    Same banded pigeonhole + verify-inside-the-join as simhash_pairs,
    but the join is batch-bands × base-bands — the base side is NEVER
    self-joined, so cost is O(|base| + |batch| · band_occupancy) per
    poll instead of the O(|base|²/2^bits) a full re-pair would grow
    toward. At scale the base's (doc_id, simhash) projection is
    write-once (persist the sketch column at ingest; bands derive in
    the scan), so each poll reads the base once and shuffles only its
    banded projection."""
    if n_bands is None:
        n_bands = max_hamming + 1
    base_sh = with_simhash(base, text_col, id_col, token_hash).persist()
    batch_sh = with_simhash(batch, text_col, id_col, token_hash).persist()
    bb = _banded64(base_sh, n_bands).withColumnsRenamed(
        {"doc_id": "base_id", "simhash": "base_simhash"}
    )
    nb = _banded64(batch_sh, n_bands).withColumnsRenamed(
        {"doc_id": "batch_id", "simhash": "batch_simhash"}
    )
    # verify BEFORE distinct, for the same reason as simhash_pairs: the
    # xor+bit_count is a codegen'd per-row expression on the candidate
    # stream; the distinct shuffle must only ever see true pairs
    pairs = (
        nb.join(bb, ["band", "chunk"])
        .withColumn(
            "hamming",
            F.bit_count(F.col("batch_simhash").bitwiseXOR(F.col("base_simhash"))),
        )
        .filter(F.col("hamming") <= max_hamming)
        .select("batch_id", "base_id", "hamming")
        .distinct()
    )
    pairs = pairs.localCheckpoint(eager=True)
    base_sh.unpersist()
    batch_sh.unpersist()
    return pairs


# --------------------------------------------------------------------------
# exact duplicate-substring spans (ExactSubstr-style, position level)

def window_hash_stream(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    window: int = 8,
) -> DataFrame:
    """``(doc_id, pos, wh)`` — one row per ``window``-token sliding
    window, ``wh`` the chained ``xxhash64``-over-token-hashes window
    hash (8 B/window, NO window strings materialized — a 50-token window
    string would be ~300 B; same arithmetic-only form and rationale as
    ``with_hashed_shingles``). Lazy; ``duplicate_spans`` is the consumer
    that decides where to cut it."""
    toked = (
        spread_for_cpu(docs)
        .select(F.col(id_col).alias("doc_id"), tokens(text_col).alias("__toks"))
        .filter(F.size("__toks") >= window)
    )
    th = toked.select(
        "doc_id", F.transform("__toks", lambda t: F.xxhash64(t)).alias("__th")
    )
    idx = F.sequence(F.lit(0), F.size(F.col("__th")) - window)
    # __th is a projected column — the transform lambda captures a cheap
    # column reference, not a re-evaluated expression (shingles_from_tokens
    # note); same chained multi-arg xxhash64 as the shingle tiers
    whs = F.transform(
        idx,
        lambda i: F.xxhash64(
            *[
                F.element_at(F.col("__th"), (i + j + 1).cast("int"))
                for j in range(window)
            ]
        ),
    )
    return th.select("doc_id", F.posexplode(whs).alias("pos", "wh"))


def duplicate_spans(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    window: int = 8,
    min_count: int = 2,
) -> DataFrame:
    """Maximal duplicated token spans — ``(doc_id, tok_start, tok_end,
    n_windows)`` — the position-level complement to the document-level
    dedup tiers above (the "exact substring" dedup of Lee et al. 2021,
    which removes repeated PASSAGES a document-level near-dup pass
    keeps: licence blocks, syndicated paragraphs, quoted boilerplate).

    Semantics: every ``window``-token sliding window whose token
    sequence occurs ≥ ``min_count`` times corpus-wide (across docs OR
    repeated inside one doc) marks its token range ``[pos, pos+window)``
    duplicated; per document, overlapping or back-to-back duplicated
    windows merge into maximal spans (gaps-and-islands over positions:
    a new span starts when ``pos > prev_pos + window``). ``tok_end`` is
    exclusive; a downstream strip keeps ``tokens[:tok_start] +
    tokens[tok_end:]`` per span.

    Shape, and why it scales: the window stream (see
    ``window_hash_stream``) is materialized ONCE with an eager
    localCheckpoint before its two consumers — lazily, the frequency agg
    and the position join would each re-run the scan + tokenize +
    chained-hash explode (plan-verified: two ``Scan parquet`` subtrees),
    and the materialized bytes (~16 B/window on executor-local disk) are
    the same order the frequency shuffle pays anyway (the
    ``cross_contamination`` cut). The frequency pass is a groupBy on the
    8-byte hash, so map-side partial aggregation collapses hot windows
    (a boilerplate window repeated 10⁶× arrives at the reducer as
    ~|partitions| partial counts, not 10⁶ rows — the skew case a
    count-over-window formulation would serialize on). Rejoining the
    ≥min_count hash set back to the positions stream is one shuffle
    join keyed on the hash (AQE broadcasts it when the dup set is
    small); the island merge shuffles only the surviving duplicated
    positions on doc_id. Total: one explode, two key shuffles, no
    all-pairs anywhere. 64-bit window-hash collisions (p ≈ m²/2⁶⁴)
    would conflate two distinct windows; the sf0.01 string-side DuckDB
    oracle would catch any (same argument as the Jaccard tier)."""
    from pyspark.sql import Window as W

    wins = window_hash_stream(
        docs, text_col=text_col, id_col=id_col, window=window
    ).localCheckpoint(eager=True)
    dup_hashes = (
        wins.groupBy("wh")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .filter(F.col("cnt") >= min_count)
        .select("wh")
    )
    dup_pos = wins.join(dup_hashes, "wh").select("doc_id", "pos")
    by_pos = W.partitionBy("doc_id").orderBy("pos")
    brk = F.when(
        F.lag("pos").over(by_pos).isNull()
        | (F.col("pos") > F.lag("pos").over(by_pos) + window),
        F.lit(1),
    ).otherwise(F.lit(0))
    islands = dup_pos.withColumn("__brk", brk).withColumn(
        "__island",
        F.sum("__brk").over(by_pos.rowsBetween(W.unboundedPreceding, 0)),
    )
    return islands.groupBy("doc_id", "__island").agg(
        F.min("pos").alias("tok_start"),
        (F.max("pos") + window).alias("tok_end"),
        F.count(F.lit(1)).alias("n_windows"),
    ).select("doc_id", "tok_start", "tok_end", "n_windows")


def strip_duplicate_spans(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    window: int = 8,
    min_count: int = 2,
) -> DataFrame:
    """Apply :func:`duplicate_spans` — ``(doc_id, n_tokens, n_dup_tokens,
    text_clean)`` with every duplicated span removed and the document
    rebuilt in token order (the aggressive ExactSubstr variant: ALL
    occurrences go; keeping a canonical copy is a policy layered on the
    same spans).

    Shape: the span set is per-doc TINY (a handful of intervals), so it
    collapses to one ``collect_list(struct(start, end))`` row per doc —
    bounded by construction, never by luck: spans are maximal and
    disjoint with length ≥ window+? (each covers ≥ window tokens), so a
    doc with T tokens carries at most T/window interval structs. The
    rebuild joins that spans frame back to the documents ONCE (AQE
    broadcasts the spans side when small) and filters tokens with a
    pure higher-order ``filter(..., (tok, i) -> NOT exists(spans, s ->
    s.start <= i < s.end))`` — no token explode, no per-token shuffle,
    whole-stage codegen throughout the rebuild."""
    spans = duplicate_spans(
        docs, text_col=text_col, id_col=id_col, window=window, min_count=min_count
    )
    by_doc = spans.groupBy("doc_id").agg(
        F.collect_list(F.struct("tok_start", "tok_end")).alias("__spans")
    )
    base = docs.select(
        F.col(id_col).alias("doc_id"), tokens(text_col).alias("__toks")
    )
    joined = base.join(by_doc, "doc_id", "left").withColumn(
        "__spans", F.coalesce(F.col("__spans"), F.array())
    )
    in_span = lambda i: F.exists(
        F.col("__spans"),
        lambda s: (s["tok_start"] <= i) & (i < s["tok_end"]),
    )
    kept = F.filter(F.col("__toks"), lambda t, i: ~in_span(i))
    # project the O(tokens·spans) filter ONCE; two consumers reference
    # the projected column (CollapseProject's cost heuristic keeps a
    # non-cheap multi-referenced alias in its own Project — unlike
    # PushDownPredicates, see with_hashed_shingles)
    return joined.select(
        "doc_id", F.size("__toks").cast("long").alias("n_tokens"), kept.alias("__kept")
    ).select(
        "doc_id",
        "n_tokens",
        (F.col("n_tokens") - F.size("__kept")).cast("long").alias("n_dup_tokens"),
        F.array_join("__kept", " ").alias("text_clean"),
    )


def cluster_representatives(
    clusters: DataFrame,
    docs: DataFrame,
    key_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Dup clusters → the keep/drop decision: one row per cluster with
    the representative document (most whitespace tokens, ties to the
    smallest id — "keep the longest copy", the CCNet/RefinedWeb
    survivor rule), the member count, and ``dup_tokens`` — the tokens
    the drop decision removes from the corpus (the dedup savings line
    every corpus report quotes).

    The selection is a single ``max_by`` aggregate over the composite
    order key ``n_tokens * 2^32 - doc_id`` (strictly monotone in
    (n_tokens asc, doc_id desc), unique because ids are) — map-side
    partial aggregation, one shuffle on cluster_id, no window sort."""
    from .text import token_count

    toks = docs.select(
        F.col(key_col).alias("doc_id"),
        token_count(text_col).cast("long").alias("n_tokens"),
    )
    j = clusters.join(toks, "doc_id")
    ordk = F.col("n_tokens") * F.lit(4294967296) - F.col("doc_id")
    return j.groupBy("cluster_id").agg(
        F.max_by(F.col("doc_id"), ordk).alias("rep_doc_id"),
        F.count("*").cast("long").alias("n_members"),
        (F.sum("n_tokens") - F.max("n_tokens")).cast("long").alias("dup_tokens"),
    )


def mirror_hosts(
    pages: DataFrame,
    min_shared: int = 2,
    ratio_num: int = 8,
    ratio_den: int = 10,
    df_cap: int = 1000,
) -> DataFrame:
    """Mirror-site detection over ``(host, content_key)`` pages: host
    pairs whose content sets overlap heavily are mirrors (CDN clones,
    scraper re-posts, www/no-www splits the canonicalizer can't see) —
    the crawl should collapse their politeness budgets and frontier
    priority onto one of them instead of fetching everything twice.

    Returns one row per co-occurring host pair (host_a < host_b):
    ``shared`` distinct content keys, each side's distinct content size
    ``n_a``/``n_b``, and ``is_mirror`` — shared ≥ min_shared AND
    ratio_den·shared ≥ ratio_num·min(n_a, n_b), the containment ratio
    in EXACT integers (no float ever materializes, the d2/x23
    determinism contract).

    Scale shape: the pair generation is a self-join on content_key —
    the same inverted-index discipline as the shingle tiers, so
    ``df_cap`` first drops keys hosted in more than df_cap places
    (site-chrome boilerplate shared by thousands of hosts would
    otherwise contribute k²/2 join rows each; a content key on k ≤
    df_cap hosts contributes at most df_cap·|keys| pairs). Host sizes
    are counted AFTER the cap so the ratio is consistent with the
    pair counts. One shuffle for the distinct, one for the join, one
    partial-agg groupBy on the pair; the size join broadcasts (one row
    per HOST). Never all-pairs over hosts, nothing driver-side."""
    p = pages.select("host", "content_key").distinct()
    if df_cap is not None:
        freq = p.groupBy("content_key").agg(F.count(F.lit(1)).alias("__hf"))
        p = p.join(
            freq.filter(F.col("__hf") <= df_cap), "content_key", "left_semi"
        )
    sizes = p.groupBy("host").agg(F.count(F.lit(1)).cast("long").alias("n"))
    a = p.select(F.col("host").alias("host_a"), "content_key")
    b = p.select(F.col("host").alias("host_b"), "content_key")
    pairs = (
        a.join(b, "content_key")
        .where(F.col("host_a") < F.col("host_b"))
        .groupBy("host_a", "host_b")
        .agg(F.count(F.lit(1)).cast("long").alias("shared"))
        .where(F.col("shared") >= min_shared)
    )
    na = F.broadcast(sizes.select(F.col("host").alias("host_a"), F.col("n").alias("n_a")))
    nb = F.broadcast(sizes.select(F.col("host").alias("host_b"), F.col("n").alias("n_b")))
    return (
        pairs.join(na, "host_a")
        .join(nb, "host_b")
        .select(
            "host_a",
            "host_b",
            "shared",
            "n_a",
            "n_b",
            (
                F.lit(ratio_den) * F.col("shared")
                >= F.lit(ratio_num) * F.least("n_a", "n_b")
            ).alias("is_mirror"),
        )
    )


def cdc_chunks(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    window: int = 4,
    divisor: int = 16,
) -> DataFrame:
    """Content-defined chunking (the rsync/LBFS/FastCDC family): split
    each document into variable-size chunks whose boundaries depend only
    on LOCAL content — a rolling window's hash hitting ``0 mod
    divisor`` — so an insertion early in a document shifts every chunk
    of a fixed-size grid but leaves all content-defined chunks after
    the edit point IDENTICAL. That shift-resistance is what makes
    chunk-level dedup work on re-crawled pages (same article, one new
    paragraph): the storage layer keeps one copy of every unchanged
    chunk. Fixed-grid token windows (``duplicate_spans``) find repeated
    passages; CDC finds the storage-dedup partition of the corpus.

    Semantics: tokens are whitespace-split; a chunk boundary falls
    after 1-based token position ``i`` (``window ≤ i ≤ n-1``) iff the
    48-bit md5 of the ``window``-token string ending at ``i`` is
    ``0 mod divisor``; the document end is always a boundary. Expected
    chunk length ≈ ``divisor`` tokens. Production CDC adds min/max
    chunk-length clamps (FastCDC §3.2) — a sequential suppression rule
    deliberately omitted here to keep the boundary decision stateless
    per position (each token's boundary bit is independently
    computable, which is what lets both engines in the correctness
    gate agree position-by-position).

    Output: one row per chunk occurrence — ``(doc_id, chunk_idx,
    chunk_text, n_tokens)``, ``chunk_idx`` 0-based in document order.

    Scale shape: boundary detection, chunk slicing, and reassembly are
    ALL per-row higher-order expressions (tokens bound once via the
    let-binding pattern — the captured-expression trap documented on
    ``text.let_bound`` would otherwise re-split the text at every
    lambda use) — zero shuffle in this function; the md5-per-position
    cost is O(n·window) like winnowing. Downstream dedup groups by
    ``md5(chunk_text)`` — one map-side-combined shuffle of 16-byte
    keys, the same bill as every other dedup tier here."""
    # vectorized batch kernel (guide §4.2 — the simhash/minhash
    # treatment applied to the boundary scan): one md5 per window
    # position in hashlib instead of the interpreted per-position
    # filter/slice/join HOF chain. Bit-identical semantics: boundary
    # after 1-based position i (window ≤ i ≤ n−1) iff the first 12 md5
    # hex chars of the window string ending at i are 0 mod divisor;
    # doc end always a boundary; NULL text yields no rows (the
    # expression form's posexplode-over-NULL behavior).
    import hashlib

    import pandas as pd

    def kernel(batches):
        for pdf in batches:
            out_id, out_idx, out_text, out_n = [], [], [], []
            for did, txt in zip(pdf["doc_id"], pdf[text_col]):
                if txt is None:
                    continue
                t = txt.split(" ")
                n = len(t)
                bounds = []
                for i in range(window, n):
                    h = hashlib.md5(
                        " ".join(t[i - window : i]).encode("utf-8")
                    ).hexdigest()[:12]
                    if int(h, 16) % divisor == 0:
                        bounds.append(i)
                bounds.append(n)
                start = 0
                for idx, e in enumerate(bounds):
                    out_id.append(did)
                    out_idx.append(idx)
                    out_text.append(" ".join(t[start:e]))
                    out_n.append(e - start)
                    start = e
            if out_id:
                yield pd.DataFrame(
                    {
                        "doc_id": out_id,
                        "chunk_idx": out_idx,
                        "chunk_text": out_text,
                        "n_tokens": out_n,
                    }
                )

    id_type = docs.select(F.col(id_col)).schema.fields[0].dataType.simpleString()
    return (
        spread_for_cpu(docs)
        .select(F.col(id_col).alias("doc_id"), F.col(text_col))
        .mapInPandas(
            kernel,
            f"doc_id {id_type}, chunk_idx int, chunk_text string, n_tokens int",
        )
    )


def containment_pairs(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    threshold_pct: int = 80,
    df_cap: int | None = 100_000,
) -> DataFrame:
    """All pairs (a<b) where one document's shingle set is ≥
    ``threshold_pct``% CONTAINED in the other's — the asymmetric
    complement to ``ngram_jaccard_pairs``: Jaccard punishes size
    mismatch (a 50-token quote inside a 5000-token article scores
    ~0.01), so syndicated-inclusion / quoted-boilerplate / expanded-
    rewrite relations are invisible to it. Broder's containment
    ``C(A,B) = |S(A)∩S(B)| / |S(A)|`` is the standard fix; the pair
    qualifies when ``max(C(A,B), C(B,A)) = common/min(|A|,|B|)``
    crosses the threshold — evaluated as INTEGER cross-multiplication
    (``100·common ≥ pct·min``), so no float decides membership.

    Output: ``(a_id, b_id, common, n_a, n_b, c_ab, c_ba)`` with the
    directional scores rounded to 4dp for reporting (membership never
    reads them).

    Same inverted-index shape and stop-shingle ``df_cap`` guard as the
    Jaccard tier (one shingle in k docs is k²/2 join rows — the cap is
    the skew ceiling); shingle sets materialize once, the self-join is
    on 8-byte hashes, and the per-pair count partial-aggregates."""
    sh = with_hashed_shingles(docs, text_col, id_col, n).localCheckpoint(eager=True)
    sizes = sh.select("doc_id", F.size("sh").alias("n_sh"))
    inv = sh.select("doc_id", F.explode("sh").alias("shingle"))
    if df_cap is not None:
        freq = inv.groupBy("shingle").agg(F.count("*").alias("df"))
        inv = inv.join(freq.filter(F.col("df") <= df_cap), "shingle", "left_semi")
    pairs = (
        inv.alias("x")
        .join(inv.alias("y"), "shingle")
        .filter(F.col("x.doc_id") < F.col("y.doc_id"))
        .groupBy(F.col("x.doc_id").alias("a_id"), F.col("y.doc_id").alias("b_id"))
        .agg(F.count("*").cast("long").alias("common"))
    )
    na = sizes.withColumnRenamed("doc_id", "a_id").withColumnRenamed("n_sh", "n_a")
    nb = sizes.withColumnRenamed("doc_id", "b_id").withColumnRenamed("n_sh", "n_b")
    return (
        pairs.join(na, "a_id")
        .join(nb, "b_id")
        .filter(
            F.lit(100) * F.col("common")
            >= F.lit(threshold_pct) * F.least("n_a", "n_b")
        )
        .select(
            "a_id",
            "b_id",
            "common",
            F.col("n_a").cast("long").alias("n_a"),
            F.col("n_b").cast("long").alias("n_b"),
            F.round(F.col("common") / F.col("n_a"), 4).alias("c_ab"),
            F.round(F.col("common") / F.col("n_b"), 4).alias("c_ba"),
        )
    )
