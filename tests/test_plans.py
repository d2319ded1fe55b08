"""Physical-plan assertions: the optimizations SURVEY.md §4 claims come
free from Catalyst must actually appear in the plans — predicate pushdown
to the parquet scan, column pruning, broadcast dimension joins, top-k as
TakeOrderedAndProject (never a global sort), and whole-stage codegen."""

import pytest
from pyspark.sql import functions as F

from news_crawler_spark import analytics
from news_crawler_spark.operators import frontier as fops
from news_crawler_spark import synth

SF = "/root/testdata/sf0.001"


def plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def explain_formatted(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def test_filter_pushdown_reaches_scan(spark):
    df = (
        spark.read.parquet(f"{SF}/events.parquet")
        .filter(F.col("event_type") == "click")
        .select("event_id")
    )
    p = explain_formatted(df)
    assert "PushedFilters" in p and "event_type" in p.split("PushedFilters")[1][:200]


def test_column_pruning(spark):
    df = spark.read.parquet(f"{SF}/lineitem.parquet").select("l_orderkey")
    p = explain_formatted(df)
    rs = p.split("ReadSchema")[1][:200]
    assert "l_orderkey" in rs and "l_extendedprice" not in rs


def test_dim_join_is_broadcast(spark):
    p = plan(analytics.j7_broadcast_dims(spark, SF))
    assert "BroadcastHashJoin" in p
    assert "SortMergeJoin" not in p


def test_topk_is_take_ordered(spark):
    p = plan(analytics.v1_cosine_topk(spark, SF))
    assert "TakeOrderedAndProject" in p  # never a global sort for limit-k


def test_robots_filter_has_no_shuffle(spark):
    """The robots evaluation must not shuffle the frontier (broadcast +
    higher-order functions only)."""
    from news_crawler_spark.functions.urls import with_url_columns

    frontier = with_url_columns(synth.build_seed_list(spark, 100))
    out = fops.allowed_by_robots(frontier, synth.robots_df(spark))
    p = plan(out)
    import re

    # the rules side may shuffle (tiny groupBy(host) before broadcast);
    # the frontier side must not — no shuffle keyed by frontier columns
    shuffles = re.findall(r"Exchange (?:hash|range)partitioning\(([^)]*)\)", p)
    for cols in shuffles:
        assert "url_hash" not in cols and "canonical_url" not in cols, p
    assert "BroadcastHashJoin" in p


def test_anti_join_broadcasts_small_popped(spark):
    """next-pending anti-join: small popped side must broadcast."""
    big = spark.range(0, 100000).select(
        F.col("id").alias("url_hash"), F.concat(F.lit("u"), "id").alias("canonical_url")
    )
    small = big.limit(50)
    p = plan(big.join(small, ["url_hash", "canonical_url"], "left_anti"))
    assert "Broadcast" in p


def test_whole_stage_codegen_on_text_features(spark):
    from news_crawler_spark.operators.text import with_text_features

    df = with_text_features(spark.read.parquet(f"{SF}/documents.parquet"))
    p = explain_formatted(df)
    # formatted explain marks codegen'd operators with "[codegen id : N]";
    # executedPlan.toString shows them as "*(N) Project" — accept either
    assert "codegen id" in p or "*(1)" in plan(df), p


def test_v4_payload_filter_below_scoring(spark):
    """v4: the payload predicate must be applied on the (tiny) payload
    side below the semi-join — pushed into the parquet scan when reading
    files (PushedFilters), or a Filter directly over the cached relation
    when another test has cached the table — and the top-k must be
    TakeOrderedAndProject: filter-then-score-then-k, never
    score-everything-then-filter."""
    df = analytics.v4_filtered_topk(spark, SF)
    p = plan(df)
    assert "TakeOrderedAndProject" in p
    assert "LeftSemi" in p
    # the payload filter exists as its own node (below the join build),
    # NOT as a post-scoring filter: nothing filters on n_chars above the
    # TakeOrderedAndProject (which is the root), and the semi-join build
    # side carries the predicate
    build_side = p.split("LeftSemi", 1)[1]
    assert "n_chars" in build_side and "src3" in build_side, p


def test_v6_keyword_filter_below_scoring(spark):
    """v6: keyword + full-text predicates evaluate on the payload side
    below the semi-join (filter → ids → score), ending in
    TakeOrderedAndProject — same contract as v4."""
    df = analytics.v6_keyword_topk(spark, SF)
    p = plan(df)
    assert "TakeOrderedAndProject" in p
    assert "LeftSemi" in p
    build_side = p.split("LeftSemi", 1)[1]
    assert "array_contains" in build_side and "Contains" in build_side, p


def test_v7_ts_range_filter_below_scoring(spark):
    """v7: the published-timestamp RANGE predicate evaluates on the
    payload side below the semi-join (filter → ids → score), ending in
    TakeOrderedAndProject — completes the reference's payload-index trio
    (source v4, keywords/full-text v6, published_timestamp v7)."""
    df = analytics.v7_ts_range_topk(spark, SF)
    p = plan(df)
    assert "TakeOrderedAndProject" in p
    assert "LeftSemi" in p
    build_side = p.split("LeftSemi", 1)[1]
    assert "ts" in build_side and "2024-01-01" in build_side, p


def test_embed_claim_is_salted_two_phase(spark):
    """S11 batch claim: the per-source window must rank within
    (source, salt) first — parallelism sources×salts, not sources."""
    import tempfile

    from news_crawler_spark.embed_scheduler import EmbedScheduler

    docs = spark.createDataFrame(
        [(f"d{i}", f"s{i % 2}", f"t{i}", f"w{i}") for i in range(20)],
        "doc_id string, source string, title string, summary string",
    )
    sched = EmbedScheduler(spark, tempfile.mkdtemp(), batch_per_source=5)
    pending = docs.selectExpr(
        "doc_id",
        "source",
        "cast(null as timestamp) AS published_ts",
        "concat(title, '. ', summary) AS embed_text",
    )
    p = plan(sched._claim(pending))
    assert "xxhash64" in p and p.count("Window") >= 2, p


def test_m1_span_extract_single_python_pass(spark):
    """m1: page construction is pure codegen'd expressions feeding ONE
    MapInPandas extract pass — no join, no aggregate, and no exchange
    beyond the tiny-input round-robin spread."""
    df = analytics.m1_interleaved_spans(spark, SF)
    p = plan(df)
    assert p.count("MapInPandas") == 1
    assert "Join" not in p and "HashAggregate" not in p
    exchanges = [l for l in p.splitlines() if "Exchange" in l]
    assert all("RoundRobinPartitioning" in l for l in exchanges), p


def test_k1_cache_fold_is_aggregate_not_window(spark):
    """K6: the LWW cache fold must be max_by AGGREGATES (map-side
    partial combine — the shuffle carries |symbols| rows per wave, not
    |observations|) and the as-of head must broadcast; a window
    implementation would shuffle every observation."""
    p = plan(analytics.k1_price_cache(spark, SF))
    assert "Window" not in p, p
    assert "max_by" in p or "HashAggregate" in p
    # partial aggregation before the exchange = map-side combine
    assert "partial_max_by" in p, p
    assert "BroadcastNestedLoopJoin" in p or "BroadcastHashJoin" in p, p
    assert "SortMergeJoin" not in p, p


def test_v8_signlsh_is_bucketed_not_allpairs(spark):
    """The sign-LSH near-dup scale path must candidate-generate through
    the (table, bucket) EQUI-join — an all-pairs nested-loop/cartesian
    anywhere in the plan means the bucketing silently degenerated (the
    O(n²) shape this operator exists to avoid at 10^9 vectors)."""
    from news_crawler_spark.operators import similarity

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    pairs = similarity.lsh_cosine_pairs(emb, threshold=0.35, materialize=False)
    p = plan(pairs)
    assert "CartesianProduct" not in p, p
    assert "BroadcastNestedLoopJoin" not in p, p
    # candidate join keyed on the bucket columns, verify joins on ids
    assert "table" in p and "bucket" in p, p


def test_v9_partition_pruning_is_dynamic(spark, tmp_path):
    """The IVF layout's 100 TB claim: with the vector table written
    partitioned by cell, probing the query's cell must reach the scan as
    DYNAMIC partition pruning (the cell id arrives via the broadcast
    query row) — only that cell's files are read, scan cost = 1/n_cells.
    A plan without dynamicpruning in PartitionFilters reads every
    partition and only filters post-scan."""
    from news_crawler_spark.operators import similarity

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    emb.write.partitionBy("label").parquet(str(tmp_path / "emb"))
    part = spark.read.parquet(str(tmp_path / "emb"))
    df = similarity.ivf_probe_topk(part, 7, k=5)
    p = explain_formatted(df)
    assert "dynamicpruning" in p.lower(), p
    assert df.count() == 5


def test_surt_range_reaches_scan_as_pushed_filter(spark, tmp_path):
    """The f3 layout claim's plan half: a per-domain surt prefix range
    must reach the parquet scan as PushedFilters (row-group min/max
    skipping happens in the reader only if the predicate gets there) —
    a plan that filters post-scan decodes the whole table regardless of
    layout. The measured half is bench.surt_prune_probe."""
    from news_crawler_spark.functions.urls import surt_key_col

    df = spark.range(1000).select(
        F.concat(
            F.lit("https://sub.site"),
            (F.col("id") % 16).cast("string"),
            F.lit(".com/p/"),
            F.col("id").cast("string"),
        ).alias("canonical_url")
    ).withColumn("surt_key", surt_key_col("canonical_url"))
    df.repartitionByRange(4, "surt_key").sortWithinPartitions(
        "surt_key"
    ).write.parquet(str(tmp_path / "fr"))
    q = spark.read.parquet(str(tmp_path / "fr")).where(
        (F.col("surt_key") >= "com,site4,") & (F.col("surt_key") < "com,site4-")
    )
    p = plan(q)
    assert "GreaterThanOrEqual(surt_key,com,site4,)" in p, p
    assert "LessThan(surt_key,com,site4-)" in p, p
    assert q.count() == sum(1 for i in range(1000) if i % 16 == 4)


def test_x11_pii_scrub_is_single_scan(spark):
    """The PII pass must be one codegen'd projection: no exchange, no
    python evaluation anywhere in the plan."""
    from news_crawler_spark.operators import pii

    # the library surface, not the gate query (whose orderBy is
    # presentation, not part of the operator's contract)
    df = pii.with_pii(spark.read.parquet(f"{SF}/documents.parquet"))
    p = plan(df)
    assert "Exchange" not in p
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p
    assert "WholeStageCodegen" in p or "*(1)" in p


def test_x12_boilerplate_strip_is_broadcast_anti(spark):
    """The boilerplate strip must anti-join against a BROADCAST
    boilerplate set (it is tiny by construction), never sort-merge."""
    import re

    p = plan(analytics.x12_boilerplate(spark, SF))
    assert re.search(r"BroadcastHashJoin [^\n]*LeftAnti", p), p
    assert "SortMergeJoin" not in p


def test_x13_bm25_plan_shape(spark):
    """BM25: term filter BELOW the tf aggregate (the only big-side
    shuffle), stats/df sides broadcast, ranking as
    TakeOrderedAndProject."""
    p = plan(analytics.x13_bm25(spark, SF))
    assert "TakeOrderedAndProject" in p
    assert "BroadcastHashJoin" in p
    assert "SortMergeJoin" not in p
    # the isin(term) filter must sit under the first aggregate, i.e.
    # appear in the plan BELOW (after, in toString order) the final agg
    assert "dup" in p and "table" in p  # the IN-list made it into the plan


def test_v10_kmeans_assign_is_broadcast(spark):
    """Every k-means iteration joins the corpus against k centroid rows:
    that join must be a broadcast, and the argmin must be an aggregate
    (min over (dist, cell) structs), not a per-vector window sort."""
    from news_crawler_spark.operators import similarity

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    p = plan(similarity.kmeans_cells(emb, seed_ids=(0, 1, 2, 3), iters=2))
    assert "BroadcastNestedLoopJoin" in p or "BroadcastHashJoin" in p
    assert "SortMergeJoin" not in p
    assert "Window" not in p


def test_t6_asof_is_window_not_range_join(spark):
    """The as-of join must never plan as a range comparison join
    (BroadcastNestedLoop/Cartesian = O(|probes|·|quotes|)): the
    union-tag-window form is Window + hash/sort aggregation only, and
    the bucketed carry computation stays a Window over bucket
    summaries."""
    p = plan(analytics.t6_asof_join(spark, SF))
    assert "BroadcastNestedLoopJoin" not in p
    assert "CartesianProduct" not in p
    assert "Window" in p


def test_t7_range_join_is_equi_bucketed(spark):
    """The containment join must reach the join operator as an EQUI join
    on (key, bucket) — SortMergeJoin or BroadcastHashJoin — with the
    exact predicate as a join condition/filter, never a
    BroadcastNestedLoopJoin over the raw inequality."""
    p = plan(analytics.t7_range_join(spark, SF))
    assert "BroadcastNestedLoopJoin" not in p
    assert "CartesianProduct" not in p
    assert ("SortMergeJoin" in p) or ("BroadcastHashJoin" in p)


def test_x15_kmv_two_phase_bounded(spark):
    """The KMV sketch aggregation must be the two-phase bounded form:
    collect_set appears only under per-partition / per-group hash
    aggregates (ObjectHashAggregate), with no window sort over the full
    hash set and no nested-loop join anywhere."""
    p = plan(analytics.x15_kmv_vocab(spark, SF))
    assert "BroadcastNestedLoopJoin" not in p
    assert "CartesianProduct" not in p
    assert "ObjectHashAggregate" in p


def test_x16_countmin_estimate_join_is_broadcast(spark):
    """Count-min point queries join against a depth×width table (tiny by
    construction): that join must broadcast, and nothing in the query
    may plan a nested loop."""
    p = plan(analytics.x16_countmin_heavy(spark, SF))
    assert "BroadcastHashJoin" in p
    assert "BroadcastNestedLoopJoin" not in p
    assert "CartesianProduct" not in p


def test_x18_incremental_neardup_never_pairs_the_base(spark):
    """The incremental near-dup must be ONE equi-join between the batch
    bands and the base bands (no self-join of either side, no nested
    loop), with the hamming verify inside the join output."""
    p = plan(analytics.x18_incremental_neardup(spark, SF))
    assert "BroadcastNestedLoopJoin" not in p
    assert "CartesianProduct" not in p
    # exactly one join in the pair plan (checkpointed upstream aside):
    # batch-bands x base-bands
    assert p.count("Join") <= 2, p


def test_a9_rollup_is_one_pass(spark):
    """ROLLUP must plan as a single Expand feeding ONE shuffled
    aggregate (with a partial phase) — never one scan per grouping
    level."""
    p = plan(analytics.a9_rollup(spark, SF))
    assert p.count("Expand") >= 1
    assert p.count("Scan parquet") == 1, p
    assert p.count("Exchange hashpartitioning") == 1, p


def test_x19_dup_spans_plan_shape(spark):
    """Three contracts: (a) the lazy window stream travels as hashed
    windows off a pruned (doc_id, text) scan — never window strings,
    never the other document columns; (b) the spans plan reads the
    ONE materialized window stream, not a second parquet scan per
    consumer (the lazy form re-ran scan+tokenize+chained-hash explode
    under both the frequency agg and the position join); (c) the
    frequency pass keeps its map-side partial phase (partial_count
    collapses a 10^6-times-repeated boilerplate window before the
    shuffle — the skew defense a count-over-window formulation lacks)."""
    from news_crawler_spark.operators import dedup as dd

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    lazy = plan(dd.window_hash_stream(docs))
    assert "xxhash64" in lazy, lazy
    assert "n_chars" not in lazy.split("ReadSchema")[1][:200], lazy

    p = plan(analytics.x19_dup_spans(spark, SF))
    assert "Scan parquet" not in p, p
    assert p.count("Scan ExistingRDD") == 2, p
    assert "partial_count" in p, p


def test_g1_pagerank_iteration_is_broadcast(spark):
    """Each PageRank iteration joins the (big) edge list against the
    (small, one-row-per-host) rank vector: that join must be a
    broadcast with the RANK side built, the contribution sum must keep
    its map-side partial phase (hub-host in-degree skew collapses
    before the shuffle), and the edge list must never be sort-merged
    or re-sorted per iteration."""
    p = plan(analytics.g1_host_rank(spark, SF))
    assert "BroadcastHashJoin" in p, p
    assert "partial_sum" in p, p
    assert "SortMergeJoin" not in p, p


def test_x20_strip_rebuild_no_explode_single_eval(spark):
    """The rebuild never explodes tokens (pure higher-order filter over
    the token array), the per-doc span set joins back as a BROADCAST,
    and the O(tokens×spans) interval filter is evaluated ONCE per row
    (projected column referenced twice — not re-expanded per consumer,
    the CollapseProject trap)."""
    p = plan(analytics.x20_substring_strip(spark, SF))
    assert "Generate" not in p.split("Scan ExistingRDD")[0], p
    assert "BroadcastHashJoin" in p, p
    head = p.split("Scan ExistingRDD")[0]
    assert head.count("exists(") == 1, head


def test_x21_semdedup_pairs_join_is_cell_equi(spark):
    """SemDeDup's pair generation must shuffle on the CELL key (an
    equi-join: pair work = Σ_c |c|²) with the integer dup test riding
    inside the join condition — a CartesianProduct / nested-loop means
    Catalyst failed to extract the cell equality and the operator
    degenerated to corpus-quadratic."""
    from news_crawler_spark.operators import similarity

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    p = plan(similarity.semdedup(emb, seed_ids=(0, 1), iters=2))
    assert "CartesianProduct" not in p, p
    assert "BroadcastNestedLoopJoin" not in p, p
    assert "cell" in p, p


def test_x22_dsir_weights_join_is_broadcast(spark):
    """DSIR's per-doc weighting must join the exploded token stream
    against the n_buckets-row log-ratio table as a BROADCAST (the big
    side never shuffles for the join) and keep the map-side partial for
    the per-doc sum; the final top-m must be a TakeOrderedAndProject,
    never a global sort."""
    from pyspark.sql import functions as F

    from news_crawler_spark.operators import text as text_ops

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    p = plan(text_ops.dsir_select(docs, F.col("lang") == "de", m=100))
    assert "BroadcastHashJoin" in p, p
    assert "partial_sum" in p, p
    assert "TakeOrderedAndProject" in p, p


def test_m3_pack_one_window_no_global_sort(spark):
    """m3: interleaved packing must be ONE per-shard window over ONE
    shuffle on the shard id — no global Sort/Exchange anywhere above it
    (a global ORDER BY cumsum would serialize the corpus through one
    partition). The query's trailing orderBy is display-only and not
    part of the operator, so assert on the operator itself."""
    from news_crawler_spark.operators import multimodal

    df = multimodal.pack_interleaved(
        analytics._m1_extracted(spark, SF), budget=2048, n_shards=8
    )
    p = plan(df)
    assert p.count("Window") == 1, p
    # the only range-partitioning allowed is none: the window's exchange
    # hash-partitions on shard
    assert "rangepartitioning" not in p.lower(), p
    assert "hashpartitioning(shard" in p, p


def test_x29_reps_are_partial_aggregate_no_window(spark):
    """x29: the survivor selection must be a partial (map-side) max_by
    aggregate on cluster_id — never a per-cluster window sort."""
    from news_crawler_spark.operators import dedup as dedup_ops

    clusters = spark.createDataFrame(
        [(1, 1), (2, 1)], "doc_id long, cluster_id long"
    )
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    p = plan(dedup_ops.cluster_representatives(clusters, docs))
    assert "Window" not in p, p
    assert "partial_max_by" in p or ("max_by" in p and "partial" in p.lower()), p


def test_m4_integrity_prunes_payload_and_reduces_before_join(spark):
    """m4: the reconcile joins DISTINCT ref keys only — both sides
    aggregate to distinct refs BELOW the full-outer join, and the span
    struct's text/payload fields never reach the join."""
    from news_crawler_spark.operators import multimodal

    spans = analytics._m1_extracted(spark, SF)
    media = spans.select(
        F.explode("spans").alias("s")
    ).select(F.col("s.media_ref").alias("media_ref")).limit(5)
    df = multimodal.media_integrity(spans, media)
    p = plan(df)
    assert "FullOuter" in p, p
    # distinct (HashAggregate on media_ref) on both sides of the join
    join_pos = p.find("FullOuter")
    below = p[join_pos:]
    assert below.count("HashAggregate") >= 2, p


def test_v11_pq_encode_is_single_scan_and_adc_is_take_ordered(spark):
    """PQ plans: the encode inlines the codebook as literals — no join,
    no exchange, ONE scan (the 10⁹-row compression pass); the ADC scan
    is a joinless TakeOrderedAndProject over the codes column (the
    8-bytes-per-vector regime)."""
    from news_crawler_spark.operators import similarity as sim

    emb = spark.read.parquet(SF + "/embeddings.parquet")
    cb = sim.pq_codebooks(emb, n_sub=8, k_codes=16, iters=2).collect()
    enc = sim.pq_encode(emb, cb, code_base=16)
    p_enc = explain_formatted(enc)
    assert "Exchange" not in p_enc, p_enc
    assert "Join" not in p_enc, p_enc

    qrow = emb.filter(F.col("vec_id") == 7).select("embedding").head()
    top = sim.pq_adc_topk(enc, cb, sim.quantize_list(qrow[0]), k=10)
    p_top = explain_formatted(top)
    assert "TakeOrderedAndProject" in p_top, p_top
    assert "Join" not in p_top, p_top


def test_x31_qsketch_two_phase_bounded(spark):
    """The quantile sketch must aggregate in the x15 two-phase bounded
    shape (ObjectHashAggregate over per-partition slices), with no
    nested loop anywhere and no full-table window sort feeding the
    SAMPLE side (windows appear only in the exact-quantile rider)."""
    p = plan(analytics.x31_quantile_sketch(spark, SF))
    assert "ObjectHashAggregate" in p
    assert "BroadcastNestedLoopJoin" not in p
    assert "CartesianProduct" not in p


def test_bucketed_id_join_colocates_no_exchange(spark, tmp_path):
    """The docstring claim behind payload_filtered_topk / the embed
    reconcile — 'at scale both sides are bucketed by id so the join
    co-locates' — demonstrated: both tables written bucketBy(8, vec_id),
    the id join plans a SortMergeJoin with ZERO Exchange on either side
    (Bucketed: true, all buckets selected). The shuffle a 10⁹-row
    vectors⋈payload join would otherwise pay disappears at the layout
    level."""
    spark.sql(f"CREATE DATABASE IF NOT EXISTS bdemo LOCATION '{tmp_path}/wh'")
    try:
        emb = spark.read.parquet(SF + "/embeddings.parquet")
        emb.write.bucketBy(8, "vec_id").sortBy("vec_id").mode(
            "overwrite"
        ).saveAsTable("bdemo.vecs")
        emb.select("vec_id", "label").write.bucketBy(8, "vec_id").sortBy(
            "vec_id"
        ).mode("overwrite").saveAsTable("bdemo.payload")
        j = spark.table("bdemo.vecs").hint("merge").join(
            spark.table("bdemo.payload"), "vec_id"
        )
        p = explain_formatted(j)
        assert "SortMergeJoin" in p, p
        assert "Exchange" not in p, p
        assert "Bucketed: true" in p, p
    finally:
        spark.sql("DROP DATABASE IF EXISTS bdemo CASCADE")


def test_x32_bpe_pairs_two_exchanges_topk(spark):
    """The BPE pair-count plan: exactly two exchanges (corpus word
    count, vocab pair sum — both map-side combined HashAggregates) and
    the top-200 as TakeOrderedAndProject, never a global Sort."""
    df = analytics.x32_bpe_pair_counts(spark, SF)
    p = explain_formatted(df)
    # count detail headers "(N) Exchange" — the tree section repeats
    # every operator, so a bare substring count double-counts
    assert p.count(") Exchange") == 2, p
    assert "TakeOrderedAndProject" in p
    assert "Sort " not in p.split("TakeOrderedAndProject")[0]


def test_x33_bpe_merge_iteration_shape(spark):
    """One merge iteration of bpe_train: the argmax pair enters as a
    broadcast join (never collected), the merge fold is a pure Catalyst
    expression (no BatchEvalPython / ArrowEvalPython anywhere), and the
    left join on TRUE plans as BroadcastNestedLoopJoin over a 1-row
    side — constant work per word."""
    from news_crawler_spark.operators import text as text_ops

    seg = text_ops.bpe_init_segmentation(
        spark.read.parquet(f"{SF}/documents.parquet")
    )
    best = (
        text_ops.bpe_adjacent_pairs(seg)
        .orderBy(F.desc("n"), "a", "b")
        .limit(1)
        .select(F.col("a").alias("_ba"), F.col("b").alias("_bb"))
    )
    one_iter = seg.join(F.broadcast(best), F.lit(True), "left").select(
        "w",
        "wc",
        text_ops._bpe_merge_fold(
            F.col("syms"), F.col("_ba"), F.col("_bb")
        ).alias("syms"),
    )
    p = explain_formatted(one_iter)
    assert "BroadcastNestedLoopJoin" in p
    assert "EvalPython" not in p  # fold is JVM-side, no Python stage


def test_x34_encode_vocab_broadcasts(spark):
    """The corpus encode probes the trained vocabulary via a broadcast
    hash join — no sort-merge join, no corpus-side exchange below the
    doc_id reassembly aggregate."""
    df = analytics.x34_bpe_encode(spark, SF)
    p = explain_formatted(df)
    assert "BroadcastHashJoin" in p
    assert "SortMergeJoin" not in p


def test_c2_rendezvous_is_a_pure_projection(spark):
    """Shard assignment adds no exchange, no join, no python stage —
    it must stay inside the scan's whole-stage-codegen projection."""
    from news_crawler_spark.operators import frontier as fops

    hosts = spark.range(100).select(
        F.concat(F.lit("h"), F.col("id").cast("string")).alias("host")
    )
    p = explain_formatted(fops.rendezvous_assign(hosts, n_shards=8))
    assert "Exchange" not in p
    assert "Join" not in p
    assert "EvalPython" not in p


def test_v13_sq8_scan_is_takeordered(spark):
    """The SQ8 candidate cut is a TakeOrderedAndProject over the code
    scan — per-partition top-k with a k-row driver merge, never a
    global Sort, and no python stage anywhere."""
    df = analytics.v13_sq8_topk(spark, SF)
    p = explain_formatted(df)
    assert "TakeOrderedAndProject" in p
    assert "EvalPython" not in p


def test_s8_sitemap_tree_iterates_files_broadcast(spark):
    """The URL side must never be iterated: every join in the expansion
    broadcasts the (bounded) file frontier; page URLs only flow through
    the final min-depth aggregate."""
    from news_crawler_spark import sources

    edges = spark.createDataFrame(
        [("r", "i%d" % i, "sitemap") for i in range(20)]
        + [("i%d" % i, "u%d_%d" % (i, j), "url")
           for i in range(20) for j in range(50)],
        "loc string, child string, kind string",
    )
    roots = spark.createDataFrame([("r",)], "root string")
    out = sources.sitemap_tree(edges, roots, max_depth=3)
    out.collect()  # run THIS df's own QE so its AQE plan finalizes
                   # (count() would plan a separate aggregate query)
    p = out._jdf.queryExecution().executedPlan().toString()
    # AQE's toString appends the pre-adaptive "Initial Plan" (which
    # legitimately shows SortMergeJoin); judge the Final Plan section
    final = p.split("Initial Plan")[0]
    assert "isFinalPlan=true" in final
    assert "BroadcastHashJoin" in final
    assert "SortMergeJoin" not in final, final


def test_p16_dust_mine_joins_on_hashed_signature(spark):
    """The evidence join must be an equi-join on the 8-byte xxhash64
    signature — never a cartesian/nested-loop pairwise walk."""
    from news_crawler_spark.operators import dust

    pages = spark.createDataFrame(
        [("https://h.example/p%d?sid=%d" % (i % 7, i), "d%d" % (i % 7))
         for i in range(50)],
        "url string, digest string",
    )
    p = plan(dust.mine_param_rules(pages))
    assert "CartesianProduct" not in p and "BroadcastNestedLoopJoin" not in p
    assert "xxhash64" in p


def test_t11_refresh_allocation_has_no_global_sort_of_pages(spark):
    """The page table must never be globally sorted: the θ search is
    aggregate probes, the allocation a pure array projection; only the
    tie sliver (gain == θ*−1) may see a window."""
    from news_crawler_spark import sources

    pages = spark.createDataFrame(
        [(i, 1 + (i * 13) % 20) for i in range(500)],
        "page_id long, lam long",
    )
    out = sources.refresh_allocation(pages, budget=600, f_max=4)
    p = plan(out)
    # a GLOBAL sort would plan Exchange rangepartitioning; the tie
    # sliver's row_number is allowed to collapse into a
    # TakeOrderedAndProject (per-partition top-k + single merge of the
    # boundary rows — exactly the bounded-sort contract)
    assert "Exchange rangepartitioning" not in p, p
    assert p.count("TakeOrderedAndProject") <= 1, p


def test_v14_binary_scan_is_take_ordered(spark):
    """The Hamming candidate scan must plan per-partition top-k
    (TakeOrderedAndProject), never a global sort of the table."""
    from news_crawler_spark.operators import similarity

    import numpy as np

    rows = [
        (i, [float(((i * 31 + j * 7) % 13) - 6) / 6.0 for j in range(64)])
        for i in range(300)
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = similarity.binary_topk_rerank(emb, query_id=7, k=5, r_cand=50)
    p = plan(out)
    assert "TakeOrderedAndProject" in p
    assert "Exchange rangepartitioning" not in p, p
    # and the result is sane: k rows, exact_dot sorted desc
    got = out.collect()
    assert len(got) == 5
    dots = [r.exact_dot for r in got]
    assert dots == sorted(dots, reverse=True)


def test_aqe_splits_skewed_join_partitions(spark):
    """X4's salting covers the python fetch stage; SHUFFLE-JOIN skew is
    handled by AQE's skew-join — prove the knob engages on this session
    config and splits the hot partition with identical results. The
    byte thresholds are lowered for the probe (the defaults are sized
    for executor-scale partitions, not a local test): at production
    sizes the same plan rewrite fires at the default 256MB threshold."""
    saved = {
        k: spark.conf.get(k, None)
        for k in (
            "spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
            "spark.sql.adaptive.skewJoin.enabled",
        )
    }
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set(
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "1MB"
        )
        spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "256KB")
        spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
        K = 200
        left = spark.range(1_000_000).select(
            F.when(F.col("id") % 2 == 0, 7)
            .otherwise(F.pmod(F.xxhash64("id"), F.lit(K)))
            .alias("k"),
            F.col("id").alias("lv"),
        )
        right = spark.range(K).select(
            F.col("id").alias("k"), (F.col("id") * 3).alias("rv")
        )

        def total(skew_on):
            spark.conf.set(
                "spark.sql.adaptive.skewJoin.enabled", str(skew_on).lower()
            )
            agg = left.join(right, "k").agg(
                F.sum(F.col("lv") + F.col("rv")).alias("s")
            )
            s = agg.collect()[0]["s"]
            return s, agg._jdf.queryExecution().executedPlan().toString()

        s_on, p_on = total(True)
        s_off, p_off = total(False)
        assert s_on == s_off  # the rewrite never changes the answer
        assert "skew=true" in p_on, p_on
        assert "skew=true" not in p_off
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
