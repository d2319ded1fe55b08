"""Benchmark harness — prints ONE JSON line.

Three sections, mirroring BASELINE.md's targets:

1. headline analytic queries at $SPARK_GRAFT_SF_DIR (default sf0.1) on
   local[$SPARK_GRAFT_CPUS] — per-query seconds in "queries";
2. crawl-engine throughput: deterministic synthetic frontier → rounds of
   pop → fetch → extract → MERGE; reports fetched-URLs/sec and
   frontier-ops/sec (the BASELINE.json metric; reference peak is
   ~40-50 pages/sec at 5 processes, news_historical_page_scheduler.py:39);
3. scaling evidence (north rule ≥0.8 from N to 4N executors, evidenced
   in-sandbox as local[8] vs local[32] on the identical fetch+extract
   job): throughput at both + efficiency = thr(4N) / (4 · thr(N)).

Usage: python bench.py            # full run (one JSON line on stdout)
       python bench.py --quick    # sf0.01-sized sanity run
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F  # noqa: E402

from news_crawler_spark import analytics, synth  # noqa: E402
from news_crawler_spark.functions.urls import with_url_columns  # noqa: E402
from news_crawler_spark.operators.fetch import fetch_extract_pages  # noqa: E402
from news_crawler_spark.session import get_spark  # noqa: E402

HEADLINE = [
    "a1_count_by_status",
    "a4_daily_pivot",
    "a5_below_median_days",
    "j1_anti_join_unseen",
    "j2_first_wins_dedup",
    "j6_audit_join",
    "j7_broadcast_dims",
    "t1_frontier_pop",
    "t4_latest_cursor",
    "v1_cosine_topk",
    "d1_exact_dedup",
    "d3_minhash_lsh",
    "d4_simhash_pairs",
    "x1_lang_confusion",
    "x2_quality_by_source",
    "x3_token_stats",
]


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def run_queries(spark, sf_dir: str) -> dict[str, float]:
    out: dict[str, float] = {}
    for name in HEADLINE:
        fn = analytics.QUERIES[name]
        t0 = time.perf_counter()
        n = fn(spark, sf_dir).count()
        dt = time.perf_counter() - t0
        out[name] = round(dt, 3)
        log(f"  {name}: {dt:.2f}s ({n} rows)")
    return out


def crawl_bench(spark, n_seed: int, rounds: int) -> dict[str, float]:
    """Rounds over a synthetic frontier with wide-open politeness budgets
    (throughput mode: the budget ceiling, not the network, is the limit)."""
    import tempfile

    from news_crawler_spark.engine import CrawlEngine

    refill = max(n_seed // (rounds * 3), 1000)
    politeness = spark.createDataFrame(
        [
            {"host": h, "max_per_round": refill, "bucket_capacity": 2 * refill}
            for _s, h, _w in synth.SOURCES
        ],
        schema="host string, max_per_round int, bucket_capacity int",
    )
    wd = tempfile.mkdtemp(prefix="bench_crawl_")
    eng = CrawlEngine(spark, wd, politeness=politeness, default_refill=refill)
    t0 = time.perf_counter()
    eng.ingest(synth.build_seed_list(spark, n_seed))
    t_ingest = time.perf_counter() - t0
    admitted = eng.catalog.read("pending", 0).count()
    t1 = time.perf_counter()
    stats = eng.run(max_rounds=rounds)
    t_rounds = time.perf_counter() - t1
    fetched = sum(s.fetched_ok + s.fetched_fail for s in stats)
    popped = sum(s.popped for s in stats)
    frontier_ops = admitted + popped + fetched  # admits + pops + MERGEs
    log(
        f"  crawl: admitted={admitted} popped={popped} fetched={fetched} "
        f"rounds={len(stats)} ingest={t_ingest:.1f}s rounds_t={t_rounds:.1f}s"
    )
    return {
        "seed_urls": n_seed,
        "admitted": admitted,
        "fetched": fetched,
        "rounds": len(stats),
        "ingest_sec": round(t_ingest, 2),
        "rounds_sec": round(t_rounds, 2),
        "fetched_urls_per_sec": round(fetched / t_rounds, 1),
        "frontier_ops_per_sec": round(frontier_ops / (t_ingest + t_rounds), 1),
    }


def prepare_probe_input(spark, n_urls: int, path: str) -> None:
    """Materialize the popped-frontier stand-in once (deterministic), so
    both scaling runs read identical input — mirroring an engine round,
    which always reads the frontier from storage."""
    seed = synth.build_seed_list(spark, n_urls)
    cand = (
        with_url_columns(seed, "url")
        .withColumn("priority", F.pmod(F.col("url_hash"), F.lit(3)).cast("int"))
        .withColumn("tried_count", F.lit(0))
    )
    cand.write.mode("overwrite").parquet(path)


def fetch_extract_job(spark, path: str) -> int:
    """One engine fetch round: read frontier slice → fused fetch+extract
    (single python stage, salted explicit partitioning) → count."""
    return fetch_extract_pages(spark.read.parquet(path)).count()


def _burn(_arg):
    t = time.perf_counter()
    x = 0
    while time.perf_counter() - t < 0.5:
        x += 1
    return x


def hw_parallel_ceiling(lo: int = 8, hi: int = 32) -> float:
    """Calibrate what this box's memory system/SMT can give from lo→hi
    pure-CPU processes (no Spark): the hardware ceiling any job's scaling
    efficiency should be judged against. A 32-vCPU VM is typically 16
    physical cores — 8→32 procs cannot reach 4× even in theory."""
    import multiprocessing as mp

    rates = {}
    for n in (lo, hi):
        with mp.Pool(n) as p:
            rates[n] = sum(p.map(_burn, range(n)))
    return round(rates[hi] / rates[lo] / (hi / lo), 3)


def scaling_probe(path: str, n_urls: int, cores_list=(2, 8, 32)) -> dict[str, float]:
    """Same fetch+extract job at each parallelism level (north rule: N vs
    4N). 2→8 stays within physical cores (the honest N→4N datapoint);
    8→32 additionally crosses into SMT/steal territory — reported next to
    the measured pure-CPU hardware ceiling for that same transition."""
    out: dict[str, float] = {"probe_urls": n_urls}
    for cores in sorted(cores_list, reverse=True):
        spark = get_spark(app_name=f"bench_scale_{cores}", cores=cores,
                          shuffle_partitions=cores)
        fetch_extract_job(spark, path)  # warm python workers + codegen
        t0 = time.perf_counter()
        fetch_extract_job(spark, path)
        dt = time.perf_counter() - t0
        out[f"local{cores}_sec"] = round(dt, 2)
        out[f"local{cores}_urls_per_sec"] = round(n_urls / dt, 1)
        log(f"  scaling local[{cores}]: {dt:.2f}s = {n_urls/dt:.0f} urls/s")
        spark.stop()

    def eff(lo, hi):
        return round(
            out[f"local{hi}_urls_per_sec"]
            / out[f"local{lo}_urls_per_sec"]
            / (hi / lo),
            3,
        )

    out["efficiency_2_to_8"] = eff(2, 8)
    out["efficiency_8_to_32"] = eff(8, 32)
    out["hw_ceiling_8_to_32"] = hw_parallel_ceiling(8, 32)
    log(
        f"  efficiency 2→8: {out['efficiency_2_to_8']}, 8→32: "
        f"{out['efficiency_8_to_32']} (hw ceiling {out['hw_ceiling_8_to_32']})"
    )
    return out


def main() -> None:
    quick = "--quick" in sys.argv
    sf_dir = os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01" if quick else "/root/testdata/sf0.1"
    )
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1])
    n_seed = 20_000 if quick else 120_000
    n_probe = 20_000 if quick else 160_000

    t_total = time.perf_counter()
    spark = get_spark(app_name="bench", cores=cpus, shuffle_partitions=cpus)
    log(f"== headline queries @ {sf_dir} (local[{cpus}]) ==")
    queries = run_queries(spark, sf_dir)
    log("== crawl engine throughput ==")
    crawl = crawl_bench(spark, n_seed, rounds=4)
    import tempfile

    probe_path = tempfile.mkdtemp(prefix="bench_probe_") + "/cand.parquet"
    prepare_probe_input(spark, n_probe, probe_path)
    spark.stop()
    log("== scaling probe (N vs 4N cores) ==")
    scaling = scaling_probe(probe_path, n_probe)
    total = time.perf_counter() - t_total

    print(
        json.dumps(
            {
                "metric": "bench_suite_seconds",
                "value": round(sum(queries.values()), 3),
                "unit": "sec",
                "queries": queries,
                "sf": sf,
                "crawl": crawl,
                "scaling": scaling,
                "total_wall_sec": round(total, 1),
            }
        )
    )


if __name__ == "__main__":
    main()
