"""Root-cause harness for the 8→32-core scaling gap (VERDICT round-1 #2).

Decomposes the fused fetch+extract stage into falsifiable components and
measures each at 8 vs 32 workers:

  A. pure-python mp.Pool twin of the EXACT per-row work (synth fetch +
     doc_fields + json.dumps) — no Spark, no Arrow. If THIS doesn't scale,
     the floor is the Python allocator/memory system, not Spark.
  B. same, but returning the results (adds IPC pickling like Arrow would).
  C. Spark fused stage as bench.py runs it (mapInPandas + from_json).
  D. Spark python stage WITHOUT the JVM from_json parse (raw count).

Usage: python scripts/profile_scaling.py [n_urls]
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from news_crawler_spark import synth  # noqa: E402
from news_crawler_spark.operators.extract import doc_fields  # noqa: E402


def work_chunk(args):
    lo, hi, return_payload = args
    out = []
    for i in range(lo, hi):
        src, _host, url = synth.clean_url(i % 5000)
        ok = synth.page_ok(url)
        _ms = synth.page_fetch_ms(url)
        if ok:
            t, s, k, sp = doc_fields(synth.page_payload(url), src)
            j = json.dumps(
                {"title": t, "summary": s, "keywords": k, "spans": sp},
                ensure_ascii=False, separators=(",", ":"),
            )
            if return_payload:
                out.append(j)
    return out if return_payload else len(out)


def pool_run(n_urls: int, workers: int, chunks: int, return_payload: bool) -> float:
    step = n_urls // chunks
    args = [(i * step, (i + 1) * step, return_payload) for i in range(chunks)]
    with mp.Pool(workers) as p:
        p.map(work_chunk, [(0, 200, return_payload)] * workers)  # warm
        t0 = time.perf_counter()
        p.map(work_chunk, args)
        return time.perf_counter() - t0


def spark_run(n_urls: int, cores: int, skip_from_json: bool) -> float:
    from pyspark.sql import functions as F

    from news_crawler_spark.functions.urls import with_url_columns
    from news_crawler_spark.operators import fetch
    from news_crawler_spark.session import get_spark

    spark = get_spark(app_name=f"prof_{cores}", cores=cores, shuffle_partitions=cores)
    seed = synth.build_seed_list(spark, n_urls)
    cand = (
        with_url_columns(seed, "url")
        .withColumn("priority", F.pmod(F.col("url_hash"), F.lit(3)).cast("int"))
        .withColumn("tried_count", F.lit(0))
    )
    import tempfile
    path = tempfile.mkdtemp(prefix=f"prof_{cores}_") + "/cand.parquet"
    cand.write.mode("overwrite").parquet(path)
    df = spark.read.parquet(path)

    def job():
        out = fetch.fetch_extract_pages(df)
        if skip_from_json:
            # count the raw python-stage output before the JVM parse
            src = fetch._salted(df.select(*fetch._CARRY), None, None)
            import pandas as pd  # noqa
            return src.mapInPandas(
                _raw_run, schema=fetch._RAW_SCHEMA
            ).count()
        return out.count()

    job()  # warm: python workers + codegen
    t0 = time.perf_counter()
    job()
    dt = time.perf_counter() - t0
    spark.stop()
    return dt


def _raw_run(batches):
    from news_crawler_spark.operators.fetch import _CARRY  # noqa
    for pdf in batches:
        urls = pdf["canonical_url"]
        pdf = pdf.copy()
        oks = urls.map(synth.page_ok)
        pdf["ok"] = oks
        pdf["fetch_ms"] = urls.map(synth.page_fetch_ms).astype("int32")
        docs = []
        for u, ok, src in zip(urls, oks, pdf["source"]):
            if not ok:
                docs.append(None)
                continue
            t, s, k, sp = doc_fields(synth.page_payload(u), src)
            docs.append(json.dumps(
                {"title": t, "summary": s, "keywords": k, "spans": sp},
                ensure_ascii=False, separators=(",", ":")))
        pdf["doc_json"] = docs
        yield pdf


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 160_000
    res = {}
    for tag, ret in (("A_pool_compute", False), ("B_pool_ipc", True)):
        t8 = pool_run(n, 8, 64, ret)
        t32 = pool_run(n, 32, 64, ret)
        res[tag] = {"t8": round(t8, 2), "t32": round(t32, 2),
                    "eff": round(t8 / t32 / 4, 3)}
        print(tag, res[tag], flush=True)
    for tag, skip in (("C_spark_full", False), ("D_spark_no_fromjson", True)):
        t8 = spark_run(n, 8, skip)
        t32 = spark_run(n, 32, skip)
        res[tag] = {"t8": round(t8, 2), "t32": round(t32, 2),
                    "eff": round(t8 / t32 / 4, 3)}
        print(tag, res[tag], flush=True)
    print(json.dumps(res))


if __name__ == "__main__":
    main()
