"""Round-6 optimization measurement harness (bench.py is FROZEN).

Times individual headline queries with the exact methodology of
bench.run_queries (fn(spark, sf_dir).count() after the same warmup), but
lets you pick a subset and repeat count so the optimize-measure loop is
minutes, not the full 40-minute suite. Also captures
``.explain("formatted")`` output per query into plans/r06/.

Usage:
  python bench_extra.py time q1 q2 ... [--reps N] [--sf DIR]
  python bench_extra.py time all [--reps N]
  python bench_extra.py plan q1 q2 ... [--suffix before|after]
  python bench_extra.py noop q1 ...      # noop-sink isolation (guide §1.4)
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from news_crawler_spark import analytics  # noqa: E402
from news_crawler_spark.session import get_spark  # noqa: E402

from bench import HEADLINE  # noqa: E402


def _spark():
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    return get_spark(app_name="bench_extra", cores=cpus, shuffle_partitions=cpus)


def main() -> None:
    mode = sys.argv[1]
    args = sys.argv[2:]
    reps = 1
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    suffix = "before"
    names: list[str] = []
    it = iter(args)
    for a in it:
        if a == "--reps":
            reps = int(next(it))
        elif a == "--sf":
            sf_dir = next(it)
        elif a == "--suffix":
            suffix = next(it)
        elif a == "all":
            names = list(HEADLINE)
        else:
            names.append(a)

    spark = _spark()
    # same warmup as bench.run_queries
    analytics.load(spark, sf_dir, "orders").groupBy("o_orderstatus").count().count()

    if mode == "time":
        out: dict[str, object] = {}
        for name in names:
            fn = analytics.QUERIES[name]
            ts = []
            for _ in range(reps):
                t0 = time.perf_counter()
                n = fn(spark, sf_dir).count()
                ts.append(round(time.perf_counter() - t0, 3))
            out[name] = {
                "median": round(statistics.median(ts), 3),
                "reps": ts,
                "rows": n,
            }
            print(f"  {name}: {out[name]['median']}s {ts} ({n} rows)",
                  file=sys.stderr, flush=True)
        print(json.dumps({"sf_dir": sf_dir, "queries": out}))
    elif mode == "noop":
        for name in names:
            fn = analytics.QUERIES[name]
            ts = []
            for _ in range(reps):
                t0 = time.perf_counter()
                fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
                ts.append(round(time.perf_counter() - t0, 3))
            print(f"  noop {name}: {statistics.median(ts)}s {ts}",
                  file=sys.stderr, flush=True)
    elif mode == "plan":
        os.makedirs("plans/r06", exist_ok=True)
        for name in names:
            fn = analytics.QUERIES[name]
            df = fn(spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            path = f"plans/r06/{name}_{suffix}.txt"
            with open(path, "w") as f:
                f.write(plan)
            print(f"  wrote {path} ({len(plan)} chars)", file=sys.stderr)
    else:
        raise SystemExit(f"unknown mode {mode}")


if __name__ == "__main__":
    main()
