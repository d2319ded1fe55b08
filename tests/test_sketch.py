"""operators/sketch.py — KMV bottom-k distinct sketch: exactness of the
bottom-k set, zero-error merge, estimator accuracy and determinism."""

import hashlib

import pytest
from pyspark.sql import functions as F

from news_crawler_spark.operators import sketch


def _py_hash60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


@pytest.fixture(scope="module")
def hashed(spark):
    """3 groups × ~1700/1000/300 distinct values, with heavy duplication
    (each value appears 3×) so distinct-before-sketch matters."""
    df = spark.range(0, 9000).select(
        F.element_at(
            F.array(F.lit("g0"), F.lit("g1"), F.lit("g2")),
            (F.col("id") % 3 + 1).cast("int"),
        ).alias("g"),
        F.concat(
            F.lit("v"),
            F.when(F.col("id") % 3 == 0, F.col("id") % 5100)
            .when(F.col("id") % 3 == 1, F.col("id") % 3000)
            .otherwise(F.col("id") % 900)
            .cast("string"),
        ).alias("v"),
    )
    return df.select(
        "g", F.col("v"), sketch.md5_hash60(F.col("v")).alias("h")
    ).localCheckpoint(eager=True)


def _py_bottom_k(rows, k):
    by_g = {}
    for r in rows:
        by_g.setdefault(r.g, set()).add(_py_hash60(r.v))
    return {g: sorted(hs)[:k] for g, hs in by_g.items()}


def test_hash60_matches_python(hashed):
    for r in hashed.limit(50).collect():
        assert r.h == _py_hash60(r.v)


def test_bottom_k_is_exact(spark, hashed):
    k = 64
    got = {
        r.g: list(r.mins)
        for r in sketch.kmv_bottom_k(hashed, ["g"], "h", k).collect()
    }
    assert got == _py_bottom_k(hashed.collect(), k)


def test_partial_sketch_holds_all_hashes(spark, hashed):
    """A group with fewer distinct values than k keeps them ALL (the
    sketch degrades to the exact set)."""
    k = 2048
    got = {
        r.g: list(r.mins)
        for r in sketch.kmv_bottom_k(hashed, ["g"], "h", k).collect()
    }
    want = _py_bottom_k(hashed.collect(), k)
    assert got == want
    assert any(len(v) < k for v in want.values())


@pytest.mark.parametrize("n_shards", [2, 5])
def test_merge_is_zero_error(spark, hashed, n_shards):
    k = 64
    direct = {
        r.g: list(r.mins)
        for r in sketch.kmv_bottom_k(hashed, ["g"], "h", k).collect()
    }
    shards = [
        sketch.kmv_bottom_k(
            hashed.filter(F.pmod(F.col("h"), F.lit(n_shards)) == i), ["g"], "h", k
        )
        for i in range(n_shards)
    ]
    merged = {
        r.g: list(r.mins) for r in sketch.kmv_merge(shards, ["g"], k).collect()
    }
    assert merged == direct


def test_estimate_matches_python_and_is_close(spark, hashed):
    k = 128
    sk = sketch.with_kmv_estimate(sketch.kmv_bottom_k(hashed, ["g"], "h", k), k)
    exact = {
        r.g: r.n
        for r in hashed.select("g", "h")
        .distinct()
        .groupBy("g")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    for r in sk.collect():
        if len(r.mins) >= k:
            want = (k - 1) * sketch.KMV_SPACE // r.mins[k - 1]
            rel = abs(r.estimate - exact[r.g]) / exact[r.g]
            assert rel < 0.5, (r.g, r.estimate, exact[r.g])
        else:
            want = len(r.mins)
            assert r.estimate == exact[r.g]  # partial sketch is exact
        assert r.estimate == want
    # at least one full and one partial sketch exercised
    sizes = [len(r.mins) for r in sk.collect()]
    assert max(sizes) == k


class TestCountMin:
    def _mk(self, spark):
        # 2 groups, zipf-ish: value v{i} appears (40-i) times in g0
        rows = [("g0", f"v{i}") for i in range(40) for _ in range(40 - i)]
        rows += [("g1", f"w{i}") for i in range(10) for _ in range(i + 1)]
        return spark.createDataFrame(rows, "g string, v string")

    def test_estimate_never_underestimates(self, spark):
        from pyspark.sql import functions as F

        df = self._mk(spark)
        table = sketch.countmin_table(df, ["g"], "v", depth=4, width=16)
        exact = df.groupBy("g", "v").agg(F.count("*").alias("n_exact"))
        est = sketch.countmin_estimate(
            exact.select("g", "v"), table, ["g"], "v", depth=4, width=16
        )
        joined = exact.join(est, ["g", "v"]).collect()
        assert len(joined) == 50
        assert all(r.cm_estimate >= r.n_exact for r in joined)
        # width 16 vs 40 values: collisions must actually occur
        assert any(r.cm_estimate > r.n_exact for r in joined)

    def test_wide_table_is_exact(self, spark):
        """With width >> distinct values, every estimate is exact."""
        from pyspark.sql import functions as F

        df = self._mk(spark)
        table = sketch.countmin_table(df, ["g"], "v", depth=4, width=4096)
        exact = df.groupBy("g", "v").agg(F.count("*").alias("n_exact"))
        est = sketch.countmin_estimate(
            exact.select("g", "v"), table, ["g"], "v", depth=4, width=4096
        )
        assert all(
            r.cm_estimate == r.n_exact
            for r in exact.join(est, ["g", "v"]).collect()
        )

    def test_merge_is_cellwise_exact(self, spark):
        from pyspark.sql import functions as F

        df = self._mk(spark).withColumn(
            "shard", F.pmod(F.xxhash64("v"), F.lit(3))
        )
        direct = sketch.countmin_table(df, ["g"], "v", depth=3, width=8)
        shards = [
            sketch.countmin_table(
                df.filter(F.col("shard") == i), ["g"], "v", depth=3, width=8
            )
            for i in range(3)
        ]
        merged = sketch.countmin_merge(shards, ["g"])
        d = {(r.g, r.r, r.c): r.n for r in direct.collect()}
        m = {(r.g, r.r, r.c): r.n for r in merged.collect()}
        assert d == m


# --------------------------- quantile sketch ---------------------------


@pytest.fixture(scope="module")
def valued(spark):
    """2 groups × 600/300 rows with unique keys and a skewed value
    distribution (quadratic in id, so quantiles aren't linear)."""
    return spark.range(0, 900).select(
        F.when(F.col("id") % 3 == 0, F.lit("a")).otherwise(F.lit("b")).alias("g"),
        F.col("id").alias("k"),
        ((F.col("id") % 97) * (F.col("id") % 97)).cast("long").alias("v"),
    ).localCheckpoint(eager=True)


def _py_qsketch(rows, k):
    """(g, key, v) rows → per group the k rows with smallest md5 hash."""
    by_g = {}
    for g, key, v in rows:
        by_g.setdefault(g, []).append((_py_hash60(str(key)), v))
    return {g: sorted(ps)[:k] for g, ps in by_g.items()}


def _py_quantile(sample_vals, num, den):
    vals = sorted(sample_vals)
    s = len(vals)
    return vals[(num * s + den - 1) // den - 1]


def test_qsketch_sample_matches_python(spark, valued):
    rows = [(r["g"], r["k"], r["v"]) for r in valued.collect()]
    want = _py_qsketch(rows, 64)
    got = {
        r["g"]: [(p["h"], p["v"]) for p in r["sample"]]
        for r in sketch.qsketch_bottom_k(valued, ["g"], "k", "v", 64).collect()
    }
    assert got == want


def test_qsketch_quantiles_exact_when_group_fits(spark, valued):
    # k ≥ group size ⇒ the sample IS the group ⇒ estimates are the exact
    # discrete quantiles
    sk = sketch.qsketch_bottom_k(valued, ["g"], "k", "v", 1000)
    out = {
        r["g"]: (r["sample_n"], r["p50"], r["p90"], r["p99"])
        for r in sketch.qsketch_quantiles(
            sk, [("p50", 1, 2), ("p90", 9, 10), ("p99", 99, 100)]
        ).collect()
    }
    rows = [(r["g"], r["k"], r["v"]) for r in valued.collect()]
    for g in ("a", "b"):
        vals = [v for gg, _, v in rows if gg == g]
        assert out[g] == (
            len(vals),
            _py_quantile(vals, 1, 2),
            _py_quantile(vals, 9, 10),
            _py_quantile(vals, 99, 100),
        )


@pytest.mark.parametrize("n_shards", [2, 4])
def test_qsketch_merge_is_zero_error(spark, valued, n_shards):
    direct = {
        r["g"]: [(p["h"], p["v"]) for p in r["sample"]]
        for r in sketch.qsketch_bottom_k(valued, ["g"], "k", "v", 48).collect()
    }
    shards = [
        sketch.qsketch_bottom_k(
            valued.filter(F.pmod(F.col("k"), F.lit(n_shards)) == i),
            ["g"], "k", "v", 48,
        )
        for i in range(n_shards)
    ]
    merged = {
        r["g"]: [(p["h"], p["v"]) for p in r["sample"]]
        for r in sketch.qsketch_merge(shards, ["g"], 48).collect()
    }
    assert merged == direct


def test_qsketch_estimates_bounded_and_ordered(spark, valued):
    # estimates from a genuinely-approximate sample stay within the value
    # range and respect quantile monotonicity
    sk = sketch.qsketch_bottom_k(valued, ["g"], "k", "v", 32)
    out = sketch.qsketch_quantiles(
        sk, [("p50", 1, 2), ("p90", 9, 10), ("p99", 99, 100)]
    ).collect()
    rows = [(r["g"], r["v"]) for r in valued.select("g", "v").collect()]
    for r in out:
        vals = [v for g, v in rows if g == r["g"]]
        assert r["sample_n"] == 32
        assert min(vals) <= r["p50"] <= r["p90"] <= r["p99"] <= max(vals)


# ---------------------------------------------------------------- HLL


def _py_hll_registers(rows):
    regs = {}
    for r in rows:
        hx = hashlib.md5(r.v.encode()).hexdigest()
        bucket = int(hx[:2], 16)
        suffix = int(hx[2:16], 16)
        rho = 57 if suffix == 0 else 57 - suffix.bit_length()
        key = (r.g, bucket)
        regs[key] = max(regs.get(key, 0), rho)
    return regs


def test_hll_registers_match_python(spark, hashed):
    got = {
        (r.g, r.bucket): r.max_rho
        for r in sketch.hll_registers(hashed, ["g"], "v").collect()
    }
    assert got == _py_hll_registers(hashed.collect())


def test_hll_merge_equals_direct(spark, hashed):
    direct = sketch.hll_registers(hashed, ["g"], "v")
    shards = [
        sketch.hll_registers(
            hashed.filter(sketch.md5_hash60(F.col("v")) % 3 == i), ["g"], "v"
        )
        for i in range(3)
    ]
    merged = sketch.hll_merge(shards, ["g"])
    key = lambda r: (r.g, r.bucket)  # noqa: E731
    assert sorted(map(tuple, merged.collect()), key=str) == sorted(
        map(tuple, direct.collect()), key=str
    )


def test_hll_merge_is_idempotent(spark, hashed):
    """At-least-once delivery: merging the SAME shard twice changes
    nothing (per-bucket max) — the property additive counters lack."""
    one = sketch.hll_registers(hashed, ["g"], "v")
    twice = sketch.hll_merge([one, one], ["g"])
    assert sorted(map(tuple, twice.collect()), key=str) == sorted(
        map(tuple, one.collect()), key=str
    )


def test_hll_estimate_accuracy(spark, hashed):
    """m=256 → stderr ≈ 6.5%; md5 is fixed so the realized error is
    deterministic — bound it at 3 stderr for each group (exact distinct
    5100/3000/900, spanning the linear-counting/raw-HLL switch)."""
    regs = sketch.hll_registers(hashed, ["g"], "v")
    est = {r.g: r.estimate for r in sketch.hll_estimate(regs, ["g"]).collect()}
    exact = {
        r.g: r.n
        for r in hashed.groupBy("g")
        .agg(F.countDistinct("v").alias("n"))
        .collect()
    }
    for g, n in exact.items():
        assert abs(est[g] - n) / n < 0.20, (g, est[g], n)


def test_hll_duplicates_do_not_move_registers(spark, hashed):
    """Register state depends only on the distinct value set."""
    direct = sketch.hll_registers(hashed, ["g"], "v")
    deduped = sketch.hll_registers(hashed.dropDuplicates(["g", "v"]), ["g"], "v")
    assert sorted(map(tuple, direct.collect()), key=str) == sorted(
        map(tuple, deduped.collect()), key=str
    )
