"""Registered-domain (PSL) extraction + SURT keys: python-twin parity,
golden edge cases, and the hosts-only-shuffle plan contract."""

import pytest
from pyspark.sql import functions as F

from news_crawler_spark.functions import domains
from news_crawler_spark.functions.urls import surt_key_col


# ------------------------------------------------------- python PSL twin
def psl_twin(host: str, rules: list[str]) -> tuple[str, str | None]:
    """Independent pure-python implementation of the public-suffix
    prevailing-rule algorithm (publicsuffix.org/list): returns
    (public_suffix, registered_domain)."""
    hl = host.split(".")
    matches = []  # (is_exception, rule_labels, ps_labels)
    for rule in rules:
        exc = rule.startswith("!")
        r = rule[1:] if exc else rule
        rl = r.split(".")
        if len(rl) > len(hl):
            continue
        tail = hl[len(hl) - len(rl):]
        if all(a == "*" or a == b for a, b in zip(rl, tail)):
            if exc:
                matches.append((1, len(rl), len(rl) - 1))
            else:
                matches.append((0, len(rl), len(rl)))
    if matches:
        ps_n = max(matches)[2]
    else:
        ps_n = 1
    ps_n = max(ps_n, 1)
    ps = ".".join(hl[len(hl) - ps_n:])
    if len(hl) > ps_n:
        return ps, ".".join(hl[len(hl) - ps_n - 1:])
    return ps, None


HOSTS = [
    "news3.example.com",          # plain 1-label suffix
    "a.b.site9.co.uk",            # longest match beats `uk`
    "site9.uk",                   # the shorter rule when alone
    "x.y.deep.ac.ir",             # deep subdomain, 2-label suffix
    "foo.weird",                  # unknown TLD -> default last-label rule
    "weird",                      # bare unknown TLD -> NULL regd
    "www.ck",                     # exception rule beats the wildcard
    "sub.www.ck",                 # exception still prevails underneath
    "any.w.ck",                   # wildcard: ps = w.ck
    "b.ck",                       # host IS a wildcard public suffix -> NULL
    "ck",                         # wildcard can't consume: plain `ck` rule
    "co.uk",                      # host IS a plain public suffix -> NULL
    "example.com",                # exactly registered-domain depth
]

# the PSL semantics the twin itself must satisfy (hand-derived goldens,
# so a shared misreading of the spec can't hide in twin-vs-engine parity)
GOLDEN = {
    "www.ck": ("ck", "www.ck"),
    "sub.www.ck": ("ck", "www.ck"),
    "any.w.ck": ("w.ck", "any.w.ck"),
    "b.ck": ("b.ck", None),
    "ck": ("ck", None),
    "a.b.site9.co.uk": ("co.uk", "site9.co.uk"),
    "foo.weird": ("weird", "foo.weird"),
    "co.uk": ("co.uk", None),
}


def test_twin_matches_goldens():
    for host, want in GOLDEN.items():
        assert psl_twin(host, domains.DEFAULT_RULES) == want, host


def test_registered_domain_matches_python_twin(spark):
    hosts = spark.createDataFrame([(h,) for h in HOSTS], "host string")
    got = {
        r.host: (r.public_suffix, r.registered_domain)
        for r in domains.registered_domain_map(
            hosts, domains.suffix_rules_df(spark)
        ).collect()
    }
    assert set(got) == set(HOSTS)
    for h in HOSTS:
        assert got[h] == psl_twin(h, domains.DEFAULT_RULES), h


def test_with_registered_domain_broadcasts_map(spark):
    """The URL frame must never shuffle: its join against the host→domain
    map is broadcast (the O(|hosts|) contract in the module docstring)."""
    urls = spark.createDataFrame(
        [(h, f"https://{h}/p{i}") for i, h in enumerate(HOSTS * 3)],
        "host string, canonical_url string",
    )
    out = domains.with_registered_domain(
        urls, domains.suffix_rules_df(spark)
    )
    assert out.count() == len(HOSTS) * 3
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    # no row lost / duplicated by the map join
    one = out.where(F.col("host") == "any.w.ck").select("registered_domain").distinct()
    assert [r.registered_domain for r in one.collect()] == ["any.w.ck"]


def test_surt_key_goldens(spark):
    rows = [
        ("https://a.blog.example.com/x/y?q=1&r=2", "com,example,blog,a)/x/y?q=1&r=2"),
        ("https://www.isna.ir/", "ir,isna,www)/"),
        ("https://ck/", "ck)/"),
        ("https://a.ir/sec/", "ir,a)/sec/"),
        ("https://a.ir/p?b=2&a=1", "ir,a)/p?b=2&a=1"),
    ]
    df = spark.createDataFrame([(u,) for u, _ in rows], "canonical_url string")
    got = [
        r.k
        for r in df.select(surt_key_col("canonical_url").alias("k"))
        .orderBy("canonical_url")
        .collect()
    ]
    want = [k for _, k in sorted(rows)]
    assert got == want


def test_surt_order_groups_domains_contiguously(spark):
    """Sorting by surt_key must place every URL of a registered domain in
    one contiguous run — the property that makes a surt-range-partitioned
    frontier prunable per domain."""
    urls = [
        f"https://{h}/p/{i}"
        for h in ["a.news.example.com", "b.news.example.com", "www.example.com",
                  "site1.co.uk", "a.site1.co.uk", "zzz.org"]
        for i in range(3)
    ]
    df = spark.createDataFrame([(u,) for u in urls], "canonical_url string")
    rows = (
        df.select(
            surt_key_col("canonical_url").alias("k"),
            F.col("canonical_url"),
        )
        .orderBy("k")
        .collect()
    )
    # registered-domain prefix of the surt key = first two host labels
    # reversed (com,example / uk,co,site1 / org,zzz)
    def dom(k):
        rev = k.split(")")[0].split(",")
        return ",".join(rev[:3] if rev[0] in ("uk",) else rev[:2])

    seq = [dom(r.k) for r in rows]
    seen, prev = set(), None
    for d in seq:
        if d != prev:
            assert d not in seen, f"domain {d} split into two runs: {seq}"
            seen.add(d)
            prev = d


def test_surt_is_pure_projection(spark):
    df = spark.range(100).select(
        F.concat(F.lit("https://h"), (F.col("id") % 7).cast("string"),
                 F.lit(".example.com/p/"), F.col("id").cast("string")).alias("u")
    )
    out = df.select(surt_key_col("u").alias("k"))
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
