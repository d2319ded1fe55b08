"""Registered-domain (eTLD+1) extraction — the politeness/budget grouping key.

A web-scale crawler cannot treat the *host* as the unit of politeness or
budget: ``a.blog.example.com`` and ``b.blog.example.com`` are the same
site (and usually the same origin server), while ``a.co.uk`` and
``b.co.uk`` are unrelated registrants.  The public-suffix algorithm
(publicsuffix.org — the rule grammar Mozilla's PSL defines: plain
suffixes, ``*.``-wildcards, ``!``-exceptions, longest match wins) maps a
host to its *registered domain* (public suffix + one label), which is the
key real crawlers group politeness budgets, frontier quotas, and spam
scores on.  The reference crawls a fixed seed list of news hosts so it
never needs this; an open-frontier crawl does.

Scale shape (the g1-pagerank recipe): every shuffle here is O(|hosts|),
never O(|URLs|).  ``registered_domain_map`` works on the DISTINCT host
frame — suffix candidates are generated JVM-side (``transform`` over
``sequence(1, n_labels)``: a host of L labels yields L candidate
suffixes, L ≤ ~10), matched against the rule table with a *broadcast*
join, and reduced with one ``max_by`` aggregate.  ``with_registered_
domain`` then broadcasts the finished host→domain map back onto the URL
frame, so the big side never moves.  At 10^7 distinct hosts the map is a
few hundred MB of strings — still broadcastable; beyond that, bucket both
sides by host.

The PSL prevailing-rule semantics implemented (and pinned against an
independent DuckDB formulation by the p15 gate query, plus a pure-python
twin in tests/test_domains.py):

- a rule matches when its labels are a suffix of the host's labels;
  ``*`` matches exactly one extra label (so ``*.ck`` needs a host of
  ≥ 2 labels);
- exception rules beat everything, then most-labels wins
  (``*.ck`` counts 2 labels, beating plain ``ck``);
- public suffix = the matched rule (wildcard: matched labels + 1;
  exception: the rule minus its leftmost label);
- no rule matches → the public suffix is the host's last label;
- registered domain = public suffix + one more label, NULL when the
  host IS a bare public suffix.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

# A deterministic PSL-style slice for tests/benchmarks: realistic plain
# suffixes at two depths, one wildcard family, and its exception — enough
# to exercise every branch of the prevailing-rule logic. Real deployments
# pass the full public list through `suffix_rules_df(spark, rules=...)`.
DEFAULT_RULES = [
    "com",
    "org",
    "net",
    "ir",
    "co.ir",
    "ac.ir",
    "uk",
    "co.uk",
    "org.uk",
    "ck",
    "*.ck",
    "!www.ck",
]


def suffix_rules_df(spark: SparkSession, rules: list[str] | None = None) -> DataFrame:
    """Public-suffix rules as a one-column DataFrame (PSL line grammar)."""
    rows = [(r,) for r in (rules if rules is not None else DEFAULT_RULES)]
    return spark.createDataFrame(rows, "rule string")


def _normalized_rules(rules: DataFrame) -> DataFrame:
    """rule → (suffix key to equi-join on, rule label count for the
    prevailing-rule ordering, public-suffix label count, kind)."""
    rule = F.col("rule")
    kind = (
        F.when(rule.startswith("!"), F.lit("exception"))
        .when(rule.startswith("*."), F.lit("wildcard"))
        .otherwise(F.lit("normal"))
    )
    key = (
        F.when(rule.startswith("!"), F.substring(rule, 2, 1 << 20))
        .when(rule.startswith("*."), F.substring(rule, 3, 1 << 20))
        .otherwise(rule)
    )
    out = rules.select(key.alias("suffix"), kind.alias("kind"))
    key_labels = F.size(F.split(F.col("suffix"), r"\."))
    return out.select(
        "suffix",
        "kind",
        (key_labels + (F.col("kind") == "wildcard").cast("int")).alias("rule_labels"),
        (
            key_labels
            + F.when(F.col("kind") == "wildcard", F.lit(1))
            .when(F.col("kind") == "exception", F.lit(-1))
            .otherwise(F.lit(0))
        ).alias("ps_labels"),
    )


def _labels(host: Column) -> Column:
    return F.split(host, r"\.")


def registered_domain_map(hosts: DataFrame, rules: DataFrame) -> DataFrame:
    """(host) → (host, public_suffix, registered_domain) for a DISTINCT
    host frame. One broadcast join (rules are a dim table) + one max_by
    aggregate; every exchange is keyed and sized on hosts, not URLs."""
    labels = _labels(F.col("host"))
    n = F.size(labels)
    cands = F.transform(
        F.sequence(F.lit(1), n),
        lambda k: F.struct(
            k.alias("k"),
            F.array_join(F.slice(labels, -k, k), ".").alias("suffix"),
        ),
    )
    exploded = hosts.select(
        "host", n.alias("n"), F.explode(cands).alias("c")
    ).select("host", "n", F.col("c.k").alias("k"), F.col("c.suffix").alias("suffix"))

    matched = exploded.join(F.broadcast(_normalized_rules(rules)), "suffix").where(
        # a wildcard consumes one label beyond its literal key
        (F.col("kind") != "wildcard") | (F.col("n") > F.col("k"))
    )
    # prevailing rule: exception first, then most labels; the final
    # normal-beats-wildcard leg only breaks ties whose ps_labels already
    # agree (e.g. `co.uk` vs `*.uk`) — pinned for cross-engine determinism.
    best = matched.groupBy("host").agg(
        F.max_by(
            F.col("ps_labels"),
            F.struct(
                (F.col("kind") == "exception").cast("int").alias("exc"),
                F.col("rule_labels").alias("rl"),
                (F.col("kind") == "normal").cast("int").alias("nrm"),
            ),
        ).alias("matched_ps")
    )

    ps = F.greatest(F.coalesce(F.col("matched_ps"), F.lit(1)), F.lit(1))
    return (
        hosts.join(best, "host", "left")
        .select(
            "host",
            F.array_join(F.slice(labels, -ps, ps), ".").alias("public_suffix"),
            F.when(
                F.size(labels) > ps,
                F.array_join(F.slice(labels, -(ps + 1), ps + 1), "."),
            ).alias("registered_domain"),
        )
    )


def with_registered_domain(
    df: DataFrame, rules: DataFrame, host_col: str = "host"
) -> DataFrame:
    """Attach public_suffix / registered_domain to an arbitrary frame.

    The host→domain map is computed on ``df``'s distinct hosts and
    broadcast back, so ``df`` itself is never shuffled — the shape that
    survives a 10^10-row frontier (hosts ≪ URLs)."""
    hosts = df.select(F.col(host_col).alias("host")).distinct()
    m = registered_domain_map(hosts, rules).withColumnRenamed("host", "__rd_host")
    return df.join(
        F.broadcast(m), F.col(host_col) == F.col("__rd_host"), "left"
    ).drop("__rd_host")
