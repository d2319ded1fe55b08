"""Text-quality feature twins that need their own edge fixtures
(separate from the corpus-driven checks in test_pipeline_ops)."""


def test_dup_ngram_fraction_twin(spark):
    """Repetition ratios vs a python twin, including the short-doc and
    fully-repetitive edges."""
    from news_crawler_spark.operators import text as text_ops
    from pyspark.sql import functions as F

    rows = [
        ("a", "x y z x y z x y z"),          # heavy 3-gram repetition
        ("b", "all distinct tokens here"),   # none
        ("c", "t t t t"),                    # all-duplicate tokens
        ("d", "just two"),                   # shorter than n=3
        ("e", "one"),
    ]
    df = spark.createDataFrame(rows, "doc_id string, text string")
    got = {
        r.doc_id: (r.d1, r.d3)
        for r in df.select(
            "doc_id",
            F.round(text_ops.dup_ngram_fraction("text", 1), 4).alias("d1"),
            F.round(text_ops.dup_ngram_fraction("text", 3), 4).alias("d3"),
        ).collect()
    }

    def twin(t, n):
        toks = t.split(" ")
        if len(toks) < n:
            return 0.0
        g = [" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)]
        return round(1.0 - len(set(g)) / len(g), 4)

    for d, t in rows:
        assert got[d] == (twin(t, 1), twin(t, 3)), d
