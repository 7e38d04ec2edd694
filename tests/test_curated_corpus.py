"""The curation composition: stage order semantics on a hand-built
corpus where every stage has a reason to fire."""

from __future__ import annotations

from pyspark.sql import functions as F

from simages_spark.operators.curation import curated_corpus, curation_stages

W = 4


def _clusters(spark, pairs):
    from simages_spark.config import DedupConfig
    from simages_spark.operators.connected_components import connected_components

    edges = spark.createDataFrame(pairs, "src long, dst long").withColumn(
        "jaccard", F.lit(1.0)
    )
    return connected_components(edges, DedupConfig())


def test_curation_stages_order_semantics(spark):
    base = " ".join(f"tok{i}" for i in range(20))  # 20 tokens, 5 windows of 4
    boiler = "alpha beta gamma delta"
    rows = [
        # doc 1: dedup loser (clustered with 0) — holds `boiler` FIRST
        (0, base, "en"),
        (1, boiler + " " + base, "en"),
        # doc 2: quality failure (too short) that ALSO holds boiler early
        (2, boiler, "en"),
        # doc 3: contaminated (shares 5-grams with the benchmark)
        (3, "bench mark gram one two three four five six seven", "en"),
        # doc 4: clean survivor holding boiler — must KEEP it, because
        # every earlier holder (1, 2) was dropped before line-dedup ran
        (4, boiler + " unique middle words here now", "en"),
        # doc 5: second surviving holder — loses the boiler window to 4
        (5, boiler + " other tail content words", "en"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    benchmark = spark.createDataFrame(
        [(100, "bench mark gram one two three four five six seven")],
        "doc_id long, text string",
    )
    stages = curation_stages(
        docs,
        benchmark,
        _clusters(spark, [(0, 1)]),
        words_per_segment=W,
        contamination_max=0.2,
        quality_kwargs={"min_tokens": 5},
    )
    assert {r["doc_id"] for r in stages["dedup_losers"].collect()} == {1}
    assert {r["doc_id"] for r in stages["contaminated"].collect()} == {3}
    survivors = {r["doc_id"] for r in stages["survivors"].collect()}
    assert survivors == {0, 4, 5}  # 2 fails quality (4 tokens < 5)

    curated = {
        r["doc_id"]: r["text_curated"]
        for r in stages["curated"].collect()
    }
    assert set(curated) == {0, 4, 5}
    # the staged semantics: boiler's earlier holders (1, 2) were dropped
    # BEFORE line-dedup, so doc 4 — the first surviving holder — keeps it
    assert curated[4].startswith(boiler)
    assert boiler not in curated[5]
    assert curated[0] == base  # untouched unique text

    # the convenience wrapper returns the same end product
    end = curated_corpus(
        docs,
        benchmark,
        _clusters(spark, [(0, 1)]),
        words_per_segment=W,
        contamination_max=0.2,
        quality_kwargs={"min_tokens": 5},
    )
    assert {
        (r["doc_id"], r["text_curated"], r["n_chars_curated"])
        for r in end.collect()
    } == {(d, t, len(t)) for d, t in curated.items()}


def test_curated_corpus_without_lang_column(spark):
    docs = spark.createDataFrame(
        [(1, " ".join(f"t{i}" for i in range(20)))], "doc_id long, text string"
    )
    benchmark = spark.createDataFrame(
        [(9, "nothing shared here at all with the corpus text")],
        "doc_id long, text string",
    )
    empty_clusters = spark.createDataFrame([], "doc_id long, cluster_id long")
    out = curated_corpus(
        docs, benchmark, empty_clusters,
        quality_kwargs={"min_tokens": 5},
    ).collect()
    assert len(out) == 1 and out[0]["lang"] is None
