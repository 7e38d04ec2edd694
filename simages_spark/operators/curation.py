"""Training-corpus curation operators: benchmark decontamination,
deterministic stratified sampling, and token-budget data mixing.

These are the corpus-assembly steps a web-scale training pipeline runs
AFTER dedup (the reference stops at delete-the-duplicates,
src/simages/duplicate_finder.py:403-409; a 10^12-doc corpus also has to
be decontaminated against eval benchmarks, sampled per stratum, and cut
to a token budget per source). All three are built on the same portable
primitives as the dedup tiers — the canonical shingle/tokenize semantics
in functions/shingles.py and pure int64 arithmetic — so every one of
them is value-checkable against a DuckDB oracle bit for bit.

Scale posture (the part that matters at 100 TB):

* decontamination: the benchmark side is small by construction (eval
  suites are MBs, the corpus is TBs) → its distinct n-gram hashes are
  `broadcast()`; the corpus side is one map-side explode + one
  partial-aggregated groupBy(doc_id). No O(corpus × benchmark) anywhere.
* stratified_sample: a pure map — zero shuffles, trivially linear.
* token_budget_mix: an exact per-source prefix sum. The naive plan
  (`Window.partitionBy(source)`) funnels each source through ONE task —
  with a handful of sources that is a single-reducer bottleneck at any
  cluster size, so the engine path implements the classic two-phase
  distributed prefix sum instead: range-repartition by (source, key),
  one small job for per-partition subtotals, broadcast offsets, then a
  streaming second pass. Parallelism stays ~n_partitions regardless of
  source cardinality.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from simages_spark.functions.shingles import shingle_hash_col, tokens_col

# Multiplicative hash over a prime field: h(x) = ((x mod P) * A) mod P,
# with non-negative mod. Pure int64 arithmetic ((P-1)*A < 2^52 — no
# overflow under ANSI), expressible identically in Spark SQL, DuckDB,
# and plain Python, which is the whole point: the sampling decision is a
# deterministic property of the row, not of the engine, the plan, or
# the partitioning. A is Knuth's 2^32/phi constant; P is prime so
# multiplication by A permutes the field (near-uniform buckets).
SAMPLE_MOD = 1_000_003
SAMPLE_MULT = 2_654_435_761


def sample_key_col(doc_id: Column) -> Column:
    """Portable deterministic sample key in [0, SAMPLE_MOD)."""
    nn = (doc_id % SAMPLE_MOD + SAMPLE_MOD) % SAMPLE_MOD
    return (nn * F.lit(SAMPLE_MULT)) % SAMPLE_MOD


def sample_key_sql(doc_id_expr: str = "doc_id") -> str:
    """The same key as a DuckDB/ANSI SQL fragment (oracle mirror)."""
    return (
        f"((({doc_id_expr} % {SAMPLE_MOD} + {SAMPLE_MOD}) % {SAMPLE_MOD})"
        f" * {SAMPLE_MULT}) % {SAMPLE_MOD}"
    )


def decontamination_report(
    corpus: DataFrame,
    benchmark: DataFrame,
    k: int = 5,
    max_shingles: int | None = None,
    text_col: str = "text",
) -> DataFrame:
    """Flag corpus docs sharing any k-gram shingle with a benchmark suite.

    Output: one row per CONTAMINATED corpus doc —
    (doc_id, n_shingles, n_overlap, contamination) with contamination =
    n_overlap / n_shingles rounded to 6 places. Docs with no overlap (or
    no shingles) are absent: at web scale the contaminated set is tiny
    and the report is what a curation job materializes; the clean corpus
    is `corpus.join(report, "doc_id", "left_anti")`.

    Overlap is counted over the DISTINCT shingle-hash sets (the same
    60-bit md5-prefix space the MinHash tier uses, so "contaminated"
    composes with the dedup tiers' notion of textual overlap). With
    `max_shingles` the per-doc set is capped to the smallest-N hashes —
    the signature path's cap semantics (config.max_shingles_per_doc) —
    keeping the explode bounded per doc on adversarially long pages.
    """
    grams = shingle_hash_col(F.col(text_col), k)
    if max_shingles is not None:
        grams = F.slice(grams, 1, max_shingles)
    bench_grams = (
        benchmark.select(F.explode(grams).alias("g")).distinct()
    )
    base = corpus.select("doc_id", grams.alias("hashes"))
    exploded = base.select(
        "doc_id", F.size("hashes").alias("n_shingles"), F.explode("hashes").alias("g")
    )
    return (
        exploded.join(F.broadcast(bench_grams), "g")
        .groupBy("doc_id", "n_shingles")
        .agg(F.count("*").alias("n_overlap"))
        .select(
            "doc_id",
            F.col("n_shingles").cast("long").alias("n_shingles"),
            F.col("n_overlap").cast("long").alias("n_overlap"),
            F.round(F.col("n_overlap") / F.col("n_shingles"), 6).alias(
                "contamination"
            ),
        )
    )


def stratified_sample(
    docs: DataFrame,
    rates: dict[str, float],
    default_rate: float = 0.0,
    stratum_col: str = "lang",
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic per-stratum downsampling: keep a row iff its sample
    key falls under the stratum's threshold.

    The keep decision depends only on (id, stratum) — identical across
    engines, partitionings, and reruns, so a sampled corpus is
    reproducible and composable (resampling at a lower rate yields a
    subset: thresholds are nested). Rates are converted to integer
    thresholds on the driver (floor(rate * SAMPLE_MOD)) so no float
    crosses an engine boundary. Pure map: zero shuffles.
    """
    key = sample_key_col(F.col(id_col))
    thresh: Column = F.lit(int(default_rate * SAMPLE_MOD))
    for stratum, rate in sorted(rates.items()):
        thresh = F.when(
            F.col(stratum_col) == stratum, F.lit(int(rate * SAMPLE_MOD))
        ).otherwise(thresh)
    return docs.where(key < thresh).withColumn("sample_key", key)


def token_budget_mix(
    docs: DataFrame,
    budgets: dict[str, int],
    default_budget: int = 0,
    source_col: str = "source",
    text_col: str = "text",
    num_partitions: int | None = None,
) -> DataFrame:
    """Cut the corpus to a per-source token budget: within each source,
    take docs in deterministic sample-key order until the cumulative
    whitespace-token count exceeds the source's budget.

    This is the data-mixing step (fill a training run's token budget
    with weighted source shares). Semantics: a doc is kept iff its
    INCLUSIVE running total ≤ budget — exactly
    `SUM(n_tokens) OVER (PARTITION BY source ORDER BY key, doc_id
    ROWS UNBOUNDED PRECEDING) <= budget`, which is the oracle mirror.

    The engine path does NOT use that window: partitionBy(source) with
    few sources serializes each source through one task. Instead, the
    classic two-phase exact distributed prefix sum:

      1. range-repartition by (source, key, doc_id) + sort within
         partitions — global order with ~uniform partition sizes (the
         range partitioner samples, so a skewed source still splits
         across many partitions);
      2. one cheap job aggregates per-(partition, source) subtotals
         (partial agg; result is n_partitions × n_sources rows on the
         driver — scalar-sized);
      3. a second streaming pass (`mapInPandas`, Arrow-batched) adds
         each partition's broadcast starting offsets and filters by the
         running total. Batches of one partition arrive in sorted order,
         so the running state is a per-source dict updated batch to
         batch — O(batch) memory, no per-row Python.

    Output: (doc_id, source, n_tokens, cum_tokens) for kept docs.
    """
    key = sample_key_col(F.col("doc_id"))
    base = docs.select(
        "doc_id",
        F.col(source_col).alias("source"),
        F.coalesce(F.size(tokens_col(F.col(text_col))), F.lit(0))
        .cast("long")
        .alias("n_tokens"),
        key.alias("_key"),
    )
    parts = num_partitions or base.sparkSession.sparkContext.defaultParallelism
    # materialize the slim projection ONCE: repartitionByRange adds a
    # range-SAMPLING job before the shuffle, so an unpersisted base would
    # pay the tokenization scan twice (measured 2× the whole operator's
    # cost at 2M docs). The cached side is (doc_id, source, n_tokens,
    # _key) — tens of bytes/row, not the text
    base = base.persist()
    try:
        ordered = base.repartitionByRange(
            parts, "source", "_key", "doc_id"
        ).sortWithinPartitions("source", "_key", "doc_id")
        # pin the partitioning: pass 1 (subtotals) and pass 2 (prefix sum)
        # must see the SAME rows in the SAME partitions; localCheckpoint
        # severs lineage so neither pass re-samples the range partitioner
        ordered = (
            ordered.withColumn("_pid", F.spark_partition_id()).localCheckpoint()
        )
    finally:
        base.unpersist()
    subtotals = (
        ordered.groupBy("_pid", "source").agg(F.sum("n_tokens").alias("t")).collect()
    )
    # offsets[pid][source] = tokens of that source in all partitions < pid
    by_source: dict[str, int] = {}
    offsets: dict[int, dict[str, int]] = {}
    for row in sorted(subtotals, key=lambda r: r["_pid"]):
        offsets.setdefault(row["_pid"], {})[row["source"]] = by_source.get(
            row["source"], 0
        )
        by_source[row["source"]] = by_source.get(row["source"], 0) + row["t"]

    out_schema = "doc_id long, source string, n_tokens long, cum_tokens long"

    def run(batches):
        running: dict[str, int] | None = None
        for pdf in batches:
            if pdf.empty:
                continue
            if running is None:
                running = dict(offsets.get(int(pdf["_pid"].iloc[0]), {}))
            # vectorized per-source running sum across batches: groupby
            # cumsum within the batch + the carried offset per source
            cum = pdf.groupby("source")["n_tokens"].cumsum()
            start = pdf["source"].map(lambda s: running.get(s, 0))
            cum = cum + start
            for s, t in pdf.groupby("source")["n_tokens"].sum().items():
                running[s] = running.get(s, 0) + int(t)
            bud = pdf["source"].map(lambda s: budgets.get(s, default_budget))
            keep = cum <= bud
            if keep.any():
                out = pdf.loc[keep, ["doc_id", "source", "n_tokens"]].copy()
                out["cum_tokens"] = cum[keep]
                yield out
        # a partition with zero rows yields nothing
        return

    return ordered.mapInPandas(run, schema=out_schema)


def curation_stages(
    docs: DataFrame,
    benchmark: DataFrame,
    clusters: DataFrame,
    *,
    words_per_segment: int = 10,
    contamination_max: float = 0.2,
    k: int = 5,
    max_shingles: int | None = None,
    quality_kwargs: dict | None = None,
) -> dict[str, DataFrame]:
    """The full curation composition — the C4/RefinedWeb assembly line as
    one call, each stage an already-oracle-checked operator, applied in
    the order a real pipeline runs them (cheap whole-doc drops BEFORE the
    expensive text surgery):

      1. doc-level dedup: keep-first policy over `clusters` (callers pass
         the pipeline's clusters — find_duplicates(...).clusters — or an
         oracle-parity brute-force clustering);
      2. quality gate: functions/text_stats.quality_filter;
      3. benchmark decontamination: drop docs whose capped-shingle
         contamination against `benchmark` is ≥ contamination_max;
      4. segment(line)-level dedup OVER THE SURVIVORS ONLY — the election
         runs within the curated set, so a segment whose only earlier
         holder was itself dropped in 1–3 survives in its first remaining
         doc (the semantics a staged pipeline actually has).

    Returns every intermediate keyed by stage name; `curated` is the end
    product (doc_id, lang, text_curated, n_chars_curated). All joins are
    key-only semi/anti joins — the text column rides no shuffle until the
    final line-dedup reassembly.
    """
    from simages_spark.functions.text_stats import quality_filter
    from simages_spark.operators.groups import keep_first_policy
    from simages_spark.operators.line_dedup import line_deduped_corpus

    policy = keep_first_policy(clusters, docs)
    # the three decision sets are doc_id-only (8 B/row — MBs per 10^6
    # docs) but EXPENSIVE to derive (policy window, repetition aggs,
    # decontamination join); downstream they each appear in the curated
    # DAG several times (survivors is rebuilt per branch of the final
    # join tree) and callers also count them for stage attribution.
    # Persist so each is computed once; references are dropped with the
    # returned DataFrames and freed by the ContextCleaner.
    dedup_losers = policy.where(~F.col("is_keeper")).select("doc_id").persist()
    quality_kept = (
        quality_filter(docs, **(quality_kwargs or {}))
        .where(F.col("keep"))
        .select("doc_id")
        .persist()
    )
    contaminated = (
        decontamination_report(docs, benchmark, k=k, max_shingles=max_shingles)
        .where(F.col("contamination") >= contamination_max)
        .select("doc_id")
        .persist()
    )

    survivors = (
        docs.join(dedup_losers, "doc_id", "left_anti")
        .join(quality_kept, "doc_id", "left_semi")
        .join(contaminated, "doc_id", "left_anti")
    )
    # lang is metadata, not a curation input — corpora without it (bare
    # (doc_id, text) batches) curate fine and report NULL lang
    lang = (
        F.col("lang") if "lang" in survivors.columns
        else F.lit(None).cast("string").alias("lang")
    )
    curated = (
        line_deduped_corpus(
            survivors, words_per_segment=words_per_segment
        )
        .join(survivors.select("doc_id", lang), "doc_id")
        .select(
            "doc_id",
            "lang",
            F.col("text_deduped").alias("text_curated"),
            F.length("text_deduped").cast("long").alias("n_chars_curated"),
        )
    )
    return {
        "dedup_losers": dedup_losers,
        "quality_kept": quality_kept,
        "contaminated": contaminated,
        "survivors": survivors,
        "curated": curated,
    }


def curated_corpus(
    docs: DataFrame,
    benchmark: DataFrame,
    clusters: DataFrame,
    **kwargs,
) -> DataFrame:
    """End product of curation_stages (see its docstring)."""
    return curation_stages(docs, benchmark, clusters, **kwargs)["curated"]
