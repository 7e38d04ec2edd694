"""Plan audit: print `explain(formatted)` for the headline operators and
grep for the properties that matter at scale — parquet pushdown/pruning,
WholeStageCodegen coverage, join strategies, shuffle counts.

Usage: python tools/explain_audit.py [sf_dir]
"""

from __future__ import annotations

import re
import sys

sys.path.insert(0, "/root/repo")

from simages_spark.config import DedupConfig  # noqa: E402
from simages_spark.functions.signatures import compute_signatures  # noqa: E402
from simages_spark.operators.bruteforce import bruteforce_jaccard_pairs  # noqa: E402
from simages_spark.operators.lsh import candidate_pairs  # noqa: E402
from simages_spark.operators.simhash_join import simhash_candidates  # noqa: E402
from simages_spark.operators.verify import verify_pairs  # noqa: E402
from simages_spark.session import get_spark  # noqa: E402


def audit(name: str, df, full: bool = False) -> None:
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    # codegen spans only surface as "*(n)" stars in SIMPLE mode on this
    # Spark version (formatted mode drops them entirely)
    simple = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "simple"
    )
    n_exchanges = len(re.findall(r"Exchange ", plan))
    n_codegen = len(set(re.findall(r"\*\((\d+)\)", simple)))
    joins = re.findall(r"(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin|BroadcastNestedLoopJoin|CartesianProduct)", plan)
    pushed = re.findall(r"PushedFilters: \[[^\]]*\]", plan)
    read_schema = re.findall(r"ReadSchema: [^\n]*", plan)
    print(f"\n===== {name} =====")
    print(f"exchanges={n_exchanges} codegen_spans={n_codegen} joins={joins}")
    for p in pushed[:4]:
        print(" ", p)
    for r in read_schema[:4]:
        print(" ", r[:160])
    if full:
        print(plan)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    full = "--full" in sys.argv
    # AQE off for the AUDIT ONLY: with AQE the pre-execution formatted
    # plan is printed before codegen assembly (isFinalPlan=false), so
    # WholeStageCodegen spans are invisible regardless of what will run.
    # Production sessions keep AQE on (session.py).
    spark = get_spark(
        "explain_audit",
        cores=8,
        shuffle_partitions=8,
        extra_conf={"spark.sql.adaptive.enabled": "false"},
    )
    cfg = DedupConfig()
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    sig = compute_signatures(docs, cfg)
    audit("signatures", sig, full)
    audit("lsh_candidates", candidate_pairs(sig, cfg), full)
    audit("simhash_candidates", simhash_candidates(sig, cfg), full)
    audit("verified_edges", verify_pairs(candidate_pairs(sig, cfg), sig, cfg), full)
    audit("bruteforce_pairs", bruteforce_jaccard_pairs(docs, cfg), full)
    # the continuous-crawl probe, in its DEPLOYED shape: signatures and
    # the slim probe index read back from storage (not recomputed), so
    # the plan shows what a batch actually touches — index rows + payload
    # for matched docs only
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from simages_spark.operators.incremental import incremental_dedup_edges
    from simages_spark.operators.sig_index import (
        probe_keys,
        read_probe_index,
        write_probe_index,
        write_probe_index_bucketed,
    )

    tmp = tempfile.mkdtemp(prefix="audit_sigidx_")
    try:
        batch_docs = docs.where(F.pmod("doc_id", F.lit(4)) == 0)
        store_docs = docs.where(F.pmod("doc_id", F.lit(4)) != 0)
        compute_signatures(store_docs, cfg).write.mode("overwrite").parquet(
            f"{tmp}/signatures"
        )
        stored_sig = spark.read.parquet(f"{tmp}/signatures")
        write_probe_index(stored_sig, f"{tmp}/index", cfg)
        audit(
            "incremental_probe_indexed",
            incremental_dedup_edges(
                batch_docs,
                stored_sig,
                cfg,
                existing_index=read_probe_index(spark, f"{tmp}/index"),
            ),
            full,
        )
        # cluster-scale layout: bucketed index table; with the batch side
        # repartitioned to the bucket count the store side needs NO
        # exchange (expect exactly 1 Exchange — the batch side)
        spark.sql("DROP TABLE IF EXISTS audit_probe_index")
        write_probe_index_bucketed(stored_sig, "audit_probe_index", cfg, n_buckets=8)
        nk = probe_keys(compute_signatures(batch_docs, cfg), cfg).repartition(
            8, "pkey"
        )
        # force the big-batch regime (no broadcast) to show the bucketed
        # table's property: the ONLY exchange is the batch side's — the
        # store-side index is read pre-bucketed, never shuffled
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            audit(
                "bucketed_index_join_bigbatch",
                nk.select("pkey", F.col("doc_id").alias("src")).join(
                    spark.table("audit_probe_index").select(
                        "pkey", F.col("doc_id").alias("dst")
                    ),
                    "pkey",
                ),
                full,
            )
        finally:
            spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.sql("DROP TABLE IF EXISTS audit_probe_index")
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    # relational: dimensions must broadcast, facts must not; the TPC-H Q1
    # shape must push the shipdate filter into the scan and prune columns
    from simages_spark.relational import (
        brand_volume,
        pricing_summary,
        region_revenue,
        top_customers,
    )

    lineitem = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    customer = spark.read.parquet(f"{sf_dir}/customer.parquet")
    nation = spark.read.parquet(f"{sf_dir}/nation.parquet")
    region = spark.read.parquet(f"{sf_dir}/region.parquet")
    part = spark.read.parquet(f"{sf_dir}/part.parquet")
    audit("tpch_pricing_summary", pricing_summary(lineitem), full)
    audit(
        "tpch_region_revenue",
        region_revenue(lineitem, orders, customer, nation, region),
        full,
    )
    audit("tpch_top_customers", top_customers(orders, customer, nation), full)
    audit("tpch_brand_volume", brand_volume(lineitem, part), full)

    # column pruning check: a 2-column projection must not read text/html
    audit("pruned_scan", docs.select("doc_id", "lang"), full)

    # URL canonicalization must be a pure map: ZERO exchanges, no joins
    from simages_spark.functions.urls import normalize_url_col

    audit(
        "url_normalize_map",
        docs.select(
            "doc_id", normalize_url_col(F.concat(F.lit("http://h/"), "doc_id"))
        ),
        full,
    )
    # segment-level dedup: the keeper election must be a partial-agg
    # HashAggregate→Exchange→HashAggregate (hot boilerplate keys reduce
    # map-side), NOT a window; the marking join SortMergeJoin
    from simages_spark.operators.line_dedup import line_dup_stats

    audit("line_dup_stats", line_dup_stats(docs), full)
    spark.stop()


if __name__ == "__main__":
    main()
