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
    # the continuous-crawl probe: batch signatures vs the corpus store
    from pyspark.sql import functions as F

    from simages_spark.operators.incremental import incremental_dedup_edges

    audit(
        "incremental_probe",
        incremental_dedup_edges(
            docs.where(F.pmod("doc_id", F.lit(4)) == 0),
            compute_signatures(docs.where(F.pmod("doc_id", F.lit(4)) != 0), cfg),
            cfg,
        ),
        full,
    )
    # column pruning check: a 2-column projection must not read text/html
    audit("pruned_scan", docs.select("doc_id", "lang"), full)
    spark.stop()


if __name__ == "__main__":
    main()
