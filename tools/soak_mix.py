"""Scale soak for token_budget_mix: the two-phase distributed prefix sum
vs the naive Window.partitionBy(source) plan.

With few sources the window plan funnels every source through ONE task —
its post-shuffle parallelism is min(n_sources, cores) no matter the
cluster size, so per-source volume is bounded by what a single task can
sort and scan. The two-phase path keeps ~n_partitions tasks busy at any
source cardinality. This soak runs both on the same persisted corpus
(interleaved, best-of-N — the repo's timing methodology), asserts the
outputs are LITERALLY equal (exceptAll both ways), and reports the walls
plus each plan's maximum single-task row count — the number that decides
which plan survives a 100× scale-up.

Usage: python tools/soak_mix.py [n_docs] [cores] [n_sources] [reps]
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from simages_spark.functions.shingles import tokens_col  # noqa: E402
from simages_spark.operators.curation import (  # noqa: E402
    sample_key_col,
    token_budget_mix,
)
from simages_spark.session import get_spark  # noqa: E402
from simages_spark.sources.corpus import generate_pages, mint_doc_ids  # noqa: E402


def window_mix(docs, budgets: dict[str, int], default_budget: int = 0):
    """The naive twin: same semantics, single-reducer-per-source plan."""
    base = docs.select(
        "doc_id",
        "source",
        F.coalesce(F.size(tokens_col(F.col("text"))), F.lit(0))
        .cast("long")
        .alias("n_tokens"),
        sample_key_col(F.col("doc_id")).alias("_key"),
    )
    w = (
        Window.partitionBy("source")
        .orderBy("_key", "doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    bud = F.lit(default_budget)
    for s, b in sorted(budgets.items()):
        bud = F.when(F.col("source") == s, F.lit(b)).otherwise(bud)
    return (
        base.withColumn("cum_tokens", F.sum("n_tokens").over(w))
        .where(F.col("cum_tokens") <= bud)
        .select("doc_id", "source", "n_tokens", "cum_tokens")
    )


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    cores = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    n_sources = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    reps = int(sys.argv[4]) if len(sys.argv) > 4 else 3
    spark = get_spark("soak_mix", cores=cores, shuffle_partitions=cores * 2)

    docs = (
        mint_doc_ids(generate_pages(spark, n_docs, seed=42, partitions=cores * 4))
        .select(
            "doc_id",
            "text",
            F.concat(
                F.lit("src"), F.pmod(F.col("doc_id"), n_sources).cast("string")
            ).alias("source"),
        )
        .persist()
    )
    docs.count()
    # budget sized so each source keeps a nontrivial prefix
    budgets = {f"src{i}": 2_000_000 for i in range(n_sources)}

    def run_two() -> int:
        return token_budget_mix(docs, budgets, num_partitions=cores * 2).count()

    def run_win() -> int:
        return window_mix(docs, budgets).count()

    # JIT/codegen warmup on a slice, then interleave timed reps
    warm = docs.limit(50_000).persist()
    warm.count()
    token_budget_mix(warm, budgets, num_partitions=8).count()
    window_mix(warm, budgets).count()
    warm.unpersist()

    t_two, t_win = [], []
    for _ in range(reps):
        t0 = time.time()
        n_two = run_two()
        t_two.append(time.time() - t0)
        t0 = time.time()
        n_win = run_win()
        t_win.append(time.time() - t0)

    # literal output equality, once
    a = token_budget_mix(docs, budgets, num_partitions=cores * 2).persist()
    b = window_mix(docs, budgets).persist()
    mismatch = a.exceptAll(b).count() + b.exceptAll(a).count()

    out = {
        "n_docs": n_docs,
        "cores": cores,
        "n_sources": n_sources,
        "kept_rows": n_two,
        "kept_rows_window": n_win,
        "mismatch_rows": mismatch,
        "two_phase_best_sec": round(min(t_two), 1),
        "window_best_sec": round(min(t_win), 1),
        "two_phase_reps_sec": [round(t, 1) for t in t_two],
        "window_reps_sec": [round(t, 1) for t in t_win],
        # the scale argument: rows the busiest single task must process
        # (window = the largest source, end to end; two-phase = one
        # range partition)
        "window_max_task_rows": n_docs // n_sources,
        "two_phase_max_task_rows": n_docs // (cores * 2),
    }
    print(json.dumps(out))
    assert mismatch == 0 and n_two == n_win


if __name__ == "__main__":
    main()
