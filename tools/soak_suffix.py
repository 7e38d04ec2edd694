"""1M-doc soak of the substring-dup (suffix) pass — scale evidence for
the winnowing rewrite (round-1 verdict flagged the old stride=4 design as
the one op whose constants would not survive 100 TB).

Usage: python tools/soak_suffix.py [n_docs] [cores]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from simages_spark.operators.suffix import substring_dup_pairs, suffix_metrics  # noqa: E402
from simages_spark.session import get_spark  # noqa: E402
from simages_spark.sources.corpus import generate_pages, mint_doc_ids  # noqa: E402


def main():
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    cores = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    spark = get_spark("soak_suffix", cores=cores, shuffle_partitions=cores * 2)
    docs = (
        mint_doc_ids(generate_pages(spark, n_docs, seed=42, partitions=cores * 4))
        .select("doc_id", "text")
        .persist()
    )
    print("docs:", docs.count(), flush=True)

    substring_dup_pairs(docs.limit(5000), 64).count()  # JIT warmup
    print("warm", flush=True)

    best = None
    for rep in range(2):
        t0 = time.time()
        n_pairs = substring_dup_pairs(docs, 64).count()
        dt = time.time() - t0
        best = min(best or dt, dt)
        print(f"rep{rep}: {dt:.1f}s  pairs={n_pairs}", flush=True)
    print(f"best: {best:.1f}s = {n_docs / best:,.0f} docs/sec", flush=True)
    m = suffix_metrics(docs, 64).collect()[0].asDict()
    print("suffix_metrics:", m, flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
