"""Connected-components soak at edge scale with adversarial topology.

The corpus soaks exercise CC only on near-dup-sized edge sets; at 100 TB
the edge table is corpus-sized and the iterative round count is set by
component DIAMETER. This soak builds a synthetic edge table directly
(pure column exprs, no UDF) mixing the worst shapes:

  - chains of length `chain_len` (diameter = chain_len → the large-star/
    small-star round count is the log² worst case)
  - stars of the same size (diameter 2 — the common dedup shape)
  - per-component golden check: every chain/star must collapse to ONE
    label, count verified exactly.

Usage: python tools/soak_cc.py [n_edges] [chain_len] [cores]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from simages_spark.config import DedupConfig  # noqa: E402
from simages_spark.operators.connected_components import connected_components  # noqa: E402
from simages_spark.session import get_spark  # noqa: E402


def main():
    n_edges = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000_000
    chain_len = int(sys.argv[2]) if len(sys.argv) > 2 else 1000
    cores = int(sys.argv[3]) if len(sys.argv) > 3 else 32
    spark = get_spark("soak_cc", cores=cores, shuffle_partitions=cores * 2)
    cfg = DedupConfig(cc_max_rounds=100)

    half = n_edges // 2
    # chains: node ids [0, half); edge (i, i+1) unless i ends a chain
    chains = (
        spark.range(0, half, 1, cores * 4)
        .where(F.col("id") % chain_len != chain_len - 1)
        .select(F.col("id").alias("src"), (F.col("id") + 1).alias("dst"))
    )
    # stars: node ids [10^12, 10^12 + half); hub = block start
    base = 1_000_000_000_000
    stars = (
        spark.range(0, half, 1, cores * 4)
        .where(F.col("id") % chain_len != 0)
        .select(
            (F.lit(base) + (F.col("id") / chain_len).cast("long") * chain_len
             ).alias("src"),
            (F.lit(base) + F.col("id")).alias("dst"),
        )
    )
    edges = chains.unionByName(stars).persist()
    n = edges.count()
    n_chain_comps = (half + chain_len - 1) // chain_len
    n_star_comps = (half + chain_len - 1) // chain_len
    print(f"edges: {n:,} (chains of {chain_len} + stars of {chain_len})", flush=True)

    t0 = time.time()
    rounds: list = []
    clusters = connected_components(edges, cfg, round_metrics=rounds).persist()
    n_labels = clusters.select("cluster_id").distinct().count()
    dt = time.time() - t0
    print(
        f"cc: {dt:.1f}s  components={n_labels:,} rounds={len(rounds)} "
        f"({n / dt:,.0f} edges/sec)  edge counts per round: "
        f"{[r[1] for r in rounds]}",
        flush=True,
    )
    expected = n_chain_comps + n_star_comps
    assert n_labels == expected, f"expected {expected} components, got {n_labels}"
    # golden: every chain label = its block start; every star label = hub
    bad = clusters.where(
        ((F.col("doc_id") < base)
         & (F.col("cluster_id") != (F.col("doc_id") / chain_len).cast("long") * chain_len))
        | ((F.col("doc_id") >= base)
           & (F.col("cluster_id")
              != (F.lit(base) + ((F.col("doc_id") - base) / chain_len).cast("long") * chain_len)))
    ).count()
    assert bad == 0, f"{bad} mislabeled nodes"
    print("OK: exact component labels at every node", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
