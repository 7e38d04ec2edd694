"""Probe-flatness soak (round-2 verdict item 1 done-criterion): a FIXED
batch probed against signature stores of growing size. With the slim
probe index the per-batch cost must stay ~flat as the store grows —
before round 3 the probe recomputed band keys over the whole store and
unioned its full shingle payload, so it scaled with the corpus.

For each store size: signatures + probe index are WRITTEN to disk (the
deployed shape), the batch's signatures are precomputed/persisted (their
cost is store-size-independent and measured once), then the timed probe
is candidates⋈index → semi-join payload → verify → count. The
`recompute` column times the same probe WITHOUT a stored index (probe
keys re-derived from the store's minhash/simhash columns) — the cost the
index removes.

Usage: python tools/soak_probe_index.py [batch_n] [store sizes ...]
"""

from __future__ import annotations

import json
import shutil
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from simages_spark.config import DedupConfig  # noqa: E402
from simages_spark.functions.signatures import compute_signatures  # noqa: E402
from simages_spark.operators.incremental import incremental_dedup_edges  # noqa: E402
from simages_spark.operators.sig_index import write_probe_index  # noqa: E402
from simages_spark.session import get_spark  # noqa: E402
from simages_spark.sources.corpus import generate_pages, mint_doc_ids  # noqa: E402

ROOT = "/tmp/soak_probe"


def main() -> None:
    batch_n = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    sizes = [int(s) for s in sys.argv[2:]] or [1_000_000, 5_000_000, 10_000_000]
    spark = get_spark("soak_probe_index", cores=32)
    cfg = DedupConfig()
    shutil.rmtree(ROOT, ignore_errors=True)

    # fixed batch: drawn from the same generator id range as the stores
    # (plants exact + near matches), urls suffixed so doc_ids differ
    batch_pages = mint_doc_ids(
        generate_pages(spark, batch_n, seed=42).withColumn(
            "url", F.concat("url", F.lit("#batch"))
        )
    )
    batch_sig = compute_signatures(
        batch_pages.select("doc_id", "text"), cfg
    ).persist()
    t0 = time.time()
    nb = batch_sig.count()
    print(json.dumps({"batch_docs": nb, "batch_sig_sec": round(time.time() - t0, 1)}),
          flush=True)

    results = []
    for n in sizes:
        store_docs = mint_doc_ids(generate_pages(spark, n, seed=42)).select(
            "doc_id", "text"
        )
        sig_path, idx_path = f"{ROOT}/sig_{n}", f"{ROOT}/idx_{n}"
        t0 = time.time()
        compute_signatures(store_docs, cfg).write.mode("overwrite").parquet(sig_path)
        t_build_sig = time.time() - t0
        stored = spark.read.parquet(sig_path)
        t0 = time.time()
        write_probe_index(stored, idx_path, cfg)
        t_build_idx = time.time() - t0

        def probe(existing_index):
            t0 = time.time()
            n_edges = incremental_dedup_edges(
                None,
                stored,
                cfg,
                new_signatures=batch_sig,
                existing_index=existing_index,
            ).count()
            return round(time.time() - t0, 1), n_edges

        # interleaved best-of-3 per path (VM steal + page-cache writeback
        # after the store build would otherwise bias whichever path runs
        # first; see BENCH/BASELINE.md methodology)
        idx = spark.read.parquet(idx_path)
        reps = [(probe(idx), probe(None)) for _ in range(3)]
        t_indexed = min(t for (t, _), _r in reps)
        t_recompute = min(t for _i, (t, _) in reps)
        row = {
            "store_docs": n,
            "probe_indexed_sec": t_indexed,
            "probe_recompute_sec": t_recompute,
            "indexed_reps": [t for (t, _), _r in reps],
            "recompute_reps": [t for _i, (t, _) in reps],
            "n_edges": reps[0][0][1],
            "build_sig_sec": round(t_build_sig, 1),
            "build_idx_sec": round(t_build_idx, 1),
        }
        results.append(row)
        print(json.dumps(row), flush=True)

    base = results[0]["probe_indexed_sec"]
    print(json.dumps({
        "flatness_ratio_last_vs_first": round(
            results[-1]["probe_indexed_sec"] / max(base, 0.1), 2
        ),
        "store_growth": round(results[-1]["store_docs"] / results[0]["store_docs"], 1),
    }), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
