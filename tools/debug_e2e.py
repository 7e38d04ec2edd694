"""Pin down where q_e2e_dedup time goes at sf0.1 (bench regression hunt)."""
import sys, time
sys.path.insert(0, "/root/repo")
from simages_spark.config import DedupConfig
from simages_spark.pipeline import find_duplicates, build_signatures, build_candidates
from simages_spark.operators.verify import verify_pairs
from simages_spark.operators.connected_components import connected_components
from simages_spark.session import get_spark

spark = get_spark("debug_e2e", cores=32, shuffle_partitions=32)
cfg = DedupConfig()
docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet").repartition(32).persist()
docs.count()

# warmup
find_duplicates(docs.limit(1000), cfg).clusters.count()
print("warm", flush=True)

for rep in range(2):
    t0 = time.time()
    sig = build_signatures(docs, cfg).persist()
    n = sig.count()
    t1 = time.time()
    cand = build_candidates(docs, sig, cfg)
    nc = cand.count()
    t2 = time.time()
    edges = verify_pairs(cand, sig, cfg).persist()
    ne = edges.count()
    t3 = time.time()
    ncl = connected_components(edges, cfg).count()
    t4 = time.time()
    print(f"rep{rep}: sig {t1-t0:.1f}s cand {t2-t1:.1f}s verify {t3-t2:.1f}s cc {t4-t3:.1f}s  total {t4-t0:.1f}s", flush=True)
    sig.unpersist(); edges.unpersist()

# now the packaged path
for rep in range(2):
    t0 = time.time()
    r = find_duplicates(docs, cfg)
    n = r.clusters.count()
    print(f"find_duplicates rep{rep}: {time.time()-t0:.1f}s", flush=True)
spark.stop()
