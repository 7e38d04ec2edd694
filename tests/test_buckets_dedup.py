"""Pin the round-6 dedup-exchange removals (guide §2.4).

bucket_pairs/bucket_star_edges grew a `dedup` flag so callers that prove
pair uniqueness (or re-dedup downstream) can skip the cross-bucket
dropDuplicates exchange. These tests pin the load-bearing equivalences:

  * dedup=False + a downstream dropDuplicates == dedup=True, including
    when a member pair genuinely co-occurs in several buckets;
  * simhash_candidates(dedup=False) is the same pair set as the default,
    just not yet deduplicated (the pipeline's union dedup subsumes it);
  * exact star edges are identical without the dedup exchange (one sha
    per doc → one bucket per member);
  * the substring matcher still runs the anchor UDF exactly once: its
    physical plan carries the checkpointed-RDD scan and ONLY the
    extension UDF as a MapInPandas node (the regression this pins: an
    un-checkpointed anchors lineage lets column pruning diverge the two
    consumer subtrees and the anchor UDF silently runs twice).
"""

from __future__ import annotations

import io
from contextlib import redirect_stdout

from pyspark.sql import functions as F

from simages_spark.config import DedupConfig
from simages_spark.operators.buckets import bucket_pairs, bucket_star_edges


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_bucket_pairs_dedup_false_plus_drop_equals_default(spark):
    # members 1 and 2 share TWO buckets (10, 11) → a genuine cross-bucket
    # duplicate pair; bucket 12 exercises a larger bucket
    data = [(10, 1), (10, 2), (11, 1), (11, 2), (12, 3), (12, 4), (12, 5)]
    df = spark.createDataFrame(data, "k long, m long")
    a = bucket_pairs(df, ["k"], "m")
    b = bucket_pairs(df, ["k"], "m", dedup=False)
    assert _rows(a) == _rows(b.dropDuplicates(["a", "b"]))
    # and the duplicate really is there pre-dedup (the flag does something)
    assert b.count() == a.count() + 1


def test_bucket_star_edges_dedup_false_identical_when_single_bucket(spark):
    data = [("x", 1), ("x", 2), ("x", 3), ("y", 7), ("y", 9), ("z", 5)]
    df = spark.createDataFrame(data, "k string, m long")
    assert _rows(bucket_star_edges(df, ["k"], "m")) == _rows(
        bucket_star_edges(df, ["k"], "m", dedup=False)
    )


def test_simhash_candidates_dedup_false_same_distinct_set(spark, docs_sf0001):
    from simages_spark.functions.signatures import compute_signatures
    from simages_spark.operators.simhash_join import simhash_candidates

    cfg = DedupConfig()
    sig = compute_signatures(docs_sf0001, cfg)
    dd = simhash_candidates(sig, cfg)
    raw = simhash_candidates(sig, cfg, dedup=False)
    assert _rows(dd) == _rows(raw.dropDuplicates(["src", "dst"]))


def test_lsh_candidates_dedup_false_same_distinct_set(spark, docs_sf0001):
    from simages_spark.functions.signatures import compute_signatures
    from simages_spark.operators.lsh import candidate_pairs

    cfg = DedupConfig()
    sig = compute_signatures(docs_sf0001, cfg)
    dd = candidate_pairs(sig, cfg)
    raw = candidate_pairs(sig, cfg, dedup=False)
    assert _rows(dd) == _rows(raw.dropDuplicates(["src", "dst"]))


def test_substring_plan_runs_anchor_udf_once(spark, docs_sf0001):
    from simages_spark.operators.suffix import substring_dup_pairs

    buf = io.StringIO()
    with redirect_stdout(buf):
        substring_dup_pairs(docs_sf0001, 64).explain("formatted")
    tree = buf.getvalue().split("\n\n")[0]
    # anchors live behind the checkpointed RDD (ExistingRDD scan); the
    # only Python node left in the plan is the extension UDF
    assert tree.count("MapInPandas") == 1, tree
    assert "ExistingRDD" in buf.getvalue(), tree
