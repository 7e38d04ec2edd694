"""Unit tests: LSH banding, simhash join, exact layer, joins, top-k, suffix."""

from __future__ import annotations

from pyspark.sql import functions as F

from simages_spark.config import DedupConfig
from simages_spark.operators.exact import (
    exact_dup_edges,
    exact_dup_groups,
    source_dup_stats,
)
from simages_spark.operators.joins import anti_join_new, enrich_pairs, semi_join_lookup
from simages_spark.operators.lsh import band_keys, candidate_pairs, lsh_metrics
from simages_spark.operators.simhash_join import simhash_candidates
from simages_spark.operators.suffix import substring_dup_pairs
from simages_spark.functions.signatures import compute_signatures
from simages_spark.operators.verify import top_k_pairs, verify_pairs

CFG = DedupConfig()


def _docs(spark, rows):
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_band_keys_shape(spark):
    docs = _docs(spark, [(1, "a b c d e f g h i j"), (2, "k l m n o p q r s t")])
    sig = compute_signatures(docs, CFG)
    bk = band_keys(sig, CFG)
    rows = bk.collect()
    assert len(rows) == 2 * 16
    # identical docs → identical band keys; different docs → (w.h.p.) different
    per_doc = {}
    for r in rows:
        per_doc.setdefault(r["doc_id"], set()).add((r["band"], r["band_key"]))
    assert len(per_doc[1] & per_doc[2]) == 0


def test_exact_copy_always_candidate(spark):
    text = "the quick brown fox jumps over the lazy dog again and again"
    docs = _docs(spark, [(1, text), (2, text), (3, "totally different words here")])
    sig = compute_signatures(docs, CFG)
    cands = {(r["src"], r["dst"]) for r in candidate_pairs(sig, CFG).collect()}
    assert (1, 2) in cands
    assert (1, 3) not in cands and (2, 3) not in cands


def test_verify_exact_jaccard(spark):
    docs = _docs(spark, [(1, "a b c d e f"), (2, "a b c d e g")])
    sig = compute_signatures(docs, CFG)
    cands = spark.createDataFrame([(1, 2)], ["src", "dst"])
    edges = verify_pairs(cands, sig, CFG, keep_below_threshold=True).collect()
    # shingles doc1: {a b c d e, b c d e f}; doc2: {a b c d e, b c d e g}
    # jaccard = 1/3
    assert len(edges) == 1
    assert abs(edges[0]["jaccard"] - 1 / 3) < 1e-12


def test_simhash_candidates_for_exact_copy(spark):
    text = "x y z w v u t s r q p o n m l k"
    docs = _docs(spark, [(1, text), (2, text)])
    sig = compute_signatures(docs, CFG)
    got = {(r["src"], r["dst"]) for r in simhash_candidates(sig, CFG).collect()}
    assert got == {(1, 2)}


def test_simhash_hamming_guarantee(spark):
    """Pigeonhole: any pair within Hamming d=3 MUST be a candidate,
    regardless of which bits differ; pairs beyond d must be filtered."""
    base = 0x123456789ABCDEF0
    rows = [
        (1, base),
        (2, base ^ 0b111),                      # 3 low bits
        (3, base ^ (1 << 63) ^ (1 << 31) ^ 1),  # 3 spread bits
        (4, base ^ ((1 << 4) - 1)),             # 4 bits → excluded
        (5, base ^ ((1 << 60) | (1 << 61))),    # 2 high bits
    ]
    sig = spark.createDataFrame(
        [(d, s - (1 << 64) if s >= 1 << 63 else s, 5) for d, s in rows],
        "doc_id long, simhash long, num_shingles int",
    )
    got = {(r["src"], r["dst"]) for r in simhash_candidates(sig, CFG).collect()}
    assert {(1, 2), (1, 3), (1, 5)} <= got
    assert not any({a, b} == {1, 4} for a, b in got)


def test_exact_dup_layer(spark):
    docs = _docs(spark, [(1, "same text"), (2, "same text"), (3, "other")])
    groups = exact_dup_groups(docs).collect()
    assert len(groups) == 1 and groups[0]["total"] == 2
    edges = exact_dup_edges(docs).collect()
    assert [(e["src"], e["dst"], e["jaccard"]) for e in edges] == [(1, 2, 1.0)]


def test_source_dup_stats(spark):
    """Redundancy is attributed to the NON-keeper doc's source: the keeper
    (min doc_id corpus-wide) is never counted, even when its copies live
    in other sources."""
    docs = spark.createDataFrame(
        [
            (1, "same text", "a"),   # keeper of "same text"
            (2, "same text", "b"),   # redundant, charged to b
            (3, "same text", "b"),   # redundant, charged to b
            (4, "other", "a"),       # unique
            (5, None, "c"),          # NULL text: counted, never redundant
            (6, None, "c"),
            (7, "  ", "c"),          # whitespace-only: same — the dedup
            (8, "  ", "c"),          # policy never deletes empty docs
        ],
        ["doc_id", "text", "source"],
    )
    got = {r["source"]: r for r in source_dup_stats(docs).collect()}
    assert got["a"]["n_docs"] == 2 and got["a"]["n_dup_docs"] == 0
    assert got["b"]["n_docs"] == 2 and got["b"]["n_dup_docs"] == 2
    assert got["b"]["dup_ratio"] == 1.0 and got["a"]["dup_ratio"] == 0.0
    assert got["c"]["n_docs"] == 4 and got["c"]["n_dup_docs"] == 0


def test_salting_caps_hot_bucket(spark):
    """100 identical docs → one hot LSH bucket; with max_bucket_size below
    100 the salt splits it and pair count drops below C(100,2), while
    metrics surface the split (no silent caps)."""
    cfg = DedupConfig(max_bucket_size=10, bucket_salt=4)
    docs = _docs(spark, [(i, "w x y z a b c d e f g h") for i in range(100)])
    sig = compute_signatures(docs, cfg)
    n_pairs = candidate_pairs(sig, cfg).count()
    assert 0 < n_pairs < 100 * 99 // 2
    # worst case is absolutely bounded: nsalt * C(cap, 2) per bucket
    assert n_pairs <= cfg.bucket_salt * cfg.max_bucket_size * (cfg.max_bucket_size - 1) // 2
    m = lsh_metrics(sig, cfg).collect()[0]
    assert m["n_salted_buckets"] > 0
    assert m["max_bucket_n"] == 100
    # 4 salt classes of ~25 docs each, sliced to 10 → truncation surfaced
    assert m["n_truncated_buckets"] > 0
    assert m["n_truncated_members"] > 0


def test_anti_semi_enrich_joins(spark):
    docs = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (3, "c", 30)], ["doc_id", "text", "n_chars"]
    )
    known = spark.createDataFrame([(1,)], ["doc_id"])
    assert {r["doc_id"] for r in anti_join_new(docs, known, "doc_id").collect()} == {2, 3}
    assert {r["doc_id"] for r in semi_join_lookup(docs, known, "doc_id").collect()} == {1}
    edges = spark.createDataFrame([(1, 2, 0.9), (1, 99, 0.8)], ["src", "dst", "jaccard"])
    enriched = enrich_pairs(edges, docs, ["n_chars"]).collect()
    # pair with missing member (99) dropped — reference drop-if-missing
    assert len(enriched) == 1
    assert enriched[0]["src_n_chars"] == 10 and enriched[0]["dst_n_chars"] == 20


def test_top_k(spark):
    edges = spark.createDataFrame(
        [(1, 2, 0.5), (3, 4, 0.9), (5, 6, 0.7)], ["src", "dst", "jaccard"]
    )
    got = [(r["src"], r["dst"]) for r in top_k_pairs(edges, 2).collect()]
    assert got == [(3, 4), (5, 6)]


def test_substring_pairs(spark):
    shared = " ".join(f"tok{i}" for i in range(40))  # ~240 chars verbatim
    docs = _docs(
        spark,
        [
            (1, "alpha beta " + shared + " gamma"),
            (2, "delta " + shared + " epsilon zeta"),
            (3, "completely unrelated content " * 10),
        ],
    )
    rows = substring_dup_pairs(docs, 64).collect()
    pairs = {(r["src"], r["dst"]) for r in rows}
    assert (1, 2) in pairs
    assert not any(3 in p for p in pairs)
    # run_len reports the true maximal shared run (which can extend past
    # the planted block: "beta|delta " share a trailing "ta ", and both
    # suffixes start with " ")
    run = {(r["src"], r["dst"]): r["run_len"] for r in rows}[(1, 2)]
    assert run >= len(shared)


def test_substring_exact_semantics_boundary(spark):
    """The winnowing+extension pass is EXACT: a shared run of exactly
    min_len chars is found; min_len-1 is not (for any alignment)."""
    import numpy as np

    rng = np.random.default_rng(3)

    def rand_text(n):
        return "".join(chr(97 + c) for c in rng.integers(0, 26, n))

    shared64 = rand_text(64)
    shared63 = rand_text(63)
    docs = _docs(
        spark,
        [
            (1, rand_text(100) + shared64 + rand_text(90)),
            (2, rand_text(80) + shared64 + rand_text(110)),
            (3, rand_text(100) + shared63 + rand_text(90)),
            (4, rand_text(80) + shared63 + rand_text(110)),
        ],
    )
    pairs = {(r["src"], r["dst"]) for r in substring_dup_pairs(docs, 64).collect()}
    assert (1, 2) in pairs
    assert (3, 4) not in pairs


def test_substring_bruteforce_oracle(spark):
    """Operator output == brute-force 64-char-window self-join (the same
    oracle shape the driver runs in DuckDB), on a corpus with planted
    runs at several lengths and a repeated-within-doc block."""
    import numpy as np

    rng = np.random.default_rng(11)

    def rand_text(n):
        return "".join(chr(97 + c) for c in rng.integers(0, 26, n))

    runs = {L: rand_text(L) for L in (50, 64, 70, 128, 200)}
    boiler = rand_text(30)
    rows, did = [], 0
    for L, s in runs.items():
        for _ in range(2):
            rows.append((did, rand_text(60) + s + rand_text(60)))
            did += 1
    rows.append((did, boiler * 4 + rand_text(40)))  # within-doc repeats
    rows.append((did + 1, rand_text(40) + boiler * 4))
    docs = _docs(spark, rows)

    got = {(r["src"], r["dst"]) for r in substring_dup_pairs(docs, 64).collect()}

    texts = dict(rows)
    expected = set()
    for a in texts:
        for b in texts:
            if a < b:
                wa = {texts[a][i : i + 64] for i in range(len(texts[a]) - 63)}
                if any(
                    texts[b][i : i + 64] in wa
                    for i in range(len(texts[b]) - 63)
                ):
                    expected.add((a, b))
    assert got == expected

def test_incremental_dedup_edges(spark):
    """New batch probed against an existing corpus' signatures: exact
    copies and near-dups of existing docs surface with exact jaccard;
    unrelated new docs and within-batch pairs do not."""
    from simages_spark.operators.incremental import incremental_dedup_edges

    base = " ".join(f"word{i}" for i in range(40))
    near = " ".join(("CHANGED" if i == 20 else f"word{i}") for i in range(40))
    existing = _docs(spark, [(1, base), (2, "totally different page about nothing")])
    new = _docs(spark, [(10, base), (11, near), (12, "another unrelated new doc"),
                        (13, "another unrelated new doc")])
    existing_sig = compute_signatures(existing, CFG)
    edges = {(r["src"], r["dst"]): r["jaccard"]
             for r in incremental_dedup_edges(new, existing_sig, CFG).collect()}
    assert edges[(10, 1)] == 1.0
    assert 0.7 < edges[(11, 1)] < 0.8
    # no unrelated-pair edges, and 12/13 (within-batch dup) NOT reported
    assert set(edges) == {(10, 1), (11, 1)}


def test_decode_image_codec_autodetect():
    """Real decode when a codec is importable; declared NotImplementedError
    otherwise; the fake stub works either way (plumbing fixture)."""
    import numpy as np
    import pytest

    from simages_spark.functions.multimodal import codec_available, decode_image

    stub = decode_image(b"some bytes", fake=True)
    assert stub.shape == (8, 8, 3) and stub.dtype == np.uint8
    if codec_available():
        import io

        from PIL import Image

        buf = io.BytesIO()
        Image.new("RGB", (4, 3), (10, 20, 30)).save(buf, format="PNG")
        arr = decode_image(buf.getvalue())
        assert arr.shape == (3, 4, 3) and arr[0, 0, 0] == 10
    else:
        with pytest.raises(NotImplementedError):
            decode_image(b"\x89PNG....")


def test_ivf_knn_hot_list_cap(spark):
    """With max_list_size=1 every inverted list keeps only its lowest
    vec_id, so no query can see a corpus-sized candidate list even under
    a degenerate codebook; uncapped output is unchanged for normal data."""
    import numpy as np

    from simages_spark.operators.ivf import ivf_knn

    rng = np.random.default_rng(3)
    rows = [(i, [float(x) for x in rng.normal(size=8)]) for i in range(40)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    q = emb.where("vec_id % 10 = 0")
    capped = ivf_knn(q, emb, k=5, n_cells=4, nprobe=2, max_list_size=1)
    per_q = {}
    for r in capped.collect():
        per_q.setdefault(r["q_id"], []).append(r["vec_id"])
    # at most nprobe cells x 1 member per list = 2 candidates per query
    assert all(len(v) <= 2 for v in per_q.values())
    full = ivf_knn(q, emb, k=5, n_cells=4, nprobe=2)
    default_cap = ivf_knn(q, emb, k=5, n_cells=4, nprobe=2, max_list_size=4096)
    key = lambda df: {(r["q_id"], r["vec_id"], r["rank"]) for r in df.collect()}
    assert key(full) == key(default_cap)


def test_ivf_trained_codebook_deterministic_and_better(spark):
    """Lloyd-trained codebook: bit-identical across runs (integer-sum
    updates are partition-order-independent), differs from the lowest-id
    init, and recall@k vs exact brute force is at least as good at every
    nprobe (strictly better overall on the clustered test embeddings)."""
    import numpy as np

    from simages_spark.operators.ivf import (
        ivf_centroids,
        ivf_centroids_trained,
        ivf_knn,
        knn_bruteforce,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    cb_a = ivf_centroids_trained(emb, 8, n_iters=3)
    cb_b = ivf_centroids_trained(
        emb.repartition(7), 8, n_iters=3  # different partitioning
    )
    assert np.array_equal(cb_a, cb_b)  # deterministic incl. shuffle order
    naive = ivf_centroids(emb, 8)
    assert cb_a.shape == naive.shape and not np.array_equal(cb_a, naive)

    truth = knn_bruteforce(emb, emb, k=5).select("q_id", "vec_id").persist()
    n_truth = truth.count()

    def recall(cb, nprobe):
        approx = ivf_knn(emb, emb, k=5, n_cells=8, nprobe=nprobe, centroids=cb)
        return (
            approx.select("q_id", "vec_id").intersect(truth).count() / n_truth
        )

    totals = {"naive": 0.0, "trained": 0.0}
    for nprobe in (1, 2, 4):
        r_n, r_t = recall(naive, nprobe), recall(cb_a, nprobe)
        assert r_t >= r_n, f"nprobe={nprobe}: trained {r_t} < naive {r_n}"
        totals["naive"] += r_n
        totals["trained"] += r_t
    assert totals["trained"] > totals["naive"]
    truth.unpersist()


def test_verify_payload_side_never_broadcast(spark):
    """The verify joins' shingle-payload side must be sort-merge, never
    broadcast: Catalyst prices an array<long> at ArrayType.defaultSize
    (bytes), so an UNMATERIALIZED in-memory signatures chain looks
    broadcastable at any corpus size — at 10M docs the auto-broadcast of
    the ~5 GB payload side blew spark.driver.maxResultSize. The
    hint("merge") in _jaccard_edges pins the spillable strategy the join
    wants at target scale (AQE skew-split applies to SMJ)."""
    import re

    from simages_spark.pipeline import find_duplicates
    from simages_spark.sources.corpus import generate_pages, mint_doc_ids

    docs = mint_doc_ids(generate_pages(spark, 2000, seed=42)).select(
        "doc_id", "text"
    )  # mapInPandas chain: no parquet footer, no materialized cache
    res = find_duplicates(docs, CFG)
    res.edges.count()
    plan = res.edges._jdf.queryExecution().executedPlan().toString()
    assert not re.search(r"BroadcastHashJoin[^\n]*h_(src|dst)", plan), plan
    assert re.search(r"SortMergeJoin", plan)
    res.signatures.unpersist()
    res.edges.unpersist()
