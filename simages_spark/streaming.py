"""Structured Streaming incremental ingest + signature maintenance.

The reference's batch pipeline is resumable-batch by design (SURVEY.md
§2.6 keeps streaming out of core scope), but the incremental-add workflow
(`simages add`, reference: src/simages/duplicate_finder.py:130-139) has a
natural streaming form: new corpus files land in a directory, signatures
are computed per micro-batch and appended to the signatures store, and
the batch dedup stages (candidates → verify → CC) run on the maintained
table whenever wanted.

The file source gives exactly-once per-file semantics (checkpointed file
tracking = the anti-join's dedup role), and the signature UDF is
stateless, so the stream is just scan → mapInPandas → sink.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql.streaming import StreamingQuery

from simages_spark.config import DedupConfig
from simages_spark.functions.signatures import compute_signatures

DOCS_SCHEMA = "doc_id long, text string, lang string, source string, n_chars long"


def stream_signatures(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    cfg: DedupConfig | None = None,
    schema: str = DOCS_SCHEMA,
) -> StreamingQuery:
    """Watch `input_dir` for new parquet files; append signatures to
    `output_dir`. Restart-safe via `checkpoint_dir` (processed-file log)."""
    cfg = cfg or DedupConfig()
    incoming = spark.readStream.schema(schema).parquet(input_dir)
    signatures = compute_signatures(incoming, cfg)
    return (
        signatures.writeStream.format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
