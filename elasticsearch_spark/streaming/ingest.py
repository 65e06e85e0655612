"""Streaming index ingestion (Structured Streaming -> segment builds).

The reference's only "streaming" is incremental JSON parsing (SURVEY.md
§2.1 S3) and its ``update_index`` is a stub (B14); this module gives the
engine a real incremental path: a Structured Streaming source over the
webtext input directory feeds ``foreachBatch``, each micro-batch becomes
one checkpointed index segment (same layout as the batch builder), and
``finalize`` merges the segment runs — so streaming and batch builds
produce byte-identical index tables given identical input.

Exactly-once segment semantics come from the pairing of the Spark
streaming checkpoint (offset tracking) with the builder manifest (a
batch that reprocesses after a crash overwrites its own segment
directory idempotently before the manifest records it).
"""

from __future__ import annotations

import os
import time
from typing import Optional

from pyspark.sql import SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..operators.build import IndexBuilder, IndexConfig

INPUT_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("warc_ts", T.TimestampType()),
        T.StructField("html", T.BinaryType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
    ]
)


def stream_build(spark: SparkSession, input_dir: str, index_dir: str,
                 config: IndexConfig = IndexConfig(),
                 checkpoint_dir: Optional[str] = None,
                 max_files_per_trigger: int = 4,
                 finalize: bool = True) -> dict:
    """Consume all currently-available files (``availableNow`` trigger),
    building one segment per micro-batch; optionally finalize (merge)."""
    builder = IndexBuilder(spark, index_dir, config)
    checkpoint_dir = checkpoint_dir or os.path.join(index_dir, "_stream_checkpoint")

    stream = (
        spark.readStream.schema(INPUT_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(input_dir)
    )

    def process_batch(batch_df, batch_id: int):
        manifest = builder._load_manifest()
        seg_name = f"stream_{batch_id:05d}"
        if manifest["segments"].get(seg_name):
            return  # replayed batch after restart: already committed
        # doc ids: dense within batch by url order, offset past all docs
        # committed so far (streaming arrival order defines global ids)
        offset = sum(m["n_docs"] for m in manifest["segments"].values())
        docs = builder.prepare_docs(batch_df.drop("doc_id") if "doc_id" in batch_df.columns else batch_df)
        docs = docs.withColumn("doc_id", F.col("doc_id") + F.lit(offset))
        manifest["segments"][seg_name] = builder.build_segment(seg_name, docs)
        builder._drop_scratch()  # per-batch id scratch must not accumulate
        builder._save_manifest(manifest)

    query = (
        stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()

    manifest = builder._load_manifest()
    if finalize and manifest["segments"] and not manifest.get("finalized"):
        stats = builder.finalize(manifest)
        manifest["finalized"] = True
        manifest["stats"] = {k: stats[k] for k in builder.STATS_KEYS}
        # id high-water mark (stream ids are dense from 0) so the first
        # incremental update needs no O(corpus) max(doc_id) scan
        manifest["next_doc_id"] = sum(
            m["n_docs"] for m in manifest["segments"].values()
        )
        builder._save_manifest(manifest)
    return manifest


def stream_update(spark: SparkSession, input_dir: str, index_dir: str,
                  config: Optional[IndexConfig] = None,
                  checkpoint_dir: Optional[str] = None,
                  max_files_per_trigger: int = 4,
                  compact: object = "auto") -> dict:
    """CONTINUOUS ingestion into an EXISTING index via the O(delta)
    update path: each micro-batch commits as a self-contained delta
    segment (docs + postings + dictionary partial + blocks) and is
    immediately queryable through the live read-time-merged view — no
    final merge step; ``compact`` applies the builder's LSM policy.

    Exactly-once under replay: the Spark streaming checkpoint tracks
    offsets, and the batch-id-derived segment name makes a re-delivered
    micro-batch a no-op (``update_index`` skips committed segments).
    This is the real-time indexing shape: at 10^12 docs a micro-batch
    touches only its own delta tables, never the base index.

    ``config`` defaults to the EXISTING index's stored config
    (``IndexBuilder.open``) — delta segments written under a different
    layout config would be silently dropped from pruned reads, so
    ``update_index`` also validates any explicitly-passed config.
    """
    if config is None:
        try:
            builder = IndexBuilder.open(spark, index_dir)
        except OSError:
            raise ValueError(
                "stream_update requires an existing index; use build()"
                " or stream_build first"
            )
    else:
        builder = IndexBuilder(spark, index_dir, config)
    if not builder._load_manifest()["segments"]:
        raise ValueError("stream_update requires an existing index; use build()"
                         " or stream_build first")
    checkpoint_dir = checkpoint_dir or os.path.join(index_dir, "_stream_upd_checkpoint")

    stream = (
        spark.readStream.schema(INPUT_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(input_dir)
    )

    def process_batch(batch_df, batch_id: int):
        builder.update_index(
            add=batch_df,
            compact=compact,
            segment_name=f"stream_u_{batch_id:05d}",
        )

    query = (
        stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()
    return builder._load_manifest()


def stream_update_multifield(spark: SparkSession, input_dir: str,
                             index_dir: str, schema: T.StructType,
                             checkpoint_dir: Optional[str] = None,
                             max_files_per_trigger: int = 4,
                             compact: object = "auto",
                             transform=None) -> dict:
    """Continuous O(delta) ingestion into an EXISTING multi-field index
    (operators/multifield.py): each micro-batch becomes one delta
    segment in EVERY field sub-index, under one shared batch-derived
    segment name — so a replayed micro-batch is a no-op in every field
    and the fields can never drift apart (a batch that crashed midway
    re-runs; fields that already committed the segment skip it).

    ``schema`` describes the input files (multi-field inputs vary);
    ``transform`` optionally derives field columns (e.g. a title) from
    the raw batch before the update.  Same exactly-once pairing as
    :func:`stream_update`: Spark checkpoint for offsets, manifest
    segment names for idempotent commits."""
    from ..operators.multifield import MultiFieldIndexBuilder

    builder = MultiFieldIndexBuilder.open(spark, index_dir)
    checkpoint_dir = checkpoint_dir or os.path.join(
        index_dir, "_stream_upd_checkpoint"
    )

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(input_dir)
    )

    def process_batch(batch_df, batch_id: int):
        if transform is not None:
            batch_df = transform(batch_df)
        builder.update_index(
            add=batch_df,
            compact=compact,
            segment_name=f"stream_u_{batch_id:05d}",
        )

    query = (
        stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()
    return {"fields": builder.fields}
