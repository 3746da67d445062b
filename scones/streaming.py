"""Structured Streaming flavor of the pipeline (SURVEY.md §2 O1, §7 step 5).

The reference's continuous tail loop — re-glob every 10-15 s, pick up new
files/bytes, ship, checkpoint (/root/reference/supervisor.go:56,253-282) —
maps onto Spark's file streaming source: each micro-batch discovers new
files, the engine's checkpoint (offset log + file-source seen-files log)
replaces the BoltDB high-water-mark store, and ``availableNow`` gives the
"drain everything then stop" batch-incremental mode the tests use (the
batch lineage table in lineage.py is the other, self-managed flavor).

The transformation plan is the SAME code the batch path uses
(extract → enrich → route) — one definition, two execution modes.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .config import PipelineConfig
from .enrich import enrich_broadcast, with_host
from .extract import extract_documents
from .route import with_sink_id

CORPUS_DDL = "url string, warc_ts timestamp, html binary, text string, lang string"


def stream_source(spark: SparkSession, input_dir: str, max_files: int = 16) -> DataFrame:
    """File-source stream over the corpus directory (≈ glob refresh).

    ``maxFilesPerTrigger`` bounds micro-batch size the way SpoolSize
    bounds the reference's chunks (supervisor.go:46).
    """
    return (
        spark.readStream.schema(CORPUS_DDL)
        .option("maxFilesPerTrigger", max_files)
        .parquet(input_dir)
    )


def build_stream_plan(
    spark: SparkSession, cfg: PipelineConfig, stream: DataFrame
) -> DataFrame:
    df = extract_documents(stream.drop("text"), max_length=cfg.max_length)
    if cfg.host_meta_path:
        host_meta = spark.read.parquet(cfg.host_meta_path)
        df = enrich_broadcast(df, host_meta)
    else:
        df = with_host(df)
    return with_sink_id(df, cfg.n_sinks)


def run_stream_available_now(
    spark: SparkSession, cfg: PipelineConfig, input_dir: str
) -> None:
    """Drain all currently-available files into the routed sinks, then stop.

    Exactly-once delivery to the parquet sinks comes from the streaming
    checkpoint + the file sink's transaction log (_spark_metadata) — the
    engine-managed analogue of our batch write-audit-publish protocol.
    """
    routed = build_stream_plan(spark, cfg, stream_source(spark, input_dir))
    q = (
        routed.drop("html", "extracted_str")
        .writeStream.format("parquet")
        .option("path", cfg.output_dir)
        .option("checkpointLocation", os.path.join(cfg.checkpoint_dir, "stream"))
        .partitionBy("sink_id")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def windowed_host_counts(
    stream: DataFrame, window: str = "1 hour", watermark: str = "2 hours"
) -> DataFrame:
    """Event-time windowed per-host counts with late-data handling.

    Watermark on ``warc_ts`` bounds state (late web-page records beyond
    the watermark are dropped) — the streaming analogue of the
    statistics endpoint's per-file live counters (statistics.go:34-75).
    """
    return (
        with_host(stream)
        .withWatermark("warc_ts", watermark)
        .groupBy(F.window("warc_ts", window).alias("win"), "host")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(F.octet_length("html")).alias("n_bytes"),
        )
    )
