"""Export routed snapshots back out as JSONL shards (.json.gz).

The inverse of scones/jsonl.py's ingestion: committed parquet sinks →
per-sink newline-delimited JSON, the format downstream tokenizer /
training-data pipelines commonly consume.  Fully JVM-side
(``base64``/``date_format`` expressions + Spark's native json writer
with gzip codec) — zero Python, and the write parallelism is the scan
parallelism (no shuffle: the data is already partitioned by sink).

Record contract matches :data:`scones.jsonl.JSONL_SCHEMA`, so an
exported shard re-ingests losslessly via ``--mode jsonl`` (round-trip
pinned in tests/test_jsonl.py): ``html_b64`` carries the extracted
payload bytes exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def export_jsonl(
    spark: SparkSession,
    snapshot_dir: str,
    dest_dir: str,
    compression: str = "gzip",
) -> dict:
    """One committed snapshot directory (snapshot_id=N, sink_id=*
    partitions) → ``dest_dir/sink_id=*/part-*.json[.gz]``.

    Returns {"rows": n, "dest": dest_dir}.
    """
    df = spark.read.parquet(snapshot_dir)
    out = df.select(
        "url",
        # fractional seconds included: read_jsonl's to_timestamp accepts
        # them, so truncating here would make the "lossless" round-trip
        # lossy for sub-second warc_ts (round-3 advice)
        F.date_format("warc_ts", "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX").alias("ts"),
        "lang",
        F.base64("extracted").alias("html_b64"),
        "sink_id",
    )
    (
        out.write.mode("overwrite")
        .partitionBy("sink_id")
        .option("compression", compression)
        .json(dest_dir)
    )
    n = spark.read.schema("url string").json(dest_dir).count()
    return {"rows": n, "dest": dest_dir}


def main() -> None:  # pragma: no cover — CLI entry point
    import argparse

    from .session import get_spark

    p = argparse.ArgumentParser(description="export a snapshot to JSONL")
    p.add_argument("--snapshot", required=True, help="snapshot_id=N directory")
    p.add_argument("--dest", required=True)
    p.add_argument("--compression", default="gzip", choices=["gzip", "none"])
    a = p.parse_args()
    spark = get_spark(app_name="scones-export")
    print(export_jsonl(spark, a.snapshot, a.dest, a.compression))


if __name__ == "__main__":  # pragma: no cover
    main()
