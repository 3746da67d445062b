"""Simplified WARC ingestion: Common-Crawl-style record containers →
the pipeline's documents shape (url, warc_ts, html, lang=null).

Real Common Crawl ships WARC: concatenated records, each a header block
(``WARC/1.0`` + colon headers, CRLF line endings, terminated by an empty
line) followed by exactly ``Content-Length`` body bytes and a blank-line
separator.  This module parses that envelope (the subset we emit:
WARC-Target-URI, WARC-Date, Content-Length) with a mapInArrow kernel —
Content-Length-driven slicing, so bodies may contain ANY bytes including
CRLFs and header-lookalikes.

Not a port of any WARC library; the envelope grammar is from the public
WARC/1.0 spec (ISO 28500) simplified to the fields we need.

Scale note: like tailsource, one file = one binaryFile row; WARC shards
are conventionally ~1 GB, and parallelism comes from the shard count
(Common Crawl publishes ~64k shards per snapshot).
"""

from __future__ import annotations

from collections.abc import Iterator
from datetime import datetime, timezone

import pyarrow as pa
from pyspark.sql import DataFrame, SparkSession

WARC_DOC_DDL = (
    "url string, warc_ts timestamp, html binary, lang string, "
    "src_file string, record_offset bigint"
)


def write_warc(path: str, records: list[dict]) -> None:
    """Deterministic simplified-WARC writer (tests/corpus only).

    ``records``: dicts with url (str), warc_ts (datetime), html (bytes).
    """
    with open(path, "wb") as f:
        for r in records:
            ts = r["warc_ts"].strftime("%Y-%m-%dT%H:%M:%SZ")
            body = r["html"]
            f.write(b"WARC/1.0\r\n")
            f.write(b"WARC-Type: response\r\n")
            f.write(f"WARC-Target-URI: {r['url']}\r\n".encode())
            f.write(f"WARC-Date: {ts}\r\n".encode())
            f.write(f"Content-Length: {len(body)}\r\n".encode())
            f.write(b"\r\n")
            f.write(body)
            f.write(b"\r\n\r\n")


def parse_warc_bytes(data: bytes, src_file: str = "") -> list[dict]:
    """Parse one WARC shard's bytes → record dicts (pure function; the
    Spark kernel and the tests share it)."""
    out = []
    pos = 0
    n = len(data)
    while pos < n:
        # skip inter-record padding
        while pos < n and data[pos : pos + 1] in (b"\r", b"\n"):
            pos += 1
        if pos >= n:
            break
        record_offset = pos
        head_end = data.find(b"\r\n\r\n", pos)
        if head_end < 0:
            break  # truncated trailing record: not emitted
        header = data[pos:head_end].decode("utf-8", errors="replace")
        lines = header.split("\r\n")
        if not lines or not lines[0].startswith("WARC/"):
            break
        fields = {}
        for line in lines[1:]:
            k, _, v = line.partition(":")
            fields[k.strip().lower()] = v.strip()
        try:
            length = int(fields.get("content-length", ""))
        except ValueError:
            break
        body_start = head_end + 4
        if body_start + length > n:
            break  # truncated body: not emitted
        body = data[body_start : body_start + length]
        ts_raw = fields.get("warc-date", "")
        try:
            ts = datetime.strptime(ts_raw, "%Y-%m-%dT%H:%M:%SZ").replace(
                tzinfo=timezone.utc
            )
        except ValueError:
            ts = None
        out.append(
            {
                "url": fields.get("warc-target-uri"),
                "warc_ts": ts,
                "html": body,
                "lang": None,
                "src_file": src_file,
                "record_offset": record_offset,
            }
        )
        pos = body_start + length
    return out


def read_warc(spark: SparkSession, glob: str) -> DataFrame:
    """WARC shards → documents DataFrame (mapInArrow over binaryFile)."""
    from .lineage import normalize_path

    def run(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in batches:
            paths = batch.column("path").to_pylist()
            contents = batch.column("content").to_pylist()
            rows: list[dict] = []
            for path, content in zip(paths, contents):
                rows.extend(
                    parse_warc_bytes(bytes(content), normalize_path(path))
                )
            yield pa.RecordBatch.from_pylist(
                rows,
                schema=pa.schema(
                    [
                        ("url", pa.string()),
                        ("warc_ts", pa.timestamp("us", tz="UTC")),
                        ("html", pa.binary()),
                        ("lang", pa.string()),
                        ("src_file", pa.string()),
                        ("record_offset", pa.int64()),
                    ]
                ),
            )

    raw = spark.read.format("binaryFile").load(glob).select("path", "content")
    return raw.mapInArrow(run, WARC_DOC_DDL)
