"""Vectorized framing/extraction over ``html: binary`` columns.

This is the Spark-native replacement for the reference's line-framing loop
(/root/reference/file_reader.go:57-93): split raw bytes on ``\\n``, advance
the byte position by the raw line length, skip-but-advance over-long lines
(:74-77), strip trailing CR/LF from the payload (:80), never emit a
trailing partial line.  Semantics are pinned byte-for-byte against
``scones.oracle`` by tests/test_framing_golden.py and tests/test_extract.py.

Implementation: ``DataFrame.mapInArrow`` — data moves JVM→Python as Arrow
record batches; the kernel runs C-speed ``bytes`` operations per document
(split / join / one regex sub), no per-row Python UDF registration and no
per-line Python loop on the fast path (max_length == 0).
"""

from __future__ import annotations

import re
from collections.abc import Iterator

import pyarrow as pa
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Trailing-\r-before-\n collapses to \n: equivalent to per-line
# bytes.TrimRight(line, "\r\n") after splitting on \n (file_reader.go:80).
_CRLF = re.compile(rb"\r+\n")

EXTRACT_COLS = "extracted binary, n_lines bigint, bytes_read bigint, n_skipped bigint"


def _frame_doc(data: bytes, max_length: int) -> tuple[bytes, int, int, int]:
    """Frame one document -> (text, n_lines, bytes_read, n_skipped).

    Fast path (max_length == 0): no per-line work at all — the framed
    region is everything up to the last newline, and per-line CR/LF
    trimming collapses to one regex sub over the region (every line
    boundary is a ``\\n``, so trailing ``\\r+`` before it is exactly the
    per-line TrimRight), plus an rstrip for the region's final line.
    """
    if max_length <= 0:
        end = data.rfind(b"\n") + 1
        if end == 0:
            return b"", 0, 0, 0
        n_lines = data.count(b"\n", 0, end)
        text = _CRLF.sub(b"\n", data[: end - 1]).rstrip(b"\r")
        return text, n_lines, end, 0
    parts = data.split(b"\n")
    tail = parts.pop()  # partial trailing line: not emitted, not counted
    bytes_read = len(data) - len(tail)
    kept = [p for p in parts if len(p) + 1 <= max_length]
    n_skipped = len(parts) - len(kept)
    text = _CRLF.sub(b"\n", b"\n".join(kept)).rstrip(b"\r")
    return text, len(kept), bytes_read, n_skipped


def extract_documents(
    df: DataFrame, max_length: int = 0, html_col: str = "html"
) -> DataFrame:
    """Extract text from ``html_col`` (binary); passthrough all other columns.

    Adds: extracted(binary), extracted_str(string, utf-8 w/ replacement),
    n_lines, bytes_read (final high-water mark), n_skipped.
    The binary ``extracted`` column carries the byte-identical contract;
    ``extracted_str`` is the lossy-decoded convenience for SQL ops.
    """
    passthrough = [f for f in df.schema.fields if f.name != html_col]
    out_schema = ", ".join(
        [f"{f.name} {f.dataType.simpleString()}" for f in passthrough]
        + [EXTRACT_COLS]
    )
    pass_names = [f.name for f in passthrough]

    def run(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in batches:
            html = batch.column(html_col).to_pylist()
            texts: list[bytes] = []
            n_lines: list[int] = []
            bytes_read: list[int] = []
            n_skipped: list[int] = []
            for data in html:
                t, nl, br, sk = _frame_doc(data or b"", max_length)
                texts.append(t)
                n_lines.append(nl)
                bytes_read.append(br)
                n_skipped.append(sk)
            arrays = [batch.column(n) for n in pass_names] + [
                pa.array(texts, pa.binary()),
                pa.array(n_lines, pa.int64()),
                pa.array(bytes_read, pa.int64()),
                pa.array(n_skipped, pa.int64()),
            ]
            yield pa.RecordBatch.from_arrays(
                arrays,
                pass_names + ["extracted", "n_lines", "bytes_read", "n_skipped"],
            )

    out = df.mapInArrow(run, out_schema)
    # Lossy string view decoded JVM-side (keeps the Arrow transfer binary-only;
    # the byte-identical contract lives on `extracted`).
    return out.withColumn("extracted_str", F.col("extracted").cast("string"))


def explode_lines(
    df: DataFrame,
    max_length: int = 0,
    html_col: str = "html",
    key_col: str = "url",
) -> DataFrame:
    """One output row per emitted line with its high-water mark.

    Mirrors the reference's per-line FileData records (file_reader.go:79-85):
    (key, line: binary, hwm: byte position after the raw line).  Used by the
    golden framing tests; the pipeline itself uses :func:`extract_documents`.
    """

    def run(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in batches:
            keys = batch.column(key_col).to_pylist()
            html = batch.column(html_col).to_pylist()
            out_keys: list = []
            out_lines: list[bytes] = []
            out_hwms: list[int] = []
            for key, data in zip(keys, html):
                data = data or b""
                pos = 0
                start = 0
                while True:
                    nl = data.find(b"\n", start)
                    if nl < 0:
                        break
                    raw_len = nl + 1 - start
                    pos += raw_len
                    if not (max_length > 0 and raw_len > max_length):
                        out_keys.append(key)
                        out_lines.append(data[start:nl].rstrip(b"\r\n"))
                        out_hwms.append(pos)
                    start = nl + 1
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(out_keys, pa.string()),
                    pa.array(out_lines, pa.binary()),
                    pa.array(out_hwms, pa.int64()),
                ],
                [key_col, "line", "hwm"],
            )

    return df.mapInArrow(run, f"{key_col} string, line binary, hwm bigint")
