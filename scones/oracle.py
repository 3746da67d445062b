"""Single-threaded pure-Python reference oracle (no Spark).

Implements the reference's framing/decoration/routing semantics exactly so
the Spark pipeline can be asserted byte-identical against it:

* framing — split on ``\\n``; the byte position (high-water mark) advances
  by the RAW line length including the newline; trailing ``\\r``/``\\n``
  bytes are stripped from the payload but still counted in the position;
  an over-long raw line (``max_length > 0 and len(raw) > max_length``) is
  dropped AFTER advancing the position (skip-but-advance); a trailing
  partial line with no newline is never emitted and never advances the
  position.  Mirrors /root/reference/file_reader.go:57-93 (split :62,
  position :73, skip :74-77, trim :80) and the golden expectations in
  /root/reference/file_reader_test.go:10-210.
* routing — deterministic hash route: ``crc32(url_utf8) % n_sinks``;
  replaces the reference's racy competing-consumer channel scheduling
  (/root/reference/supervisor.go:65,170-187) with a pure function of row
  content so routed-row set equality is testable.
* aggregation — per-sink (rows, bytes, distinct urls) per (lang, host)
  bucket, the correctness contract from BASELINE.json.
"""

from __future__ import annotations

import zlib
from dataclasses import dataclass, field
from urllib.parse import urlsplit


@dataclass
class FramedDoc:
    """Result of framing one document's raw bytes."""

    lines: list[bytes]  # emitted payload lines, CR/LF-stripped
    hwms: list[int]  # byte position AFTER each emitted line's raw bytes
    position: int  # final high-water mark (incl. skipped long lines)
    skipped: int  # count of over-long lines dropped


def frame_bytes(data: bytes, max_length: int = 0) -> FramedDoc:
    """Frame raw bytes into lines per the reference semantics (see module doc)."""
    lines: list[bytes] = []
    hwms: list[int] = []
    position = 0
    skipped = 0
    start = 0
    while True:
        nl = data.find(b"\n", start)
        if nl < 0:
            break  # partial trailing line: not emitted, position unchanged
        raw_len = nl + 1 - start
        position += raw_len
        if max_length > 0 and raw_len > max_length:
            skipped += 1  # skip-but-advance (file_reader.go:74-77)
        else:
            lines.append(data[start:nl].rstrip(b"\r\n"))
            hwms.append(position)
        start = nl + 1
    return FramedDoc(lines=lines, hwms=hwms, position=position, skipped=skipped)


def extract_text(data: bytes, max_length: int = 0) -> bytes:
    """Extracted text for one document: emitted lines joined by ``\\n``."""
    return b"\n".join(frame_bytes(data, max_length).lines)


def route(url: str, n_sinks: int) -> int:
    """Deterministic sink id for a url: crc32(utf8) mod n_sinks.

    Matches Spark ``pmod(crc32(encode(url,'utf-8')), n_sinks)`` bit-for-bit
    (verified in tests/test_routing.py).
    """
    return zlib.crc32(url.encode("utf-8")) % n_sinks


def host_of(url: str) -> str | None:
    """Hostname of a url — same contract as Spark ``parse_url(url,'HOST')``."""
    return urlsplit(url).hostname


@dataclass
class SinkAggregate:
    rows: int = 0
    bytes: int = 0
    urls: set[str] = field(default_factory=set)


def simulate_pipeline(
    docs: list[dict],
    n_sinks: int,
    max_length: int = 0,
    host_meta: dict[str, dict] | None = None,
) -> dict:
    """Run the whole parse→enrich→route→aggregate loop single-threaded.

    ``docs`` rows need keys url, html(bytes), lang.  Returns::

        {
          "texts":   {url: extracted_bytes},
          "sinks":   {sink_id: set(url)},                  # routed-row sets
          "aggs":    {(sink_id, lang, host): SinkAggregate},
          "enriched":{url: host_category or None},
          "positions": {url: final_hwm},
        }
    """
    host_meta = host_meta or {}
    texts: dict[str, bytes] = {}
    sinks: dict[int, set[str]] = {i: set() for i in range(n_sinks)}
    aggs: dict[tuple, SinkAggregate] = {}
    enriched: dict[str, str | None] = {}
    positions: dict[str, int] = {}

    for doc in docs:
        url = doc["url"]
        framed = frame_bytes(doc["html"], max_length)
        text = b"\n".join(framed.lines)
        texts[url] = text
        positions[url] = framed.position
        host = host_of(url) or ""
        meta = host_meta.get(host)
        enriched[url] = meta["host_category"] if meta else None
        sink = route(url, n_sinks)
        sinks[sink].add(url)
        key = (sink, doc["lang"], host)
        agg = aggs.setdefault(key, SinkAggregate())
        agg.rows += 1
        agg.bytes += len(text)
        agg.urls.add(url)

    return {
        "texts": texts,
        "sinks": sinks,
        "aggs": aggs,
        "enriched": enriched,
        "positions": positions,
    }
