"""Deterministic synthetic Common-Crawl-style corpus generator.

Generates the exact input shape from BASELINE.json's ``input_hint``:
``url:string, warc_ts:timestamp, html:binary, text:string, lang:string``
plus the small ``host_meta`` broadcast dimension (FIXTURES.md §2).

Properties required by FIXTURES.md §1 (all seeded, no external data):
  * urls unique; host distribution Zipfian with one hot host taking ≥20%
    of rows (exercises skew salting);
  * html bytes mix ``\\n`` and ``\\r\\n`` line endings, trailing partial
    lines, over-long lines, UTF-8 multibyte text, and raw binary noise —
    driving the framing golden cases ported from
    /root/reference/file_reader_test.go;
  * ``text`` column is the expected extraction (computed with the same
    pure-Python oracle the tests assert against, max_length unlimited).

Written as N parquet files so the lineage/resume machinery has multiple
``src_file`` units to checkpoint (≈ the reference tailing multiple log
files, /root/reference/supervisor.go:253-282).
"""

from __future__ import annotations

import os
import random
from datetime import datetime, timedelta, timezone

import pyarrow as pa
import pyarrow.parquet as pq

from .oracle import extract_text

LANGS = ["en", "en", "en", "en", "es", "zh", "de", "fr", "ru", "ja", "pt"]

# One hot host (Zipf head) + a long tail.  hot.example.org must take ≥20%.
HOSTS = (
    ["hot.example.org"] * 25
    + ["news.example.com"] * 10
    + ["blog.example.net"] * 6
    + [f"site{i}.example.io" for i in range(59)]
)

WORDS = (
    "the quick brown fox jumps over lazy dog web page crawl data index "
    "search token parse html body header link image script style text "
    "información naïve café 北京 東京 привет мир ação"
).split()


def _make_html(rng: random.Random, doc_id: int) -> bytes:
    """Build one document's raw bytes with all framing edge cases."""
    parts: list[bytes] = []
    n_lines = rng.randint(3, 20)
    for i in range(n_lines):
        kind = rng.random()
        if kind < 0.05:
            # binary noise line (no interior newlines)
            body = bytes(rng.randrange(1, 256) for _ in range(rng.randint(4, 40)))
            body = body.replace(b"\n", b"\x01").replace(b"\r", b"\x02")
        elif kind < 0.10:
            # over-long line (> default max_length used in skew tests)
            body = (" ".join(rng.choices(WORDS, k=400))).encode("utf-8")
        else:
            body = (" ".join(rng.choices(WORDS, k=rng.randint(2, 12)))).encode(
                "utf-8"
            )
        ending = b"\r\n" if rng.random() < 0.25 else b"\n"
        parts.append(body + ending)
    if rng.random() < 0.3:
        parts.append(b"partial tail " + str(doc_id).encode())  # no newline
    return b"".join(parts)


def generate_rows(n_docs: int, seed: int = 42) -> list[dict]:
    """Deterministic corpus rows (url, warc_ts, html, text, lang)."""
    rng = random.Random(seed)
    base_ts = datetime(2024, 5, 1, tzinfo=timezone.utc)
    rows = []
    for i in range(n_docs):
        host = rng.choice(HOSTS)
        url = f"https://{host}/c{seed}/page/{i}"  # seed-namespaced: urls unique across corpora
        html = _make_html(rng, i)
        rows.append(
            {
                "url": url,
                "warc_ts": base_ts + timedelta(seconds=rng.randint(0, 86400 * 5)),
                "html": html,
                "text": extract_text(html).decode("utf-8", errors="replace"),
                "lang": rng.choice(LANGS),
            }
        )
    return rows


CORPUS_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("warc_ts", pa.timestamp("us", tz="UTC")),
        ("html", pa.binary()),
        ("text", pa.string()),
        ("lang", pa.string()),
    ]
)


def write_corpus(
    out_dir: str, n_docs: int, n_files: int = 4, seed: int = 42
) -> list[str]:
    """Write the corpus as ``n_files`` parquet files; returns file paths."""
    os.makedirs(out_dir, exist_ok=True)
    rows = generate_rows(n_docs, seed)
    paths = []
    per = (len(rows) + n_files - 1) // n_files
    for f in range(n_files):
        chunk = rows[f * per : (f + 1) * per]
        if not chunk:
            break
        table = pa.Table.from_pylist(chunk, schema=CORPUS_SCHEMA)
        path = os.path.join(out_dir, f"docs_{f:04d}.parquet")
        pq.write_table(table, path, compression="zstd")
        paths.append(path)
    return paths


def _write_shard(args: tuple) -> str:
    out_dir, f, n, seed = args
    rows = generate_rows(n, seed=seed * 1000 + f)
    table = pa.Table.from_pylist(rows, schema=CORPUS_SCHEMA)
    path = os.path.join(out_dir, f"docs_{f:04d}.parquet")
    pq.write_table(table, path, compression="zstd")
    return path


def write_corpus_sharded(
    out_dir: str,
    n_docs: int,
    n_files: int = 32,
    seed: int = 42,
    processes: int = 16,
) -> list[str]:
    """Parallel corpus writer for bench-scale corpora (≥10^6 docs).

    Each shard gets its own derived seed (urls are seed-namespaced, so
    shards never collide); still fully deterministic for a given
    (n_docs, n_files, seed).
    """
    import multiprocessing as mp

    os.makedirs(out_dir, exist_ok=True)
    per = (n_docs + n_files - 1) // n_files
    jobs = [(out_dir, f, min(per, n_docs - f * per), seed) for f in range(n_files)]
    jobs = [j for j in jobs if j[2] > 0]
    with mp.Pool(processes) as pool:
        return pool.map(_write_shard, jobs)


def host_meta_rows(seed: int = 42) -> list[dict]:
    """Small broadcast dimension covering ~90% of hosts (FIXTURES.md §2)."""
    rng = random.Random(seed + 1)
    cats = ["news", "blog", "shop", "forum"]
    rows = []
    hosts = sorted(set(HOSTS))
    for rank, host in enumerate(hosts):
        if rng.random() < 0.9:  # ~10% of hosts intentionally missing
            rows.append(
                {
                    "host": host,
                    "host_lang": rng.choice(["en", "es", "de", "zh"]),
                    "host_category": rng.choice(cats),
                    "host_rank": rank + 1,
                }
            )
    return rows


def write_host_meta(out_path: str, seed: int = 42) -> str:
    table = pa.Table.from_pylist(
        host_meta_rows(seed),
        schema=pa.schema(
            [
                ("host", pa.string()),
                ("host_lang", pa.string()),
                ("host_category", pa.string()),
                ("host_rank", pa.int32()),
            ]
        ),
    )
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    pq.write_table(table, out_path, compression="zstd")
    return out_path
