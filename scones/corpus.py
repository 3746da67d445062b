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


_SYLLABLES = (
    "ba be bi bo bu ca ce ci co cu da de di do du fa fe fi fo fu "
    "ga ge gi go gu ha he hi ho hu ja jo ka ke ki ko ku la le li lo lu "
    "ma me mi mo mu na ne ni no nu pa pe pi po pu ra re ri ro ru "
    "sa se si so su ta te ti to tu va ve vi vo vu wa wi wo ya yo za zo"
).split()


def zipf_vocabulary(n_terms: int = 50_000) -> list[str]:
    """Deterministic pseudo-word vocabulary: term i is its index written
    in syllables (library-free, seedless, collision-free)."""
    words = []
    n_syl = len(_SYLLABLES)
    for i in range(n_terms):
        w, x = [], i
        while True:
            w.append(_SYLLABLES[x % n_syl])
            x //= n_syl
            if x == 0:
                break
        words.append("".join(reversed(w)))
    return words


def zipf_document_rows(
    n_docs: int = 5000,
    n_terms: int = 50_000,
    seed: int = 42,
    dup_fraction: float = 0.04,
    zipf_s: float = 1.07,
) -> list[dict]:
    """Documents with a REALISTIC token distribution: ~``n_terms`` word
    types sampled Zipfian (frequency ∝ 1/rank^s, the empirical web-text
    law) — the corpus variant the dedup/decontamination family is benched
    on.  The driver testdata's documents table draws from ~32 word types,
    which makes every 5-gram collide with nearly everything: those bench
    rows measure the adversarial-corpus artifact, not the operator
    (round-3 verdict item 6).  Schema matches the testdata table exactly
    (doc_id, text, lang, source, n_chars) so every documents-table query
    runs on either corpus unchanged.

    ``dup_fraction`` of docs are near-duplicates of an earlier doc (the
    original with a handful of token edits) so near-dup pipelines have
    true positives to find, like a real crawl.
    """
    import bisect
    import math

    rng = random.Random(seed)
    vocab = zipf_vocabulary(n_terms)
    # cumulative Zipf weights once; bisect per token draw
    cum, acc = [], 0.0
    for r in range(1, n_terms + 1):
        acc += 1.0 / math.pow(r, zipf_s)
        cum.append(acc)

    def draw_word() -> str:
        return vocab[bisect.bisect_left(cum, rng.random() * acc)]

    langs = ["en"] * 8 + ["es", "de", "fr", "zh"]
    rows: list[dict] = []
    for i in range(n_docs):
        if rows and rng.random() < dup_fraction:
            # near-duplicate: clone an earlier doc, edit a few tokens
            src = rng.choice(rows)
            toks = src["text"].split()
            for _ in range(max(1, len(toks) // 50)):
                toks[rng.randrange(len(toks))] = draw_word()
            text = " ".join(toks)
            lang, source = src["lang"], src["source"]
        else:
            n_words = rng.randint(40, 120)
            text = " ".join(draw_word() for _ in range(n_words))
            lang = rng.choice(langs)
            source = f"src{rng.randrange(20)}"
        rows.append(
            {
                "doc_id": i,
                "text": text,
                "lang": lang,
                "source": source,
                "n_chars": len(text),
            }
        )
    return rows


def write_zipf_documents(
    out_dir: str,
    n_docs: int = 5000,
    n_terms: int = 50_000,
    seed: int = 42,
) -> str:
    """Write ``<out_dir>/documents.parquet`` (testdata-shaped) with the
    Zipfian vocabulary; returns the table path.  Callers pass ``out_dir``
    anywhere a testdata ``sf_dir`` is accepted."""
    os.makedirs(out_dir, exist_ok=True)
    schema = pa.schema(
        [
            ("doc_id", pa.int64()),
            ("text", pa.string()),
            ("lang", pa.string()),
            ("source", pa.string()),
            ("n_chars", pa.int64()),
        ]
    )
    path = os.path.join(out_dir, "documents.parquet")
    pq.write_table(
        pa.Table.from_pylist(zipf_document_rows(n_docs, n_terms, seed), schema=schema),
        path,
        compression="zstd",
    )
    return path


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
