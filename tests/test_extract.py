"""Byte-identical extraction over the synthetic corpus (the core contract).

BASELINE.json input_hint: "per-row invariant vs the reference:
byte-identical extracted text per url".
"""

from scones.extract import extract_documents
from scones.oracle import extract_text, frame_bytes


def test_extract_byte_identical_vs_oracle(spark, corpus_dir, corpus_rows):
    df = spark.read.parquet(f"{corpus_dir}/*.parquet")
    got = {
        r["url"]: bytes(r["extracted"])
        for r in extract_documents(df).select("url", "extracted").collect()
    }
    assert len(got) == len(corpus_rows)
    for row in corpus_rows:
        assert got[row["url"]] == extract_text(row["html"]), row["url"]


def test_extract_byte_identical_with_max_length(spark, corpus_dir, corpus_rows):
    maxlen = 256  # corpus includes over-long lines > 256 raw bytes
    df = spark.read.parquet(f"{corpus_dir}/*.parquet")
    got = {
        r["url"]: (bytes(r["extracted"]), r["bytes_read"], r["n_skipped"])
        for r in extract_documents(df, max_length=maxlen).collect()
    }
    skipped_total = 0
    for row in corpus_rows:
        framed = frame_bytes(row["html"], maxlen)
        text, pos, sk = got[row["url"]]
        assert text == b"\n".join(framed.lines), row["url"]
        assert pos == framed.position, row["url"]
        assert sk == framed.skipped
        skipped_total += sk
    assert skipped_total > 0, "corpus must exercise the over-long-line path"


def test_corpus_text_column_matches_extraction(corpus_rows):
    """Generator's text column == oracle extraction (FIXTURES.md §1)."""
    for row in corpus_rows:
        assert row["text"] == extract_text(row["html"]).decode(
            "utf-8", errors="replace"
        )


def test_corpus_has_required_edge_cases(corpus_rows):
    htmls = [r["html"] for r in corpus_rows]
    assert any(b"\r\n" in h for h in htmls), "needs CRLF endings"
    assert any(not h.endswith(b"\n") for h in htmls), "needs partial tails"
    assert any(
        max((len(line) for line in h.split(b"\n")), default=0) > 256 for h in htmls
    ), "needs over-long lines"
    hot = sum(1 for r in corpus_rows if "hot.example.org" in r["url"])
    assert hot >= 0.2 * len(corpus_rows), "hot host must take >=20% of rows"
