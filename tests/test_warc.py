"""Simplified-WARC ingestion: round-trip incl. adversarial bodies, and
the WARC → extract → route pipeline composition."""

from datetime import datetime, timezone

from scones.oracle import extract_text, route
from scones.warc import parse_warc_bytes, read_warc, write_warc


def _records():
    ts = datetime(2024, 5, 2, 10, 0, 0, tzinfo=timezone.utc)
    return [
        {"url": "https://a.example/1", "warc_ts": ts, "html": b"hello\nworld\n"},
        # adversarial body: contains CRLFs, a fake header block, binary
        {
            "url": "https://b.example/2",
            "warc_ts": ts,
            "html": b"WARC/1.0\r\nContent-Length: 3\r\n\r\nxx\x00\xff\r\n\r\ntail",
        },
        {"url": "https://c.example/3", "warc_ts": ts, "html": b""},
    ]


def test_warc_roundtrip_pure(tmp_path):
    p = str(tmp_path / "shard.warc")
    recs = _records()
    write_warc(p, recs)
    got = parse_warc_bytes(open(p, "rb").read(), p)
    assert len(got) == 3
    for g, want in zip(got, recs):
        assert g["url"] == want["url"]
        assert g["html"] == want["html"]  # Content-Length slicing is exact
        assert g["warc_ts"] == want["warc_ts"]
    assert got[0]["record_offset"] == 0
    assert got[1]["record_offset"] > 0


def test_truncated_trailing_record_not_emitted(tmp_path):
    p = str(tmp_path / "trunc.warc")
    write_warc(p, _records()[:2])
    data = open(p, "rb").read()
    assert len(parse_warc_bytes(data[:-10], p)) == 1  # 2nd body truncated


def test_warc_to_pipeline_composition(spark, tmp_path):
    import random

    from scones.extract import extract_documents
    from scones.route import with_sink_id

    rng = random.Random(9)
    ts = datetime(2024, 5, 3, tzinfo=timezone.utc)
    recs = [
        {
            "url": f"https://site{i % 7}.example/p/{i}",
            "warc_ts": ts,
            "html": (f"line one {i}\r\nline two {i}\n" + "tail").encode(),
        }
        for i in range(40)
    ]
    shard_dir = tmp_path / "warc"
    shard_dir.mkdir()
    write_warc(str(shard_dir / "s0.warc"), recs[:20])
    write_warc(str(shard_dir / "s1.warc"), recs[20:])

    docs = read_warc(spark, str(shard_dir / "*.warc"))
    routed = with_sink_id(extract_documents(docs), n_sinks=3)
    got = {
        r.url: (bytes(r.extracted), r.sink_id)
        for r in routed.select("url", "extracted", "sink_id").collect()
    }
    assert len(got) == 40
    for rec in recs:
        ext, sink = got[rec["url"]]
        assert ext == extract_text(rec["html"])
        assert sink == route(rec["url"], 3)
