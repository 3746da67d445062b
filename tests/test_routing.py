"""Deterministic routing: Spark crc32 == zlib.crc32, routed-row set
equality per sink, and the per-sink aggregate contract vs the oracle."""

import zlib

from pyspark.sql import functions as F

from scones.extract import extract_documents
from scones.enrich import with_host
from scones.oracle import simulate_pipeline
from scones.route import sink_aggregates, with_sink_id

N_SINKS = 4


def test_crc32_route_matches_zlib(spark):
    urls = [
        "https://example.com/a",
        "https://hot.example.org/päge/ü?q=1",
        "https://x.io/" + "z" * 500,
        "",
    ]
    df = spark.createDataFrame([(u,) for u in urls], ["url"])
    got = {r.url: r.sink_id for r in with_sink_id(df, N_SINKS).collect()}
    for u in urls:
        assert got[u] == zlib.crc32(u.encode("utf-8")) % N_SINKS


def test_routed_row_set_equality_per_sink(spark, corpus_dir, corpus_rows):
    oracle = simulate_pipeline(corpus_rows, N_SINKS)
    df = spark.read.parquet(f"{corpus_dir}/*.parquet")
    routed = with_sink_id(df, N_SINKS).select("url", "sink_id").collect()
    got = {i: set() for i in range(N_SINKS)}
    for r in routed:
        got[r.sink_id].add(r.url)
    for i in range(N_SINKS):
        assert got[i] == oracle["sinks"][i], f"sink {i} url-set mismatch"
    assert all(len(s) > 0 for s in got.values()), "all sinks should get rows"


def test_per_sink_aggregates_match_oracle(spark, corpus_dir, corpus_rows):
    oracle = simulate_pipeline(corpus_rows, N_SINKS)
    df = extract_documents(spark.read.parquet(f"{corpus_dir}/*.parquet"))
    agg = sink_aggregates(with_host(df), N_SINKS).collect()
    got = {
        (r.sink_id, r.lang, r.host): (r.rows, int(r.bytes), r.distinct_urls)
        for r in agg
    }
    want = {
        k: (v.rows, v.bytes, len(v.urls)) for k, v in oracle["aggs"].items()
    }
    assert got == want


def test_routing_is_pure_function_of_content(spark, corpus_dir):
    """Same rows under different partitioning → identical sink assignment."""
    df = spark.read.parquet(f"{corpus_dir}/*.parquet").select("url")
    a = {r.url: r.sink_id for r in with_sink_id(df, N_SINKS).collect()}
    b = {
        r.url: r.sink_id
        for r in with_sink_id(df.repartition(17, F.col("url")), N_SINKS).collect()
    }
    assert a == b
