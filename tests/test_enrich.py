"""Broadcast enrichment join + skew salting equivalence."""

from pyspark.sql import functions as F

from scones.corpus import host_meta_rows
from scones.enrich import enrich_broadcast, salted_join, with_host
from scones.oracle import simulate_pipeline


def test_broadcast_enrich_matches_oracle(spark, corpus_dir, corpus_rows, host_meta_path):
    meta = {r["host"]: r for r in host_meta_rows(seed=42)}
    oracle = simulate_pipeline(corpus_rows, 4, host_meta=meta)
    df = spark.read.parquet(f"{corpus_dir}/*.parquet").select("url")
    host_meta = spark.read.parquet(host_meta_path)
    got = {
        r.url: r.host_category
        for r in enrich_broadcast(df, host_meta).select("url", "host_category").collect()
    }
    assert got == oracle["enriched"]
    assert any(v is None for v in got.values()), "left join must keep misses"


def test_broadcast_join_is_actually_broadcast(spark, corpus_dir, host_meta_path):
    df = with_host(spark.read.parquet(f"{corpus_dir}/*.parquet").select("url"))
    host_meta = spark.read.parquet(host_meta_path)
    plan = df.join(
        F.broadcast(host_meta), on="host", how="left"
    )._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_salted_join_equals_plain_join(spark, corpus_dir, host_meta_path):
    """Salting must not change results — only the shuffle key distribution."""
    df = with_host(spark.read.parquet(f"{corpus_dir}/*.parquet").select("url"))
    host_meta = spark.read.parquet(host_meta_path)
    plain = {
        (r.url, r.host_category, r.host_rank)
        for r in df.join(host_meta, on="host", how="left").collect()
    }
    salted = {
        (r.url, r.host_category, r.host_rank)
        for r in salted_join(df, host_meta, key="host", num_salts=8).collect()
    }
    assert salted == plain
