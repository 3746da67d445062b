"""Time travel, orphan vacuum, config round-trip, skew spread."""

import os

import pytest
from pyspark.sql import functions as F

from scones.config import PipelineConfig
from scones.corpus import write_corpus
from scones.lineage import LineageStore, read_committed, vacuum_orphans
from scones.pipeline import run_snapshot


def _cfg(tmp_path, n_sinks=3, spread=2):
    return PipelineConfig(
        input_glob=str(tmp_path / "in" / "*.parquet"),
        output_dir=str(tmp_path / "out"),
        checkpoint_dir=str(tmp_path / "ckpt"),
        n_sinks=n_sinks,
        spread_partitions=spread,
    )


def test_time_travel_and_vacuum(spark, tmp_path):
    cfg = _cfg(tmp_path)
    write_corpus(str(tmp_path / "in"), n_docs=40, n_files=2, seed=51)
    run_snapshot(spark, cfg)
    store = LineageStore(cfg.checkpoint_dir)
    snaps = store.committed_snapshots()
    assert snaps == [1]

    # time travel: as_of=1 equals current state
    now = read_committed(spark, store, cfg.output_dir)
    asof = read_committed(spark, store, cfg.output_dir, as_of_snapshot=1)
    assert now.count() == asof.count() == 40

    # orphan: fake an unpublished snapshot dir
    orphan = tmp_path / "out" / "snapshot_id=99"
    orphan.mkdir(parents=True)
    (orphan / "junk.parquet").write_bytes(b"x")
    removed = vacuum_orphans(store, cfg.output_dir)
    assert [str(orphan)] == removed
    assert not orphan.exists()
    # committed dirs survive
    assert os.path.isdir(str(tmp_path / "out" / "snapshot_id=1"))


def test_time_travel_excludes_later_snapshots(spark, tmp_path):
    cfg = _cfg(tmp_path)
    write_corpus(str(tmp_path / "in"), n_docs=40, n_files=2, seed=53)
    run_snapshot(spark, cfg)
    # wave 2: new files (different names via offset trick)
    import pyarrow as pa
    import pyarrow.parquet as pq
    from scones.corpus import CORPUS_SCHEMA, generate_rows

    pq.write_table(
        pa.Table.from_pylist(generate_rows(25, seed=54), schema=CORPUS_SCHEMA),
        str(tmp_path / "in" / "docs_0009.parquet"),
    )
    run_snapshot(spark, cfg)
    store = LineageStore(cfg.checkpoint_dir)
    assert store.committed_snapshots() == [1, 2]
    assert read_committed(spark, store, cfg.output_dir).count() == 65
    assert (
        read_committed(spark, store, cfg.output_dir, as_of_snapshot=1).count()
        == 40
    )


def test_zero_row_input_file_is_marked_consumed(spark, tmp_path):
    """An empty input parquet must get a lineage row (row_count=0) so it
    is not re-admitted as a new (empty) snapshot on every run."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    from scones.corpus import CORPUS_SCHEMA, generate_rows

    cfg = _cfg(tmp_path)
    write_corpus(str(tmp_path / "in"), n_docs=20, n_files=1, seed=71)
    pq.write_table(
        pa.Table.from_pylist([], schema=CORPUS_SCHEMA),
        str(tmp_path / "in" / "docs_0008_empty.parquet"),
    )
    s1 = run_snapshot(spark, cfg)
    assert s1["snapshot_id"] == 1 and s1["rows"] == 20
    store = LineageStore(cfg.checkpoint_dir)
    lineage = store.read_all().to_pylist()
    empties = [r for r in lineage if r["row_count"] == 0]
    assert len(empties) == 1
    assert empties[0]["src_file"].endswith("docs_0008_empty.parquet")
    # no-op rerun: the empty file is consumed, not replanned forever
    assert run_snapshot(spark, cfg)["snapshot_id"] is None


def test_all_empty_snapshot_commits_markers(spark, tmp_path):
    """Even a snapshot where EVERY planned file is empty publishes
    consumed markers instead of looping."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    from scones.corpus import CORPUS_SCHEMA

    cfg = _cfg(tmp_path)
    (tmp_path / "in").mkdir()
    for i in range(2):
        pq.write_table(
            pa.Table.from_pylist([], schema=CORPUS_SCHEMA),
            str(tmp_path / "in" / f"empty_{i}.parquet"),
        )
    s1 = run_snapshot(spark, cfg)
    assert s1["snapshot_id"] == 1 and s1["rows"] == 0
    assert run_snapshot(spark, cfg)["snapshot_id"] is None


def test_config_json_roundtrip(tmp_path):
    cfg = PipelineConfig(
        input_glob="/x/*.parquet",
        output_dir="/y",
        checkpoint_dir="/z",
        n_sinks=7,
        max_length=8192,
    )
    p = str(tmp_path / "cfg.json")
    cfg.to_json(p)
    back = PipelineConfig.from_json(p)
    assert back == cfg
    # unknown keys in the file are tolerated (forward compat)
    import json

    raw = json.load(open(p))
    raw["future_knob"] = True
    json.dump(raw, open(p, "w"))
    assert PipelineConfig.from_json(p).n_sinks == 7


def test_static_fields_decoration_and_precedence(spark, tmp_path):
    """≈ config.go:41 fields + the reference's precedence rule: a static
    field named like a generated column overwrites it
    (file_reader.go:112-117)."""
    cfg = _cfg(tmp_path)
    cfg.static_fields = {"env": "prod", "host": "forced-host"}
    write_corpus(str(tmp_path / "in"), n_docs=20, n_files=1, seed=61)
    run_snapshot(spark, cfg)
    df = spark.read.parquet(str(tmp_path / "out" / "snapshot_id=1"))
    rows = df.select("env", "host").distinct().collect()
    assert rows == [
        r for r in rows if r.env == "prod" and r.host == "forced-host"
    ] and len(rows) == 1


def test_write_routed_library_api(spark, tmp_path):
    from scones.extract import extract_documents
    from scones.enrich import with_host
    from scones.route import write_routed

    write_corpus(str(tmp_path / "in"), n_docs=30, n_files=1, seed=62)
    df = with_host(
        extract_documents(spark.read.parquet(str(tmp_path / "in") + "/*.parquet"))
    )
    out = str(tmp_path / "routed")
    write_routed(df, out, n_sinks=2, spread_partitions=2)
    got = spark.read.parquet(out)
    assert got.count() == 30
    assert set(r.sink_id for r in got.select("sink_id").distinct().collect()) == {0, 1}


def test_spread_defuses_hot_host_skew(spark, tmp_path):
    """Zipfian corpus: hot.example.org carries ≥20% of rows.  The
    routed-write repartition key (sink_id, crc32(url)%spread) must keep
    the max partition near the mean — no single-reducer hot spot."""
    from scones.route import with_sink_id

    write_corpus(str(tmp_path / "in"), n_docs=2000, n_files=4, seed=55)
    df = spark.read.parquet(str(tmp_path / "in") + "/*.parquet")
    from scones.route import spread_expr

    n_sinks, spread = 4, 4
    routed = with_sink_id(df.select("url"), n_sinks).repartition(
        n_sinks * spread,
        F.col("sink_id"),
        spread_expr("url", spread),
    )
    # Key-level balance: no (sink, spread) shuffle KEY is hot — the hot
    # host's rows scatter across spread keys by url hash.  (Bucket-level
    # counts additionally vary by generic hash collisions of 16 keys
    # into 16 buckets — that's a property of hash partitioning, not of
    # the data; at scale spread is sized so keys >> collisions matter.)
    combo = routed.groupBy("sink_id", spread_expr("url", spread).alias("sp"))
    sizes = [r.n for r in combo.agg(F.count("*").alias("n")).collect()]
    mean = sum(sizes) / len(sizes)
    assert len(sizes) == n_sinks * spread, "missing shuffle keys"
    assert max(sizes) <= 1.5 * mean, f"hot key: {max(sizes)} vs mean {mean}"
    part_sizes = [
        r.n
        for r in routed.groupBy(F.spark_partition_id().alias("p"))
        .agg(F.count("*").alias("n"))
        .collect()
    ]
    assert len(part_sizes) >= n_sinks * spread * 0.6, "partitions underused"

    # contrast: repartition by host alone WOULD concentrate the hot host
    from scones.enrich import with_host

    byhost = with_host(df.select("url")).repartition(n_sinks * spread, "host")
    hsizes = [
        r.n
        for r in byhost.groupBy(F.spark_partition_id().alias("p"))
        .agg(F.count("*").alias("n"))
        .collect()
    ]
    assert max(hsizes) > 2.5 * (sum(hsizes) / max(len(hsizes), 1)), (
        "corpus not skewed enough to make the test meaningful"
    )
