"""Snapshot compaction: fewer files, identical row set, crash-safe."""

import os

from scones.config import PipelineConfig
from scones.corpus import write_corpus, write_host_meta
from scones.maintenance import compact_snapshot
from scones.pipeline import run_snapshot


def _snapshot(spark, tmp_path, spread=4):
    write_corpus(str(tmp_path / "in"), n_docs=120, n_files=4, seed=31)
    meta = str(tmp_path / "host_meta.parquet")
    write_host_meta(meta)
    cfg = PipelineConfig(
        input_glob=str(tmp_path / "in" / "*.parquet"),
        output_dir=str(tmp_path / "out"),
        checkpoint_dir=str(tmp_path / "ckpt"),
        host_meta_path=meta,
        n_sinks=3,
        spread_partitions=spread,  # deliberately many small files
    )
    s = run_snapshot(spark, cfg)
    return cfg, s


def test_compact_reduces_files_preserves_rows(spark, tmp_path):
    cfg, s = _snapshot(spark, tmp_path)
    snap = os.path.join(cfg.output_dir, "snapshot_id=1")
    before = {
        r.url: (bytes(r.extracted), r.sink_id)
        for r in spark.read.parquet(snap).collect()
    }
    res = compact_snapshot(spark, cfg.output_dir, 1)
    assert res["files_after"] < res["files_before"]
    assert res["files_after"] <= 3  # one file per sink at this size
    after = {
        r.url: (bytes(r.extracted), r.sink_id)
        for r in spark.read.parquet(snap).collect()
    }
    assert after == before  # byte-identical routed row set
    assert res["rows"] == s["rows"] == len(after)


def test_compact_target_bytes_bounds_files_within_sink(spark, tmp_path):
    """target_bytes actually splits a large sink: per-sink output file
    count == ceil(sink_bytes / target) and files are evenly sized
    (round-robin), not one unbounded single-task file per sink
    (round-3 advice: repartition(n, 'sink_id') could never split one)."""
    import glob
    import math

    cfg, s = _snapshot(spark, tmp_path)
    snap = os.path.join(cfg.output_dir, "snapshot_id=1")
    # pick a target that forces ≥3 files in the largest sink
    sink_bytes = {}
    for d in glob.glob(os.path.join(snap, "sink_id=*")):
        sink_bytes[d] = sum(
            os.path.getsize(os.path.join(r, f))
            for r, _, fs in os.walk(d)
            for f in fs
            if f.endswith(".parquet")
        )
    target = max(sink_bytes.values()) // 3
    res = compact_snapshot(spark, cfg.output_dir, 1, target_bytes=target)
    assert res["rows"] == s["rows"]
    for d, nbytes in sink_bytes.items():
        parts = [
            os.path.getsize(p)
            for p in glob.glob(os.path.join(d, "*.parquet"))
        ]
        want = max(1, math.ceil(nbytes / target))
        assert len(parts) == want, (d, len(parts), want)
        # round-robin balance: no file more than ~2x the mean
        assert max(parts) <= 2 * (sum(parts) / len(parts))


def test_compact_cleans_stale_attempt_dirs(spark, tmp_path):
    cfg, _ = _snapshot(spark, tmp_path, spread=2)
    snap = os.path.join(cfg.output_dir, "snapshot_id=1")
    # simulate crash debris from a prior interrupted compaction
    os.makedirs(snap + ".compacting/junk")
    os.makedirs(snap + ".old/junk")
    res = compact_snapshot(spark, cfg.output_dir, 1)
    assert not os.path.exists(snap + ".compacting")
    assert not os.path.exists(snap + ".old")
    assert res["rows"] == 120


def test_compact_recovers_crash_between_swap_renames(spark, tmp_path):
    """Death between rename(snap→old) and rename(tmp→snap) leaves the
    ONLY copies of committed data in old/ and .compacting/.  The next
    compaction must restore the original before cleaning debris — blind
    cleanup would delete both copies (round-4 review finding)."""
    import shutil

    cfg, s = _snapshot(spark, tmp_path, spread=2)
    snap = os.path.join(cfg.output_dir, "snapshot_id=1")
    # simulate the mid-swap crash state
    shutil.copytree(snap, snap + ".compacting")
    os.rename(snap, snap + ".old")
    assert not os.path.exists(snap)

    res = compact_snapshot(spark, cfg.output_dir, 1)
    assert res["rows"] == s["rows"] == 120
    assert not os.path.exists(snap + ".old")
    assert not os.path.exists(snap + ".compacting")
    assert spark.read.parquet(snap).count() == 120


def test_flagship_server_read_timeout_kills_hung_proc():
    """bench harness: a server that produces no output within the read
    timeout is killed and reported dead (round-3 incident: a hung JVM
    deadlocked the whole bench)."""
    import subprocess

    import pytest

    import bench

    srv = object.__new__(bench.FlagshipServer)
    srv.master = "local[1]"
    srv.proc = subprocess.Popen(
        ["sleep", "300"],
        stdin=subprocess.PIPE,
        stdout=subprocess.PIPE,
        text=True,
    )
    srv.READ_TIMEOUT_SEC = 1
    with pytest.raises(RuntimeError, match="died or hung"):
        srv._read_json()
    srv.proc.wait(timeout=10)
    assert srv.proc.poll() is not None
