"""Metrics persistence + HTTP statistics endpoint (statistics_server.go
parity): served JSON equals the lineage-derived state."""

import json
import urllib.request

from scones.config import PipelineConfig
from scones.corpus import write_corpus
from scones.lineage import LineageStore, backlog_report
from scones.pipeline import run_snapshot
from scones.statsserver import StatisticsServer, read_run_metrics, stats_payload


def _cfg(tmp_path):
    return PipelineConfig(
        input_glob=str(tmp_path / "in" / "*.parquet"),
        output_dir=str(tmp_path / "out"),
        checkpoint_dir=str(tmp_path / "ckpt"),
        n_sinks=2,
        spread_partitions=0,
    )


def test_run_metrics_persisted_per_run(spark, tmp_path):
    cfg = _cfg(tmp_path)
    write_corpus(str(tmp_path / "in"), n_docs=30, n_files=2, seed=81)
    s1 = run_snapshot(spark, cfg)
    runs = read_run_metrics(cfg.checkpoint_dir)
    assert len(runs) == 1
    assert runs[0]["snapshot_id"] == s1["snapshot_id"]
    assert runs[0]["rows"] == 30
    assert runs[0]["payload_bytes"] == s1["payload_bytes"]
    # no-op run appends nothing
    run_snapshot(spark, cfg)
    assert len(read_run_metrics(cfg.checkpoint_dir)) == 1


def test_stats_payload_matches_lineage(spark, tmp_path):
    cfg = _cfg(tmp_path)
    write_corpus(str(tmp_path / "in"), n_docs=30, n_files=3, seed=82)
    run_snapshot(spark, cfg)
    payload = stats_payload(cfg.checkpoint_dir, cfg.input_glob)
    store = LineageStore(cfg.checkpoint_dir)
    rep = backlog_report(store, cfg.input_glob)
    assert payload["backlog"]["rows_committed"] == rep["rows_committed"]
    assert payload["backlog"]["files_committed"] == rep["files_committed"]
    assert payload["backlog"]["files_pending"] == rep["files_pending"]
    # parquet inputs are consumed whole: no per-file backlog
    assert len(payload["files"]) == 3
    for f in payload["files"].values():
        assert f["rows_committed"] > 0 and f["snapshots"] == [1]


def test_http_endpoint_serves_live_state(spark, tmp_path):
    cfg = _cfg(tmp_path)
    write_corpus(str(tmp_path / "in"), n_docs=20, n_files=2, seed=83)
    run_snapshot(spark, cfg)
    srv = StatisticsServer(cfg.checkpoint_dir, cfg.input_glob).start()
    try:
        url = f"http://127.0.0.1:{srv.port}/"
        got = json.loads(urllib.request.urlopen(url, timeout=10).read())
        assert got == stats_payload(cfg.checkpoint_dir, cfg.input_glob)
        assert got["backlog"]["files_pending"] == []

        # LIVE view: a new input file appears in the served backlog
        # without any pipeline run (the reference re-stats per request)
        write_corpus(str(tmp_path / "in2"), n_docs=5, n_files=1, seed=84)
        import shutil

        shutil.copy(
            str(tmp_path / "in2" / "docs_0000.parquet"),
            str(tmp_path / "in" / "docs_0099.parquet"),
        )
        got2 = json.loads(urllib.request.urlopen(url, timeout=10).read())
        assert len(got2["backlog"]["files_pending"]) == 1
        pending = got2["backlog"]["files_pending"][0]
        assert got2["files"][pending]["position"] == 0
        assert got2["files"][pending]["backlog_bytes"] > 0
    finally:
        srv.stop()


def test_deleted_file_reports_size_minus_one(spark, tmp_path):
    cfg = _cfg(tmp_path)
    write_corpus(str(tmp_path / "in"), n_docs=10, n_files=1, seed=85)
    run_snapshot(spark, cfg)
    victim = str(tmp_path / "in" / "docs_0000.parquet")
    import os

    os.unlink(victim)
    payload = stats_payload(cfg.checkpoint_dir, cfg.input_glob)
    assert payload["files"][victim]["size"] == -1  # statistics.go:150-156
    assert payload["files"][victim]["backlog_bytes"] == 0
