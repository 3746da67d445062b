"""Job-level retry/backoff daemon (supervisor.go parity).

The doubling semantics are the reference's own golden test
(exponential_backoff_test.go:8-53) replayed verbatim; the daemon tests
assert that an injected sink failure is retried with the documented
backoff and commits EXACTLY once, that idle polls back off, and that a
stop request drains cleanly.
"""

import os

from scones.backoff import ExponentialBackoff, run_daemon
from scones.config import PipelineConfig
from scones.pipeline import run_snapshot


def test_exponential_backoff_golden_sequence():
    """exponential_backoff_test.go:8-53, min=1s max=10s."""
    b = ExponentialBackoff(1.0, 10.0)
    assert [b.next() for _ in range(6)] == [1.0, 2.0, 4.0, 8.0, 10.0, 10.0]
    b.reset()
    assert b.next() == 1.0


def test_exponential_backoff_current():
    """Current() primes to the minimum without advancing
    (exponential_backoff.go:14-20)."""
    b = ExponentialBackoff(0.05, 5.0)
    assert b.current() == 0.05
    assert b.current() == 0.05
    assert b.next() == 0.1  # primed → first next doubles


def _cfg(tmp_path, corpus_dir, host_meta_path, n_sinks=3):
    return PipelineConfig(
        input_glob=os.path.join(corpus_dir, "*.parquet"),
        output_dir=str(tmp_path / "out"),
        checkpoint_dir=str(tmp_path / "ckpt"),
        host_meta_path=host_meta_path,
        n_sinks=n_sinks,
    )


def test_daemon_retries_failed_snapshot_exactly_once_committed(
    spark, tmp_path, corpus_dir, host_meta_path
):
    """Injected failure between sink write and lineage commit → the
    daemon backs off (50 ms, the reference's retry minimum,
    supervisor.go:171) and reruns; the SAME snapshot id commits exactly
    once with the full row count — effectively-once at the job level."""
    cfg = _cfg(tmp_path, corpus_dir, host_meta_path)
    attempts = []

    def flaky_run(spark_, cfg_):
        attempts.append(1)
        return run_snapshot(spark_, cfg_, fail_before_commit=len(attempts) == 1)

    sleeps = []
    done = run_daemon(
        spark,
        cfg,
        run_fn=flaky_run,
        max_snapshots=1,
        sleep_fn=sleeps.append,
    )
    assert len(attempts) == 2  # fail, backoff, succeed
    assert sleeps == [0.05]  # the reference's retry minimum
    assert len(done) == 1 and done[0]["snapshot_id"] == 1
    assert done[0]["rows"] == 400

    out = spark.read.parquet(done[0]["output"])
    assert out.count() == 400
    # lineage committed exactly one snapshot
    from scones.lineage import LineageStore

    store = LineageStore(cfg.checkpoint_dir)
    assert store.committed_snapshots() == [1]


def test_daemon_idle_poll_backs_off_then_resets(
    spark, tmp_path, corpus_dir, host_meta_path
):
    """Nothing new → poll backoff doubles from 1 s (supervisor.go:155-161);
    a successful snapshot resets it."""
    cfg = _cfg(tmp_path, corpus_dir, host_meta_path)
    sleeps = []
    done = run_daemon(
        spark, cfg, max_iterations=4, sleep_fn=sleeps.append
    )
    # iteration 1 commits the corpus; 2-4 are idle polls backing off
    assert len(done) == 1
    assert sleeps == [1.0, 2.0, 4.0]

    # new file lands → next snapshot picks it up and resets the poll
    from scones.corpus import write_corpus

    extra = tmp_path / "extra"
    write_corpus(str(extra), n_docs=10, n_files=1, seed=7)
    import shutil

    shutil.copy(
        next(extra.glob("*.parquet")), os.path.join(corpus_dir, "late_extra.parquet")
    )
    try:
        sleeps2 = []
        done2 = run_daemon(
            spark, cfg, max_iterations=2, sleep_fn=sleeps2.append
        )
        assert len(done2) == 1 and done2[0]["snapshot_id"] == 2
        assert done2[0]["rows"] == 10
        assert sleeps2 == [1.0]  # idle backoff restarted from the minimum
    finally:
        os.remove(os.path.join(corpus_dir, "late_extra.parquet"))


def test_daemon_stop_event_drains_before_next_attempt(
    spark, tmp_path, corpus_dir, host_meta_path
):
    """A stop request during a snapshot lets it finish (and commit), then
    exits without starting another — the SIGTERM drain contract."""
    import threading

    cfg = _cfg(tmp_path, corpus_dir, host_meta_path)
    stop = threading.Event()
    calls = []

    def run_and_stop(spark_, cfg_):
        calls.append(1)
        out = run_snapshot(spark_, cfg_)
        stop.set()  # SIGTERM arrives while this snapshot is in flight
        return out

    done = run_daemon(spark, cfg, run_fn=run_and_stop, stop_event=stop)
    assert len(calls) == 1  # no second attempt after the stop
    assert len(done) == 1 and done[0]["rows"] == 400


def test_run_snapshot_empty_inputs_commit_zero_row_markers(
    spark, tmp_path, host_meta_path
):
    """All-empty planned inputs → explicit no-part-files detection commits
    zero-row consumed markers (not an exception guess — round-2 advice:
    a real read failure must propagate, never mark inputs consumed)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from scones.corpus import CORPUS_SCHEMA, generate_rows

    src = tmp_path / "empty_in"
    src.mkdir()
    # schema-bearing but zero-row parquet
    tbl = pa.Table.from_pylist(generate_rows(1, seed=1), schema=CORPUS_SCHEMA)
    pq.write_table(tbl.slice(0, 0), str(src / "empty.parquet"))

    cfg = _cfg(tmp_path, str(src), host_meta_path)
    out = run_snapshot(spark, cfg)
    assert out["snapshot_id"] == 1
    assert out["rows"] == 0

    from scones.lineage import LineageStore

    committed = LineageStore(cfg.checkpoint_dir).read_all()
    assert committed.num_rows == 1
    assert committed.column("row_count").to_pylist() == [0]
    # rerun is a no-op (the empty file is consumed)
    assert run_snapshot(spark, cfg)["snapshot_id"] is None
