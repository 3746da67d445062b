"""Subprocess worker: run the flagship parse→enrich→route→aggregate
pipeline at a given parallelism and print one JSON line with timings.

Separate process per parallelism level because one JVM = one master.

Two-cluster-size proxy discipline (BASELINE.md):
  * ``local[N]`` is confined to N physical CPUs via sched_setaffinity —
    otherwise the JVM's GC/JIT threads and the Python workers of the
    "small cluster" spill onto the idle cores and inflate its baseline;
  * throughput is the best of ``--runs`` repeated snapshots (fresh
    checkpoint each) — steady-state of a warm cluster.  On this
    virtualized host the first runs serialize on the hypervisor's lazy
    page-fault handler while worker arenas fault in (measured 36 s → 31 s
    → 5.7 s); a 10^12-row production job amortizes that to zero.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--master", required=True)
    p.add_argument("--corpus", required=True)
    p.add_argument("--host-meta", required=True)
    p.add_argument("--n-sinks", type=int, default=4)
    p.add_argument("--runs", type=int, default=3)
    p.add_argument(
        "--serve",
        action="store_true",
        help="persistent mode: init the JVM once, then run --runs "
        "snapshots per 'run' line on stdin, printing one JSON result "
        "line each; exits on 'exit'/EOF.  Lets the harness interleave "
        "parallelism levels without paying JVM startup + AlwaysPreTouch "
        "fault traffic per cell (9 launches × 12 GB pre-touch per bench "
        "measurably decays this virtualized host mid-measurement).",
    )
    args = p.parse_args()

    n = args.master[args.master.find("[") + 1 : args.master.find("]")]
    if n.isdigit() and int(n) < (os.cpu_count() or 1):
        os.sched_setaffinity(0, set(range(int(n))))

    from scones.config import PipelineConfig
    from scones.pipeline import run_snapshot
    from scones.session import get_spark

    spark = get_spark(master=args.master, app_name="scones-bench")

    def measure(runs: int) -> dict:
        times = []
        write_times = []
        rows = payload = 0
        for _ in range(runs):
            work = tempfile.mkdtemp(prefix="scones_bench_")
            cfg = PipelineConfig(
                input_glob=os.path.join(args.corpus, "*.parquet"),
                output_dir=os.path.join(work, "out"),
                checkpoint_dir=os.path.join(work, "ckpt"),
                host_meta_path=args.host_meta,
                n_sinks=args.n_sinks,
            )
            t0 = time.perf_counter()
            summary = run_snapshot(spark, cfg)
            times.append(time.perf_counter() - t0)
            write_times.append(summary["write_sec"])
            rows = summary["rows"]
            payload = summary["payload_bytes"]
            shutil.rmtree(work, ignore_errors=True)
        best = min(times)
        best_write = min(write_times)
        return {
            "master": args.master,
            "elapsed_sec": best,
            "write_sec": best_write,
            "all_runs_sec": [round(t, 2) for t in times],
            "rows": rows,
            "payload_bytes": payload,
            "docs_per_sec": rows / best,
            "write_docs_per_sec": rows / best_write,
        }

    if args.serve:
        print(json.dumps({"ready": args.master}), flush=True)
        for line in sys.stdin:
            cmd = line.strip()
            if cmd == "run":
                print(json.dumps(measure(args.runs)), flush=True)
            elif cmd == "exit" or cmd == "":
                break
    else:
        print(json.dumps(measure(args.runs)))
    spark.stop()


if __name__ == "__main__":
    main()
