"""One-off write-phase profiling worker: run the flagship snapshot at a
given parallelism with optional extra Spark confs, print phase timings.

Usage: python tools/bench_experiment.py --master local[8] \
    [--conf k=v ...] [--runs 3]
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
    p.add_argument("--corpus", default="/root/repo/.bench_corpus/n300000")
    p.add_argument("--host-meta", default="/root/repo/.bench_corpus/host_meta.parquet")
    p.add_argument("--n-sinks", type=int, default=4)
    p.add_argument("--runs", type=int, default=3)
    p.add_argument("--conf", action="append", default=[])
    args = p.parse_args()

    n = args.master[args.master.find("[") + 1 : args.master.find("]")]
    if n.isdigit() and int(n) < (os.cpu_count() or 1):
        os.sched_setaffinity(0, set(range(int(n))))

    from scones.config import PipelineConfig
    from scones.pipeline import run_snapshot
    from scones.session import get_spark

    extra = dict(c.split("=", 1) for c in args.conf)
    spark = get_spark(master=args.master, app_name="scones-exp", extra_conf=extra)

    results = []
    for _ in range(args.runs):
        work = tempfile.mkdtemp(prefix="scones_exp_")
        cfg = PipelineConfig(
            input_glob=os.path.join(args.corpus, "*.parquet"),
            output_dir=os.path.join(work, "out"),
            checkpoint_dir=os.path.join(work, "ckpt"),
            host_meta_path=args.host_meta,
            n_sinks=args.n_sinks,
        )
        t0 = time.perf_counter()
        summary = run_snapshot(spark, cfg)
        total = time.perf_counter() - t0
        results.append(
            {
                "total": round(total, 3),
                "write": round(summary["write_sec"], 3),
                "plan": round(summary["plan_sec"], 3),
                "audit": round(summary["audit_commit_sec"], 3),
            }
        )
        rows = summary["rows"]
        shutil.rmtree(work, ignore_errors=True)
    best_write = min(r["write"] for r in results)
    print(
        json.dumps(
            {
                "master": args.master,
                "conf": extra,
                "runs": results,
                "best_write": best_write,
                "write_docs_per_sec": round(rows / best_write, 1),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
