"""Subprocess worker: CPU-bound scaling probe (supplementary evidence).

The flagship pipeline is memcpy-shaped, so its 8→32 scaling on this
single box is capped by shared DRAM (~0.60 ideal — BENCH/BASELINE.md).
This probe runs a COMPUTE-bound operator (quality_scores: regex +
array folds, JVM codegen, no Python crossing, no sink write) over the
same 300k-doc corpus — what the engine scales like when the work isn't
bandwidth-bound, i.e. the plan-quality signal with the host ceiling
factored out.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--master", required=True)
    p.add_argument("--corpus", required=True)
    p.add_argument("--runs", type=int, default=4)
    args = p.parse_args()

    n = args.master[args.master.find("[") + 1 : args.master.find("]")]
    if n.isdigit() and int(n) < (os.cpu_count() or 1):
        os.sched_setaffinity(0, set(range(int(n))))

    from pyspark.sql import functions as F

    from scones import textops
    from scones.session import get_spark

    spark = get_spark(master=args.master, app_name="scones-cpu-bench")
    docs = (
        spark.read.parquet(os.path.join(args.corpus, "*.parquet"))
        .select(F.xxhash64("url").alias("doc_id"), "text", "lang")
    )
    best = None
    rows = docs.count()
    for _ in range(args.runs):
        t0 = time.perf_counter()
        textops.quality_scores(docs).write.format("noop").mode("overwrite").save()
        dt = time.perf_counter() - t0
        best = dt if best is None or dt < best else best
    print(
        json.dumps(
            {
                "master": args.master,
                "best_sec": round(best, 3),
                "docs_per_sec": round(rows / best, 1),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
