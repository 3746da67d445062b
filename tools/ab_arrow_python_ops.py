"""A/B the Arrow batch size for the Python-crossing (mapInPandas) ops.

Round 3 retuned ``spark.sql.execution.arrow.maxRecordsPerBatch`` 64k→16k
measured on the JVM framing path, and ``media_features`` went superlinear
on the doubled corpus (VERDICT r3 "What's wrong" #1: 4× more batch
boundaries taxing the Python crossing).  This tool measures the
mapInPandas ops (media_features, frame_sample) at both batch sizes —
``maxRecordsPerBatch`` is a runtime SQL conf, so one warm JVM serves all
cells interleaved (A/B/A/B × passes) and the medians are drift-free.

Usage: python tools/ab_arrow_python_ops.py [--sf-dir D] [--passes N]
Prints one JSON line with per-(op, batch) median seconds.
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

OPS = ["media_features", "frame_sample"]
BATCHES = [16_384, 65_536]


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    p.add_argument("--master", default=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]")
    p.add_argument("--passes", type=int, default=5)
    a = p.parse_args()

    import __spark_entry__ as entrymod
    from scones.session import get_spark

    spark = get_spark(master=a.master, app_name="ab-arrow-python-ops")
    qs = entrymod.queries()

    def run_cell(op: str, batch: int) -> float:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", str(batch))
        t0 = time.perf_counter()
        qs[op](spark, a.sf_dir).write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    # warmup each op once (plan + IO + python workers)
    for op in OPS:
        run_cell(op, BATCHES[0])

    samples: dict[tuple[str, int], list[float]] = {
        (op, b): [] for op in OPS for b in BATCHES
    }
    for _ in range(a.passes):
        for op in OPS:
            for b in BATCHES:  # interleaved within each pass
                samples[(op, b)].append(run_cell(op, b))

    out = {
        f"{op}@{b}": {
            "median_sec": round(statistics.median(v), 4),
            "all": [round(x, 4) for x in v],
        }
        for (op, b), v in samples.items()
    }
    for op in OPS:
        m16 = out[f"{op}@16384"]["median_sec"]
        m64 = out[f"{op}@65536"]["median_sec"]
        out[f"{op}_64k_over_16k"] = round(m64 / m16, 3)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
