"""Round-6 optimization harness (bench.py is frozen — this file carries
the extra measurements the optimization round needs, per guide §1).

Times named queries() entries with the SAME methodology as bench.py's
query phase (one warm run to absorb plan+IO, then timed noop-sink runs),
but with N repeats and min/median reported, and optionally dumps
``explain("formatted")`` to plans/r06/<name>_<tag>.txt.

Usage:
  python bench_extra.py --queries semdedup embedding_near_dup --repeats 3
  python bench_extra.py --all --repeats 1 --plans-tag before
  python bench_extra.py --queries clean_corpus --zipf --repeats 3
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--queries", nargs="*", default=[])
    p.add_argument("--all", action="store_true")
    p.add_argument("--zipf", action="store_true", help="also time @zipf variants")
    p.add_argument("--repeats", type=int, default=3)
    p.add_argument("--plans-tag", default=None, help="dump explain to plans/r06/<q>_<tag>.txt")
    p.add_argument("--plans-only", action="store_true", help="dump plans, skip timing")
    p.add_argument("--sf-dir", default=SF_DIR)
    args = p.parse_args()

    import __spark_entry__ as entrymod
    from bench import reset_host_memory
    from scones.session import get_spark

    reset_host_memory()  # same protocol as bench.py: measure code, not host decay
    os.environ.setdefault("SCONES_DRIVER_MEM", "12g")
    spark = get_spark(master=f"local[{CPUS}]", app_name="scones-bench-extra")
    qs = entrymod.queries()
    names = list(qs) if args.all else args.queries
    zipf_dir = None
    if args.zipf:
        import bench as benchmod

        zipf_dir = benchmod.ensure_zipf_corpus()

    out: dict[str, dict] = {}

    def run_one(name: str, sf_dir: str, key: str) -> None:
        fn = qs.get(name)
        if fn is None:
            print(f"!! unknown query {name}", file=sys.stderr)
            return
        if args.plans_tag:
            os.makedirs(os.path.join(REPO, "plans", "r06"), exist_ok=True)
            df = fn(spark, sf_dir)
            plan = spark._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            safe = key.replace("@", "_")
            with open(os.path.join(REPO, "plans", "r06", f"{safe}_{args.plans_tag}.txt"), "w") as f:
                f.write(plan)
        if args.plans_only:
            return
        spark.sparkContext.setJobDescription(f"warm:{key}")
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        ts = []
        for i in range(args.repeats):
            spark.sparkContext.setJobDescription(f"timed:{key}#{i}")
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            ts.append(round(time.perf_counter() - t0, 4))
        out[key] = {"min": min(ts), "median": round(statistics.median(ts), 4), "samples": ts}
        print(json.dumps({"query": key, **out[key]}), flush=True)

    zipf_ok = set()
    if args.zipf:
        import bench as benchmod

        zipf_ok = set(benchmod.ZIPF_BENCH_QUERIES)
    for name in names:
        run_one(name, args.sf_dir, name)
        if zipf_dir and name in zipf_ok:
            run_one(name, zipf_dir, f"{name}@zipf")

    print(json.dumps({"summary": {k: v["min"] for k, v in out.items()}}))
    spark.stop()


if __name__ == "__main__":
    main()
