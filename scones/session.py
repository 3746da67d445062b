"""SparkSession builder for the scones pipeline.

Tuned for the sandbox (single-JVM local[N]) but every setting is the one
you'd ship to a 1000-executor cluster: AQE on (runtime partition
coalescing + skew-join splitting), Arrow enabled for the vectorized
extraction path, shuffle partitions sized to the parallelism at hand
instead of the 200 default.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Arrow batch size (≈ the reference's spool batching, supervisor.go:46,
# scaled up for columnar transfer): 64k-row batches measured ~1.4x faster
# than 10k on the extract path — fewer allocations, fewer page faults,
# better amortized IPC.
# Arrow batch size for the Python crossing.  Round 3 re-measured this
# warm (persistent JVM, per-level affinity): 16k batches are 1.6× faster
# than 64k at 8 AND 32 concurrent workers and neutral at 2 — a 64k batch
# of ~1.9 KB docs materializes ~120 MB of FRESH buffers per batch on the
# python side (input copy + output arrays), and this host's serialized
# page-fault handler makes concurrent large allocations collide (per-core
# extract throughput halved from 1→8 workers at 64k).  Round 1's 64k
# pick was measured under cold-JVM startup noise.  At ~2 KB/doc, 16k
# rows ≈ 30 MB per batch — still far above per-row overhead territory.
ARROW_MAX_RECORDS = 16_384


def get_spark(
    master: str | None = None,
    app_name: str = "scones",
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession with scale-appropriate defaults.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (env, default 32).
    ``shuffle_partitions`` defaults to 2× the local core count — on a real
    cluster you'd size this to total executor cores (AQE coalesces down).
    """
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        n = master[master.find("[") + 1 : master.find("]")] if "[" in master else "32"
        n = n.split(",")[0]  # local[N,maxFailures] form
        shuffle_partitions = 32 if n == "*" else max(8, int(n))

    mem = os.environ.get("SCONES_DRIVER_MEM", "12g")
    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config(
            "spark.sql.execution.arrow.maxRecordsPerBatch", str(ARROW_MAX_RECORDS)
        )
        .config("spark.sql.parquet.compression.codec", "zstd")
        # zstd level 1: measured 14% faster sink writes for +7% size vs
        # level 3 (snappy was 18% faster but +57% size — wrong trade at
        # 100 TB storage scale)
        .config("spark.hadoop.parquet.compression.codec.zstd.level", "1")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", mem)
        # Xms=Xmx + AlwaysPreTouch: on this virtualized host, faulting in
        # fresh heap pages during GC-driven growth is catastrophically slow
        # (measured 30-66% of task time spent in "GC" that was really page
        # faults).  Pre-touching the whole heap at JVM start pays that cost
        # once, off the critical path — same practice as production
        # executors (spark.executor.extraJavaOptions below mirrors it).
        .config(
            "spark.driver.extraJavaOptions",
            f"-Xms{mem} -XX:+AlwaysPreTouch "
            + os.environ.get("SCONES_JAVA_OPTS", ""),
        )
        .config("spark.executor.extraJavaOptions", "-XX:+AlwaysPreTouch")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def rebuild_session(old: SparkSession | None, **get_spark_kwargs) -> SparkSession:
    """Tear down a (possibly hung) SparkSession's JVM and launch a fresh one.

    The watchdog path for the daemon loop (scones/backoff.py): round 3
    observed a local Spark JVM hang with zero CPU where the py4j call
    never answered — ``spark.stop()`` on such a session can itself block
    forever, so every teardown step here is bounded or force-kills:

      1. ``old.stop()`` is attempted on a side thread with a short join
         (a healthy JVM stops cleanly; a hung one is abandoned);
      2. the py4j gateway is shut down and its JVM child process killed
         (the same treatment bench.py's FlagshipServer gives a hung
         server: "hung or dead either way, reap the JVM");
      3. pyspark's process-global gateway/context singletons are cleared
         so :func:`get_spark` launches a NEW JVM instead of reattaching
         to the dead gateway.

    On a real cluster this is the cluster manager's supervise/restart;
    in local mode the driver has to be its own supervisor.
    """
    import threading

    from pyspark import SparkContext
    from pyspark.sql import SparkSession as _SS

    master = None
    if old is not None:
        try:
            master = old.sparkContext.master
        except Exception:
            master = None
        t = threading.Thread(target=old.stop, daemon=True)
        t.start()
        t.join(timeout=15)  # a hung JVM blocks stop(); don't wait on it
        gw = getattr(SparkContext, "_gateway", None)
        if gw is not None:
            try:
                gw.shutdown()
            except Exception:
                pass
            proc = getattr(gw, "proc", None)
            if proc is not None:
                try:
                    proc.kill()
                except Exception:
                    pass
    # Clear the process-global singletons so the next builder relaunches.
    # Hold SparkContext._lock while resetting (round-4 ADVICE): the
    # abandoned attempt thread may still be mid-py4j-call against these
    # objects, and pyspark's own builder takes the same lock — an
    # unlocked reset could interleave with a concurrent getOrCreate.
    # Every attribute is internals (version-fragile), so degrade to a
    # clean failure on a renamed one rather than a half-reset state.
    import contextlib

    lock = getattr(SparkContext, "_lock", None)
    with lock if lock is not None else contextlib.nullcontext():
        for klass, attr in (
            (SparkContext, "_gateway"),
            (SparkContext, "_jvm"),
            (SparkContext, "_active_spark_context"),
            (_SS, "_instantiatedSession"),
        ):
            if not hasattr(klass, attr):
                raise RuntimeError(
                    f"pyspark internals changed: {klass.__name__}.{attr} "
                    "missing — rebuild_session needs updating for this "
                    "pyspark version"
                )
            setattr(klass, attr, None)
    get_spark_kwargs.setdefault("master", master)
    return get_spark(**get_spark_kwargs)
