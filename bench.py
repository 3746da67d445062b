"""Benchmark harness (driver contract).

Measures:
  1. flagship end-to-end parse→enrich→route→aggregate+write throughput on
     a deterministic synthetic Common-Crawl-style corpus (scones/corpus.py,
     size scaled to the sf of $SPARK_GRAFT_SF_DIR), at TWO parallelism
     levels — local[8] and local[$SPARK_GRAFT_CPUS] — as the sandbox proxy
     for N vs 4N executors (BASELINE.md), reporting docs/sec, GB/sec and
     scaling efficiency;
  2. per-query wall time for the headline queries() entries on the
     $SPARK_GRAFT_SF_DIR tables (fully materialized via the noop sink).

Output contract (round-4 verdict item 1: the r4 artifact was lost
because one giant summary line with 66 per-query timings overflowed the
driver's stdout tail window):

  * each per-query timing is printed as its OWN small JSON line
    ({"bench_query": name, "sec": t}) the moment it is measured;
  * the full per-query map is written to ``BENCH_QUERIES.json`` at the
    repo root (the durable record);
  * the LAST stdout line is a compact fixed-schema summary (< ~1 KB):
    {"metric": ..., "value": ..., "unit": "sec", "queries": {headline
    subset only}, "queries_file": "BENCH_QUERIES.json", "n_queries": N,
    "suspect_rows": [...], "sf": ..., throughput + scaling fields}.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

# flagship corpus sizing: sf0.1 → 6×10^5 docs (~1.1 GB of html) — large
# enough that the scaling measurement isn't dominated by fixed per-
# snapshot costs (driver planning, lineage audit, task-wave setup: ~1 s
# that a 10^12-row job amortizes to zero but a 3 s run does not), small
# enough that six interleave passes × three levels fit the budget.
_SF = float(SF_DIR.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in SF_DIR else 0.1
N_DOCS = max(10_000, int(6_000_000 * _SF))

BENCH_QUERIES = [
    "tpch_q1",
    "tpch_q3_like",
    "join_region_nation",
    "window_top_orders",
    "events_windowed",
    "events_sessions",
    "route_counts",
    "sink_aggregates",
    "enrich_broadcast",
    "length_filter",
    "orders_rollup",
    "docs_except",
    "lang_source_pivot",
    "tpch_q14_like",
    "supplier_balance_by_nation",
    "lang_length_quantiles",
    "media_features",
    "projection_host",
    "token_counts",
    "quality_scores",
    "lang_id",
    "fingerprints",
    "dedup_exact",
    "extract_roundtrip",
    "minhash_signatures",
    "minhash_lsh_pairs",
    "simhash",
    "cosine_topk",
    "ann_lsh_topk",
    "ann_hyperplane_topk",
    "grok_parse_events",
    "embedding_near_dup",
    # round-2 additions.  The pairwise near-dup family (ngram_jaccard,
    # dedup_components) is adversarially slow on this corpus BY DESIGN:
    # the 32-word generator vocab makes shingles collide massively —
    # plan shapes are the bucketed/capped ones (see PLANS.md); absolute
    # seconds here are corpus artifacts, not plan defects.
    "ann_ivf_topk",
    "subword_counts",
    "dedup_components",
    # the flagship LLM-data composition: quality gate → exact dedup →
    # near-dup (minhash-LSH) keep-min funnel in one plan.  Absolute
    # seconds inherit the corpus artifact noted above (32-word vocab →
    # adversarial shingle collisions), but the headline workload needs a
    # recorded number (round-2 verdict item 6).
    "clean_corpus",
    # round-3 additions: strict grok, vocab top-k, context-window
    # chunking, stratified mixture sampling
    "grok_parse_anchored",
    "top_terms",
    "chunk_windows",
    "sample_mixture",
    "repetition_scores",
    "pii_scrub",
    "shard_corpus",
    # decontaminate inherits the corpus artifact (32-word vocab → the
    # 5 bench docs' shingles collide with most of the corpus, so the
    # "contaminated" semi-join matches nearly everything — ~21 s at
    # sf0.1); on real text the eval set matches a tiny fraction.
    "decontaminate",
    # round-4 additions: the three queries without a bench row in r3
    # (frame_sample; the two pairwise near-dup rows run on BOTH corpora
    # — see ZIPF_BENCH_QUERIES), and the new 48th oracle query.
    "frame_sample",
    "ngram_jaccard_pairs",
    "dedup_near_keep_min",
    "ann_ivf_learned_fullprobe",
    # round-4 new operators: C4-style span dedup, df/idf vocabulary
    # profile, bigram-LM quality scoring, token-budget sequence packing
    "span_dedup",
    "doc_freq_stats",
    "lm_perplexity",
    "pack_sequences",
    "normalize_text",
    "source_quota",
    # round-5 additions: domain rollup, paragraph-level dedup,
    # incremental cross-snapshot dedup
    "domain_profile",
    "paragraph_dedup",
    "dedup_incremental",
    "dsir_weights",
    # round-5: URL canonicalization + canonical-URL dedup, SemDeDup,
    # C4 line/page cleaning
    "canonical_urls",
    "url_dedup",
    "semdedup",
    "c4_line_filter",
    # round-5: intra-doc line dedup, length audit, hashed quality
    # classifier, URL blocklist gating
    "dedup_lines_in_doc",
    "length_histogram",
    "quality_classifier",
    "url_blocklist",
    # round-5: graded decontamination, CCNet terciles, centroids
    "contamination_frac",
    "ccnet_buckets",
    "label_centroids",
    # round-5 session 2: histogram buckets, external-model perplexity,
    # ExactSubstr stats/removal, SimHash pairs, UniMax, curation stack,
    # Bloom probe, fertility audit, sessionization, as-of join
    "ccnet_buckets_hist",
    "lm_perplexity_ext",
    "substring_dup_stats",
    "substring_dedup_clean",
    "simhash_near_dup",
    "unimax_budget",
    "curation_gate",
    "bloom_dedup_probe",
    "fertility_stats",
    "event_sessions",
    "asof_last_error",
    "range_band_join",
    "script_profile",
    "value_percentiles",
    "event_rate_windows",
    "props_field_stats",
    "orders_cube",
    "tpch_q6",
    "tpch_q12_like",
]

# The dedup/decontamination family re-benched on a REALISTIC-vocabulary
# corpus (Zipfian ~50k word types, scones/corpus.py:zipf_document_rows):
# on the driver testdata's 32-word vocab these queries measure shingle
# collisions, not the operator (round-3 verdict item 6).  Reported as
# "<name>@zipf" rows; the adversarial-corpus rows above stay as the
# worst-case record.
ZIPF_BENCH_QUERIES = [
    "dedup_exact",
    "top_terms",
    "minhash_signatures",
    "minhash_lsh_pairs",
    "ngram_jaccard_pairs",
    "dedup_near_keep_min",
    "dedup_components",
    "clean_corpus",
    "decontaminate",
    "simhash",
    "span_dedup",
    "lm_perplexity",
    # session 2: the window-hash dedup family is vocabulary-sensitive
    "substring_dup_stats",
    "substring_dedup_clean",
    "simhash_near_dup",
]


def ensure_zipf_corpus() -> str:
    """Generate (once, cached) the realistic-vocabulary documents table,
    sized like the sf documents table (sf0.1 → 5000 docs)."""
    from scones.corpus import write_zipf_documents

    n = max(500, int(50_000 * _SF))
    d = os.path.join(REPO, ".bench_corpus", f"zipf_n{n}")
    marker = os.path.join(d, "_DONE")
    if not os.path.exists(marker):
        write_zipf_documents(d, n_docs=n, seed=42)
        open(marker, "w").write("ok")
    return d


def ensure_corpus() -> tuple[str, str]:
    """Generate (once, cached) the bench corpus + host_meta."""
    from scones.corpus import write_corpus_sharded, write_host_meta

    tag = f"n{N_DOCS}"
    corpus_dir = os.path.join(REPO, ".bench_corpus", tag)
    meta_path = os.path.join(REPO, ".bench_corpus", "host_meta.parquet")
    marker = os.path.join(corpus_dir, "_DONE")
    if not os.path.exists(marker):
        write_corpus_sharded(corpus_dir, n_docs=N_DOCS, n_files=128, seed=42)
        open(marker, "w").write("ok")
    if not os.path.exists(meta_path):
        write_host_meta(meta_path, seed=42)
    return corpus_dir, meta_path


def reset_host_memory(drop_caches: bool = True) -> None:
    """Best-effort page-cache drop + compaction.

    Hours of prior JVM/worker churn fragment this VM's memory badly
    enough to halve measured throughput (buddy lists recover ~2.5x more
    high-order pages after compaction; measured 54k → 99k docs/s at
    local[32]).  Resetting makes BENCH_r{N} numbers a function of the
    code, not of what ran on the box earlier.  No-ops without root.
    ``drop_caches=False`` compacts only — used BETWEEN interleave passes,
    where evicting the hot corpus page cache would be measured as I/O.
    """
    try:
        os.sync()
        if drop_caches:
            with open("/proc/sys/vm/drop_caches", "w") as f:
                f.write("3")
        with open("/proc/sys/vm/compact_memory", "w") as f:
            f.write("1")
        time.sleep(1)
    except OSError:
        pass


class FlagshipServer:
    """A persistent bench_flagship subprocess for ONE parallelism level.

    The JVM launches (and AlwaysPreTouch-faults its heap) exactly once;
    each ``run()`` measures a fresh snapshot on the warm cluster.  Round
    3 finding: launching a fresh 12 GB pre-touched JVM per measurement
    cell (9 per bench) generates ~100 GB of page-fault traffic that
    itself decays this virtualized host MID-BENCH — persistent servers
    are both the realistic model (a 10^12-row job is a long-lived
    cluster) and the only way the interleave measures the code rather
    than the harness's own fault debt.
    """

    def __init__(
        self, master: str, corpus_dir: str, meta_path: str, runs: int = 2
    ) -> None:
        self.master = master
        self.proc = subprocess.Popen(
            [
                sys.executable,
                os.path.join(REPO, "tools", "bench_flagship.py"),
                "--master",
                master,
                "--corpus",
                corpus_dir,
                "--host-meta",
                meta_path,
                "--runs",
                str(runs),
                "--serve",
            ],
            stdin=subprocess.PIPE,
            stdout=subprocess.PIPE,
            stderr=subprocess.DEVNULL,
            text=True,
            bufsize=1,
            cwd=REPO,
        )
        self._read_json()  # ready line — JVM up, heap pre-touched

    # Generous per-cell ceiling: slowest legitimate cell is a local[2]
    # relaunch on a decayed host (JVM pre-touch ~2 min + 3 warmup-ish
    # runs ~3 min).  Round-3 incident: a local[2] JVM hung mid-job with
    # ZERO cpu (py4j call never answered), deadlocking the whole bench
    # for 40+ min — a hung server must be treated like a dead one.
    READ_TIMEOUT_SEC = 900

    def _read_json(self) -> dict:
        import queue
        import threading

        q: queue.Queue = queue.Queue()

        def rd() -> None:
            try:
                while True:
                    line = self.proc.stdout.readline()
                    if not line:
                        q.put(None)
                        return
                    line = line.strip()
                    if line.startswith("{"):
                        try:
                            q.put(json.loads(line))
                            return
                        except ValueError:
                            continue
            except Exception:
                q.put(None)

        threading.Thread(target=rd, daemon=True).start()
        try:
            result = q.get(timeout=self.READ_TIMEOUT_SEC)
        except queue.Empty:
            result = None
        if result is None:
            self.proc.kill()  # hung or dead either way: reap the JVM
            raise RuntimeError(f"flagship server {self.master} died or hung")
        return result

    def run(self) -> dict:
        self.proc.stdin.write("run\n")
        self.proc.stdin.flush()
        return self._read_json()

    def close(self) -> None:
        try:
            self.proc.stdin.write("exit\n")
            self.proc.stdin.flush()
            self.proc.wait(timeout=60)
        except Exception:
            self.proc.kill()


def run_cpu_probe(master: str, corpus_dir: str, runs: int = 4) -> dict:
    reset_host_memory()
    out = subprocess.run(
        [
            sys.executable,
            os.path.join(REPO, "tools", "bench_cpu.py"),
            "--master",
            master,
            "--corpus",
            corpus_dir,
            "--runs",
            str(runs),
        ],
        capture_output=True,
        text=True,
        check=True,
        cwd=REPO,
    )
    return json.loads(out.stdout.strip().splitlines()[-1])


def bench_queries(spark) -> tuple[dict[str, float], list[str]]:
    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    times: dict[str, float] = {}

    def timed(name: str, sf_dir: str, key: str) -> None:
        fn = qs.get(name)
        if fn is None:
            return
        df = fn(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()  # warm (plan+IO)
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        times[key] = round(time.perf_counter() - t0, 4)
        print(json.dumps({"bench_query": key, "sec": times[key]}), flush=True)

    for name in BENCH_QUERIES:
        timed(name, SF_DIR, name)
    zipf_dir = ensure_zipf_corpus()
    for name in ZIPF_BENCH_QUERIES:
        timed(name, zipf_dir, f"{name}@zipf")

    # Internal consistency guard (round-4 verdict item 2): the Zipf corpus
    # carries ~40× the text bytes of the sf documents table at equal row
    # count, so an sf row SLOWER than its @zipf row is physically
    # implausible — the signature of a multi-second host stall poisoning
    # the cell (seen in r4: minhash_signatures 20.1 s sf vs 11.2 s zipf on
    # unchanged code).  Re-measure such rows once (stalls are transient);
    # rows still implausible after the retry are flagged in the artifact
    # so a poisoned cell reads as SUSPECT, not as a code regression.
    # Material-gap threshold: sub-second rows are dominated by fixed
    # per-query overhead (plan + task-wave setup), where the "zipf
    # carries 40× the bytes" argument doesn't hold — a 0.22 s sf row vs
    # a 0.15 s zipf row is scheduling noise, not a stall.  The r4
    # pathology this guard exists for was 20.1 s vs 11.2 s.
    def implausible(sf_t: float, zipf_t: float) -> bool:
        return sf_t > max(2.0, 1.5 * zipf_t)

    suspects: list[str] = []
    for name in ZIPF_BENCH_QUERIES:
        zk = f"{name}@zipf"
        if name in times and zk in times and implausible(times[name], times[zk]):
            first = times[name]
            timed(name, SF_DIR, name)
            times[name] = min(first, times[name])
            if implausible(times[name], times[zk]):
                suspects.append(name)
    if suspects:
        print(json.dumps({"suspect_rows": suspects}), flush=True)
    return times, suspects


def main() -> None:
    sys.path.insert(0, REPO)
    # 12 GB heap: 6 GB measured 23% slower at local[32] (GC pressure with
    # 32 concurrent payload tasks) despite the cheaper AlwaysPreTouch.
    os.environ.setdefault("SCONES_DRIVER_MEM", "12g")
    corpus_dir, meta_path = ensure_corpus()

    # Per-query timings FIRST: they run in one local[CPUS] JVM on the
    # sf tables and are hostage to host state — measured on a fresh
    # host they are reproducible; measured after the flagship phase's
    # ~36 GB of JVM pre-touch traffic every number inflates 1.5-3×
    # (r3 A/B: even pure-JVM queries slowed 3× when timed last).  The
    # flagship phase resets host memory itself, so the order costs the
    # scaling measurement nothing.
    from scones.session import get_spark

    if os.environ.get("SCONES_BENCH_SKIP_QUERIES"):
        qtimes, suspects = {}, []  # flagship-only iteration runs; the
        # recorded artifact always includes the query phase
    else:
        reset_host_memory()
        spark = get_spark(
            master=f"local[{CPUS}]", app_name="scones-bench-queries"
        )
        qtimes, suspects = bench_queries(spark)
        spark.stop()

    # Three parallelism levels → two N→4N scaling pairs.  2→8 is the
    # bandwidth-unsaturated pair (the honest cluster-size proxy on this
    # single box); 8→32 additionally collides with the VM's shared-DRAM
    # ceiling (pure memcpy scales at only ~0.60 on this host — see
    # BENCH/BASELINE.md for the hardware-ceiling analysis).
    #
    # Interleaved-level protocol (round-2 verdict item 1): this host's
    # throughput decays over hours of JVM/worker churn (measured 4×
    # same-day swings on identical code), so measuring level 2 first and
    # level 32 last biases every ratio.  One persistent warm server per
    # level (JVM + pre-touch paid once — see FlagshipServer), then SIX
    # Latin-square passes (two full rotations of (2,8,32)/(8,32,2)/
    # (32,2,8)) so every level occupies every time slot; efficiencies
    # are computed per pass and the headline is their median.
    levels = [2, 8, CPUS]
    reset_host_memory()  # full reset once, before any JVM exists
    servers: dict[int, FlagshipServer] = {}
    # runs=4 per cell, best-of: a warm JVM that sat idle while the other
    # levels ran re-faults its pages on the first run (measured patterns
    # like [9.3, 3.0, 3.0] s) — the first run re-warms, best-of measures.
    # 4 (was 3 in r3): late-round-4 host decay produced passes where a
    # single sustained stall poisoned all three runs of a cell; a fourth
    # sample is cheap (~4 s/cell) and halves the chance a stall spans
    # the whole cell.
    cell_runs = int(os.environ.get("SCONES_BENCH_CELL_RUNS", "4"))
    for n in levels:  # sequential launch: one pre-touch fault storm at a time
        servers[n] = FlagshipServer(
            f"local[{n}]", corpus_dir, meta_path, runs=cell_runs
        )
    for n in levels:
        servers[n].run()  # warmup cell, discarded (JIT, python workers, cache)
    samples: dict[int, list[dict]] = {n: [] for n in levels}
    # 8 passes (was 6): the median needs a majority of clean passes;
    # with the host's multi-second stall events the extra two passes
    # cost ~80 s and buy two more chances to outvote a poisoned pass.
    n_passes = int(os.environ.get("SCONES_BENCH_PASSES", "8"))

    def run_cell(n: int) -> dict:
        """One (level, pass) measurement; if the level's server died
        (OOM-killed JVM, transient crash), relaunch it once so a single
        subprocess death costs one cell's warmup, not the whole graded
        artifact."""
        try:
            return servers[n].run()
        except Exception:
            servers[n].close()
            servers[n] = FlagshipServer(
                f"local[{n}]", corpus_dir, meta_path, runs=cell_runs
            )
            servers[n].run()  # warmup after relaunch, discarded
            return servers[n].run()

    for p_i in range(n_passes):
        shift = p_i % len(levels)
        for n in levels[shift:] + levels[:shift]:
            samples[n].append(run_cell(n))
        # no inter-pass compaction: page migration would evict the idle
        # servers' warm pages — the thing runs=3 exists to absorb
    for srv in servers.values():
        srv.close()
    import statistics as stats

    best = {
        n: max(runs, key=lambda r: r["docs_per_sec"])
        for n, runs in samples.items()
    }
    two, low, full = best[2], best[8], best[CPUS]

    def pass_effs(a: int, b: int, key: str) -> list[float]:
        """Per-pass efficiency of the a→b pair; the HEADLINE is their
        MEDIAN (per-pair medians over interleaved passes cancel drift —
        the round-2 verdict's prescribed protocol; a best-per-level
        ratio is biased when one level's freshest slot is fresher than
        the other's)."""
        return [
            round((samples[b][i][key] / samples[a][i][key]) / (b / a), 3)
            for i in range(len(samples[a]))
        ]

    eff_2_8_passes = pass_effs(2, 8, "docs_per_sec")
    eff_2_8 = stats.median(eff_2_8_passes)
    eff_8_full = stats.median(pass_effs(8, CPUS, "docs_per_sec"))
    # the parallel write phase alone (excludes serial driver plan/commit,
    # which a 10^12-row job amortizes to zero — Amdahl analysis in
    # BENCH/BASELINE.md)
    weff_2_8_passes = pass_effs(2, 8, "write_docs_per_sec")
    weff_2_8 = stats.median(weff_2_8_passes)
    weff_8_full = stats.median(pass_effs(8, CPUS, "write_docs_per_sec"))

    # supplementary: COMPUTE-bound scaling (no Python crossing, no sink
    # write) — the plan-quality signal with the host's shared-DRAM
    # ceiling factored out (flagship is memcpy-shaped; this is not)
    cpu8 = run_cpu_probe("local[8]", corpus_dir)
    cpu_full = run_cpu_probe(f"local[{CPUS}]", corpus_dir)
    cpu_eff = (cpu8["best_sec"] / cpu_full["best_sec"]) / (CPUS / 8)

    gb = full["payload_bytes"] / 1e9
    # Durable per-query record: a file, not the summary line (round-4
    # verdict item 1 — the driver's stdout tail window is finite).
    with open(os.path.join(REPO, "BENCH_QUERIES.json"), "w") as f:
        json.dump(
            {"sf": _SF, "queries": qtimes, "suspect_rows": suspects}, f, indent=1
        )
    # The final line keeps a "queries" dict per the driver contract, but
    # only a fixed HEADLINE subset so the line stays < ~1 KB no matter
    # how many operators the suite grows to.
    headline = [
        "tpch_q1",
        "route_counts",
        "lang_id",
        "dedup_exact",
        "minhash_signatures",
        "clean_corpus@zipf",
        "embedding_near_dup",
    ]
    print(
        json.dumps(
            {
                "metric": "end-to-end parse→enrich→route→aggregate throughput",
                "value": round(full["elapsed_sec"], 3),
                "unit": "sec",
                "queries": {k: qtimes[k] for k in headline if k in qtimes},
                "queries_file": "BENCH_QUERIES.json",
                "n_queries": len(qtimes),
                "suspect_rows": suspects,
                "sf": _SF,
                "corpus_docs": full["rows"],
                "docs_per_sec_2": round(two["docs_per_sec"], 1),
                "docs_per_sec_8": round(low["docs_per_sec"], 1),
                "docs_per_sec_full": round(full["docs_per_sec"], 1),
                "gb_per_sec_full": round(gb / full["elapsed_sec"], 4),
                "scaling_efficiency_2_to_8": round(eff_2_8, 3),
                "scaling_efficiency_2_to_8_per_pass": eff_2_8_passes,
                "write_phase_efficiency_2_to_8_per_pass": weff_2_8_passes,
                "scaling_efficiency_2_to_8_best_levels": round(
                    (low["docs_per_sec"] / two["docs_per_sec"]) / 4, 3
                ),
                "scaling_efficiency_8_to_full": round(eff_8_full, 3),
                "write_phase_efficiency_2_to_8": round(weff_2_8, 3),
                "write_phase_efficiency_8_to_full": round(weff_8_full, 3),
                "cpu_bound_efficiency_8_to_full": round(cpu_eff, 3),
                "cpu_bound_docs_per_sec_full": cpu_full["docs_per_sec"],
                "cpus_full": CPUS,
            }
        )
    )


if __name__ == "__main__":
    main()
