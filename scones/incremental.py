"""Incremental cross-snapshot near-dup: dedup a NEW snapshot against a
committed corpus WITHOUT re-scanning (re-signaturing) it.

The committed corpus's LSH state is its banded minhash index — rows
``(doc_id, band, band_hash)`` from :func:`scones.textops.minhash_bands`
— persisted as a routed side table at commit time.  A later snapshot
then:

1. signatures only its OWN documents (the daily delta, not the corpus),
2. probes the persisted index with a bucket join for new-vs-committed
   candidates plus a self-join for new-vs-new candidates,
3. exact-verifies candidates with true shingle Jaccard, touching
   committed TEXT only for the candidate doc ids (a pruned point lookup
   — at scale the corpus is routed/bucketed by doc_id, so this reads a
   vanishing fraction of it; what is never redone is the full-corpus
   signature/banding scan).

``incremental_lsh_pairs(new, committed) ∪ committed_pairs`` reproduces
``minhash_lsh_pairs(new ∪ committed)`` exactly (same bands, same
verify), which is the correctness oracle: the full-union LSH replay.

This is the daily 100 TB ingest loop: yesterday's index is O(corpus)
but append-only and written once per commit; today's work is
O(delta + candidates).

Reference parity: this generalizes the reference's "skip files the
registrar already consumed" admission control (registrar.go:34-60,
butteredscones.go:150-210) from file granularity to document-content
granularity — the committed corpus is never re-read wholesale, exactly
as the reference never re-tails a file recorded in its lineage DB.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from scones.textops import minhash_bands, verify_candidate_pairs

BAND_INDEX_SUBDIR = "band_index"


def write_band_index(
    docs: DataFrame,
    index_dir: str,
    num_hashes: int = 8,
    band_size: int = 2,
    k: int = 3,
) -> None:
    """Persist the banded minhash index for ``docs`` as a parquet side
    table partitioned by ``band`` (so a probe of band b prunes to its
    own partition — the "routed" layout, same idea as the sink router).

    Idempotent per corpus commit: overwrite semantics, so a retried
    commit rewrites the same deterministic rows.
    """
    bands = minhash_bands(docs, num_hashes, band_size, k)
    (
        bands.repartition("band")
        .write.mode("overwrite")
        .partitionBy("band")
        .parquet(index_dir)
    )


def read_band_index(spark: SparkSession, *index_dirs: str) -> DataFrame:
    return spark.read.parquet(*index_dirs).select(
        "doc_id", "band", "band_hash"
    )


def incremental_candidates(
    new_docs: DataFrame,
    committed_bands: DataFrame | None,
    num_hashes: int = 8,
    band_size: int = 2,
    k: int = 3,
) -> DataFrame:
    """LSH candidate pairs introduced by the new snapshot: new-vs-new
    (self-join on the new bands) plus new-vs-committed (bucket join of
    new bands against the PERSISTED index — the committed corpus itself
    is untouched here; assert with ``df.inputFiles()``).

    Pairs are normalized ``doc_a < doc_b`` so the union with the
    committed corpus's own (already known) pairs bit-matches a full
    ``minhash_lsh_pairs`` run over the union.
    """
    new_bands = minhash_bands(new_docs, num_hashes, band_size, k)
    a = new_bands.alias("a")
    b = new_bands.alias("b")
    nn = (
        a.join(b, on=["band", "band_hash"])
        .where(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
    )
    if committed_bands is None:  # first snapshot: nothing to probe
        return nn.distinct()
    c = committed_bands.alias("c")
    nc = (
        a.join(c, on=["band", "band_hash"])
        .where(F.col("a.doc_id") != F.col("c.doc_id"))
        .select(
            F.least("a.doc_id", "c.doc_id").alias("doc_a"),
            F.greatest("a.doc_id", "c.doc_id").alias("doc_b"),
        )
    )
    return nn.unionByName(nc).distinct()


def incremental_lsh_pairs(
    new_docs: DataFrame,
    committed_docs: DataFrame,
    committed_bands: DataFrame,
    num_hashes: int = 8,
    band_size: int = 2,
    k: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """Verified near-dup pairs ``(doc_a, doc_b, jaccard)`` introduced by
    the new snapshot (at least one side new).  ``committed_docs`` is
    consulted ONLY to fetch candidate texts for exact verification — a
    per-candidate point lookup, not a scan-shaped dependency.
    """
    cands = incremental_candidates(
        new_docs, committed_bands, num_hashes, band_size, k
    )
    universe = new_docs.select("doc_id", "text").unionByName(
        committed_docs.select("doc_id", "text")
    )
    return verify_candidate_pairs(cands, universe, k, threshold)


def pipeline_doc_view(written: DataFrame, snapshot_id: int) -> DataFrame:
    """(doc_id, text) view of a routed pipeline snapshot: doc identity is
    snapshot-qualified (``"<snapshot_id>#<url>"``) so the SAME url
    re-ingested by a later snapshot is two distinct documents whose
    near-duplicity gets REPORTED — exactly the daily-crawl case the
    operator exists for."""
    return written.select(
        F.concat_ws("#", F.lit(str(snapshot_id)), F.col("url")).alias(
            "doc_id"
        ),
        F.col("extracted").cast("string").alias("text"),
    )


def update_index_and_probe(
    spark: SparkSession,
    checkpoint_dir: str,
    output_dir: str,
    snapshot_id: int,
    written: DataFrame,
    committed_ids: list[int],
    num_hashes: int = 8,
    band_size: int = 2,
    k: int = 3,
    threshold: float = 0.5,
) -> dict:
    """The pipeline-commit hook: persist this snapshot's band index and
    report near-dup pairs it introduces against the committed corpus.

    Runs AFTER the sink write, BEFORE the lineage commit — both outputs
    are deterministic overwrites, so a crash-retry of the snapshot
    rewrites identical files (effectively-once holds).  Committed
    snapshots that predate ``dedup_index`` being enabled simply have no
    index directory and are skipped (documented: enable-from-now-on).

    Cost shape at 100 TB: signatures/banding scan ONLY this snapshot's
    delta; the committed corpus contributes its (tiny, band-routed)
    index rows to the bucket join plus point lookups of candidate texts
    for exact verification.
    """
    idx_root = os.path.join(checkpoint_dir, "band_index")
    new_docs = pipeline_doc_view(written, snapshot_id)
    write_band_index(
        new_docs,
        os.path.join(idx_root, f"snapshot_id={snapshot_id}"),
        num_hashes,
        band_size,
        k,
    )
    committed_idx_dirs = [
        os.path.join(idx_root, f"snapshot_id={sid}")
        for sid in committed_ids
        if os.path.isdir(os.path.join(idx_root, f"snapshot_id={sid}"))
    ]
    committed_bands = (
        read_band_index(spark, *committed_idx_dirs)
        if committed_idx_dirs
        else None
    )
    cands = incremental_candidates(
        new_docs, committed_bands, num_hashes, band_size, k
    )
    universe = new_docs
    for sid in committed_ids:
        d = os.path.join(output_dir, f"snapshot_id={sid}")
        if os.path.isdir(d):
            universe = universe.unionByName(
                pipeline_doc_view(spark.read.parquet(d), sid)
            )
    pairs = verify_candidate_pairs(cands, universe, k, threshold)
    pairs_dir = os.path.join(
        checkpoint_dir, "near_dups", f"snapshot_id={snapshot_id}"
    )
    pairs.write.mode("overwrite").parquet(pairs_dir)
    n = spark.read.parquet(pairs_dir).count()
    return {"n_near_dup_pairs": int(n), "near_dups": pairs_dir}


def commit_snapshot_with_index(
    docs: DataFrame,
    root: str,
    snapshot_id: int,
    num_hashes: int = 8,
    band_size: int = 2,
    k: int = 3,
) -> str:
    """Commit a corpus snapshot: write its documents AND its band-index
    side table under ``root/snapshot=NNN/``.  Later snapshots dedup
    against the union of committed indexes without re-reading committed
    document text (except candidate verification lookups).
    """
    snap_dir = os.path.join(root, f"snapshot={snapshot_id:06d}")
    docs.write.mode("overwrite").parquet(os.path.join(snap_dir, "documents"))
    write_band_index(
        docs,
        os.path.join(snap_dir, BAND_INDEX_SUBDIR),
        num_hashes,
        band_size,
        k,
    )
    return snap_dir
