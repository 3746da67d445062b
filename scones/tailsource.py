"""Raw log-file tail source: byte-offset incremental reads of GROWING files.

This is the closest structural parity with the reference's actual loop:
``filepath.Glob`` discovery (supervisor.go:253-282), skip files whose
``size <= high-water mark`` (supervisor.go:308-313), ``Seek(hwm)`` and
frame forward (file_reader.go:57-93), record = {line, host, file, offset}
(file_reader.go:105-120), commit new offsets only after the sinks accept
the batch (supervisor.go:210-249).

Spark-side: the driver plans (file, start, end) work units from the
lineage store and the file sizes observed at plan time; the mapInArrow
kernel OPENS AND SEEKS each file and reads only ``end - start`` bytes —
the reference's ``Seek(hwm)`` contract (supervisor.go:315).  A 10 GB
log that grew by 2 MB costs 2 MB of I/O per snapshot, not 10 GB (the
round-1 ``binaryFile`` implementation re-read the whole file; the
bytes-read invariant is pinned in tests/test_tailsource.py).  Framing
keeps the exact reference semantics: CRLF trim, skip-but-advance,
partial-line rule.

Offset semantics (matches the reference's BoltDB HWM): the committed
``offset_end`` is the framed-byte position after the last COMPLETE line,
including lines skipped by max_length — a file whose new bytes are all
over-long lines still advances, so it is not re-read every snapshot.
Every emitted row carries ``frame_end`` (that position) and
``bytes_read`` (actual ranged-read cost); a file that framed zero
emittable lines but still advanced produces one sentinel row
(line IS NULL) so the advance can be committed.  Data readers filter
``line IS NOT NULL``.

Scale note: one work unit = one task.  Parallelism comes from the file
count — same as the reference, which also reads each file with a single
sequential reader.  Giant single files would be split by planning
multiple (file, start, end) ranges aligned to newline scans; not needed
for log-shipping workloads.
"""

from __future__ import annotations

import glob as globmod
import os
from collections.abc import Iterator

import pyarrow as pa
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .lineage import LineageStore

LINE_SCHEMA = (
    "src_file string, line binary, hwm bigint, line_no bigint, "
    "frame_end bigint, bytes_read bigint, unit_start bigint"
)


def plan_tail_work(store: LineageStore, input_glob: str) -> list[tuple[str, int]]:
    """(file, start_offset) units: new files start at 0; grown files at
    their committed high-water mark; fully-consumed files are skipped
    (size <= hwm — supervisor.go:308-313)."""
    lineage = store.read_all().to_pylist()
    hwm: dict[str, int] = {}
    for r in lineage:
        hwm[r["src_file"]] = max(hwm.get(r["src_file"], 0), r["offset_end"])
    work = []
    for path in sorted(globmod.glob(input_glob)):
        start = hwm.get(path, 0)
        if os.path.getsize(path) > start:
            work.append((path, start))
    return work


def split_work_units(
    work: list[tuple[str, int]], max_range_bytes: int = 0
) -> list[tuple[str, int, int, bool]]:
    """(file, start, end, aligned) units; giant files split into ranges.

    With ``max_range_bytes`` > 0 a single multi-GB file parallelizes
    across tasks (the reference is strictly one reader per file).  Line
    ownership at boundaries follows the TextInputFormat rule: a line
    belongs to the unit containing its FIRST byte; a non-aligned unit
    scans forward past its first newline, and every unit reads past its
    end to finish its last straddling line — byte-exact equivalence with
    single-unit framing is pinned by tests/test_tailsource.py.

    ``aligned`` = start is a known line boundary (the committed hwm /
    file start); non-aligned units must newline-sync first.
    """
    units: list[tuple[str, int, int, bool]] = []
    for path, start in work:
        end = os.path.getsize(path)
        if max_range_bytes <= 0 or end - start <= max_range_bytes:
            units.append((path, start, end, True))
            continue
        pos = start
        first = True
        while pos < end:
            units.append((path, pos, min(pos + max_range_bytes, end), first))
            pos += max_range_bytes
            first = False
    return units


def read_tail(
    spark: SparkSession,
    work: list[tuple[str, int]],
    max_length: int = 0,
    max_range_bytes: int = 0,
) -> DataFrame:
    """One row per newly-framed line across all work units, plus one
    sentinel row (line IS NULL) per unit whose frame advanced without
    emitting lines.

    The end offset is pinned at plan time (current size), so a file
    growing mid-job still yields a consistent snapshot; bytes past
    ``end`` are next snapshot's work.  ``max_range_bytes`` > 0 splits
    giant files into parallel units (see :func:`split_work_units` for
    the boundary-ownership rule).
    """
    units = split_work_units(work, max_range_bytes)

    def run(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in batches:
            paths = batch.column("src_file").to_pylist()
            starts = batch.column("start").to_pylist()
            ends = batch.column("end").to_pylist()
            aligneds = batch.column("aligned").to_pylist()
            out_f: list[str] = []
            out_l: list[bytes | None] = []
            out_h: list[int] = []
            out_n: list[int] = []
            out_fe: list[int] = []
            out_br: list[int] = []
            out_us: list[int] = []  # planned unit start: the per-unit key
            # for exact I/O accounting when range splitting is on (two
            # units of one file can read identical byte counts, so
            # bytes_read alone can't identify a unit — round-2 advice)
            for path, start, end, aligned in zip(paths, starts, ends, aligneds):
                # the Seek contract: read ONLY the planned byte range
                # (+1 sync byte for non-aligned units, + overshoot to
                # finish the straddling last owned line)
                read_from = start if aligned else start - 1
                with open(path, "rb") as fh:
                    fh.seek(read_from)
                    buf = fh.read(end - read_from)
                    # extend until the newline that terminates the line
                    # containing byte end-1 (the straddler) is in view
                    while buf.find(b"\n", max(end - read_from - 1, 0)) < 0:
                        more = fh.read(1 << 20)
                        if not more:
                            break
                        buf += more
                bytes_read = len(buf)
                cursor = 0
                if not aligned:
                    # first owned line starts after the first newline at
                    # abs pos >= start-1 (TextInputFormat ownership rule)
                    nl0 = buf.find(b"\n")
                    if nl0 < 0 or read_from + nl0 + 1 >= end:
                        continue  # no line starts inside this unit
                    cursor = nl0 + 1
                pos = read_from + cursor  # absolute framed position
                unit_start = pos
                line_no = 0
                emitted_before = len(out_f)
                while read_from + cursor < end:
                    nl = buf.find(b"\n", cursor)
                    if nl < 0:
                        break  # partial tail at EOF: not emitted
                    raw_len = nl + 1 - cursor
                    pos += raw_len
                    if not (max_length > 0 and raw_len > max_length):
                        out_f.append(path)
                        out_l.append(buf[cursor:nl].rstrip(b"\r\n"))
                        out_h.append(pos)
                        line_no += 1
                        out_n.append(line_no)
                    cursor = nl + 1
                frame_end = pos  # after last complete owned line
                n_emitted = len(out_f) - emitted_before
                if n_emitted == 0:
                    if frame_end > unit_start:
                        # all-owned-lines-skipped: sentinel row carries
                        # the advance so the offset still commits
                        out_f.append(path)
                        out_l.append(None)
                        out_h.append(unit_start)
                        out_n.append(0)
                    else:
                        continue  # nothing owned/complete in this unit
                    out_fe.append(frame_end)
                    out_br.append(bytes_read)
                    out_us.append(start)
                else:
                    out_fe.extend([frame_end] * n_emitted)
                    out_br.extend([bytes_read] * n_emitted)
                    out_us.extend([start] * n_emitted)
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(out_f, pa.string()),
                    pa.array(out_l, pa.binary()),
                    pa.array(out_h, pa.int64()),
                    pa.array(out_n, pa.int64()),
                    pa.array(out_fe, pa.int64()),
                    pa.array(out_br, pa.int64()),
                    pa.array(out_us, pa.int64()),
                ],
                [
                    "src_file",
                    "line",
                    "hwm",
                    "line_no",
                    "frame_end",
                    "bytes_read",
                    "unit_start",
                ],
            )

    plan_df = spark.createDataFrame(
        units, "src_file string, start bigint, end bigint, aligned boolean"
    ).repartition(max(len(units), 1))
    return plan_df.mapInArrow(run, LINE_SCHEMA)


def run_tail_snapshot(
    spark: SparkSession,
    input_glob: str,
    output_dir: str,
    checkpoint_dir: str,
    n_sinks: int = 2,
    max_length: int = 0,
    max_range_bytes: int = 0,
    fail_before_commit: bool = False,
) -> dict:
    """One incremental tail snapshot: frame new bytes → decorate
    (host, line_str) → route by crc32(file|hwm) → write → commit offsets.

    The route key (src_file, hwm) is unique per line and a pure function
    of content+provenance — deterministic under retries, unlike the
    reference's competing-consumer chunk pickup."""
    store = LineageStore(checkpoint_dir)
    store.fence_attempt()  # fence out any abandoned watchdog attempt
    work = plan_tail_work(store, input_glob)
    if not work:
        return {"snapshot_id": None, "lines": 0}
    snapshot_id = store.next_snapshot_id()

    lines = read_tail(
        spark, work, max_length=max_length, max_range_bytes=max_range_bytes
    )
    hostname = os.uname().nodename
    routed = lines.select(
        "src_file",
        "line",
        F.col("line").cast("string").alias("line_str"),
        "hwm",
        "line_no",
        "frame_end",
        "bytes_read",
        "unit_start",
        F.lit(hostname).alias("host"),
        F.pmod(
            F.crc32(F.encode(F.concat("src_file", F.lit("@"), F.col("hwm").cast("string")), "utf-8")),
            F.lit(n_sinks),
        ).cast("int").alias("sink_id"),
    )
    snap_dir = os.path.join(output_dir, f"snapshot_id={snapshot_id}")
    routed.write.mode("overwrite").partitionBy("sink_id").parquet(snap_dir)

    written = spark.read.parquet(snap_dir)
    # exact I/O accounting with range splitting: bytes_read is constant
    # within a unit, so max-per-unit → sum-per-file is the total bytes
    # the snapshot actually read from that file (round-2 advice: a bare
    # per-file max reported one unit's cost when max_range_bytes > 0)
    agg = (
        written.groupBy("src_file", "unit_start")
        .agg(
            F.count(F.col("line")).alias("n"),  # sentinels don't count
            F.max("frame_end").alias("frame_end"),
            F.max("bytes_read").alias("bytes_read"),
        )
        .groupBy("src_file")
        .agg(
            F.sum("n").alias("n"),
            F.max("frame_end").alias("frame_end"),
            F.sum("bytes_read").alias("bytes_read"),
        )
        .collect()
    )
    if fail_before_commit:
        raise RuntimeError("injected crash between sink write and offset commit")
    starts = dict(work)
    rows = [
        {
            "snapshot_id": snapshot_id,
            "src_file": r["src_file"],
            "offset_start": starts.get(r["src_file"], 0),
            "offset_end": int(r["frame_end"]),
            "row_count": int(r["n"]),
        }
        for r in agg
    ]
    # files whose new bytes framed nothing complete (only a partial tail)
    # emit no rows at all — no lineage row, replanned next snapshot (the
    # ranged read makes that re-plan cost just the partial bytes).
    store.commit(snapshot_id, rows)
    return {
        "snapshot_id": snapshot_id,
        "lines": int(sum(r["row_count"] for r in rows)),
        "files": [f for f, _ in work],
        "output": snap_dir,
        "bytes_read": {r["src_file"]: int(r["bytes_read"]) for r in agg},
    }
