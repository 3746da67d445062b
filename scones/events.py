"""Batch event-stream operators over the ``events`` table.

The streaming side of sessionization lives in scones/streaming.py
(``applyInPandasWithState`` with event-time timeout); this module is its
BATCH twin — the backfill/replay path a lambda architecture runs over
the historical store.  Same session definition, so the two layers'
outputs are comparable.

Reference parity: the reference has no event semantics (it ships log
lines); sessionization is part of the "operations a large-scale
training-data/telemetry pipeline needs" surface, like the dedup family.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def sessionize_events(
    df: DataFrame,
    gap_minutes: int = 30,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """Gap-based batch sessionization: a session breaks when the pause
    since the user's previous event exceeds ``gap_minutes``.  Output is
    one row per (user, session): event count, first/last timestamps and
    the session duration in microseconds (integer — engine-exact).

    Scale shape: ONE exchange+sort on the user key serves both window
    passes (lag, then the running session counter — same partitioning
    and order, Spark reuses the sort), then a map-side-combinable
    rollup.  The window key is the USER (10^6-10^9 cardinality at
    production scale, AQE-balanced) — never a global order.  Ties on
    ``ts`` break by ``id_col``, so sessions are deterministic and
    retry-stable.
    """
    from pyspark.sql import Window

    w = Window.partitionBy(user_col).orderBy(
        F.col(ts_col).asc(), F.col(id_col).asc()
    )
    # timestampdiff, not unix_micros: the column is TIMESTAMP_NTZ and
    # the difference is timezone-free in both engines.
    flagged = df.withColumn("prev_ts", F.lag(ts_col).over(w)).withColumn(
        "new_session",
        F.when(
            F.col("prev_ts").isNull()
            | (
                F.expr(f"timestampdiff(MICROSECOND, prev_ts, {ts_col})")
                > gap_minutes * 60 * 1_000_000
            ),
            F.lit(1),
        )
        .otherwise(F.lit(0))
        .cast("bigint"),
    )
    counted = flagged.withColumn(
        "session_idx",
        F.sum("new_session").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    return (
        counted.groupBy(user_col, "session_idx")
        .agg(
            F.count("*").alias("n_events"),
            F.min(ts_col).alias("start_ts"),
            F.max(ts_col).alias("end_ts"),
        )
        .select(
            user_col,
            "session_idx",
            "n_events",
            "start_ts",
            "end_ts",
            F.expr("timestampdiff(MICROSECOND, start_ts, end_ts)").alias(
                "duration_us"
            ),
        )
    )
