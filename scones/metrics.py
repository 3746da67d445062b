"""Run metrics via ``observe()`` (≈ reference statistics.go).

The reference keeps a global counter singleton — per-client lines_sent /
last_chunk_size, per-file position vs snapshot_position
(/root/reference/statistics.go:16-159) — served as JSON over HTTP
(statistics_server.go:16-39).  The Spark-native equivalent rides the job
itself: ``df.observe`` accumulates metrics inside the already-running
stages (zero extra pass), and the lineage table supplies the durable
"snapshot position" side, so backlog = observed rows − committed rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F


def observed(df: DataFrame, name: str = "scones_metrics"):
    """Attach standard pipeline metrics; returns (df, Observation).

    Read ``observation.get`` AFTER an action has run the plan.
    approx_count_distinct is the live-metrics path; the exact distinct
    lives in the correctness aggregate (route.sink_aggregates).
    """
    obs = Observation(name)
    out = df.observe(
        obs,
        F.count(F.lit(1)).alias("rows"),
        F.sum(F.length("extracted")).alias("payload_bytes"),
        F.approx_count_distinct("url").alias("approx_urls"),
    )
    return out, obs
