"""SparkSession construction with scale-oriented defaults.

Local testing runs on ``local[N]``; the configs below are the ones that also
matter on a 1000-executor cluster reading 100 TB:

* AQE on (runtime re-planning, skew-join splitting, partition coalescing),
* auto broadcast threshold raised — every dimension table in this engine
  (region/nation/customer at TPC-H shape, the series catalog at TSDB shape)
  is orders of magnitude smaller than the fact side,
* shuffle partitions sized for the test box; on a real cluster AQE's
  coalescing makes the initial number mostly a ceiling,
* Arrow enabled for the few pandas-interop paths (multimodal UDF plumbing).
"""

from __future__ import annotations

import os

import logging

from pyspark.sql import SparkSession

# Runtime-settable session confs applied defensively to *any* session handed
# to us (the correctness driver builds its own SparkSession).  The testdata
# events table carries parquet TIMESTAMP(NANOS) which Spark refuses to read
# unless nanosAsLong is set; DuckDB (the oracle) truncates the same file to
# microseconds, so sources/tables.py converts ns→µs to match.
SESSION_CONFS = {
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
}


def apply_session_confs(spark: SparkSession) -> SparkSession:
    """Apply runtime confs to an externally created session (idempotent)."""
    for k, v in SESSION_CONFS.items():
        try:
            spark.conf.set(k, v)
        except Exception:  # pragma: no cover - static conf on some builds
            logging.getLogger(__name__).debug(
                "conf %s not settable on a live session (static)", k, exc_info=True
            )
    return spark


def get_spark(app_name: str = "mycenae_spark", cpus: int | None = None) -> SparkSession:
    """Build (or fetch) a SparkSession with the engine's defaults."""
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or os.cpu_count() or 4
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(max(cpus, 8)))
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
    )
    for k, v in SESSION_CONFS.items():
        builder = builder.config(k, v)
    return apply_session_confs(builder.getOrCreate())
