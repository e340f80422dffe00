"""await_or_raise: the sink-read-race guard every judged streaming
roundtrip drains through (r12 VERDICT "What's wrong #1").

``awaitTermination(t)`` returning False leaves the query RUNNING; a
roundtrip that then reads its sink hashes a partial result as a wrong
count.  The helper converts that into a diagnosable TimeoutError and
stops the job.  Tested two ways: a fake (exact contract: stop called,
nothing swallowed) and a real deliberately-slow availableNow job (the
integration shape the registry uses).
"""

from __future__ import annotations

import time

import pytest

from mycenae_spark.registry.util import await_or_raise


class _FakeJob:
    def __init__(self, drained: bool):
        self.drained = drained
        self.stopped = False

    def awaitTermination(self, seconds):
        return self.drained

    def stop(self):
        self.stopped = True


def test_drained_job_passes_through():
    job = _FakeJob(drained=True)
    await_or_raise(job, 5, "ok job")
    assert not job.stopped


def test_timeout_raises_and_stops():
    job = _FakeJob(drained=False)
    with pytest.raises(TimeoutError, match="slow job"):
        await_or_raise(job, 1, "slow job")
    assert job.stopped


def test_stop_failure_does_not_mask_timeout():
    class _Stuck(_FakeJob):
        def stop(self):
            raise RuntimeError("stop failed")

    with pytest.raises(TimeoutError):
        await_or_raise(_Stuck(drained=False), 1, "stuck job")


def test_real_slow_job_raises_not_partial(spark, tmp_path):
    """A genuinely slow availableNow run must raise, never hand back a
    half-written sink.  The slow stage is a per-row sleep UDF (test-only;
    registry code never uses row UDFs)."""
    import pyspark.sql.functions as F
    from pyspark.sql.types import LongType

    src = str(tmp_path / "src")
    spark.range(8).coalesce(1).write.mode("overwrite").parquet(src)

    @F.udf(LongType())
    def slow(x):
        time.sleep(1.0)
        return x

    stream = (
        spark.readStream.schema("id long").parquet(src).select(slow("id").alias("id"))
    )
    job = (
        stream.writeStream.format("memory")
        .queryName("await_guard_sink")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    try:
        with pytest.raises(TimeoutError):
            await_or_raise(job, 1, "deliberately slow job")
        # the guard stopped the query: no caller can read a partial sink
        # from a still-running job
        deadline = time.time() + 30
        while job.isActive and time.time() < deadline:
            time.sleep(0.2)
        assert not job.isActive
    finally:
        if job.isActive:
            job.stop()
        spark.catalog.dropTempView("await_guard_sink")
