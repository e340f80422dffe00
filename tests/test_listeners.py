"""Real-socket ingest listeners (S3 UDP, S4 telnet): datagrams/lines in,
points in the partitioned lake out — through the same spool-dir → file-stream
→ decoder → foreachBatch pipeline production would run."""

from __future__ import annotations

import json
import socket
import time

import pyspark.sql.functions as F

from mycenae_spark.listeners import TelnetListener, UdpListener
from mycenae_spark.streaming.ingest import start_ingest

BASE_TS = 1704067200000


def _wait_for_spool(listener, n_expected_lines, timeout=10):
    """Datagram delivery is async; poll until the listener buffered all."""
    deadline = time.time() + timeout
    while time.time() < deadline:
        with listener.spool._lock:
            if len(listener.spool._buf) >= n_expected_lines:
                return
        time.sleep(0.05)


def test_udp_datagrams_to_lake(spark, tmp_path):
    spool = str(tmp_path / "spool")
    lis = UdpListener(spool)
    try:
        sock = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
        points = [
            {"metric": "udp.metric", "tags": {"ksid": "k1", "host": f"h{i}"},
             "timestamp": BASE_TS + i, "value": float(i)}
            for i in range(5)
        ]
        for p in points:
            sock.sendto(json.dumps(p).encode(), lis.address)
        sock.close()
        _wait_for_spool(lis, 5)
    finally:
        lis.stop()  # flush publishes the spool file atomically

    lake, catalog, ck = (str(tmp_path / d) for d in ("lake", "catalog", "ck"))
    q = start_ingest(spark, spool, lake, catalog, ck, fmt="json")
    q.awaitTermination(120)
    got = spark.read.parquet(lake)
    assert got.count() == 5
    assert got.select(F.sum("value")).collect()[0][0] == 10.0


def test_telnet_put_lines_to_lake(spark, tmp_path):
    spool = str(tmp_path / "spool")
    lis = TelnetListener(spool)
    try:
        with socket.create_connection(lis.address, timeout=5) as conn:
            f = conn.makefile("rw")
            f.write("version\n")
            f.flush()
            assert "mycenae" in f.readline()
            for i in range(4):
                f.write(
                    f"put tcp.metric {BASE_TS + i} {float(i)} ksid=k1 host=h{i % 2}\n"
                )
            f.write("not a put line\n")  # dropped by the decoder, not the socket
            f.flush()
        _wait_for_spool(lis, 5)
    finally:
        lis.stop()

    lake, catalog, ck = (str(tmp_path / d) for d in ("lake", "catalog", "ck"))
    q = start_ingest(spark, spool, lake, catalog, ck, fmt="opentsdb")
    q.awaitTermination(120)
    got = spark.read.parquet(lake)
    assert got.count() == 4
    assert {r["tsid"] for r in got.collect()} and got.filter(
        F.col("tags").getItem("host") == "h0"
    ).count() == 2


def test_spool_never_exposes_partial_files(tmp_path):
    """The file-stream contract: only completed (renamed) files are visible;
    in-flight writes are dot-prefixed temps Spark's listing ignores."""
    import os

    from mycenae_spark.listeners import _Spool

    spool = _Spool(str(tmp_path / "s"), flush_lines=3)
    spool.add("a")
    spool.add("b")
    assert os.listdir(spool.spool_dir) == []  # buffered, nothing published
    spool.add("c")  # hits flush_lines -> atomic publish
    names = os.listdir(spool.spool_dir)
    assert len(names) == 1 and names[0].endswith(".txt")
    assert open(os.path.join(spool.spool_dir, names[0])).read() == "a\nb\nc\n"
