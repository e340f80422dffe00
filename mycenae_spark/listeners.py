"""Real network listeners for the datagram/line ingest paths (SURVEY.md
§2.1 S3/S4; upstream ``lib/udp`` and ``lib/telnet``).

Spark has no UDP/TCP streaming source, and a custom DataSourceV2 receiver
would pin ingest to one executor anyway.  The scalable shape — and the one
the reference itself uses via its OS-level socket fan-in — is a tier of
tiny stateless listener processes that land lines durably, with Spark
tailing the landing zone:

    UDP datagrams ─┐
                   ├─> spool dir (atomic file renames) ─> readStream(text)
    telnet lines ──┘        └ decode_{json,opentsdb,netdata}_lines → lake

Listeners write each flush to ``<spool>/.tmp-*`` and ``os.rename`` it in —
Spark's file source lists only completed files (dot-prefixed temps are
ignored), so a reader never sees a partial datagram.  At scale you run N
listeners behind a UDP/TCP load-balancer all renaming into the same
object-store prefix; the Spark job is unchanged (`maxFilesPerTrigger`
throttles).  Fire-and-forget semantics match the reference: a datagram
lost before the rename is lost — upstream UDP ingest makes the same trade.

These are stdlib-socket threads, deliberately boring; all data semantics
live in streaming/ingest.py's decoders.
"""

from __future__ import annotations

import os
import socket
import socketserver
import threading
import uuid


class _Spool:
    """Batched line writer with atomic publish into a spool directory."""

    def __init__(self, spool_dir: str, flush_lines: int = 1000):
        self.spool_dir = spool_dir
        self.flush_lines = flush_lines
        self._buf: list[str] = []
        self._lock = threading.Lock()
        os.makedirs(spool_dir, exist_ok=True)

    def add(self, line: str) -> None:
        with self._lock:
            self._buf.append(line)
            if len(self._buf) >= self.flush_lines:
                self._flush_locked()

    def flush(self) -> None:
        with self._lock:
            self._flush_locked()

    def _flush_locked(self) -> None:
        if not self._buf:
            return
        name = uuid.uuid4().hex
        tmp = os.path.join(self.spool_dir, f".tmp-{name}")
        with open(tmp, "w") as f:
            f.write("\n".join(self._buf) + "\n")
        os.rename(tmp, os.path.join(self.spool_dir, f"{name}.txt"))
        self._buf.clear()


class UdpListener:
    """S3: JSON-point-per-datagram UDP ingest (upstream ``lib/udp``).

    One datagram = one point; no reply, no retry — at-most-once until the
    spool rename, exactly-once downstream of it (file-sink checkpointing).
    """

    def __init__(self, spool_dir: str, host: str = "127.0.0.1", port: int = 0,
                 flush_lines: int = 1000):
        self.spool = _Spool(spool_dir, flush_lines)
        self._sock = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
        self._sock.bind((host, port))
        self._sock.settimeout(0.2)
        self.address = self._sock.getsockname()
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._serve, daemon=True)
        self._thread.start()

    def _serve(self) -> None:
        while not self._stop.is_set():
            try:
                data, _ = self._sock.recvfrom(65536)
            except socket.timeout:
                continue
            except OSError:
                break
            line = data.decode("utf-8", errors="replace").strip()
            if line:
                self.spool.add(line)

    def stop(self) -> None:
        self._stop.set()
        self._thread.join(timeout=5)
        self._sock.close()
        self.spool.flush()


class _TelnetHandler(socketserver.StreamRequestHandler):
    def handle(self) -> None:
        for raw in self.rfile:
            line = raw.decode("utf-8", errors="replace").strip()
            if not line:
                continue
            # OpenTSDB telnet control command; everything else (put lines,
            # netdata JSON lines) spools verbatim for the decoders.
            if line == "version":
                self.wfile.write(b"mycenae-spark\n")
                continue
            self.server.spool.add(line)  # type: ignore[attr-defined]


class TelnetListener:
    """S4: line-protocol TCP ingest (upstream ``lib/telnet``) — accepts
    OpenTSDB ``put`` lines and netdata JSON lines; which decoder consumes
    the spool is the ingest job's ``fmt`` choice."""

    def __init__(self, spool_dir: str, host: str = "127.0.0.1", port: int = 0,
                 flush_lines: int = 1000):
        self.spool = _Spool(spool_dir, flush_lines)
        self._server = socketserver.ThreadingTCPServer(
            (host, port), _TelnetHandler, bind_and_activate=True
        )
        self._server.daemon_threads = True
        self._server.spool = self.spool  # type: ignore[attr-defined]
        self.address = self._server.server_address
        self._thread = threading.Thread(
            target=self._server.serve_forever, daemon=True
        )
        self._thread.start()

    def stop(self) -> None:
        self._server.shutdown()
        self._server.server_close()
        self.spool.flush()
