"""OpenTSDB-compatible HTTP façade (SURVEY.md §3; upstream REST layer).

A thin stdlib HTTP server over the engine — the endpoints a mycenae client
already speaks, backed by the Parquet lake + planner:

* ``POST /api/put``                     — numeric points (JSON array or object)
* ``POST /api/text/put``                — text points
* ``POST /keysets/{ks}/api/query``      — OpenTSDB query JSON
* ``GET  /keysets/{ks}/api/query/expression?exp=...`` — expression query
* ``POST /api/expression/check``        — validate an expression
* ``GET  /api/suggest?type=metrics&q=p&max=N``
* ``GET  /api/aggregators`` / ``GET /api/config/filters``

The server is deliberately driver-side thin: every request body is parsed in
Python, but all data work is a Spark plan over the lake.  Ingest here is the
synchronous batch path (per-request append + catalog merge) matching the
HTTP semantics; high-volume ingest uses streaming/ingest.py.

Not a production webserver (single-threaded stdlib handler) — it exists to
make API parity concrete and end-to-end testable.
"""

from __future__ import annotations

import json
import re
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from threading import Thread
from urllib.parse import parse_qs, urlparse

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from mycenae_spark.api import (
    AGGREGATORS_ENDPOINT,
    FILTERS_ENDPOINT,
    parse_query_request,
    render_json,
    shape_response,
)
from mycenae_spark.plans.expression import check_expression, parse_expression
from mycenae_spark.plans.tsdb import plan
from mycenae_spark.schema import POINT_SCHEMA
from mycenae_spark.streaming.ingest import prepare_points


class Engine:
    """Lake-backed query/ingest engine shared by all requests."""

    def __init__(self, spark: SparkSession, lake_dir: str, catalog_dir: str):
        self.spark = spark
        self.lake_dir = lake_dir
        self.catalog_dir = catalog_dir

    # -- ingest -----------------------------------------------------------

    def put(self, body, text_mode: bool = False) -> dict:
        points = body if isinstance(body, list) else [body]
        raw = self.spark.createDataFrame(
            [(json.dumps(p),) for p in points], ["value"]
        )
        decoded = raw.select(
            F.from_json(F.col("value"), POINT_SCHEMA).alias("p")
        ).select("p.*")
        valid, invalid = prepare_points(decoded)
        n_bad = invalid.count()
        from mycenae_spark.streaming.ingest import write_points_batch

        write_points_batch(valid, self.lake_dir, self.catalog_dir)
        return {"success": len(points) - n_bad, "failed": n_bad}

    # -- query ------------------------------------------------------------

    def _points(self) -> DataFrame:
        lake = self.spark.read.parquet(self.lake_dir)
        keys = [
            r[0]
            for r in lake.select(
                F.explode(F.map_keys("tags")).alias("k")
            ).distinct().collect()
            if r[0] not in ("ksid", "ttl")
        ]
        cols = [F.col("tags").getItem(k).alias(f"tag_{k}") for k in sorted(keys)]
        return lake.select(
            "metric",
            F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
            "value",
            *cols,
        )

    def query(self, body: dict) -> list:
        now_ms = int(time.time() * 1000)
        out = []
        pts = self._points()
        for q in parse_query_request(body, now_ms):
            nan_fill = bool(q.downsample and q.downsample.endswith("-nan"))
            out.extend(shape_response(plan(pts, q), q, nan_fill=nan_fill))
        return out

    def query_expression(self, exp: str) -> list:
        now_ms = int(time.time() * 1000)
        q = parse_expression(exp, now_ms)
        return shape_response(plan(self._points(), q), q)

    def suggest(self, kind: str, prefix: str, limit: int) -> list:
        from mycenae_spark.catalog import suggest

        cat = self.spark.read.parquet(self.catalog_dir).select("metric").distinct()
        if kind != "metrics":
            cat = self.spark.read.parquet(self.catalog_dir)
            col = {"tagk": F.explode(F.map_keys("tags")), "tagv": F.explode(F.map_values("tags"))}[kind]
            cat = cat.select(col.alias("metric")).distinct()
        return [
            r[0]
            for r in suggest(cat, "metrics", prefix, limit).collect()
        ]


class _Handler(BaseHTTPRequestHandler):
    engine: Engine  # injected by serve()

    def log_message(self, *a):  # silence request logging in tests
        pass

    def _send(self, code: int, payload) -> None:
        body = render_json(payload).encode()
        self.send_response(code)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def _body(self):
        n = int(self.headers.get("Content-Length", 0))
        return json.loads(self.rfile.read(n) or b"null")

    def do_GET(self):  # noqa: N802 (stdlib casing)
        u = urlparse(self.path)
        qs = parse_qs(u.query)
        try:
            if u.path == "/api/aggregators":
                return self._send(200, AGGREGATORS_ENDPOINT)
            if u.path == "/api/config/filters":
                return self._send(200, FILTERS_ENDPOINT)
            if u.path == "/api/suggest":
                return self._send(
                    200,
                    self.engine.suggest(
                        qs.get("type", ["metrics"])[0],
                        qs.get("q", [""])[0],
                        int(qs.get("max", ["25"])[0]),
                    ),
                )
            m = re.match(r"^/keysets/[^/]+/api/query/expression$", u.path)
            if m:
                return self._send(
                    200, self.engine.query_expression(qs["exp"][0])
                )
            return self._send(404, {"error": f"no route {u.path}"})
        except Exception as exc:  # noqa: BLE001 — HTTP edge reports all errors
            return self._send(400, {"error": str(exc)})

    def do_POST(self):  # noqa: N802
        u = urlparse(self.path)
        try:
            if u.path in ("/api/put", "/api/text/put"):
                return self._send(
                    200, self.engine.put(self._body(), u.path.startswith("/api/text"))
                )
            if re.match(r"^/keysets/[^/]+/api/query$", u.path):
                return self._send(200, self.engine.query(self._body()))
            if u.path == "/api/expression/check":
                errors = check_expression(
                    self._body()["exp"], int(time.time() * 1000)
                )
                return self._send(200 if not errors else 400, {"errors": errors})
            return self._send(404, {"error": f"no route {u.path}"})
        except Exception as exc:  # noqa: BLE001
            return self._send(400, {"error": str(exc)})


def serve(
    spark: SparkSession, lake_dir: str, catalog_dir: str, port: int = 0
) -> tuple[ThreadingHTTPServer, Thread]:
    """Start the façade on ``port`` (0 = ephemeral); returns (server, thread)."""
    handler = type("BoundHandler", (_Handler,), {"engine": Engine(spark, lake_dir, catalog_dir)})
    httpd = ThreadingHTTPServer(("127.0.0.1", port), handler)
    thread = Thread(target=httpd.serve_forever, daemon=True)
    thread.start()
    return httpd, thread
