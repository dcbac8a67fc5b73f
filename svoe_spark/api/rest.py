"""REST API server over the engine (reference §2.12 REST:
svoe_platform/apiserver/apiserver.py:38-135 — FastAPI + uvicorn over
Ray cluster management, feature-definition storage and DAG submission).

Spark-first shape, stdlib only (no FastAPI/uvicorn dependency): a
ThreadingHTTPServer whose handlers drive the SAME engine surfaces a
notebook user gets — the query registry, the FeatureDefinition
registry (upload = X5 source loading), and Featurizer runs (the
run_dag equivalent: the "DAG" here is the declarative feature config;
Spark's scheduler replaces Airflow). Cluster management endpoints have
no analogue by design: the Spark cluster is infrastructure, not an
engine concern.

Endpoints (all JSON, reference Resp shape {"result": ..., "error": ...}):

  GET  /health                    liveness
  GET  /queries                   registered query names (+ oracle flag)
  POST /query/{name}              {"sf_dir": ..., "limit": N} -> rows
  GET  /feature_definitions       registered FeatureDefinition names
  POST /feature_definition/       {"source": "<python>"} -> registered
                                  names (X5 upload endpoint)
  POST /run_featurizer            {"config": {...}, "limit": N} -> rows

Every request runs synchronously on the shared SparkSession — the
server is a control plane for a long-lived driver, matching the
reference's single apiserver process."""

from __future__ import annotations

import hmac
import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Any

from pyspark.sql import DataFrame, SparkSession

DEFAULT_LIMIT = 100
MAX_LIMIT = 10_000


def _rows_json(df: DataFrame, limit: int) -> list[dict[str, Any]]:
    limit = max(1, min(int(limit), MAX_LIMIT))
    out = []
    for row in df.limit(limit).collect():
        d = {}
        for k, v in row.asDict(recursive=True).items():
            if hasattr(v, "isoformat"):
                v = v.isoformat()
            elif isinstance(v, bytes):
                v = v.hex()
            d[k] = v
        out.append(d)
    return out


def make_handler(spark: SparkSession, token: str | None = None):
    from svoe_spark.all_queries import QUERIES
    from svoe_spark.plans.definitions import (
        REGISTRY,
        load_definitions_from_source,
    )
    from svoe_spark.plans.featurizer import Featurizer

    class Handler(BaseHTTPRequestHandler):
        #: POST endpoints execute code (uploaded FeatureDefinitions,
        #: configured definition_paths) — when a token is configured,
        #: every POST must carry it; without one, bind localhost only.
        _token = token
        def log_message(self, *args) -> None:  # quiet test output
            pass

        def _send(self, result: Any = None, error: str | None = None, code: int = 200) -> None:
            # reference Resp convention: errors travel in-band in the
            # JSON envelope with a 200, so clients read one shape
            body = json.dumps({"result": result, "error": error}, indent=1).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def _body(self) -> dict:
            n = int(self.headers.get("Content-Length") or 0)
            if n == 0:
                return {}
            return json.loads(self.rfile.read(n) or b"{}")

        def do_GET(self) -> None:  # noqa: N802
            try:
                if self.path == "/health":
                    self._send({"status": "ok", "spark": spark.version})
                elif self.path == "/queries":
                    self._send(
                        {
                            name: {"has_oracle": q.sql is not None}
                            for name, q in QUERIES.items()
                        }
                    )
                elif self.path == "/feature_definitions":
                    self._send(sorted(REGISTRY))
                else:
                    self._send(error=f"no such endpoint: {self.path}")
            except Exception as e:  # noqa: BLE001 — API boundary
                self._send(error=str(e))

        def do_POST(self) -> None:  # noqa: N802
            try:
                if self._token and not hmac.compare_digest(
                    self.headers.get("X-Api-Token") or "", self._token
                ):
                    self._send(error="missing or invalid X-Api-Token", code=403)
                    return
                body = self._body()
                if self.path.startswith("/query/"):
                    name = self.path[len("/query/"):]
                    q = QUERIES.get(name)
                    if q is None:
                        self._send(error=f"unknown query: {name}")
                        return
                    df = q.fn(spark, body["sf_dir"])
                    self._send(_rows_json(df, body.get("limit", DEFAULT_LIMIT)))
                elif self.path.rstrip("/") == "/feature_definition":
                    loaded = load_definitions_from_source(
                        body["source"], body.get("module_name", "api_upload")
                    )
                    self._send([c.name for c in loaded])
                elif self.path == "/run_featurizer":
                    df = Featurizer(spark).run(body["config"])
                    self._send(_rows_json(df, body.get("limit", DEFAULT_LIMIT)))
                else:
                    self._send(error=f"no such endpoint: {self.path}")
            except Exception as e:  # noqa: BLE001 — API boundary
                self._send(error=str(e))

    return Handler


def serve(
    spark: SparkSession,
    host: str = "127.0.0.1",
    port: int = 1228,
    token: str | None = None,
) -> ThreadingHTTPServer:
    """Start the API server on a daemon thread and return it (call
    ``.shutdown()`` to stop). Port 1228 mirrors the reference default
    (apiserver.py:135).

    SECURITY: POST /feature_definition executes uploaded Python on the
    driver (the reference's X5 definition upload). Binding beyond
    localhost REQUIRES a ``token`` — clients then send it as the
    X-Api-Token header on every POST."""
    if host not in ("127.0.0.1", "localhost", "::1") and not token:
        raise ValueError(
            f"refusing to bind {host!r} without a token: the definition-"
            "upload endpoint executes code; pass token=... (clients send "
            "X-Api-Token) or bind localhost"
        )
    server = ThreadingHTTPServer((host, port), make_handler(spark, token))
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    return server
