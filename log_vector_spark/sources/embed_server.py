"""Embedding HTTP server (SURVEY §2.4 E5/E6) on stdlib http.server.

The reference ships a Flask service (reference embedding_server.py) whose
operators are: POST /embed (batch encode with per-request model selection
and a model cache keyed "{model}:trust={bool}", embedding_server.py:112-118,
batch_size=32 encode at :123-165), GET /health (:168-179) and GET /info
(:182-208).  Until r4 these rows were "n/a by design" because Flask and
torch are absent from the container — but the SERVER surface itself needs
neither: stdlib ThreadingHTTPServer carries the exact same HTTP contract,
and the encoder backend is the same import-gated chain as E1 (deterministic
hash embedder by default, SentenceTransformer when installed).

This makes E3 (operators/embed.py:HttpEmbedder — 3 retries, 2^n backoff,
zero-vector fallback) integration-testable against a REAL in-process HTTP
round trip, including from inside Spark's Arrow pandas_udf workers, instead
of only against mocks.

Threading note: the model cache is guarded by a lock; request handling is
per-connection threads (ThreadingHTTPServer), matching Flask's default
threaded posture.
"""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

ENCODE_BATCH = 32  # reference embedding_server.py encode batch_size
MAX_SEQ_LENGTH = 512  # reference index.py:95 / embedding_server health


class EmbeddingServer:
    """In-process embedding service with the reference's HTTP contract."""

    def __init__(self, dim: int = 64, default_model: str = "deterministic"):
        from log_vector_spark.operators.embed import DeterministicEmbedder

        self.dim = dim
        self.default_model = default_model
        self._cache: dict[str, object] = {}
        self._cache_lock = threading.Lock()
        self.cache_hits = 0
        self.cache_misses = 0
        self.fail_next = 0  # test hook: fail this many requests with 500
        self._mk_deterministic = lambda: DeterministicEmbedder(dim=dim)
        self._httpd: ThreadingHTTPServer | None = None
        self._thread: threading.Thread | None = None

    # -- model cache (reference embedding_server.py:103-120) ---------------
    def _get_model(self, model: str, trust_remote_code: bool):
        key = f"{model}:trust={trust_remote_code}"  # reference cache key scheme
        # Construct OUTSIDE the cache lock: a real SentenceTransformer load
        # can take minutes, and holding the lock would serialize every
        # concurrent /embed (even cached-model hits) behind the cold load.
        # Worst case two threads race the same cold key and one construction
        # is discarded — cheap vs. blocking the whole server.
        with self._cache_lock:
            if key in self._cache:
                self.cache_hits += 1
                return self._cache[key]
        if model == "deterministic":
            emb = self._mk_deterministic()
        else:
            # import-gated real model, same chain as E1
            from log_vector_spark.operators.embed import SentenceTransformerEmbedder

            emb = SentenceTransformerEmbedder(model_name=model)
        with self._cache_lock:
            if key in self._cache:  # lost the construction race: keep first
                self.cache_hits += 1
                return self._cache[key]
            self.cache_misses += 1
            self._cache[key] = emb
            return emb

    # -- request handling ---------------------------------------------------
    def _handle_embed(self, payload: dict) -> dict:
        texts = payload.get("texts")
        if not isinstance(texts, list) or not all(isinstance(t, str) for t in texts):
            raise ValueError("'texts' must be a list of strings")
        model = payload.get("model", self.default_model)
        trust = bool(payload.get("trust_remote_code", False))
        emb = self._get_model(model, trust)
        out: list[list[float]] = []
        for i in range(0, len(texts), ENCODE_BATCH):  # reference batch_size=32
            out.extend(emb.embed_batch(texts[i : i + ENCODE_BATCH]))
        return {"embeddings": out, "model": model, "dim": self.dim}

    def _health(self) -> dict:
        return {
            "status": "ok",
            "device": "cpu",
            "model": self.default_model,
            "max_seq_length": MAX_SEQ_LENGTH,
        }

    def _info(self) -> dict:
        import platform
        import sys

        import numpy
        import pyspark

        return {
            "gpus": [],  # honest inventory: this container has none
            "versions": {
                "python": sys.version.split()[0],
                "platform": platform.platform(),
                "numpy": numpy.__version__,
                "pyspark": pyspark.__version__,
            },
            "cache": {
                "entries": len(self._cache),
                "hits": self.cache_hits,
                "misses": self.cache_misses,
            },
        }

    # -- lifecycle ----------------------------------------------------------
    def start(self, port: int = 0) -> int:
        """Start serving on a daemon thread; returns the bound port
        (port=0 -> ephemeral)."""
        server = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):  # silence per-request stderr noise
                pass

            def _send(self, code: int, body: dict) -> None:
                data = json.dumps(body).encode()
                self.send_response(code)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(data)))
                self.end_headers()
                self.wfile.write(data)

            def do_GET(self):
                if self.path == "/health":
                    self._send(200, server._health())
                elif self.path == "/info":
                    self._send(200, server._info())
                else:
                    self._send(404, {"error": f"unknown path {self.path}"})

            def do_POST(self):
                if self.path != "/embed":
                    self._send(404, {"error": f"unknown path {self.path}"})
                    return
                if server.fail_next > 0:
                    server.fail_next -= 1
                    self._send(500, {"error": "injected failure"})
                    return
                try:
                    n = int(self.headers.get("Content-Length", 0))
                    payload = json.loads(self.rfile.read(n) or b"{}")
                    self._send(200, server._handle_embed(payload))
                except ValueError as e:
                    self._send(400, {"error": str(e)})
                except Exception as e:  # noqa: BLE001 - reference returns 500 JSON
                    self._send(500, {"error": str(e)})

        self._httpd = ThreadingHTTPServer(("127.0.0.1", port), Handler)
        self._thread = threading.Thread(target=self._httpd.serve_forever, daemon=True)
        self._thread.start()
        return self._httpd.server_address[1]

    def stop(self) -> None:
        if self._httpd is not None:
            self._httpd.shutdown()
            self._httpd.server_close()
            self._httpd = None
