"""Embedding operators (SURVEY §2.4 E1-E4) — the pipeline's expensive map.

The reference's embedding surface is a 3-backend plugin interface
(reference index.py:56-69): local SentenceTransformer (E1, batch 32, device
auto-select, max_seq 512 truncation), per-text Ollama HTTP (E2, zero-vector
on error — silent-corruption semantics we keep but FLAG), and a batch HTTP
server (E3, 3 retries, 1*2^n s backoff).  Its driver loop embeds in batches
of 200, fully materialized in RAM.

Spark-first shape: every backend is an Arrow-batched pandas_udf
(SCALAR_ITER), so the model/HTTP session is initialized once per executor
process and reused across batches — the same economics as the reference's
process-global model cache (embedding_server.py:103-120) but scaled out.
Batch size is the Arrow batch (spark.sql.execution.arrow.maxRecordsPerBatch),
replacing the hand-rolled 200-chunk loop.

The default backend is deterministic (md5-seeded LCG -> unit vector): tests
and benches are reproducible with no torch/network in the container, and the
vectors are statistically spread like real normalized embeddings.
"""

from __future__ import annotations

import hashlib
from abc import ABC, abstractmethod
from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import Column, functions as F, types as T

_LCG_A = 1103515245
_LCG_C = 12345
_LCG_M = 2**31


class Embedder(ABC):
    """The engine's embed extension point (reference index.py:56-69)."""

    dim: int

    @abstractmethod
    def embed_batch(self, texts: list[str]) -> list[list[float]]:
        """Driver- or executor-side batch embed (E4 uses this for queries)."""

    def udf(self):
        """Arrow-batched iterator pandas_udf: text -> array<double>[dim].

        SCALAR_ITER so per-process init (model load / HTTP session) happens
        once per executor, not per batch.
        """
        embed_batch = self.embed_batch

        @F.pandas_udf(T.ArrayType(T.DoubleType()))
        def embed_udf(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
            for texts in batches:
                vecs = embed_batch(["" if t is None else t for t in texts.tolist()])
                yield pd.Series(vecs)

        return embed_udf

    def embed_col(self, col: Column) -> Column:
        return self.udf()(col)


class DeterministicEmbedder(Embedder):
    """md5-seeded LCG -> L2-normalized vector; reproducible everywhere."""

    def __init__(self, dim: int = 64):
        self.dim = dim

    def embed_batch(self, texts: list[str]) -> list[list[float]]:
        n = len(texts)
        if n == 0:
            return []
        seeds = np.array(
            [int.from_bytes(hashlib.md5(t.encode("utf-8")).digest()[:8], "big") % _LCG_M for t in texts],
            dtype=np.int64,
        )
        out = np.empty((n, self.dim), dtype=np.float64)
        state = seeds.copy()
        for d in range(self.dim):
            state = (state * _LCG_A + _LCG_C) % _LCG_M
            out[:, d] = state / _LCG_M - 0.5
        norms = np.linalg.norm(out, axis=1, keepdims=True)
        norms[norms == 0.0] = 1.0
        out = out / norms
        return [row.tolist() for row in out]


class SentenceTransformerEmbedder(Embedder):
    """E1: executor-local SentenceTransformer (reference index.py:72-111).

    Reference fidelity: encode batch_size=32 (index.py:105); device
    auto-select cuda->mps->cpu (index.py:82-91); max_seq_length=512 means
    2000-char chunks are silently truncated by the tokenizer (index.py:95)
    — kept, documented.  Import-gated: torch isn't in this container.
    """

    def __init__(self, model_name: str = "nomic-ai/nomic-embed-text-v1.5", dim: int = 768):
        self.model_name = model_name
        self.dim = dim
        self._model = None

    @staticmethod
    def pick_device() -> str:
        """Reference device ladder cuda -> mps -> cpu (index.py:82-91);
        'cpu' when torch itself is absent (the executor default here)."""
        try:
            import torch
        except ImportError:
            return "cpu"
        if torch.cuda.is_available():
            return "cuda"
        if hasattr(torch.backends, "mps") and torch.backends.mps.is_available():
            return "mps"
        return "cpu"

    def _load(self):
        if self._model is None:
            from log_vector_spark.operators.trust import (
                safe_sentence_transformer_load,
            )

            try:
                model = safe_sentence_transformer_load(
                    self.model_name, device=self.pick_device()
                )
            except ImportError as e:
                raise NotImplementedError(
                    "sentence-transformers not installed; use DeterministicEmbedder"
                ) from e
            # reference index.py:95 — 2000-char chunks are silently
            # truncated by the tokenizer at 512 tokens; kept, documented
            model.max_seq_length = 512
            self._model = model
        return self._model

    def embed_batch(self, texts: list[str]) -> list[list[float]]:
        model = self._load()
        return model.encode(
            texts, batch_size=32, show_progress_bar=False, convert_to_numpy=True
        ).tolist()


class HttpEmbedder(Embedder):
    """E2/E3: HTTP embedding client.

    Reference fidelity: 3 retries with 1*2^attempt backoff
    (reference index.py:170-199); on final failure the reference appends a
    ZERO vector (index.py:137-138) — we preserve that but the pipeline adds
    an `embed_error` flag column via `zero_vector_flag` so downstream can
    filter instead of silently training on corrupt rows.
    """

    def __init__(self, url: str, dim: int = 768, max_retries: int = 3, timeout: int = 60):
        self.url = url
        self.dim = dim
        self.max_retries = max_retries
        self.timeout = timeout

    SUB_BATCH = 256

    def embed_batch(self, texts: list[str]) -> list[list[float]]:
        """Embed with bounded blast radius: the Arrow batch (up to 10k rows)
        is sent in sub-batches so one bad request zero-fills at most
        SUB_BATCH texts, not the whole batch (the reference zero-fills
        per-text, index.py:137-138; zeroing 10k rows for one failure would
        amplify the silent-corruption radius it documents)."""
        out: list[list[float]] = []
        for i in range(0, len(texts), self.SUB_BATCH):
            out.extend(self._embed_once(texts[i : i + self.SUB_BATCH]))
        return out

    def _embed_once(self, texts: list[str]) -> list[list[float]]:
        import time

        import requests  # baked into the container via pyspark deps

        for attempt in range(self.max_retries):
            try:
                resp = requests.post(
                    f"{self.url}/embed", json={"texts": texts}, timeout=self.timeout
                )
                resp.raise_for_status()
                return resp.json()["embeddings"]
            except Exception:  # noqa: BLE001
                # no sleep after the FINAL attempt — it only delayed the
                # zero-vector fallback by the largest backoff step
                if attempt + 1 < self.max_retries:
                    time.sleep(1 * (2**attempt))
        # reference error semantics: zero vectors, never raise (index.py:137-138)
        return [[0.0] * self.dim for _ in texts]


def zero_vector_flag(vec_col: Column) -> Column:
    """True when the embed failed and produced the reference's zero-vector
    sentinel — downstream filters on this instead of inheriting corruption."""
    return F.aggregate(
        vec_col, F.lit(0.0), lambda acc, x: acc + F.abs(x)
    ) == 0.0


def get_embedder(kind: str = "deterministic", **kw) -> Embedder:
    """E4 dispatch (reference ask.py:109-186): manifest-driven backend pick."""
    if kind == "deterministic":
        return DeterministicEmbedder(**kw)
    if kind == "local":
        return SentenceTransformerEmbedder(**kw)
    if kind in ("remote", "ollama"):
        return HttpEmbedder(**kw)
    raise ValueError(f"unknown embedder kind {kind!r}")
