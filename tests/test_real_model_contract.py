"""E1 contract tests against a RECORDING fake (VERDICT r8 item 6): the
sandbox has no torch / sentence-transformers, so the import-gated twin's
reference-fidelity claims (encode batch_size=32 + no progress bar
= reference index.py:105; max_seq_length=512 truncation = index.py:95;
device ladder cuda->mps->cpu = index.py:82-91; trust-gated load =
trust_manager.py:219-255) are pinned here by injecting fakes into
sys.modules and asserting exactly what the twin passes through.  The live
path runs under tests/test_real_models.py the day the deps exist."""

import sys
import types

import numpy as np
import pytest

from log_vector_spark.operators import trust
from log_vector_spark.operators.embed import SentenceTransformerEmbedder


class _FakeModel:
    def __init__(self, name, trust_remote_code=None, device=None, fail=False):
        if fail:
            raise RuntimeError("model requires trust_remote_code=True")
        self.name = name
        self.trust_remote_code = trust_remote_code
        self.device = device
        self.max_seq_length = None
        self.encode_calls = []

    def encode(self, texts, **kw):
        self.encode_calls.append(kw)
        return np.zeros((len(texts), 4)) + np.arange(len(texts))[:, None]


@pytest.fixture
def fake_st(monkeypatch):
    """Install a recording sentence_transformers module; yields the list of
    constructed models."""
    made = []
    mod = types.ModuleType("sentence_transformers")

    def _ctor(name, **kw):
        m = _FakeModel(name, **kw)
        made.append(m)
        return m

    mod.SentenceTransformer = _ctor
    monkeypatch.setitem(sys.modules, "sentence_transformers", mod)
    return made


def test_encode_contract_batch32_no_progress_truncation(fake_st, monkeypatch):
    monkeypatch.delenv(trust.model_trust_key("m/safe"), raising=False)
    monkeypatch.setattr(trust, "model_needs_trust", lambda n: False)
    e = SentenceTransformerEmbedder(model_name="m/safe", dim=4)
    out = e.embed_batch(["a", "b", "c"])
    assert len(out) == 3 and len(out[0]) == 4
    (model,) = fake_st
    assert model.max_seq_length == 512  # reference index.py:95
    (call,) = model.encode_calls
    assert call["batch_size"] == 32  # reference index.py:105
    assert call["show_progress_bar"] is False
    # model is loaded ONCE per executor process, not per batch
    e.embed_batch(["d"])
    assert len(fake_st) == 1


def test_device_ladder_prefers_cuda_then_mps(monkeypatch):
    def fake_torch(cuda=False, mps=False):
        t = types.ModuleType("torch")
        t.cuda = types.SimpleNamespace(is_available=lambda: cuda)
        t.backends = types.SimpleNamespace(
            mps=types.SimpleNamespace(is_available=lambda: mps)
        )
        return t

    for cuda, mps, expect in [
        (True, True, "cuda"),
        (False, True, "mps"),
        (False, False, "cpu"),
    ]:
        monkeypatch.setitem(sys.modules, "torch", fake_torch(cuda, mps))
        assert SentenceTransformerEmbedder.pick_device() == expect
    monkeypatch.delitem(sys.modules, "torch")
    # torch absent entirely -> cpu (executor default in this container)
    monkeypatch.setattr(
        "builtins.__import__",
        _import_blocking("torch"),
    )
    assert SentenceTransformerEmbedder.pick_device() == "cpu"


def _import_blocking(blocked):
    real = __import__

    def imp(name, *a, **k):
        if name == blocked:
            raise ImportError(name)
        return real(name, *a, **k)

    return imp


def test_trust_gate_default_deny_passes_false(fake_st, monkeypatch):
    """Unknown model, no recorded consent, non-interactive: the load must
    carry trust_remote_code=False (C4 default-deny)."""
    monkeypatch.delenv(trust.model_trust_key("unknown/model"), raising=False)
    m = trust.safe_sentence_transformer_load("unknown/model")
    assert m.trust_remote_code is False


def test_trust_gate_env_approval_passes_true(fake_st, monkeypatch):
    monkeypatch.setenv(trust.model_trust_key("nomic-ai/x"), "true")
    m = trust.safe_sentence_transformer_load("nomic-ai/x", device="cpu")
    assert m.trust_remote_code is True
    assert m.device == "cpu"  # kwargs pass through (reference parity)


def test_trust_gate_strips_caller_trust_kwarg(fake_st, monkeypatch):
    """A caller-supplied trust_remote_code must NOT override the resolved
    consent (reference trust_manager.py:236-238)."""
    monkeypatch.delenv(trust.model_trust_key("unknown/model"), raising=False)
    m = trust.safe_sentence_transformer_load(
        "unknown/model", trust_remote_code=True
    )
    assert m.trust_remote_code is False


def test_trust_gate_interactive_retry_after_failure(monkeypatch, tmp_path):
    """Untrusted load fails -> interactive consent -> retry with
    trust_remote_code=True and the approval persisted
    (reference trust_manager.py:247-254)."""
    calls = []
    mod = types.ModuleType("sentence_transformers")

    def _ctor(name, trust_remote_code=None, **kw):
        calls.append(trust_remote_code)
        return _FakeModel(name, trust_remote_code, fail=not trust_remote_code)

    mod.SentenceTransformer = _ctor
    monkeypatch.setitem(sys.modules, "sentence_transformers", mod)
    monkeypatch.chdir(tmp_path)
    key = trust.model_trust_key("failing/model")
    monkeypatch.delenv(key, raising=False)
    monkeypatch.setattr("sys.stdin", types.SimpleNamespace(isatty=lambda: True))

    answers = iter(["n", "y"])  # deny -> load fails -> consent to retry
    m = trust.safe_sentence_transformer_load(
        "failing/model",
        interactive=True,
        input_fn=lambda *_: next(answers),
        print_fn=lambda *_ , **__: None,
    )
    assert m.trust_remote_code is True
    assert calls == [False, True]
    assert (tmp_path / ".env").read_text().strip().endswith("=true")
