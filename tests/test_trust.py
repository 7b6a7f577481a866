"""Trust/config parity tests (reference trust_manager.py semantics)."""

import hashlib

from log_vector_spark.operators.trust import (
    get_trust_setting,
    model_needs_trust,
    model_trust_key,
)


def test_key_scheme_matches_reference():
    m = "nomic-ai/nomic-embed-text-v1.5"
    expected = "TRUST_REMOTE_CODE_" + hashlib.md5(m.encode()).hexdigest()[:8].upper()
    assert model_trust_key(m) == expected


def test_heuristic_order_safe_first_then_trust_then_default_deny():
    assert model_needs_trust("sentence-transformers/all-MiniLM-L6-v2") is False
    assert model_needs_trust("nomic-ai/nomic-embed-text-v1.5") is True
    # unknown models are assumed to need trust (trust_manager.py:119-120)
    assert model_needs_trust("somebody/random-model") is True


def test_default_deny_and_explicit_consent():
    m = "nomic-ai/nomic-embed-text-v1.5"
    assert get_trust_setting(m, config={}) is False  # default-deny
    assert get_trust_setting(m, config={model_trust_key(m): "true"}) is True
    assert get_trust_setting(m, config={model_trust_key(m): "false"}) is False
    # safe models pass without consent
    assert get_trust_setting("sentence-transformers/paraphrase-x", config={}) is True


def test_set_model_approval_roundtrip(tmp_path, monkeypatch):
    """C2 write-back: consent persists in the reference's .env format,
    replaces prior entries for the same model, and is immediately readable
    through get_trust_setting."""
    from log_vector_spark.operators.trust import (
        get_trust_setting,
        model_trust_key,
        set_model_approval,
    )

    env_file = str(tmp_path / ".env")
    model = "nomic-ai/nomic-embed-text-v1.5"
    key = model_trust_key(model)
    monkeypatch.delenv(key, raising=False)

    assert get_trust_setting(model) is False  # default-deny
    set_model_approval(model, True, env_file=env_file)
    assert get_trust_setting(model) is True

    # flip to denied: the file must hold exactly ONE entry for the model
    set_model_approval(model, False, env_file=env_file)
    text = open(env_file).read()
    assert text.count(f"{key}=") == 1 and f"{key}=false" in text
    assert f"# {key}_MODEL={model}" in text
    assert get_trust_setting(model) is False
    monkeypatch.delenv(key, raising=False)


def test_trust_cli_surface(tmp_path, capsys):
    """C5 CLI parity (reference trust_manager.py:257-284): --list / --check
    / --approve / --revoke against an isolated env file; --check exit code
    3 means 'consent required but absent' (scriptable default-deny)."""
    import io

    from tools.trust_cli import main

    env = str(tmp_path / ".env")
    unknown = "some-org/unknown-model"

    out = io.StringIO()
    assert main(["--list", "--env-file", env], out=out) == 0
    assert "no persisted trust consents" in out.getvalue()

    out = io.StringIO()
    assert main(["--check", unknown, "--env-file", env], out=out) == 3
    assert "needs trust: True" in out.getvalue()
    assert "loadable:    False" in out.getvalue()

    out = io.StringIO()
    assert main(["--approve", unknown, "--env-file", env], out=out) == 0
    out = io.StringIO()
    assert main(["--check", unknown, "--env-file", env], out=out) == 0
    assert "loadable:    True" in out.getvalue()
    out = io.StringIO()
    assert main(["--list", "--env-file", env], out=out) == 0
    assert "TRUST_REMOTE_CODE_" in out.getvalue()

    out = io.StringIO()
    assert main(["--revoke", unknown, "--env-file", env], out=out) == 0
    out = io.StringIO()
    assert main(["--check", unknown, "--env-file", env], out=out) == 3

    # safe-pattern models (reference trust_manager.py:101-105: the
    # sentence-transformers/-prefixed families) load with no consent at all
    out = io.StringIO()
    assert main(
        ["--check", "sentence-transformers/all-MiniLM-L6-v2", "--env-file", env], out=out
    ) == 0
    assert "needs trust: False" in out.getvalue()


def test_prompt_consent_parsing_and_cancel():
    from log_vector_spark.operators.trust import prompt_user_consent

    lines: list[str] = []
    # strict parsing: junk re-prompts, then yes
    answers = iter(["maybe", "YES"])
    assert prompt_user_consent("m", input_fn=lambda _: next(answers), print_fn=lines.append)
    assert any("SECURITY WARNING" in ln for ln in lines)
    assert any("'y' for yes" in ln for ln in lines)
    # empty answer = the reference's default deny
    assert not prompt_user_consent("m", input_fn=lambda _: "", print_fn=lines.append)
    # Ctrl-C -> deny

    def interrupt(_):
        raise KeyboardInterrupt

    assert not prompt_user_consent("m", input_fn=interrupt, print_fn=lines.append)


def test_interactive_trust_prompts_once_and_persists(tmp_path, monkeypatch):
    from log_vector_spark.operators import trust

    monkeypatch.chdir(tmp_path)
    model = "suspicious/custom-model"
    key = trust.model_trust_key(model)
    monkeypatch.delenv(key, raising=False)
    calls = []

    def fake_input(prompt):
        calls.append(prompt)
        return "y"

    env_file = str(tmp_path / ".env")
    ok = trust.get_trust_setting_interactive(
        model, env_file=env_file, input_fn=fake_input, print_fn=lambda *_: None
    )
    assert ok and len(calls) == 1
    # persisted: second call answers from env without prompting
    ok2 = trust.get_trust_setting_interactive(
        model, env_file=env_file, input_fn=fake_input, print_fn=lambda *_: None
    )
    assert ok2 and len(calls) == 1
    assert key + "=true" in open(env_file).read()
    monkeypatch.delenv(key, raising=False)
