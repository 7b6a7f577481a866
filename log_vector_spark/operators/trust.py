"""Model-trust configuration surface (SURVEY §2.6 C1-C5).

The reference gates `trust_remote_code` model loading behind persisted
consent (reference trust_manager.py).  In a Spark deployment executors can
never prompt interactively, so the engine keeps the same key scheme,
auto-detection heuristic, and DEFAULT-DENY posture, but resolves consent
from engine config only (the non-interactive branch of reference
trust_manager.py:185-189).

Kept behaviors:
* C1 key scheme: TRUST_REMOTE_CODE_{md5(model)[:8].upper()}
  (trust_manager.py:34-39) so configs written for the reference read
  identically here.
* C3 heuristic: safe patterns checked first, then trust-required patterns,
  unknown models assumed to need trust (trust_manager.py:87-120).
* C4 default-deny: no recorded consent -> not trusted.
"""

from __future__ import annotations

import hashlib
import os
from collections.abc import Mapping

TRUST_REQUIRED_PATTERNS = (
    "nomic-ai/",
    "microsoft/codebert",
    "sentence-transformers/all-mpnet-base-v2",
)
SAFE_PATTERNS = (
    "sentence-transformers/all-minilm",
    "sentence-transformers/paraphrase",
    "sentence-transformers/multi-qa",
)


def model_trust_key(model_name: str) -> str:
    """C1: model -> env/config key (reference trust_manager.py:34-39)."""
    digest = hashlib.md5(model_name.encode()).hexdigest()[:8]
    return f"TRUST_REMOTE_CODE_{digest.upper()}"


def model_needs_trust(model_name: str) -> bool:
    """C3: safe patterns first, then trust patterns, unknown -> True."""
    m = model_name.lower()
    if any(p in m for p in SAFE_PATTERNS):
        return False
    if any(p in m for p in TRUST_REQUIRED_PATTERNS):
        return True
    return True


def get_trust_setting(model_name: str, config: Mapping[str, str] | None = None) -> bool:
    """C4 (non-interactive): explicit config/env consent or default-deny.

    `config` lets a SparkConf dict or spark.conf snapshot drive consent;
    falls back to process env (the reference's .env file contract).
    """
    key = model_trust_key(model_name)
    src = config if config is not None else os.environ
    val = src.get(key)
    if val is not None:
        return str(val).strip().lower() == "true"
    if not model_needs_trust(model_name):
        return True  # safe models need no consent
    return False  # default-deny for models that want trust_remote_code


def set_model_approval(model_name: str, approved: bool, env_file: str = ".env") -> None:
    """C2 write-back: persist consent to the reference's .env contract
    (reference trust_manager.py:48-84).

    DRIVER-SIDE ONLY: executors can never prompt or persist; a Spark job
    consults consent read-only via get_trust_setting.  File format matches
    the reference exactly — a `# {KEY}_MODEL={name}` comment line followed
    by `{KEY}=true|false`, replacing any prior entry for the same model —
    so a consent file written here is readable by the reference and vice
    versa.  The process env is updated in place of the reference's
    load_dotenv(override=True) reload.
    """
    key = model_trust_key(model_name)
    value = "true" if approved else "false"
    comment_key = f"# {key}_MODEL"

    lines: list[str] = []
    if os.path.exists(env_file):
        with open(env_file, encoding="utf-8") as f:
            lines = f.readlines()

    filtered: list[str] = []
    skip_next = False
    for line in lines:
        if skip_next:
            skip_next = False
            continue
        if line.strip() == f"{comment_key}={model_name}":
            skip_next = True  # drop the value line that follows the comment
            continue
        if not line.startswith(key + "="):
            filtered.append(line)

    filtered.append(f"{comment_key}={model_name}\n")
    filtered.append(f"{key}={value}\n")
    with open(env_file, "w", encoding="utf-8") as f:
        f.writelines(filtered)
    os.environ[key] = value


def prompt_user_consent(
    model_name: str,
    input_fn=input,
    print_fn=print,
) -> bool:
    """Interactive y/N consent flow (reference trust_manager.py:122-155):
    security warning banner, strict y/yes vs n/no/empty parsing with a
    re-prompt on anything else, Ctrl-C -> deny.

    DRIVER-SIDE ONLY, and only when a terminal is actually attached — the
    non-interactive engine path stays get_trust_setting's default-deny
    (C4); this loop exists for the operator-at-a-keyboard case the
    reference serves.  `input_fn`/`print_fn` are injectable for tests.
    """
    bar = "=" * 60
    print_fn(f"\n{bar}")
    print_fn("SECURITY WARNING: Remote Code Execution")
    print_fn(bar)
    print_fn(f"Model: {model_name}")
    print_fn("")
    print_fn("This model may require 'trust_remote_code=True' which allows")
    print_fn("the model to execute arbitrary code during loading.")
    print_fn("Your choice will be saved for this model.")
    print_fn(bar)
    while True:
        try:
            response = input_fn("Allow remote code execution for this model? [y/N]: ")
        except (KeyboardInterrupt, EOFError):
            print_fn("\nOperation cancelled.")
            return False
        r = response.strip().lower()
        if r in ("y", "yes"):
            return True
        if r in ("n", "no", ""):
            return False
        print_fn("Please enter 'y' for yes or 'n' for no.")


def get_trust_setting_interactive(
    model_name: str,
    env_file: str = ".env",
    input_fn=input,
    print_fn=print,
) -> bool:
    """C4 with the reference's interactive fallback: explicit setting wins;
    otherwise safe models pass; otherwise prompt (persisting the answer via
    set_model_approval) when stdin is a TTY, default-deny when it is not."""
    import sys

    key = model_trust_key(model_name)
    if os.environ.get(key) is not None:
        return get_trust_setting(model_name)
    if not model_needs_trust(model_name):
        return True
    if input_fn is input and not sys.stdin.isatty():
        return False
    approved = prompt_user_consent(model_name, input_fn=input_fn, print_fn=print_fn)
    set_model_approval(model_name, approved, env_file=env_file)
    os.environ[key] = "true" if approved else "false"
    return approved


def safe_sentence_transformer_load(
    model_name: str,
    interactive: bool = False,
    input_fn=input,
    print_fn=print,
    **kwargs,
):
    """Trust-gated SentenceTransformer load (reference
    trust_manager.py:219-255): resolve consent first, strip any caller
    trust_remote_code, load with the resolved flag; when the untrusted
    load fails and `interactive` is set, offer one consent-and-retry with
    trust_remote_code=True (persisting the approval) before re-raising.

    Import-gated like SentenceTransformerEmbedder — the default Spark
    posture is `interactive=False` (executors can never prompt; C4
    default-deny), the reference's interactive branch is preserved for the
    driver-side CLI.  Contract-tested against a recording fake in
    tests/test_real_model_contract.py; the live path runs under
    tests/test_real_models.py when the dependency exists.
    """
    from sentence_transformers import SentenceTransformer  # import-gated

    if interactive:
        trusted = get_trust_setting_interactive(
            model_name, input_fn=input_fn, print_fn=print_fn
        )
    else:
        trusted = get_trust_setting(model_name)
    kwargs.pop("trust_remote_code", None)
    if trusted:
        return SentenceTransformer(model_name, trust_remote_code=True, **kwargs)
    try:
        return SentenceTransformer(model_name, trust_remote_code=False, **kwargs)
    except Exception:
        if interactive and prompt_user_consent(
            model_name, input_fn=input_fn, print_fn=print_fn
        ):
            set_model_approval(model_name, True)
            return SentenceTransformer(model_name, trust_remote_code=True, **kwargs)
        raise
