#!/usr/bin/env python
"""Trust-management CLI (SURVEY §2.6 C5, reference trust_manager.py:257-284).

The reference ships `--list` (every persisted consent) and `--check MODEL`
(what would happen for this model).  Same surface here, over the engine's
trust module:

    python tools/trust_cli.py --list [--env-file .env]
    python tools/trust_cli.py --check nomic-ai/nomic-embed-text-v1.5
    python tools/trust_cli.py --approve MODEL / --revoke MODEL  (C2 write-back)

Exit code for --check: 0 when the model may load now (safe, or consent
persisted), 3 when consent is required but absent — scriptable for CI
gates the way the reference's interactive prompt never was.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from log_vector_spark.operators.trust import (  # noqa: E402
    get_trust_setting,
    model_needs_trust,
    model_trust_key,
    set_model_approval,
)


def _load_env(env_file: str) -> dict[str, str]:
    out: dict[str, str] = {}
    if os.path.exists(env_file):
        for line in open(env_file):
            line = line.strip()
            if line and not line.startswith("#") and "=" in line:
                k, v = line.split("=", 1)
                out[k.strip()] = v.strip()
    return out


def cmd_list(env_file: str, out=sys.stdout) -> int:
    env = _load_env(env_file)
    consents = {k: v for k, v in env.items() if k.startswith("TRUST_REMOTE_CODE_")}
    if not consents:
        print(f"no persisted trust consents in {env_file}", file=out)
        return 0
    print(f"persisted trust consents ({env_file}):", file=out)
    for k in sorted(consents):
        print(f"  {k} = {consents[k]}", file=out)
    return 0


def cmd_check(model: str, env_file: str, out=sys.stdout) -> int:
    env = dict(os.environ)
    env.update(_load_env(env_file))
    key = model_trust_key(model)
    needs = model_needs_trust(model)
    granted = get_trust_setting(model, env)
    print(f"model:       {model}", file=out)
    print(f"config key:  {key}", file=out)
    print(f"needs trust: {needs}", file=out)
    print(f"loadable:    {granted}", file=out)
    if needs and not granted:
        print(
            "-> consent required but absent (default-deny); persist with "
            f"--approve {model!r}",
            file=out,
        )
        return 3
    return 0


def main(argv: list[str] | None = None, out=sys.stdout) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    g = ap.add_mutually_exclusive_group(required=True)
    g.add_argument("--list", action="store_true")
    g.add_argument("--check", metavar="MODEL")
    g.add_argument("--approve", metavar="MODEL")
    g.add_argument("--revoke", metavar="MODEL")
    ap.add_argument("--env-file", default=".env")
    args = ap.parse_args(argv)

    if args.list:
        return cmd_list(args.env_file, out)
    if args.check:
        return cmd_check(args.check, args.env_file, out)
    model = args.approve or args.revoke
    set_model_approval(model, bool(args.approve), env_file=args.env_file)
    print(
        f"{'approved' if args.approve else 'revoked'} {model} "
        f"({model_trust_key(model)}) in {args.env_file}",
        file=out,
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
