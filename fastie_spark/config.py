"""Config-file job launch — the analogue of the reference's primary UX
front door ``fastie-cli train config.yaml`` (/root/reference/fastie/cli.py:
48-65 dispatches to HfArgumentParser.parse_yaml_file,
fastie/hparams/parser.py:30-31): a flat YAML/JSON mapping whose keys are
the argument names.

Semantics here mirror that, adapted to argparse entrypoints:

- keys are argument names (``snapshot-id`` and ``snapshot_id`` both
  accepted, like argparse flags),
- unknown keys are an error (silent typos must not launch a mis-configured
  100 TB job),
- explicit command-line flags override the file (the file provides
  *defaults*), so one checked-in config serves many parameterized runs.
"""

from __future__ import annotations

import json
import os
from typing import Any


def load_job_config(path: str) -> dict[str, Any]:
    """Read a flat YAML (or JSON) mapping. YAML needs pyyaml; JSON always
    works (a .json config keeps dependency-free deployments possible)."""
    with open(path) as f:
        text = f.read()
    if path.endswith(".json"):
        cfg = json.loads(text)
    else:
        try:
            import yaml
        except ImportError as ex:  # pragma: no cover - yaml ships in sandbox
            raise SystemExit(
                f"{path}: YAML config requires pyyaml; use a .json config "
                f"or install pyyaml ({ex})"
            ) from ex
        cfg = yaml.safe_load(text)
    if cfg is None:
        cfg = {}
    if not isinstance(cfg, dict):
        raise SystemExit(f"{path}: config must be a flat mapping, "
                         f"got {type(cfg).__name__}")
    return {str(k).replace("-", "_"): v for k, v in cfg.items()}


def apply_config_defaults(parser, cfg: dict[str, Any], path: str) -> None:
    """Install config values as parser DEFAULTS (explicit flags still win),
    erroring on keys that match no known argument."""
    known = {a.dest for a in parser._actions}
    unknown = sorted(set(cfg) - known)
    if unknown:
        raise SystemExit(
            f"{path}: unknown config key(s) {unknown}; known: "
            f"{sorted(known - {'help'})}"
        )
    # set_defaults bypasses argparse's per-argument ``type=`` conversion
    # (it only runs on command-line strings), so a string value for an
    # int-typed flag would flow through untyped and fail deep inside the
    # job instead of at parse time. Coerce string values through each
    # action's type callable here, failing fast with the offending key.
    by_dest = {a.dest: a for a in parser._actions}
    coerced = {}
    for key, val in cfg.items():
        typ = by_dest[key].type
        if typ is not None and isinstance(val, str):
            try:
                val = typ(val)
            except (ValueError, TypeError) as ex:
                raise SystemExit(
                    f"{path}: invalid value for {key!r}: {val!r} "
                    f"({typ.__name__ if hasattr(typ, '__name__') else typ}: "
                    f"{ex})"
                ) from ex
        coerced[key] = val
    parser.set_defaults(**coerced)


def pop_config_arg(argv: list[str]) -> tuple[str | None, list[str]]:
    """Extract a LEADING config-file path (the ``fastie-cli train
    config.yaml`` shape) from argv. Only position 0 is considered — a
    later value like ``--vocab vocab.json`` is a flag's argument, not a
    job config, and must never be hijacked. Returns
    (path_or_None, remaining_argv)."""
    if (argv and not argv[0].startswith("-")
            and argv[0].endswith((".yaml", ".yml", ".json"))
            and os.path.exists(argv[0])):
        return argv[0], argv[1:]
    return None, argv
