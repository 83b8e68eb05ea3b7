"""Experiment config system.

The reference drives everything through tl2's YAML convention (SURVEY.md §5):
one file per experiment, one section per command, `base:` inheritance between
sections, `--tl_opts k v` dotted-path CLI overrides, and a full
`config_command.yaml` snapshot written next to every checkpoint so inference
can rebuild the exact model (train_v10.py:517, eval_fid.py:114-124).

This module reimplements that contract standalone: `load_command_config`
resolves a section with recursive `base:` merging, `apply_overrides` applies
dotted-path overrides, and `save_snapshot` writes the resolved section next
to checkpoints.
"""

from __future__ import annotations

import copy
import json
import os
from typing import Any, Mapping, Sequence

try:
    import yaml
except ImportError:  # pragma: no cover
    yaml = None


def _deep_merge(base: dict, override: Mapping) -> dict:
    """Recursive dict merge; override wins, nested dicts merge."""
    out = copy.deepcopy(base)
    for k, v in override.items():
        if k in out and isinstance(out[k], dict) and isinstance(v, Mapping):
            out[k] = _deep_merge(out[k], v)
        else:
            out[k] = copy.deepcopy(v)
    return out


def _resolve_section(doc: Mapping, name: str, _stack=()) -> dict:
    if name in _stack:
        raise ValueError(f"base: cycle at {name!r} via {_stack}")
    section = doc.get(name)
    if section is None:
        raise KeyError(f"no config section {name!r}; have {sorted(doc)}")
    section = dict(section)
    base_name = section.pop("base", None)
    if base_name is None:
        return section
    base = _resolve_section(doc, base_name, _stack + (name,))
    return _deep_merge(base, section)


def load_command_config(path: str, command: str) -> dict:
    """Load YAML file, resolve section `command` through its base: chain."""
    if yaml is None:
        raise RuntimeError("pyyaml not available")
    with open(path) as f:
        doc = yaml.safe_load(f)
    return _resolve_section(doc, command)


def _parse_value(s: str) -> Any:
    """CLI value parsing: JSON first, then YAML-ish literals, else string."""
    try:
        return json.loads(s)
    except (json.JSONDecodeError, TypeError):
        pass
    low = str(s).lower()
    if low in ("true", "false"):
        return low == "true"
    if low in ("none", "null"):
        return None
    return s


def apply_overrides(cfg: dict, opts: Sequence[str]) -> dict:
    """`k.path value k2.path value2 ...` dotted overrides (tl2 --tl_opts)."""
    if len(opts) % 2 != 0:
        raise ValueError(f"overrides must be key/value pairs, got {opts}")
    cfg = copy.deepcopy(cfg)
    for key, raw in zip(opts[::2], opts[1::2]):
        node = cfg
        parts = key.split(".")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = _parse_value(raw)
    return cfg


def save_snapshot(cfg: Mapping, outdir: str, name: str = "config_command.yaml"):
    """Write the resolved config next to checkpoints (the reference's
    config_command.yaml contract)."""
    os.makedirs(outdir, exist_ok=True)
    path = os.path.join(outdir, name)
    with open(path, "w") as f:
        yaml.safe_dump(dict(cfg), f, sort_keys=False)
    return path


def load_snapshot(ckpt_dir: str, name: str = "config_command.yaml") -> dict:
    with open(os.path.join(ckpt_dir, name)) as f:
        return yaml.safe_load(f)


# ----- typed config construction -------------------------------------------


def generator_config_from_dict(d: Mapping) -> "GeneratorConfig":
    """Build a GeneratorConfig from a (possibly partial) nested dict using
    dataclass defaults for everything unspecified."""
    import dataclasses
    from ..models.generator import (
        GeneratorConfig,
        RendererConfig,
        MappingConfig,
        DecoderConfig,
    )

    def build(cls, sub: Mapping):
        fields = {f.name for f in dataclasses.fields(cls)}
        kwargs = {}
        for k, v in sub.items():
            if k not in fields:
                continue
            kwargs[k] = tuple(v) if isinstance(v, list) else v
        return cls(**kwargs)

    kwargs: dict = {}
    for key, cls in (
        ("renderer", RendererConfig),
        ("mapping", MappingConfig),
        ("decoder", DecoderConfig),
    ):
        if key in d:
            kwargs[key] = build(cls, d[key])
    import dataclasses as dc

    top_fields = {f.name for f in dc.fields(GeneratorConfig)}
    for k, v in d.items():
        if k in top_fields and k not in ("renderer", "mapping", "decoder"):
            kwargs[k] = v
    return GeneratorConfig(**kwargs)


def train_config_from_dict(d: Mapping) -> "TrainConfig":
    import dataclasses
    from ..train.state import TrainConfig

    fields = {f.name for f in dataclasses.fields(TrainConfig)}
    return TrainConfig(**{k: v for k, v in d.items() if k in fields})
