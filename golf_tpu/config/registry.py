"""Config system: YAML ``class_path``/``init_args`` trees -> objects.

Equivalent of the reference's LightningCLI + jsonargparse + omegaconf stack
(``autoencode.py:5-22``, ``ltng/cli.py``): reflective instantiation,
``${dotted.path}`` interpolation across the tree, CLI dot-overrides, and
config snapshotting. Reference-style class paths (``models.sf.X``,
``ltng.ae.X``, ``loss.spec.X``) are aliased onto this package so shipped
configs work verbatim.
"""

from __future__ import annotations

import copy
import importlib
import re
from typing import Any, Dict, List, Optional, Sequence

import yaml

# reference module path -> golf_tpu module path
_ALIASES = {
    "models.sf": "golf_tpu.models.sf",
    "models.hpn": "golf_tpu.models.hpn",
    "models.synth": "golf_tpu.models.synth",
    "models.filters": "golf_tpu.models.filters",
    "models.noise": "golf_tpu.models.noise",
    "models.ctrl": "golf_tpu.models.ctrl",
    "models.enc": "golf_tpu.models.enc",
    "models.mel": "golf_tpu.models.mel",
    "models.unet": "golf_tpu.models.unet",
    "models.crepe": "golf_tpu.models.crepe",
    "models.tspn": "golf_tpu.models.tspn",
    "models.lpcnet": "golf_tpu.models.lpcnet",
    "models.lpc": "golf_tpu.models.lpc",
    "loss.spec": "golf_tpu.loss.spec",
    "ltng.ae": "golf_tpu.tasks.ae",
    "ltng.vocoder": "golf_tpu.tasks.vocoder",
    "ltng.lpcnet": "golf_tpu.tasks.lpcnet",
    "ltng.world_ae": "golf_tpu.tasks.world_ae",
    "ltng.data": "golf_tpu.tasks.data",
    "ltng.cli": "golf_tpu.tasks.cli",
}

_CLASS_RENAMES = {
    # reference class whose name collides with torch's TransformerEncoder
    "golf_tpu.models.unet.TransformerEncoder":
        "golf_tpu.models.unet.TransformerEncoderBackbone",
}

_INTERP_RE = re.compile(r"^\$\{([^}]+)\}$")


def resolve_class_path(path: str) -> str:
    mod, _, cls = path.rpartition(".")
    mod = _ALIASES.get(mod, mod)
    full = f"{mod}.{cls}"
    return _CLASS_RENAMES.get(full, full)


def import_object(path: str) -> Any:
    path = resolve_class_path(path)
    mod, _, name = path.rpartition(".")
    return getattr(importlib.import_module(mod), name)


def _get_by_dots(tree: Any, dotted: str) -> Any:
    cur = tree
    for part in dotted.split("."):
        if isinstance(cur, dict):
            cur = cur[part]
        elif isinstance(cur, (list, tuple)):
            cur = cur[int(part)]
        else:
            raise KeyError(dotted)
    return cur


def resolve_interpolations(tree: Any, root: Optional[Any] = None) -> Any:
    """Resolve ``${dotted.path}`` references against the config root
    (omegaconf-style, reference ``autoencode.py:21``).

    A path that does not resolve is left as-is: the reference parses the
    ``--model`` file in its own namespace (jsonargparse omegaconf mode),
    so ``${decoder...}`` inside cfg/ae/decoder/*.yaml must be resolved
    against that file's root first, then the merged tree gets a second
    pass; a typo'd path surfaces loudly at instantiation instead.
    """
    if root is None:
        root = tree

    def walk(node):
        if isinstance(node, dict):
            return {k: walk(v) for k, v in node.items()}
        if isinstance(node, list):
            return [walk(v) for v in node]
        if isinstance(node, str):
            m = _INTERP_RE.match(node)
            if m:
                try:
                    target = _get_by_dots(root, m.group(1))
                except (KeyError, IndexError, ValueError, TypeError):
                    return node
                return walk(target)
        return node

    return walk(tree)


def set_by_dots(tree: Dict, dotted: str, value: Any) -> None:
    parts = dotted.split(".")
    cur = tree
    for p in parts[:-1]:
        if isinstance(cur, list):
            cur = cur[int(p)]
        else:
            cur = cur.setdefault(p, {})
    last = parts[-1]
    if isinstance(cur, list):
        cur[int(last)] = value
    else:
        cur[last] = value


def apply_overrides(cfg: Dict, overrides: Sequence[str]) -> Dict:
    """Apply ``a.b.c=value`` CLI overrides (YAML-parsed values)."""
    cfg = copy.deepcopy(cfg)
    for ov in overrides:
        if "=" not in ov:
            raise ValueError(f"Override must be key=value, got {ov!r}")
        key, _, val = ov.partition("=")
        key = key.lstrip("-")
        set_by_dots(cfg, key, yaml.safe_load(val))
    return cfg


def deep_update(base: Dict, extra: Dict) -> Dict:
    out = copy.deepcopy(base)
    for k, v in extra.items():
        if isinstance(v, dict) and isinstance(out.get(k), dict):
            out[k] = deep_update(out[k], v)
        else:
            out[k] = copy.deepcopy(v)
    return out


def _listify(v: Any) -> Any:
    """Convert lists to tuples recursively (flax module fields must be
    hashable)."""
    if isinstance(v, list):
        return tuple(_listify(x) for x in v)
    if isinstance(v, dict):
        return {k: _listify(x) for k, x in v.items()}
    return v


def instantiate(node: Any, tuples: bool = True) -> Any:
    """Recursively build the object tree from ``class_path``/``init_args``
    nodes."""
    if isinstance(node, dict):
        if "class_path" in node:
            cls = import_object(node["class_path"])
            kwargs = {k: instantiate(v, tuples)
                      for k, v in node.get("init_args", {}).items()}
            if tuples:
                kwargs = {k: _listify(v) for k, v in kwargs.items()}
            return cls(**kwargs)
        return {k: instantiate(v, tuples) for k, v in node.items()}
    if isinstance(node, list):
        return [instantiate(v, tuples) for v in node]
    return node


def load_config(path: str, overrides: Sequence[str] = ()) -> Dict:
    with open(path) as f:
        cfg = yaml.safe_load(f)
    if overrides:
        cfg = apply_overrides(cfg, overrides)
    return resolve_interpolations(cfg)


def save_config(cfg: Dict, path: str) -> None:
    with open(path, "w") as f:
        yaml.safe_dump(cfg, f, sort_keys=False)


def convert2samplewise(config: dict) -> dict:
    """Frame-wise -> sample-wise class-path rewriter (reference
    ``models/filters.py:793-809``), for GOLF-fs evaluation."""
    for key, value in config.items():
        if key == "class_path":
            if ".LTVMinimumPhaseFilter" in config["class_path"] and \
                    "Precise" not in config["class_path"]:
                config["class_path"] = \
                    "golf_tpu.models.filters.LTVMinimumPhaseFilterPrecise"
                ia = config.get("init_args", {})
                ia.pop("window", None)
                ia.pop("window_length", None)
                ia.pop("centred", None)
                return config
            if ".LTVMinimumPhaseFIRFilter" in config["class_path"] and \
                    "Precise" not in config["class_path"]:
                config["class_path"] = \
                    "golf_tpu.models.filters.LTVMinimumPhaseFIRFilterPrecise"
                config.get("init_args", {}).pop("conv_method", None)
                return config
            if ".LTVZeroPhaseFIRFilter" in config["class_path"] and \
                    "Precise" not in config["class_path"] and \
                    "AP" not in config["class_path"]:
                config["class_path"] = \
                    "golf_tpu.models.filters.LTVZeroPhaseFIRFilterPrecise"
                config.get("init_args", {}).pop("conv_method", None)
                return config
        elif isinstance(value, dict):
            config[key] = convert2samplewise(value)
    return config
