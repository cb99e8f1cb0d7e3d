"""hydra.utils.instantiate shim: resolves ``_target_`` import paths and
recursively instantiates nested specs (the subset of hydra 1.x semantics the
reference exercises: nested _target_ dicts, _args_ positional lists, lists of
specs, extra positional args appended at the call site)."""

from __future__ import annotations

import importlib

from omegaconf import DictConfig, OmegaConf


def _import(path: str):
    module, _, name = path.rpartition(".")
    return getattr(importlib.import_module(module), name)


def _is_spec(v) -> bool:
    return isinstance(v, (dict, DictConfig)) and "_target_" in v


def _resolve(v):
    """Instantiate specs; keep plain dicts dot-accessible (DictConfig)."""
    if _is_spec(v):
        return instantiate(v)
    if isinstance(v, DictConfig):
        return v
    if isinstance(v, dict):
        return DictConfig(v)
    if isinstance(v, (list, tuple)):
        return [_resolve(x) for x in v]
    return v


def instantiate(cfg, *args, **kwargs):
    if cfg is None:
        return None
    if isinstance(cfg, (list, tuple)):
        return [_resolve(x) for x in cfg]
    if not _is_spec(cfg):
        return cfg
    plain = OmegaConf.to_object(cfg) if isinstance(cfg, DictConfig) else dict(cfg)
    target = _import(plain.pop("_target_"))
    pos = [_resolve(a) for a in plain.pop("_args_", [])]
    plain.pop("_recursive_", None)
    plain.pop("_convert_", None)
    kw = {k: _resolve(v) for k, v in plain.items()}
    kw.update(kwargs)
    return target(*pos, *args, **kw)


def get_class(path: str):
    return _import(path)


def get_method(path: str):
    return _import(path)
