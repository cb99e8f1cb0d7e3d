"""`_target_` resolution via an explicit factory registry.

The reference uses hydra's ``hydra.utils.instantiate`` with arbitrary import
paths — including side-effectful calls buried inside model configs (codebook
generation, reference trainers/orthohash.py:63-78 invoked from
configs/model/concept_hash_final_v1_nosa_apt.yaml:26). We keep the YAML shape
(``_target_`` / ``_args_`` keys) but resolve names through a registry of
factories, restricted to this package's namespace, so config-driven
construction is explicit and auditable (SURVEY.md §5.6 rebuild note).
"""

from __future__ import annotations

import importlib
from typing import Any, Callable

_REGISTRY: dict[str, Callable] = {}

_ALLOWED_PREFIXES = ("concepthash_tpu.",)


def register(name: str, fn: Callable | None = None):
    """Register a factory under ``name``. Usable as a decorator."""

    def _inner(f):
        _REGISTRY[name] = f
        return f

    if fn is not None:
        return _inner(fn)
    return _inner


def resolve_target(target: str) -> Callable:
    if target in _REGISTRY:
        return _REGISTRY[target]
    if target.startswith(_ALLOWED_PREFIXES):
        module_name, _, attr = target.rpartition(".")
        mod = importlib.import_module(module_name)
        fn = getattr(mod, attr)
        _REGISTRY[target] = fn
        return fn
    raise KeyError(
        f"unknown _target_ {target!r}: not registered and not inside "
        f"{_ALLOWED_PREFIXES}. Register it with concepthash_tpu.config.register()."
    )


def instantiate(cfg: Any, *args, _recursive_: bool = True, **overrides):
    """Recursively build objects from config dicts carrying ``_target_``.

    - dicts with ``_target_`` become calls; ``_args_`` supplies positionals.
    - nested dicts/lists are instantiated bottom-up (unless _recursive_=False).
    - plain dicts/lists pass through with children instantiated.
    """
    if isinstance(cfg, dict):
        if "_target_" in cfg:
            target = resolve_target(cfg["_target_"])
            kwargs = {}
            pos = list(args)
            for k, v in cfg.items():
                if k in ("_target_", "_recursive_"):
                    continue
                if k == "_args_":
                    built = instantiate(v) if _recursive_ else v
                    pos = pos + list(built)
                else:
                    kwargs[k] = instantiate(v) if _recursive_ else v
            kwargs.update(overrides)
            return target(*pos, **kwargs)
        return {k: (instantiate(v) if _recursive_ else v) for k, v in cfg.items()}
    if isinstance(cfg, list):
        return [instantiate(v) if _recursive_ else v for v in cfg]
    return cfg
