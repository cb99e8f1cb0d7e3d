"""Minimal OmegaConf/DictConfig stand-in for running the reference offline.

The reference uses hydra+omegaconf (not installed in this container) only as
a dot-access config carrier at runtime — composition happens in our parity
driver, so this shim needs just: attribute/item access, .get, containment,
iteration, to_object/to_yaml/load, and no-op resolver registration.
(Reference call sites: experiments/train_helper.py:68,134; trainers/base.py;
main_v2.py:59-60.)
"""

from __future__ import annotations

import yaml


class DictConfig:
    def __init__(self, d: dict):
        object.__setattr__(self, "_d", dict(d))

    # -- mapping protocol -------------------------------------------------
    def __getitem__(self, key):
        return _wrap(self._d[key])

    def __setitem__(self, key, value):
        self._d[key] = _unwrap(value)

    def __contains__(self, key):
        return key in self._d

    def __iter__(self):
        return iter(self._d)

    def __len__(self):
        return len(self._d)

    def keys(self):
        return self._d.keys()

    def values(self):
        return [_wrap(v) for v in self._d.values()]

    def items(self):
        return [(k, _wrap(v)) for k, v in self._d.items()]

    def get(self, key, default=None):
        if key in self._d:
            return _wrap(self._d[key])
        return default

    # -- attribute protocol ------------------------------------------------
    def __getattr__(self, key):
        if key.startswith("_"):
            raise AttributeError(key)
        try:
            return _wrap(self._d[key])
        except KeyError:
            raise AttributeError(f"missing config key: {key!r}")

    def __setattr__(self, key, value):
        self._d[key] = _unwrap(value)

    def __repr__(self):
        return f"DictConfig({self._d!r})"

    def __deepcopy__(self, memo):
        import copy

        return DictConfig(copy.deepcopy(self._d, memo))


def _wrap(v):
    if isinstance(v, dict):
        return DictConfig(v)
    return v


def _unwrap(v):
    if isinstance(v, DictConfig):
        return {k: _unwrap(x) for k, x in v._d.items()}
    if isinstance(v, dict):
        return {k: _unwrap(x) for k, x in v.items()}
    if isinstance(v, (list, tuple)):
        return [_unwrap(x) for x in v]
    return v


ListConfig = list


class OmegaConf:
    @staticmethod
    def create(d=None):
        return DictConfig(d or {})

    @staticmethod
    def to_object(cfg):
        return _unwrap(cfg)

    @staticmethod
    def to_container(cfg, resolve=True):
        return _unwrap(cfg)

    @staticmethod
    def to_yaml(cfg):
        return yaml.dump(_unwrap(cfg))

    @staticmethod
    def load(path):
        with open(path) as f:
            return DictConfig(yaml.safe_load(f))

    @staticmethod
    def register_new_resolver(name, fn, **kw):
        pass

    @staticmethod
    def set_struct(cfg, flag):
        pass
