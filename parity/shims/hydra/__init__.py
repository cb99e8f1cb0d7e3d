"""Minimal hydra stand-in: the reference only needs hydra.utils.instantiate
at runtime (trainers/base.py:34,99-101,128-131,169-170; train_helper.py:74).
Config composition is done by the parity driver, not by @hydra.main."""

from . import utils  # noqa: F401


def main(*a, **k):  # the parity driver never routes through @hydra.main
    def deco(fn):
        return fn

    return deco
