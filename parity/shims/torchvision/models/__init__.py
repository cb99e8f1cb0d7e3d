"""Import-only stubs: reference backbone modules import torchvision model
factories at module scope (alexnet.py:3, vgg16.py, resnet.py,
backbone/clip.py:5); the parity runs never call them (CLIP backbones only).
PEP 562 __getattr__ satisfies any ``from torchvision.models import X``."""

from . import resnet  # noqa: F401


def _stub(name):
    def factory(*a, **k):
        raise RuntimeError(f"torchvision.models.{name} is unavailable in this "
                           "container; parity runs use CLIP backbones only")

    factory.__name__ = name
    return factory


def __getattr__(name):
    return _stub(name)
