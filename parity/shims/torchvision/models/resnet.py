"""Stub blocks (reference models/backbone/resnet.py:4 imports them at module
scope; parity runs never construct torchvision ResNets)."""


class _Unavailable:
    def __init__(self, *a, **k):
        raise RuntimeError("torchvision ResNet blocks are unavailable in this "
                           "container; parity runs use CLIP backbones only")


class BasicBlock(_Unavailable):
    expansion = 1


class Bottleneck(_Unavailable):
    expansion = 4


def __getattr__(name):
    return _Unavailable
