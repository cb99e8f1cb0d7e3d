"""torchvision.models shim: REAL ResNet/AlexNet/VGG16 implementations with
torchvision's exact state_dict layout and geometry (resnet.py, cnn.py) so the
parity/import harness can build and run reference CNN backbones; PEP 562
__getattr__ still satisfies any other ``from torchvision.models import X``
the reference imports at module scope but never calls."""

from . import resnet  # noqa: F401
from .cnn import alexnet, vgg16  # noqa: F401
from .resnet import resnet18, resnet34, resnet50, resnet101  # noqa: F401


def _stub(name):
    def factory(*a, **k):
        raise RuntimeError(f"torchvision.models.{name} is unavailable in "
                           "this container")

    factory.__name__ = name
    return factory


def __getattr__(name):
    return _stub(name)
