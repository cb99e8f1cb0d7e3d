"""Import-only torchvision stub: models/backbone/clip.py:5 imports resnet50
at module scope; the parity runs never call it (CLIP backbones only)."""

from . import models  # noqa: F401
