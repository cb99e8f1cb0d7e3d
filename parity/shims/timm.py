"""Import-only timm stub (reference models/backbone/{vit,swinvit}.py import
it at module scope via models/backbone/__init__.py; parity runs never build
timm backbones)."""


def __getattr__(name):
    def factory(*a, **k):
        raise RuntimeError("timm is unavailable in this container; "
                           "parity runs use CLIP backbones only")

    return factory
