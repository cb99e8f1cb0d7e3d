"""No-op wandb: the reference imports it unconditionally
(experiments/train_helper.py:11) but the parity runs set ``wandb: False``."""


def login(*a, **k):
    pass


def init(*a, **k):
    pass


def log(*a, **k):
    pass


def finish(*a, **k):
    pass
