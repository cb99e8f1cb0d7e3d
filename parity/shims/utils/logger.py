"""setup_logging / wandb hooks (reference train_helper.py:19,58)."""

import logging


def setup_logging(path: str):
    root = logging.getLogger()
    root.setLevel(logging.INFO)
    for h in list(root.handlers):
        root.removeHandler(h)
    fmt = logging.Formatter("%(asctime)s %(levelname)s %(message)s")
    fh = logging.FileHandler(path)
    fh.setFormatter(fmt)
    sh = logging.StreamHandler()
    sh.setFormatter(fmt)
    root.addHandler(fh)
    root.addHandler(sh)


def wandb_log(*a, **k):
    pass


def wandb_commit(*a, **k):
    pass
