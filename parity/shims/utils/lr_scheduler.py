"""Epoch-granularity LR schedules (reference configs/scheduler/csw.yaml,
no_decay.yaml; stepped once per epoch at trainers/base.py:356, read via
``get_last_lr`` at base.py:42-46).

The cosine-decay-linear-warmup law here deliberately matches the rebuild's
concepthash_tpu/train/optim.py:cosine_decay_linear_warmup so the two sides
see identical LR trajectories in parity runs:
  mult(ep) = min((ep+1)/warmup, 1)              for ep < warmup_epochs
           = 0.5*(1+cos(pi*(ep-warmup)/(epochs-warmup)))  otherwise
"""

import math

from torch.optim.lr_scheduler import LambdaLR


def cosine_decay_linear_warmup(optimizer, epochs: int, warmup_epochs: int = 10):
    def mult(ep):
        if ep < warmup_epochs:
            return min((ep + 1.0) / max(warmup_epochs, 1), 1.0)
        span = max(epochs - warmup_epochs, 1)
        return 0.5 * (1.0 + math.cos(math.pi * (ep - warmup_epochs) / span))

    return LambdaLR(optimizer, mult)


def no_decay(optimizer, **kwargs):
    return LambdaLR(optimizer, lambda ep: 1.0)
