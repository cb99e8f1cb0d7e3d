"""Config-instantiable loaders for shared parity assets: both sides train
against the SAME codebook/center matrices (generated once by make_assets.py)
so codebook RNG differences can't confound the comparison."""

import numpy as np
import torch


def load_center(path: str) -> torch.Tensor:
    return torch.from_numpy(np.load(path).astype("float32"))
