"""HashingDataset / OneHot / subset_dataset (reference call sites:
configs/dataset/*.yaml specs, trainers/base.py:237 (image, onehot, index)
triples, trainers/adsh.py:131).

Manifest format: one ``<image-path> <int-label>`` per line (reference
data/cub200_2011/train.txt); paths resolve against ``root`` first, then
bare (some upstream manifests embed the data/ prefix)."""

from __future__ import annotations

import os

import torch
from PIL import Image
from torch.utils.data import Dataset


class OneHot:
    def __init__(self, nclass: int):
        self.nclass = nclass

    def __call__(self, label):
        onehot = torch.zeros(self.nclass, dtype=torch.float32)
        onehot[int(label)] = 1.0
        return onehot


class HashingDataset(Dataset):
    def __init__(self, root: str, filename: str, transform=None,
                 target_transform=None, num_classes: int = 0,
                 num_shots: int = 0, **kwargs):
        self.root = root
        self.transform = transform if isinstance(transform, (list, tuple)) \
            else ([transform] if transform else [])
        self.target_transform = target_transform
        self.num_classes = num_classes

        self.paths, self.labels = [], []
        with open(os.path.join(root, filename)) as f:
            for line in f:
                line = line.strip()
                if not line:
                    continue
                path, label = line.rsplit(" ", 1)
                self.paths.append(path)
                self.labels.append(int(label))

        if num_shots and num_shots > 0:  # few-shot: first n per class
            keep, counts = [], {}
            for i, y in enumerate(self.labels):
                if counts.get(y, 0) < num_shots:
                    counts[y] = counts.get(y, 0) + 1
                    keep.append(i)
            self.paths = [self.paths[i] for i in keep]
            self.labels = [self.labels[i] for i in keep]

    def _resolve(self, path: str) -> str:
        cand = os.path.join(self.root, path)
        return cand if os.path.exists(cand) else path

    def __len__(self):
        return len(self.paths)

    def __getitem__(self, index: int):
        with Image.open(self._resolve(self.paths[index])) as im:
            image = im.convert("RGB")
            for t in self.transform:
                image = t(image)
        label = self.labels[index]
        if self.target_transform is not None:
            label = self.target_transform(label)
        return image, label, index


def subset_dataset(dataset: HashingDataset, indices):
    """Index-remapped view (reference trainers/adsh.py:131)."""

    class _Subset(Dataset):
        def __len__(self):
            return len(indices)

        def __getitem__(self, i):
            image, label, _ = dataset[int(indices[i])]
            return image, label, i

    return _Subset()
