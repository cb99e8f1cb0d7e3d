"""Functional torchvision-compatible AlexNet / VGG16 shims.

Independent reimplementations with torchvision's exact module/state_dict
structure (``features.{i}`` Sequential indices, ``avgpool``,
``classifier.{i}``) and geometry, so the reference wrappers
(models/backbone/alexnet.py:12-20, vgg16.py:12-23) build and run for parity
and checkpoint-import tests against the flax rebuild
(concepthash_tpu/models/convnets.py). ``pretrained=True`` raises — no
weights are available in this container.
"""

import torch.nn as nn


class AlexNet(nn.Module):
    def __init__(self, num_classes=1000, dropout=0.5):
        super().__init__()
        self.features = nn.Sequential(
            nn.Conv2d(3, 64, 11, stride=4, padding=2),       # 0
            nn.ReLU(inplace=True),                            # 1
            nn.MaxPool2d(3, stride=2),                        # 2
            nn.Conv2d(64, 192, 5, padding=2),                 # 3
            nn.ReLU(inplace=True),                            # 4
            nn.MaxPool2d(3, stride=2),                        # 5
            nn.Conv2d(192, 384, 3, padding=1),                # 6
            nn.ReLU(inplace=True),                            # 7
            nn.Conv2d(384, 256, 3, padding=1),                # 8
            nn.ReLU(inplace=True),                            # 9
            nn.Conv2d(256, 256, 3, padding=1),                # 10
            nn.ReLU(inplace=True),                            # 11
            nn.MaxPool2d(3, stride=2),                        # 12
        )
        self.avgpool = nn.AdaptiveAvgPool2d((6, 6))
        self.classifier = nn.Sequential(
            nn.Dropout(p=dropout),                            # 0
            nn.Linear(256 * 6 * 6, 4096),                     # 1
            nn.ReLU(inplace=True),                            # 2
            nn.Dropout(p=dropout),                            # 3
            nn.Linear(4096, 4096),                            # 4
            nn.ReLU(inplace=True),                            # 5
            nn.Linear(4096, num_classes),                     # 6
        )

    def forward(self, x):
        x = self.avgpool(self.features(x))
        return self.classifier(x.flatten(1))


_VGG16_CFG = (64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
              512, 512, 512, "M", 512, 512, 512, "M")


class VGG(nn.Module):
    def __init__(self, num_classes=1000, dropout=0.5):
        super().__init__()
        layers, in_ch = [], 3
        for v in _VGG16_CFG:
            if v == "M":
                layers.append(nn.MaxPool2d(2, stride=2))
            else:
                layers += [nn.Conv2d(in_ch, v, 3, padding=1),
                           nn.ReLU(inplace=True)]
                in_ch = v
        self.features = nn.Sequential(*layers)
        self.avgpool = nn.AdaptiveAvgPool2d((7, 7))
        self.classifier = nn.Sequential(
            nn.Linear(512 * 7 * 7, 4096),                     # 0
            nn.ReLU(inplace=True),                            # 1
            nn.Dropout(p=dropout),                            # 2
            nn.Linear(4096, 4096),                            # 3
            nn.ReLU(inplace=True),                            # 4
            nn.Dropout(p=dropout),                            # 5
            nn.Linear(4096, num_classes),                     # 6
        )

    def forward(self, x):
        x = self.avgpool(self.features(x))
        return self.classifier(x.flatten(1))


def alexnet(pretrained=False, weights=None, **kwargs):
    if pretrained or weights:
        raise RuntimeError("torchvision pretrained weights are unavailable "
                           "in this container; build with pretrained=False")
    return AlexNet(**kwargs)


def vgg16(pretrained=False, weights=None, **kwargs):
    if pretrained or weights:
        raise RuntimeError("torchvision pretrained weights are unavailable "
                           "in this container; build with pretrained=False")
    return VGG(**kwargs)
