"""Minimal torchvision stub for the reference oracle.

The reference models import `torchvision.ops.misc.SqueezeExcitation`
(models/kan_mobilenetv3.py:8, kan_efficientnet.py:10,
kan_efficientnetv2.py:10), but torchvision is not installed in this image.
This registers a faithful reimplementation of that one public module
(same parameter names fc1/fc2, same forward) so the reference models can
be instantiated as numerical oracles for golden dumps.

Import this BEFORE importing any reference model module.
"""

import sys
import types

import torch


class SqueezeExcitation(torch.nn.Module):
    """torchvision.ops.SqueezeExcitation (public API)."""

    def __init__(self, input_channels, squeeze_channels,
                 activation=torch.nn.ReLU,
                 scale_activation=torch.nn.Sigmoid):
        super().__init__()
        self.avgpool = torch.nn.AdaptiveAvgPool2d(1)
        self.fc1 = torch.nn.Conv2d(input_channels, squeeze_channels, 1)
        self.fc2 = torch.nn.Conv2d(squeeze_channels, input_channels, 1)
        self.activation = activation()
        self.scale_activation = scale_activation()

    def _scale(self, x):
        s = self.avgpool(x)
        s = self.fc1(s)
        s = self.activation(s)
        s = self.fc2(s)
        return self.scale_activation(s)

    def forward(self, x):
        return self._scale(x) * x


def install():
    if "torchvision" in sys.modules:
        return
    tv = types.ModuleType("torchvision")
    ops = types.ModuleType("torchvision.ops")
    misc = types.ModuleType("torchvision.ops.misc")
    misc.SqueezeExcitation = SqueezeExcitation
    ops.misc = misc
    ops.SqueezeExcitation = SqueezeExcitation
    tv.ops = ops
    sys.modules["torchvision"] = tv
    sys.modules["torchvision.ops"] = ops
    sys.modules["torchvision.ops.misc"] = misc


install()
