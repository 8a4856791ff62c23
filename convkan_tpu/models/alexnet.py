"""KAN-AlexNet — parity with models/kan_alexnet.py:11-313 (channel-last).

Two arches: 'default' (11x11 s4 stem, 4096-wide head) and 'small' (5x5 s1
stem, 1024-wide head); heads: Linear/AlexNet 3-FC or 'KAN' = FC,FC,KAN-out;
AdaptiveAvgPool2d(6,6) -> 256*36 features.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Mapping, Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp

from ..ops.layers import Linear
from ..ops.pooling import adaptive_avg_pool, max_pool
from ..utils.norms import BatchNorm, InstanceNorm
from .common import (make_conv_factory, make_mlp_classifier_factory,
                     resolve_classifier_overrides)


class AlexNetKAN(nn.Module):
    num_classes: int = 1000
    dropout: float = 0.5
    input_channels: int = 3
    arch: str = "default"
    conv_type: str = "kanconv"
    kan_conv: Optional[str] = "KAN"
    kan_classifier: Optional[str] = "KAN"
    classifier_type: str = "Linear"
    groups: int = 1
    spline_order: int = 3
    grid_size: int = 5
    base_activation: Any = "silu"
    grid_range: Tuple[float, float] = (-1, 1)
    degree: int = 3
    l1_decay: float = 0.0
    affine: bool = True
    norm_layer: Any = BatchNorm
    kan_norm_layer: Any = InstanceNorm
    conv_dropout: float = 0.0
    classifier_overrides: Mapping[str, Any] = dataclasses.field(
        default_factory=dict)

    @property
    def model_name(self) -> str:
        # `name` is reserved by flax.linen for module scoping; the
        # reference's `model.name` checkpoint-naming contract maps to
        # `model_name` here
        suffix = (f"_{(self.kan_conv or 'KAN').upper()}"
                  if self.conv_type == "kanconv" else "_CONV")
        head = self.classifier_type
        if self.classifier_type in ("KAN", "AlexNetKAN"):
            head += f"_{(self.kan_classifier or 'KAN').upper()}"
        return f"AlexNet_{head}{suffix}"

    @nn.compact
    def __call__(self, x, train: bool = True):
        conv = make_conv_factory(
            self.conv_type, self.kan_conv, spline_order=self.spline_order,
            grid_size=self.grid_size, base_activation=self.base_activation,
            grid_range=self.grid_range, dropout=self.conv_dropout,
            l1_decay=self.l1_decay, degree=self.degree,
            norm_layer=self.norm_layer, kan_norm_layer=self.kan_norm_layer,
            affine=self.affine)

        g = self.groups
        if self.arch == "default":
            # kan_alexnet.py:119-127
            x = conv(self.input_channels, 64, kernel_size=11, stride=4,
                     padding=2, groups=g)(x, train=train)
            x = max_pool(x, 3, 2)
            x = conv(64, 192, kernel_size=5, padding=2, groups=g)(x, train=train)
            x = max_pool(x, 3, 2)
            x = conv(192, 384, kernel_size=3, padding=1, groups=g)(x, train=train)
            x = conv(384, 256, kernel_size=3, padding=1, groups=g)(x, train=train)
            x = conv(256, 256, kernel_size=3, padding=1, groups=g)(x, train=train)
            x = max_pool(x, 3, 2)
            hidden = 4096
        elif self.arch == "small":
            # kan_alexnet.py:129-137
            x = conv(self.input_channels, 64, kernel_size=5, stride=1,
                     padding=2, groups=g)(x, train=train)
            x = max_pool(x, 3, 2)
            x = conv(64, 192, kernel_size=5, padding=2, groups=g)(x, train=train)
            x = max_pool(x, 3, 2)
            x = conv(192, 384, kernel_size=3, padding=1, groups=g)(x, train=train)
            x = conv(384, 256, kernel_size=3, padding=1, groups=g)(x, train=train)
            x = conv(256, 256, kernel_size=3, padding=1, groups=g)(x, train=train)
            x = max_pool(x, 3, 2)
            hidden = 1024
        else:
            raise ValueError(f"Unknown arch: {self.arch}")

        x = adaptive_avg_pool(x, (6, 6))
        x = x.reshape(x.shape[0], -1)
        feat = 256 * 36

        ov = resolve_classifier_overrides(
            self.classifier_overrides, dropout=self.dropout,
            spline_order=self.spline_order, grid_size=self.grid_size,
            base_activation=None, grid_range=self.grid_range,
            l1_decay=self.l1_decay, degree=self.degree)
        p = ov["dropout"]

        x = nn.Dropout(rate=p)(x, deterministic=not train)
        x = Linear(in_features=feat, out_features=hidden)(x)
        x = nn.relu(x)
        x = nn.Dropout(rate=p)(x, deterministic=not train)
        x = Linear(in_features=hidden, out_features=hidden)(x)
        x = nn.relu(x)
        # reference quirk: classifier_type='AlexNetKAN' NAMES a KAN head
        # (and builds a factory) but its head construction falls through
        # to the plain 3x-Linear else-branch (kan_alexnet.py:151,195-199)
        # — replicated: only 'KAN' gets the KAN final layer
        if self.classifier_type == "KAN":
            head = make_mlp_classifier_factory(
                self.kan_classifier, dropout=p,
                spline_order=ov["spline_order"], grid_size=ov["grid_size"],
                base_activation=ov["base_activation"],
                grid_range=ov["grid_range"], l1_decay=ov["l1_decay"],
                degree=ov["degree"], first_dropout=False)
            x = head([hidden, self.num_classes])(x, train=train)
        else:
            x = Linear(in_features=hidden, out_features=self.num_classes)(x)
        return x


def alexnet_kan(num_classes: int = 1000, input_channels: int = 3,
                **kwargs) -> AlexNetKAN:
    """Builder parity (kan_alexnet.py:259-313)."""
    overrides = {k: kwargs.pop(k) for k in list(kwargs)
                 if k.startswith("classifier_") and k != "classifier_type"}
    if kwargs.get("arch") is None:  # missing key or explicit None
        kwargs["arch"] = "default"
    field_names = {f.name for f in dataclasses.fields(AlexNetKAN)}
    kwargs = {k: v for k, v in kwargs.items() if k in field_names}
    return AlexNetKAN(num_classes=num_classes, input_channels=input_channels,
                      classifier_overrides=overrides, **kwargs)
