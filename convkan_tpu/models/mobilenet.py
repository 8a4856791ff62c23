"""KAN-MobileNetV1 — parity with models/kan_mobilenet.py:13-410
(channel-last).

13 depthwise-separable stages; the 3x3 depthwise is either a grouped
standard conv or (replace_depthwise=True) a grouped KAN conv; the 1x1
pointwise is always the KAN factory; width_mult via _make_divisible.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Mapping, Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp

from ..ops.layers import Linear
from ..ops.pooling import adaptive_avg_pool
from ..ops.std_conv import StdConvBlock
from ..utils.norms import BatchNorm, resolve_norm
from .common import (make_conv_factory, make_mlp_classifier_factory,
                     resolve_classifier_overrides)


def _make_divisible(v: float, divisor: int, min_value: Optional[int] = None) -> int:
    """models/kan_mobilenet.py:13-19 (torchvision recipe)."""
    if min_value is None:
        min_value = divisor
    new_v = max(min_value, int(v + divisor / 2) // divisor * divisor)
    if new_v < 0.9 * v:
        new_v += divisor
    return new_v


# (channels, stride) table — kan_mobilenet.py:235-245
V1_SETTING = [(64, 1), (128, 2), (128, 1), (256, 2), (256, 1), (512, 2),
              (512, 1), (512, 1), (512, 1), (512, 1), (512, 1), (1024, 2),
              (1024, 1)]


class MobileNetV1KAN(nn.Module):
    num_classes: int = 1000
    width_mult: float = 1.0
    dropout: float = 0.2
    input_channels: int = 3
    conv_type: str = "kanconv"
    kan_conv: Optional[str] = "KAN"
    kan_classifier: Optional[str] = "KAN"
    classifier_type: str = "Linear"
    groups: int = 1
    spline_order: int = 3
    grid_size: int = 5
    base_activation: Any = "relu"
    grid_range: Tuple[float, float] = (-1, 1)
    l1_decay: float = 0.0
    degree: int = 3
    affine: bool = True
    norm_layer: Any = BatchNorm
    kan_norm_layer: Any = BatchNorm
    replace_depthwise: bool = False
    conv_dropout: float = 0.0
    classifier_overrides: Mapping[str, Any] = dataclasses.field(
        default_factory=dict)

    @property
    def model_name(self) -> str:
        # `name` is reserved by flax.linen for module scoping; the
        # reference's `model.name` checkpoint-naming contract maps to
        # `model_name` here
        head = (f"_{(self.kan_classifier or 'KAN').upper()}"
                if self.classifier_type == "KAN" else f"_{self.classifier_type}")
        convs = (f"_{(self.kan_conv or 'KAN').upper()}"
                 if self.conv_type == "kanconv" else "_CONV")
        rdw = ("_RDW" if self.replace_depthwise and self.conv_type == "kanconv"
               else "")
        return f"MobileNetV1KAN{head}{convs}{rdw}_w{self.width_mult}"

    def _factory(self):
        return make_conv_factory(
            self.conv_type, self.kan_conv, spline_order=self.spline_order,
            grid_size=self.grid_size,
            base_activation=self.base_activation or "relu",
            grid_range=self.grid_range, dropout=self.conv_dropout,
            l1_decay=self.l1_decay, degree=self.degree,
            norm_layer=self.norm_layer,
            # kan_norm_layer is dead in the reference's intended wiring:
            # DepthwiseSeparable overrides norm_layer on every factory call
            # (kan_mobilenet.py:92,106,121) — its kanconv path crashes
            # before this matters, but the conv path shows the pattern
            kan_norm_layer=self.norm_layer,
            affine=self.affine,
            # reference std path: activation_layer = base_activation or
            # ReLU (kan_mobilenet.py:171)
            std_activation=self.base_activation or "relu")

    @nn.compact
    def __call__(self, x, train: bool = True):
        conv = self._factory()

        def std_dw(in_c, stride):
            # kan_mobilenet.py:100-112: plain grouped 3x3 Conv->Norm->Act
            return StdConvBlock(
                in_planes=in_c, out_planes=in_c, kernel_size=3,
                stride=stride, padding=1, groups=in_c,
                base_activation=self.base_activation or "relu",
                norm_layer=resolve_norm(self.norm_layer),
                norm_kwargs={"affine": self.affine})

        c_in = _make_divisible(32 * self.width_mult, 8)
        # stem: stride-2 3x3 (kan_mobilenet.py:247-258).  The KAN factory's
        # auto-'same' padding yields 1 for k=3.
        x = conv(self.input_channels, c_in, kernel_size=3, stride=2)(
            x, train=train)

        for c, s in V1_SETTING:
            c_out = _make_divisible(c * self.width_mult, 8)
            if self.replace_depthwise:
                x = conv(c_in, c_in, kernel_size=3, stride=s, groups=c_in)(
                    x, train=train)
            else:
                x = std_dw(c_in, s)(x, train=train)
            x = conv(c_in, c_out, kernel_size=1, stride=1)(x, train=train)
            c_in = c_out

        x = adaptive_avg_pool(x, (1, 1)).reshape(x.shape[0], -1)

        ov = resolve_classifier_overrides(
            self.classifier_overrides, dropout=self.dropout,
            spline_order=self.spline_order, grid_size=self.grid_size,
            base_activation=None, grid_range=self.grid_range,
            l1_decay=self.l1_decay, degree=self.degree)

        if self.classifier_type == "KAN":
            head = make_mlp_classifier_factory(
                self.kan_classifier, dropout=ov["dropout"],
                spline_order=ov["spline_order"], grid_size=ov["grid_size"],
                base_activation=ov["base_activation"],
                grid_range=ov["grid_range"], l1_decay=ov["l1_decay"],
                degree=ov["degree"], first_dropout=True)
            x = nn.Dropout(rate=ov["dropout"])(x, deterministic=not train)
            x = head([c_in, self.num_classes])(x, train=train)
        elif self.classifier_type == "Linear":
            x = nn.Dropout(rate=ov["dropout"])(x, deterministic=not train)
            x = Linear(in_features=c_in, out_features=self.num_classes)(x)
        # else Identity (kan_mobilenet.py:314-316)
        return x


def mobilenet_v1_kan(num_classes: int = 1000, **kwargs) -> MobileNetV1KAN:
    overrides = {k: kwargs.pop(k) for k in list(kwargs)
                 if k.startswith("classifier_") and k != "classifier_type"}
    field_names = {f.name for f in dataclasses.fields(MobileNetV1KAN)}
    kwargs = {k: v for k, v in kwargs.items() if k in field_names}
    return MobileNetV1KAN(num_classes=num_classes,
                          classifier_overrides=overrides, **kwargs)
