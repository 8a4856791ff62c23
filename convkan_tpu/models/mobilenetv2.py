"""KAN-MobileNetV2 — parity with models/kan_mobilenetv2.py:11-495
(channel-last).

Inverted residuals: expand (1x1 KAN) -> depthwise (std grouped conv or KAN
if replace_depthwise) -> project (1x1 KAN, no activation), residual when
stride 1 and in==out; arches default/small/kan_small (kan_mobilenetv2.py:
215-231).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Mapping, Optional, Tuple

import flax.linen as nn

from ..ops.layers import Linear
from ..ops.pooling import adaptive_avg_pool
from ..ops.std_conv import StdConvBlock
from ..utils.norms import BatchNorm, resolve_norm
from .common import (make_conv_factory, make_mlp_classifier_factory,
                     resolve_classifier_overrides)
from .mobilenet import _make_divisible

# t, c, n, s (kan_mobilenetv2.py:204-213)
V2_DEFAULT = [[1, 16, 1, 1], [6, 24, 2, 2], [6, 32, 3, 2], [6, 64, 4, 2],
              [6, 96, 3, 1], [6, 160, 3, 2], [6, 320, 1, 1]]
# :223-231
V2_KAN_SMALL = [[1, 16, 1, 1], [6, 24, 1, 2], [6, 32, 1, 2], [6, 48, 1, 2],
                [6, 64, 1, 1], [6, 96, 1, 2], [6, 160, 1, 1]]


class MobileNetV2KAN(nn.Module):
    num_classes: int = 1000
    width_mult: float = 1.0
    round_nearest: int = 8
    dropout: float = 0.2
    input_channels: int = 3
    arch: str = "default"
    conv_type: str = "kanconv"
    kan_conv: Optional[str] = "KAN"
    kan_classifier: Optional[str] = "KAN"
    classifier_type: str = "Linear"
    groups: int = 1
    degree: int = 3
    spline_order: int = 3
    grid_size: int = 5
    base_activation: Any = "silu"
    grid_range: Tuple[float, float] = (-1, 1)
    l1_decay: float = 0.0
    affine: bool = True
    norm_layer: Any = BatchNorm
    # ctor-signature parity only — dead in the reference (see __call__)
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
        convs = (f"_{(self.kan_conv or 'KAN').upper()}"
                 if self.conv_type == "kanconv" else "_CONV")
        head = self.classifier_type
        if self.classifier_type == "KAN":
            head += f"_{(self.kan_classifier or 'KAN').upper()}"
        rdw = ("_RDW" if self.replace_depthwise and self.conv_type == "kanconv"
               else "")
        return f"MobileNetV2KAN_{head}{convs}{rdw}_{self.arch}"

    @nn.compact
    def __call__(self, x, train: bool = True):
        conv = make_conv_factory(
            self.conv_type, self.kan_conv, spline_order=self.spline_order,
            grid_size=self.grid_size, base_activation=self.base_activation,
            grid_range=self.grid_range, dropout=self.conv_dropout,
            l1_decay=self.l1_decay, degree=self.degree,
            norm_layer=self.norm_layer,
            # kan_norm_layer is dead in the reference: InvertedResidual
            # overrides norm_layer on every factory call
            # (kan_mobilenetv2.py:107,121,137,153) and the stem/last convs
            # do too (:329,:351)
            kan_norm_layer=self.norm_layer,
            affine=self.affine,
            # reference std path: activation_layer = nn.ReLU6 for
            # stem/expand/last (kan_mobilenetv2.py:234)
            std_activation="relu6",
            # ConvNormActivation quirk: bias = norm is None or not affine
            # (kan_mobilenetv2.py:294) on the conv_type='conv' path
            std_bias_when_not_affine=True)

        if self.arch not in ("default", "small", "kan_small"):
            # the reference crashes with UnboundLocalError on unknown
            # arches (kan_mobilenetv2.py:215-231); fail with a real error
            raise ValueError(f"Unknown MobileNetV2 arch: {self.arch!r} "
                             "(default | small | kan_small)")
        setting = V2_KAN_SMALL if self.arch == "kan_small" else V2_DEFAULT
        initial_stride = 2 if self.arch == "default" else 1

        def std_dw(c, stride):
            # relu6 depthwise (kan_mobilenetv2.py:126-143, activation ReLU6)
            return StdConvBlock(
                in_planes=c, out_planes=c, kernel_size=3, stride=stride,
                padding=1, groups=c,
                base_activation=lambda v: nn.relu6(v),
                norm_layer=resolve_norm(self.norm_layer),
                norm_kwargs={"affine": self.affine})

        c_in = _make_divisible(32 * self.width_mult, self.round_nearest)
        last_c = _make_divisible(1280 * max(1.0, self.width_mult),
                                 self.round_nearest)

        x = conv(self.input_channels, c_in, kernel_size=3,
                 stride=initial_stride)(x, train=train)

        for t, c, n, s in setting:
            c_out = _make_divisible(c * self.width_mult, self.round_nearest)
            for i in range(n):
                stride = s if i == 0 else 1
                hidden = int(round(c_in * t))
                use_res = stride == 1 and c_in == c_out
                y = x
                if t != 1:
                    y = conv(c_in, hidden, kernel_size=1, stride=1)(
                        y, train=train)
                if self.replace_depthwise:
                    y = conv(hidden, hidden, kernel_size=3, stride=stride,
                             groups=hidden)(y, train=train)
                else:
                    y = std_dw(hidden, stride)(y, train=train)
                # project: "no activation" — the reference passes
                # activation_layer=None (kan_mobilenetv2.py:146-156); the
                # kanconv builder ignores the kwarg (signature-filtered in
                # the reference), the std path honors it (linear
                # bottleneck projection)
                y = conv(hidden, c_out, kernel_size=1, stride=1,
                         activation=None)(y, train=train)
                x = x + y if use_res else y
                c_in = c_out

        x = conv(c_in, last_c, kernel_size=1)(x, train=train)
        x = adaptive_avg_pool(x, (1, 1)).reshape(x.shape[0], -1)

        ov = resolve_classifier_overrides(
            self.classifier_overrides, dropout=self.dropout,
            spline_order=self.spline_order, grid_size=self.grid_size,
            base_activation=None, grid_range=self.grid_range,
            l1_decay=self.l1_decay, degree=self.degree)

        x = nn.Dropout(rate=ov["dropout"])(x, deterministic=not train)
        if self.classifier_type == "KAN":
            head = make_mlp_classifier_factory(
                self.kan_classifier, dropout=ov["dropout"],
                spline_order=ov["spline_order"], grid_size=ov["grid_size"],
                base_activation=ov["base_activation"],
                grid_range=ov["grid_range"], l1_decay=ov["l1_decay"],
                degree=ov["degree"], first_dropout=False)
            x = head([last_c, self.num_classes])(x, train=train)
        else:
            x = Linear(in_features=last_c, out_features=self.num_classes)(x)
        return x


def mobilenet_v2_kan(num_classes: int = 1000, **kwargs) -> MobileNetV2KAN:
    overrides = {k: kwargs.pop(k) for k in list(kwargs)
                 if k.startswith("classifier_") and k != "classifier_type"}
    if kwargs.get("arch") is None:
        kwargs["arch"] = "default"
    field_names = {f.name for f in dataclasses.fields(MobileNetV2KAN)}
    kwargs = {k: v for k, v in kwargs.items() if k in field_names}
    return MobileNetV2KAN(num_classes=num_classes,
                          classifier_overrides=overrides, **kwargs)
