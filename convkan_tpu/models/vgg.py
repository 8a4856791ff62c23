"""KAN-VGG — parity with models/kan_vgg.py (cfgs :20-26, make_layers
:39-176, VGGKAN :190-304, vggkan :307-343), rebuilt as a channel-last Flax
model.

Any CONV_KAN_FACTORY conv type x any MLP_KAN_FACTORY classifier head, five
arch configs, width scaling, the same classifier-type menu
(KAN/Linear/HiddenKAN/VGGKAN/VGG/Identity) and the same
`classifier_*` override vocabulary.
"""

from __future__ import annotations

import dataclasses
from inspect import signature
from math import prod
from typing import Any, Callable, Mapping, Optional, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from ..factory.conv_factory import CONV_KAN_FACTORY
from ..factory.mlp_factory import MLP_KAN_FACTORY
from ..ops.layers import Linear
from ..ops.pooling import adaptive_avg_pool, max_pool
from ..ops.std_conv import StdConvBlock
from ..utils.norms import InstanceNorm, resolve_norm

cfgs: dict[str, list] = {
    "VGG16_small": [16, 16, "M", 32, 32, "M", 64, 64, 64, "M", 128, 128, 128,
                    "M", 128, 128, 128],
    "VGG16_kansmall": [8, 8, "M", 16, 16, "M", 32, 32, 32, "M", 64, 64, 64,
                       "M", 64, 64, 64],
    "VGG19_small": [16, 16, "M", 32, 32, "M", 64, 64, 64, 64, "M", 128, 128,
                    128, 128, "M", 128, 128, 128, 128],
    "VGG16": [64, 64, "M", 128, 128, "M", 256, 256, 256, "M", 512, 512, 512,
              "M", 512, 512, 512],
    "VGG19": [64, 64, "M", 128, 128, "M", 256, 256, 256, 256, "M", 512, 512,
              512, 512, "M", 512, 512, 512, 512],
}


def _filtered(fn: Callable, kwargs: Mapping[str, Any]) -> dict:
    """Named-parameter filter, NO **kwargs passthrough — deliberately
    matching the reference's `k in signature(fn).parameters` check
    (kan_vgg.py:92-94): keys like 'affine' that only a factory's
    **norm_kwargs could absorb are dropped there too, so VGG KAN norms
    never see affine in either implementation."""
    valid = signature(fn).parameters
    return {k: v for k, v in kwargs.items() if k in valid}


def make_classifier_factory(classifier_type: str, kan_classifier: Optional[str],
                            spline_order=3, grid_size=5, base_activation=None,
                            grid_range=(-1, 1), l1_decay=0.0, degree=3,
                            **overrides):
    """Build the MLP-KAN classifier factory with the reference's
    `classifier_*` override semantics (kan_vgg.py:226-260)."""
    if classifier_type not in ("HiddenKAN", "VGGKAN", "KAN"):
        return None, "None"
    kan_classifier = kan_classifier or "KAN"
    fn = MLP_KAN_FACTORY[kan_classifier]
    def _ov(key, default):
        # reference semantics: `classifier_X if ... is not None else X`
        # (kan_vgg.py:238-244) — an explicit 0 must win over the default
        v = overrides.get(key)
        return v if v is not None else default

    args = {
        "spline_order": _ov("classifier_spline_order", spline_order),
        "grid_size": _ov("classifier_grid_size", grid_size),
        "base_activation": _ov("classifier_base_activation", "silu"),
        "grid_range": _ov("classifier_grid_range", grid_range),
        "l1_decay": _ov("classifier_l1_decay", l1_decay),
        "degree": _ov("classifier_degree", degree),
        "dropout": 0.0,
        "first_dropout": False,
    }

    def factory(layers_hidden):
        return fn(layers_hidden, **{k: v for k, v in args.items()
                                    if k not in ("dropout", "first_dropout")},
                  dropout=args["dropout"], first_dropout=args["first_dropout"])

    return factory, kan_classifier


class VGGKAN(nn.Module):
    """Channel-last VGG with KAN convs (NHWC in, logits out)."""

    input_channels: int
    num_classes: int
    conv_type: str = "kanconv"
    kan_conv: Optional[str] = "KAN"
    kan_classifier: Optional[str] = "KAN"
    groups: int = 1
    spline_order: int = 3
    grid_size: int = 5
    base_activation: Any = "silu"
    grid_range: Tuple[float, float] = (-1, 1)
    dropout: float = 0.0
    l1_decay: float = 0.0
    dropout_linear: float = 0.5
    arch: str = "VGG16"
    classifier_type: str = "Linear"
    expected_feature_shape: Tuple[int, int] = (1, 1)
    width_scale: int = 1
    affine: bool = False
    norm_layer: Any = InstanceNorm
    kan_norm_layer: Any = InstanceNorm
    std_conv_kernel_size: int = 3
    std_conv_padding: int = 1
    degree: int = 3
    conv_dropout: float = 0.0
    classifier_overrides: Mapping[str, Any] = dataclasses.field(
        default_factory=dict)

    @property
    def model_name(self) -> str:
        # `name` is reserved by flax.linen for module scoping; the
        # reference's `model.name` checkpoint-naming contract maps to
        # `model_name` here
        kan_conv_suffix = (f"_{(self.kan_conv or 'KAN').upper()}"
                           if self.conv_type == "kanconv" else "_CONV")
        head = self.classifier_type
        if self.classifier_type in ("HiddenKAN", "VGGKAN", "KAN"):
            head += f"_{(self.kan_classifier or 'KAN').upper()}"
        return f"VGGKAN_{head}{kan_conv_suffix}_{self.arch}"

    def _conv_block(self, in_c: int, out_c: int, first: bool):
        if self.conv_type == "kanconv":
            kan_conv = self.kan_conv
            if kan_conv is None or kan_conv not in CONV_KAN_FACTORY:
                kan_conv = "KAN"
            fn = CONV_KAN_FACTORY[kan_conv]
            kwargs = _filtered(fn, {
                "spline_order": self.spline_order,
                "grid_size": self.grid_size,
                "base_activation": self.base_activation,
                "grid_range": self.grid_range,
                "l1_decay": self.l1_decay,
                "dropout": 0.0 if first else self.conv_dropout,
                "degree": self.degree,
                "affine": self.affine,
                "norm_layer": resolve_norm(self.kan_norm_layer),
                "padding": self.std_conv_padding,
                "groups": self.groups,
            })
            return fn(in_c, out_c, kernel_size=self.std_conv_kernel_size,
                      **kwargs)
        # standard conv path: Conv -> Norm(affine) -> ReLU
        # (kan_vgg.py:103-116)
        return StdConvBlock(
            in_planes=in_c, out_planes=out_c,
            kernel_size=self.std_conv_kernel_size,
            padding=self.std_conv_padding, base_activation="relu",
            norm_layer=resolve_norm(self.norm_layer),
            norm_kwargs={"affine": self.affine})

    @nn.compact
    def __call__(self, x, train: bool = True):
        assert x.shape[-1] == self.input_channels
        if self.arch not in cfgs:
            raise ValueError(f"Unknown arch: {self.arch}")
        in_c = self.input_channels
        first = True
        for v in cfgs[self.arch]:
            if v == "M":
                x = max_pool(x, 2, 2)
            else:
                out_c = int(v * self.width_scale)
                x = self._conv_block(in_c, out_c, first)(x, train=train)
                in_c = out_c
                first = False

        x = adaptive_avg_pool(x, self.expected_feature_shape)
        x = x.reshape(x.shape[0], -1)
        feat = in_c * prod(self.expected_feature_shape)

        classifier_factory, _ = make_classifier_factory(
            self.classifier_type, self.kan_classifier,
            spline_order=self.spline_order, grid_size=self.grid_size,
            grid_range=self.grid_range, l1_decay=self.l1_decay,
            degree=self.degree, **dict(self.classifier_overrides))

        p = self.dropout_linear
        if "classifier_dropout" in self.classifier_overrides and \
                self.classifier_overrides["classifier_dropout"] is not None:
            p = self.classifier_overrides["classifier_dropout"]

        ct = self.classifier_type
        if ct == "KAN":
            x = nn.Dropout(rate=p)(x, deterministic=not train)
            x = classifier_factory([feat, self.num_classes])(x, train=train)
        elif ct == "Linear":
            x = nn.Dropout(rate=p)(x, deterministic=not train)
            x = Linear(in_features=feat, out_features=self.num_classes)(x)
        elif ct == "HiddenKAN":
            x = classifier_factory([feat, 1024])(x, train=train)
            x = nn.Dropout(rate=p)(x, deterministic=not train)
            x = Linear(in_features=1024, out_features=self.num_classes)(x)
        elif ct == "VGGKAN":
            x = Linear(in_features=feat, out_features=1024)(x)
            x = nn.relu(x)
            x = nn.Dropout(rate=p)(x, deterministic=not train)
            x = Linear(in_features=1024, out_features=1024)(x)
            x = nn.relu(x)
            x = nn.Dropout(rate=p)(x, deterministic=not train)
            x = classifier_factory([1024, self.num_classes])(x, train=train)
        elif ct == "VGG":
            x = Linear(in_features=feat, out_features=1024)(x)
            x = nn.relu(x)
            x = nn.Dropout(rate=p)(x, deterministic=not train)
            x = Linear(in_features=1024, out_features=1024)(x)
            x = nn.relu(x)
            x = nn.Dropout(rate=p)(x, deterministic=not train)
            x = Linear(in_features=1024, out_features=self.num_classes)(x)
        # else: Identity head (kan_vgg.py:173-174)
        return x


def vggkan(input_channels: int, num_classes: int, **kwargs) -> VGGKAN:
    """Builder with the reference's flag vocabulary (kan_vgg.py:307-343).
    `classifier_*` overrides are captured into classifier_overrides."""
    overrides = {k: kwargs.pop(k) for k in list(kwargs)
                 if k.startswith("classifier_") and k != "classifier_type"}
    field_names = {f.name for f in dataclasses.fields(VGGKAN)}
    kwargs = {k: v for k, v in kwargs.items() if k in field_names}
    return VGGKAN(input_channels=input_channels, num_classes=num_classes,
                  classifier_overrides=overrides, **kwargs)
