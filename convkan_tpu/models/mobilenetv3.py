"""KAN-MobileNetV3 — parity with models/kan_mobilenetv3.py:70-534
(channel-last).

Large/small tables, per-block RE/HS activations, squeeze-excitation with
Hardsigmoid, BatchNorm eps=0.001 momentum=0.01, reduced_tail/dilated knobs.
The reference's KAN head calls the classifier factory positionally
(kan_mobilenetv3.py:362 — a crash as written); we build the intended
[feat, out] stack (SURVEY.md §7 reference-bugs policy).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, List, Mapping, Optional, Tuple

import flax.linen as nn
import jax

from ..ops.layers import Linear, SqueezeExcitation
from ..ops.pooling import adaptive_avg_pool
from ..ops.std_conv import StdConvBlock
from ..utils.norms import BatchNorm, resolve_norm
from .common import (make_conv_factory, make_mlp_classifier_factory,
                     resolve_classifier_overrides)
from .mobilenet import _make_divisible


@dataclasses.dataclass(frozen=True)
class IRConfig:
    input_channels: int
    kernel: int
    expanded_channels: int
    out_channels: int
    use_se: bool
    use_hs: bool
    stride: int
    dilation: int


def _adjust(c, wm):
    return _make_divisible(c * wm, 8)


def mobilenet_v3_conf(arch: str, width_mult: float = 1.0,
                      reduced_tail: bool = False, dilated: bool = False
                      ) -> Tuple[List[IRConfig], int]:
    """kan_mobilenetv3.py:412-464."""
    rd = 2 if reduced_tail else 1
    dil = 2 if dilated else 1
    tables = {
        "large": [
            [16, 3, 16, 16, False, "RE", 1, 1],
            [16, 3, 64, 24, False, "RE", 2, 1],
            [24, 3, 72, 24, False, "RE", 1, 1],
            [24, 5, 72, 40, True, "RE", 2, 1],
            [40, 5, 120, 40, True, "RE", 1, 1],
            [40, 5, 120, 40, True, "RE", 1, 1],
            [40, 3, 240, 80, False, "HS", 2, 1],
            [80, 3, 200, 80, False, "HS", 1, 1],
            [80, 3, 184, 80, False, "HS", 1, 1],
            [80, 3, 184, 80, False, "HS", 1, 1],
            [80, 3, 480, 112, True, "HS", 1, 1],
            [112, 3, 672, 112, True, "HS", 1, 1],
            [112, 5, 672, 160 // rd, True, "HS", 2, dil],
            [160 // rd, 5, 960 // rd, 160 // rd, True, "HS", 1, dil],
            [160 // rd, 5, 960 // rd, 160 // rd, True, "HS", 1, dil],
        ],
        "small": [
            [16, 3, 16, 16, True, "RE", 2, 1],
            [16, 3, 72, 24, False, "RE", 2, 1],
            [24, 3, 88, 24, False, "RE", 1, 1],
            [24, 5, 96, 40, True, "HS", 2, 1],
            [40, 5, 240, 40, True, "HS", 1, 1],
            [40, 5, 240, 40, True, "HS", 1, 1],
            [40, 5, 120, 48, True, "HS", 1, 1],
            [48, 5, 144, 48, True, "HS", 1, 1],
            [48, 5, 288, 96 // rd, True, "HS", 2, dil],
            [96 // rd, 5, 576 // rd, 96 // rd, True, "HS", 1, dil],
            [96 // rd, 5, 576 // rd, 96 // rd, True, "HS", 1, dil],
        ],
    }
    cfgs = [IRConfig(_adjust(ic, width_mult), k, _adjust(ec, width_mult),
                     _adjust(oc, width_mult), se, act == "HS", s, d * dil)
            for ic, k, ec, oc, se, act, s, d in tables[arch]]
    base = 960 if arch == "large" else 576
    last_channel = _make_divisible(base // rd * width_mult, 8)
    return cfgs, last_channel



class _MNV3Block(nn.Module):
    """One inverted-residual block, extracted for rematerialization
    (jax.checkpoint) — 224^2 training exceeds HBM without it."""

    mc: Mapping[str, Any]
    cnf: IRConfig

    @nn.compact
    def __call__(self, x, train: bool = True):
        mc = dict(self.mc)
        cnf = self.cnf
        act = "hardswish" if cnf.use_hs else "relu"

        def conv_block(in_c, out_c, k, stride, groups, dilation=1,
                       std_activation="__block__"):
            if mc["conv_type"] == "kanconv":
                # the reference builds ONE kanconv factory partial with the
                # model-level activation (kan_mobilenetv3.py:253-271); the
                # per-block RE/HS activation_layer kwarg is signature-
                # filtered away for KAN wrappers and only reaches the std
                # depthwise ConvNormActivation layers
                f = make_conv_factory(
                    mc["conv_type"], mc["kan_conv"],
                    spline_order=mc["spline_order"], grid_size=mc["grid_size"],
                    base_activation=mc["model_act"], grid_range=mc["grid_range"],
                    dropout=mc["conv_dropout"], l1_decay=mc["l1_decay"],
                    degree=mc["degree"], norm_layer=mc["norm_layer"],
                    # the reference's kan_norm_layer is DEAD in MNv3: every
                    # conv_layer_factory call overrides norm_layer with
                    # effective_norm_layer (kan_mobilenetv3.py:116,137,155,
                    # 302,320), so KAN layers get the model norm_layer with
                    # its eps/momentum partial, never kan_norm_layer
                    kan_norm_layer=mc["norm_layer"], affine=mc["affine"],
                    std_norm_kwargs=mc["norm_extra"],
                    **mc["norm_extra"])
                return f(in_c, out_c, kernel_size=k, stride=stride,
                         groups=groups, dilation=dilation)
            return StdConvBlock(
                in_planes=in_c, out_planes=out_c, kernel_size=k,
                stride=stride, padding=dilation * (k - 1) // 2, groups=groups,
                dilation=dilation,
                base_activation=(act if std_activation == "__block__"
                                 else std_activation),
                norm_layer=resolve_norm(mc["norm_layer"]),
                norm_kwargs=dict(mc["norm_kwargs"]))

        def std_dw(c, k, stride, dilation):
            return StdConvBlock(
                in_planes=c, out_planes=c, kernel_size=k, stride=stride,
                padding=dilation * (k - 1) // 2, groups=c, dilation=dilation,
                base_activation=act, norm_layer=resolve_norm(mc["norm_layer"]),
                norm_kwargs=dict(mc["norm_kwargs"]))

        use_res = cnf.stride == 1 and cnf.input_channels == cnf.out_channels
        y = x
        if cnf.expanded_channels != cnf.input_channels:
            y = conv_block(cnf.input_channels, cnf.expanded_channels, 1, 1, 1)(
                y, train=train)
        stride = 1 if cnf.dilation > 1 else cnf.stride
        ec = cnf.expanded_channels
        if mc["replace_depthwise"] and mc["conv_type"] == "kanconv":
            y = conv_block(ec, ec, cnf.kernel, stride, ec, cnf.dilation)(
                y, train=train)
        else:
            y = std_dw(ec, cnf.kernel, stride, cnf.dilation)(y, train=train)
        if cnf.use_se:
            squeeze = _make_divisible(ec // 4, 8)
            y = SqueezeExcitation(
                input_channels=ec, squeeze_channels=squeeze,
                activation=jax.nn.relu,
                scale_activation=jax.nn.hard_sigmoid)(y)
        # projection is LINEAR on the std path (activation_layer=None,
        # kan_mobilenetv3.py:177); the kanconv branch keeps the family's
        # structure (the reference filters the kwarg away there)
        y = conv_block(ec, cnf.out_channels, 1, 1, 1,
                       std_activation=None)(y, train=train)
        return x + y if use_res else y


class MobileNetV3KAN(nn.Module):
    arch: str
    num_classes: int = 1000
    dropout: float = 0.2
    input_channels: int = 3
    reduced_tail: bool = False
    dilated: bool = False
    width_mult: float = 1.0
    conv_type: str = "kanconv"
    kan_conv: Optional[str] = "KAN"
    kan_classifier: Optional[str] = "KAN"
    classifier_type: str = "Linear"
    groups: int = 1
    spline_order: int = 3
    grid_size: int = 5
    base_activation: Any = None
    grid_range: Tuple[float, float] = (-1, 1)
    l1_decay: float = 0.0
    degree: int = 3
    affine: bool = True
    norm_layer: Any = BatchNorm
    # accepted for ctor-signature parity but DEAD, exactly like the
    # reference: every factory call there overrides norm_layer with
    # effective_norm_layer (kan_mobilenetv3.py:116,137,155,302,320)
    kan_norm_layer: Any = BatchNorm
    replace_depthwise: bool = False
    conv_dropout: float = 0.0
    # rematerialize blocks under autodiff.  Off by default: measured on
    # v5e, KAN-MNv3-small @224^2 fits HBM without remat through batch 256
    # (5.25k img/s there vs 4.83k with remat — recompute costs ~8%);
    # enable only for batch/resolution products that overflow HBM.
    remat: bool = False
    # selective-remat policy under remat=True (ops/remat_policy.py) —
    # lets batches past the b256 no-remat HBM edge trade only the wide
    # KAN basis tensors for recompute ('except_basis')
    remat_policy: Any = None
    classifier_overrides: Mapping[str, Any] = dataclasses.field(
        default_factory=dict)

    @property
    def model_name(self) -> str:
        head = (f"_{(self.kan_classifier or 'KAN').upper()}"
                if self.classifier_type == "KAN" else f"_{self.classifier_type}")
        convs = (f"_{(self.kan_conv or 'KAN').upper()}"
                 if self.conv_type == "kanconv" else "_CONV")
        rdw = ("_RDW" if self.replace_depthwise and self.conv_type == "kanconv"
               else "")
        return (f"MobileNetV3KAN{head}{convs}{rdw}_{self.arch.upper()}"
                f"_w{self.width_mult}")

    @nn.compact
    def __call__(self, x, train: bool = True):
        cfgs, last_channel = mobilenet_v3_conf(
            self.arch, self.width_mult, self.reduced_tail, self.dilated)

        act_name = self.base_activation or "hardswish"
        # BN eps/momentum per reference (kan_mobilenetv3.py:246)
        norm_kwargs = {"affine": self.affine}
        if self.norm_layer is BatchNorm or self.norm_layer == "BatchNorm2d":
            norm_kwargs.update(eps=0.001, momentum=0.01)

        def conv_factory(act):
            extra = ({"eps": 0.001, "momentum": 0.01}
                     if "eps" in norm_kwargs else {})
            return make_conv_factory(
                self.conv_type, self.kan_conv, spline_order=self.spline_order,
                grid_size=self.grid_size, base_activation=act,
                grid_range=self.grid_range, dropout=self.conv_dropout,
                l1_decay=self.l1_decay, degree=self.degree,
                norm_layer=self.norm_layer,
                # kan_norm_layer is dead in the reference (see _InvResBlock)
                kan_norm_layer=self.norm_layer, affine=self.affine,
                std_norm_kwargs=extra, **extra)

        def std_block(in_c, out_c, k, stride, groups, dilation, act):
            return StdConvBlock(
                in_planes=in_c, out_planes=out_c, kernel_size=k,
                stride=stride, padding=dilation * (k - 1) // 2, groups=groups,
                dilation=dilation, base_activation=act,
                norm_layer=resolve_norm(self.norm_layer),
                norm_kwargs=dict(norm_kwargs))

        def block(in_c, out_c, k, stride, groups, act, dilation=1):
            if self.conv_type == "kanconv":
                return conv_factory(act)(in_c, out_c, kernel_size=k,
                                         stride=stride, groups=groups,
                                         dilation=dilation)
            return std_block(in_c, out_c, k, stride, groups, dilation, act)

        first_c = cfgs[0].input_channels
        x = block(self.input_channels, first_c, 3, 2, 1, act_name)(
            x, train=train)

        mc = dict(
            conv_type=self.conv_type, kan_conv=self.kan_conv,
            model_act=act_name,
            spline_order=self.spline_order, grid_size=self.grid_size,
            grid_range=self.grid_range, conv_dropout=self.conv_dropout,
            l1_decay=self.l1_decay, degree=self.degree,
            norm_layer=self.norm_layer,
            affine=self.affine, replace_depthwise=self.replace_depthwise,
            norm_kwargs=dict(norm_kwargs),
            norm_extra=({"eps": 0.001, "momentum": 0.01}
                        if "eps" in norm_kwargs else {}))
        from ..ops.remat_policy import resolve_remat_policy

        BlockCls = (nn.remat(_MNV3Block, static_argnums=(2,),
                             policy=resolve_remat_policy(self.remat_policy))
                    if self.remat else _MNV3Block)
        for cnf in cfgs:
            x = BlockCls(mc=mc, cnf=cnf)(x, train)

        last_in = cfgs[-1].out_channels
        last_out = cfgs[-1].expanded_channels
        x = block(last_in, last_out, 1, 1, 1, act_name)(x, train=train)

        x = adaptive_avg_pool(x, (1, 1)).reshape(x.shape[0], -1)

        ov = resolve_classifier_overrides(
            self.classifier_overrides, dropout=self.dropout,
            spline_order=self.spline_order, grid_size=self.grid_size,
            base_activation="hardswish", grid_range=self.grid_range,
            l1_decay=self.l1_decay, degree=self.degree)

        if self.classifier_type == "KAN":
            head = make_mlp_classifier_factory(
                self.kan_classifier, dropout=ov["dropout"],
                spline_order=ov["spline_order"], grid_size=ov["grid_size"],
                base_activation=ov["base_activation"],
                grid_range=ov["grid_range"], l1_decay=ov["l1_decay"],
                degree=ov["degree"], first_dropout=False)
            x = head([last_out, last_channel])(x, train=train)
            x = nn.Dropout(rate=self.dropout)(x, deterministic=not train)
            x = head([last_channel, self.num_classes])(x, train=train)
        elif self.classifier_type == "Linear":
            x = Linear(in_features=last_out, out_features=last_channel)(x)
            x = jax.nn.hard_swish(x)
            x = nn.Dropout(rate=self.dropout)(x, deterministic=not train)
            x = Linear(in_features=last_channel,
                       out_features=self.num_classes)(x)
        return x


def mobilenet_v3_kan(arch: str, num_classes: int = 1000, **kwargs
                     ) -> MobileNetV3KAN:
    overrides = {k: kwargs.pop(k) for k in list(kwargs)
                 if k.startswith("classifier_") and k != "classifier_type"}
    field_names = {f.name for f in dataclasses.fields(MobileNetV3KAN)}
    kwargs = {k: v for k, v in kwargs.items() if k in field_names}
    return MobileNetV3KAN(arch=arch, num_classes=num_classes,
                          classifier_overrides=overrides, **kwargs)
