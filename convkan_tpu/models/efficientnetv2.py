"""KAN-EfficientNetV2 — parity with models/kan_efficientnetv2.py:103-752
(channel-last).  Fused-MBConv + MBConv stages, per-block stochastic depth
scaled by block id, SE, s/m/l + tiny/kan_tiny configs, Linear/KAN/HiddenKAN
heads.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, List, Mapping, Optional, Tuple

import flax.linen as nn
import jax

from ..ops.layers import DropPath, Linear, SqueezeExcitation
from ..ops.pooling import adaptive_avg_pool
from ..ops.std_conv import StdConvBlock
from ..utils.norms import BatchNorm, InstanceNorm, resolve_norm
from .common import (make_conv_factory, make_mlp_classifier_factory,
                     resolve_classifier_overrides)
from .mobilenet import _make_divisible


@dataclasses.dataclass(frozen=True)
class MBConfig:
    block_type: str       # 'fused' | 'mbconv'
    expand_ratio: float
    kernel: int
    stride: int
    input_channels: int
    out_channels: int
    num_layers: int
    se_ratio: Optional[float] = None


def _cfg(block_type, t, k, s, ci, co, n, wm, dm, se=None) -> MBConfig:
    return MBConfig(block_type, t, k, s,
                    _make_divisible(ci * wm, 8), _make_divisible(co * wm, 8),
                    int(math.ceil(n * dm)), se)


def efficientnetv2_conf(arch: str, width_mult=1.0, depth_mult=1.0
                        ) -> List[MBConfig]:
    """kan_efficientnetv2.py:508-544."""
    w, d = width_mult, depth_mult
    tables = {
        "s": [("fused", 1, 3, 1, 24, 24, 2, None),
              ("fused", 4, 3, 2, 24, 48, 4, None),
              ("fused", 4, 3, 2, 48, 64, 4, None),
              ("mbconv", 4, 3, 2, 64, 128, 6, 0.25),
              ("mbconv", 6, 3, 1, 128, 160, 9, 0.25),
              ("mbconv", 6, 3, 2, 160, 256, 15, 0.25)],
        "m": [("fused", 1, 3, 1, 24, 24, 3, None),
              ("fused", 4, 3, 2, 24, 48, 5, None),
              ("fused", 4, 3, 2, 48, 80, 5, None),
              ("mbconv", 4, 3, 2, 80, 160, 7, 0.25),
              ("mbconv", 6, 3, 1, 160, 176, 14, 0.25),
              ("mbconv", 6, 3, 2, 176, 304, 18, 0.25),
              ("mbconv", 6, 3, 1, 304, 512, 5, 0.25)],
        "l": [("fused", 1, 3, 1, 32, 32, 4, None),
              ("fused", 4, 3, 2, 32, 64, 7, None),
              ("fused", 4, 3, 2, 64, 96, 7, None),
              ("mbconv", 4, 3, 2, 96, 192, 10, 0.25),
              ("mbconv", 6, 3, 1, 192, 224, 19, 0.25),
              ("mbconv", 6, 3, 2, 224, 384, 25, 0.25),
              ("mbconv", 6, 3, 1, 384, 640, 7, 0.25)],
        # :635-661
        "tiny": [("fused", 1, 3, 1, 16, 16, 1, None),
                 ("fused", 4, 3, 2, 16, 24, 2, None),
                 ("fused", 4, 3, 2, 24, 40, 2, None),
                 ("mbconv", 4, 3, 2, 40, 80, 2, 0.25),
                 ("mbconv", 6, 3, 1, 80, 112, 2, 0.25)],
        "kan_tiny": [("fused", 1, 3, 1, 16, 16, 1, None),
                     ("fused", 4, 3, 2, 16, 24, 1, None),
                     ("fused", 4, 3, 2, 24, 40, 1, None),
                     ("mbconv", 4, 3, 2, 40, 80, 1, 0.25),
                     ("mbconv", 6, 3, 1, 80, 112, 1, 0.25)],
    }
    return [_cfg(bt, t, k, s, ci, co, n, w, d, se)
            for bt, t, k, s, ci, co, n, se in tables[arch]]



class _EffBlock(nn.Module):
    """One Fused-MBConv / MBConv block, extracted as a module so the whole
    block can be rematerialized (jax.checkpoint) — at 224^2 the autodiff
    temporaries of the basis-expanded convs exceed HBM without remat."""

    mc: Mapping[str, Any]
    cfg: MBConfig
    ci: int
    stride: int
    sd: float

    @nn.compact
    def __call__(self, x, train: bool = True):
        mc = dict(self.mc)
        cfg = self.cfg
        act = mc["base_activation"] or "silu"
        # the reference passes norm_layer=<model norm> at EVERY factory
        # call site (kan_efficientnetv2.py:159,223,261,374,427), which
        # overrides the partial's kan_norm_layer — that ctor default is
        # dead there, so kanconvs really use the model norm (BatchNorm)
        conv = make_conv_factory(
            mc["conv_type"], mc["kan_conv"], spline_order=mc["spline_order"],
            grid_size=mc["grid_size"], base_activation=act,
            grid_range=mc["grid_range"], dropout=mc["conv_dropout"],
            l1_decay=mc["l1_decay"], degree=mc["degree"],
            norm_layer=mc["norm_layer"], kan_norm_layer=mc["norm_layer"],
            affine=mc["affine"], std_activation=act)
        # project convs get base_activation=None in the reference
        # (kan_efficientnetv2.py:170,262) -> the KAN layer's base path is
        # Identity there.  std path quirk: the reference's std wrapper
        # ignores its base_activation param and closes over the MODEL
        # activation (kan_efficientnetv2.py:363), so std projections stay
        # activated — std_activation=act replicates that.
        conv_na = make_conv_factory(
            mc["conv_type"], mc["kan_conv"], spline_order=mc["spline_order"],
            grid_size=mc["grid_size"], base_activation=None,
            grid_range=mc["grid_range"], dropout=mc["conv_dropout"],
            l1_decay=mc["l1_decay"], degree=mc["degree"],
            norm_layer=mc["norm_layer"], kan_norm_layer=mc["norm_layer"],
            affine=mc["affine"], std_activation=act)

        def std_dw(c, k, stride):
            return StdConvBlock(
                in_planes=c, out_planes=c, kernel_size=k, stride=stride,
                padding=(k - 1) // 2, groups=c, base_activation=act,
                norm_layer=resolve_norm(mc["norm_layer"]),
                norm_kwargs={"affine": mc["affine"]})

        ci, stride = self.ci, self.stride
        expanded = _make_divisible(ci * cfg.expand_ratio, 8)
        use_res = stride == 1 and ci == cfg.out_channels
        y = x
        if cfg.block_type == "fused":
            # kan_efficientnetv2.py:133-195
            if expanded != ci:
                y = conv(ci, expanded, kernel_size=cfg.kernel,
                         stride=stride)(y, train=train)
                y = conv_na(expanded, cfg.out_channels, kernel_size=1,
                            stride=1)(y, train=train)
            else:
                y = conv(ci, cfg.out_channels, kernel_size=cfg.kernel,
                         stride=stride)(y, train=train)
        else:
            # kan_efficientnetv2.py:197-274
            if expanded != ci:
                y = conv(ci, expanded, kernel_size=1)(y, train=train)
            if mc["replace_depthwise"] and mc["conv_type"] == "kanconv":
                y = conv(expanded, expanded, kernel_size=cfg.kernel,
                         stride=stride, groups=expanded)(y, train=train)
            else:
                y = std_dw(expanded, cfg.kernel, stride)(y, train=train)
            if cfg.se_ratio is not None and cfg.se_ratio > 0:
                squeeze = max(1, int(ci * cfg.se_ratio))
                y = SqueezeExcitation(
                    input_channels=expanded, squeeze_channels=squeeze,
                    activation=jax.nn.silu)(y)
            y = conv_na(expanded, cfg.out_channels, kernel_size=1)(
                y, train=train)
        if use_res:
            y = DropPath(drop_prob=self.sd)(y, train=train)
            y = x + y
        return y


class EfficientNetV2KAN(nn.Module):
    """Shared EfficientNet engine (also powers V1 via all-mbconv settings)."""

    inverted_residual_setting: Tuple[MBConfig, ...]
    dropout: float
    stochastic_depth_prob: float = 0.2
    num_classes: int = 1000
    in_channels: int = 3
    last_channel: Optional[int] = None
    stem_stride: int = 2
    conv_type: str = "kanconv"
    conv_dropout: float = 0.0
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
    width_scale: float = 1.0
    affine: bool = False
    norm_layer: Any = BatchNorm
    kan_norm_layer: Any = InstanceNorm
    replace_depthwise: bool = False
    head_hidden_dim: int = 1024
    name_prefix: str = "EfficientNetV2"
    arch_tag: str = "s"
    # rematerialize each block under autodiff (jax.checkpoint): trades
    # recompute for HBM.  Needed for the full-size archs (s/m/l) at 224^2
    # on a single v5e; the tiny/kan_tiny archs fit without it and run
    # ~18% faster (measured 31.9 vs 37.7 ms/step, batch 16 224^2) — pass
    # remat=False there if memory allows.
    remat: bool = True
    # selective-remat policy under remat=True (ops/remat_policy.py):
    # None='full' (save nothing), 'except_basis' (recompute only the wide
    # KAN basis tensors), 'dots', 'offload_basis' — VERDICT r4 #4 A/B
    remat_policy: Any = None
    classifier_overrides: Mapping[str, Any] = dataclasses.field(
        default_factory=dict)

    @property
    def model_name(self) -> str:
        convs = (f"_{(self.kan_conv or 'KAN').upper()}"
                 if self.conv_type == "kanconv" else "_CONV")
        head = ""
        if self.classifier_type in ("KAN", "HiddenKAN"):
            head = f"_{(self.kan_classifier or 'KAN').upper()}"
        return (f"{self.name_prefix}{self.arch_tag.upper()}-KAN_"
                f"{self.classifier_type}{head}{convs}")

    @nn.compact
    def __call__(self, x, train: bool = True):
        act = self.base_activation or "silu"
        # see _EffBlock: the reference's kan_norm_layer ctor default is
        # dead (every call site overrides norm_layer) — stem/head kanconvs
        # use the model norm too
        conv = make_conv_factory(
            self.conv_type, self.kan_conv, spline_order=self.spline_order,
            grid_size=self.grid_size, base_activation=act,
            grid_range=self.grid_range, dropout=self.conv_dropout,
            l1_decay=self.l1_decay, degree=self.degree,
            norm_layer=self.norm_layer, kan_norm_layer=self.norm_layer,
            affine=self.affine, std_activation=act)

        def std_dw(c, k, stride):
            return StdConvBlock(
                in_planes=c, out_planes=c, kernel_size=k, stride=stride,
                padding=(k - 1) // 2, groups=c, base_activation=act,
                norm_layer=resolve_norm(self.norm_layer),
                norm_kwargs={"affine": self.affine})

        settings = list(self.inverted_residual_setting)
        x = conv(self.in_channels, settings[0].input_channels, kernel_size=3,
                 stride=self.stem_stride)(x, train=train)

        mc = dict(
            conv_type=self.conv_type, kan_conv=self.kan_conv,
            spline_order=self.spline_order, grid_size=self.grid_size,
            base_activation=self.base_activation, grid_range=self.grid_range,
            conv_dropout=self.conv_dropout, l1_decay=self.l1_decay,
            degree=self.degree, norm_layer=self.norm_layer,
            kan_norm_layer=self.kan_norm_layer, affine=self.affine,
            replace_depthwise=self.replace_depthwise)
        from ..ops.remat_policy import resolve_remat_policy

        BlockCls = (nn.remat(_EffBlock, static_argnums=(2,),
                             policy=resolve_remat_policy(self.remat_policy))
                    if self.remat else _EffBlock)

        total_blocks = sum(c.num_layers for c in settings)
        block_id = 0
        for cfg in settings:
            for j in range(cfg.num_layers):
                sd = self.stochastic_depth_prob * block_id / total_blocks
                ci = cfg.input_channels if j == 0 else cfg.out_channels
                stride = cfg.stride if j == 0 else 1
                x = BlockCls(mc=mc, cfg=cfg, ci=ci, stride=stride, sd=sd)(
                    x, train)
                block_id += 1

        last_in = settings[-1].out_channels
        last_out = (self.last_channel if self.last_channel is not None
                    else _make_divisible(1280 * self.width_scale, 8))
        x = conv(last_in, last_out, kernel_size=1)(x, train=train)

        x = adaptive_avg_pool(x, (1, 1)).reshape(x.shape[0], -1)

        ov = resolve_classifier_overrides(
            self.classifier_overrides, dropout=self.dropout,
            spline_order=self.spline_order, grid_size=self.grid_size,
            base_activation="silu", grid_range=self.grid_range,
            l1_decay=self.l1_decay, degree=self.degree)
        if ov["dropout"] and ov["dropout"] > 0:
            x = nn.Dropout(rate=ov["dropout"])(x, deterministic=not train)

        if self.classifier_type in ("KAN", "HiddenKAN"):
            head = make_mlp_classifier_factory(
                self.kan_classifier, dropout=0.0,
                spline_order=ov["spline_order"], grid_size=ov["grid_size"],
                base_activation=ov["base_activation"],
                grid_range=ov["grid_range"], l1_decay=ov["l1_decay"],
                degree=ov["degree"], first_dropout=False)
            if self.classifier_type == "KAN":
                x = head([last_out, self.num_classes])(x, train=train)
            else:
                x = head([last_out, self.head_hidden_dim])(x, train=train)
                x = Linear(in_features=self.head_hidden_dim,
                           out_features=self.num_classes)(x)
        elif self.classifier_type == "Linear":
            x = Linear(in_features=last_out, out_features=self.num_classes)(x)
        # else Identity
        return x


def _pop_overrides(kwargs):
    return {k: kwargs.pop(k) for k in list(kwargs)
            if k.startswith("classifier_") and k != "classifier_type"}


def _build(settings, arch_tag, name_prefix, num_classes, last_channel,
           stem_stride, dropout, stochastic_depth_prob, kwargs):
    overrides = _pop_overrides(kwargs)
    field_names = {f.name for f in dataclasses.fields(EfficientNetV2KAN)}
    kwargs = {k: v for k, v in kwargs.items()
              if k in field_names and v is not None}
    for k in ("arch", "inverted_residual_setting", "dropout",
              "stochastic_depth_prob", "num_classes", "last_channel",
              "stem_stride", "arch_tag", "name_prefix",
              "classifier_overrides"):
        kwargs.pop(k, None)
    return EfficientNetV2KAN(
        inverted_residual_setting=tuple(settings), dropout=dropout,
        stochastic_depth_prob=stochastic_depth_prob, num_classes=num_classes,
        last_channel=last_channel, stem_stride=stem_stride,
        arch_tag=arch_tag, name_prefix=name_prefix,
        classifier_overrides=overrides, **kwargs)


def efficientnetv2_kan(arch: str = "s", num_classes: int = 1000,
                       dropout: float = 0.2,
                       stochastic_depth_prob: float = 0.2, **kwargs
                       ) -> EfficientNetV2KAN:
    """kan_efficientnetv2.py:547-634."""
    settings = efficientnetv2_conf(arch)
    return _build(settings, arch, "EfficientNetV2", num_classes, 1280, 2,
                  dropout, stochastic_depth_prob, kwargs)


def efficientnetv2_kan_small(arch: str = "kan_tiny", num_classes: int = 10,
                             width_mult: float = 1.0, depth_mult: float = 1.0,
                             dropout: float = 0.1,
                             stochastic_depth_prob: float = 0.1, **kwargs
                             ) -> EfficientNetV2KAN:
    """kan_efficientnetv2.py:663-752."""
    settings = efficientnetv2_conf(arch, width_mult, depth_mult)
    last_channel = _make_divisible(256 * width_mult, 8)
    stem_stride = 1 if arch == "kan_tiny" else 2
    return _build(settings, arch, "EfficientNetV2Small-", num_classes,
                  last_channel, stem_stride, dropout, stochastic_depth_prob,
                  kwargs)
