"""Shared builder plumbing for the model zoo: signature-filtered conv
factories and classifier factories — the reference repeats this block in
every model file (e.g. kan_alexnet.py:49-69, kan_vgg.py:73-101)."""

from __future__ import annotations

from functools import partial
from inspect import signature
from typing import Any, Callable, Mapping, Optional

from ..factory.conv_factory import CONV_KAN_FACTORY
from ..factory.mlp_factory import MLP_KAN_FACTORY
from ..ops.std_conv import StdConvBlock
from ..utils.norms import resolve_norm


def make_conv_factory(conv_type: str, kan_conv: Optional[str], *,
                      spline_order=3, grid_size=5, base_activation="silu",
                      grid_range=(-1, 1), dropout=0.0, l1_decay=0.0,
                      degree=3, norm_layer=None, kan_norm_layer=None,
                      affine=False, std_activation="relu",
                      std_norm_kwargs=None, std_bias_when_not_affine=False,
                      **extra) -> Callable:
    """Returns fn(in_planes, out_planes, kernel_size=..., stride=...,
    padding=..., groups=...) building either a KAN conv (factory-dispatched)
    or a standard Conv->Norm->Act block.

    `std_activation` is the conv_type='conv' path's activation — each
    reference model hardcodes its own (ReLU6 for MNv2, the model act for
    EffV2 incl. projections, RE/HS for MNv3, ReLU for VGG/AlexNet), so
    models pass it explicitly.  The per-call `activation=` kwarg overrides
    it (MNv2's linear projection); on the kanconv path that kwarg is
    ignored, exactly like the reference's signature filtering drops
    activation_layer for KAN factories.

    `std_norm_kwargs` are norm ctor kwargs that reach STANDARD conv
    blocks built by this factory (both conv_type='conv' and the
    kanconv-path 'conv' key) — the analogue of the reference baking
    eps/momentum into the norm_layer partial it hands every call
    (kan_mobilenetv3.py:246,307).  `affine` deliberately does NOT ride
    this channel on the kanconv-path 'conv' key: the reference's `conv()`
    builds its norm bare, so affine is dropped there (while KAN factories
    honor it via **norm_kwargs).

    `std_bias_when_not_affine` replicates MobileNetV2's ConvNormActivation
    quirk `bias = norm_layer is None or not affine`
    (kan_mobilenetv2.py:47,294) on the conv_type='conv' path."""
    if conv_type == "kanconv":
        key = kan_conv if kan_conv in CONV_KAN_FACTORY else "KAN"
        fn = CONV_KAN_FACTORY[key]
        args = {
            "spline_order": spline_order,
            "grid_size": grid_size,
            "base_activation": base_activation,
            "grid_range": grid_range,
            "dropout": dropout,
            "l1_decay": l1_decay,
            "norm_layer": resolve_norm(kan_norm_layer or norm_layer),
            "affine": affine,
            "degree": degree,
        }
        args.update(extra)
        if key == "conv" and std_norm_kwargs:
            # the std 'conv' factory drops **kwargs like the reference's;
            # eps/momentum-style norm kwargs arrive via its explicit
            # norm_kwargs channel instead (see its docstring)
            args["norm_kwargs"] = dict(std_norm_kwargs)
        valid = signature(fn).parameters
        has_kwargs = any(p.kind == p.VAR_KEYWORD for p in valid.values())
        # unknown keys flow into the factory's **norm_kwargs (the
        # reference's inspect.signature filtering pattern lets e.g.
        # affine/eps/momentum reach the norm layer)
        filtered = {k: v for k, v in args.items() if k in valid or has_kwargs}
        part = partial(fn, **filtered)

        def kan_builder(in_planes, out_planes, activation="__ignored__",
                        **kw):
            # per-call std activation overrides don't apply to KAN layers
            # (the reference signature-filters activation_layer away for
            # CONV_KAN_FACTORY wrappers, e.g. kan_mobilenetv2.py:286)
            return part(in_planes, out_planes, **kw)

        return kan_builder

    def std_conv(in_planes, out_planes, kernel_size, stride=1, padding=None,
                 groups=1, dilation=1, activation="__factory__"):
        from ..ops.conv import same_padding

        # padding=None means auto-'same', exactly like the reference's
        # std wrapper (_calculate_same_padding, kan_mobilenet.py:219-224)
        resolved = resolve_norm(norm_layer)
        return StdConvBlock(
            in_planes=in_planes, out_planes=out_planes,
            kernel_size=kernel_size, stride=stride,
            padding=(padding if padding is not None
                     else same_padding(kernel_size, dilation)),
            dilation=dilation, groups=groups,
            base_activation=(std_activation if activation == "__factory__"
                             else activation),
            norm_layer=resolved,
            norm_kwargs={"affine": affine, **(std_norm_kwargs or {})},
            use_bias=((resolved is None or not affine)
                      if std_bias_when_not_affine else None))

    return std_conv


def make_mlp_classifier_factory(kan_classifier: Optional[str], *,
                                dropout=0.0, spline_order=3, grid_size=5,
                                base_activation=None, grid_range=(-1, 1),
                                l1_decay=0.0, degree=3, first_dropout=False,
                                **extra) -> Callable:
    """MLP_KAN_FACTORY partial with signature-filtered kwargs
    (kan_alexnet.py:151-167 pattern)."""
    key = kan_classifier if kan_classifier in MLP_KAN_FACTORY else "KAN"
    fn = MLP_KAN_FACTORY[key]
    args = {
        "dropout": dropout,
        "spline_order": spline_order,
        "grid_size": grid_size,
        "base_activation": base_activation,
        "grid_range": grid_range,
        "l1_decay": l1_decay,
        "degree": degree,
        "first_dropout": first_dropout,
    }
    args.update(extra)
    args = {k: v for k, v in args.items() if v is not None}
    return partial(fn, **args)


def resolve_classifier_overrides(prefix_args: Mapping[str, Any], **defaults):
    """classifier_* override semantics: each classifier_X falls back to X
    (kan_alexnet.py:143-149)."""
    out = {}
    for k, default in defaults.items():
        v = prefix_args.get(f"classifier_{k}")
        out[k] = v if v is not None else default
    return out
