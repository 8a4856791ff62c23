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

        return self._apply_head(x, in_c, train)

    def _apply_head(self, x, in_c: int, train: bool):
        """Adaptive pool + flatten + the classifier menu — shared by the
        sequential forward and the pipelined last stage."""
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


def _vgg_builder(cls, input_channels: int, num_classes: int, **kwargs):
    overrides = {k: kwargs.pop(k) for k in list(kwargs)
                 if k.startswith("classifier_") and k != "classifier_type"}
    field_names = {f.name for f in dataclasses.fields(cls)}
    kwargs = {k: v for k, v in kwargs.items() if k in field_names}
    return cls(input_channels=input_channels, num_classes=num_classes,
               classifier_overrides=overrides, **kwargs)


def vggkan(input_channels: int, num_classes: int, **kwargs) -> VGGKAN:
    """Builder with the reference's flag vocabulary (kan_vgg.py:307-343).
    `classifier_*` overrides are captured into classifier_overrides."""
    return _vgg_builder(VGGKAN, input_channels, num_classes, **kwargs)


def pipelined_vggkan(input_channels: int, num_classes: int, **kwargs):
    """vggkan with GPipe stage partitioning — same flag vocabulary plus
    mesh / pipe_axis / n_stages / n_microbatches (see PipelinedVGGKAN,
    defined below)."""
    return _vgg_builder(PipelinedVGGKAN, input_channels, num_classes,
                        **kwargs)


class _VGGStage(VGGKAN):
    """One contiguous segment of a VGGKAN: `items` is a tuple of 'M'
    (maxpool) or (in_c, out_c, first) conv entries; the last stage also
    applies the classifier head.  Used by PipelinedVGGKAN — each stage is
    a standalone module so its parameters form one pytree per pipe rank."""

    items: Tuple = ()
    with_head: bool = False

    @nn.compact
    def __call__(self, x, train: bool = True):
        for it in self.items:
            if it == "M":
                x = max_pool(x, 2, 2)
            else:
                ic, out_c, first = it
                x = self._conv_block(ic, out_c, first)(x, train=train)
        if self.with_head:
            # channel width from the live tensor, not self.input_channels:
            # a conv-free (pool-only) head segment would otherwise build
            # the classifier at the whole-model input width (ADVICE r4 #1)
            return self._apply_head(x, x.shape[-1], train)
        return x


class PipelinedVGGKAN(VGGKAN):
    """VGGKAN with its conv trunk stage-partitioned for GPipe pipeline
    parallelism over a 'pipe' mesh axis (VERDICT r3 #5: heterogeneous-
    stage pipelining for the CNN zoo).

    The cfg items are split into `pipe` contiguous segments balanced by
    conv FLOPs (H*W*in_c*out_c at each layer's resolution); the
    classifier rides in the last stage.  Activations cross stage
    boundaries flattened and zero-padded to the largest boundary
    (parallel.pipeline.gpipe_hetero_apply); each device selects its
    segment with lax.switch on its pipe rank; per-stage params replicate
    (VGG16_small's params are small next to its activations — the
    pipeline's win is activation locality, not param sharding).

    With mesh=None (or a 1-wide pipe) the stages run sequentially —
    numerically identical, which the tests assert.  Stateless norms only
    (InstanceNorm — the VGG default); BatchNorm's mutable running stats
    do not flow through shard_map stages."""

    mesh: Any = None
    pipe_axis: str = "pipe"
    # stage count; 0 -> the mesh's pipe size (or 1 with no mesh).  Set it
    # explicitly when a checkpoint must restore across mesh configs — the
    # param tree structure (stage_0..stage_{S-1}) follows this number.
    n_stages: int = 0
    n_microbatches: int = 0  # 0 -> the mesh's pipe size

    @property
    def model_name(self) -> str:
        return "Pipelined" + super().model_name

    def _plan(self, H, W, S):
        """Contiguous FLOP-balanced partition of the cfg items.  Returns
        (segments: list of item-tuples, in_shapes: per-stage input
        (H, W, C))."""
        items, costs, shapes = [], [], []
        in_c, first, h, w = self.input_channels, True, H, W
        for v in cfgs[self.arch]:
            shapes.append((h, w, in_c))
            if v == "M":
                items.append("M")
                costs.append(h * w * in_c)  # pool cost ~ traffic
                h, w = h // 2, w // 2
            else:
                out_c = int(v * self.width_scale)
                items.append((in_c, out_c, first))
                costs.append(h * w * in_c * out_c)
                in_c, first = out_c, False
        assert S <= len(items), f"{S} stages > {len(items)} layers"
        total = sum(costs)
        segments, in_shapes, start, acc = [], [], 0, 0
        for i, c in enumerate(costs):
            acc += c
            rem_items = len(items) - (i + 1)
            rem_segs = S - len(segments) - 1
            if len(segments) < S - 1 and (
                    acc >= total * (len(segments) + 1) / S
                    or rem_items == rem_segs):
                segments.append(tuple(items[start:i + 1]))
                in_shapes.append(shapes[start])
                start = i + 1
        segments.append(tuple(items[start:]))
        in_shapes.append(shapes[start])
        return segments, in_shapes

    @nn.compact
    def __call__(self, x, train: bool = True):
        import dataclasses as dc

        from ..parallel.pipeline import gpipe_hetero_apply

        assert x.shape[-1] == self.input_channels
        pipe = (self.mesh.shape.get(self.pipe_axis, 1)
                if self.mesh is not None else 1)
        S = self.n_stages or max(pipe, 1)
        assert pipe <= 1 or pipe == S, (
            f"n_stages={S} must equal the '{self.pipe_axis}' axis size "
            f"{pipe} when pipelining")
        segments, in_shapes = self._plan(x.shape[1], x.shape[2], S)

        base = {f.name: getattr(self, f.name)
                for f in dc.fields(VGGKAN)
                if f.name not in ("parent", "name")}
        stages = [_VGGStage(items=seg, with_head=(i == S - 1), **base)
                  for i, seg in enumerate(segments)]

        params = []
        for i, (st, shp) in enumerate(zip(stages, in_shapes)):
            def init_fn(rng, st=st, shp=shp):
                variables = st.init({"params": rng},
                                    jnp.zeros((1,) + shp, jnp.float32),
                                    train=False)
                assert set(variables) == {"params"}, (
                    "PipelinedVGGKAN needs stateless layers (InstanceNorm "
                    f"norms); stage {list(variables)} carries mutable "
                    "collections")
                return variables["params"]
            params.append(self.param(f"stage_{i}", init_fn))

        import jax as _jax

        # Default to a constant key ONLY when no dropout can fire — with
        # live dropout and no 'dropout' rng, silently reusing PRNGKey(0)
        # would make masks identical across steps; let flax's make_rng
        # raise the standard missing-rng error instead (ADVICE r4 #2).
        head_p = self.dropout_linear
        if self.classifier_overrides.get("classifier_dropout") is not None:
            head_p = self.classifier_overrides["classifier_dropout"]
        needs_rng = train and (
            self.dropout > 0 or self.conv_dropout > 0 or head_p > 0)
        key = (self.make_rng("dropout")
               if self.has_rng("dropout") or needs_rng
               else _jax.random.PRNGKey(0))

        def mk(st):
            def f(p, k, h):
                return st.apply({"params": p}, h, train=train,
                                rngs={"dropout": k})
            return f

        if pipe <= 1:
            h = x
            for i, st in enumerate(stages):
                h = mk(st)(params[i], _jax.random.fold_in(key, i), h)
            return h
        keys = _jax.random.split(key, S)
        return gpipe_hetero_apply(
            [mk(st) for st in stages], tuple(params), keys, x,
            mesh=self.mesh, in_shapes=in_shapes,
            out_shape=(self.num_classes,), pipe_axis=self.pipe_axis,
            n_microbatches=self.n_microbatches)
