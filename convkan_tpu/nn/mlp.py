"""Stacked KAN MLPs — parity with the 17 `<Basis>KAN` classes in
models/kans.py:32-478.

All stacks share one pattern (models/kans.py:44-51 etc.): optional first
Dropout, a per-(in,out)-pair family layer, optional L1 wrap (skip last),
inter-layer Dropout (skip last).  L1 decay is reimplemented as an explicit
loss-term helper (see train/regularization) rather than a backward hook —
the reference hook only fires when grads are already zero/None
(utils/regularization.py:76-86), i.e. effectively never during training.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Mapping, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from . import kan_linear as kl


def _build_layer(family: str, in_f: int, out_f: int, cfg: Mapping[str, Any]):
    c = dict(cfg)
    if family == "KAN":
        return kl.KANLinear(
            input_dim=in_f, output_dim=out_f,
            grid_size=c.get("grid_size", 5), spline_order=c.get("spline_order", 3),
            base_activation=c.get("base_activation", "__default__"),
            grid_range=tuple(c.get("grid_range", (-1.0, 1.0))),
            p_deactivate=c.get("p_deactivate", 0.0))
    if family == "FastKAN":
        gr = c.get("grid_range", (-2.0, 2.0))
        return kl.FastKANLinear(
            input_dim=in_f, output_dim=out_f,
            grid_min=gr[0], grid_max=gr[1],
            num_grids=c.get("grid_size", 8),
            use_base_update=c.get("use_base_update", True),
            base_activation=c.get("base_activation", "__default__"),
            spline_weight_init_scale=c.get("spline_weight_init_scale", 0.1))
    if family == "ChebyKAN":
        return kl.ChebyKANLinear(input_dim=in_f, output_dim=out_f,
                                 degree=c.get("degree", 3))
    if family == "LegendreKAN":
        return kl.LegendreKANLinear(
            input_dim=in_f, output_dim=out_f, degree=c.get("degree", 3),
            base_activation=c.get("base_activation", "__default__"))
    if family == "GRAMKAN":
        return kl.GRAMKANLinear(
            input_dim=in_f, output_dim=out_f, degree=c.get("degree", 3),
            base_activation=c.get("base_activation", "__default__"))
    if family == "JacobiKAN":
        return kl.JacobiKANLinear(
            input_dim=in_f, output_dim=out_f, degree=c.get("degree", 3),
            a=c.get("a", 1.0), b=c.get("b", 1.0),
            base_activation=c.get("base_activation", "__default__"))
    if family == "BersnsteinKAN":
        return kl.BersnsteinKANLinear(
            input_dim=in_f, output_dim=out_f, degree=c.get("degree", 3),
            base_activation=c.get("base_activation", "__default__"))
    if family == "BesselKAN":
        return kl.BesselKANLinear(in_f, out_f, degree=c.get("degree", 3))
    if family == "FibonacciKAN":
        return kl.FibonacciKANLinear(in_f, out_f, degree=c.get("degree", 3))
    if family == "FourierKAN":
        return kl.FourierKANLinear(
            input_dim=in_f, output_dim=out_f, grid_size=c.get("grid_size", 3),
            add_bias=c.get("add_bias", True),
            smooth_initialization=c.get("smooth_initialization", False))
    if family == "GegenbauerKAN":
        return kl.GegenbauerKANLinear(in_f, out_f, degree=c.get("degree", 3),
                                      alpha_param=c.get("alpha_param", 0.0))
    if family == "HermiteKAN":
        return kl.HermiteKANLinear(in_f, out_f, degree=c.get("degree", 3))
    if family == "LaguerreKAN":
        return kl.LaguerreKANLinear(in_f, out_f, degree=c.get("degree", 3),
                                    alpha=c.get("alpha", 0.0))
    if family == "LucasKAN":
        return kl.LucasKANLinear(in_f, out_f, degree=c.get("degree", 3))
    if family == "ReLUKAN":
        return kl.ReLUKANLinear(input_dim=in_f, output_dim=out_f,
                                g=c.get("g", 1), k=c.get("k", 1),
                                train_ab=c.get("train_ab", True))
    if family == "TaylorKAN":
        return kl.TaylorKANLinear(input_dim=in_f, output_dim=out_f,
                                  degree=c.get("degree", 3),
                                  add_bias=c.get("add_bias", False))
    if family == "WavKAN":
        return kl.WavKANLinear(input_dim=in_f, output_dim=out_f,
                               wavelet_type=c.get("wavelet_type", "mexican_hat"))
    raise KeyError(family)


class KanMLP(nn.Module):
    """Generic stacked KAN MLP with the reference's dropout placement."""

    family: str
    layers_hidden: Tuple[int, ...]
    dropout: float = 0.0
    l1_decay: float = 0.0          # consumed by the L1 loss-term helper
    first_dropout: bool = True
    cfg: Mapping[str, Any] = dataclasses.field(default_factory=dict)

    @nn.compact
    def __call__(self, x, train: bool = True):
        if x.ndim > 2:
            x = x.reshape(x.shape[0], -1)
        n = len(self.layers_hidden) - 1
        if self.dropout > 0 and self.first_dropout:
            x = nn.Dropout(rate=self.dropout)(x, deterministic=not train)
        for i, (in_f, out_f) in enumerate(
            zip(self.layers_hidden[:-1], self.layers_hidden[1:])
        ):
            layer = _build_layer(self.family, int(in_f), int(out_f), self.cfg)
            if self.l1_decay > 0 and i != n - 1:
                # reference wraps every layer but the last (kans.py:46-47)
                from ..utils.regularization import L1
                layer = L1(layer=layer, weight_decay=self.l1_decay)
            x = layer(x, train=train)
            if self.dropout > 0 and i != n - 1:
                x = nn.Dropout(rate=self.dropout)(x, deterministic=not train)
        return x
