"""Inference-time BatchNorm folding for the model zoo.

A deployment transform on a trained ``variables`` pytree: every conv →
BatchNorm pair has the BN scale ``gamma / sqrt(running_var + eps)``
multiplied into the conv weights' output-channel axis, and the BN is
reduced to a pure shift (weight→1, var→v* with ``f32(v*+eps) == 1.0``
exactly, mean→scale·mean).  After folding, eval-mode BN computes
``z - mean' + beta`` — two broadcast adds XLA fuses into the conv
epilogue; when the variables are closed over as jit constants (the
``utils/export.py`` serving path), the multiply-by-one and
sqrt-of-exactly-one constant-fold away entirely.

The reference has no analogous transform (PyTorch users reach for
``torch.ao.nn.intrinsic`` / ``fuse_conv_bn_eval``); this is part of the
serving surface beyond the reference, motivated by the same math.

Recognized patterns (anything else is left untouched):

* ``StdConvBlock`` (`ops/std_conv.py:60`): node with children
  ``Conv_0 = {w[, b]}`` and one BatchNorm child carrying
  ``batch_stats = {mean, var}``.  Used by every std conv in
  MobileNetV1/2/3 and EfficientNetV1/2.
* ``KanConvND`` (`nn/kan_conv.py`) with a BatchNorm output norm
  (``kan_norm_layer=BatchNorm``): node with leaves ``poly_w``
  [+ ``base_w``] and one BatchNorm child.  The norm sits directly on
  ``spline_out + base_out`` (see ``_post_combine``), both linear in
  their weights, so scaling BOTH weight tensors is exact.
  FastKAN ``input_norm_{g}`` children are input-side norms and are
  explicitly skipped.

All BatchNorms in the tree must share one ``eps`` (models configure it
via ``norm_kwargs``; MobileNetV3/EfficientNetV2 use 0.001, everything
else the torch default 1e-5).  Passing the wrong eps folds the wrong
scale — the parity tests pin this.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax.numpy as jnp
import numpy as np

__all__ = ["fold_batch_norms"]


def _var_for_exact_unit_sqrt(eps: float) -> np.float32:
    """float32 v such that float32(v + eps) == 1.0 bit-exactly, so the
    folded BN's ``1/sqrt(var+eps)`` is exactly 1 and folding introduces
    no systematic rescale."""
    v = np.float32(1.0) - np.float32(eps)
    for _ in range(8):
        s = np.float32(v + np.float32(eps))
        if s == np.float32(1.0):
            return v
        v = np.nextafter(v, np.float32(1.0 if s < 1.0 else 0.0),
                         dtype=np.float32)
    raise ValueError(f"could not construct exact-unit variance for eps={eps}")


def _is_bn(params_child, stats_child) -> bool:
    if not isinstance(stats_child, dict):
        return False
    if set(stats_child.keys()) != {"mean", "var"}:
        return False
    # affine BN has {weight, bias}; affine=False has no params entry
    if params_child is not None and not (
            isinstance(params_child, dict)
            and set(params_child.keys()) <= {"weight", "bias"}):
        return False
    return True


def _fold_node(params: Dict[str, Any], stats: Dict[str, Any],
               eps: float, unit_var: np.float32) -> int:
    """Fold recognized conv→BN pairs inside ONE module node, in place on
    the (already-copied) dicts.  Returns the number of BNs folded."""
    bn_keys = [
        k for k, sc in stats.items()
        if not k.startswith("input_norm")
        and _is_bn(params.get(k), sc)
    ]
    if len(bn_keys) != 1:
        return 0
    bn = bn_keys[0]
    c = stats[bn]["mean"].shape[-1]

    # which weight leaves feed this BN?
    targets = []  # list of (container, key) with out-channel last axis
    conv = params.get("Conv_0")
    if (isinstance(conv, dict) and "w" in conv
            and conv["w"].shape[-1] == c):
        targets.append((conv, "w"))
        if "b" in conv:
            targets.append((conv, "b"))
    elif "poly_w" in params and params["poly_w"].shape[-1] == c:
        targets.append((params, "poly_w"))
        if "base_w" in params and params["base_w"].shape[-1] == c:
            targets.append((params, "base_w"))
    if not targets:
        return 0

    mean, var = stats[bn]["mean"], stats[bn]["var"]
    bn_params = params.get(bn)
    weight = bn_params["weight"] if (
        isinstance(bn_params, dict) and "weight" in bn_params) else None
    scale = (weight if weight is not None else 1.0) / jnp.sqrt(var + eps)

    for container, key in targets:
        container[key] = (container[key] * scale).astype(container[key].dtype)

    stats[bn] = {"mean": (scale * mean).astype(mean.dtype),
                 "var": jnp.full_like(var, unit_var)}
    if weight is not None:
        bn_params["weight"] = jnp.ones_like(weight)
    return 1


def fold_batch_norms(variables: Dict[str, Any], eps: float = 1e-5
                     ) -> Tuple[Dict[str, Any], int]:
    """Return ``(folded_variables, n_folded)``.  Pure function — the
    input pytree is not mutated.  ``eps`` must match the model's
    BatchNorm eps (all BNs in the tree)."""
    if "batch_stats" not in variables:
        return variables, 0
    unit_var = _var_for_exact_unit_sqrt(eps)

    # accept FrozenDict/Mapping trees too: without this, every
    # isinstance(v, dict) below is False and the function silently folds
    # NOTHING (export_forward(fold_bn=True) discards the count)
    from collections.abc import Mapping as _Mapping

    def copy(d):
        return {k: copy(v) if isinstance(v, _Mapping) else v
                for k, v in d.items()}

    out = {k: copy(v) if isinstance(v, _Mapping) else v
           for k, v in variables.items()}
    n = [0]

    def walk(params, stats):
        if not isinstance(params, dict) or not isinstance(stats, dict):
            return
        n[0] += _fold_node(params, stats, eps, unit_var)
        for k, v in params.items():
            if isinstance(v, dict) and isinstance(stats.get(k), dict):
                walk(v, stats[k])

    walk(out["params"], out["batch_stats"])
    return out, n[0]
