"""Shared helpers for golden parity tests."""

from __future__ import annotations

import os
from typing import Any, Dict

import jax
import numpy as np

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "goldens")


def load_golden(name: str):
    blob = np.load(os.path.join(GOLDEN_DIR, f"{name}.npz"))
    sd = {k[len("param:"):]: blob[k] for k in blob.files if k.startswith("param:")}
    # non-param extras (e.g. the exported b-spline knot vector)
    for k in blob.files:
        if not k.startswith("param:") and k not in ("x", "y"):
            sd[k] = blob[k]
    return blob["x"], blob["y"], sd


def nchw_to_nhwc(x: np.ndarray) -> np.ndarray:
    perm = (0,) + tuple(range(2, x.ndim)) + (1,)
    return np.transpose(x, perm)


def nhwc_to_nchw(x: np.ndarray) -> np.ndarray:
    perm = (0, x.ndim - 1) + tuple(range(1, x.ndim - 1))
    return np.transpose(np.asarray(x), perm)


def graft(variables, converted: Dict[str, Any], norm_scope: str = None):
    """Replace init params with converted reference params, preserving the
    flax tree structure.  Reserved __norm_params__/__norm_stats__ entries go
    into the `norm_scope` submodule."""
    variables = jax.tree_util.tree_map(np.asarray, jax.device_get(variables))
    params = dict(variables.get("params", {}))
    stats = dict(variables.get("batch_stats", {}))
    converted = dict(converted)
    norm_params = converted.pop("__norm_params__", None)
    norm_stats = converted.pop("__norm_stats__", None)
    scoped_stats = converted.pop("__scoped_stats__", None)
    for k, v in converted.items():
        assert k in params, f"param {k} missing from init tree {list(params)}"
        if isinstance(v, dict):
            # a named submodule scope (e.g. fastkan's input_norm_{g})
            sub = dict(params[k])
            for kk, vv in v.items():
                sub[kk] = np.asarray(vv).reshape(sub[kk].shape)
            params[k] = sub
            continue
        assert params[k].shape == np.shape(v), (
            f"{k}: init {params[k].shape} vs converted {np.shape(v)}"
        )
        # keep the reference dtype (f64 goldens drive an f64 forward)
        params[k] = np.asarray(v)
    if scoped_stats:
        for scope, v in scoped_stats.items():
            sub = dict(stats[scope])
            for kk, vv in v.items():
                sub[kk] = np.asarray(vv).reshape(sub[kk].shape)
            stats[scope] = sub
    if norm_params is not None:
        assert norm_scope is not None and norm_scope in params, (
            f"norm scope {norm_scope} not in {list(params)}"
        )
        sub = dict(params[norm_scope])
        for k, v in norm_params.items():
            sub[k] = np.asarray(v).reshape(sub[k].shape)
        params[norm_scope] = sub
    if norm_stats is not None and norm_scope is not None and norm_scope in stats:
        sub = dict(stats[norm_scope])
        for k, v in norm_stats.items():
            sub[k] = np.asarray(v).reshape(sub[k].shape)
        stats[norm_scope] = sub
    out = {"params": params}
    if stats:
        out["batch_stats"] = stats
    return out


def assert_close(actual, expected, tol=1e-9, name=""):
    actual = np.asarray(actual)
    diff = np.max(np.abs(actual - expected))
    scale = max(1.0, float(np.max(np.abs(expected))))
    assert diff <= tol * scale, f"{name}: max abs diff {diff} (scale {scale})"
