"""Serving export: serialize a model's forward pass to StableHLO.

The reference's deployment story is whole-module pickles that require the
class code at load time (generic_train.py:37).  Here a trained model
exports to a self-contained StableHLO artifact (jax.export) that any JAX
process — or a non-Python serving stack that speaks StableHLO — can run
without convkan_tpu installed.

    blob = export_forward(model, variables, input_shape)   # bytes
    fn = load_forward(blob)                                # callable
    logits = fn(x)
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from jax import export as jexport


def export_forward(model, variables, input_shape: Sequence[int],
                   batch_poly: bool = True, fold_bn: bool = False,
                   bn_eps: float = 1e-5, int8: bool = False) -> bytes:
    """Serialize `model.apply(variables, x, train=False)` with the params
    baked in.  `input_shape` excludes the batch dim; with batch_poly the
    batch dimension is exported symbolically (any batch size at serve
    time).

    fold_bn applies `utils/fold_bn.fold_batch_norms` first: because the
    variables are closed over as compile-time constants here, the folded
    BNs' multiply-by-one / sqrt-of-one constant-fold away and each BN
    collapses into a single fused shift in the conv epilogue.  bn_eps
    must match the model's BatchNorm eps (MobileNetV3 / EfficientNetV2
    configure 0.001).

    int8 bakes the dynamic-PTQ conv path (config.quant_mode) into the
    artifact: weight quantization constant-folds at compile time, the
    per-batch activation scales stay dynamic in the graph."""
    if fold_bn:
        from .fold_bn import fold_batch_norms
        variables, _ = fold_batch_norms(variables, eps=bn_eps)

    from .. import config as _cfg

    def fwd(x):
        with _cfg.quant_mode("int8" if int8 else None):
            return model.apply(variables, x, train=False)

    if batch_poly:
        (b,) = jexport.symbolic_shape("b")
        x_spec = jax.ShapeDtypeStruct((b, *input_shape), jnp.float32)
    else:
        x_spec = jax.ShapeDtypeStruct((1, *input_shape), jnp.float32)
    exported = jexport.export(jax.jit(fwd))(x_spec)
    return exported.serialize()


def load_forward(blob: bytes):
    """Deserialize an exported forward; returns a callable f(x)."""
    exported = jexport.deserialize(blob)
    return lambda x: exported.call(x)
