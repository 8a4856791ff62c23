"""Grouped N-D convolution on channel-last layouts.

The reference executes groups as a Python loop over per-group nn.ConvNd
modules (layers/kan_layers.py:249-258).  On TPU we run ONE
lax.conv_general_dilated with feature_group_count=groups over group-major
channel-last activations and HWIO weights with the group axis folded into O
— a single MXU-friendly contraction instead of `groups` small ones.
"""

from __future__ import annotations

from typing import Sequence, Tuple, Union

import jax.lax as lax
import jax.numpy as jnp

IntOrTuple = Union[int, Tuple[int, ...]]


def _to_tuple(v: IntOrTuple, ndim: int) -> Tuple[int, ...]:
    if isinstance(v, (tuple, list)):
        assert len(v) == ndim
        return tuple(int(x) for x in v)
    return (int(v),) * ndim


def conv_dimension_numbers(ndim: int):
    """Channel-last dimension numbers, e.g. ('NHWC','HWIO','NHWC') for 2D."""
    spatial = "DHW"[-ndim:] if ndim <= 3 else None
    assert spatial is not None, "only 1/2/3-D convs supported"
    lhs = "N" + spatial + "C"
    rhs = spatial + "IO"
    return lax.conv_dimension_numbers((0,) * (ndim + 2), (0,) * (ndim + 2),
                                      (lhs, rhs, lhs))


def conv_nd(
    x,
    w,
    *,
    ndim: int,
    stride: IntOrTuple = 1,
    padding: IntOrTuple = 0,
    dilation: IntOrTuple = 1,
    groups: int = 1,
    precision=None,
):
    """x: (B, *S, Cin); w: (*K, Cin//groups, Cout).  Returns (B, *S', Cout).

    `padding` is symmetric zero padding per spatial dim (int or per-dim
    tuple), matching torch's Conv semantics.
    """
    stride = _to_tuple(stride, ndim)
    dilation = _to_tuple(dilation, ndim)
    pad = _to_tuple(padding, ndim)
    pad_spec = [(p, p) for p in pad]
    dn = conv_dimension_numbers(ndim)

    # mixed precision: run the contraction fully in bf16 (XLA's TPU conv
    # still accumulates at f32 internally) and cast the result back, so the
    # autodiff transpose convs also see uniform bf16 operands
    from .. import config as _cfg

    out_dtype = jnp.result_type(x.dtype, w.dtype)
    if (_cfg.get_quant_mode() == "int8"
            and jnp.issubdtype(out_dtype, jnp.floating)):
        return _conv_nd_int8(x, w, stride, pad_spec, dilation, dn, groups,
                             out_dtype)
    md = _cfg.get_matmul_dtype()
    cast_back = md == "bfloat16" and out_dtype == jnp.float32
    if cast_back:
        x = x.astype(jnp.bfloat16)
        w = w.astype(jnp.bfloat16)
    from .s2d import pad_oc_eligible, s2d_conv2d, s2d_eligible

    if s2d_eligible(ndim, stride, dilation, groups, w.shape[:ndim]):
        # opt-in polyphase space-to-depth stride-2 path (ops/s2d.py)
        y = s2d_conv2d(x, w, pad, dn, precision=precision)
        return y.astype(out_dtype) if cast_back else y
    if pad_oc_eligible(groups, w.shape[-1]):
        # opt-in output-channel lane padding (ops/s2d.py): conv at the
        # next 128-multiple, slice back — numerics-exact probe knob
        oc = w.shape[-1]
        target = -(-oc // 128) * 128
        wp = jnp.pad(w, [(0, 0)] * (ndim + 1) + [(0, target - oc)])
        y = lax.conv_general_dilated(
            x, wp, window_strides=stride, padding=pad_spec,
            lhs_dilation=(1,) * ndim, rhs_dilation=dilation,
            dimension_numbers=dn, feature_group_count=1,
            precision=precision)[..., :oc]
        return y.astype(out_dtype) if cast_back else y
    y = lax.conv_general_dilated(
        x,
        w,
        window_strides=stride,
        padding=pad_spec,
        lhs_dilation=(1,) * ndim,
        rhs_dilation=dilation,
        dimension_numbers=dn,
        feature_group_count=groups,
        precision=precision,
    )
    return y.astype(out_dtype) if cast_back else y


def _conv_nd_int8(x, w, stride, pad_spec, dilation, dn, groups, out_dtype):
    """Dynamic symmetric int8 PTQ conv (config.set_quant_mode('int8')).

    Standard TPU serving recipe: per-output-channel weight scales,
    per-tensor activation scale computed from the live batch (dynamic —
    no calibration pass needed, and never stale), s8 x s8 -> s32 on the
    MXU, one fused dequant multiply on the way out.  The quantize ops are
    elementwise, so XLA fuses them into the producing fusion: the wide
    KAN basis tensor hits HBM as int8 (4x less traffic than f32).
    Inference-only — round() has zero gradient.
    """
    # activations: per-tensor symmetric scale from the live max
    ax = jnp.max(jnp.abs(x)).astype(jnp.float32) / 127.0
    ax = jnp.maximum(ax, jnp.float32(1e-12))
    xq = jnp.clip(jnp.round(x.astype(jnp.float32) / ax), -127.0, 127.0)
    xq = xq.astype(jnp.int8)
    # weights: per-output-channel scales (last axis of (*K, Cin/g, Cout))
    aw = jnp.max(jnp.abs(w.astype(jnp.float32)),
                 axis=tuple(range(w.ndim - 1))) / 127.0
    aw = jnp.maximum(aw, jnp.float32(1e-12))
    wq = jnp.clip(jnp.round(w.astype(jnp.float32) / aw), -127.0, 127.0)
    wq = wq.astype(jnp.int8)
    yq = lax.conv_general_dilated(
        xq,
        wq,
        window_strides=stride,
        padding=pad_spec,
        lhs_dilation=(1,) * (len(pad_spec)),
        rhs_dilation=dilation,
        dimension_numbers=dn,
        feature_group_count=groups,
        preferred_element_type=jnp.int32,
    )
    return (yq.astype(jnp.float32) * (ax * aw)).astype(out_dtype)


def same_padding(kernel_size: IntOrTuple, dilation: IntOrTuple, ndim: int = 2):
    """'same' padding for stride 1 — parity with
    layers/kan_conv.py:12-25 (_calculate_same_padding)."""
    k = _to_tuple(kernel_size, ndim)
    d = _to_tuple(dilation, ndim)
    pads = tuple((dd * (kk - 1)) // 2 for kk, dd in zip(k, d))
    if all(p == pads[0] for p in pads):
        return pads[0]
    return pads
