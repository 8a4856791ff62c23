"""Fused KAN-conv Pallas TPU kernel.

The reference's universal hot path materializes a (B, C*K, H, W) basis
tensor in HBM and immediately reads it back for a grouped conv
(kan_layers.py:203-239; SURVEY.md §3.3).  This kernel fuses

    squash -> basis recurrence -> [base conv +] basis conv

into one pass: each grid step DMAs a haloed row-tile of the (padded) input
from HBM into VMEM, expands the basis *in VMEM*, and contracts every
kernel tap against the weight slice on the MXU.  HBM traffic drops from
O(B*H*W*C*K) to O(B*H*W*C).

The base-path activation (GELU et al.) is precomputed outside the kernel —
erf has no Mosaic lowering — and streamed in as a second (B,H,W,C) operand;
the basis (the K-wide tensor) never touches HBM.

Scope (v1): 2D, stride 1, dilation 1, groups 1, symmetric padding, float32.
The backward pass is a custom_vjp that recomputes the basis through the
jnp reference path (no residual basis tensor is ever stored).

Unsupported configs fall back to the jnp/XLA path transparently
(nn.KanConvND use_pallas='auto').

MEASURED RESULT (round 2, honest scan-chained timing — full per-shape
table in KERNELS.md): after the unrolled-knot basis fast path
(basis/bspline.py) removed XLA's fusion weakness, the XLA path wins every
measured row (kernel at 0.10-0.78x, fwd+bwd, batch 1024).  Round-1's
"0.7x" interleaved A/B predates that fix and used the broken
block_until_ready timings (BENCH_NOTES.md retraction).  The kernel stays
OPT-IN (use_pallas=True/'auto'; module default False) as the scaffold for
the one regime where VMEM recompute wins on physics — C>=128 at >=56^2
spatial — which needs spatially-blocked halo tiles neither kernel
implements yet (KERNELS.md "revisit trigger").
"""

from __future__ import annotations

import functools
import math
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _ru(v, m):
    return (v + m - 1) // m * m


def _vmem_bytes(hp, wp_, c, k, kh, kw, o):
    """Mosaic-tiling-aware working-set estimate: sublanes (second-minor)
    round to 8, lanes (minor) to 128.  A 2x factor covers the compiler's
    operand copies and relayout temps — the scoped-vmem stack limit is
    16 MiB and an underestimate is a compile-time OOM (seen at
    C=128, K=8, O=128, 28x28: est 9.8M, actual 19.05M)."""
    basis = hp * _ru(wp_, 8) * _ru(c * k, 128) * 4
    xbuf = 2 * hp * _ru(wp_, 8) * _ru(c, 128) * 4
    w = kh * kw * (_ru(c * k, 8) + _ru(c, 8)) * _ru(o, 128) * 4
    acc = (hp - kh + 1) * _ru(wp_ - kw + 1, 8) * _ru(o, 128) * 4
    return 2 * (basis + xbuf + w + acc)


def fused_kan_conv2d(
    x,
    base_in,
    base_w,
    poly_w,
    *,
    basis_list_fn: Callable,
    num_basis: int,
    padding: int,
    kernel_size: int,
    degree_major: bool = False,
    interpret: bool = False,
    extra_args: Tuple = (),
):
    """x: (B, H, W, C); base_in: pre-activated base-path input (same shape)
    or None; base_w: (kh, kw, C, O) or None; poly_w: (kh, kw, C*K, O).
    basis_list_fn maps the raw input to a LIST of K arrays (..., C) and
    runs INSIDE the kernel (a list, because Mosaic cannot reshape a
    trailing (C, K) pair into C*K lanes).  Returns (B, Ho, Wo, O)."""
    B, H, W, C = x.shape
    kh = kw = kernel_size
    K = num_basis
    O = poly_w.shape[-1]
    p = padding

    # pre-split the poly weights per basis index OUTSIDE the kernel:
    # channel-major rows are c*K + kk; degree-major rows are kk*C + c
    if degree_major:
        pw_split = poly_w
    else:
        pw_split = poly_w.reshape(kh, kw, C, K, O).transpose(
            0, 1, 3, 2, 4).reshape(kh, kw, K * C, O)

    # Zero-padding semantics: the reference pads AFTER the basis/activation
    # (zeros enter the convs).  We therefore pad with zeros and mask via a
    # static (Hp, Wp, 1) validity plane, computed once outside the kernel.
    pad_spec = ((0, 0), (p, p), (p, p), (0, 0))
    xp = jnp.pad(x, pad_spec)
    Hp, Wp = H + 2 * p, W + 2 * p
    Ho, Wo = Hp - kh + 1, Wp - kw + 1
    grid = (B,)

    valid = jnp.pad(jnp.ones((H, W, 1), jnp.float32),
                    ((p, p), (p, p), (0, 0)))

    has_base = base_w is not None
    if has_base:
        bp = jnp.pad(base_in, pad_spec) * valid  # mask folded in (free)

    n_extra = len(extra_args)

    def kernel(*refs):
        refs = list(refs)
        xp_ref = refs.pop(0)
        bp_ref = refs.pop(0) if has_base else None
        v_ref = refs.pop(0)
        extra_refs = [refs.pop(0) for _ in range(n_extra)]
        pw_ref = refs.pop(0)
        bw_ref = refs.pop(0) if has_base else None
        out_ref = refs.pop(0)

        xt = xp_ref[0]                                 # (Hp, Wp, C)
        vmask = v_ref[:]                               # (Hp, Wp, 1)
        extras = [r[:] for r in extra_refs]            # learnable basis params
        bas_list = basis_list_fn(xt, *extras)          # K x (Hp, Wp, C)
        # concatenate on the lane dim (supported, unlike a (C,K) reshape):
        # degree-major (Hp, Wp, K*C) -> deep MXU contractions per tap
        bas = jnp.concatenate([bk * vmask for bk in bas_list], axis=-1)

        def tap_dot(sub, w):
            # (Ho, Wo, D) x (D, O) without collapsing the leading dims —
            # avoids a full relayout per tap
            return jax.lax.dot_general(
                sub, w, dimension_numbers=(((2,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)

        acc = jnp.zeros((Ho, Wo, O), jnp.float32)
        for di in range(kh):
            for dj in range(kw):
                acc = acc + tap_dot(bas[di:di + Ho, dj:dj + Wo],
                                    pw_ref[di, dj])
        if has_base:
            actx = bp_ref[0]
            for di in range(kh):
                for dj in range(kw):
                    acc = acc + tap_dot(actx[di:di + Ho, dj:dj + Wo],
                                        bw_ref[di, dj])
        out_ref[0] = acc

    x_spec = pl.BlockSpec((1, Hp, Wp, C), lambda b: (b, 0, 0, 0),
                          memory_space=pltpu.VMEM)
    v_spec = pl.BlockSpec(memory_space=pltpu.VMEM)
    w_spec = pl.BlockSpec(memory_space=pltpu.VMEM)
    e_specs = [pl.BlockSpec(memory_space=pltpu.VMEM) for _ in extra_args]
    if has_base:
        in_specs = [x_spec, x_spec, v_spec, *e_specs, w_spec, w_spec]
        args = [xp, bp, valid, *extra_args, pw_split, base_w]
    else:
        in_specs = [x_spec, v_spec, *e_specs, w_spec]
        args = [xp, valid, *extra_args, pw_split]

    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (1, Ho, Wo, O), lambda b: (b, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((B, Ho, Wo, O), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * Ho * Wo * O * (C * K + C) * kh * kw,
            bytes_accessed=(xp.size * (2 if has_base else 1) + poly_w.size
                            + (base_w.size if has_base else 0)
                            + B * Ho * Wo * O) * 4,
            transcendentals=B * Hp * Wp * C * 4,
        ),
        interpret=interpret,
    )(*args)
    return out


def make_fused_kan_conv_op(*, basis_list_fn: Callable, num_basis: int,
                           base_act: Optional[Callable], kernel_size: int,
                           padding: int, degree_major: bool, has_base: bool,
                           interpret: bool = False):
    """Build a custom_vjp'd fused op.

    Forward = Pallas kernel (no HBM basis tensor).  Backward = recompute
    through the jnp reference (standard XLA conv transposes); the basis is
    regenerated, never stored — SURVEY.md §7 "hard parts" #1.
    """
    from ..ops.conv import conv_nd

    def reference(x, base_w, poly_w, *extras):
        B, H, W, C = x.shape
        bas = jnp.stack(basis_list_fn(x, *extras), axis=-1)
        if degree_major:
            bas = jnp.swapaxes(bas, -1, -2)
        bas = bas.reshape(B, H, W, C * num_basis)
        y = conv_nd(bas, poly_w, ndim=2, stride=1, padding=padding,
                    dilation=1, groups=1)
        if has_base:
            bi = base_act(x) if base_act is not None else x
            y = y + conv_nd(bi, base_w, ndim=2, stride=1, padding=padding,
                            dilation=1, groups=1)
        return y

    def forward(x, base_w, poly_w, *extras):
        base_in = None
        if has_base:
            base_in = base_act(x) if base_act is not None else x
        return fused_kan_conv2d(
            x, base_in, base_w if has_base else None, poly_w,
            basis_list_fn=basis_list_fn, num_basis=num_basis,
            padding=padding, kernel_size=kernel_size,
            degree_major=degree_major, interpret=interpret,
            extra_args=tuple(extras))

    @jax.custom_vjp
    def op(x, base_w, poly_w, *extras):
        return forward(x, base_w, poly_w, *extras)

    def fwd(x, base_w, poly_w, *extras):
        return forward(x, base_w, poly_w, *extras), (x, base_w, poly_w,
                                                     extras)

    def bwd(res, g):
        x, base_w, poly_w, extras = res
        _, vjp = jax.vjp(reference, x, base_w, poly_w, *extras)
        return vjp(g)

    op.defvjp(fwd, bwd)
    return op, reference


def supported(ndim, stride, dilation, groups, kernel_size, H, W, C, K, O,
              padding) -> bool:
    """Static eligibility check for the fused kernel."""
    def _s(v):
        return v if isinstance(v, int) else (v[0] if len(set(v)) == 1 else -1)

    if ndim != 2 or groups != 1:
        return False
    if _s(stride) != 1 or _s(dilation) != 1:
        return False
    k = _s(kernel_size)
    if k <= 0 or k > 7:
        return False
    pad = _s(padding) if not isinstance(padding, int) else padding
    if pad < 0:
        return False
    Ho = H + 2 * pad - k + 1
    Wo = W + 2 * pad - k + 1
    if Ho <= 0 or Wo <= 0:
        return False
    hp, wp_ = H + 2 * pad, W + 2 * pad
    if _vmem_bytes(hp, wp_, C, K, k, k, O) > 10 * 1024 * 1024:
        return False
    return True
