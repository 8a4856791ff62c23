"""Wide-matmul fused KAN-conv Pallas TPU kernel (v3) — forward AND backward.

Why the v1 kernel (fused_kan_conv.py) was not enough: a KAN conv's MXU
shape is ``(rows x kh*kw*C*K) @ (kh*kw*C*K x O)`` — the contraction is deep
(C*K input channels) but the *output* is only O lanes wide.  For the early
layers of every BASELINE config (O = 16..64) that wastes 7/8..1/2 of the
128-lane systolic array; measured on v5e the XLA path runs those shapes at
5-15 TFLOP/s (3-8% of bf16 peak).

This kernel reorganizes the same FLOPs into a *wide* contraction:

    E    = [basis_0(x) .. basis_{K-1}(x), act(x)]          # (R, (K+1)*C)
    Z    = E @ W_all                                        # (R, kh*kw*O)
    y    = sum over taps (di,dj) of Z shifted by (di,dj)    # VPU adds

One matmul covers all kh*kw kernel taps AND the parallel base path, so the
output side is kh*kw*O lanes wide (144 for a 3x3/O=16 layer — more than a
full MXU tile) instead of O.  The tap-reduction is kh*kw shifted
element-wise adds that stay in VMEM; doing this trick in plain XLA would
materialize the kh*kw-wide Z tensor in HBM, which is why it must be a
Pallas kernel.

The backward runs fully in-kernel too (SURVEY.md §7 hard part #1): the
basis is *recomputed* in VMEM (never stored to HBM) and pulled back through
``jax.vjp`` of the E-builder; dW/dE are two more wide matmuls:

    dZ = scatter of g over taps      (lane-disjoint pads, VPU)
    dE = dZ @ W_all^T                # contraction kh*kw*O, output (K+1)*C
    dW = E^T @ dZ                    # contraction over rows, accumulated
                                     #   across the batch grid
    dx, d(extras) = vjp(E-builder)(dE)   # element-wise chain rule

The base-path activation (GELU's erf has no Mosaic lowering) is computed
outside and streamed in as the xa operand; its chain rule runs in XLA via
the returned dxa.

Reference hot path being replaced: layers/kan_layers.py:197-247 (basis
materialized to HBM + two cuDNN convs per group).

Scope: 2D, stride 1, dilation 1, groups 1, square kernel <= 7, f32 (or
bf16 contraction operands via config.matmul_dtype with f32 accumulate).
Families: all with pure/VPU-computable bases (see KanConvND._FUSABLE).
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _taps(k: int):
    return [(di, dj) for di in range(k) for dj in range(k)]


def _pick_bt(B: int, bytes_per_img: int, budget: int) -> int:
    """Largest power-of-two divisor of B whose working set fits."""
    bt = 1
    for cand in (2, 4, 8, 16, 32, 64):
        if B % cand == 0 and cand * bytes_per_img <= budget:
            bt = cand
    return bt


def _padded_plane_bytes(Hp: int, Wp: int, C: int) -> int:
    """VMEM bytes of one (1, Hp, Wp, C) f32 temp after Mosaic tiling —
    sublanes (Wp) round to 8, lanes (C) round to 128.  The basis recurrence
    keeps O(K) such temps live, which dominates the kernel's VMEM budget
    when C << 128."""
    return Hp * _round_up(Wp, 8) * _round_up(C, 128) * 4


def _vmem_model(Hp, Wp, C, K, D, T, O):
    """ONE VMEM sizing model shared by wide_supported (the eligibility
    gate) and _make_core's block pickers — tuning either without the
    other is exactly the drift that turns into compile-time OOMs.
    Returns (w_bytes, fwd_bytes_per_image, bwd_bytes_per_image)."""
    n_temps = 3 * K + 12          # live basis-recurrence temps (estimate)
    plane = _padded_plane_bytes(Hp, Wp, C)
    ez_bytes = Hp * _round_up(Wp, 8) * (
        _round_up(D, 128) + 2 * _round_up(T * O, 128)) * 4
    w_bytes = _round_up(D, 8) * _round_up(T * O, 128) * 4
    fwd_img = n_temps * plane + ez_bytes
    bwd_img = 5 * n_temps * plane // 2 + 2 * ez_bytes
    return w_bytes, fwd_img, bwd_img


def _round_up(v: int, m: int) -> int:
    return (v + m - 1) // m * m


# v5e/v5p have 128 MiB of VMEM; leave headroom for Mosaic's own buffers.
_VMEM_LIMIT = 100 * 1024 * 1024


def pack_w_all(base_w, poly_w, *, C: int, K: int, k: int, O: int,
               degree_major: bool):
    """Build the (D, k*k*O) combined weight matrix.

    Rows: basis-major — row kk*C + c holds basis kk of channel c (matching
    the kernel's lane-concat of the K basis arrays), followed by C rows for
    the base path.  Columns: tap-major — column (di*k+dj)*O + o.

    poly_w is HWIO (k, k, C*K, O) with rows c*K+kk (channel-major families)
    or kk*C+c (degree-major families, e.g. the reference Legendre layout).
    """
    if degree_major:
        pw = poly_w.reshape(k, k, K, C, O)
    else:
        pw = poly_w.reshape(k, k, C, K, O).transpose(0, 1, 3, 2, 4)
    # (k, k, K, C, O) -> (K*C, k*k*O)
    pw = pw.transpose(2, 3, 0, 1, 4).reshape(K * C, k * k * O)
    if base_w is None:
        return pw
    bw = base_w.transpose(2, 0, 1, 3).reshape(C, k * k * O)
    return jnp.concatenate([pw, bw], axis=0)


def make_wide_kan_conv_op(
    *,
    basis_list_fn: Callable,
    num_basis: int,
    base_act: Optional[Callable],
    kernel_size: int,
    padding: int,
    degree_major: bool,
    has_base: bool,
    interpret: bool = False,
    compute_dtype=None,
):
    """Returns op(x, base_w, poly_w, *extras) -> (B, Ho, Wo, O), fully
    differentiable, with both passes as Pallas kernels."""
    k = kernel_size
    K = num_basis
    p = padding

    def op(x, base_w, poly_w, *extras):
        B, H, W, C = x.shape
        O = poly_w.shape[-1]

        w_all = pack_w_all(base_w if has_base else None, poly_w,
                           C=C, K=K, k=k, O=O, degree_major=degree_major)

        pad_spec = ((0, 0), (p, p), (p, p), (0, 0))
        xp = jnp.pad(x, pad_spec)
        operands = (xp,)
        if has_base:
            xa = base_act(x) if base_act is not None else x
            operands = (xp, jnp.pad(xa, pad_spec))

        core = _make_core(
            basis_list_fn=basis_list_fn, has_base=has_base,
            K=K, k=k, O=O, C=C, H=H, W=W, p=p,
            interpret=interpret, compute_dtype=compute_dtype,
            n_extras=len(extras))
        return core(*operands, w_all, *extras)

    return op


def _make_core(*, basis_list_fn, has_base, K, k, O, C, H, W, p,
               interpret, compute_dtype, n_extras):
    """custom_vjp'd core over padded inputs; the pad-validity mask rides in
    as a constant operand (no gradient)."""
    T = k * k
    D = (K + (1 if has_base else 0)) * C
    Hp, Wp = H + 2 * p, W + 2 * p
    Ho, Wo = Hp - k + 1, Wp - k + 1
    taps = _taps(k)
    cdt = jnp.bfloat16 if compute_dtype == "bfloat16" else None

    vmask = jnp.pad(jnp.ones((H, W, 1), jnp.float32),
                    ((p, p), (p, p), (0, 0)))

    def ebuild(vm, xt, *rest):
        """Masked (Bt, Hp, Wp, D) expansion; differentiated via jax.vjp
        w.r.t. everything but vm."""
        if has_base:
            xat, extras = rest[0], rest[1:]
        else:
            xat, extras = None, rest
        cols = basis_list_fn(xt, *extras)
        if has_base:
            cols = cols + [xat]
        return jnp.concatenate(cols, axis=-1) * vm

    def _dot(a, b, dims):
        if cdt is not None:
            a = a.astype(cdt)
            b = b.astype(cdt)
        return jax.lax.dot_general(a, b, dimension_numbers=(dims, ((), ())),
                                   preferred_element_type=jnp.float32)

    # ---------------------------------------------------------- forward
    def fwd_kernel(*refs):
        refs = list(refs)
        xp_ref = refs.pop(0)
        xap_ref = refs.pop(0) if has_base else None
        vm_ref = refs.pop(0)
        extra_refs = [refs.pop(0) for _ in range(n_extras)]
        w_ref = refs.pop(0)
        out_ref = refs.pop(0)

        vm = vm_ref[...]
        args = (vm, xp_ref[...]) \
            + ((xap_ref[...],) if has_base else ()) \
            + tuple(r[...] for r in extra_refs)
        E = ebuild(*args)
        Bt = E.shape[0]
        flat = E.reshape(Bt * Hp * Wp, D)
        Z = _dot(flat, w_ref[...], ((1,), (0,)))
        Zr = Z.reshape(Bt, Hp, Wp, T * O)
        acc = None
        for t, (di, dj) in enumerate(taps):
            sl = Zr[:, di:di + Ho, dj:dj + Wo, t * O:(t + 1) * O]
            acc = sl if acc is None else acc + sl
        out_ref[...] = acc

    # ---------------------------------------------------------- backward
    def bwd_kernel(*refs):
        refs = list(refs)
        xp_ref = refs.pop(0)
        xap_ref = refs.pop(0) if has_base else None
        vm_ref = refs.pop(0)
        extra_refs = [refs.pop(0) for _ in range(n_extras)]
        w_ref = refs.pop(0)
        g_ref = refs.pop(0)
        dx_ref = refs.pop(0)
        dxa_ref = refs.pop(0) if has_base else None
        dw_ref = refs.pop(0)
        dextra_refs = [refs.pop(0) for _ in range(n_extras)]

        vm = vm_ref[...]
        args = (xp_ref[...],) \
            + ((xap_ref[...],) if has_base else ()) \
            + tuple(r[...] for r in extra_refs)
        E, pull = jax.vjp(lambda *a: ebuild(vm, *a), *args)
        Bt = E.shape[0]
        R = Bt * Hp * Wp
        flat = E.reshape(R, D)

        g = g_ref[...]  # (Bt, Ho, Wo, O)
        # dZ: each tap's lane block is g padded back to the (Hp, Wp) frame
        blocks = [
            jnp.pad(g, ((0, 0), (di, Hp - Ho - di), (dj, Wp - Wo - dj),
                        (0, 0)))
            for (di, dj) in taps
        ]
        dZr = jnp.concatenate(blocks, axis=-1)  # (Bt, Hp, Wp, T*O)
        dflat = dZr.reshape(R, T * O)

        dE = _dot(dflat, w_ref[...], ((1,), (1,)))      # (R, D)
        dw_partial = _dot(flat, dflat, ((0,), (0,)))    # (D, T*O)

        @pl.when(pl.program_id(0) == 0)
        def _():
            dw_ref[...] = jnp.zeros_like(dw_ref)
            for r in dextra_refs:
                r[...] = jnp.zeros_like(r)

        dw_ref[...] += dw_partial

        pulled = pull(dE.reshape(Bt, Hp, Wp, D))
        dx_ref[...] = pulled[0]
        idx = 1
        if has_base:
            dxa_ref[...] = pulled[idx]
            idx += 1
        for r, gex in zip(dextra_refs, pulled[idx:]):
            r[...] += gex.reshape(r.shape)

    # ---------------------------------------------------------- plumbing
    full = pl.BlockSpec(memory_space=pltpu.VMEM)

    def _x_spec(Bt):
        return pl.BlockSpec((Bt, Hp, Wp, C), lambda b: (b, 0, 0, 0),
                            memory_space=pltpu.VMEM)

    def _in_specs(Bt, extras):
        specs = [_x_spec(Bt)]
        if has_base:
            specs.append(_x_spec(Bt))
        specs.append(full)                     # vmask
        specs.extend(full for _ in extras)     # extras
        specs.append(full)                     # w_all
        return specs

    w_bytes, fwd_img, bwd_img = _vmem_model(Hp, Wp, C, K, D, T, O)

    def run_fwd(xp, xap, w_all, extras):
        B = xp.shape[0]
        Bt = _pick_bt(B, fwd_img, 48 * 1024 * 1024 - 2 * w_bytes)
        out_spec = pl.BlockSpec((Bt, Ho, Wo, O), lambda b: (b, 0, 0, 0),
                                memory_space=pltpu.VMEM)
        args = [xp] + ([xap] if has_base else []) + [vmask] + list(extras) \
            + [w_all]
        return pl.pallas_call(
            fwd_kernel,
            grid=(B // Bt,),
            in_specs=_in_specs(Bt, extras),
            out_specs=out_spec,
            out_shape=jax.ShapeDtypeStruct((B, Ho, Wo, O), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel",),
                vmem_limit_bytes=_VMEM_LIMIT,
            ),
            cost_estimate=pl.CostEstimate(
                flops=2 * B * Hp * Wp * D * T * O,
                bytes_accessed=(xp.size * (2 if has_base else 1)
                                + w_all.size + B * Ho * Wo * O) * 4,
                transcendentals=B * Hp * Wp * C * 4,
            ),
            interpret=interpret,
        )(*args)

    def run_bwd(xp, xap, w_all, extras, g):
        B = xp.shape[0]
        Bt = _pick_bt(B, bwd_img, 48 * 1024 * 1024 - 3 * w_bytes)
        g_spec = pl.BlockSpec((Bt, Ho, Wo, O), lambda b: (b, 0, 0, 0),
                              memory_space=pltpu.VMEM)
        in_specs = _in_specs(Bt, extras) + [g_spec]

        out_specs = [_x_spec(Bt)]
        out_shapes = [jax.ShapeDtypeStruct(xp.shape, jnp.float32)]
        if has_base:
            out_specs.append(_x_spec(Bt))
            out_shapes.append(jax.ShapeDtypeStruct(xp.shape, jnp.float32))
        out_specs.append(pl.BlockSpec((D, T * O), lambda b: (0, 0),
                                      memory_space=pltpu.VMEM))
        out_shapes.append(jax.ShapeDtypeStruct((D, T * O), jnp.float32))
        for e in extras:
            eshape = e.shape if e.ndim >= 2 else (1,) + tuple(e.shape)
            nz = len(eshape)
            out_specs.append(pl.BlockSpec(
                eshape, (lambda n: (lambda b: (0,) * n))(nz),
                memory_space=pltpu.VMEM))
            out_shapes.append(jax.ShapeDtypeStruct(eshape, jnp.float32))

        args = [xp] + ([xap] if has_base else []) + [vmask] + list(extras) \
            + [w_all, g]
        outs = pl.pallas_call(
            bwd_kernel,
            grid=(B // Bt,),
            in_specs=in_specs,
            out_specs=out_specs,
            out_shape=out_shapes,
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",),
                vmem_limit_bytes=_VMEM_LIMIT,
            ),
            cost_estimate=pl.CostEstimate(
                flops=6 * B * Hp * Wp * D * T * O,
                bytes_accessed=(2 * xp.size * (2 if has_base else 1)
                                + 2 * w_all.size + B * Ho * Wo * O) * 4,
                transcendentals=B * Hp * Wp * C * 8,
            ),
            interpret=interpret,
        )(*args)
        outs = list(outs)
        dxp = outs.pop(0)
        dxap = outs.pop(0) if has_base else None
        dw = outs.pop(0)
        dextras = tuple(o.reshape(e.shape) for o, e in zip(outs, extras))
        return dxp, dxap, dw, dextras

    @jax.custom_vjp
    def core(xp, *rest):
        if has_base:
            xap, w_all, extras = rest[0], rest[1], rest[2:]
        else:
            xap, w_all, extras = None, rest[0], rest[1:]
        return run_fwd(xp, xap, w_all, extras)

    def core_fwd(xp, *rest):
        return core(xp, *rest), (xp, rest)

    def core_bwd(res, g):
        xp, rest = res
        if has_base:
            xap, w_all, extras = rest[0], rest[1], rest[2:]
        else:
            xap, w_all, extras = None, rest[0], rest[1:]
        dxp, dxap, dw, dextras = run_bwd(xp, xap, w_all, extras, g)
        if has_base:
            return (dxp, dxap, dw) + dextras
        return (dxp, dw) + dextras

    core.defvjp(core_fwd, core_bwd)
    return core


def unpack_w_all_grad(dw_all, *, C: int, K: int, k: int, O: int,
                      degree_major: bool, has_base: bool):
    """Inverse of pack_w_all for gradients (used only in tests; the op
    itself differentiates pack_w_all through XLA)."""
    pw_rows = K * C
    dpw = dw_all[:pw_rows].reshape(K, C, k, k, O).transpose(2, 3, 0, 1, 4)
    if degree_major:
        dpw = dpw.reshape(k, k, K * C, O)
    else:
        dpw = dpw.transpose(0, 1, 3, 2, 4).reshape(k, k, C * K, O)
    if not has_base:
        return dpw, None
    dbw = dw_all[pw_rows:].reshape(C, k, k, O).transpose(1, 2, 0, 3)
    return dpw, dbw


def wide_supported(ndim, stride, dilation, groups, kernel_size, H, W, C, K,
                   O, padding, has_base) -> bool:
    """Static eligibility for the wide kernel.

    The wide trick pays when the plain conv is lane-starved (O < 128) and
    the combined weight matrix fits comfortably in VMEM next to the
    activation blocks."""
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
    Hp, Wp = H + 2 * pad, W + 2 * pad
    if Hp - k + 1 <= 0 or W + 2 * pad - k + 1 <= 0:
        return False
    D = (K + (1 if has_base else 0)) * C
    T = k * k
    w_bytes, _, bwd_img = _vmem_model(Hp, Wp, C, K, D, T, O)
    # weights (w + dw accumulator) must leave room for activation blocks
    if 3 * w_bytes > 24 * 1024 * 1024:
        return False
    # one image's backward working set must fit in the VMEM budget
    if bwd_img > 48 * 1024 * 1024 - 3 * w_bytes:
        return False
    return True
