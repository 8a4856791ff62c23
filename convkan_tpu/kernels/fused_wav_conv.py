"""Fused WavKAN conv Pallas kernel (TPU).

The XLA path (nn/wav_conv.py:101-120) must materialize the wavelet tensor
psi((x - t)/s) of shape (B, H, W, out*in) in HBM before its grouped conv —
for the BASELINE config-4 stack that is ~100x the size of x, and the
grouped conv that consumes it gets 1 output lane per group on the MXU.
This kernel computes psi in VMEM one input channel at a time and contracts
immediately, so HBM traffic is x + y + params instead of O(out*in) maps.

Reference semantics: layers/wav_kan_layers.py:285-338 ('fast' engine) —
    y[b, p, o] = sum_{i, dk} w[dk, i, o] * psi((x[b, p+dk, i] - t[o, i]) / s[o, i])

Layout strategy (the whole point — full-lane VPU work, no reductions in
the forward, no relayout-heavy ops):

  * forward: grid (batch_blocks, Cin); lanes = O.  For grid step (b, i)
    the kernel holds x[:, :, :, i] (pre-transposed outside so the DMA is
    contiguous), broadcasts it against t[:, i]/s[:, i] into a
    (Bb, Hp, Wp, O) psi tile, and accumulates the k*k taps into the
    resident y block with (O,)-vector FMAs.  Accumulation over i rides
    the output-block revisiting rule (index_map constant over the minor
    grid axis).
  * backward: grid (batch_blocks, Cout); lanes = Cin.  For (b, o) it
    recomputes psi/psi' at input resolution from the resident x block
    (no broadcast needed: t[o, :] is lane-shaped), forms the gradient
    correlation G_o = corr(g_pad[..., o], w[:, :, :, o]) with the same
    tap-FMA pattern, and emits
        dx += psi' * G_o / s[o, :]              (accumulated over o)
        dt[o, :] = -sum_q psi' * G_o / s[o, :]
        ds[o, :] = -sum_q psi' * G_o * z / s[o, :]
        dw[o, dk, :] = sum_q g_o[q] * psi[q + dk, :]
    dw/dt/ds are written per batch-block and reduced outside (XLA), which
    keeps every output block visited once or consecutively.

Shannon's Hamming window runs over the input-channel axis
(basis/wavelet.py:63-70); since psi_shannon = ham[i] * sinc(z), the window
folds into the weights (w'[dk,i,o] = w*ham[i]) outside the kernel and the
chain rule restores dw = dw' * ham — the kernel itself never sees it.

Supported surface: 2D, stride 1, dilation 1, groups 1, any padding; the
layer falls back to the XLA path otherwise (see `supported`).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..basis.wavelet import hamming_window

VMEM_BUDGET = 10 * 1024 * 1024  # conservative vs the ~16 MiB scoped stack


# --------------------------------------------------------------- wavelets
# psi(z) and psi'(z) as jnp elementwise ops (VPU inside the kernel).
# These mirror basis/wavelet.py exactly; the grads are the closed forms of
# those expressions (parity-tested against autodiff of the XLA path).

_MH_C = 2.0 / (math.sqrt(3.0) * math.pi**0.25)


def _psi_mexican_hat(z):
    e = jnp.exp(-0.5 * z * z)
    return _MH_C * (z * z - 1.0) * e


def _dpsi_mexican_hat(z):
    e = jnp.exp(-0.5 * z * z)
    return _MH_C * z * e * (3.0 - z * z)


def _psi_morlet(z):
    return jnp.exp(-0.5 * z * z) * jnp.cos(5.0 * z)


def _dpsi_morlet(z):
    e = jnp.exp(-0.5 * z * z)
    return -e * (z * jnp.cos(5.0 * z) + 5.0 * jnp.sin(5.0 * z))


def _psi_dog(z):
    return -z * jnp.exp(-0.5 * z * z)


def _dpsi_dog(z):
    return (z * z - 1.0) * jnp.exp(-0.5 * z * z)


def _nu(t):
    return t**4 * (35.0 - 84.0 * t + 70.0 * t * t - 20.0 * t**3)


def _dnu(t):
    # 140 t^3 (1 - t)^3
    u = 1.0 - t
    return 140.0 * t**3 * u * u * u


def _meyer_aux(v):
    pi = math.pi
    return jnp.where(
        v <= 0.5, 1.0,
        jnp.where(v >= 1.0, 0.0, jnp.cos(pi / 2.0 * _nu(2.0 * v - 1.0))))


def _psi_meyer(z):
    v = jnp.abs(z)
    return jnp.sin(math.pi * v) * _meyer_aux(v)


def _dpsi_meyer(z):
    pi = math.pi
    v = jnp.abs(z)
    aux = _meyer_aux(v)
    band = jnp.logical_and(v > 0.5, v < 1.0)
    daux = jnp.where(
        band,
        -pi * jnp.sin(pi / 2.0 * _nu(2.0 * v - 1.0)) * _dnu(2.0 * v - 1.0),
        0.0)
    dv = pi * jnp.cos(pi * v) * aux + jnp.sin(pi * v) * daux
    return jnp.sign(z) * dv


def _psi_shannon(z):
    # sinc(z/pi) = sin(z)/z; the Hamming window is folded into the weights
    zs = jnp.where(z == 0.0, 1.0, z)
    return jnp.where(z == 0.0, 1.0, jnp.sin(zs) / zs)


def _dpsi_shannon(z):
    small = jnp.abs(z) < 1e-4
    zs = jnp.where(small, 1.0, z)
    exact = (zs * jnp.cos(zs) - jnp.sin(zs)) / (zs * zs)
    series = -z / 3.0 + (z**3) / 30.0
    return jnp.where(small, series, exact)


PSI = {
    "mexican_hat": (_psi_mexican_hat, _dpsi_mexican_hat),
    "morlet": (_psi_morlet, _dpsi_morlet),
    "dog": (_psi_dog, _dpsi_dog),
    "meyer": (_psi_meyer, _dpsi_meyer),
    "shannon": (_psi_shannon, _dpsi_shannon),
}


# ----------------------------------------------------------------- gating
def _pad8(n):
    return -(-n // 8) * 8


def _pad128(n):
    return -(-n // 128) * 128


def _lane_pack(n_lanes: int, n_rows: int) -> int:
    """How many `n_lanes`-wide row-slices to pack side by side so a tile
    fills the 128 VPU lanes (must also divide the row count)."""
    if n_lanes >= 128 or 128 % n_lanes:
        return 1
    p = 128 // n_lanes
    while p > 1 and n_rows % p:
        p //= 2
    return max(p, 1)


def _pick_batch_block(B, Hp, Wp, Cin, O, kh, kw):
    """Largest divisor of B whose forward/backward working sets fit the
    16 MiB scoped-VMEM stack.  Sizes use Mosaic's PHYSICAL tiling — the
    lane (last) dim pads to 128 and the sublane dim to 8, so e.g. a
    (..., 18, 32) f32 tile really occupies (..., 24, 128); ignoring that
    under-estimated L2's backward by ~4x (observed 24.8M vs a 16M limit
    at bb=16)."""
    Ho, Wo = Hp - kh + 1, Wp - kw + 1
    Hg, Wg = Hp + kh - 1, Wp + kw - 1
    for bb in (128, 64, 32, 16, 8, 4, 2, 1):
        if B % bb:
            continue
        # fwd live set: ~4 psi-sized (Bb,Hp,Wp,O) temporaries (z, psi,
        # partial, tap product) + resident y block + the x slice
        psi_t = bb * Hp * _pad8(Wp) * _pad128(O)
        y_t = bb * Ho * _pad8(Wo) * _pad128(O)
        fwd = 4 * (4 * psi_t + y_t + bb * Hp * _pad8(Wp) * 8)
        # bwd live set: ~8 x-sized (Bb,Hp,Wp,Cin) temporaries (z, psi,
        # dpsi, G, prod, dx contrib/acc, tap products) + 2 g-sized
        x_t = bb * Hp * _pad8(Wp) * _pad128(Cin)
        g_t = bb * Hg * _pad8(Wg) * _pad128(Cin)
        bwd = 4 * (8 * x_t + 2 * g_t)
        if max(fwd, bwd) <= VMEM_BUDGET:
            return bb
    return None


def supported(ndim, stride, dilation, groups, wavelet_type, B, H, W,
              Cin, O, kh, kw, ph, pw):
    """True when the fused kernel covers this layer config."""
    def _one(v):
        return all(s == 1 for s in (v if isinstance(v, tuple) else (v,)))

    if ndim != 2 or groups != 1 or not _one(stride) or not _one(dilation):
        return False
    if wavelet_type not in PSI:
        return False
    if Cin < 8 or O < 8:
        return False  # lane-starved; XLA path wins (cf. KERNELS.md)
    Hp, Wp = H + 2 * ph, W + 2 * pw
    if Hp < kh or Wp < kw:
        return False
    return _pick_batch_block(B, Hp, Wp, Cin, O, kh, kw) is not None


# ---------------------------------------------------------------- kernels
def _mask_padded(a, ph, pw):
    """Zero `a` on padded spatial positions (axes 1/2 of a 4D tile): the
    conv pads the PSI map with zeros (conv_nd pads `flat`,
    nn/wav_conv.py:116-120), so psi there must be 0, not psi((0-t)/s).
    The masks are built as 4D iotas directly — Mosaic cannot reshape a 2D
    i1 vector into a 4D broadcast operand."""
    if ph == 0 and pw == 0:
        return a
    Hp, Wp = a.shape[1], a.shape[2]
    row = jax.lax.broadcasted_iota(jnp.int32, a.shape, 1)
    col = jax.lax.broadcasted_iota(jnp.int32, a.shape, 2)
    keep = ((row >= ph) & (row < Hp - ph)
            & (col >= pw) & (col < Wp - pw))
    return jnp.where(keep, a, 0.0)


def _fwd_kernel(xt_ref, wf_ref, t_ref, sinv_ref, y_ref, *, psi_fn,
                kh, kw, Ho, Wo, ph, pw, O, pack):
    """One grid step handles `pack` input channels side by side in the
    lane dim ([i0's O lanes | i1's O lanes | ...]) so O < 128 layers still
    fill the VPU; the caller folds the pack segments of y afterwards."""
    i = pl.program_id(1)
    Bb, Hp, Wp = xt_ref.shape[1], xt_ref.shape[2], xt_ref.shape[3]
    parts = [jnp.broadcast_to(xt_ref[j][..., None], (Bb, Hp, Wp, O))
             for j in range(pack)]
    xw = parts[0] if pack == 1 else jnp.concatenate(parts, axis=-1)
    z = (xw - t_ref[0, 0, :]) * sinv_ref[0, 0, :]    # (Bb,Hp,Wp,pack*O)
    psi = _mask_padded(psi_fn(z), ph, pw)
    partial = psi[:, 0:Ho, 0:Wo, :] * wf_ref[0, 0, :]
    for dh in range(kh):
        for dw in range(kw):
            if dh == 0 and dw == 0:
                continue
            partial += (psi[:, dh:dh + Ho, dw:dw + Wo, :]
                        * wf_ref[0, dh * kw + dw, :])

    @pl.when(i == 0)
    def _():
        y_ref[:] = partial

    @pl.when(i != 0)
    def _():
        y_ref[:] = y_ref[:] + partial


def _bwd_kernel(xp_ref, gt_ref, wr_ref, t_ref, sinv_ref,
                dx_ref, dwb_ref, dtb_ref, dsb_ref, *, psi_fn, dpsi_fn,
                kh, kw, Ho, Wo, ph, pw, Cin, pack):
    """One grid step handles `pack` output channels side by side in the
    lane dim ([o0's Cin lanes | o1's Cin lanes | ...]); dx folds the pack
    segments in-kernel, dw/dt/ds rows are unpacked by the caller."""
    o = pl.program_id(1)
    x = xp_ref[:]                                    # (Bb, Hp, Wp, Cin)
    Hp, Wp = x.shape[1], x.shape[2]
    xw = x if pack == 1 else jnp.concatenate([x] * pack, axis=-1)
    sinv = sinv_ref[0, 0, :]                         # (pack*Cin,)
    z = (xw - t_ref[0, 0, :]) * sinv
    psi = _mask_padded(psi_fn(z), ph, pw)
    dpsi = _mask_padded(dpsi_fn(z), ph, pw)

    Bb, Hg, Wg = gt_ref.shape[1], gt_ref.shape[2], gt_ref.shape[3]
    gparts = [jnp.broadcast_to(gt_ref[j][..., None], (Bb, Hg, Wg, Cin))
              for j in range(pack)]
    go = gparts[0] if pack == 1 else jnp.concatenate(gparts, axis=-1)
    gc = go[:, kh - 1:kh - 1 + Ho, kw - 1:kw - 1 + Wo, :]

    G = None
    for dh in range(kh):
        for dw in range(kw):
            w_vec = wr_ref[0, dh * kw + dw, :]       # (pack*Cin,)
            # full correlation: dx_pad[q] gets g[q - dk] * w[dk]
            g_sl = go[:, kh - 1 - dh:kh - 1 - dh + Hp,
                      kw - 1 - dw:kw - 1 - dw + Wp, :]
            contrib = g_sl * w_vec
            G = contrib if G is None else G + contrib
            # dw[o, dk, :] = sum_q g[q, o] * psi[q + dk, :]
            dwb_ref[0, 0, dh * kw + dw, :] = jnp.sum(
                gc * psi[:, dh:dh + Ho, dw:dw + Wo, :], axis=(0, 1, 2))

    prod = dpsi * G                                  # (Bb,Hp,Wp,pack*Cin)
    dxw = prod * sinv
    dx_contrib = dxw if pack == 1 else sum(
        dxw[..., j * Cin:(j + 1) * Cin] for j in range(pack))

    @pl.when(o == 0)
    def _():
        dx_ref[:] = dx_contrib

    @pl.when(o != 0)
    def _():
        dx_ref[:] = dx_ref[:] + dx_contrib

    dtb_ref[0, 0, 0, :] = -jnp.sum(prod, axis=(0, 1, 2)) * sinv
    dsb_ref[0, 0, 0, :] = -jnp.sum(prod * z, axis=(0, 1, 2)) * sinv


# ------------------------------------------------------------- op factory
@functools.lru_cache(maxsize=None)
def _get_op(wavelet_type: str, kh: int, kw: int, ph: int, pw: int,
            interpret: bool):
    psi_fn, dpsi_fn = PSI[wavelet_type]

    def _fwd_impl(x, w, t, sinv):
        B, H, W, Cin = x.shape
        O = w.shape[-1]
        Hp, Wp = H + 2 * ph, W + 2 * pw
        Ho, Wo = Hp - kh + 1, Wp - kw + 1
        Bb = _pick_batch_block(B, Hp, Wp, Cin, O, kh, kw)
        if Bb is None:
            raise ValueError(
                f"fused_wav_conv2d: working set exceeds VMEM even at "
                f"batch-block 1 for shape B={B} HxW={H}x{W} Cin={Cin} "
                f"O={O} k={kh}x{kw} — check wav_supported() first")
        pack = _lane_pack(O, Cin)
        x_pad = jnp.pad(x, ((0, 0), (ph, ph), (pw, pw), (0, 0)))
        x_t = jnp.transpose(x_pad, (3, 0, 1, 2))        # (Cin, B, Hp, Wp)
        # pack `pack` consecutive input channels into the lane dim:
        # row i2 of each packed array covers channels [i2*pack, ...)
        wf = jnp.transpose(w, (2, 0, 1, 3))             # (Cin, k2_h, k2_w, O)
        wf = wf.reshape(Cin // pack, pack, kh * kw, O)
        wf = jnp.transpose(wf, (0, 2, 1, 3)).reshape(
            Cin // pack, kh * kw, pack * O)
        # (rows, 1, pack*O): Mosaic requires the last-two block dims to
        # divide (8, 128) or equal the array dims — a (1, L) row block
        # over (rows, L) violates that, (1, 1, L) over (rows, 1, L) is ok
        tT = jnp.transpose(t).reshape(Cin // pack, pack * O)[:, None, :]
        sinvT = jnp.transpose(sinv).reshape(
            Cin // pack, pack * O)[:, None, :]

        kern = functools.partial(_fwd_kernel, psi_fn=psi_fn, kh=kh, kw=kw,
                                 Ho=Ho, Wo=Wo, ph=ph, pw=pw, O=O,
                                 pack=pack)
        y_wide = pl.pallas_call(
            kern,
            grid=(B // Bb, Cin // pack),
            in_specs=[
                pl.BlockSpec((pack, Bb, Hp, Wp),
                             lambda b, i: (i, b, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, kh * kw, pack * O),
                             lambda b, i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, pack * O), lambda b, i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, pack * O), lambda b, i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((Bb, Ho, Wo, pack * O),
                                   lambda b, i: (b, 0, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B, Ho, Wo, pack * O), x.dtype),
            interpret=interpret,
        )(x_t, wf, tT, sinvT)
        if pack == 1:
            return y_wide
        return sum(y_wide[..., j * O:(j + 1) * O] for j in range(pack))

    def _bwd_impl(x, w, t, sinv, g):
        B, H, W, Cin = x.shape
        O = w.shape[-1]
        Hp, Wp = H + 2 * ph, W + 2 * pw
        Ho, Wo = Hp - kh + 1, Wp - kw + 1
        Bb = _pick_batch_block(B, Hp, Wp, Cin, O, kh, kw)
        if Bb is None:
            raise ValueError(
                "fused_wav_conv2d backward: unsupported shape — check "
                "wav_supported() first")
        nb = B // Bb
        Hg, Wg = Hp + kh - 1, Wp + kw - 1
        pack = _lane_pack(Cin, O)
        no = O // pack

        x_pad = jnp.pad(x, ((0, 0), (ph, ph), (pw, pw), (0, 0)))
        g_pad = jnp.pad(g, ((0, 0), (kh - 1, kh - 1), (kw - 1, kw - 1),
                            (0, 0)))
        g_t = jnp.transpose(g_pad, (3, 0, 1, 2))        # (O, B, Hg, Wg)
        # pack `pack` consecutive output channels into the lane dim
        wr = jnp.transpose(w, (3, 0, 1, 2)).reshape(O, kh * kw, Cin)
        wr = jnp.transpose(wr.reshape(no, pack, kh * kw, Cin),
                           (0, 2, 1, 3)).reshape(no, kh * kw, pack * Cin)
        t3 = t.reshape(no, pack * Cin)[:, None, :]
        sinv3 = sinv.reshape(no, pack * Cin)[:, None, :]

        kern = functools.partial(_bwd_kernel, psi_fn=psi_fn,
                                 dpsi_fn=dpsi_fn, kh=kh, kw=kw, Ho=Ho,
                                 Wo=Wo, ph=ph, pw=pw, Cin=Cin, pack=pack)
        dx_pad, dwb, dtb, dsb = pl.pallas_call(
            kern,
            grid=(nb, no),
            in_specs=[
                pl.BlockSpec((Bb, Hp, Wp, Cin), lambda b, o: (b, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((pack, Bb, Hg, Wg),
                             lambda b, o: (o, b, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, kh * kw, pack * Cin),
                             lambda b, o: (o, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, pack * Cin), lambda b, o: (o, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, pack * Cin), lambda b, o: (o, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=(
                pl.BlockSpec((Bb, Hp, Wp, Cin), lambda b, o: (b, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, kh * kw, pack * Cin),
                             lambda b, o: (b, o, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, 1, pack * Cin),
                             lambda b, o: (b, o, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, 1, pack * Cin),
                             lambda b, o: (b, o, 0, 0),
                             memory_space=pltpu.VMEM),
            ),
            out_shape=(
                jax.ShapeDtypeStruct((B, Hp, Wp, Cin), x.dtype),
                jax.ShapeDtypeStruct((nb, no, kh * kw, pack * Cin),
                                     x.dtype),
                jax.ShapeDtypeStruct((nb, no, 1, pack * Cin), x.dtype),
                jax.ShapeDtypeStruct((nb, no, 1, pack * Cin), x.dtype),
            ),
            interpret=interpret,
        )(x_pad, g_t, wr, t3, sinv3)

        dx = dx_pad[:, ph:ph + H, pw:pw + W, :]
        # unpack the lane-packed rows: (no, k2, pack, Cin) -> (O, k2, Cin)
        dwb = jnp.transpose(
            jnp.sum(dwb, axis=0).reshape(no, kh * kw, pack, Cin),
            (0, 2, 1, 3)).reshape(O, kh * kw, Cin)
        dw = jnp.transpose(dwb.reshape(O, kh, kw, Cin), (1, 2, 3, 0))
        dt = jnp.sum(dtb, axis=0).reshape(O, Cin)
        ds = jnp.sum(dsb, axis=0).reshape(O, Cin)
        return dx, dw, dt, ds

    @jax.custom_vjp
    def op(x, w, t, s):
        return _fwd_impl(x, w, t, 1.0 / s)

    def op_fwd(x, w, t, s):
        return _fwd_impl(x, w, t, 1.0 / s), (x, w, t, s)

    def op_bwd(res, g):
        x, w, t, s = res
        # dz/ds = -z/s, so dL/ds = -sum_q(prod * z) / s — the kernel's dsb
        return _bwd_impl(x, w, t, 1.0 / s, g)

    op.defvjp(op_fwd, op_bwd)
    return op


def fused_wav_conv2d(x, wav_w, translation, scale, *, wavelet_type: str,
                     padding, interpret: bool = False):
    """psi-conv of the WavKAN 'fast' engine, fused (see module docstring).

    x: (B, H, W, Cin); wav_w: (kh, kw, Cin, O); translation/scale: (O, Cin)
    -> (B, Ho, Wo, O), identical to the XLA psi+grouped-conv path.
    """
    kh, kw = wav_w.shape[0], wav_w.shape[1]
    ph, pw = (padding if isinstance(padding, tuple) else (padding, padding))
    op = _get_op(wavelet_type, kh, kw, int(ph), int(pw), interpret)
    if wavelet_type == "shannon":
        # fold the channel-axis Hamming window into the weights; the
        # custom_vjp chain rule restores dw automatically (w' = w * ham)
        ham = jnp.asarray(hamming_window(x.shape[-1])).astype(wav_w.dtype)
        wav_w = wav_w * ham[None, None, :, None]
    return op(x, wav_w, translation, scale)
