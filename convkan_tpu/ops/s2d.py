"""Space-to-depth (polyphase) reformulation of stride-2 convolutions.

The standard TPU remedy for lane-starved small-channel stems (VERDICT r3
#2): a stride-2 conv touches each input pixel once per 2x2 phase, so it
decomposes EXACTLY into one stride-1 VALID conv over the four phase
images stacked along channels —

    y[i,j] = sum_{d,e} x[2i+d-p, 2j+e-p] w[d,e]
           = sum_{a,b} (valid conv of phase (a,b) with w[a::2, b::2])

with phase (a,b) of the padded input xp_ab[i,j] = xp[2i+a, 2j+b] and the
sub-kernels zero-padded to ceil(k/2).  Channels go C -> 4C (deeper MXU
contraction), spatial halves, and the conv becomes unstrided.  Bitwise
exact up to f32 summation order (pinned by tests/test_s2d.py).

Opt-in via `set_s2d_stride2(True)` — ops.conv.conv_nd then routes every
eligible call (2-D, stride 2, dense, undilated, odd kernel) through this
path.  Measured on the 224^2 BASELINE configs and REJECTED as a default
(bench round 4, BENCH_NOTES.md): the zoo's stride-2 convs are a small
slice of flat profiles, and XLA's native strided conv is already
competitive at these shapes.
"""

from __future__ import annotations

import jax.lax as lax
import jax.numpy as jnp

_S2D = {"on": False}


def set_s2d_stride2(on: bool) -> bool:
    """Toggle the process-wide space-to-depth stride-2 conv path.
    Returns the previous value."""
    prev = _S2D["on"]
    _S2D["on"] = bool(on)
    return prev


def s2d_enabled() -> bool:
    return _S2D["on"]


def s2d_eligible(ndim, stride, dilation, groups, ks) -> bool:
    return (_S2D["on"] and ndim == 2 and tuple(stride) == (2, 2)
            and tuple(dilation) == (1, 1) and groups == 1
            and all(k % 2 == 1 for k in ks))


# ---------------------------------------------- output-channel lane pad
# The second VERDICT r3 #2 remedy probe: zero-pad every dense conv's
# output channels to the next 128-lane multiple and slice the result —
# numerics-exact (padded channels are dead weight), measured on the 224^2
# configs; see BENCH_NOTES.md round 4 for the verdict.
_PAD_OC = {"on": False}


def set_pad_oc(on: bool) -> bool:
    prev = _PAD_OC["on"]
    _PAD_OC["on"] = bool(on)
    return prev


def pad_oc_eligible(groups: int, out_ch: int) -> bool:
    return _PAD_OC["on"] and groups == 1 and out_ch % 128 != 0


def s2d_conv2d(x, w, padding, dn, precision=None):
    """x: (B, H, W, C); w: (kh, kw, C, O); padding: (ph, pw) symmetric.
    Equals conv_nd(..., stride=2) exactly (up to f32 summation order)."""
    kh, kw = w.shape[0], w.shape[1]
    ph, pw = padding
    H, W = x.shape[1], x.shape[2]
    # +1 trailing pad: the odd phases are one sample shorter; the extra
    # zero row/col lets every phase slice to a common extent
    xp = jnp.pad(x, ((0, 0), (ph, ph + 1), (pw, pw + 1), (0, 0)))
    phases = [xp[:, a::2, b::2, :] for a in (0, 1) for b in (0, 1)]
    hs = min(p.shape[1] for p in phases)
    ws = min(p.shape[2] for p in phases)
    xs = jnp.concatenate([p[:, :hs, :ws] for p in phases], axis=-1)

    kh2, kw2 = (kh + 1) // 2, (kw + 1) // 2
    subs = []
    for a in (0, 1):
        for b in (0, 1):
            sub = w[a::2, b::2]
            subs.append(jnp.pad(sub, ((0, kh2 - sub.shape[0]),
                                      (0, kw2 - sub.shape[1]),
                                      (0, 0), (0, 0))))
    ws_k = jnp.concatenate(subs, axis=2)  # (kh2, kw2, 4C, O)

    y = lax.conv_general_dilated(
        xs, ws_k, window_strides=(1, 1), padding=[(0, 0), (0, 0)],
        dimension_numbers=dn, precision=precision)
    out_h = (H + 2 * ph - kh) // 2 + 1
    out_w = (W + 2 * pw - kw) // 2 + 1
    return y[:, :out_h, :out_w]
