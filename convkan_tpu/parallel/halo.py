"""Spatial (H-axis) sharding with halo exchange for convolutions.

The reference has no parallelism at all; for very large images the natural
"long input" axis of this CNN workload is spatial (SURVEY.md §2.5).  This
utility runs a stride-1 2D conv with the batch-height plane sharded over a
mesh axis: each shard exchanges `pad`-row halos with its neighbors via
jax.lax.ppermute inside shard_map, then convolves locally.  Edge shards
receive zero halos, reproducing symmetric zero padding exactly.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.conv import conv_nd


def halo_conv2d(mesh: Mesh, axis: str, x, w, padding: int = 1):
    """x: (B, H, W, C) with H sharded over `axis`; w: (kh, kw, C, O);
    stride 1.  Returns (B, H, W, C_out) sharded the same way."""
    kh = w.shape[0]
    halo = kh // 2
    assert padding == halo, "v1 supports 'same' convs (padding == kh//2)"
    n = dict(zip(mesh.axis_names, mesh.devices.shape))[axis]

    def local(x_loc, w_loc):
        # x_loc: (B, H/n, W, C)
        idx = jax.lax.axis_index(axis)
        up = [(i, (i + 1) % n) for i in range(n)]      # send down (to i+1)
        down = [(i, (i - 1) % n) for i in range(n)]    # send up (to i-1)
        top_halo = jax.lax.ppermute(x_loc[:, -halo:], axis, up)
        bot_halo = jax.lax.ppermute(x_loc[:, :halo], axis, down)
        # zero halos at the global edges (symmetric zero padding)
        top_halo = jnp.where(idx == 0, jnp.zeros_like(top_halo), top_halo)
        bot_halo = jnp.where(idx == n - 1, jnp.zeros_like(bot_halo), bot_halo)
        xh = jnp.concatenate([top_halo, x_loc, bot_halo], axis=1)
        # W padded symmetrically; H already has its halos
        return conv_nd(xh, w_loc, ndim=2, stride=1,
                       padding=(0, padding), dilation=1, groups=1)

    return jax.shard_map(
        local, mesh=mesh,
        in_specs=(P(None, axis, None, None), P()),
        out_specs=P(None, axis, None, None),
    )(x, w)
