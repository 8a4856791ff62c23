"""Patch-extraction ("unfold") based convolution — the vectorized TPU
equivalent of the reference's from-scratch utils/convolution.py:18-103
(`multiple_convs_kan_conv2d`, dead code there, kept here as a working op
and as the building block for kernels that want explicit im2col).
"""

from __future__ import annotations

from typing import Tuple, Union

import jax.lax as lax
import jax.numpy as jnp


def unfold2d(x, kernel_size: Union[int, Tuple[int, int]], stride=1,
             dilation=1, padding=0):
    """NHWC im2col: (B, H, W, C) -> (B, Ho, Wo, kh*kw*C)."""
    kh, kw = ((kernel_size, kernel_size) if isinstance(kernel_size, int)
              else kernel_size)
    sh, sw = (stride, stride) if isinstance(stride, int) else stride
    dh, dw = (dilation, dilation) if isinstance(dilation, int) else dilation
    ph, pw = (padding, padding) if isinstance(padding, int) else padding
    xp = jnp.pad(x, ((0, 0), (ph, ph), (pw, pw), (0, 0)))
    B, H, W, C = xp.shape
    Ho = (H - dh * (kh - 1) - 1) // sh + 1
    Wo = (W - dw * (kw - 1) - 1) // sw + 1
    taps = []
    for i in range(kh):
        for j in range(kw):
            taps.append(lax.slice(
                xp, (0, i * dh, j * dw, 0),
                (B, i * dh + (Ho - 1) * sh + 1, j * dw + (Wo - 1) * sw + 1, C),
                (1, sh, sw, 1)))
    return jnp.concatenate(taps, axis=-1)


def unfold_conv2d(x, w, stride=1, dilation=1, padding=0):
    """Conv as im2col + matmul.  w: (kh, kw, C, O) HWIO."""
    kh, kw, C, O = w.shape
    cols = unfold2d(x, (kh, kw), stride, dilation, padding)
    return cols @ w.reshape(kh * kw * C, O)
