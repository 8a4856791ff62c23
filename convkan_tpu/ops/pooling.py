"""Pooling ops (channel-last): max pool, avg pool, adaptive average pool,
and a fully vectorized fuzzy pooling.

Reference points: nn.MaxPool2d(2, 2) usage in VGG (models/kan_vgg.py:121),
nn.AdaptiveAvgPool2d(expected_feature_shape) (models/kan_vgg.py:35), and
the quadruple-python-loop FuzzyPooling (utils/fuzzy_pooling.py:6-80) which
we rebuild as a single windowed computation.
"""

from __future__ import annotations

from typing import Tuple, Union

import jax
import jax.lax as lax
import jax.numpy as jnp

IntOr2 = Union[int, Tuple[int, int]]


def _pair(v: IntOr2) -> Tuple[int, int]:
    return tuple(v) if isinstance(v, (tuple, list)) else (int(v), int(v))


def max_pool(x, kernel_size: IntOr2, stride: IntOr2 = None, padding: IntOr2 = 0):
    """torch.nn.MaxPool2d parity for NHWC."""
    k = _pair(kernel_size)
    s = _pair(stride if stride is not None else kernel_size)
    p = _pair(padding)
    # (A reshape+max fast path for the non-overlapping divisible case was
    # measured SLOWER end-to-end on the KAN-VGG16_small train step —
    # 47.1k vs 49.5k img/s: the 6-D equality-select backward costs more
    # than XLA's 0.31 ms select-and-scatter.  Reverted; see BENCH_NOTES.)
    # NOTE: the init value must stay a weak-typed python literal — a
    # concrete array here defeats JAX's reduce-window-max autodiff pattern
    return lax.reduce_window(
        x, -jnp.inf, lax.max,
        window_dimensions=(1, k[0], k[1], 1),
        window_strides=(1, s[0], s[1], 1),
        padding=((0, 0), (p[0], p[0]), (p[1], p[1]), (0, 0)),
    )


def avg_pool(x, kernel_size: IntOr2, stride: IntOr2 = None, padding: IntOr2 = 0):
    """torch.nn.AvgPool2d parity for NHWC (count includes padding=False
    semantics only when padding == 0, which is all the zoo uses)."""
    k = _pair(kernel_size)
    s = _pair(stride if stride is not None else kernel_size)
    p = _pair(padding)
    summed = lax.reduce_window(
        x, 0.0, lax.add,
        window_dimensions=(1, k[0], k[1], 1),
        window_strides=(1, s[0], s[1], 1),
        padding=((0, 0), (p[0], p[0]), (p[1], p[1]), (0, 0)),
    )
    return summed / (k[0] * k[1])


def adaptive_avg_pool(x, output_size: IntOr2):
    """torch.nn.AdaptiveAvgPool2d parity for NHWC.

    Bin b over dim of size n covers [floor(b*n/o), ceil((b+1)*n/o)); bins
    are enumerated at trace time (output sizes are small constants: (1,1),
    (6,6), (7,7) across the model zoo)."""
    oh, ow = _pair(output_size)
    B, H, W, C = x.shape
    if H % oh == 0 and W % ow == 0:
        return avg_pool(x, (H // oh, W // ow), (H // oh, W // ow))

    rows = []
    for hs, he in [(b * H // oh, -(-(b + 1) * H // oh)) for b in range(oh)]:
        cols = []
        for ws, we in [(b * W // ow, -(-(b + 1) * W // ow)) for b in range(ow)]:
            cols.append(jnp.mean(x[:, hs:he, ws:we, :], axis=(1, 2)))
        rows.append(jnp.stack(cols, axis=1))
    return jnp.stack(rows, axis=1)


def fuzzy_pool(x, kernel_size: int, stride: int, v_max: float = 6.0):
    """Vectorized fuzzy pooling (NHWC) — exact semantics of
    utils/fuzzy_pooling.py:23-80 without the B*C*H'*W' python loop.

    Per window: three triangular memberships, pick the one with the largest
    mass, return the membership-weighted second moment / first moment.
    """
    d = v_max / 2.0
    c = v_max / 4.0
    a = 1.5
    m = v_max / 2.0
    r = v_max / 2.0
    q = r + v_max / 4.0

    B, H, W, C = x.shape
    k, s = int(kernel_size), int(stride)
    Ho = (H - k) // s + 1
    Wo = (W - k) // s + 1

    # extract windows: (B, Ho, Wo, k*k, C)
    patches = []
    for di in range(k):
        for dj in range(k):
            patches.append(
                lax.slice(x, (0, di, dj, 0), (B, di + (Ho - 1) * s + 1,
                                              dj + (Wo - 1) * s + 1, C),
                          (1, s, s, 1))
            )
    p = jnp.stack(patches, axis=3)  # (B, Ho, Wo, k*k, C)

    def tri(v, center, width):
        return jnp.clip(1.0 - jnp.abs(v - center) / width, 0.0, None)

    mu1 = tri(p, c, d - c)
    mu2 = tri(p, m, a)
    mu3 = tri(p, r, q - r)
    mus = jnp.stack([mu1, mu2, mu3], axis=0)          # (3, B, Ho, Wo, kk, C)
    masses = jnp.sum(mus, axis=4)                      # (3, B, Ho, Wo, C)
    sel = jnp.argmax(masses, axis=0)                   # (B, Ho, Wo, C)
    chosen = jnp.take_along_axis(
        mus, sel[None, :, :, :, None, :], axis=0
    )[0]                                               # (B, Ho, Wo, kk, C)
    w = chosen * p
    num = jnp.sum(w * p, axis=3)
    den = jnp.sum(w, axis=3)
    return jnp.where(den == 0, 0.0, num / jnp.where(den == 0, 1.0, den))


class FuzzyPooling:
    """Module-style wrapper for API parity (utils/fuzzy_pooling.py:6)."""

    def __init__(self, kernel_size: int, stride: int, v_max: float = 6.0):
        self.kernel_size = kernel_size
        self.stride = stride
        self.v_max = v_max

    def __call__(self, x):
        return fuzzy_pool(x, self.kernel_size, self.stride, self.v_max)
