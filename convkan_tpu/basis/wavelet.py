"""Mother wavelets for WavKAN.

Reproduces layers/wav_kan_layers.py:145-190 — mexican_hat, morlet (ω0=5),
DoG, Meyer (ν-polynomial auxiliary), and Shannon (sinc × Hamming window over
the *input-channel* axis, a documented reference quirk).
"""

from __future__ import annotations

import math

import numpy as np
import jax.numpy as jnp

WAVELET_TYPES = ("mexican_hat", "morlet", "dog", "meyer", "shannon")


def _mexican_hat(x):
    term1 = jnp.square(x) - 1.0
    term2 = jnp.exp(-0.5 * jnp.square(x))
    return (2.0 / (math.sqrt(3.0) * math.pi**0.25)) * term1 * term2


def _morlet(x):
    omega0 = 5.0
    return jnp.exp(-0.5 * jnp.square(x)) * jnp.cos(omega0 * x)


def _dog(x):
    return -x * jnp.exp(-0.5 * jnp.square(x))


def _nu(t):
    return t**4 * (35 - 84 * t + 70 * t**2 - 20 * t**3)


def _meyer(x):
    v = jnp.abs(x)
    pi = math.pi
    aux = jnp.where(
        v <= 0.5,
        jnp.ones_like(v),
        jnp.where(v >= 1.0, jnp.zeros_like(v), jnp.cos(pi / 2 * _nu(2 * v - 1))),
    )
    return jnp.sin(pi * v) * aux


def _sinc(x):
    # torch.sinc(x) = sin(pi x)/(pi x); the reference calls torch.sinc(x/pi)
    # which equals sin(x)/x.
    return jnp.sinc(x)


def hamming_window(n: int):
    """torch.hamming_window(n, periodic=False) parity (computed in f64;
    torch computes in the runtime dtype — equal to 1 ulp in f32)."""
    if n == 1:
        return np.ones(1, dtype=np.float64)
    i = np.arange(n, dtype=np.float64)
    return 0.54 - 0.46 * np.cos(2.0 * math.pi * i / (n - 1))


def shannon(x, channel_axis: int):
    """Shannon wavelet: sinc(x/pi) windowed by a Hamming window laid out
    along `channel_axis` (wav_kan_layers.py:180-190)."""
    n = x.shape[channel_axis]
    w = jnp.asarray(hamming_window(n)).astype(x.dtype)
    shape = [1] * x.ndim
    shape[channel_axis] = n
    return _sinc(x / math.pi) * w.reshape(shape)


def wavelet(x, wavelet_type: str, channel_axis: int = None):
    if wavelet_type == "mexican_hat":
        return _mexican_hat(x)
    if wavelet_type == "morlet":
        return _morlet(x)
    if wavelet_type == "dog":
        return _dog(x)
    if wavelet_type == "meyer":
        return _meyer(x)
    if wavelet_type == "shannon":
        assert channel_axis is not None
        return shannon(x, channel_axis)
    raise ValueError(f"Unsupported wavelet type: {wavelet_type}")
