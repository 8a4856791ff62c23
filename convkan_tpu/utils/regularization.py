"""Regularization components — parity with utils/regularization.py.

The reference ships:
  * L1/L2 "weight decay" wrappers whose backward hook only writes a grad
    when the true grad is zero/None (utils/regularization.py:76-86) —
    effectively inert during normal training.  We expose the same names as
    explicit, *working* penalty terms (opt-in via the loss), plus
    `reference_semantics=True` to reproduce the inert behavior (no-op).
  * NoiseInjection / NoiseMultiplicativeInjection (:8-54) — training-time
    noise masks (unused by the reference models, kept for API parity).
  * SmoothnessRegularization / SegmentDeactivation (:163-314) — dead code
    in the reference (they reference an efficient-kan API that no layer
    defines; SURVEY.md §2.1).  We provide working equivalents against our
    KANLinear parameterization.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp


def l1_penalty(params, weight_decay: float, reference_semantics: bool = False):
    """Sum of |w| over a pytree.  With reference_semantics=True this
    returns 0 — the reference's hook almost never fires."""
    if weight_decay <= 0 or reference_semantics:
        return 0.0
    return weight_decay * sum(
        jnp.sum(jnp.abs(p)) for p in jax.tree_util.tree_leaves(params))


def l2_penalty(params, weight_decay: float, reference_semantics: bool = False):
    if weight_decay <= 0 or reference_semantics:
        return 0.0
    return weight_decay * sum(
        jnp.sum(jnp.square(p)) for p in jax.tree_util.tree_leaves(params))


# Back-compat aliases for the reference's wrapper names
L1 = l1_penalty
L2 = l2_penalty


def noise_injection(rng, x, p: float = 0.0, alpha: float = 0.05,
                    train: bool = True):
    """utils/regularization.py:8-26: additive gaussian noise scaled by the
    per-channel std, gated by a Bernoulli(p) mask, train-time only."""
    if not train or p <= 0:
        return x
    rng_mask, rng_noise = jax.random.split(rng)
    dims = tuple(i for i in range(x.ndim) if i != x.ndim - 1)
    std = jnp.std(x, axis=dims, keepdims=True)
    noise = jax.random.normal(rng_noise, x.shape, x.dtype) * std
    mask = (jax.random.uniform(rng_mask, x.shape) < p).astype(x.dtype)
    return x + alpha * mask * noise


def noise_multiplicative_injection(rng, x, p: float = 0.05,
                                   alpha: float = 0.05, betta: float = 0.01,
                                   train: bool = True):
    """utils/regularization.py:29-54."""
    if not train or p <= 0:
        return x
    r1, r2, r3, r4 = jax.random.split(rng, 4)
    dims = tuple(i for i in range(x.ndim) if i != x.ndim - 1)
    std = jnp.std(x, axis=dims, keepdims=True)
    noise = jax.random.normal(r1, x.shape, x.dtype) * std
    m_noise = jax.random.normal(r2, x.shape, x.dtype) * betta + 1
    mask = (jax.random.uniform(r3, x.shape) < p).astype(x.dtype)
    mask_m = (jax.random.uniform(r4, x.shape) < p).astype(x.dtype)
    return x + x * mask_m * m_noise + alpha * mask * noise


def smoothness_penalty(spline_w, input_dim: int, num_basis: int,
                       lambda_smooth: float):
    """Second-difference penalty on spline coefficients — the working
    equivalent of SmoothnessRegularization (utils/regularization.py:163-199)
    for our KANLinear `spline_w` of shape (input_dim*num_basis, output_dim)
    (channel-major: per input feature, num_basis contiguous coeffs)."""
    if lambda_smooth <= 0:
        return 0.0
    w = spline_w.reshape(input_dim, num_basis, -1)
    diff2 = w[:, 2:, :] - 2 * w[:, 1:-1, :] + w[:, :-2, :]
    # reference sums diff2 * 2 (:196) — not squared; replicate
    return lambda_smooth * jnp.sum(diff2 * 2)


def segment_deactivation_mask(rng, out_features: int, in_features: int,
                              p_deactivate: float):
    """Per-(out,in) Bernoulli mask for SegmentDeactivation-style spline
    dropout (utils/regularization.py:205-308): with probability p the
    spline edge (i->j) is replaced by its linear chord.  Returns the
    boolean deactivation mask; the layer applies the replacement."""
    return jax.random.uniform(rng, (out_features, in_features)) < p_deactivate
