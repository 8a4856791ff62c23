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

import flax.linen as nn
import jax
import jax.numpy as jnp


class L1(nn.Module):
    """Per-layer L1 wrapper — working equivalent of the reference's
    ``L1(module, weight_decay)`` (utils/regularization.py:57-113).

    Wraps one layer and sows ``weight_decay * sum(|p|)`` over *that
    layer's* parameters into the ``losses`` collection; the training loop
    adds every sown value to the loss (train/loop.py), so `l1_decay` on one
    factory-built layer penalizes only that layer.  (The reference's hook
    writes grads only when they are already zero/None — effectively inert;
    we implement the interface's evident intent and document the deviation
    in PARITY.md.)

    Like the reference wrapper, this nests the wrapped module's parameters
    one level deeper ('layer/...' here, 'module.' in the torch state
    dict)."""

    layer: nn.Module
    weight_decay: float

    @nn.compact
    def __call__(self, x, *args, **kwargs):
        y = self.layer(x, *args, **kwargs)
        if self.weight_decay and self.weight_decay > 0:
            # read from the bound child: if the wrapped layer was
            # constructed inside an enclosing @compact, flax adopts it into
            # the *enclosing* scope, so self.variables would be empty here
            params = self.layer.variables.get("params", {})
            pen = self.weight_decay * sum(
                jnp.sum(jnp.abs(p))
                for p in jax.tree_util.tree_leaves(params))
            self.sow("losses", "l1_penalty", pen)
        return y


class L2(nn.Module):
    """Per-layer L2 wrapper (utils/regularization.py:116-159) — same
    mechanics as :class:`L1` with a squared-norm penalty."""

    layer: nn.Module
    weight_decay: float

    @nn.compact
    def __call__(self, x, *args, **kwargs):
        y = self.layer(x, *args, **kwargs)
        if self.weight_decay and self.weight_decay > 0:
            # read from the bound child: if the wrapped layer was
            # constructed inside an enclosing @compact, flax adopts it into
            # the *enclosing* scope, so self.variables would be empty here
            params = self.layer.variables.get("params", {})
            pen = self.weight_decay * sum(
                jnp.sum(jnp.square(p))
                for p in jax.tree_util.tree_leaves(params))
            self.sow("losses", "l2_penalty", pen)
        return y


def sown_losses_total(mutated_variables) -> Any:
    """Sum every penalty sown into the 'losses' collection (0.0 if none)."""
    tree = mutated_variables.get("losses", {}) if isinstance(
        mutated_variables, dict) else {}
    leaves = jax.tree_util.tree_leaves(tree)
    if not leaves:
        return 0.0
    return sum(jnp.sum(v) for v in leaves)


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
