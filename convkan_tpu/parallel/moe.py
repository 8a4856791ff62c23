"""Mixture-of-KAN-experts with expert parallelism over an 'expert' axis.

Beyond-reference capacity scaling (the reference is single-device and
dense — SURVEY.md §2.5): a `KanMoE` layer routes each token to one of E
identical KAN-linear experts (Switch-style top-1 routing with a capacity
buffer) and the experts' stacked parameters shard over an 'expert' mesh
axis, so total parameter count scales with the mesh while per-token FLOPs
stay constant.

TPU-first mechanics (GShard dense-dispatch, not data-dependent gather):
routing is expressed as two einsums against a one-hot dispatch tensor
[tokens, experts, capacity] — static shapes, MXU-friendly, no dynamic
control flow — and the expert-stacked activations carry a
`with_sharding_constraint(P('expert', …))`, so under `jit` XLA's SPMD
partitioner places each expert's slice on its own device and inserts the
all-to-all pair around the expert computation.  Tokens routed past an
expert's capacity are dropped (contribute zero output — Switch
semantics); the sown load-balance auxiliary loss pushes the router toward
uniform expert utilisation and is consumed by the training loss through
the same 'losses' collection as the L1/L2 wrappers
(utils/regularization.sown_losses_total, train/loop.py).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Mapping, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_expert_mesh(expert: int, data: Optional[int] = None,
                     devices: Optional[Sequence] = None) -> Mesh:
    """A ('data', 'expert') mesh: batch over 'data', experts over
    'expert'."""
    from .sharding import make_stacked_axis_mesh

    return make_stacked_axis_mesh("expert", expert, data=data,
                                  devices=devices)


def expert_state_shardings(tree, mesh: Mesh, expert_axis: str = "expert"):
    """NamedSharding pytree: every leaf on a path through an 'experts' key
    shards its leading expert axis over `expert_axis` (params and the
    optimizer moments that mirror them); everything else replicates."""
    from .sharding import stacked_state_shardings

    return stacked_state_shardings(tree, mesh, expert_axis, "experts")


class KanMoE(nn.Module):
    """Switch-style top-1 mixture of identical KAN-linear experts.

    Families are the `MLP_KAN_FACTORY` keys (nn/mlp._build_layer
    vocabulary).  `capacity_factor` sizes each expert's token buffer as
    ceil(tokens/E · factor); overflow tokens are dropped (zero output).
    With `mesh=None` the same dense-dispatch math runs unsharded — the
    numerical oracle for the expert-parallel tests (the dispatch einsums
    are sharding-invariant, so the two agree exactly).

    Serving note: whenever the capacity bound binds, a Switch layer's
    per-token output depends on the rest of the batch (which tokens claim
    slots first).  The HTTP engine's padding and dynamic batching change
    that composition — padded rows append AFTER real rows and raise the
    cap (cap = ceil(B/E·factor)), so they never evict a real token, but
    they can *rescue* one that an unpadded batch would have dropped, and
    coalesced concurrent requests shift slot order — so the same input
    can return different logits under different traffic.  For
    deterministic serving raise `capacity_factor` (≥ E guarantees no
    token ever drops, at E× the layer's activation memory)."""

    family: str
    in_dim: int
    out_dim: int
    n_experts: int
    capacity_factor: float = 1.25
    aux_weight: float = 1e-2
    router_noise: float = 0.0  # stddev of train-time router logit noise
    cfg: Mapping[str, Any] = dataclasses.field(default_factory=dict)
    mesh: Optional[Mesh] = None
    expert_axis: str = "expert"

    @nn.compact
    def __call__(self, x, train: bool = True):
        from ..nn.mlp import _build_layer

        e = self.n_experts
        b = x.shape[0]
        cap = max(1, math.ceil(b / e * self.capacity_factor))

        logits = nn.Dense(e, use_bias=False, name="router")(x)
        if train and self.router_noise > 0:
            rng = self.make_rng("dropout")
            logits = logits + self.router_noise * jax.random.normal(
                rng, logits.shape, logits.dtype)
        probs = jax.nn.softmax(logits, axis=-1)            # [B, E]
        gate = jnp.max(probs, axis=-1)                      # [B]
        onehot = jax.nn.one_hot(jnp.argmax(probs, -1), e,
                                dtype=x.dtype)              # [B, E]

        # Switch load-balance aux: E * sum_e fraction_routed_e * mean_prob_e
        # (minimised at uniform routing); sown into the 'losses' collection
        # the training loss already consumes
        aux = e * jnp.sum(jnp.mean(onehot, axis=0) * jnp.mean(probs, axis=0))
        if self.aux_weight > 0 and not self.is_initializing():
            # (guarded: sowing during init would leave a stale entry in
            # the returned variables that double-counts on the next apply)
            self.sow("losses", "moe_aux", self.aux_weight * aux)

        # position of each token inside its expert's buffer (cumsum over
        # the batch — deterministic, order-dependent like the reference
        # Switch implementation); tokens past capacity are dropped
        pos = jnp.cumsum(onehot, axis=0) * onehot           # 1-based, [B, E]
        # one_hot is zero outside [0, cap): pos=0 (not routed here) maps to
        # index -1 and pos>cap (overflow) to index>=cap, both all-zero rows
        # — the capacity drop falls out of the one_hot bounds
        dispatch = jax.nn.one_hot(pos.astype(jnp.int32) - 1, cap,
                                  dtype=x.dtype)            # [B, E, C]

        xin = jnp.einsum("bec,bd->ecd", dispatch, x)        # [E, C, din]
        if self.mesh is not None:
            xin = jax.lax.with_sharding_constraint(
                xin, NamedSharding(self.mesh, P(self.expert_axis)))

        expert = _build_layer(self.family, self.in_dim, self.out_dim,
                              self.cfg)

        def init_experts(rng):
            keys = jax.random.split(rng, e)
            dummy = jnp.zeros((1, self.in_dim), jnp.float32)
            return jax.vmap(
                lambda k: expert.init(k, dummy, train=False)["params"])(keys)

        stacked = self.param("experts", init_experts)

        yout = jax.vmap(
            lambda p, h: expert.apply({"params": p}, h, train=False)
        )(stacked, xin)                                     # [E, C, dout]
        if self.mesh is not None:
            yout = jax.lax.with_sharding_constraint(
                yout, NamedSharding(self.mesh, P(self.expert_axis)))

        combine = dispatch * gate[:, None, None]
        return jnp.einsum("bec,ecd->bd", combine, yout)     # [B, dout]


class MoEKanMLP(nn.Module):
    """Sparse-capacity KAN classifier: flatten → embed KAN layer →
    `n_blocks` residual mixture-of-KAN-experts blocks → dense head.

    Residual blocks keep capacity-dropped tokens alive (they pass through
    unchanged — standard Switch practice).  Trains through the generic
    harness unchanged: `train/loop.make_train_step` applies models with
    `mutable=['losses']` and adds `sown_losses_total`, which picks up each
    block's load-balance aux term exactly like the L1/L2 wrappers'."""

    family: str
    in_dim: int
    hidden: int
    num_classes: int
    n_experts: int = 4
    n_blocks: int = 2
    capacity_factor: float = 1.25
    aux_weight: float = 1e-2
    cfg: Mapping[str, Any] = dataclasses.field(default_factory=dict)
    mesh: Optional[Mesh] = None
    expert_axis: str = "expert"

    @property
    def model_name(self) -> str:
        # the reference's `model.name` checkpoint-naming contract
        return (f"MoEKanMLP_{self.family.upper()}_e{self.n_experts}"
                f"x{self.n_blocks}_h{self.hidden}")

    @nn.compact
    def __call__(self, x, train: bool = True):
        from ..nn.mlp import _build_layer

        if x.ndim > 2:
            x = x.reshape(x.shape[0], -1)
        x = _build_layer(self.family, self.in_dim, self.hidden,
                         self.cfg)(x, train=train)
        for _ in range(self.n_blocks):
            x = x + KanMoE(
                family=self.family, in_dim=self.hidden, out_dim=self.hidden,
                n_experts=self.n_experts,
                capacity_factor=self.capacity_factor,
                aux_weight=self.aux_weight, cfg=self.cfg,
                mesh=self.mesh, expert_axis=self.expert_axis)(x, train=train)
        return nn.Dense(self.num_classes)(x)
