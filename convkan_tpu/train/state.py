"""Train state and optimizer — AdamW + per-epoch ExponentialLR + CE loss,
matching generic_train.py:24-26, implemented with optax.

TPU-first details:
  * the LR schedule is a staircase exponential keyed on the *step* count
    with steps_per_epoch, reproducing torch's per-epoch scheduler.step();
  * torch AdamW parity: b1=0.9, b2=0.999, eps=1e-8, decoupled wd.
"""

from __future__ import annotations

from typing import Any, Optional

import flax
import jax
import jax.numpy as jnp
import optax


class TrainState(flax.struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    opt_state: Any
    batch_stats: Any
    tx: optax.GradientTransformation = flax.struct.field(pytree_node=False)

    def apply_gradients(self, grads, new_batch_stats=None):
        updates, new_opt = self.tx.update(grads, self.opt_state, self.params)
        new_params = optax.apply_updates(self.params, updates)
        return self.replace(
            step=self.step + 1,
            params=new_params,
            opt_state=new_opt,
            batch_stats=(new_batch_stats if new_batch_stats is not None
                         else self.batch_stats),
        )


def make_optimizer(learning_rate: float, weight_decay: float, gamma: float,
                   steps_per_epoch: int) -> optax.GradientTransformation:
    """AdamW(lr, wd) + ExponentialLR(gamma) stepped per epoch
    (generic_train.py:24-25)."""
    schedule = optax.exponential_decay(
        init_value=learning_rate,
        transition_steps=max(steps_per_epoch, 1),
        decay_rate=gamma,
        staircase=True,
    )
    return optax.adamw(schedule, b1=0.9, b2=0.999, eps=1e-8,
                       weight_decay=weight_decay)


def create_train_state(model, rng, sample_input, learning_rate=1e-3,
                       weight_decay=1e-3, gamma=0.8, steps_per_epoch=1,
                       train: bool = False) -> TrainState:
    # init under jit: eager per-op dispatch is orders of magnitude slower
    # than one compiled program (especially over the remote-TPU tunnel)
    variables = jax.jit(
        lambda r, x: model.init({"params": r}, x, train=train)
    )(rng, sample_input)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    tx = make_optimizer(learning_rate, weight_decay, gamma, steps_per_epoch)
    opt_state = jax.jit(tx.init)(params)
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        opt_state=opt_state,
        batch_stats=batch_stats,
        tx=tx,
    )


def l1_penalty(params, decay: float):
    """Explicit L1 loss term — single implementation lives in
    utils/regularization.py (this alias keeps loop.py's import site).
    The reference's L1 wrapper hook is effectively inert; we expose true
    L1 as an opt-in loss term instead."""
    from ..utils.regularization import l1_penalty as _l1

    return _l1(params, decay)
