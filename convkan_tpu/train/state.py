"""Train state and optimizer — AdamW + per-epoch ExponentialLR + CE loss,
matching generic_train.py:24-26, implemented with optax.

TPU-first details:
  * the LR schedule is a staircase exponential keyed on the *step* count
    with steps_per_epoch, reproducing torch's per-epoch scheduler.step();
  * torch AdamW parity: b1=0.9, b2=0.999, eps=1e-8, decoupled wd.

Beyond the reference (opt-in, defaults reproduce generic_train.py
exactly): a cosine LR schedule, linear warmup epochs, and an EMA of the
parameters (`ema_decay`) — the standard production recipe for the
EfficientNet/MobileNet end of the model zoo.
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
    # exponential moving average of params (None unless ema_decay > 0);
    # updated inside the jitted train step, evaluated/served in place of
    # params when present
    ema_params: Any = None

    def apply_gradients(self, grads, new_batch_stats=None,
                        ema_decay: Optional[float] = None):
        updates, new_opt = self.tx.update(grads, self.opt_state, self.params)
        new_params = optax.apply_updates(self.params, updates)
        new_ema = self.ema_params
        if new_ema is not None and ema_decay:
            d = jnp.asarray(ema_decay, jnp.float32)
            new_ema = jax.tree_util.tree_map(
                lambda e, p: e * d + p.astype(e.dtype) * (1.0 - d),
                new_ema, new_params)
        return self.replace(
            step=self.step + 1,
            params=new_params,
            opt_state=new_opt,
            batch_stats=(new_batch_stats if new_batch_stats is not None
                         else self.batch_stats),
            ema_params=new_ema,
        )


def make_lr_schedule(learning_rate: float, gamma: float,
                     steps_per_epoch: int, scheduler: str = "exponential",
                     warmup_epochs: int = 0,
                     total_epochs: Optional[int] = None):
    """Step-keyed LR schedule.

    scheduler='exponential' (default): the reference's per-epoch staircase
    ExponentialLR (generic_train.py:25) — lr * gamma^epoch.
    scheduler='cosine': cosine decay from lr to 0 over total_epochs.
    warmup_epochs > 0 prepends a linear 0 -> lr ramp (either scheduler).
    """
    spe = max(steps_per_epoch, 1)
    if scheduler == "exponential":
        main = optax.exponential_decay(
            init_value=learning_rate, transition_steps=spe,
            decay_rate=gamma, staircase=True)
    elif scheduler == "cosine":
        if total_epochs is None:
            raise ValueError("scheduler='cosine' needs total_epochs")
        decay_steps = max((total_epochs - warmup_epochs) * spe, 1)
        main = optax.cosine_decay_schedule(
            init_value=learning_rate, decay_steps=decay_steps)
    else:
        raise ValueError(f"unknown scheduler {scheduler!r} "
                         "(exponential | cosine)")
    if warmup_epochs <= 0:
        return main
    ws = warmup_epochs * spe
    warmup = optax.linear_schedule(0.0, learning_rate, ws)
    return optax.join_schedules([warmup, main], [ws])


def make_optimizer(learning_rate: float, weight_decay: float, gamma: float,
                   steps_per_epoch: int, scheduler: str = "exponential",
                   warmup_epochs: int = 0,
                   total_epochs: Optional[int] = None,
                   clip_grad_norm: float = 0.0
                   ) -> optax.GradientTransformation:
    """AdamW(lr, wd) + the configured LR schedule (default: ExponentialLR
    stepped per epoch, generic_train.py:24-25).  clip_grad_norm > 0
    prepends global-norm gradient clipping (torch
    clip_grad_norm_ semantics; beyond-reference, default off)."""
    schedule = make_lr_schedule(learning_rate, gamma, steps_per_epoch,
                                scheduler, warmup_epochs, total_epochs)
    adamw = optax.adamw(schedule, b1=0.9, b2=0.999, eps=1e-8,
                        weight_decay=weight_decay)
    if clip_grad_norm > 0:
        return optax.chain(optax.clip_by_global_norm(clip_grad_norm), adamw)
    return adamw


def create_train_state(model, rng, sample_input, learning_rate=1e-3,
                       weight_decay=1e-3, gamma=0.8, steps_per_epoch=1,
                       train: bool = False, scheduler: str = "exponential",
                       warmup_epochs: int = 0,
                       total_epochs: Optional[int] = None,
                       ema_decay: float = 0.0,
                       clip_grad_norm: float = 0.0) -> TrainState:
    # init under jit: eager per-op dispatch is orders of magnitude slower
    # than one compiled program (especially over the remote-TPU tunnel)
    variables = jax.jit(
        lambda r, x: model.init({"params": r}, x, train=train)
    )(rng, sample_input)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    tx = make_optimizer(learning_rate, weight_decay, gamma, steps_per_epoch,
                        scheduler, warmup_epochs, total_epochs,
                        clip_grad_norm=clip_grad_norm)
    opt_state = jax.jit(tx.init)(params)
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        opt_state=opt_state,
        batch_stats=batch_stats,
        tx=tx,
        ema_params=(jax.tree_util.tree_map(jnp.copy, params)
                    if ema_decay > 0 else None),
    )


def l1_penalty(params, decay: float):
    """Explicit L1 loss term — single implementation lives in
    utils/regularization.py (this alias keeps loop.py's import site).
    The reference's L1 wrapper hook is effectively inert; we expose true
    L1 as an opt-in loss term instead."""
    from ..utils.regularization import l1_penalty as _l1

    return _l1(params, decay)
