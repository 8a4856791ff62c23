"""Opt-in production training knobs (beyond the reference, defaults off):
label smoothing (torch CE semantics), EMA of the params, cosine LR
schedule and linear warmup (train/state.py, train/loop.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from convkan_tpu.train.data import get_datasets
from convkan_tpu.train.loop import (make_eval_step, make_train_step,
                                    train_model_generic)
from convkan_tpu.train.metrics import cross_entropy_loss
from convkan_tpu.train.state import create_train_state, make_lr_schedule


def test_label_smoothing_matches_torch():
    import torch

    rng = np.random.default_rng(0)
    logits = rng.normal(size=(16, 10)).astype(np.float32)
    targets = rng.integers(0, 10, size=16)
    for ls in (0.0, 0.1, 0.3):
        ours = float(cross_entropy_loss(jnp.asarray(logits),
                                        jnp.asarray(targets),
                                        label_smoothing=ls))
        theirs = float(torch.nn.functional.cross_entropy(
            torch.from_numpy(logits), torch.from_numpy(targets),
            label_smoothing=ls))
        np.testing.assert_allclose(ours, theirs, rtol=1e-6)


def test_lr_schedule_shapes():
    spe = 10
    # default: the reference's staircase exponential — lr * gamma^epoch
    exp = make_lr_schedule(1e-3, 0.8, spe)
    for epoch in (0, 1, 5):
        np.testing.assert_allclose(float(exp(epoch * spe)),
                                   1e-3 * 0.8 ** epoch, rtol=1e-6)
        # staircase: constant within the epoch
        np.testing.assert_allclose(float(exp(epoch * spe + spe - 1)),
                                   1e-3 * 0.8 ** epoch, rtol=1e-6)
    # cosine: peak at the start, ~0 at the end, half at the midpoint
    cos = make_lr_schedule(1e-3, 0.8, spe, scheduler="cosine",
                           total_epochs=8)
    np.testing.assert_allclose(float(cos(0)), 1e-3, rtol=1e-6)
    np.testing.assert_allclose(float(cos(4 * spe)), 5e-4, rtol=1e-5)
    assert float(cos(8 * spe)) < 1e-9
    # warmup: linear 0 -> lr over the warmup epochs, then the main schedule
    wc = make_lr_schedule(1e-3, 0.8, spe, scheduler="cosine",
                          warmup_epochs=2, total_epochs=8)
    np.testing.assert_allclose(float(wc(0)), 0.0, atol=1e-12)
    np.testing.assert_allclose(float(wc(spe)), 5e-4, rtol=1e-5)
    np.testing.assert_allclose(float(wc(2 * spe)), 1e-3, rtol=1e-6)
    assert float(wc(8 * spe)) < float(wc(3 * spe))
    we = make_lr_schedule(1e-3, 0.8, spe, warmup_epochs=1)
    np.testing.assert_allclose(float(we(spe // 2)), 5e-4, rtol=1e-5)
    np.testing.assert_allclose(float(we(spe)), 1e-3, rtol=1e-6)
    with pytest.raises(ValueError):
        make_lr_schedule(1e-3, 0.8, spe, scheduler="cosine")  # no total
    with pytest.raises(ValueError):
        make_lr_schedule(1e-3, 0.8, spe, scheduler="nope")


def test_clip_grad_norm_wiring():
    """make_optimizer(clip_grad_norm>0) really clips before AdamW.

    Adam is scale-invariant for large gradients, so the observable is the
    epsilon regime: an absurdly small clip threshold shrinks the gradient
    until eps dominates and the update collapses toward zero, while the
    unclipped optimizer takes a full ~lr-sized step."""
    from convkan_tpu.train.state import make_optimizer

    params = {"w": jnp.ones((4,), jnp.float32)}
    grads = {"w": jnp.full((4,), 3.0, jnp.float32)}

    def step_delta(tx):
        opt_state = tx.init(params)
        updates, _ = tx.update(grads, opt_state, params)
        return float(jnp.max(jnp.abs(updates["w"])))

    free = step_delta(make_optimizer(1e-3, 0.0, 0.8, 1))
    clipped = step_delta(make_optimizer(1e-3, 0.0, 0.8, 1,
                                        clip_grad_norm=1e-12))
    assert free > 1e-4          # full Adam step ~ lr
    assert clipped < free * 1e-2  # eps-dominated: update collapses
    # threshold above the gradient norm: clipping is a no-op
    noop = step_delta(make_optimizer(1e-3, 0.0, 0.8, 1,
                                     clip_grad_norm=1e6))
    np.testing.assert_allclose(noop, free, rtol=1e-6)


def _tiny_mlp():
    from convkan_tpu.factory.mlp_factory import MLP_KAN_FACTORY

    return MLP_KAN_FACTORY["FastKAN"]([784, 16, 10])


def test_ema_tracks_param_trajectory():
    """state.ema_params equals the hand-computed EMA of the param
    trajectory produced by the same steps."""
    train_ds, _, _ = get_datasets("MNIST", synthetic=True,
                                  synthetic_size=128)
    model = _tiny_mlp()
    x0 = jnp.zeros((16, 28, 28, 1), jnp.float32)
    decay = 0.5
    state = create_train_state(model, jax.random.PRNGKey(0), x0,
                               ema_decay=decay)
    assert state.ema_params is not None
    step = make_train_step(model, "MNIST", augment=False, ema_decay=decay)
    rng = jax.random.PRNGKey(1)

    manual = jax.tree_util.tree_map(np.asarray, state.params)
    xb = train_ds.images[:16]
    yb = train_ds.labels[:16]
    for _ in range(3):
        state, _ = step(state, rng, xb, yb)
        manual = jax.tree_util.tree_map(
            lambda e, p: e * decay + np.asarray(p) * (1 - decay),
            manual, state.params)
    jax.tree_util.tree_map(
        lambda m, e: np.testing.assert_allclose(m, np.asarray(e),
                                                rtol=1e-5, atol=1e-7),
        manual, state.ema_params)
    # the EMA lags the raw params after updates
    diffs = jax.tree_util.tree_map(
        lambda p, e: float(np.max(np.abs(np.asarray(p) - np.asarray(e)))),
        state.params, state.ema_params)
    assert max(jax.tree_util.tree_leaves(diffs)) > 0


def test_eval_step_use_ema():
    """use_ema=True evaluates with the EMA weights, not the live params."""
    train_ds, test_ds, _ = get_datasets("MNIST", synthetic=True,
                                        synthetic_size=128)
    model = _tiny_mlp()
    x0 = jnp.zeros((16, 28, 28, 1), jnp.float32)
    state = create_train_state(model, jax.random.PRNGKey(0), x0,
                               ema_decay=0.9)
    # make the live params garbage while the EMA stays at init
    state = state.replace(params=jax.tree_util.tree_map(
        lambda p: p + 1e3, state.params))
    ev_raw = make_eval_step(model, "MNIST", 10)
    ev_ema = make_eval_step(model, "MNIST", 10, use_ema=True)
    xb = test_ds.images[:16]
    yb = test_ds.labels[:16]
    w = jnp.ones(16, jnp.float32)
    loss_raw, _ = ev_raw(state, xb, yb, w)
    loss_ema, _ = ev_ema(state, xb, yb, w)
    assert np.isfinite(float(loss_ema))
    assert float(loss_ema) < float(loss_raw)


def test_ema_checkpoint_roundtrip(tmp_path):
    from convkan_tpu.train import checkpoint as ckpt_lib

    model = _tiny_mlp()
    x0 = jnp.zeros((4, 28, 28, 1), jnp.float32)
    state = create_train_state(model, jax.random.PRNGKey(0), x0,
                               ema_decay=0.9)
    state = state.replace(ema_params=jax.tree_util.tree_map(
        lambda p: p * 2.0 + 1.0, state.params))
    ckpt_lib.save_checkpoint(str(tmp_path), "m", "last", state)
    template = create_train_state(model, jax.random.PRNGKey(7), x0,
                                  ema_decay=0.9)
    restored, _ = ckpt_lib.restore_checkpoint(str(tmp_path), "m", "last",
                                              template)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a),
                                                   np.asarray(b)),
        state.ema_params, restored.ema_params)
    # non-EMA checkpoints restore into non-EMA templates unchanged
    state2 = create_train_state(model, jax.random.PRNGKey(0), x0)
    ckpt_lib.save_checkpoint(str(tmp_path), "m2", "last", state2)
    r2, _ = ckpt_lib.restore_checkpoint(str(tmp_path), "m2", "last", state2)
    assert r2.ema_params is None
    # resuming an EMA checkpoint with EMA OFF must drop the stale EMA
    # tree (it would stop updating yet be preferred by serving)
    r3, _ = ckpt_lib.restore_checkpoint(str(tmp_path), "m", "last", state2)
    assert r3.ema_params is None
    # resuming with a different optimizer structure (clip on/off) fails
    # with a message naming the flags, not a bare flax tree error
    state3 = create_train_state(model, jax.random.PRNGKey(0), x0,
                                clip_grad_norm=1.0)
    with pytest.raises(ValueError, match="same optimizer configuration"):
        ckpt_lib.restore_checkpoint(str(tmp_path), "m2", "last", state3)
    # enabling EMA on resume from a NON-EMA checkpoint seeds the EMA from
    # the restored (trained) params — NOT from the template's fresh random
    # init, which decay 0.999 would keep mostly-random for hundreds of
    # steps, corrupting eval/best-selection/serving
    template4 = create_train_state(model, jax.random.PRNGKey(99), x0,
                                   ema_decay=0.9)
    r4, _ = ckpt_lib.restore_checkpoint(str(tmp_path), "m2", "last",
                                        template4)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a),
                                                   np.asarray(b)),
        r4.ema_params, r4.params)


def test_train_generic_with_knobs(tmp_path):
    """The full epoch loop under EMA + cosine/warmup + smoothing: finite
    losses, lr history follows the cosine curve, checkpoints carry EMA."""
    from convkan_tpu.train import checkpoint as ckpt_lib

    train_ds, test_ds, _ = get_datasets("MNIST", synthetic=True,
                                        synthetic_size=128)
    model = _tiny_mlp()
    state, history = train_model_generic(
        model, train_ds, test_ds, "MNIST", 10, batch_size=32, epochs=3,
        path=str(tmp_path), model_name="knobs", label_smoothing=0.1,
        ema_decay=0.5, scheduler="cosine", warmup_epochs=1,
        clip_grad_norm=1.0, learning_rate=1e-3)
    assert np.isfinite(history["train_loss"]).all()
    # warmup epoch starts at lr 0; epoch 1 is the cosine peak; decays after
    np.testing.assert_allclose(history["lr"][0], 0.0, atol=1e-12)
    np.testing.assert_allclose(history["lr"][1], 1e-3, rtol=1e-6)
    assert history["lr"][2] < history["lr"][1]
    payload = ckpt_lib.restore_checkpoint(str(tmp_path), "knobs", "last")
    assert "ema_params" in payload

    # the per-epoch CSV records the lr trajectory (meaningful now that
    # schedules vary)
    import csv

    from convkan_tpu.train.loop import write_results_csv

    csv_path = str(tmp_path / "hist.csv")
    write_results_csv(csv_path, "knobs", history)
    with open(csv_path) as f:
        rows = list(csv.DictReader(f))
    np.testing.assert_allclose([float(r["lr"]) for r in rows],
                               history["lr"], rtol=1e-6)
