"""Mixture-of-KAN-experts + expert parallelism (parallel/moe.py) —
beyond-reference.  The dense-dispatch einsums are sharding-invariant, so
the unsharded layer is the exact oracle for the expert-parallel run."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest
from jax.sharding import PartitionSpec as P

from convkan_tpu.nn.mlp import _build_layer
from convkan_tpu.parallel.moe import (
    KanMoE, expert_state_shardings, make_expert_mesh)
from convkan_tpu.utils.regularization import sown_losses_total


def _layer(mesh=None, **kw):
    base = dict(family="ChebyKAN", in_dim=16, out_dim=8, n_experts=4,
                capacity_factor=4.0)
    base.update(kw)
    return KanMoE(**base, mesh=mesh)


def test_moe_per_token_oracle():
    """Ample capacity: every token's output equals gate * its argmax
    expert applied alone (numpy per-token loop)."""
    moe = _layer()
    x = jax.random.normal(jax.random.PRNGKey(1), (32, 16))
    v = moe.init(jax.random.PRNGKey(0), x, train=False)
    y = moe.apply(v, x, train=False)

    probs = np.asarray(
        jax.nn.softmax(x @ v["params"]["router"]["kernel"]))
    eidx, gate = probs.argmax(-1), probs.max(-1)
    expert = _build_layer("ChebyKAN", 16, 8, {})
    want = np.zeros((32, 8), np.float32)
    for i in range(32):
        p_i = jax.tree.map(lambda a: a[eidx[i]], v["params"]["experts"])
        want[i] = gate[i] * np.asarray(
            expert.apply({"params": p_i}, x[i:i + 1], train=False))[0]
    np.testing.assert_allclose(np.asarray(y), want, rtol=1e-4, atol=1e-5)


def test_moe_expert_parallel_parity_and_shards():
    """('data','expert') mesh: stacked expert params (and einsum
    activations) shard over 'expert'; output matches the dense run
    exactly, and each device holds 1/4 of an expert leaf."""
    mesh = make_expert_mesh(expert=4, data=2)
    dense, moe = _layer(), _layer(mesh=mesh)
    x = jax.random.normal(jax.random.PRNGKey(1), (32, 16))
    v = dense.init(jax.random.PRNGKey(0), x, train=False)
    y0 = dense.apply(v, x, train=False)

    sh = expert_state_shardings(v["params"], mesh)
    params = jax.device_put(v["params"], sh)
    y1 = jax.jit(lambda p, x: moe.apply({"params": p}, x, train=False))(
        params, x)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y0),
                               rtol=1e-5, atol=1e-6)

    exp_leaves = [
        l for path, l in jax.tree_util.tree_leaves_with_path(params)
        if any(getattr(k, "key", None) == "experts" for k in path)]
    assert exp_leaves
    for leaf in exp_leaves:
        assert leaf.addressable_shards[0].data.shape[0] == leaf.shape[0] // 4


def test_moe_capacity_drops_overflow_tokens():
    """capacity_factor small enough for a 1-slot buffer: with every token
    routed to the same expert, only the first contributes; the rest output
    exactly zero (Switch drop semantics)."""
    moe = KanMoE(family="ChebyKAN", in_dim=4, out_dim=4, n_experts=4,
                 capacity_factor=0.25)  # cap = ceil(8/4 * 0.25) = 1
    x = jnp.tile(jnp.array([[1.0, -0.5, 0.25, 2.0]]), (8, 1))
    v = moe.init(jax.random.PRNGKey(0), x, train=False)
    y = np.asarray(moe.apply(v, x, train=False))
    # identical tokens -> identical routing -> one expert, one slot
    assert np.abs(y[0]).sum() > 0
    np.testing.assert_array_equal(y[1:], 0.0)


def test_moe_aux_loss_sown_and_uniformity():
    """The load-balance aux lands in the 'losses' collection the training
    loss consumes; its value is aux_weight * E * sum(f_e p_e), equal to
    aux_weight at perfectly uniform routing and larger when collapsed."""
    moe = _layer(aux_weight=0.5)
    x = jax.random.normal(jax.random.PRNGKey(1), (64, 16))
    v = moe.init(jax.random.PRNGKey(0), x, train=False)
    _, mut = moe.apply(v, x, train=False, mutable=["losses"])
    aux = float(sown_losses_total(mut))
    assert aux > 0
    # collapsed routing (identical tokens) maximizes the product term
    x1 = jnp.tile(x[:1], (64, 1))
    _, mut1 = moe.apply(v, x1, train=False, mutable=["losses"])
    assert float(sown_losses_total(mut1)) > aux
    # exact value check against the Switch formula computed in numpy
    probs = np.asarray(jax.nn.softmax(x @ v["params"]["router"]["kernel"]))
    f = np.bincount(probs.argmax(-1), minlength=4) / len(probs)
    want = 0.5 * 4 * float((f * probs.mean(0)).sum())
    np.testing.assert_allclose(aux, want, rtol=1e-5)


def test_moe_training_parity_sharded_vs_dense():
    """3 AdamW steps (CE + sown aux) with experts and moments sharded over
    'expert' match the unsharded dense run's loss trajectory."""
    mesh = make_expert_mesh(expert=4, data=2)
    dense, moe = _layer(), _layer(mesh=mesh)
    x = jax.random.normal(jax.random.PRNGKey(1), (32, 16))
    y = jax.random.randint(jax.random.PRNGKey(2), (32,), 0, 8)
    v0 = dense.init(jax.random.PRNGKey(0), x, train=False)["params"]
    tx = optax.adamw(1e-3)

    def run(model, params, shardings=None):
        opt = tx.init(params)
        if shardings is not None:
            params = jax.device_put(params, shardings)
            opt = jax.device_put(
                opt, expert_state_shardings(opt, mesh))

        @jax.jit
        def step(params, opt):
            def loss_fn(p):
                logits, mut = model.apply({"params": p}, x, train=False,
                                          mutable=["losses"])
                ce = optax.softmax_cross_entropy_with_integer_labels(
                    logits, y).mean()
                return ce + sown_losses_total(mut)

            loss, g = jax.value_and_grad(loss_fn)(params)
            upd, opt = tx.update(g, opt, params)
            return optax.apply_updates(params, upd), opt, loss

        losses = []
        for _ in range(3):
            params, opt, l = step(params, opt)
            losses.append(float(l))
        return losses

    losses_dense = run(dense, v0)
    losses_moe = run(moe, v0, expert_state_shardings(v0, mesh))
    np.testing.assert_allclose(losses_moe, losses_dense,
                               rtol=2e-5, atol=2e-5)
    assert losses_dense[-1] < losses_dense[0]


def test_moe_model_learns_through_generic_harness():
    """MoEKanMLP end-to-end through train_model_generic: the sown
    load-balance aux rides the same 'losses' collection as the L1/L2
    wrappers, routing/capacity/residual all under jit, and the model
    actually learns the channel task."""
    from convkan_tpu.parallel.moe import MoEKanMLP
    from convkan_tpu.train.data import ArrayDataset
    from convkan_tpu.train.loop import train_model_generic

    def channel_task(n, seed, hw=8):
        rng = np.random.RandomState(seed)
        yy = rng.randint(0, 3, (n,)).astype(np.int32)
        xx = rng.randint(0, 100, (n, hw, hw, 3)).astype(np.int32)
        for i in range(n):
            xx[i, :, :, yy[i]] += 120
        return xx.astype(np.uint8), yy

    xtr, ytr = channel_task(512, 0)
    xte, yte = channel_task(128, 1)
    model = MoEKanMLP(family="ChebyKAN", in_dim=8 * 8 * 3, hidden=32,
                      num_classes=3, n_experts=4, n_blocks=2)
    _, history = train_model_generic(
        model, ArrayDataset(xtr, ytr, 3, augment=False),
        ArrayDataset(xte, yte, 3, augment=False), "CIFAR10", 3,
        batch_size=64, epochs=5, learning_rate=3e-3)
    assert history["accuracy"][-1] > 0.9, history["accuracy"]
    assert np.isfinite(history["train_loss"]).all()


def test_moe_router_noise_changes_routing():
    """train-time router noise (exploration) perturbs the output; eval
    (train=False) ignores it."""
    moe = _layer(router_noise=1.0)
    x = jax.random.normal(jax.random.PRNGKey(1), (32, 16))
    v = moe.init(jax.random.PRNGKey(0), x, train=False)
    y_eval = moe.apply(v, x, train=False)
    y_noisy = moe.apply(v, x, train=True,
                        rngs={"dropout": jax.random.PRNGKey(3)})
    assert not np.allclose(np.asarray(y_eval), np.asarray(y_noisy))
    y_eval2 = moe.apply(v, x, train=False)
    np.testing.assert_array_equal(np.asarray(y_eval), np.asarray(y_eval2))
