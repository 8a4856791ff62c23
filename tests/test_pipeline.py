"""GPipe pipeline parallelism (parallel/pipeline.py) — beyond-reference.

The sequential lax.scan trunk (mesh=None) is the numerical oracle for the
pipelined shard_map schedule: same stacked params, same math, different
execution order only.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest
from jax.sharding import PartitionSpec as P

from convkan_tpu.parallel.pipeline import (
    PipelinedKanMLP, gpipe_apply, make_pipeline_mesh,
    pipeline_state_shardings)


def _models(family, mesh, n_stages=4, hidden=32, microbatches=0, cfg=None):
    kw = dict(family=family, in_dim=16, hidden=hidden, n_stages=n_stages,
              out_dim=8, cfg=cfg or {})
    seq = PipelinedKanMLP(**kw)
    pip = PipelinedKanMLP(**kw, mesh=mesh, n_microbatches=microbatches)
    return seq, pip


@pytest.mark.parametrize("family", ["ChebyKAN", "FastKAN", "KAN"])
def test_pipeline_forward_parity(family):
    """4-stage pipeline over a 4-wide pipe axis (x 2 data) matches the
    sequential trunk exactly."""
    mesh = make_pipeline_mesh(pipe=4, data=2)
    seq, pip = _models(family, mesh)
    x = jax.random.normal(jax.random.PRNGKey(1), (16, 16))
    v = seq.init(jax.random.PRNGKey(0), x, train=False)
    y_seq = seq.apply(v, x, train=False)
    y_pip = pip.apply(v, x, train=False)
    np.testing.assert_allclose(np.asarray(y_pip), np.asarray(y_seq),
                               rtol=1e-5, atol=1e-6)


def test_pipeline_stage_folding_and_microbatches():
    """8 stages on a 4-wide pipe (2 consecutive stages per device) and
    more microbatches than stages still match the oracle."""
    mesh = make_pipeline_mesh(pipe=4, data=2)
    seq, pip = _models("ChebyKAN", mesh, n_stages=8, microbatches=8)
    x = jax.random.normal(jax.random.PRNGKey(1), (16, 16))
    v = seq.init(jax.random.PRNGKey(0), x, train=False)
    np.testing.assert_allclose(
        np.asarray(pip.apply(v, x, train=False)),
        np.asarray(seq.apply(v, x, train=False)), rtol=1e-5, atol=1e-6)


def test_pipeline_gradient_parity():
    """jax.grad through the shard_map schedule (the reverse pipeline)
    equals the sequential gradient for every param leaf — embed, stacked
    stages, and head."""
    mesh = make_pipeline_mesh(pipe=4, data=2)
    seq, pip = _models("ChebyKAN", mesh)
    x = jax.random.normal(jax.random.PRNGKey(1), (16, 16))
    y = jax.random.randint(jax.random.PRNGKey(2), (16,), 0, 8)
    v = seq.init(jax.random.PRNGKey(0), x, train=False)

    def loss(params, model):
        logits = model.apply({"params": params}, x, train=False)
        return optax.softmax_cross_entropy_with_integer_labels(
            logits, y).mean()

    g_seq = jax.grad(loss)(v["params"], seq)
    g_pip = jax.grad(loss)(v["params"], pip)
    flat_seq = jax.tree_util.tree_leaves_with_path(g_seq)
    flat_pip = jax.tree_util.tree_leaves(g_pip)
    assert len(flat_seq) == len(flat_pip)
    for (path, a), b in zip(flat_seq, flat_pip):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=2e-4, atol=1e-6,
            err_msg=f"grad mismatch at {jax.tree_util.keystr(path)}")


def test_pipeline_training_with_sharded_stages():
    """3 AdamW steps with the stacked stage params (and their optimizer
    moments) actually sharded over 'pipe': loss trajectory matches the
    unsharded sequential run, and each device holds 1/pipe of the stage
    leaves."""
    mesh = make_pipeline_mesh(pipe=4, data=2)
    seq, pip = _models("ChebyKAN", mesh)
    x = jax.random.normal(jax.random.PRNGKey(1), (32, 16))
    y = jax.random.randint(jax.random.PRNGKey(2), (32,), 0, 8)
    v0 = seq.init(jax.random.PRNGKey(0), x, train=False)["params"]
    tx = optax.adamw(1e-3)

    def run(model, params, shardings=None):
        opt = tx.init(params)
        if shardings is not None:
            params = jax.device_put(params, shardings)
            opt = jax.device_put(opt, pipeline_state_shardings(opt, mesh))

        @jax.jit
        def step(params, opt):
            def loss_fn(p):
                logits = model.apply({"params": p}, x, train=False)
                return optax.softmax_cross_entropy_with_integer_labels(
                    logits, y).mean()

            loss, g = jax.value_and_grad(loss_fn)(params)
            upd, opt = tx.update(g, opt, params)
            return optax.apply_updates(params, upd), opt, loss

        losses = []
        for _ in range(3):
            params, opt, l = step(params, opt)
            losses.append(float(l))
        return params, losses

    _, losses_seq = run(seq, v0)
    sh = pipeline_state_shardings(v0, mesh)
    params_pip, losses_pip = run(pip, v0, sh)
    np.testing.assert_allclose(losses_pip, losses_seq, rtol=2e-5, atol=2e-5)

    stage_leaves = [
        x_ for path, x_ in jax.tree_util.tree_leaves_with_path(params_pip)
        if any(getattr(k, "key", None) == "stages" for k in path)]
    assert stage_leaves, "no stacked stage params found"
    for leaf in stage_leaves:
        assert "pipe" in {
            e for ent in leaf.sharding.spec if ent
            for e in (ent if isinstance(ent, tuple) else (ent,))}
        assert leaf.addressable_shards[0].data.shape[0] == leaf.shape[0] // 4


def test_gpipe_apply_raw_function():
    """The core schedule works on a plain stacked pytree + pure stage fn
    (no flax): y = x @ W_i chained, pipelined == sequential."""
    mesh = make_pipeline_mesh(pipe=4, data=2)
    ws = jax.random.normal(jax.random.PRNGKey(0), (4, 8, 8)) * 0.3
    x = jax.random.normal(jax.random.PRNGKey(1), (16, 8))

    def stage(w, h):
        return jnp.tanh(h @ w)

    y_seq = x
    for i in range(4):
        y_seq = stage(ws[i], y_seq)
    y_pip = gpipe_apply(stage, ws, x, mesh=mesh)
    np.testing.assert_allclose(np.asarray(y_pip), np.asarray(y_seq),
                               rtol=1e-6, atol=1e-6)


def test_pipeline_mesh_validation():
    with pytest.raises(AssertionError):
        make_pipeline_mesh(pipe=3)  # 8 devices not divisible
    mesh = make_pipeline_mesh(pipe=2)
    assert dict(zip(mesh.axis_names, mesh.devices.shape)) == {
        "data": 4, "pipe": 2}
    # stage count not divisible by pipe width
    ws = jnp.zeros((3, 4, 4))
    with pytest.raises(AssertionError, match="divisible"):
        gpipe_apply(lambda w, h: h, ws, jnp.zeros((8, 4)), mesh=mesh)
