"""End-to-end training smoke tests (BASELINE configs 2 and 3, miniaturized)
plus the data-parallel mesh path on the 8-device virtual CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from convkan_tpu.factory.mlp_factory import MLP_KAN_FACTORY
from convkan_tpu.models.vgg import vggkan
from convkan_tpu.parallel.mesh import make_mesh
from convkan_tpu.train.data import get_datasets
from convkan_tpu.train.loop import train_model_generic


def test_fastkan_mlp_mnist_synthetic(tmp_path):
    """Config 2 shape: FastKAN MLP [784,128,64,10] on (synthetic) MNIST."""
    train_ds, test_ds, _ = get_datasets("MNIST", synthetic=True,
                                        synthetic_size=256)
    model = MLP_KAN_FACTORY["FastKAN"]([784, 128, 64, 10])
    state, history = train_model_generic(
        model, train_ds, test_ds, "MNIST", 10, batch_size=64, epochs=2,
        path=str(tmp_path), model_name="fastkan_mlp")
    assert len(history["train_loss"]) == 2
    assert np.isfinite(history["train_loss"]).all()
    # random-label data: loss should at least move toward ln(10) chaos floor
    assert history["train_loss"][1] <= history["train_loss"][0] * 1.5
    # inference_ms times only the warm jitted forward (VERDICT r2 #7):
    # epoch-0 and epoch-1 agree within noise — no compile/iteration skew.
    # Compile skew is ~100x, so a 10x band still catches it while
    # tolerating scheduler noise on loaded single-core CI hosts
    # (measured flake at 5x under a full-suite run).
    a, b = history["inference_ms"]
    assert a > 0 and b > 0
    assert 0.1 < a / b < 10.0


def test_prefetch_abandoned_feeder_exits():
    """Abandoning the prefetch generator mid-epoch (train step raised,
    early break) must release the feeder thread — it used to block on
    q.put forever, pinning the queued host batches."""
    import threading
    import time

    from convkan_tpu.train.data import prefetch_batches

    before = threading.active_count()

    def batches():
        for _ in range(1000):
            yield (np.zeros((4, 8), np.float32),)

    g = prefetch_batches(batches(), size=2)
    next(g)
    g.close()  # consumer abandons mid-epoch
    deadline = time.time() + 5.0
    while threading.active_count() > before and time.time() < deadline:
        time.sleep(0.05)
    assert threading.active_count() <= before, "feeder thread leaked"


def test_prefetch_exact():
    """prefetch_batches preserves order and values exactly: the prefetched
    train loop yields the same loss trajectory as direct step calls
    (VERDICT r1 #3 done-criterion)."""
    from convkan_tpu.train.data import epoch_batches, prefetch_batches
    from convkan_tpu.train.loop import make_train_step
    from convkan_tpu.train.state import create_train_state

    train_ds, _, _ = get_datasets("MNIST", synthetic=True,
                                  synthetic_size=256)
    model = MLP_KAN_FACTORY["KAN"]([784, 16, 10])
    rng = jax.random.PRNGKey(0)

    def run(prefetched: bool):
        x0 = jnp.zeros((64, 28, 28, 1), jnp.float32)
        state = create_train_state(model, jax.random.PRNGKey(1), x0,
                                   steps_per_epoch=4)
        step = make_train_step(model, "MNIST", augment=False)
        losses = []
        it = epoch_batches(train_ds, 64, seed=3, shuffle=True,
                           drop_last=True)
        if prefetched:
            it = prefetch_batches(it, size=2)
        for xb, yb in it:
            state, loss = step(state, rng, xb, yb)
            losses.append(float(loss))
        return losses

    a, b = run(False), run(True)
    assert len(a) == 4 and a == b


def test_prefetch_propagates_iterator_error():
    """An exception raised by the source iterator must surface in the
    consumer (ADVICE r2: a pipeline error must not silently truncate the
    epoch)."""
    from convkan_tpu.train.data import prefetch_batches

    def bad_iter():
        yield (np.zeros((2, 4), np.uint8), np.zeros((2,), np.int32))
        raise RuntimeError("corrupt shard")

    with pytest.raises(RuntimeError, match="corrupt shard"):
        list(prefetch_batches(bad_iter(), size=2))


def test_local_batch_slice_rejects_uneven():
    """Global batch not divisible by process_count is a loud error, not a
    misaligned shard (ADVICE r2)."""
    from convkan_tpu.train.data import local_batch_slice

    # single process: any n divides evenly
    assert local_batch_slice(64) == (0, 64)
    from unittest import mock
    with mock.patch.object(jax, "process_count", return_value=3):
        with pytest.raises(ValueError, match="not divisible"):
            local_batch_slice(64)


def test_prefetch_sharded_matches_unsharded():
    """Prefetch with an explicit batch NamedSharding feeds the same values
    (device_put with sharding must not alter data)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from convkan_tpu.train.data import epoch_batches, prefetch_batches

    mesh = make_mesh()
    sh = NamedSharding(mesh, P("data"))
    train_ds, _, _ = get_datasets("MNIST", synthetic=True,
                                  synthetic_size=256)
    plain = list(epoch_batches(train_ds, 64, seed=3, shuffle=True))
    pref = list(prefetch_batches(
        epoch_batches(train_ds, 64, seed=3, shuffle=True), sharding=sh))
    assert len(plain) == len(pref)
    for (xa, ya), (xb, yb) in zip(plain, pref):
        assert xb.sharding.is_equivalent_to(sh, xb.ndim)
        np.testing.assert_array_equal(xa, np.asarray(xb))
        np.testing.assert_array_equal(ya, np.asarray(yb))


@pytest.mark.slow
def test_vgg_cifar_synthetic_resume(tmp_path):
    """Config 3 shape (miniaturized): KAN-VGG with ChebyKAN convs on
    synthetic CIFAR-10, including checkpoint resume."""
    train_ds, test_ds, _ = get_datasets("CIFAR10", synthetic=True,
                                        synthetic_size=128)
    model = vggkan(3, 10, arch="VGG16_kansmall", kan_conv="ChebyKAN",
                   classifier_type="Linear", width_scale=0.25)
    state, history = train_model_generic(
        model, train_ds, test_ds, "CIFAR10", 10, batch_size=32, epochs=1,
        path=str(tmp_path), model_name="vgg_cheby")
    assert np.isfinite(history["train_loss"]).all()
    # resume continues from epoch 1
    state2, history2 = train_model_generic(
        model, train_ds, test_ds, "CIFAR10", 10, batch_size=32, epochs=2,
        path=str(tmp_path), model_name="vgg_cheby", resume=True)
    assert len(history2["train_loss"]) == 2


@pytest.mark.slow
def test_data_parallel_mesh():
    """Data-parallel training step over an 8-device mesh: the compiled step
    must accept a batch sharded over the 'data' axis."""
    assert len(jax.devices()) == 8
    mesh = make_mesh()
    train_ds, test_ds, _ = get_datasets("CIFAR10", synthetic=True,
                                        synthetic_size=128)
    model = vggkan(3, 10, arch="VGG16_kansmall", kan_conv="FastKAN",
                   classifier_type="Linear", width_scale=0.25)
    state, history = train_model_generic(
        model, train_ds, test_ds, "CIFAR10", 10, batch_size=64, epochs=1,
        mesh=mesh)
    assert np.isfinite(history["train_loss"]).all()


def test_grad_accum_matches_full_batch():
    """grad_accum=4: averaged microbatch gradients give the same update
    as the full batch (no BatchNorm/dropout in the model -> exact up to
    f32 summation order)."""
    from convkan_tpu.train.loop import make_train_step
    from convkan_tpu.train.state import create_train_state

    model = MLP_KAN_FACTORY["FastKAN"]([48, 32, 10])
    x0 = jnp.zeros((16, 48), jnp.float32)
    rng = jax.random.PRNGKey(0)
    xb = jnp.asarray(
        (np.random.RandomState(0).rand(16, 4, 4, 3) * 255).astype(np.uint8))
    yb = jnp.asarray(np.random.RandomState(1).randint(0, 10, (16,)))

    outs = {}
    for accum in (1, 4):
        state = create_train_state(model, jax.random.PRNGKey(7),
                                   x0, steps_per_epoch=10)
        step = make_train_step(_FlatModel(model), "CIFAR10", augment=False,
                               grad_accum=accum)
        state, loss = step(state, rng, xb, yb)
        outs[accum] = (np.asarray(loss),
                       jax.tree_util.tree_map(np.asarray, state.params))
    np.testing.assert_allclose(outs[1][0], outs[4][0], rtol=1e-5)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(a, b, atol=1e-5, rtol=1e-4),
        outs[1][1], outs[4][1])


class _FlatModel:
    """Adapter: flatten the (B,H,W,C) pipeline batch for an MLP."""

    def __init__(self, mlp):
        self.mlp = mlp

    def apply(self, variables, x, **kw):
        return self.mlp.apply(variables, x.reshape(x.shape[0], -1), **kw)


def test_grad_accum_under_mesh():
    """grad_accum composes with the data-parallel mesh path."""
    mesh = make_mesh()
    train_ds, test_ds, _ = get_datasets("CIFAR10", synthetic=True,
                                        synthetic_size=128)
    model = vggkan(3, 10, arch="VGG16_kansmall", kan_conv="FastKAN",
                   classifier_type="Linear", width_scale=0.25)
    state, history = train_model_generic(
        model, train_ds, test_ds, "CIFAR10", 10, batch_size=64, epochs=1,
        mesh=mesh, grad_accum=2)
    assert np.isfinite(history["train_loss"]).all()


def test_checkpoint_elastic_resharding(tmp_path):
    """Checkpoints are sharding-elastic: a run trained WITH ZeRO-1
    resumes WITHOUT it (plain dp) and vice versa — the Orbax payload is
    host-snapshotted, so the restore side is free to pick new shardings."""
    mesh = make_mesh()
    train_ds, test_ds, _ = get_datasets("MNIST", synthetic=True,
                                        synthetic_size=256)
    model = MLP_KAN_FACTORY["ChebyKAN"]([784, 32, 10])

    def run(epochs, resume, path, **shard_kw):
        return train_model_generic(
            model, train_ds, test_ds, "MNIST", 10, batch_size=64,
            epochs=epochs, mesh=mesh, path=path,
            model_name="elastic", resume=resume, **shard_kw)

    # zero1 -> plain dp
    _, h1 = run(2, False, str(tmp_path / "a"), zero1=True)
    _, h2 = run(3, True, str(tmp_path / "a"))
    assert h2["train_loss"][:2] == h1["train_loss"]
    assert len(h2["train_loss"]) == 3
    assert np.isfinite(h2["train_loss"]).all()

    # plain dp -> zero1
    _, h3 = run(2, False, str(tmp_path / "b"))
    _, h4 = run(3, True, str(tmp_path / "b"), zero1=True)
    assert h4["train_loss"][:2] == h3["train_loss"]
    assert np.isfinite(h4["train_loss"]).all()
    # both directions walk the same trajectory (same data/seed/model)
    np.testing.assert_allclose(h4["train_loss"], h2["train_loss"],
                               rtol=2e-5, atol=2e-5)

    # fsdp -> plain dp: a run trained with params+moments data-sharded
    # (GSPMD ZeRO-3) restores replicated and keeps the same trajectory
    _, h5 = run(2, False, str(tmp_path / "c"), fsdp=True)
    _, h6 = run(3, True, str(tmp_path / "c"))
    assert h6["train_loss"][:2] == h5["train_loss"]
    np.testing.assert_allclose(h6["train_loss"], h2["train_loss"],
                               rtol=2e-5, atol=2e-5)

    # plain dp -> fsdp (ADVICE r3 #2): a replicated checkpoint restores
    # into a params+moments data-sharded run with the same trajectory
    _, h7 = run(2, False, str(tmp_path / "d"))
    _, h8 = run(3, True, str(tmp_path / "d"), fsdp=True)
    assert h8["train_loss"][:2] == h7["train_loss"]
    np.testing.assert_allclose(h8["train_loss"], h2["train_loss"],
                               rtol=2e-5, atol=2e-5)


def test_zero1_full_loop_checkpoint_resume(tmp_path):
    """zero1 through the WHOLE loop: epoch training with data-sharded
    optimizer state, checkpointing the sharded state, and a --resume-style
    restore that continues training; trajectory matches the non-zero1
    mesh run."""
    mesh = make_mesh()
    train_ds, test_ds, _ = get_datasets("MNIST", synthetic=True,
                                        synthetic_size=256)
    model = MLP_KAN_FACTORY["FastKAN"]([784, 32, 10])

    def run(zero1, path):
        state, history = train_model_generic(
            model, train_ds, test_ds, "MNIST", 10, batch_size=64, epochs=2,
            mesh=mesh, zero1=zero1, path=path, model_name="z1")
        return state, history

    _, hist_ref = run(False, str(tmp_path / "ref"))
    state, hist = run(True, str(tmp_path / "z1"))
    np.testing.assert_allclose(hist["train_loss"], hist_ref["train_loss"],
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(hist["accuracy"], hist_ref["accuracy"])
    # the trained state still carries data-sharded optimizer leaves
    assert any(
        hasattr(x, "sharding") and any(
            "data" in (e if isinstance(e, tuple) else (e,))
            for e in x.sharding.spec if e)
        for x in jax.tree_util.tree_leaves(state.opt_state))

    # resume from the zero1 checkpoint and train one more epoch
    state2, hist2 = train_model_generic(
        model, train_ds, test_ds, "MNIST", 10, batch_size=64, epochs=3,
        mesh=mesh, zero1=True, path=str(tmp_path / "z1"), model_name="z1",
        resume=True)
    assert len(hist2["train_loss"]) == 3
    assert hist2["train_loss"][:2] == hist["train_loss"]
    assert np.isfinite(hist2["train_loss"]).all()
