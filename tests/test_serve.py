"""Serving subsystem tests (convkan_tpu/serve.py): bucketed jitted
forward, dynamic batching, and the HTTP surface.  CPU-only, tiny model.

The reference's deployment story ends at `model(x)` on a pickle
(evaluations.py:225); this subsystem is new-build (SURVEY.md §5
"serving export" companion)."""

import json
import threading
import urllib.request

import flax.linen as nn
import jax
import numpy as np
import pytest

from convkan_tpu.serve import InferenceEngine, make_server

SHAPE = (8, 8, 3)


class Tiny(nn.Module):
    @nn.compact
    def __call__(self, x, train: bool = True):
        x = x.reshape(x.shape[0], -1)
        return nn.Dense(10)(x)


@pytest.fixture(scope="module")
def engine():
    model = Tiny()
    variables = model.init(jax.random.PRNGKey(0),
                           np.zeros((1,) + SHAPE, np.float32), train=False)
    eng = InferenceEngine(model, variables, "CIFAR10", SHAPE,
                          buckets=(1, 4, 16), batch_timeout_ms=30.0)
    yield eng
    eng.close()


def _images(n, seed=0):
    return np.random.RandomState(seed).randint(
        0, 256, (n,) + SHAPE, dtype=np.uint8)


def test_predict_bucket_padding_exact(engine):
    """Padding to a bucket then slicing must not change the results, for
    sizes inside, at, and across bucket boundaries + chunking past the
    largest bucket."""
    ref5 = engine.predict(_images(5))
    for n in (1, 3, 4, 5, 16, 37):
        x = _images(n)
        y = engine.predict(x)
        assert y.shape == (n, 10)
        # per-row invariance: each row equals the row computed alone
        # (engine.predict(x[i:i+1]) rides the batch-1 bucket)
        for i in (0, n - 1):
            solo = engine.predict(x[i:i + 1])[0]
            np.testing.assert_allclose(y[i], solo, rtol=1e-5, atol=1e-5)
    # determinism across calls
    np.testing.assert_array_equal(ref5, engine.predict(_images(5)))


def test_submit_matches_predict_and_coalesces(engine):
    """16 concurrent submits return per-instance results identical to the
    direct path, and the batcher coalesces them into far fewer device
    steps than 16."""
    x = _images(16, seed=1)
    want = engine.predict(x)

    calls = []
    orig = engine._fwd

    def counting_fwd(batch):
        calls.append(np.asarray(batch).shape[0])
        return orig(batch)

    engine._fwd = counting_fwd
    try:
        results = [None] * 16

        def worker(i):
            results[i] = engine.submit(x[i])

        threads = [threading.Thread(target=worker, args=(i,))
                   for i in range(16)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
    finally:
        engine._fwd = orig

    for i in range(16):
        np.testing.assert_allclose(results[i], want[i], rtol=1e-5,
                                   atol=1e-5)
    assert len(calls) < 16, f"no coalescing happened: {calls}"


def test_shape_errors(engine):
    with pytest.raises(ValueError):
        engine.predict(np.zeros((2, 4, 4, 3), np.uint8))
    with pytest.raises(ValueError):
        engine.predict(np.zeros((0,) + SHAPE, np.uint8))
    # submit validates BEFORE enqueueing, so a malformed instance can
    # never poison other callers' coalesced batch
    with pytest.raises(ValueError):
        engine.submit(np.zeros((4, 4, 3), np.uint8))


def test_metrics_percentiles_nearest_rank(engine):
    engine._latencies_ms.clear()
    engine._latencies_ms.extend([1.0, 9.0])
    m = engine.metrics()
    assert m["device_step_ms"]["p50"] == 1.0  # median of 2, not rank 2
    assert m["device_step_ms"]["p99"] == 9.0


def test_submit_after_close_fails_fast():
    model = Tiny()
    variables = model.init(jax.random.PRNGKey(0),
                           np.zeros((1,) + SHAPE, np.float32), train=False)
    eng = InferenceEngine(model, variables, "CIFAR10", SHAPE,
                          buckets=(1,), warmup=False)
    eng.close()
    with pytest.raises(RuntimeError, match="closed"):
        eng.submit(_images(1)[0])


def test_timed_out_submits_are_shed():
    """An instance whose submitter timed out must not consume a device
    step (load shedding under overload — without it a backlog that
    causes timeouts can never drain)."""
    import queue as _q
    import time as _t

    model = Tiny()
    variables = model.init(jax.random.PRNGKey(0),
                           np.zeros((1,) + SHAPE, np.float32), train=False)
    eng = InferenceEngine(model, variables, "CIFAR10", SHAPE,
                          buckets=(1, 4), batch_timeout_ms=1.0)
    calls = []
    orig = eng._fwd

    def counting_fwd(batch):
        calls.append(np.asarray(batch).shape[0])
        return orig(batch)

    try:
        # stall the worker on a fake first item so we can queue an
        # already-abandoned one behind it deterministically
        gate = threading.Event()
        box_slow = {"event": threading.Event()}

        def stalling_fwd(batch):
            gate.wait(5.0)
            return counting_fwd(batch)

        eng._fwd = stalling_fwd
        eng._queue.put((_images(1)[0], box_slow))
        _t.sleep(0.05)  # worker picks it up and stalls in stalling_fwd
        box_dead = {"event": threading.Event(), "abandoned": True}
        eng._queue.put((_images(1, seed=3)[0], box_dead))
        gate.set()
        assert box_slow["event"].wait(10.0)
        # give the worker a chance to (wrongly) run the abandoned item
        _t.sleep(0.3)
        assert not box_dead["event"].is_set()
        assert len(calls) == 1  # only the live item cost a device step
    finally:
        eng._fwd = orig
        eng.close()


def test_http_surface(engine):
    server = make_server(engine, "tiny", "127.0.0.1", 0)
    port = server.server_address[1]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        with urllib.request.urlopen(
                f"http://127.0.0.1:{port}/healthz", timeout=10) as r:
            health = json.loads(r.read())
        assert health["ok"] and health["input_shape"] == list(SHAPE)
        assert health["buckets"] == [1, 4, 16]

        x = _images(3, seed=2)
        want = engine.predict(x)
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/predict",
            data=json.dumps({"instances": x.tolist()}).encode(),
            method="POST")
        with urllib.request.urlopen(req, timeout=30) as r:
            out = json.loads(r.read())
        assert out["batch"] == 3
        np.testing.assert_allclose(np.asarray(out["predictions"]), want,
                                   rtol=1e-5, atol=1e-5)

        # single instance rides the dynamic batcher
        req1 = urllib.request.Request(
            f"http://127.0.0.1:{port}/predict",
            data=json.dumps({"instances": x[:1].tolist()}).encode(),
            method="POST")
        with urllib.request.urlopen(req1, timeout=30) as r:
            out1 = json.loads(r.read())
        np.testing.assert_allclose(np.asarray(out1["predictions"]),
                                   want[:1], rtol=1e-5, atol=1e-5)

        # malformed shape -> 400, server stays alive
        bad = urllib.request.Request(
            f"http://127.0.0.1:{port}/predict",
            data=json.dumps(
                {"instances": np.zeros((1, 2, 2, 3)).tolist()}).encode(),
            method="POST")
        with pytest.raises(urllib.error.HTTPError) as ei:
            urllib.request.urlopen(bad, timeout=10)
        assert ei.value.code == 400

        # out-of-uint8-range pixel values -> 400 (client error, not a
        # 500: numpy 2.x raises OverflowError for int 256)
        over = np.zeros((1,) + SHAPE, np.int64).tolist()
        over[0][0][0][0] = 256
        bad2 = urllib.request.Request(
            f"http://127.0.0.1:{port}/predict",
            data=json.dumps({"instances": over}).encode(), method="POST")
        with pytest.raises(urllib.error.HTTPError) as ei2:
            urllib.request.urlopen(bad2, timeout=10)
        assert ei2.value.code == 400
        with urllib.request.urlopen(
                f"http://127.0.0.1:{port}/healthz", timeout=10) as r:
            assert json.loads(r.read())["ok"]

        with urllib.request.urlopen(
                f"http://127.0.0.1:{port}/metrics", timeout=10) as r:
            m = json.loads(r.read())
        assert m["requests"] >= 3 and m["instances"] >= 4
        assert m["device_batches"] >= 2 and "device_step_ms" in m
    finally:
        server.shutdown()
        server.server_close()


@pytest.mark.slow
def test_serve_cli_build_engine():
    """The CLI path: --init_random + train.py flag vocabulary builds a
    warmed engine on a real model (KAN-VGG kansmall), and predict runs."""
    from convkan_tpu.migrate import _load_train_module
    from convkan_tpu.serve import build_engine

    train = _load_train_module()
    p = train.build_parser()
    p.add_argument("--kind", default="best")
    p.add_argument("--ckpt_name", default=None)
    p.add_argument("--init_random", action="store_true")
    p.add_argument("--fold_bn", action="store_true")
    p.add_argument("--bn_eps", type=float, default=1e-5)
    p.add_argument("--bf16", action="store_true")
    p.add_argument("--buckets", default="1,8,64")
    p.add_argument("--batch_timeout_ms", type=float, default=2.0)
    args = p.parse_args(["--model", "VGGKAN", "--arch", "VGG16_kansmall",
                         "--dataset", "CIFAR10", "--width_scale", "0.25",
                         "--init_random", "--buckets", "1,4"])
    engine, name = build_engine(args, train)
    try:
        y = engine.predict(np.random.RandomState(0).randint(
            0, 256, (3, 32, 32, 3), dtype=np.uint8))
        assert y.shape == (3, 10) and np.isfinite(y).all()
        assert "VGG" in name
    finally:
        engine.close()


def test_serve_cli_builds_moe_model():
    """The beyond-reference MoEKanMLP serves through the same CLI path:
    routing/capacity/residual under the bucketed jitted forward."""
    from convkan_tpu.migrate import _load_train_module
    from convkan_tpu.serve import build_engine

    train = _load_train_module()
    p = train.build_parser()
    p.add_argument("--kind", default="best")
    p.add_argument("--ckpt_name", default=None)
    p.add_argument("--init_random", action="store_true")
    p.add_argument("--fold_bn", action="store_true")
    p.add_argument("--bn_eps", type=float, default=1e-5)
    p.add_argument("--bf16", action="store_true")
    p.add_argument("--buckets", default="1,8,64")
    p.add_argument("--batch_timeout_ms", type=float, default=2.0)
    args = p.parse_args(["--model", "MoEKanMLP", "--kan_classifier",
                         "ChebyKAN", "--moe_hidden", "32",
                         "--moe_blocks", "1", "--dataset", "MNIST",
                         "--init_random", "--buckets", "1,4"])
    engine, name = build_engine(args, train)
    try:
        y = engine.predict(np.random.RandomState(0).randint(
            0, 256, (3, 28, 28, 1), dtype=np.uint8))
        assert y.shape == (3, 10) and np.isfinite(y).all()
        assert "MoEKanMLP" in name
    finally:
        engine.close()


def test_mesh_serving_matches_single_device():
    """Multi-chip serving: batch sharded over the data mesh produces the
    same logits as the unsharded engine, and uneven buckets are
    rejected up front."""
    from convkan_tpu.parallel.mesh import make_mesh

    model = Tiny()
    variables = model.init(jax.random.PRNGKey(0),
                           np.zeros((1,) + SHAPE, np.float32), train=False)
    mesh = make_mesh(data=4, devices=jax.devices()[:4])
    single = InferenceEngine(model, variables, "CIFAR10", SHAPE,
                             buckets=(4, 16), warmup=False)
    sharded = InferenceEngine(model, variables, "CIFAR10", SHAPE,
                              buckets=(4, 16), mesh=mesh, warmup=False)
    try:
        x = _images(16, seed=5)
        np.testing.assert_allclose(sharded.predict(x), single.predict(x),
                                   rtol=1e-5, atol=1e-5)
        # padding path: 10 rows -> bucket 16, still sharded evenly
        np.testing.assert_allclose(sharded.predict(x[:10]),
                                   single.predict(x[:10]),
                                   rtol=1e-5, atol=1e-5)
    finally:
        single.close()
        sharded.close()

    import pytest as _pytest
    with _pytest.raises(ValueError, match="not divisible"):
        InferenceEngine(model, variables, "CIFAR10", SHAPE,
                        buckets=(1, 8), mesh=mesh, warmup=False)


def test_serve_from_exported_stablehlo(tmp_path):
    """Full production loop: export_forward -> serve from the blob
    without the model class; logits match the live-model engine."""
    from convkan_tpu.utils.export import export_forward

    model = Tiny()
    variables = model.init(jax.random.PRNGKey(0),
                           np.zeros((1,) + SHAPE, np.float32), train=False)
    blob = export_forward(model, variables, SHAPE, batch_poly=True)
    live = InferenceEngine(model, variables, "CIFAR10", SHAPE,
                           buckets=(1, 4), warmup=False)
    exported = InferenceEngine.from_exported(blob, "CIFAR10", SHAPE,
                                             buckets=(1, 4))
    try:
        x = _images(3, seed=9)
        np.testing.assert_allclose(exported.predict(x), live.predict(x),
                                   rtol=1e-5, atol=1e-5)
        # dynamic batcher works on the exported path too
        np.testing.assert_allclose(exported.submit(x[0]),
                                   live.predict(x[:1])[0],
                                   rtol=1e-5, atol=1e-5)
    finally:
        live.close()
        exported.close()


@pytest.mark.slow
def test_serve_prefers_ema_weights(tmp_path):
    """An EMA-trained checkpoint serves its EMA weights (train/loop.py
    evaluates/selects on the EMA when ema_decay > 0, so serving must use
    the same tree): engine(EMA ckpt with garbage live params) ==
    engine(plain ckpt whose params ARE the EMA tree)."""
    from convkan_tpu.migrate import _load_train_module
    from convkan_tpu.serve import build_engine
    from convkan_tpu.train.checkpoint import save_checkpoint
    from convkan_tpu.train.state import create_train_state

    train = _load_train_module()
    p = train.build_parser()
    p.add_argument("--kind", default="best")
    p.add_argument("--ckpt_name", default=None)
    p.add_argument("--init_random", action="store_true")
    p.add_argument("--fold_bn", action="store_true")
    p.add_argument("--bn_eps", type=float, default=1e-5)
    p.add_argument("--bf16", action="store_true")
    p.add_argument("--buckets", default="4")
    p.add_argument("--batch_timeout_ms", type=float, default=2.0)
    flags = ["--model", "VGGKAN", "--arch", "VGG16_kansmall",
             "--dataset", "CIFAR10", "--width_scale", "0.25",
             "--results_dir", str(tmp_path), "--buckets", "4"]

    args = p.parse_args(flags + ["--ckpt_name", "ema_ck"])
    model = train.build_model(args, (32, 32, 3), 10)
    import jax.numpy as jnp

    state = create_train_state(model, jax.random.PRNGKey(0),
                               jnp.zeros((2, 32, 32, 3), jnp.float32),
                               ema_decay=0.9)
    good = state.ema_params
    state = state.replace(params=jax.tree_util.tree_map(
        lambda q: q + 1e3, state.params))
    root = str(tmp_path / "CIFAR10" / "models")
    save_checkpoint(root, "ema_ck", "best", state, async_save=False)
    # control: a non-EMA checkpoint whose live params are the EMA tree
    ctrl = create_train_state(model, jax.random.PRNGKey(1),
                              jnp.zeros((2, 32, 32, 3), jnp.float32))
    ctrl = ctrl.replace(params=good)
    save_checkpoint(root, "plain_ck", "best", ctrl, async_save=False)

    x = np.random.RandomState(3).randint(0, 256, (4, 32, 32, 3), np.uint8)
    eng_ema, _ = build_engine(args, train)
    try:
        y_ema = eng_ema.predict(x)
    finally:
        eng_ema.close()
    args2 = p.parse_args(flags + ["--ckpt_name", "plain_ck"])
    eng_ctrl, _ = build_engine(args2, train)
    try:
        y_ctrl = eng_ctrl.predict(x)
    finally:
        eng_ctrl.close()
    np.testing.assert_allclose(y_ema, y_ctrl, rtol=1e-6, atol=1e-6)
    assert np.isfinite(y_ema).all()
