"""Dynamic int8 post-training quantization (config.quant_mode +
ops/conv._conv_nd_int8) and its serving wiring.

Beyond-reference subsystem: the reference has no quantization story (its
deployment surface ends at `model(x)`, evaluations.py:107-129).  The TPU
recipe here is the standard one — per-output-channel symmetric weight
scales, per-tensor dynamic activation scale, s8 x s8 -> s32 on the MXU,
fused dequant — gated behind an inference-only process mode so training
never sees the zero-gradient round()."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from convkan_tpu import config as cfg
from convkan_tpu.ops.conv import conv_nd


def _rand(shape, seed, scale=1.0):
    return (np.random.RandomState(seed).randn(*shape) * scale).astype(
        np.float32)


def _np_int8_matmul(x, w):
    """Numpy oracle of the exact _conv_nd_int8 recipe for a 1x1 conv
    (= matmul over the channel axis): per-tensor activation scale,
    per-output-channel weight scales, s32 accumulation."""
    ax = max(np.abs(x).max() / 127.0, 1e-12)
    xq = np.clip(np.round(x / ax), -127, 127).astype(np.int32)
    aw = np.maximum(np.abs(w).max(axis=tuple(range(w.ndim - 1))) / 127.0,
                    1e-12)
    wq = np.clip(np.round(w / aw), -127, 127).astype(np.int32)
    yq = np.einsum("bhwc,co->bhwo", xq, wq[0, 0]).astype(np.int32)
    return yq.astype(np.float32) * (ax * aw).astype(np.float32)


def test_int8_conv_matches_numpy_oracle():
    """1x1 conv under quant_mode('int8') equals the numpy int8 recipe
    exactly (integer accumulation is deterministic; the only float ops
    are the two scales)."""
    x = _rand((2, 5, 5, 7), 0)
    w = _rand((1, 1, 7, 9), 1)
    with cfg.quant_mode("int8"):
        y = conv_nd(jnp.asarray(x), jnp.asarray(w), ndim=2)
    np.testing.assert_allclose(np.asarray(y), _np_int8_matmul(x, w),
                               rtol=1e-6, atol=1e-6)


def test_int8_conv_close_to_float():
    """3x3 'same' conv: int8 dequantized output tracks the f32 conv at
    quantization tolerance (relative to the output scale)."""
    x = _rand((2, 8, 8, 16), 2)
    w = _rand((3, 3, 16, 32), 3, scale=0.2)
    y_f = np.asarray(conv_nd(jnp.asarray(x), jnp.asarray(w), ndim=2,
                             padding=1))
    with cfg.quant_mode("int8"):
        y_q = np.asarray(conv_nd(jnp.asarray(x), jnp.asarray(w), ndim=2,
                                 padding=1))
    err = np.abs(y_q - y_f).max() / (np.abs(y_f).max() + 1e-12)
    assert err < 0.02, err


def test_int8_grouped_strided_dilated():
    """The quantized path must honor the full conv vocabulary (groups /
    stride / dilation) — same lax call shape as the float path."""
    x = _rand((2, 9, 9, 8), 4)
    w = _rand((3, 3, 4, 12), 5, scale=0.3)  # groups=2: Cin/g=4, Cout=12
    kwargs = dict(ndim=2, padding=2, stride=2, dilation=2, groups=2)
    y_f = np.asarray(conv_nd(jnp.asarray(x), jnp.asarray(w), **kwargs))
    with cfg.quant_mode("int8"):
        y_q = np.asarray(conv_nd(jnp.asarray(x), jnp.asarray(w), **kwargs))
    assert y_q.shape == y_f.shape
    err = np.abs(y_q - y_f).max() / (np.abs(y_f).max() + 1e-12)
    assert err < 0.03, err


def test_quant_mode_context_restores_and_validates():
    assert cfg.get_quant_mode() is None
    with cfg.quant_mode("int8"):
        assert cfg.get_quant_mode() == "int8"
        with cfg.quant_mode(None):  # serving engines force-disable inside
            assert cfg.get_quant_mode() is None
        assert cfg.get_quant_mode() == "int8"
    assert cfg.get_quant_mode() is None
    with pytest.raises(AssertionError):
        cfg.set_quant_mode("int4")


def test_int8_conv_under_jit_traces_mode():
    """The mode is consulted at trace time: a jit traced inside the
    context keeps the quantized compute after the context exits."""
    x = _rand((1, 6, 6, 4), 6)
    w = _rand((3, 3, 4, 8), 7)

    f = jax.jit(lambda a, b: conv_nd(a, b, ndim=2, padding=1))
    with cfg.quant_mode("int8"):
        y_in = np.asarray(f(jnp.asarray(x), jnp.asarray(w)))
    y_out = np.asarray(f(jnp.asarray(x), jnp.asarray(w)))  # cached trace
    np.testing.assert_array_equal(y_in, y_out)
    with cfg.quant_mode("int8"):
        y_ref = np.asarray(conv_nd(jnp.asarray(x), jnp.asarray(w), ndim=2,
                                   padding=1))
    np.testing.assert_allclose(y_in, y_ref, rtol=1e-6, atol=1e-6)


# ------------------------------------------------------------- serving glue

SHAPE = (8, 8, 3)


def _kan_engine(**kwargs):
    import flax.linen as nn

    from convkan_tpu.nn.kan_conv import KanConvND
    from convkan_tpu.serve import InferenceEngine

    class TinyKan(nn.Module):
        @nn.compact
        def __call__(self, x, train: bool = True):
            x = KanConvND(family="kan", input_dim=3, output_dim=8,
                          kernel_size=3, padding=1)(x, train=train)
            x = x.reshape(x.shape[0], -1)
            return nn.Dense(10)(x)

    model = TinyKan()
    variables = model.init(jax.random.PRNGKey(0),
                           np.zeros((1,) + SHAPE, np.float32), train=False)
    return InferenceEngine(model, variables, "CIFAR10", SHAPE,
                           buckets=(1, 4), batch_timeout_ms=5.0, **kwargs)


def test_engine_int8_close_to_float():
    x = np.random.RandomState(0).randint(0, 256, (4,) + SHAPE, np.uint8)
    eng_f = _kan_engine()
    eng_q = _kan_engine(int8=True)
    try:
        y_f = eng_f.predict(x)
        y_q = eng_q.predict(x)
    finally:
        eng_f.close()
        eng_q.close()
    err = np.abs(y_q - y_f).max() / (np.abs(y_f).max() + 1e-12)
    assert err < 0.05, err
    # quantization actually engaged (outputs are not bit-identical)
    assert np.abs(y_q - y_f).max() > 0


def test_export_int8_artifact_matches_live():
    """export_forward(int8=True) bakes the quantized path into the
    StableHLO artifact: serving the blob reproduces the live int8
    forward (same graph, params constant-folded; AOT vs JIT compile may
    reorder float fusions, so tight-allclose rather than bit-equal)."""
    import flax.linen as nn

    from convkan_tpu.nn.kan_conv import KanConvND
    from convkan_tpu.train.data import normalize_batch
    from convkan_tpu.utils.export import export_forward, load_forward

    class TinyKan(nn.Module):
        @nn.compact
        def __call__(self, x, train: bool = True):
            x = KanConvND(family="kan", input_dim=3, output_dim=8,
                          kernel_size=3, padding=1)(x, train=train)
            x = x.reshape(x.shape[0], -1)
            return nn.Dense(10)(x)

    model = TinyKan()
    variables = model.init(jax.random.PRNGKey(0),
                           np.zeros((1,) + SHAPE, np.float32), train=False)
    blob = export_forward(model, variables, SHAPE, batch_poly=False,
                          int8=True)
    f = load_forward(blob)
    x = normalize_batch(np.random.RandomState(1).randint(
        0, 256, (1,) + SHAPE, np.uint8), "CIFAR10").astype(np.float32)
    with cfg.quant_mode("int8"):
        want = np.asarray(model.apply(variables, jnp.asarray(x),
                                      train=False))
    np.testing.assert_allclose(np.asarray(f(x)), want, rtol=1e-5,
                               atol=1e-6)
    # and the artifact differs from the float export by much more than
    # compile noise (quantization is actually baked in)
    f_f32 = load_forward(export_forward(model, variables, SHAPE,
                                        batch_poly=False))
    assert np.abs(np.asarray(f_f32(x)) - want).max() > 1e-4


def test_engine_int8_flag_conflicts():
    from convkan_tpu.serve import InferenceEngine

    with pytest.raises(ValueError, match="one serving precision"):
        _kan_engine(int8=True, bf16=True)
    with pytest.raises(ValueError, match="live model"):
        InferenceEngine(None, lambda x: x, "CIFAR10", SHAPE, int8=True,
                        warmup=False)
