"""Fused Pallas WavKAN psi-conv vs the XLA materialization path.

Interpreter mode on CPU (the TPU bench runs it compiled).  Forward parity
for all 5 wavelet types, full gradient parity (x + every param) for the
three structurally-distinct ones (smooth / windowed / piecewise), and the
unsupported-surface fallback.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from convkan_tpu.nn.wav_conv import WavKANConvND

WAVELETS = ["mexican_hat", "morlet", "dog", "meyer", "shannon"]


def _pair(wavelet_type, interpret=True, **over):
    kw = dict(input_dim=8, output_dim=16, kernel_size=3, ndim=2, padding=1,
              wavelet_type=wavelet_type, wav_version="fast")
    kw.update(over)
    fused = WavKANConvND(use_pallas=True, pallas_interpret=interpret, **kw)
    plain = WavKANConvND(use_pallas=False, **kw)
    return fused, plain


def _rand_x(shape=(2, 8, 8, 8)):
    return jax.random.normal(jax.random.PRNGKey(0), shape, jnp.float32)


def _perturbed_init(plain, x):
    """Init with scale/translation moved off their degenerate 1/0 init so
    the s/t gradients are exercised at non-trivial points."""
    v = plain.init(jax.random.PRNGKey(1), x, train=False)
    params = jax.tree_util.tree_map(np.asarray, v["params"])
    rs = np.random.RandomState(3)
    params["scale"] = (1.0 + 0.3 * rs.rand(
        *params["scale"].shape)).astype(np.float32)
    params["translation"] = (0.5 * rs.randn(
        *params["translation"].shape)).astype(np.float32)
    out = dict(v)
    out["params"] = params
    return out


@pytest.mark.parametrize("wavelet_type", WAVELETS)
def test_fused_forward_matches_xla(wavelet_type):
    fused, plain = _pair(wavelet_type)
    x = _rand_x()
    v = _perturbed_init(plain, x)
    y_plain = plain.apply(v, x, train=False)
    y_fused = fused.apply(v, x, train=False)
    np.testing.assert_allclose(np.asarray(y_fused), np.asarray(y_plain),
                               atol=2e-5, rtol=2e-5)


@pytest.mark.parametrize("wavelet_type", ["mexican_hat", "shannon", "meyer"])
def test_fused_gradients_match(wavelet_type):
    fused, plain = _pair(wavelet_type)
    x = _rand_x()
    v = _perturbed_init(plain, x)

    def loss(module, variables, xx):
        return jnp.sum(module.apply(variables, xx, train=False) ** 2)

    g_plain = jax.grad(loss, argnums=(1, 2))(plain, v, x)
    g_fused = jax.grad(loss, argnums=(1, 2))(fused, v, x)
    flat_p, _ = jax.tree_util.tree_flatten_with_path(g_plain)
    flat_f, _ = jax.tree_util.tree_flatten_with_path(g_fused)
    for (path, a), (_, b) in zip(flat_p, flat_f):
        scale = max(1.0, float(np.max(np.abs(a))))
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), atol=3e-5 * scale, rtol=3e-5,
            err_msg=f"grad mismatch at {jax.tree_util.keystr(path)}")


def test_fused_nonsquare_batchblocks():
    """Coverage of the batch-block grid (B > block) + rectangular maps."""
    fused, plain = _pair("morlet")
    x = _rand_x((6, 5, 9, 8))
    v = _perturbed_init(plain, x)
    np.testing.assert_allclose(
        np.asarray(fused.apply(v, x, train=False)),
        np.asarray(plain.apply(v, x, train=False)), atol=2e-5, rtol=2e-5)


def test_fused_falls_back_when_unsupported():
    """stride-2 / 3D / groups>1 / tiny channels run the XLA path (same
    numbers, no error)."""
    for over, shape in [
        (dict(stride=2), (2, 8, 8, 8)),
        (dict(groups=2), (2, 8, 8, 8)),
        (dict(input_dim=4, output_dim=16), (2, 8, 8, 4)),
        (dict(ndim=1), (2, 16, 8)),
    ]:
        fused, plain = _pair("mexican_hat", **over)
        x = _rand_x(shape)
        v = plain.init(jax.random.PRNGKey(1), x, train=False)
        np.testing.assert_allclose(
            np.asarray(fused.apply(v, x, train=False)),
            np.asarray(plain.apply(v, x, train=False)), atol=1e-6)


@pytest.mark.parametrize("wavelet_type", WAVELETS)
def test_wav_island_bf16_close_and_f32_contract(wavelet_type):
    """island_bf16 (the config-4 psi-traffic lever): output/grads stay
    f32, values within bf16 tolerance of the f32 path, grads finite —
    for every wavelet (meyer/shannon exercise the piecewise/windowed
    branches in bf16)."""
    kw = dict(input_dim=6, output_dim=8, kernel_size=3, ndim=2, padding=1,
              groups=2, wavelet_type=wavelet_type, wav_version="fast")
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 8, 6), jnp.float32)
    plain = WavKANConvND(use_pallas=False, **kw)
    isl = WavKANConvND(use_pallas=False, island_bf16=True, **kw)
    v = _perturbed_init(plain, x)
    y0 = plain.apply(v, x, train=False)
    y1 = isl.apply(v, x, train=False)
    assert y1.dtype == jnp.float32
    np.testing.assert_allclose(np.asarray(y0), np.asarray(y1),
                               atol=0.15, rtol=0.1)

    def loss(p):
        out, _ = isl.apply({"params": p, "batch_stats": v["batch_stats"]},
                           x, train=True, mutable=["batch_stats"],
                           rngs={"dropout": jax.random.PRNGKey(1)})
        return jnp.sum(out ** 2)

    g = jax.grad(loss)(v["params"])
    for leaf in jax.tree_util.tree_leaves(g):
        assert leaf.dtype == jnp.float32
        assert np.isfinite(np.asarray(leaf)).all()


def test_wav_island_bf16_process_default():
    """set_perf_defaults(island_bf16=...) reaches WavKANConvND too (the
    knob is shared with KanConvND); explicit ctor kwarg wins."""
    from convkan_tpu.nn.kan_conv import set_perf_defaults

    kw = dict(input_dim=4, output_dim=4, kernel_size=3, ndim=2)
    assert WavKANConvND(**kw)._island_bf16_on is False
    prev = set_perf_defaults(island_bf16=True)
    try:
        assert WavKANConvND(**kw)._island_bf16_on is True
        assert WavKANConvND(island_bf16=False, **kw)._island_bf16_on is False
    finally:
        set_perf_defaults(**prev)


@pytest.mark.parametrize("wavelet_type", ["mexican_hat", "shannon", "meyer"])
@pytest.mark.parametrize("groups", [1, 2])
def test_psi_build_parity(wavelet_type, groups):
    """psi_build='flat' (collapsed-layout assembly) is bitwise identical
    to the default 'bcast' rank-5 broadcast — same params, same output,
    including shannon's per-(g,o)-tiled hamming window and grouped input
    slicing.  psi_remat=True (jax.checkpoint) must also be value-exact
    in both forward and gradients."""
    kw = dict(input_dim=8, output_dim=6, kernel_size=3, ndim=2, padding=1,
              groups=groups, wavelet_type=wavelet_type, use_pallas=False)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 6, 6, 8), jnp.float32)
    bcast = WavKANConvND(psi_build="bcast", **kw)
    flat = WavKANConvND(psi_build="flat", **kw)
    remat = WavKANConvND(psi_build="bcast", psi_remat=True, **kw)
    v = bcast.init(jax.random.PRNGKey(1), x, train=False)
    y0 = jax.jit(lambda v, x: bcast.apply(v, x, train=False))(v, x)
    y1 = jax.jit(lambda v, x: flat.apply(v, x, train=False))(v, x)
    y2 = jax.jit(lambda v, x: remat.apply(v, x, train=False))(v, x)
    np.testing.assert_array_equal(np.asarray(y0), np.asarray(y1))
    np.testing.assert_array_equal(np.asarray(y0), np.asarray(y2))

    def loss(module):
        def f(p):
            out, _ = module.apply(
                {"params": p, "batch_stats": v["batch_stats"]}, x,
                train=True, mutable=["batch_stats"],
                rngs={"dropout": jax.random.PRNGKey(2)})
            return jnp.sum(out ** 2)
        return jax.jit(jax.grad(f))(v["params"])

    g0, g1, g2 = loss(bcast), loss(flat), loss(remat)
    for a, b in zip(jax.tree_util.tree_leaves(g0),
                    jax.tree_util.tree_leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(g0),
                    jax.tree_util.tree_leaves(g2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_wav_psi_build_process_default():
    """set_wav_perf_defaults flips the process default; explicit ctor
    kwarg wins; unknown knobs are rejected."""
    from convkan_tpu.nn.wav_conv import set_wav_perf_defaults

    kw = dict(input_dim=4, output_dim=4, kernel_size=3, ndim=2)
    assert WavKANConvND(**kw)._psi_build_mode == "bcast"
    assert WavKANConvND(**kw)._psi_remat_on is False
    prev = set_wav_perf_defaults(psi_build="flat", psi_remat=True)
    try:
        assert WavKANConvND(**kw)._psi_build_mode == "flat"
        assert WavKANConvND(**kw)._psi_remat_on is True
        assert WavKANConvND(psi_build="bcast", **kw)._psi_build_mode == "bcast"
        assert WavKANConvND(psi_remat=False, **kw)._psi_remat_on is False
    finally:
        set_wav_perf_defaults(**prev)
    with pytest.raises(KeyError):
        set_wav_perf_defaults(nope=1)
