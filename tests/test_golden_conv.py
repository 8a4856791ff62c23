"""Per-family golden parity tests: conv layers vs the PyTorch reference.

Each test loads a committed .npz fixture (reference weights + input +
output on fixed seeds — see tools/goldens/dump_reference.py), grafts the
weights into the convkan_tpu module via utils/torch_compat, runs the
channel-last forward, and asserts 1e-5-scale agreement with the reference's
NCHW output.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from convkan_tpu.nn.kan_conv import KanConvND
from convkan_tpu.nn.wav_conv import WavKANConvND
from convkan_tpu.utils.torch_compat import convert_kan_conv, convert_wavkan_conv

from golden_utils import assert_close, graft, load_golden, nchw_to_nhwc, nhwc_to_nchw

CFGS = {
    "g1": dict(groups=1, padding=1, stride=1, dilation=1),
    "g2s2": dict(groups=2, padding=1, stride=2, dilation=1),
}

FAMILY_KW = {
    "kan": dict(grid_size=5, spline_order=3),
    "fastkan": dict(grid_size=8, grid_range=(-2.0, 2.0)),
    "cheby": dict(degree=3),
    "legendre": dict(degree=3),
    "gram": dict(degree=3),
    "jacobi": dict(degree=3, a=1.0, b=1.0),
    "bernstein": dict(degree=3),
    "bessel": dict(degree=3),
    "fibonacci": dict(degree=3),
    "fourier": dict(grid_size=3),
    "gegenbauer": dict(degree=3, alpha_param=0.5),
    "hermite": dict(degree=3),
    "laguerre": dict(degree=3, alpha=1.0),
    "lucas": dict(degree=3),
    "relukan": dict(g=5, k=3),
    "taylor": dict(degree=3),
}


def _run_layer(module, sd, family, groups, x_nchw):
    x = nchw_to_nhwc(x_nchw)  # goldens are float64; x64 is on in conftest
    variables = module.init(jax.random.PRNGKey(0), x, train=False)
    converted = convert_kan_conv(sd, family, groups)
    variables = graft(variables, converted)
    y = module.apply(variables, x, train=False)
    return nhwc_to_nchw(y)


@pytest.mark.parametrize("family", sorted(FAMILY_KW))
@pytest.mark.parametrize("tag", sorted(CFGS))
def test_conv2d_family(family, tag):
    x, y_ref, sd = load_golden(f"conv2d_{family}_{tag}")
    cfg = CFGS[tag]
    extra = {}
    if family == "kan":
        extra["grid_override"] = tuple(np.asarray(sd["grid"]).ravel()[:12])
    elif family == "fastkan":
        extra["grid_override"] = tuple(np.asarray(sd["rbf.grid"]).ravel())
    module = KanConvND(family=family, input_dim=6, output_dim=8,
                       kernel_size=3, ndim=2, param_dtype=jnp.float64,
                       **cfg, **FAMILY_KW[family], **extra)
    y = _run_layer(module, sd, family, cfg["groups"], x)
    assert_close(y, y_ref, name=f"conv2d_{family}_{tag}")


@pytest.mark.slow
@pytest.mark.parametrize("family", sorted(FAMILY_KW))
@pytest.mark.parametrize("rank", [1, 3])
def test_conv_rank_coverage(rank, family):
    """Every family x rank-1/3 vs the reference's per-family
    <Basis>KANConv{1,3}DLayer (VERDICT r1 #5: no gaps in the matrix)."""
    name = f"conv{rank}d_{family}_g1"
    x, y_ref, sd = load_golden(name)
    dims = dict(input_dim=6, output_dim=8) if rank == 1 else \
        dict(input_dim=4, output_dim=6)
    extra = {}
    if family == "kan":
        extra["grid_override"] = tuple(np.asarray(sd["grid"]).ravel()[:12])
    elif family == "fastkan":
        extra["grid_override"] = tuple(np.asarray(sd["rbf.grid"]).ravel())
    module = KanConvND(family=family, kernel_size=3, ndim=rank, padding=1,
                       param_dtype=jnp.float64, **dims,
                       **FAMILY_KW[family], **extra)
    y = _run_layer(module, sd, family, 1, x)
    assert_close(y, y_ref, name=name)


@pytest.mark.parametrize("family", ["kan", "cheby"])
def test_conv2d_kernel5_dilation2(family):
    x, y_ref, sd = load_golden(f"conv2d_{family}_k5d2")
    extra = {}
    if family == "kan":
        extra["grid_override"] = tuple(np.asarray(sd["grid"]).ravel()[:12])
    module = KanConvND(family=family, input_dim=6, output_dim=8,
                       kernel_size=5, ndim=2, padding=4, dilation=2,
                       degree=3, param_dtype=jnp.float64, **extra)
    y = _run_layer(module, sd, family, 1, x)
    assert_close(y, y_ref, name=f"conv2d_{family}_k5d2")


def test_conv2d_kan_batchnorm():
    from convkan_tpu.utils.norms import BatchNorm
    from convkan_tpu.utils.torch_compat import _convert_group_norms

    x, y_ref, sd = load_golden("conv2d_kan_bn")
    module = KanConvND(family="kan", input_dim=6, output_dim=8,
                       kernel_size=3, ndim=2, padding=1, grid_size=5,
                       spline_order=3, norm_layer=BatchNorm,
                       grid_override=tuple(np.asarray(sd["grid"]).ravel()[:12]),
                       param_dtype=jnp.float64)
    xh = nchw_to_nhwc(x)
    variables = module.init(jax.random.PRNGKey(0), xh, train=False)
    converted = convert_kan_conv(sd, "kan", 1)
    np_, ns_ = _convert_group_norms(sd, "layer_norm", 1)
    if np_:
        converted["__norm_params__"] = np_
    if ns_:
        converted["__norm_stats__"] = ns_
    variables = graft(variables, converted, norm_scope="BatchNorm_0")
    y = nhwc_to_nchw(module.apply(variables, xh, train=False))
    assert_close(y, y_ref, name="conv2d_kan_bn")


@pytest.mark.parametrize("tag,norm", [("bn", "BatchNorm2d"), ("ln", "LayerNorm")])
def test_conv2d_fastkan_grouped_norm(tag, norm):
    """Per-group FastKAN input norm (fast_kan_layers.py:80,106): one
    norm_class(in_g) instance per group slice — including running stats per
    group (bn) and torch's trailing-axis LayerNorm semantics (ln)."""
    x, y_ref, sd = load_golden(f"conv2d_fastkan_g2_{tag}")
    module = KanConvND(family="fastkan", input_dim=6, output_dim=8,
                       kernel_size=3, ndim=2, groups=2, padding=1,
                       grid_size=8, grid_range=(-2.0, 2.0),
                       norm_layer=norm, param_dtype=jnp.float64,
                       grid_override=tuple(np.asarray(sd["rbf.grid"]).ravel()))
    y = _run_layer(module, sd, "fastkan", 2, x)
    assert_close(y, y_ref, name=f"conv2d_fastkan_g2_{tag}")


@pytest.mark.parametrize("rank,name,dims,groups", [
    (1, "conv1d_wavkan_fast", (6, 8), 1),
    (3, "conv3d_wavkan_fast", (4, 6), 1),
    (1, "conv1d_wavkan_fast_g2", (6, 8), 2),
    (3, "conv3d_wavkan_fast_g2", (4, 6), 2),
])
def test_wavkan_conv_ranks(rank, name, dims, groups):
    x, y_ref, sd = load_golden(name)
    module = WavKANConvND(input_dim=dims[0], output_dim=dims[1],
                          kernel_size=3, ndim=rank, padding=1, groups=groups,
                          wav_version="fast", param_dtype=jnp.float64)
    xh = nchw_to_nhwc(x)
    variables = module.init(jax.random.PRNGKey(0), xh, train=False)
    converted = convert_wavkan_conv(sd, groups=groups, wav_version="fast")
    from convkan_tpu.utils.torch_compat import _convert_group_norms
    np_, ns_ = _convert_group_norms(sd, "layer_norm", groups)
    if np_:
        converted["__norm_params__"] = np_
    if ns_:
        converted["__norm_stats__"] = ns_
    variables = graft(variables, converted, norm_scope="BatchNorm_0")
    y = nhwc_to_nchw(module.apply(variables, xh, train=False))
    assert_close(y, y_ref, name=name)


@pytest.mark.parametrize("wt", ["mexican_hat", "morlet", "dog", "meyer", "shannon"])
def test_wavkan_conv_types(wt):
    x, y_ref, sd = load_golden(f"conv2d_wavkan_fast_{wt}")
    module = WavKANConvND(input_dim=6, output_dim=8, kernel_size=3, ndim=2,
                          padding=1, wav_version="fast", wavelet_type=wt,
                          param_dtype=jnp.float64)
    xh = nchw_to_nhwc(x)
    variables = module.init(jax.random.PRNGKey(0), xh, train=False)
    converted = convert_wavkan_conv(sd, groups=1, wav_version="fast")
    # bare-layer default norm is BatchNorm (affine + running stats)
    from convkan_tpu.utils.torch_compat import _convert_group_norms
    np_, ns_ = _convert_group_norms(sd, "layer_norm", 1)
    if np_:
        converted["__norm_params__"] = np_
    if ns_:
        converted["__norm_stats__"] = ns_
    variables = graft(variables, converted, norm_scope="BatchNorm_0")
    y = nhwc_to_nchw(module.apply(variables, xh, train=False))
    assert_close(y, y_ref, name=f"wavkan_{wt}")


@pytest.mark.parametrize("ver", ["base", "fast", "fast_plus_one"])
def test_wavkan_conv_versions(ver):
    """All three reference engines map onto the one fused TPU contraction."""
    x, y_ref, sd = load_golden(f"conv2d_wavkan_{ver}_g2")
    module = WavKANConvND(input_dim=6, output_dim=8, kernel_size=3, ndim=2,
                          padding=1, groups=2, wav_version=ver,
                          wavelet_type="mexican_hat", param_dtype=jnp.float64)
    xh = nchw_to_nhwc(x)
    variables = module.init(jax.random.PRNGKey(0), xh, train=False)
    converted = convert_wavkan_conv(sd, groups=2, wav_version=ver)
    from convkan_tpu.utils.torch_compat import _convert_group_norms
    np_, ns_ = _convert_group_norms(sd, "layer_norm", 2)
    if np_:
        converted["__norm_params__"] = np_
    if ns_:
        converted["__norm_stats__"] = ns_
    variables = graft(variables, converted, norm_scope="BatchNorm_0")
    y = nhwc_to_nchw(module.apply(variables, xh, train=False))
    assert_close(y, y_ref, name=f"wavkan_{ver}")


@pytest.mark.parametrize("family", sorted(FAMILY_KW))
def test_degree_major_fast_path_matches_stacked(family, monkeypatch):
    """The groups==1 degree-major concat path (weight rows permuted) equals
    the stacked channel-major fallback bit-for-bit at f64."""
    kw = dict(family=family, input_dim=6, output_dim=8, kernel_size=3,
              ndim=2, padding=1, param_dtype=jnp.float64,
              **FAMILY_KW[family])
    m = KanConvND(**kw)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 8, 6), jnp.float64)
    v = m.init(jax.random.PRNGKey(1), x, train=False)
    y_fast = m.apply(v, x, train=False)
    monkeypatch.setattr(KanConvND, "_expand_cols",
                        lambda self, xx, beta=None: None)
    y_stacked = m.apply(v, x, train=False)
    np.testing.assert_allclose(np.asarray(y_fast), np.asarray(y_stacked),
                               atol=1e-12, rtol=1e-12)


@pytest.mark.parametrize("family", sorted(FAMILY_KW))
def test_basis_build_stack_matches_concat(family):
    """basis_build='stack' (stack+collapsing-reshape assembly) is
    bit-identical to the default 'concat' chain — it is a pure
    XLA-producer-shape change (see KanConvND.basis_build)."""
    kw = dict(family=family, input_dim=6, output_dim=8, kernel_size=3,
              ndim=2, padding=1, **FAMILY_KW[family])
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 8, 6), jnp.float32)
    outs = {}
    for mode in ("concat", "stack"):
        m = KanConvND(basis_build=mode, **kw)
        v = m.init(jax.random.PRNGKey(1), x, train=False)
        outs[mode] = np.asarray(m.apply(v, x, train=False))
    np.testing.assert_array_equal(outs["concat"], outs["stack"])


@pytest.mark.parametrize("family,exact", [("kan", False), ("fastkan", True),
                                          ("cheby", True)])
def test_basis_build_bcast_matches_concat(family, exact):
    """basis_build='bcast' (single-operand broadcast expansion) equals the
    concat path bit-for-bit for fastkan/cheby (same elementwise ops with
    per-lane constants) and to f32 roundoff for kan (cardinal-bump
    evaluation, bspline_basis_cardinal_flat)."""
    kw = dict(family=family, input_dim=6, output_dim=8, kernel_size=3,
              ndim=2, padding=1, **FAMILY_KW[family])
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 8, 6), jnp.float32)
    outs = {}
    for mode in ("concat", "bcast"):
        m = KanConvND(basis_build=mode, **kw)
        v = m.init(jax.random.PRNGKey(1), x, train=False)
        outs[mode] = np.asarray(m.apply(v, x, train=False))
    if exact:
        np.testing.assert_array_equal(outs["concat"], outs["bcast"])
    else:
        np.testing.assert_allclose(outs["concat"], outs["bcast"],
                                   atol=3e-5, rtol=1e-5)


def test_island_bf16_close_and_f32_contract():
    """island_bf16: output/grads stay f32, values within bf16 tolerance of
    the f32 path, and the fallback (groups>1) path also honors the flag."""
    kw = dict(family="kan", input_dim=6, output_dim=8, kernel_size=3,
              ndim=2, padding=1, grid_size=5, spline_order=3)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 8, 6), jnp.float32)
    for groups in (1, 2):
        ys = {}
        for isl in (False, True):
            m = KanConvND(island_bf16=isl, groups=groups, **{**kw,
                          "input_dim": 6, "output_dim": 8})
            v = m.init(jax.random.PRNGKey(1), x, train=False)
            y = m.apply(v, x, train=False)
            assert y.dtype == jnp.float32
            ys[isl] = np.asarray(y)
        np.testing.assert_allclose(ys[False], ys[True], atol=0.15, rtol=0.1)

        m = KanConvND(island_bf16=True, groups=groups, **kw)
        v = m.init(jax.random.PRNGKey(1), x, train=False)
        g = jax.grad(lambda p: jnp.sum(
            m.apply({"params": p}, x, train=False) ** 2))(v["params"])
        for leaf in jax.tree_util.tree_leaves(g):
            assert leaf.dtype == jnp.float32
            assert np.isfinite(np.asarray(leaf)).all()


def test_set_perf_defaults_reaches_new_instances():
    """Flax modules are dataclasses — assigning KanConvND.basis_bf16 after
    class creation is a silent no-op (the default is baked into __init__).
    set_perf_defaults is the working process-wide override; explicit
    constructor kwargs still win.  Regression for the bench A/B variants,
    which once used the no-op form and measured the baseline."""
    from convkan_tpu.nn.kan_conv import set_perf_defaults

    kw = dict(input_dim=3, output_dim=4, kernel_size=3, ndim=2, family="kan")
    m0 = KanConvND(**kw)
    assert (m0._basis_bf16_on, m0._island_bf16_on, m0._basis_build_mode) == (
        False, False, "concat")
    prev = set_perf_defaults(basis_bf16=True, island_bf16=True,
                             basis_build="stack")
    try:
        m1 = KanConvND(**kw)
        assert (m1._basis_bf16_on, m1._island_bf16_on,
                m1._basis_build_mode) == (True, True, "stack")
        m2 = KanConvND(basis_bf16=False, island_bf16=False,
                       basis_build="concat", **kw)
        assert (m2._basis_bf16_on, m2._island_bf16_on,
                m2._basis_build_mode) == (False, False, "concat")
    finally:
        set_perf_defaults(**prev)
    with pytest.raises(KeyError):
        set_perf_defaults(nonexistent_knob=1)
