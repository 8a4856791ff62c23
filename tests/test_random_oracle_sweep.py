"""Randomized oracle parity sweep: random ctor configs vs the reference.

The committed goldens pin FIXED configurations; this sweep draws random
constructor configurations per family (seeded — override with SWEEP_SEED /
SWEEP_N env vars), builds the reference PyTorch layer in float64
in-process (same oracle policy as tools/goldens/dump_reference.py), grafts
its state_dict into the convkan_tpu module via utils/torch_compat, and
asserts forward parity at golden (1e-9 f64) tolerance.  This covers
kernel/stride/dilation/groups/degree combinations no fixture pins —
fidelity is a property of the implementation, not of the fixture set.

Reference ctor vocabulary: layers/*.py (e.g. kan_layers.py:274,
jacobi_kan_layers.py:180, relu_kan_layers.py:149).  Slow; skipped when
/root/reference is not mounted.
"""

import os
import sys

import numpy as np
import pytest

REFERENCE = os.environ.get("REFERENCE_PATH", "/root/reference")
TOOLS = os.path.join(os.path.dirname(__file__), "..", "tools", "goldens")

pytestmark = [
    pytest.mark.slow,
    pytest.mark.skipif(not os.path.isdir(REFERENCE),
                       reason="reference tree not available"),
]

SEED = int(os.environ.get("SWEEP_SEED", "0"))
N_CFGS = int(os.environ.get("SWEEP_N", "2"))

FAMILIES = {
    # family -> (reference class name, per-family random extras)
    "kan": "KANConv2DLayer",
    "fastkan": "FastKANConv2DLayer",
    "cheby": "ChebyKANConv2DLayer",
    "legendre": "LegendreKANConv2DLayer",
    "gram": "GRAMKANConv2DLayer",
    "jacobi": "JacobiKANConv2DLayer",
    "bernstein": "BersnsteinKANConv2DLayer",
    "bessel": "BesselKANConv2DLayer",
    "fibonacci": "FibonacciKANConv2DLayer",
    "fourier": "FourierKANConv2DLayer",
    "gegenbauer": "GegenbauerKANConv2DLayer",
    "hermite": "HermiteKANConv2DLayer",
    "laguerre": "LaguerreKANConv2DLayer",
    "lucas": "LucasKANConv2DLayer",
    "relukan": "ReLUKANConv2DLayer",
    "taylor": "TaylorKANConv2DLayer",
}


def _ref_layers():
    sys.path.insert(0, TOOLS)
    sys.path.insert(0, REFERENCE)
    try:
        import tv_stub  # noqa: F401
        import layers

        return layers
    finally:
        sys.path.remove(TOOLS)
        sys.path.remove(REFERENCE)


def _draw_structure(rs):
    """Common structural draw, guaranteed to produce a >=1-sized output
    on a 9/10-pixel input."""
    groups = int(rs.choice([1, 2, 3]))
    in_g = int(rs.randint(1, 4))
    out_g = int(rs.randint(1, 4))
    return dict(
        input_dim=groups * in_g,
        output_dim=groups * out_g,
        kernel_size=int(rs.randint(1, 5)),
        groups=groups,
        padding=int(rs.randint(0, 3)),
        stride=int(rs.choice([1, 2])),
        dilation=int(rs.choice([1, 2])),
    )


def _draw_family_extras(family, rs):
    """(shared ref+jax kwargs, jax-only kwargs) for one random config."""
    if family == "kan":
        return dict(grid_size=int(rs.randint(3, 9)),
                    spline_order=int(rs.randint(2, 4))), {}
    if family == "fastkan":
        return dict(grid_size=int(rs.randint(4, 11))), {}
    if family == "fourier":
        return dict(grid_size=int(rs.randint(2, 5))), {}
    if family == "jacobi":
        return dict(degree=int(rs.randint(2, 5)),
                    a=float(rs.choice([0.5, 1.0, 1.5])),
                    b=float(rs.choice([0.5, 1.0, 1.5]))), {}
    if family == "gegenbauer":
        return dict(degree=int(rs.randint(2, 5)),
                    alpha_param=float(rs.choice([0.25, 0.5, 1.0]))), {}
    if family == "laguerre":
        return dict(degree=int(rs.randint(2, 5)),
                    alpha=float(rs.choice([0.5, 1.0]))), {}
    if family == "relukan":
        return dict(g=int(rs.randint(3, 7)), k=int(rs.randint(2, 4))), {}
    return dict(degree=int(rs.randint(2, 6))), {}


@pytest.fixture()
def torch_f64():
    torch = pytest.importorskip("torch")
    prev = torch.get_default_dtype()
    # some reference layers allocate plain tensor attrs in the default
    # dtype (e.g. kan_layers.py:184 grid) — match dump_reference.py
    torch.set_default_dtype(torch.float64)
    yield torch
    torch.set_default_dtype(prev)


@pytest.mark.parametrize("family", sorted(FAMILIES))
def test_random_config_sweep(family, torch_f64):
    import jax
    import jax.numpy as jnp

    from convkan_tpu.nn.kan_conv import KanConvND
    from convkan_tpu.utils.torch_compat import convert_kan_conv

    from golden_utils import (assert_close, graft, nchw_to_nhwc,
                              nhwc_to_nchw)

    torch = torch_f64
    layers = _ref_layers()
    cls = getattr(layers, FAMILIES[family])

    base_seed = SEED * 1000 + sorted(FAMILIES).index(family)
    for i in range(N_CFGS):
        rs = np.random.RandomState(base_seed + i)
        struct = _draw_structure(rs)
        shared, jax_only = _draw_family_extras(family, rs)

        torch.manual_seed(100 + i)
        ref = cls(struct["input_dim"], struct["output_dim"],
                  struct["kernel_size"],
                  groups=struct["groups"], padding=struct["padding"],
                  stride=struct["stride"], dilation=struct["dilation"],
                  **shared).double().eval()
        torch.manual_seed(200 + i)
        x = torch.randn(2, struct["input_dim"], 9, 9, dtype=torch.float64)
        with torch.no_grad():
            y_ref = ref(x).numpy()
        sd = {k: v.numpy() for k, v in ref.state_dict().items()}

        extra = dict(jax_only)
        if family == "kan":
            knots = shared["grid_size"] + 2 * shared["spline_order"] + 1
            extra["grid_override"] = tuple(
                np.asarray(ref.grid).ravel()[:knots])
        elif family == "fastkan":
            extra["grid_override"] = tuple(np.asarray(sd["rbf.grid"]).ravel())
            extra["grid_range"] = (-2.0, 2.0)

        module = KanConvND(family=family, ndim=2, param_dtype=jnp.float64,
                           **struct, **shared, **extra)
        xh = nchw_to_nhwc(x.numpy())
        variables = module.init(jax.random.PRNGKey(0), xh, train=False)
        converted = convert_kan_conv(sd, family, struct["groups"])
        variables = graft(variables, converted)
        y = nhwc_to_nchw(module.apply(variables, xh, train=False))
        assert_close(y, y_ref,
                     name=f"{family} cfg#{i} {struct} {shared}")


@pytest.mark.parametrize("wav_version", ["base", "fast", "fast_plus_one"])
def test_random_config_sweep_wavkan(wav_version, torch_f64):
    import jax
    import jax.numpy as jnp

    from convkan_tpu.nn.wav_conv import WavKANConvND
    from convkan_tpu.utils.torch_compat import (_convert_group_norms,
                                                convert_wavkan_conv)

    from golden_utils import (assert_close, graft, nchw_to_nhwc,
                              nhwc_to_nchw)

    torch = torch_f64
    layers = _ref_layers()
    cls = layers.WavKANConv2DLayer

    for i in range(N_CFGS):
        rs = np.random.RandomState(SEED * 1000 + 500
                                   + 10 * i + len(wav_version))
        struct = _draw_structure(rs)
        wt = str(rs.choice(["mexican_hat", "morlet", "dog", "meyer",
                            "shannon"]))

        torch.manual_seed(300 + i)
        ref = cls(struct["input_dim"], struct["output_dim"],
                  struct["kernel_size"], groups=struct["groups"],
                  padding=struct["padding"], stride=struct["stride"],
                  dilation=struct["dilation"], wavelet_type=wt,
                  wav_version=wav_version).double().eval()
        torch.manual_seed(400 + i)
        x = torch.randn(2, struct["input_dim"], 9, 9, dtype=torch.float64)
        with torch.no_grad():
            y_ref = ref(x).numpy()
        sd = {k: v.numpy() for k, v in ref.state_dict().items()}

        module = WavKANConvND(ndim=2, wavelet_type=wt,
                              wav_version=wav_version,
                              param_dtype=jnp.float64, **struct)
        xh = nchw_to_nhwc(x.numpy())
        variables = module.init(jax.random.PRNGKey(0), xh, train=False)
        converted = convert_wavkan_conv(sd, groups=struct["groups"],
                                        wav_version=wav_version)
        np_, ns_ = _convert_group_norms(sd, "layer_norm", struct["groups"])
        if np_:
            converted["__norm_params__"] = np_
        if ns_:
            converted["__norm_stats__"] = ns_
        variables = graft(variables, converted, norm_scope="BatchNorm_0")
        y = nhwc_to_nchw(module.apply(variables, xh, train=False))
        assert_close(y, y_ref,
                     name=f"wavkan {wav_version} {wt} cfg#{i} {struct}")


# ---------------------------------------------------------------- MLP sweep
def _mlp_case(family, rs):
    """(ref ctor kwargs-or-args builder, ours builder, convert, scope) for
    one random dense config.  Conversion maps mirror tests/test_golden_mlp
    (reference param names cite layers/*.py)."""
    import jax.numpy as jnp

    from convkan_tpu.nn import kan_linear as kl
    from convkan_tpu.utils.torch_compat import convert_linear as T

    i, o = int(rs.randint(3, 17)), int(rs.randint(2, 9))
    deg = int(rs.randint(2, 6))

    if family == "kan":
        g, so = int(rs.randint(3, 9)), int(rs.randint(2, 4))
        K = g + so

        def conv(sd):
            return (dict(
                base_w=T(sd["base_weight"]),
                spline_w=T(np.asarray(sd["spline_weight"]).reshape(o, i * K)),
                prelu=np.asarray(sd["prelu.weight"]).reshape(()),
                __norm_params__={"weight": sd["layer_norm.weight"],
                                 "bias": sd["layer_norm.bias"]},
            ), "LayerNorm_0")
        return (lambda L: L.KANLayer(i, o, grid_size=g, spline_order=so),
                lambda sd: kl.KANLinear(
                    param_dtype=jnp.float64, input_dim=i, output_dim=o,
                    grid_size=g, spline_order=so,
                    grid_override=tuple(np.asarray(sd["grid"]).ravel()
                                        [:g + 2 * so + 1])),
                conv)
    if family == "fastkan":
        n = int(rs.randint(4, 11))
        return (lambda L: L.FastKANLayer(i, o, num_grids=n),
                lambda sd: kl.FastKANLinear(
                    param_dtype=jnp.float64, input_dim=i, output_dim=o,
                    num_grids=n,
                    grid_override=tuple(np.asarray(sd["rbf.grid"]).ravel())),
                lambda sd: (dict(
                    spline_w=T(sd["spline_linear.weight"]),
                    base_w=T(sd["base_linear.weight"]),
                    base_b=sd["base_linear.bias"],
                    __norm_params__={"weight": sd["layernorm.weight"],
                                     "bias": sd["layernorm.bias"]},
                ), "LayerNorm_0"))
    if family == "cheby":
        return (lambda L: L.ChebyKANLayer(i, o, deg),
                lambda sd: kl.ChebyKANLinear(param_dtype=jnp.float64,
                                             input_dim=i, output_dim=o,
                                             degree=deg),
                lambda sd: (dict(coeffs=sd["cheby_coeffs"]), None))
    if family == "legendre":
        return (lambda L: L.LegendreKANLayer(i, o, deg),
                lambda sd: kl.LegendreKANLinear(param_dtype=jnp.float64,
                                                input_dim=i, output_dim=o,
                                                degree=deg),
                lambda sd: (dict(
                    base_w=T(sd["base_weight"]), poly_w=T(sd["poly_weight"]),
                    __norm_params__={"weight": sd["layer_norm.weight"],
                                     "bias": sd["layer_norm.bias"]},
                ), "LayerNorm_0"))
    if family == "gram":
        return (lambda L: L.GRAMKANLayer(i, o, deg),
                lambda sd: kl.GRAMKANLinear(param_dtype=jnp.float64,
                                            input_dim=i, output_dim=o,
                                            degree=deg),
                lambda sd: (dict(
                    base_w=T(sd["base_weights"]),
                    coeffs=sd["grams_basis_weights"],
                    beta_weights=sd["beta_weights"],
                    __norm_params__={"weight": sd["norm.weight"],
                                     "bias": sd["norm.bias"]},
                ), "LayerNorm_0"))
    if family == "jacobi":
        a = float(rs.choice([0.5, 1.0, 1.5]))
        b = float(rs.choice([0.5, 1.0, 1.5]))
        return (lambda L: L.JacobiKANLayer(i, o, deg, a=a, b=b),
                lambda sd: kl.JacobiKANLinear(param_dtype=jnp.float64,
                                              input_dim=i, output_dim=o,
                                              degree=deg, a=a, b=b),
                lambda sd: (dict(
                    base_w=T(sd["base_weights"]), coeffs=sd["jacobi_coeffs"],
                    __norm_params__={"weight": sd["norm.weight"],
                                     "bias": sd["norm.bias"]},
                ), "LayerNorm_0"))
    if family == "bernstein":
        return (lambda L: L.BersnsteinKANLayer(i, o, deg),
                lambda sd: kl.BersnsteinKANLinear(param_dtype=jnp.float64,
                                                  input_dim=i, output_dim=o,
                                                  degree=deg),
                lambda sd: (dict(
                    base_w=T(sd["base_weights"]),
                    coeffs=sd["bernstein_coeffs"],
                    __norm_params__={"weight": sd["norm.weight"],
                                     "bias": sd["norm.bias"]},
                ), "LayerNorm_0"))
    if family in ("bessel", "fibonacci", "gegenbauer", "hermite",
                  "laguerre", "lucas"):
        ref_cls = {"bessel": "BesselKANLayer", "fibonacci": "FibonacciKANLayer",
                   "gegenbauer": "GegenbauerKANLayer",
                   "hermite": "HermiteKANLayer",
                   "laguerre": "LaguerreKANLayer", "lucas": "LucasKANLayer"}
        key = {"bessel": "bessel_coeffs", "fibonacci": "fib_coeffs",
               "gegenbauer": "gegenbauer_coeffs", "hermite": "hermite_coeffs",
               "laguerre": "laguerre_coeffs", "lucas": "lucas_coeffs"}
        extra_ref, extra_ours = (), {}
        if family == "gegenbauer":
            al = float(rs.choice([0.25, 0.5, 1.0]))
            extra_ref, extra_ours = (al,), {"alpha": al}
        elif family == "laguerre":
            al = float(rs.choice([0.5, 1.0]))
            extra_ref, extra_ours = (al,), {"alpha": al}
        return (lambda L: getattr(L, ref_cls[family])(i, o, deg, *extra_ref),
                lambda sd: kl._EinsumOnlyKanLinear(
                    param_dtype=jnp.float64, input_dim=i, output_dim=o,
                    degree=deg, family=family, **extra_ours),
                lambda sd: (dict(coeffs=sd[key[family]]), None))
    if family == "fourier":
        g = int(rs.randint(2, 5))
        return (lambda L: L.FourierKANLayer(i, o, g),
                lambda sd: kl.FourierKANLinear(param_dtype=jnp.float64,
                                               input_dim=i, output_dim=o,
                                               grid_size=g),
                lambda sd: (dict(coeffs=sd["fouriercoeffs"],
                                 bias=sd["bias"]), None))
    if family == "taylor":
        return (lambda L: L.TaylorKANLayer(i, o, deg, add_bias=True),
                lambda sd: kl.TaylorKANLinear(param_dtype=jnp.float64,
                                              input_dim=i, output_dim=o,
                                              degree=deg, add_bias=True),
                lambda sd: (dict(coeffs=sd["coeffs"], bias=sd["bias"]), None))
    if family == "relukan":
        g, k = int(rs.randint(3, 7)), int(rs.randint(2, 4))

        def conv(sd):
            w = np.asarray(sd["equal_size_conv.weight"])
            return (dict(phase_low=sd["phase_low"],
                         phase_high=sd["phase_high"],
                         conv_w=w.reshape(w.shape[0], -1).T,
                         conv_b=sd["equal_size_conv.bias"]), None)
        return (lambda L: L.ReLUKANLayer(i, g, k, o),
                lambda sd: kl.ReLUKANLinear(param_dtype=jnp.float64,
                                            input_dim=i, output_dim=o,
                                            g=g, k=k),
                conv)
    if family == "wavkan":
        wt = str(rs.choice(["mexican_hat", "morlet", "dog", "meyer",
                            "shannon"]))
        return (lambda L: L.WavKANLayer(i, o, wavelet_type=wt),
                lambda sd: kl.WavKANLinear(param_dtype=jnp.float64,
                                           input_dim=i, output_dim=o,
                                           wavelet_type=wt),
                lambda sd: (dict(
                    scale=sd["scale"], translation=sd["translation"],
                    wavelet_w=sd["wavelet_weights"], base_w=sd["weight1"],
                    __norm_params__={"weight": sd["bn.weight"],
                                     "bias": sd["bn.bias"]},
                    __norm_stats__={"mean": sd["bn.running_mean"],
                                    "var": sd["bn.running_var"]},
                ), "BatchNorm_0"))
    raise KeyError(family)


MLP_FAMILIES = sorted(list(FAMILIES) + ["wavkan"])


@pytest.mark.parametrize("family", MLP_FAMILIES)
def test_random_mlp_sweep(family, torch_f64):
    import jax

    from golden_utils import assert_close, graft

    torch = torch_f64
    layers = _ref_layers()

    for idx in range(N_CFGS):
        rs = np.random.RandomState(SEED * 2000 + 900
                                   + 10 * idx + MLP_FAMILIES.index(family))
        build_ref, build_ours, convert = _mlp_case(family, rs)

        torch.manual_seed(500 + idx)
        ref = build_ref(layers).double().eval()
        sd = {k: v.numpy() for k, v in ref.state_dict().items()}
        if hasattr(ref, "grid") and ref.grid is not None:
            # the b-spline knot vector is a plain tensor attribute, not a
            # state_dict entry (kan_layers.py:184) — same export as
            # tools/goldens/dump_reference.py
            sd["grid"] = np.asarray(ref.grid.detach())
        module = build_ours(sd)
        torch.manual_seed(600 + idx)
        x = torch.randn(4, module.input_dim, dtype=torch.float64)
        with torch.no_grad():
            y_ref = ref(x).numpy()

        variables = module.init(jax.random.PRNGKey(0), x.numpy(),
                                train=False)
        converted, scope = convert(sd)
        variables = graft(variables, converted, norm_scope=scope)
        y = module.apply(variables, x.numpy(), train=False)
        assert_close(y, y_ref, name=f"mlp {family} cfg#{idx} "
                                    f"({module.input_dim}->"
                                    f"{module.output_dim})")
