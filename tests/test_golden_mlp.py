"""Golden parity tests: dense (MLP) KAN layers vs the PyTorch reference."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from convkan_tpu.nn import kan_linear as kl
from convkan_tpu.utils.torch_compat import convert_linear as T

from golden_utils import assert_close, graft, load_golden


def _apply(module, converted, x, norm_scope=None):
    variables = module.init(jax.random.PRNGKey(0), x, train=False)
    variables = graft(variables, converted, norm_scope=norm_scope)
    return module.apply(variables, x, train=False)


def test_mlp_kan():
    x, y_ref, sd = load_golden("mlp_kan")
    grid = np.asarray(sd["grid"])
    m = kl.KANLinear(param_dtype=jnp.float64, input_dim=12, output_dim=5,
                     grid_size=5, spline_order=3,
                     grid_override=tuple(grid[0] if grid.ndim == 2 else grid))
    K = 5 + 3
    conv = {
        "base_w": T(sd["base_weight"]),
        "spline_w": T(sd["spline_weight"].reshape(5, 12 * K)),
        "prelu": np.asarray(sd["prelu.weight"]).reshape(()),
        "__norm_params__": {"weight": sd["layer_norm.weight"],
                            "bias": sd["layer_norm.bias"]},
    }
    y = _apply(m, conv, x, norm_scope="LayerNorm_0")
    assert_close(y, y_ref, name="mlp_kan")


def test_mlp_fastkan():
    x, y_ref, sd = load_golden("mlp_fastkan")
    m = kl.FastKANLinear(param_dtype=jnp.float64, input_dim=12, output_dim=5,
                         grid_override=tuple(np.asarray(sd["rbf.grid"]).ravel()))
    conv = {
        "spline_w": T(sd["spline_linear.weight"]),
        "base_w": T(sd["base_linear.weight"]),
        "base_b": sd["base_linear.bias"],
        "__norm_params__": {"weight": sd["layernorm.weight"],
                            "bias": sd["layernorm.bias"]},
    }
    y = _apply(m, conv, x, norm_scope="LayerNorm_0")
    assert_close(y, y_ref, name="mlp_fastkan")


def test_mlp_cheby():
    x, y_ref, sd = load_golden("mlp_cheby")
    m = kl.ChebyKANLinear(param_dtype=jnp.float64, input_dim=12, output_dim=5, degree=3)
    y = _apply(m, {"coeffs": sd["cheby_coeffs"]}, x)
    assert_close(y, y_ref, name="mlp_cheby")


def test_mlp_legendre():
    x, y_ref, sd = load_golden("mlp_legendre")
    m = kl.LegendreKANLinear(param_dtype=jnp.float64, input_dim=12, output_dim=5, degree=3)
    conv = {
        "base_w": T(sd["base_weight"]),
        "poly_w": T(sd["poly_weight"]),
        "__norm_params__": {"weight": sd["layer_norm.weight"],
                            "bias": sd["layer_norm.bias"]},
    }
    y = _apply(m, conv, x, norm_scope="LayerNorm_0")
    assert_close(y, y_ref, name="mlp_legendre")


def test_mlp_gram():
    x, y_ref, sd = load_golden("mlp_gram")
    m = kl.GRAMKANLinear(param_dtype=jnp.float64, input_dim=12, output_dim=5, degree=3)
    conv = {
        "base_w": T(sd["base_weights"]),
        "coeffs": sd["grams_basis_weights"],
        "beta_weights": sd["beta_weights"],
        "__norm_params__": {"weight": sd["norm.weight"],
                            "bias": sd["norm.bias"]},
    }
    y = _apply(m, conv, x, norm_scope="LayerNorm_0")
    assert_close(y, y_ref, name="mlp_gram")


def test_mlp_jacobi():
    x, y_ref, sd = load_golden("mlp_jacobi")
    m = kl.JacobiKANLinear(param_dtype=jnp.float64, input_dim=12, output_dim=5, degree=3)
    conv = {
        "base_w": T(sd["base_weights"]),
        "coeffs": sd["jacobi_coeffs"],
        "__norm_params__": {"weight": sd["norm.weight"],
                            "bias": sd["norm.bias"]},
    }
    y = _apply(m, conv, x, norm_scope="LayerNorm_0")
    assert_close(y, y_ref, name="mlp_jacobi")


def test_mlp_bernstein():
    x, y_ref, sd = load_golden("mlp_bernstein")
    m = kl.BersnsteinKANLinear(param_dtype=jnp.float64, input_dim=12, output_dim=5, degree=3)
    conv = {
        "base_w": T(sd["base_weights"]),
        "coeffs": sd["bernstein_coeffs"],
        "__norm_params__": {"weight": sd["norm.weight"],
                            "bias": sd["norm.bias"]},
    }
    y = _apply(m, conv, x, norm_scope="LayerNorm_0")
    assert_close(y, y_ref, name="mlp_bernstein")


@pytest.mark.parametrize("fam,key,extra", [
    ("bessel", "bessel_coeffs", {}),
    ("fibonacci", "fib_coeffs", {}),
    ("gegenbauer", "gegenbauer_coeffs", {"alpha": 0.5}),
    ("hermite", "hermite_coeffs", {}),
    ("laguerre", "laguerre_coeffs", {"alpha": 1.0}),
    ("lucas", "lucas_coeffs", {}),
])
def test_mlp_einsum_families(fam, key, extra):
    x, y_ref, sd = load_golden(f"mlp_{fam}")
    m = kl._EinsumOnlyKanLinear(param_dtype=jnp.float64, input_dim=12, output_dim=5, degree=3,
                                family=fam, **extra)
    y = _apply(m, {"coeffs": sd[key]}, x)
    assert_close(y, y_ref, name=f"mlp_{fam}")


def test_mlp_fourier():
    x, y_ref, sd = load_golden("mlp_fourier")
    m = kl.FourierKANLinear(param_dtype=jnp.float64, input_dim=12, output_dim=5, grid_size=3)
    y = _apply(m, {"coeffs": sd["fouriercoeffs"], "bias": sd["bias"]}, x)
    assert_close(y, y_ref, name="mlp_fourier")


def test_mlp_taylor():
    x, y_ref, sd = load_golden("mlp_taylor")
    m = kl.TaylorKANLinear(param_dtype=jnp.float64, input_dim=12, output_dim=5, degree=3, add_bias=True)
    y = _apply(m, {"coeffs": sd["coeffs"], "bias": sd["bias"]}, x)
    assert_close(y, y_ref, name="mlp_taylor")


def test_mlp_relukan():
    x, y_ref, sd = load_golden("mlp_relukan")
    m = kl.ReLUKANLinear(param_dtype=jnp.float64, input_dim=12, output_dim=5, g=5, k=3)
    w = sd["equal_size_conv.weight"]  # (out, 1, g+k, in)
    conv = {
        "phase_low": sd["phase_low"],
        "phase_high": sd["phase_high"],
        "conv_w": w.reshape(w.shape[0], -1).T,
        "conv_b": sd["equal_size_conv.bias"],
    }
    y = _apply(m, conv, x)
    assert_close(y, y_ref, name="mlp_relukan")


@pytest.mark.parametrize("wt", ["mexican_hat", "morlet", "dog", "meyer", "shannon"])
def test_mlp_wavkan(wt):
    name = "mlp_wavkan" if wt == "mexican_hat" else f"mlp_wavkan_{wt}"
    x, y_ref, sd = load_golden(name)
    m = kl.WavKANLinear(param_dtype=jnp.float64, input_dim=12, output_dim=5, wavelet_type=wt)
    conv = {
        "scale": sd["scale"],
        "translation": sd["translation"],
        "wavelet_w": sd["wavelet_weights"],
        "base_w": sd["weight1"],
        "__norm_params__": {"weight": sd["bn.weight"], "bias": sd["bn.bias"]},
        "__norm_stats__": {"mean": sd["bn.running_mean"],
                           "var": sd["bn.running_var"]},
    }
    y = _apply(m, conv, x, norm_scope="BatchNorm_0")
    assert_close(y, y_ref, name=name)
