"""Convert PyTorch-reference state_dicts to convkan_tpu parameter pytrees.

Lets users of the reference (GadGadGad/Convolutional-KAN-for-Image-
Classification) load their trained weights into this framework, and powers
the golden parity tests.  Input is a flat {name: np.ndarray} mapping (a
torch state_dict with tensors converted to numpy).

Layout transforms:
  * torch conv weight (O, I, *K)  ->  HWIO (*K, I, O)
  * per-group ModuleList convs    ->  one HWIO weight, group-major O
  * torch linear (O, I)           ->  (I, O)
"""

from __future__ import annotations

from typing import Any, Dict, Mapping

import numpy as np


def _hwio(w: np.ndarray) -> np.ndarray:
    """(O, I, *K) -> (*K, I, O)."""
    nd = w.ndim
    perm = tuple(range(2, nd)) + (1, 0)
    return np.transpose(w, perm)


def _stack_group_convs(sd: Mapping[str, np.ndarray], prefix: str, groups: int):
    """ModuleList of per-group conv weights -> single HWIO weight with
    group-major O."""
    ws = [_hwio(np.asarray(sd[f"{prefix}.{g}.weight"])) for g in range(groups)]
    return np.concatenate(ws, axis=-1)


def _poly_weights_5d(sd, key="poly_weights"):
    """(G, out_g, in_g*K, *k) -> (*k, in_g*K, G*out_g)."""
    w = np.asarray(sd[key])
    ws = [_hwio(w[g]) for g in range(w.shape[0])]
    return np.concatenate(ws, axis=-1)


def convert_kan_conv(sd: Mapping[str, np.ndarray], family: str, groups: int,
                     spline_key: str = None) -> Dict[str, Any]:
    """Build the params dict for convkan_tpu.nn.KanConvND from a reference
    conv layer state_dict."""
    params: Dict[str, Any] = {}

    if f"base_conv.0.weight" in sd:
        params["base_w"] = _stack_group_convs(sd, "base_conv", groups)

    if spline_key is None:
        for cand in ("spline_conv", "poly_conv", "fourier_conv", "relukan_conv"):
            if f"{cand}.0.weight" in sd:
                spline_key = cand
                break
    if spline_key is not None and f"{spline_key}.0.weight" in sd:
        params["poly_w"] = _stack_group_convs(sd, spline_key, groups)
    elif "poly_weights" in sd:
        params["poly_w"] = _poly_weights_5d(sd)

    if "beta_weights" in sd:
        params["beta_weights"] = np.asarray(sd["beta_weights"])

    if "phase_low" in sd:
        # (1, in_g, g+k, 1...) -> (in_g, g+k)
        pl = np.asarray(sd["phase_low"])
        ph = np.asarray(sd["phase_high"])
        params["phase_low"] = pl.reshape(pl.shape[1], pl.shape[2])
        params["phase_high"] = ph.reshape(ph.shape[1], ph.shape[2])

    prelu_keys = sorted(
        (k for k in sd if k.startswith("prelus.")),
        key=lambda s: int(s.split(".")[1]),
    )
    if prelu_keys:
        params["prelu"] = np.asarray(
            [np.asarray(sd[k]).reshape(()) for k in prelu_keys]
        )

    # Norm parameters (InstanceNorm default is affine-free; BatchNorm /
    # affine InstanceNorm map per-group params onto the full-width module).
    # Returned under reserved keys; the caller grafts them onto the flax
    # norm submodule scope (auto-named, e.g. 'BatchNorm_0').
    norm_params, norm_stats = _convert_group_norms(sd, "layer_norm", groups)
    if norm_params:
        params["__norm_params__"] = norm_params
    if norm_stats:
        params["__norm_stats__"] = norm_stats
    return params


def _convert_group_norms(sd, prefix, groups):
    """Per-group norm ModuleList -> full-width channel-last norm params."""
    weights, biases, means, variances = [], [], [], []
    for g in range(groups):
        if f"{prefix}.{g}.weight" in sd:
            weights.append(np.asarray(sd[f"{prefix}.{g}.weight"]))
            biases.append(np.asarray(sd[f"{prefix}.{g}.bias"]))
        if f"{prefix}.{g}.running_mean" in sd:
            means.append(np.asarray(sd[f"{prefix}.{g}.running_mean"]))
            variances.append(np.asarray(sd[f"{prefix}.{g}.running_var"]))
    params = {}
    stats = {}
    if weights:
        params = {"weight": np.concatenate(weights),
                  "bias": np.concatenate(biases)}
    if means:
        stats = {"mean": np.concatenate(means),
                 "var": np.concatenate(variances)}
    return params, stats


def convert_wavkan_conv(sd: Mapping[str, np.ndarray], groups: int,
                        wav_version: str) -> Dict[str, Any]:
    """Reference WavKANConvNDLayer state_dict -> WavKANConvND params.

    All three engines carry the same information; see nn/wav_conv.py.
    """
    params: Dict[str, Any] = {}
    params["base_w"] = _stack_group_convs(sd, "base_conv", groups)

    scales, trans, wavs, mixes = [], [], [], []
    for g in range(groups):
        p = f"wavelet_conv.{g}"
        s = np.asarray(sd[f"{p}.scale"])        # (1, out_g, in_g, 1...)
        t = np.asarray(sd[f"{p}.translation"])
        out_g, in_g = s.shape[1], s.shape[2]
        scales.append(s.reshape(out_g, in_g))
        trans.append(t.reshape(out_g, in_g))

        if wav_version == "fast":
            w = np.asarray(sd[f"{p}.wavelet_weights.weight"])  # (out_g, in_g, *k)
        elif wav_version == "base":
            w = np.concatenate(
                [np.asarray(sd[f"{p}.wavelet_weights.{o}.weight"])
                 for o in range(out_g)], axis=0)               # (out_g, in_g, *k)
        elif wav_version == "fast_plus_one":
            w = np.asarray(sd[f"{p}.wavelet_weights.weight"])  # (out_g,1,in_g,*k)
            w = w.reshape((w.shape[0],) + w.shape[2:])
        else:
            raise ValueError(wav_version)
        wavs.append(_hwio(w))
        mixes.append(_hwio(np.asarray(sd[f"{p}.wavelet_out.weight"])))

    params["scale"] = np.stack(scales)          # (G, out_g, in_g)
    params["translation"] = np.stack(trans)
    params["wavelet_w"] = np.concatenate(wavs, axis=-1)
    params["wavelet_out_w"] = np.concatenate(mixes, axis=-1)
    return params


def convert_linear(w: np.ndarray) -> np.ndarray:
    """torch (O, I) -> (I, O)."""
    return np.asarray(w).T


# reference factory keys -> convkan_tpu family strings
REF_FAMILY = {
    "KAN": "kan", "FastKAN": "fastkan", "ChebyKAN": "cheby",
    "LegendreKAN": "legendre", "GRAMKAN": "gram", "JacobiKAN": "jacobi",
    "BersnsteinKAN": "bernstein", "BesselKAN": "bessel",
    "FibonacciKAN": "fibonacci", "FourierKAN": "fourier",
    "GegenbauerKAN": "gegenbauer", "HermiteKAN": "hermite",
    "LaguerreKAN": "laguerre", "LucasKAN": "lucas", "ReLUKAN": "relukan",
    "TaylorKAN": "taylor",
}


def convert_vggkan(sd: Mapping[str, np.ndarray], model, variables):
    """Migrate a reference VGGKAN state_dict (models/kan_vgg.py:190) into
    convkan_tpu.models.VGGKAN variables.

    Supports every kanconv family for the feature extractor and the
    Linear / 'KAN' (B-spline stack) classifier heads.  `variables` is an
    init tree of the target model (provides scope names / shapes).
    """
    import jax

    family = REF_FAMILY[model.kan_conv or "KAN"]
    params = dict(jax.tree_util.tree_map(np.asarray,
                                         jax.device_get(variables))["params"])

    # feature convs: reference indices include the parameter-less MaxPool
    # entries; enumerate the indices that actually carry conv params
    feat_idx = sorted({int(k.split(".")[1]) for k in sd
                       if k.startswith("features.")})
    for j, idx in enumerate(feat_idx):
        sub = {k[len(f"features.{idx}."):]: v for k, v in sd.items()
               if k.startswith(f"features.{idx}.")}
        # unwrap the L1 module wrapper if present (keys 'module.*')
        if any(k.startswith("module.") for k in sub):
            sub = {k[len("module."):]: v for k, v in sub.items()}
        conv = convert_kan_conv(sub, family, model.groups)
        scope = f"KanConvND_{j}"
        assert scope in params, f"{scope} not in {sorted(params)[:8]}..."
        tgt = dict(params[scope])
        for k, v in conv.items():
            if not k.startswith("__"):
                tgt[k] = np.asarray(v)
        params[scope] = tgt

    # classifier
    if model.classifier_type == "Linear":
        w = sd["classifier.1.weight"]
        params["Linear_0"] = {"w": convert_linear(w),
                              "b": np.asarray(sd["classifier.1.bias"])}
    elif model.classifier_type == "KAN":
        # Sequential(Dropout, KAN-stack): classifier.1.layers.{j}.*
        stack = {k[len("classifier.1."):]: v for k, v in sd.items()
                 if k.startswith("classifier.1.")}
        mlp_scope = next(k for k in params if k.startswith("KanMLP"))
        mlp = dict(params[mlp_scope])
        j = 0
        while any(k.startswith(f"layers.{j}.") for k in stack):
            sub = {k[len(f"layers.{j}."):]: v for k, v in stack.items()
                   if k.startswith(f"layers.{j}.")}
            if not sub:
                j += 1
                continue
            if "base_weight" in sub:  # a KANLayer (b-spline head)
                scope = f"KANLinear_{j}"
                K = sub["spline_weight"].shape[-1]
                out_f = sub["base_weight"].shape[0]
                inner = dict(mlp[scope])
                inner["base_w"] = convert_linear(sub["base_weight"])
                inner["spline_w"] = convert_linear(
                    sub["spline_weight"].reshape(out_f, -1))
                inner["prelu"] = np.asarray(sub["prelu.weight"]).reshape(())
                ln = dict(inner["LayerNorm_0"])
                ln["weight"] = np.asarray(sub["layer_norm.weight"])
                ln["bias"] = np.asarray(sub["layer_norm.bias"])
                inner["LayerNorm_0"] = ln
                mlp[scope] = inner
            j += 1
        params[mlp_scope] = mlp
    out = {"params": params}
    for col, v in variables.items():
        if col != "params":
            out[col] = v
    return out


def _graft_feature_convs(sd, params, family: str, groups: int,
                         prefix: str = "features"):
    """Copy every `<prefix>.{idx}` reference conv into KanConvND_{j},
    including affine norm params (weight/bias into the auto-named norm
    child scope)."""
    feat_idx = sorted({int(k.split(".")[1]) for k in sd
                       if k.startswith(prefix + ".")})
    for j, idx in enumerate(feat_idx):
        sub = {k[len(f"{prefix}.{idx}."):]: v for k, v in sd.items()
               if k.startswith(f"{prefix}.{idx}.")}
        if any(k.startswith("module.") for k in sub):
            sub = {k[len("module."):]: v for k, v in sub.items()}
        conv = convert_kan_conv(sub, family, groups)
        scope = f"KanConvND_{j}"
        assert scope in params, f"{scope} not in {sorted(params)[:8]}..."
        tgt = dict(params[scope])
        for k, v in conv.items():
            if not k.startswith("__"):
                tgt[k] = np.asarray(v)
        np_ = conv.get("__norm_params__")
        if np_:
            nscope = next((k for k in tgt if "Norm" in k), None)
            assert nscope is not None, f"no norm scope in {sorted(tgt)}"
            ns = dict(tgt[nscope])
            ns.update({k: np.asarray(v) for k, v in np_.items()})
            tgt[nscope] = ns
        params[scope] = tgt


def convert_alexnet(sd: Mapping[str, np.ndarray], model, variables):
    """Migrate a reference AlexNetKAN state_dict (models/kan_alexnet.py:11-
    313) into convkan_tpu.models.AlexNetKAN variables (Linear or 'AlexNet'
    classifier; kanconv features of any family)."""
    import jax

    family = REF_FAMILY[model.kan_conv or "KAN"]
    params = dict(jax.tree_util.tree_map(np.asarray,
                                         jax.device_get(variables))["params"])
    _graft_feature_convs(sd, params, family, model.groups)

    # classifier Sequential uses NAMED modules fc1/fc2/fc3
    # (kan_alexnet.py:178-224) -> our Linear_0/1/2
    for j, fc in enumerate(("fc1", "fc2", "fc3")):
        wk = f"classifier.{fc}.weight"
        if wk not in sd:
            continue
        params[f"Linear_{j}"] = {
            "w": convert_linear(sd[wk]),
            "b": np.asarray(sd[f"classifier.{fc}.bias"]),
        }

    out = {"params": params}
    for col, v in variables.items():
        if col != "params":
            out[col] = v
    return out
