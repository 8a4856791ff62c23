"""Export convkan_tpu variables back to a PyTorch-reference state_dict.

The inverse of `torch_compat.convert_vggkan`: TPU-trained VGGKAN weights
become a flat ``{name: np.ndarray}`` mapping with the reference's key
vocabulary and layouts (models/kan_vgg.py:190-304), loadable into the
reference classes with ``module.load_state_dict({k: torch.tensor(v) ...})``.
Completes the interop loop — reference→TPU migration exists in
`torch_compat`, this is TPU→reference.

Layout transforms (inverse of torch_compat's):
  * HWIO (*k, I, O)           ->  torch conv (O, I, *k)
  * group-major single weight ->  per-group ModuleList entries
  * (I, O) linear             ->  torch (O, I)

Tested scope (bit-exact round-trip against the committed reference
fixtures): B-spline KAN and ChebyKAN feature extractors, Linear and
KAN-stack classifier heads.  Other conv-list families follow the same
shapes and export through the same rules; families whose reference
layers keep a single 5-D ``poly_weights`` tensor are exported in that
form when the target layer carried it in.
"""

from __future__ import annotations

from typing import Any, Dict, Mapping

import numpy as np

__all__ = ["export_vggkan_state_dict", "export_kan_conv_state_dict"]


def _oihw(w: np.ndarray) -> np.ndarray:
    """(*k, I, O) -> (O, I, *k) — inverse of torch_compat._hwio."""
    nd = w.ndim
    return np.transpose(w, (nd - 1, nd - 2) + tuple(range(nd - 2)))


def _split_group_convs(w: np.ndarray, prefix: str, groups: int,
                       out: Dict[str, np.ndarray]):
    """Group-major HWIO weight -> ModuleList of torch conv weights."""
    out_g = w.shape[-1] // groups
    for g in range(groups):
        out[f"{prefix}.{g}.weight"] = _oihw(
            w[..., g * out_g:(g + 1) * out_g])


# family -> the reference ModuleList attribute holding the spline/poly
# convs (mirrors the candidate order convert_kan_conv probes)
_SPLINE_KEY = {"kan": "spline_conv", "fourier": "fourier_conv",
               "relukan": "relukan_conv"}


def export_kan_conv_state_dict(params: Mapping[str, Any], family: str,
                               groups: int,
                               stats: Mapping[str, Any] = None,
                               degree: int = None) -> Dict[str, np.ndarray]:
    """One KanConvND param scope -> the reference conv layer's state_dict
    entries (inverse of `torch_compat.convert_kan_conv`)."""
    sd: Dict[str, np.ndarray] = {}
    p = {k: np.asarray(v) for k, v in params.items()
         if not isinstance(v, Mapping)}
    scopes = {k: v for k, v in params.items() if isinstance(v, Mapping)}

    if "base_w" in p:
        _split_group_convs(p["base_w"], "base_conv", groups, sd)
    if "poly_w" in p:
        _split_group_convs(p["poly_w"], _SPLINE_KEY.get(family, "poly_conv"),
                           groups, sd)
    if "beta_weights" in p:
        sd["beta_weights"] = p["beta_weights"]
    if "phase_low" in p:
        # (in_g, g+k) -> reference buffer shape (1, in_g, g+k, 1, ...)
        nd_sp = p["poly_w"].ndim - 2 if "poly_w" in p else 2
        shape = (1,) + p["phase_low"].shape + (1,) * nd_sp
        sd["phase_low"] = p["phase_low"].reshape(shape)
        sd["phase_high"] = p["phase_high"].reshape(shape)
    if "prelu" in p:
        for g in range(p["prelu"].shape[0]):
            sd[f"prelus.{g}.weight"] = p["prelu"][g].reshape(1)
    if family == "cheby" and degree is not None:
        # reference buffer shape (1, 1, deg+1, *1s) — cheby_kan_layers.py:85-86
        nd_sp = p["poly_w"].ndim - 2 if "poly_w" in p else 2
        sd["arange"] = np.arange(0, degree + 1, 1).reshape(
            (1, 1, -1) + (1,) * nd_sp)

    stats = dict(stats or {})
    if family == "fastkan":
        # per-group input norms -> layer_norm ModuleList
        for g in range(groups):
            scope = f"input_norm_{g}"
            if scope in scopes:
                for src, dst in (("weight", "weight"), ("bias", "bias")):
                    if src in scopes[scope]:
                        sd[f"layer_norm.{g}.{dst}"] = np.asarray(
                            scopes[scope][src])
            if scope in stats:
                sd[f"layer_norm.{g}.running_mean"] = np.asarray(
                    stats[scope]["mean"])
                sd[f"layer_norm.{g}.running_var"] = np.asarray(
                    stats[scope]["var"])
    else:
        # full-width output norm -> per-group ModuleList slices
        norm_scopes = [k for k in scopes if not k.startswith("input_norm")]
        if norm_scopes:
            (scope,) = norm_scopes
            w = scopes[scope]
            if "weight" in w:
                for g, (wg, bg) in enumerate(zip(
                        np.split(np.asarray(w["weight"]), groups),
                        np.split(np.asarray(w["bias"]), groups))):
                    sd[f"layer_norm.{g}.weight"] = wg
                    sd[f"layer_norm.{g}.bias"] = bg
        for scope, s in stats.items():
            if scope.startswith("input_norm"):
                continue
            for g, (mg, vg) in enumerate(zip(
                    np.split(np.asarray(s["mean"]), groups),
                    np.split(np.asarray(s["var"]), groups))):
                sd[f"layer_norm.{g}.running_mean"] = mg
                sd[f"layer_norm.{g}.running_var"] = vg
    return sd


def export_vggkan_state_dict(model, variables) -> Dict[str, np.ndarray]:
    """VGGKAN variables -> reference kan_vgg state_dict (flat numpy).

    Inverse of `torch_compat.convert_vggkan`; supports the Linear and
    'KAN' (B-spline stack) classifier heads it supports."""
    import jax

    from ..models.vgg import cfgs
    from .torch_compat import REF_FAMILY

    family = REF_FAMILY[model.kan_conv or "KAN"]
    tree = jax.tree_util.tree_map(np.asarray, jax.device_get(variables))
    params = tree["params"]
    stats = tree.get("batch_stats", {})

    sd: Dict[str, np.ndarray] = {}
    # feature extractor: torch Sequential index = position in the cfg
    # (pools hold an index but no params); flax scope = conv ordinal
    j = 0
    for idx, v in enumerate(cfgs[model.arch]):
        if v == "M":
            continue
        scope = f"KanConvND_{j}"
        layer_sd = export_kan_conv_state_dict(
            params[scope], family, model.groups,
            stats=stats.get(scope, {}),
            degree=getattr(model, "degree", None))
        for k, val in layer_sd.items():
            sd[f"features.{idx}.{k}"] = val
        j += 1

    if model.classifier_type == "Linear":
        sd["classifier.1.weight"] = params["Linear_0"]["w"].T
        sd["classifier.1.bias"] = params["Linear_0"]["b"]
    elif model.classifier_type == "KAN":
        mlp_scope = next(k for k in params if k.startswith("KanMLP"))
        mlp = params[mlp_scope]
        for scope, inner in mlp.items():
            if not scope.startswith("KANLinear_"):
                continue
            jj = int(scope.split("_")[-1])
            pre = f"classifier.1.layers.{jj}"
            base = inner["base_w"]            # (in, out)
            in_f, out_f = base.shape
            spline = inner["spline_w"]        # (in*K, out)
            K = spline.shape[0] // in_f
            sd[f"{pre}.base_weight"] = base.T
            sd[f"{pre}.spline_weight"] = spline.T.reshape(out_f, in_f, K)
            sd[f"{pre}.prelu.weight"] = inner["prelu"].reshape(1)
            sd[f"{pre}.layer_norm.weight"] = inner["LayerNorm_0"]["weight"]
            sd[f"{pre}.layer_norm.bias"] = inner["LayerNorm_0"]["bias"]
    return sd
