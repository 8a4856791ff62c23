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

    # Norm parameters.  For fastkan, `layer_norm` is the per-group INPUT
    # norm (fast_kan_layers.py:80) and maps onto the `input_norm_{g}`
    # scopes one-to-one.  For every other family it is the per-group
    # OUTPUT norm; per-group params concatenate onto the full-width module
    # (returned under reserved keys; the caller grafts them onto the flax
    # norm submodule scope, auto-named e.g. 'BatchNorm_0').
    if family == "fastkan":
        scoped_stats = {}
        for g in range(groups):
            if f"layer_norm.{g}.weight" in sd:
                params[f"input_norm_{g}"] = {
                    "weight": np.asarray(sd[f"layer_norm.{g}.weight"]),
                    "bias": np.asarray(sd[f"layer_norm.{g}.bias"]),
                } if f"layer_norm.{g}.bias" in sd else {
                    "weight": np.asarray(sd[f"layer_norm.{g}.weight"]),
                }
            if f"layer_norm.{g}.running_mean" in sd:
                scoped_stats[f"input_norm_{g}"] = {
                    "mean": np.asarray(sd[f"layer_norm.{g}.running_mean"]),
                    "var": np.asarray(sd[f"layer_norm.{g}.running_var"]),
                }
        if scoped_stats:
            params["__scoped_stats__"] = scoped_stats
    else:
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

    # per-group output norms (wav_kan_layers.py:432), same layout as the
    # generic families
    norm_params, norm_stats = _convert_group_norms(sd, "layer_norm", groups)
    if norm_params:
        params["__norm_params__"] = norm_params
    if norm_stats:
        params["__norm_stats__"] = norm_stats
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
    "TaylorKAN": "taylor", "WavKAN": "wavkan",
}


def _conv_scope(family: str, i: int) -> str:
    """Flax auto-names conv scopes by module class; WavKAN has its own."""
    return f"WavKANConvND_{i}" if family == "wavkan" else f"KanConvND_{i}"


def _convert_any_conv(sub, family: str, groups: int):
    """Dispatch one reference conv-layer state_dict to the right converter.
    Model-built WavKAN layers always use the factory defaults
    (wav_version='fast' — layers/kan_conv.py:288; no reference model or
    train.py flag overrides them)."""
    if family == "wavkan":
        return convert_wavkan_conv(sub, groups, "fast")
    return convert_kan_conv(sub, family, groups)


def convert_vggkan(sd: Mapping[str, np.ndarray], model, variables):
    """Migrate a reference VGGKAN state_dict (models/kan_vgg.py:190) into
    convkan_tpu.models.VGGKAN variables.

    Supports every kanconv family for the feature extractor and the
    Linear / 'KAN' (B-spline stack) classifier heads.  `variables` is an
    init tree of the target model (provides scope names / shapes).
    """
    family = REF_FAMILY[model.kan_conv or "KAN"]
    params, stats = _trees(variables)

    _graft_feature_convs(sd, params, stats, family, model.groups)

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
        params[mlp_scope] = _graft_bspline_head(
            stack, params[mlp_scope], model.kan_classifier)
    out = {"params": params}
    if stats:
        out["batch_stats"] = stats
    for col, v in variables.items():
        if col not in out:
            out[col] = v
    return out


def _block_scope(params, base: str) -> str:
    """Resolve a block scope that may be remat-wrapped: flax names
    nn.remat(_Cls) scopes 'Checkpoint_Cls_{i}' (same fallback the EffV2
    converter uses — a remat'd model otherwise KeyErrors here)."""
    ck = f"Checkpoint{base}"
    return ck if ck in params else base


def _graft_bspline_head(stack, mlp, kan_classifier):
    """Reference MLP_KAN_FACTORY['KAN'] stack (keys layers.{j}.*) -> the
    model's KanMLP scope dict (mutated copy returned).  Only the default
    B-spline kan_classifier migrates; other dense families raise loudly
    instead of silently leaving the head at random init."""
    mlp = dict(mlp)
    layer_idx = sorted({int(k.split(".")[1]) for k in stack
                        if k.startswith("layers.")})
    for pos, j in enumerate(layer_idx):
        sub = {k[len(f"layers.{j}."):]: v for k, v in stack.items()
               if k.startswith(f"layers.{j}.")}
        if "spline_weight" not in sub:
            raise NotImplementedError(
                f"KAN-head migration supports the default B-spline "
                f"kan_classifier only; got a '{kan_classifier}' stack "
                f"(layers.{j} keys: {sorted(sub)[:4]}...)")
        scope = f"KANLinear_{pos}"
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
    return mlp


def _graft_feature_convs(sd, params, stats, family: str, groups: int,
                         prefix: str = "features"):
    """Copy every `<prefix>.{idx}` reference conv into the matching conv
    scope, including norm params and running stats."""
    feat_idx = sorted({int(k.split(".")[1]) for k in sd
                       if k.startswith(prefix + ".")})
    for j, idx in enumerate(feat_idx):
        scope = _conv_scope(family, j)
        assert scope in params, f"{scope} not in {sorted(params)[:8]}..."
        _kan_into(params, stats, scope, _sub_sd(sd, f"{prefix}.{idx}"),
                  family, groups)


# ------------------------------------------------------------------ shared
# graft primitives for the block-structured model families (MobileNet
# v1-v3, EfficientNet v1/v2): each copies one reference sublayer into one
# flax scope dict (params) + its batch_stats dict.

def _trees(variables):
    import jax

    t = jax.tree_util.tree_map(np.asarray, jax.device_get(variables))
    return dict(t["params"]), dict(t.get("batch_stats", {}))


def _sub_sd(sd: Mapping[str, np.ndarray], prefix: str):
    p = prefix + "."
    out = {k[len(p):]: v for k, v in sd.items() if k.startswith(p)}
    # L1 wrapper: strip per-key (a blanket strip would mangle any
    # non-wrapped siblings sharing the prefix)
    return {(k[len("module."):] if k.startswith("module.") else k): v
            for k, v in out.items()}


def _norm_scope(scope_dict):
    return next((k for k in scope_dict if "Norm" in k), None)


def _graft_kanconv(pscope, sscope, sub, family: str, groups: int):
    """Reference KAN conv layer state_dict -> one KanConvND / WavKANConvND
    scope (params dict + batch_stats dict, both mutated in place)."""
    conv = _convert_any_conv(sub, family, groups)
    scoped_stats = conv.pop("__scoped_stats__", None)
    norm_params = conv.pop("__norm_params__", None)
    norm_stats = conv.pop("__norm_stats__", None)
    for k, v in conv.items():
        if isinstance(v, dict):  # named child scope (fastkan input_norm_g)
            inner = dict(pscope[k])
            for kk, vv in v.items():
                inner[kk] = np.asarray(vv).reshape(inner[kk].shape)
            pscope[k] = inner
        else:
            assert k in pscope and pscope[k].shape == np.shape(v), (
                f"{k}: {pscope.get(k) is not None and pscope[k].shape} vs "
                f"{np.shape(v)}")
            pscope[k] = np.asarray(v)
    if norm_params:
        ns = _norm_scope(pscope)
        assert ns is not None, f"no norm scope in {sorted(pscope)}"
        d = dict(pscope[ns])
        for k, v in norm_params.items():
            d[k] = np.asarray(v).reshape(d[k].shape)
        pscope[ns] = d
    if norm_stats:
        ns = _norm_scope(sscope)
        assert ns is not None, f"no norm stats scope in {sorted(sscope)}"
        d = dict(sscope[ns])
        d["mean"] = np.asarray(norm_stats["mean"]).reshape(d["mean"].shape)
        d["var"] = np.asarray(norm_stats["var"]).reshape(d["var"].shape)
        sscope[ns] = d
    if scoped_stats:
        for scope, v in scoped_stats.items():
            d = dict(sscope[scope])
            for kk, vv in v.items():
                d[kk] = np.asarray(vv).reshape(d[kk].shape)
            sscope[scope] = d


def _graft_std_block(pscope, sscope, sub):
    """Reference ConvNormActivation (Sequential conv/norm/act) -> one
    StdConvBlock scope."""
    conv = {"w": _hwio(np.asarray(sub["0.weight"]))}
    if "0.bias" in sub:
        conv["b"] = np.asarray(sub["0.bias"])
    pscope["Conv_0"] = conv
    if "1.weight" in sub:
        ns = _norm_scope(pscope)
        assert ns is not None, f"no norm scope in {sorted(pscope)}"
        d = dict(pscope[ns])
        d["weight"] = np.asarray(sub["1.weight"]).reshape(d["weight"].shape)
        d["bias"] = np.asarray(sub["1.bias"]).reshape(d["bias"].shape)
        pscope[ns] = d
    if "1.running_mean" in sub:
        ns = _norm_scope(sscope)
        d = dict(sscope[ns])
        d["mean"] = np.asarray(sub["1.running_mean"])
        d["var"] = np.asarray(sub["1.running_var"])
        sscope[ns] = d


def _graft_se(pscope, sub):
    """torchvision SqueezeExcitation (fc1/fc2 1x1 convs) -> our
    SqueezeExcitation scope (ops/layers.py:61)."""
    pscope["fc1_w"] = _hwio(np.asarray(sub["fc1.weight"]))
    pscope["fc1_b"] = np.asarray(sub["fc1.bias"])
    pscope["fc2_w"] = _hwio(np.asarray(sub["fc2.weight"]))
    pscope["fc2_b"] = np.asarray(sub["fc2.bias"])


def _linear_params(sd, prefix):
    return {"w": convert_linear(sd[f"{prefix}.weight"]),
            "b": np.asarray(sd[f"{prefix}.bias"])}


def _kan_into(params, stats, scope, sub, family, groups):
    p = dict(params[scope])
    s = dict(stats.get(scope, {}))
    _graft_kanconv(p, s, sub, family, groups)
    params[scope] = p
    if s:
        stats[scope] = s


def _std_into(params, stats, scope, sub):
    p = dict(params[scope])
    s = dict(stats.get(scope, {}))
    _graft_std_block(p, s, sub)
    params[scope] = p
    if s:
        stats[scope] = s


def _se_into(params, scope, sub):
    p = dict(params[scope])
    _graft_se(p, sub)
    params[scope] = p


def convert_mobilenet_v2(sd: Mapping[str, np.ndarray], model, variables):
    """Migrate a reference MobileNetV2KAN state_dict
    (models/kan_mobilenetv2.py:243-433) into
    convkan_tpu.models.MobileNetV2KAN variables.

    The inverted residuals are inline in our compact body, so scopes are
    top-level KanConvND_k / StdConvBlock_k in creation order; reference
    layers live at features.{n}.conv.{j}."""
    from ..models.mobilenet import _make_divisible
    from ..models.mobilenetv2 import V2_DEFAULT, V2_KAN_SMALL

    assert model.conv_type == "kanconv", "conv-only variant not supported"
    family = REF_FAMILY[model.kan_conv or "KAN"]
    params, stats = _trees(variables)
    setting = V2_KAN_SMALL if model.arch == "kan_small" else V2_DEFAULT

    _kan_into(params, stats, _conv_scope(family, 0), _sub_sd(sd, "features.0"),
              family, model.groups)
    kan_i, std_i, n = 1, 0, 1
    c_in = _make_divisible(32 * model.width_mult, model.round_nearest)
    for t, c, reps, s_ in setting:
        c_out = _make_divisible(c * model.width_mult, model.round_nearest)
        for i in range(reps):
            hidden = int(round(c_in * t))
            j = 0
            if t != 1:
                _kan_into(params, stats, _conv_scope(family, kan_i),
                          _sub_sd(sd, f"features.{n}.conv.{j}"),
                          family, model.groups)
                kan_i += 1
                j += 1
            sub = _sub_sd(sd, f"features.{n}.conv.{j}")
            if model.replace_depthwise:
                _kan_into(params, stats, _conv_scope(family, kan_i), sub,
                          family, hidden)
                kan_i += 1
            else:
                _std_into(params, stats, f"StdConvBlock_{std_i}", sub)
                std_i += 1
            j += 1
            _kan_into(params, stats, _conv_scope(family, kan_i),
                      _sub_sd(sd, f"features.{n}.conv.{j}"),
                      family, model.groups)
            kan_i += 1
            n += 1
            c_in = c_out
    # last 1x1 conv
    _kan_into(params, stats, _conv_scope(family, kan_i),
              _sub_sd(sd, f"features.{n}"), family, model.groups)

    if model.classifier_type == "KAN":
        # classifier = Sequential(flatten, head_dropout, fc=KAN stack):
        # keys classifier.fc.layers.{j}.* (kan_mobilenetv2.py:394-397)
        stack = {k[len("classifier.fc."):]: v for k, v in sd.items()
                 if k.startswith("classifier.fc.")}
        mlp_scope = next(k for k in params if k.startswith("KanMLP"))
        params[mlp_scope] = _graft_bspline_head(
            stack, params[mlp_scope], model.kan_classifier)
    else:
        params["Linear_0"] = _linear_params(sd, "classifier.fc")

    out = {"params": params}
    if stats:
        out["batch_stats"] = stats
    for col, v in variables.items():
        if col not in out:
            out[col] = v
    return out


def convert_mobilenet_v1(sd: Mapping[str, np.ndarray], model, variables):
    """Migrate a reference MobileNetV1KAN state_dict
    (models/kan_mobilenet.py:131-342): stem + 13 depthwise-separable
    stages (features.{n}.depthwise / .pointwise) + classifier.

    NOTE the reference's kanconv path is unconstructible (it calls every
    CONV_KAN_FACTORY wrapper with `in_channels=` where they take
    `in_planes` — kan_mobilenet.py:249 vs layers/kan_conv.py:197; a
    documented crash path, PARITY.md), so real reference checkpoints only
    exist for conv_type='conv'; both layouts are handled here."""
    params, stats = _trees(variables)

    from ..models.mobilenet import V1_SETTING, _make_divisible

    kan = model.conv_type == "kanconv"
    family = REF_FAMILY[model.kan_conv or "KAN"] if kan else None
    kan_i, std_i = 0, 0

    def any_into(sub, groups):
        nonlocal kan_i, std_i
        if kan:
            _kan_into(params, stats, _conv_scope(family, kan_i), sub, family,
                      groups)
            kan_i += 1
        else:
            _std_into(params, stats, f"StdConvBlock_{std_i}", sub)
            std_i += 1

    any_into(_sub_sd(sd, "features.0"), model.groups)
    c_in = _make_divisible(32 * model.width_mult, 8)
    for n, (c, s_) in enumerate(V1_SETTING, start=1):
        dw = _sub_sd(sd, f"features.{n}.depthwise")
        if kan and model.replace_depthwise:
            _kan_into(params, stats, _conv_scope(family, kan_i), dw, family, c_in)
            kan_i += 1
        else:
            _std_into(params, stats, f"StdConvBlock_{std_i}", dw)
            std_i += 1
        any_into(_sub_sd(sd, f"features.{n}.pointwise"), model.groups)
        c_in = _make_divisible(c * model.width_mult, 8)

    if model.classifier_type == "Linear":
        # Sequential(Dropout, Linear) (kan_mobilenet.py:309)
        params["Linear_0"] = _linear_params(sd, "classifier.1")

    out = {"params": params}
    if stats:
        out["batch_stats"] = stats
    for col, v in variables.items():
        if col not in out:
            out[col] = v
    return out


def convert_mobilenet_v3(sd: Mapping[str, np.ndarray], model, variables):
    """Migrate a reference MobileNetV3KAN state_dict
    (models/kan_mobilenetv3.py:194-410) into
    convkan_tpu.models.MobileNetV3KAN variables.

    Covers the kanconv path (any family), std depthwise or
    replace_depthwise, SE blocks, BatchNorm running stats, and the Linear
    classifier head."""
    from ..models.mobilenetv3 import mobilenet_v3_conf

    assert model.conv_type == "kanconv", "conv-only variant not supported"
    family = REF_FAMILY[model.kan_conv or "KAN"]
    params, stats = _trees(variables)
    cfgs, _ = mobilenet_v3_conf(model.arch, model.width_mult,
                                model.reduced_tail, model.dilated)

    # stem + final 1x1 are top-level factory convs
    _kan_into(params, stats, _conv_scope(family, 0), _sub_sd(sd, "features.0"),
              family, model.groups)
    _kan_into(params, stats, _conv_scope(family, 1),
              _sub_sd(sd, f"features.{len(cfgs) + 1}"), family, model.groups)

    for n, cnf in enumerate(cfgs, start=1):
        bscope = _block_scope(params, f"_MNV3Block_{n - 1}")
        bp = dict(params[bscope])
        bs = dict(stats.get(bscope, {}))
        j = 0
        kan_i = 0
        if cnf.expanded_channels != cnf.input_channels:
            _kan_into(bp, bs, _conv_scope(family, kan_i),
                      _sub_sd(sd, f"features.{n}.block.{j}"),
                      family, model.groups)
            kan_i += 1
            j += 1
        sub = _sub_sd(sd, f"features.{n}.block.{j}")
        if model.replace_depthwise:
            _kan_into(bp, bs, _conv_scope(family, kan_i), sub, family,
                      cnf.expanded_channels)
            kan_i += 1
        else:
            _std_into(bp, bs, "StdConvBlock_0", sub)
        j += 1
        if cnf.use_se:
            _se_into(bp, "SqueezeExcitation_0",
                     _sub_sd(sd, f"features.{n}.block.{j}"))
            j += 1
        _kan_into(bp, bs, _conv_scope(family, kan_i),
                  _sub_sd(sd, f"features.{n}.block.{j}"),
                  family, model.groups)
        params[bscope] = bp
        if bs:
            stats[bscope] = bs

    if model.classifier_type == "Linear":
        params["Linear_0"] = _linear_params(sd, "classifier.0")
        params["Linear_1"] = _linear_params(sd, "classifier.3")

    out = {"params": params}
    if stats:
        out["batch_stats"] = stats
    for col, v in variables.items():
        if col not in out:
            out[col] = v
    return out


def convert_efficientnetv2(sd: Mapping[str, np.ndarray], model, variables):
    """Migrate a reference EfficientNet2DKan state_dict
    (models/kan_efficientnetv2.py:276-505) into
    convkan_tpu.models.EfficientNetV2KAN variables: stem / head_conv
    factory convs, blocks.stage_{i}.{j}.block.{k} Fused-MBConv / MBConv
    layers (expand, depthwise, SE, project), BatchNorm running stats, and
    the Linear / HiddenKAN-fc2 classifier Linears.

    (EfficientNet V1 note: the reference's kan_efficientnet.py kanconv
    path crashes as written — a documented reference bug, PARITY.md — so
    no V1 kanconv checkpoints can exist to migrate; our V1 runs on this
    same engine.)"""
    from ..models.mobilenet import _make_divisible

    assert model.conv_type == "kanconv", "conv-only variant not supported"
    family = REF_FAMILY[model.kan_conv or "KAN"]
    params, stats = _trees(variables)
    settings = list(model.inverted_residual_setting)

    _kan_into(params, stats, _conv_scope(family, 0), _sub_sd(sd, "stem"),
              family, model.groups)
    _kan_into(params, stats, _conv_scope(family, 1), _sub_sd(sd, "head_conv"),
              family, model.groups)

    b = 0
    for i, cfg in enumerate(settings):
        for j in range(cfg.num_layers):
            ci = cfg.input_channels if j == 0 else cfg.out_channels
            expanded = _make_divisible(ci * cfg.expand_ratio, 8)
            pre = f"blocks.stage_{i}.{j}.block"
            # nn.remat renames the block scope Checkpoint_EffBlock_{b}
            bscope = _block_scope(params, f"_EffBlock_{b}")
            bp = dict(params[bscope])
            bs = dict(stats.get(bscope, {}))
            k = 0
            kan_i = 0
            if cfg.block_type == "fused":
                # expand kxk (+ project 1x1 when expanding)
                _kan_into(bp, bs, _conv_scope(family, 0), _sub_sd(sd, f"{pre}.0"),
                          family, model.groups)
                if expanded != ci:
                    _kan_into(bp, bs, _conv_scope(family, 1),
                              _sub_sd(sd, f"{pre}.1"), family, model.groups)
            else:
                if expanded != ci:
                    _kan_into(bp, bs, _conv_scope(family, kan_i),
                              _sub_sd(sd, f"{pre}.{k}"), family,
                              model.groups)
                    kan_i += 1
                    k += 1
                sub = _sub_sd(sd, f"{pre}.{k}")
                if model.replace_depthwise:
                    _kan_into(bp, bs, _conv_scope(family, kan_i), sub, family,
                              expanded)
                    kan_i += 1
                else:
                    _std_into(bp, bs, "StdConvBlock_0", sub)
                k += 1
                if cfg.se_ratio is not None and cfg.se_ratio > 0:
                    _se_into(bp, "SqueezeExcitation_0",
                             _sub_sd(sd, f"{pre}.{k}"))
                    k += 1
                _kan_into(bp, bs, _conv_scope(family, kan_i),
                          _sub_sd(sd, f"{pre}.{k}"), family, model.groups)
            params[bscope] = bp
            if bs:
                stats[bscope] = bs
            b += 1

    if model.classifier_type == "Linear":
        params["Linear_0"] = _linear_params(sd, "classifier.fc")
    elif model.classifier_type == "HiddenKAN":
        # the b-spline kan_fc1 stack migrates via the MLP goldens path;
        # the trailing fc2 Linear maps directly
        params["Linear_0"] = _linear_params(sd, "classifier.fc2")

    out = {"params": params}
    if stats:
        out["batch_stats"] = stats
    for col, v in variables.items():
        if col not in out:
            out[col] = v
    return out


def convert_alexnet(sd: Mapping[str, np.ndarray], model, variables):
    """Migrate a reference AlexNetKAN state_dict (models/kan_alexnet.py:11-
    313) into convkan_tpu.models.AlexNetKAN variables (Linear or 'AlexNet'
    classifier; kanconv features of any family)."""
    family = REF_FAMILY[model.kan_conv or "KAN"]
    params, stats = _trees(variables)
    _graft_feature_convs(sd, params, stats, family, model.groups)

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
    if stats:
        out["batch_stats"] = stats
    for col, v in variables.items():
        if col not in out:
            out[col] = v
    return out
