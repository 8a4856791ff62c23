"""Export convkan_tpu variables back to a PyTorch-reference state_dict.

The inverse of `torch_compat`: TPU-trained weights become a flat
``{name: np.ndarray}`` mapping with the reference's key vocabulary and
layouts, loadable into the reference classes with
``module.load_state_dict({k: torch.tensor(v) ...})``.  Completes the
interop loop — reference→TPU migration exists in `torch_compat`, this is
TPU→reference, for every model family a reference checkpoint can exist
for: VGGKAN (kan_vgg.py:190-304), AlexNetKAN (kan_alexnet.py:11-313),
MobileNetV1/V2/V3 KAN (kan_mobilenet.py:131, kan_mobilenetv2.py:169,
kan_mobilenetv3.py:194) and EfficientNetV2KAN (kan_efficientnetv2.py:276).

Layout transforms (inverse of torch_compat's):
  * HWIO (*k, I, O)           ->  torch conv (O, I, *k)
  * group-major single weight ->  per-group ModuleList entries, or the
                                  5-D ``poly_weights`` tensor for the
                                  raw-weight families (Legendre, GRAM,
                                  Jacobi, Bersnstein)
  * (I, O) linear             ->  torch (O, I)
  * full-width norm params / batch stats -> per-group ModuleList slices

Buffers the TPU side does not track are reconstructed: cheby ``arange``
and fastkan ``rbf.grid`` from the layer config; BatchNorm
``num_batches_tracked`` is emitted as 0 (torch only consults it when
``momentum=None``, which the reference never uses).

Tested scope (bit-exact, key-complete round-trip against the committed
reference fixtures): VGG B-spline/Cheby, MNv3 Cheby + FastKAN, MNv2
Bessel, MNv1 conv-type, EffV2 GRAM (poly_weights form), AlexNet
B-spline (synthetic reference-layout sd), with Linear and KAN-stack
heads, BatchNorm running stats, SE blocks and std-conv blocks.
"""

from __future__ import annotations

from typing import Any, Dict, Mapping

import numpy as np

__all__ = [
    "export_vggkan_state_dict", "export_alexnet_state_dict",
    "export_mobilenet_v1_state_dict", "export_mobilenet_v2_state_dict",
    "export_mobilenet_v3_state_dict", "export_efficientnetv2_state_dict",
    "export_wavkan_conv_state_dict",
    "export_kan_conv_state_dict",
]

# families whose reference conv layers hold one 5-D (G, out_g, in_g*K, *k)
# poly_weights parameter instead of a ModuleList of convs (SURVEY family B)
_POLY5D_FAMILIES = {"legendre", "gram", "jacobi", "bernstein"}


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
_SPLINE_KEY = {"kan": "spline_conv", "fastkan": "spline_conv",
               "fourier": "fourier_conv", "relukan": "relukan_conv"}


def export_kan_conv_state_dict(params: Mapping[str, Any], family: str,
                               groups: int,
                               stats: Mapping[str, Any] = None,
                               degree: int = None,
                               grid_spec=None) -> Dict[str, np.ndarray]:
    """One KanConvND param scope -> the reference conv layer's state_dict
    entries (inverse of `torch_compat.convert_kan_conv`)."""
    sd: Dict[str, np.ndarray] = {}
    p = {k: np.asarray(v) for k, v in params.items()
         if not isinstance(v, Mapping)}
    scopes = {k: v for k, v in params.items() if isinstance(v, Mapping)}

    if "base_w" in p:
        _split_group_convs(p["base_w"], "base_conv", groups, sd)
    if "poly_w" in p and family in _POLY5D_FAMILIES:
        # (*k, in_g*K, G*out_g) -> (G, out_g, in_g*K, *k)
        sd["poly_weights"] = np.stack(
            [_oihw(w) for w in np.split(p["poly_w"], groups, axis=-1)])
    elif "poly_w" in p:
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
        if grid_spec is not None:
            # reference RadialBasisFunction grid buffer (utils/utils.py:28-33),
            # reconstructed from (grid_min, grid_max, num_grids) in the
            # weights' dtype
            lo, hi, n = grid_spec
            w = p.get("poly_w", p.get("base_w"))
            sd["rbf.grid"] = np.linspace(lo, hi, n).astype(w.dtype)
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
                sd[f"layer_norm.{g}.num_batches_tracked"] = np.asarray(
                    0, np.int64)
    else:
        _export_group_norms(scopes, stats, groups, sd)
    return sd


def _export_group_norms(scopes, stats, groups, sd):
    """Full-width output norm params/stats -> per-group layer_norm
    ModuleList slices (inverse of torch_compat._convert_group_norms)."""
    # our norm impls may keep params/stats broadcast-shaped (1,..,C);
    # the reference ModuleList entries are flat (C/g,)
    norm_scopes = [k for k in scopes if not k.startswith("input_norm")]
    if norm_scopes:
        (scope,) = norm_scopes
        w = scopes[scope]
        if "weight" in w:
            for g, wg in enumerate(np.split(
                    np.asarray(w["weight"]).reshape(-1), groups)):
                sd[f"layer_norm.{g}.weight"] = wg
            # weight-only affine norms (RMSNorm) carry no bias
            if "bias" in w:
                for g, bg in enumerate(np.split(
                        np.asarray(w["bias"]).reshape(-1), groups)):
                    sd[f"layer_norm.{g}.bias"] = bg
    for scope, s in stats.items():
        if scope.startswith("input_norm"):
            continue
        for g, (mg, vg) in enumerate(zip(
                np.split(np.asarray(s["mean"]).reshape(-1), groups),
                np.split(np.asarray(s["var"]).reshape(-1), groups))):
            sd[f"layer_norm.{g}.running_mean"] = mg
            sd[f"layer_norm.{g}.running_var"] = vg
            sd[f"layer_norm.{g}.num_batches_tracked"] = np.asarray(
                0, np.int64)
    return sd


def export_wavkan_conv_state_dict(params: Mapping[str, Any], groups: int,
                                  wav_version: str = "fast",
                                  stats: Mapping[str, Any] = None
                                  ) -> Dict[str, np.ndarray]:
    """One WavKANConvND param scope -> the reference WavKANConvNDLayer
    state_dict entries (inverse of `torch_compat.convert_wavkan_conv`),
    in any of the three reference engine layouts
    (wav_kan_layers.py:113-338)."""
    sd: Dict[str, np.ndarray] = {}
    p = {k: np.asarray(v) for k, v in params.items()
         if not isinstance(v, Mapping)}
    scopes = {k: v for k, v in params.items() if isinstance(v, Mapping)}

    _split_group_convs(p["base_w"], "base_conv", groups, sd)
    _, out_g, in_g = p["scale"].shape
    nd_sp = p["wavelet_w"].ndim - 2
    st_shape = (1, out_g, in_g) + (1,) * nd_sp  # wav_kan_layers.py:119-122
    for g in range(groups):
        pre = f"wavelet_conv.{g}"
        sd[f"{pre}.scale"] = p["scale"][g].reshape(st_shape)
        sd[f"{pre}.translation"] = p["translation"][g].reshape(st_shape)
        w = _oihw(p["wavelet_w"][..., g * out_g:(g + 1) * out_g])
        if wav_version == "fast":
            sd[f"{pre}.wavelet_weights.weight"] = w     # (out_g, in_g, *k)
        elif wav_version == "base":
            for o in range(out_g):                      # per-o conv list
                sd[f"{pre}.wavelet_weights.{o}.weight"] = w[o:o + 1]
        elif wav_version == "fast_plus_one":
            sd[f"{pre}.wavelet_weights.weight"] = w.reshape(
                (out_g, 1) + w.shape[1:])               # (out_g, 1, in_g, *k)
        else:
            raise ValueError(wav_version)
        sd[f"{pre}.wavelet_out.weight"] = _oihw(
            p["wavelet_out_w"][..., g * out_g:(g + 1) * out_g])

    _export_group_norms(scopes, dict(stats or {}), groups, sd)
    return sd


# ------------------------------------------------------------- shared
# inverses of torch_compat's graft primitives

def _np_trees(variables):
    # single implementation lives next to the graft primitives it inverts
    from .torch_compat import _trees

    return _trees(variables)


def _emit(sd: Dict[str, np.ndarray], prefix: str, sub: Mapping[str, Any]):
    for k, v in sub.items():
        sd[f"{prefix}.{k}"] = v


def _export_std_block(pscope, sscope) -> Dict[str, np.ndarray]:
    """One StdConvBlock scope -> reference ConvNormActivation Sequential
    entries (inverse of torch_compat._graft_std_block)."""
    sub = {"0.weight": _oihw(np.asarray(pscope["Conv_0"]["w"]))}
    if "b" in pscope["Conv_0"]:
        sub["0.bias"] = np.asarray(pscope["Conv_0"]["b"])
    ns = next((k for k in pscope if "Norm" in k), None)
    if ns is not None and "weight" in pscope[ns]:
        sub["1.weight"] = np.asarray(pscope[ns]["weight"])
        sub["1.bias"] = np.asarray(pscope[ns]["bias"])
    ns = next((k for k in (sscope or {}) if "Norm" in k), None)
    if ns is not None:
        sub["1.running_mean"] = np.asarray(sscope[ns]["mean"])
        sub["1.running_var"] = np.asarray(sscope[ns]["var"])
        sub["1.num_batches_tracked"] = np.asarray(0, np.int64)
    return sub


def _export_se(pscope) -> Dict[str, np.ndarray]:
    """SqueezeExcitation scope -> torchvision SE fc1/fc2 1x1 convs
    (inverse of torch_compat._graft_se)."""
    return {"fc1.weight": _oihw(np.asarray(pscope["fc1_w"])),
            "fc1.bias": np.asarray(pscope["fc1_b"]),
            "fc2.weight": _oihw(np.asarray(pscope["fc2_w"])),
            "fc2.bias": np.asarray(pscope["fc2_b"])}


def _export_linear(p) -> Dict[str, np.ndarray]:
    return {"weight": np.asarray(p["w"]).T, "bias": np.asarray(p["b"])}


def _conv_kw(model, family):
    """degree/grid_spec kwargs shared by every kanconv export of a model."""
    kw = {"degree": getattr(model, "degree", None)}
    if family == "fastkan":
        kw["grid_spec"] = (model.grid_range[0], model.grid_range[1],
                           model.grid_size)
    return kw


def _export_any_conv(pscope, family, groups, stats, kw):
    """Dispatch one conv scope to the right exporter.  Model-built WavKAN
    layers always use the factory-default 'fast' engine
    (layers/kan_conv.py:288; no reference model flag overrides it)."""
    if family == "wavkan":
        return export_wavkan_conv_state_dict(pscope, groups, stats=stats)
    return export_kan_conv_state_dict(pscope, family, groups, stats=stats,
                                      **kw)


def export_vggkan_state_dict(model, variables) -> Dict[str, np.ndarray]:
    """VGGKAN variables -> reference kan_vgg state_dict (flat numpy).

    Inverse of `torch_compat.convert_vggkan`; supports the Linear and
    'KAN' (B-spline stack) classifier heads it supports."""
    from ..models.vgg import cfgs
    from .torch_compat import REF_FAMILY, _conv_scope

    family = REF_FAMILY[model.kan_conv or "KAN"]
    params, stats = _np_trees(variables)

    sd: Dict[str, np.ndarray] = {}
    # feature extractor: torch Sequential index = position in the cfg
    # (pools hold an index but no params); flax scope = conv ordinal
    j = 0
    for idx, v in enumerate(cfgs[model.arch]):
        if v == "M":
            continue
        scope = _conv_scope(family, j)
        layer_sd = _export_any_conv(
            params[scope], family, model.groups,
            stats.get(scope, {}), _conv_kw(model, family))
        for k, val in layer_sd.items():
            sd[f"features.{idx}.{k}"] = val
        j += 1

    if model.classifier_type == "Linear":
        _emit(sd, "classifier.1", _export_linear(params["Linear_0"]))
    elif model.classifier_type == "KAN":
        mlp_scope = next(k for k in params if k.startswith("KanMLP"))
        _export_bspline_head(sd, params[mlp_scope], "classifier.1.layers",
                             model.kan_classifier)
    return sd


def _export_bspline_head(sd, mlp, prefix: str, kan_classifier):
    """KanMLP scope -> reference MLP_KAN_FACTORY['KAN'] keys
    ({prefix}.{j}.*).  Only the default B-spline kan_classifier exports;
    other dense families raise loudly instead of silently omitting the
    head (strict=False on the torch side would keep a random head)."""
    other = [s for s in mlp
             if not (s.startswith("KANLinear_") or s.startswith("Dropout"))]
    if other:
        raise NotImplementedError(
            f"KAN-head export supports the default B-spline "
            f"kan_classifier only; got '{kan_classifier}' scopes {other}")
    for scope, inner in mlp.items():
        if not scope.startswith("KANLinear_"):
            continue
        jj = int(scope.split("_")[-1])
        pre = f"{prefix}.{jj}"
        base = inner["base_w"]            # (in, out)
        in_f, out_f = base.shape
        spline = inner["spline_w"]        # (in*K, out)
        K = spline.shape[0] // in_f
        sd[f"{pre}.base_weight"] = base.T
        sd[f"{pre}.spline_weight"] = spline.T.reshape(out_f, in_f, K)
        sd[f"{pre}.prelu.weight"] = inner["prelu"].reshape(1)
        sd[f"{pre}.layer_norm.weight"] = inner["LayerNorm_0"]["weight"]
        sd[f"{pre}.layer_norm.bias"] = inner["LayerNorm_0"]["bias"]


# ------------------------------------------------------------ model zoo

_ALEXNET_FEAT_IDX = (0, 2, 4, 5, 6)  # conv positions in the features
# Sequential, identical for both arches (kan_alexnet.py:119-137)


def export_alexnet_state_dict(model, variables) -> Dict[str, np.ndarray]:
    """AlexNetKAN variables -> reference kan_alexnet state_dict
    (inverse of torch_compat.convert_alexnet; kanconv features + the
    named fc1/fc2/fc3 classifier Linears)."""
    from .torch_compat import REF_FAMILY, _conv_scope

    family = REF_FAMILY[model.kan_conv or "KAN"]
    params, stats = _np_trees(variables)
    kw = _conv_kw(model, family)

    sd: Dict[str, np.ndarray] = {}
    for j, idx in enumerate(_ALEXNET_FEAT_IDX):
        scope = _conv_scope(family, j)
        _emit(sd, f"features.{idx}", _export_any_conv(
            params[scope], family, model.groups, stats.get(scope, {}), kw))
    for j, fc in enumerate(("fc1", "fc2", "fc3")):
        if f"Linear_{j}" in params:
            _emit(sd, f"classifier.{fc}",
                  _export_linear(params[f"Linear_{j}"]))
    return sd


def export_mobilenet_v1_state_dict(model, variables) -> Dict[str, np.ndarray]:
    """MobileNetV1KAN variables -> reference kan_mobilenet state_dict
    (inverse of torch_compat.convert_mobilenet_v1): stem + 13
    features.{n}.depthwise/.pointwise stages + classifier.1 Linear.
    Handles both conv_type layouts (the reference's kanconv path is
    unconstructible — see convert_mobilenet_v1 — but ours exports it
    anyway for completeness)."""
    from ..models.mobilenet import V1_SETTING, _make_divisible
    from .torch_compat import REF_FAMILY, _conv_scope

    params, stats = _np_trees(variables)
    kan = model.conv_type == "kanconv"
    family = REF_FAMILY[model.kan_conv or "KAN"] if kan else None
    kw = _conv_kw(model, family) if kan else None
    sd: Dict[str, np.ndarray] = {}
    kan_i = std_i = 0

    def kan_out(prefix, groups):
        nonlocal kan_i
        scope = _conv_scope(family, kan_i)
        kan_i += 1
        _emit(sd, prefix, _export_any_conv(
            params[scope], family, groups, stats.get(scope, {}), kw))

    def std_out(prefix):
        nonlocal std_i
        scope = f"StdConvBlock_{std_i}"
        std_i += 1
        _emit(sd, prefix,
              _export_std_block(params[scope], stats.get(scope, {})))

    def any_out(prefix, groups):
        kan_out(prefix, groups) if kan else std_out(prefix)

    any_out("features.0", model.groups)
    c_in = _make_divisible(32 * model.width_mult, 8)
    for n, (c, s_) in enumerate(V1_SETTING, start=1):
        if kan and model.replace_depthwise:
            kan_out(f"features.{n}.depthwise", c_in)
        else:
            std_out(f"features.{n}.depthwise")
        any_out(f"features.{n}.pointwise", model.groups)
        c_in = _make_divisible(c * model.width_mult, 8)

    if model.classifier_type == "Linear":
        _emit(sd, "classifier.1", _export_linear(params["Linear_0"]))
    return sd


def export_mobilenet_v2_state_dict(model, variables) -> Dict[str, np.ndarray]:
    """MobileNetV2KAN variables -> reference kan_mobilenetv2 state_dict
    (inverse of torch_compat.convert_mobilenet_v2): stem, inline
    inverted-residual features.{n}.conv.{j} layers, last 1x1 conv,
    classifier.fc Linear."""
    from ..models.mobilenet import _make_divisible
    from ..models.mobilenetv2 import V2_DEFAULT, V2_KAN_SMALL
    from .torch_compat import REF_FAMILY, _conv_scope

    assert model.conv_type == "kanconv", "conv-only variant not supported"
    family = REF_FAMILY[model.kan_conv or "KAN"]
    params, stats = _np_trees(variables)
    setting = V2_KAN_SMALL if model.arch == "kan_small" else V2_DEFAULT
    kw = _conv_kw(model, family)
    sd: Dict[str, np.ndarray] = {}

    def kan_out(prefix, i, groups):
        scope = _conv_scope(family, i)
        _emit(sd, prefix, _export_any_conv(
            params[scope], family, groups, stats.get(scope, {}), kw))

    kan_out("features.0", 0, model.groups)
    kan_i, std_i, n = 1, 0, 1
    c_in = _make_divisible(32 * model.width_mult, model.round_nearest)
    for t, c, reps, s_ in setting:
        c_out = _make_divisible(c * model.width_mult, model.round_nearest)
        for _ in range(reps):
            hidden = int(round(c_in * t))
            j = 0
            if t != 1:
                kan_out(f"features.{n}.conv.{j}", kan_i, model.groups)
                kan_i += 1
                j += 1
            if model.replace_depthwise:
                kan_out(f"features.{n}.conv.{j}", kan_i, hidden)
                kan_i += 1
            else:
                _emit(sd, f"features.{n}.conv.{j}", _export_std_block(
                    params[f"StdConvBlock_{std_i}"],
                    stats.get(f"StdConvBlock_{std_i}", {})))
                std_i += 1
            j += 1
            kan_out(f"features.{n}.conv.{j}", kan_i, model.groups)
            kan_i += 1
            n += 1
            c_in = c_out
    kan_out(f"features.{n}", kan_i, model.groups)

    if model.classifier_type == "KAN":
        mlp_scope = next(k for k in params if k.startswith("KanMLP"))
        _export_bspline_head(sd, params[mlp_scope], "classifier.fc.layers",
                             model.kan_classifier)
    else:
        _emit(sd, "classifier.fc", _export_linear(params["Linear_0"]))
    return sd


def export_mobilenet_v3_state_dict(model, variables) -> Dict[str, np.ndarray]:
    """MobileNetV3KAN variables -> reference kan_mobilenetv3 state_dict
    (inverse of torch_compat.convert_mobilenet_v3): stem/final factory
    convs, features.{n}.block.{j} expand/depthwise/SE/project layers,
    classifier.0/.3 Linears."""
    from ..models.mobilenetv3 import mobilenet_v3_conf
    from .torch_compat import REF_FAMILY, _conv_scope

    assert model.conv_type == "kanconv", "conv-only variant not supported"
    family = REF_FAMILY[model.kan_conv or "KAN"]
    params, stats = _np_trees(variables)
    cfg_list, _ = mobilenet_v3_conf(model.arch, model.width_mult,
                                    model.reduced_tail, model.dilated)
    kw = _conv_kw(model, family)
    sd: Dict[str, np.ndarray] = {}

    def kan_out(prefix, pscope, sscope, groups):
        _emit(sd, prefix, _export_any_conv(pscope, family, groups, sscope,
                                           kw))

    kan_out("features.0", params[_conv_scope(family, 0)],
            stats.get(_conv_scope(family, 0), {}), model.groups)
    kan_out(f"features.{len(cfg_list) + 1}", params[_conv_scope(family, 1)],
            stats.get(_conv_scope(family, 1), {}), model.groups)

    from .torch_compat import _block_scope

    for n, cnf in enumerate(cfg_list, start=1):
        # remat'd blocks are scoped Checkpoint_MNV3Block_{i}
        bscope = _block_scope(params, f"_MNV3Block_{n - 1}")
        bp = params[bscope]
        bs = stats.get(bscope, {})
        j = 0
        kan_i = 0
        if cnf.expanded_channels != cnf.input_channels:
            kan_out(f"features.{n}.block.{j}", bp[_conv_scope(family, kan_i)],
                    bs.get(_conv_scope(family, kan_i), {}), model.groups)
            kan_i += 1
            j += 1
        if model.replace_depthwise:
            kan_out(f"features.{n}.block.{j}", bp[_conv_scope(family, kan_i)],
                    bs.get(_conv_scope(family, kan_i), {}), cnf.expanded_channels)
            kan_i += 1
        else:
            _emit(sd, f"features.{n}.block.{j}", _export_std_block(
                bp["StdConvBlock_0"], bs.get("StdConvBlock_0", {})))
        j += 1
        if cnf.use_se:
            _emit(sd, f"features.{n}.block.{j}",
                  _export_se(bp["SqueezeExcitation_0"]))
            j += 1
        kan_out(f"features.{n}.block.{j}", bp[_conv_scope(family, kan_i)],
                bs.get(_conv_scope(family, kan_i), {}), model.groups)

    if model.classifier_type == "Linear":
        _emit(sd, "classifier.0", _export_linear(params["Linear_0"]))
        _emit(sd, "classifier.3", _export_linear(params["Linear_1"]))
    return sd


def export_efficientnetv2_state_dict(model, variables) -> Dict[str, np.ndarray]:
    """EfficientNetV2KAN variables -> reference kan_efficientnetv2
    state_dict (inverse of torch_compat.convert_efficientnetv2): stem /
    head_conv, blocks.stage_{i}.{j}.block.{k} Fused-MBConv / MBConv
    layers, classifier.fc (Linear) or .fc2 (HiddenKAN tail)."""
    from ..models.mobilenet import _make_divisible
    from .torch_compat import REF_FAMILY, _conv_scope

    assert model.conv_type == "kanconv", "conv-only variant not supported"
    from .torch_compat import _block_scope

    family = REF_FAMILY[model.kan_conv or "KAN"]
    params, stats = _np_trees(variables)
    kw = _conv_kw(model, family)
    sd: Dict[str, np.ndarray] = {}

    def kan_out(prefix, pscope, sscope, groups):
        _emit(sd, prefix, _export_any_conv(pscope, family, groups, sscope,
                                           kw))

    kan_out("stem", params[_conv_scope(family, 0)],
            stats.get(_conv_scope(family, 0), {}), model.groups)
    kan_out("head_conv", params[_conv_scope(family, 1)],
            stats.get(_conv_scope(family, 1), {}), model.groups)

    b = 0
    for i, cfg in enumerate(model.inverted_residual_setting):
        for j in range(cfg.num_layers):
            ci = cfg.input_channels if j == 0 else cfg.out_channels
            expanded = _make_divisible(ci * cfg.expand_ratio, 8)
            pre = f"blocks.stage_{i}.{j}.block"
            bscope = _block_scope(params, f"_EffBlock_{b}")
            bp = params[bscope]
            bs = stats.get(bscope, {})
            kan_i = 0
            k = 0
            if cfg.block_type == "fused":
                kan_out(f"{pre}.0", bp[_conv_scope(family, 0)],
                        bs.get(_conv_scope(family, 0), {}), model.groups)
                if expanded != ci:
                    kan_out(f"{pre}.1", bp[_conv_scope(family, 1)],
                            bs.get(_conv_scope(family, 1), {}), model.groups)
            else:
                if expanded != ci:
                    kan_out(f"{pre}.{k}", bp[_conv_scope(family, kan_i)],
                            bs.get(_conv_scope(family, kan_i), {}), model.groups)
                    kan_i += 1
                    k += 1
                if model.replace_depthwise:
                    kan_out(f"{pre}.{k}", bp[_conv_scope(family, kan_i)],
                            bs.get(_conv_scope(family, kan_i), {}), expanded)
                    kan_i += 1
                else:
                    _emit(sd, f"{pre}.{k}", _export_std_block(
                        bp["StdConvBlock_0"], bs.get("StdConvBlock_0", {})))
                k += 1
                if cfg.se_ratio is not None and cfg.se_ratio > 0:
                    _emit(sd, f"{pre}.{k}",
                          _export_se(bp["SqueezeExcitation_0"]))
                    k += 1
                kan_out(f"{pre}.{k}", bp[_conv_scope(family, kan_i)],
                        bs.get(_conv_scope(family, kan_i), {}), model.groups)
            b += 1

    if model.classifier_type == "Linear":
        _emit(sd, "classifier.fc", _export_linear(params["Linear_0"]))
    elif model.classifier_type == "HiddenKAN":
        _emit(sd, "classifier.fc2", _export_linear(params["Linear_0"]))
    return sd
