"""Dump golden fixtures from the PyTorch reference.

Runs the reference implementation (mounted read-only at /root/reference) as
a NUMERICAL ORACLE on fixed seeds and serializes {inputs, state_dict,
outputs} per layer config into tests/goldens/*.npz.  The test suite loads
the reference weights into convkan_tpu modules and asserts 1e-5 parity —
the BASELINE.json fidelity criterion.

This script is run once per fixture change; the .npz files are committed so
tests do not depend on /root/reference at runtime.

Usage:  python tools/goldens/dump_reference.py
"""

from __future__ import annotations

import os
import sys

import numpy as np

REFERENCE = os.environ.get("REFERENCE_PATH", "/root/reference")
OUT_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "tests", "goldens")

sys.path.insert(0, REFERENCE)

import torch  # noqa: E402

# float64 end-to-end (some reference layers allocate buffers with the torch
# default dtype, e.g. jacobi_kan_layers.py:40)
torch.set_default_dtype(torch.float64)
torch.manual_seed(0)


def _save(name, layer, x, extra=None):
    # float64 everywhere: parity tests then prove exact semantic equivalence
    # (~1e-12) rather than fp32 accumulation-order noise.
    layer = layer.double().eval()
    x = x.double()
    with torch.no_grad():
        y = layer(x)
    blob = {
        "x": x.numpy(),
        "y": y.numpy(),
    }
    for k, v in layer.state_dict().items():
        blob[f"param:{k}"] = v.numpy()
    # b-spline layers keep their knot vector as a plain tensor attribute
    # (kan_layers.py:184-190) — export it so tests can bit-match torch's
    # f32 linspace rounding via grid_override
    if hasattr(layer, "grid") and isinstance(getattr(layer, "grid"), torch.Tensor):
        blob["grid"] = layer.grid.detach().numpy()
    if extra:
        blob.update(extra)
    os.makedirs(OUT_DIR, exist_ok=True)
    path = os.path.join(OUT_DIR, f"{name}.npz")
    np.savez_compressed(path, **blob)
    print(f"wrote {path}  (out shape {tuple(y.shape)})")


def dump_conv_layers():
    from layers import (
        KANConv2DLayer, FastKANConv2DLayer, ChebyKANConv2DLayer,
        LegendreKANConv2DLayer, GRAMKANConv2DLayer, JacobiKANConv2DLayer,
        BersnsteinKANConv2DLayer, BesselKANConv2DLayer,
        FibonacciKANConv2DLayer, FourierKANConv2DLayer,
        GegenbauerKANConv2DLayer, HermiteKANConv2DLayer,
        LaguerreKANConv2DLayer, LucasKANConv2DLayer, ReLUKANConv2DLayer,
        TaylorKANConv2DLayer, WavKANConv2DLayer,
        KANConv1DLayer, KANConv3DLayer,
    )

    cfgs = [
        ("g1", dict(groups=1, padding=1, stride=1, dilation=1), (2, 6, 8, 8)),
        ("g2s2", dict(groups=2, padding=1, stride=2, dilation=1), (2, 6, 9, 9)),
    ]

    families = {
        "kan": lambda **kw: KANConv2DLayer(6, 8, 3, grid_size=5, spline_order=3, **kw),
        "fastkan": lambda **kw: FastKANConv2DLayer(6, 8, 3, grid_size=8, **kw),
        "cheby": lambda **kw: ChebyKANConv2DLayer(6, 8, 3, degree=3, **kw),
        "legendre": lambda **kw: LegendreKANConv2DLayer(6, 8, 3, degree=3, **kw),
        "gram": lambda **kw: GRAMKANConv2DLayer(6, 8, 3, degree=3, **kw),
        "jacobi": lambda **kw: JacobiKANConv2DLayer(6, 8, 3, degree=3, **kw),
        "bernstein": lambda **kw: BersnsteinKANConv2DLayer(6, 8, 3, degree=3, **kw),
        "bessel": lambda **kw: BesselKANConv2DLayer(6, 8, 3, degree=3, **kw),
        "fibonacci": lambda **kw: FibonacciKANConv2DLayer(6, 8, 3, degree=3, **kw),
        "fourier": lambda **kw: FourierKANConv2DLayer(6, 8, 3, grid_size=3, **kw),
        "gegenbauer": lambda **kw: GegenbauerKANConv2DLayer(6, 8, 3, degree=3, alpha_param=0.5, **kw),
        "hermite": lambda **kw: HermiteKANConv2DLayer(6, 8, 3, degree=3, **kw),
        "laguerre": lambda **kw: LaguerreKANConv2DLayer(6, 8, 3, degree=3, alpha=1.0, **kw),
        "lucas": lambda **kw: LucasKANConv2DLayer(6, 8, 3, degree=3, **kw),
        "relukan": lambda **kw: ReLUKANConv2DLayer(6, 8, 3, g=5, k=3, **kw),
        "taylor": lambda **kw: TaylorKANConv2DLayer(6, 8, 3, degree=3, **kw),
    }

    for fam, builder in families.items():
        for tag, kw, xshape in cfgs:
            torch.manual_seed(42)
            layer = builder(**kw)
            torch.manual_seed(7)
            x = torch.randn(*xshape)
            _save(f"conv2d_{fam}_{tag}", layer, x)

    # WavKAN: every wavelet type on 'fast', every engine on mexican_hat
    for wt in ["mexican_hat", "morlet", "dog", "meyer", "shannon"]:
        torch.manual_seed(42)
        layer = WavKANConv2DLayer(6, 8, 3, padding=1, wav_version="fast",
                                  wavelet_type=wt)
        torch.manual_seed(7)
        x = torch.randn(2, 6, 8, 8)
        _save(f"conv2d_wavkan_fast_{wt}", layer, x)
    for ver in ["base", "fast", "fast_plus_one"]:
        torch.manual_seed(42)
        layer = WavKANConv2DLayer(6, 8, 3, padding=1, groups=2, wav_version=ver,
                                  wavelet_type="mexican_hat")
        torch.manual_seed(7)
        x = torch.randn(2, 6, 8, 8)
        _save(f"conv2d_wavkan_{ver}_g2", layer, x)

    # 1D / 3D rank coverage for the shared skeleton
    torch.manual_seed(42)
    l1 = KANConv1DLayer(6, 8, 3, padding=1)
    torch.manual_seed(7)
    _save("conv1d_kan_g1", l1, torch.randn(2, 6, 16))
    torch.manual_seed(42)
    l3 = KANConv3DLayer(4, 6, 3, padding=1)
    torch.manual_seed(7)
    _save("conv3d_kan_g1", l3, torch.randn(2, 4, 5, 6, 6))

    # dilation + kernel-5 coverage
    for fam, builder in [("kan", lambda: KANConv2DLayer(
            6, 8, 5, padding=4, dilation=2)),
            ("cheby", lambda: ChebyKANConv2DLayer(
                6, 8, 5, degree=3, padding=4, dilation=2))]:
        torch.manual_seed(42)
        layer = builder()
        torch.manual_seed(7)
        _save(f"conv2d_{fam}_k5d2", layer, torch.randn(2, 6, 12, 12))

    # affine BatchNorm post-norm (exercises norm params + running stats)
    torch.manual_seed(42)
    lbn = KANConv2DLayer(6, 8, 3, padding=1,
                         norm_layer=torch.nn.BatchNorm2d)
    torch.manual_seed(7)
    _save("conv2d_kan_bn", lbn, torch.randn(2, 6, 8, 8))

    # WavKAN rank coverage
    from layers import WavKANConv1DLayer, WavKANConv3DLayer
    torch.manual_seed(42)
    w1 = WavKANConv1DLayer(6, 8, 3, padding=1, wav_version="fast")
    torch.manual_seed(7)
    _save("conv1d_wavkan_fast", w1, torch.randn(2, 6, 16))
    torch.manual_seed(42)
    w3 = WavKANConv3DLayer(4, 6, 3, padding=1, wav_version="fast")
    torch.manual_seed(7)
    _save("conv3d_wavkan_fast", w3, torch.randn(2, 4, 5, 6, 6))


def dump_fastkan_norm_variants():
    """FastKAN grouped input-norm fidelity fixtures (VERDICT r2 #6).

    The reference builds one `norm_class(input_dim // groups)` instance per
    group (fast_kan_layers.py:80) and applies it to that group's slice
    (:106).  Two reference-expressible non-default norms:

    * BatchNorm2d — affine + running stats per group (stats perturbed by
      train-mode forwards so the eval fixture is non-trivial).
    * LayerNorm — torch normalizes the trailing NCHW axis (W), which only
      runs when W == in_g; the fixture pins that documented quirk.
    """
    from layers import FastKANConv2DLayer

    torch.manual_seed(42)
    lbn = FastKANConv2DLayer(6, 8, 3, groups=2, padding=1,
                             norm_layer=torch.nn.BatchNorm2d)
    lbn = lbn.double()
    torch.manual_seed(11)
    with torch.no_grad():
        for _ in range(3):  # move running stats off their init values
            lbn(torch.randn(2, 6, 8, 8).double())
    torch.manual_seed(7)
    _save("conv2d_fastkan_g2_bn", lbn, torch.randn(2, 6, 8, 8))

    torch.manual_seed(42)
    lln = FastKANConv2DLayer(6, 8, 3, groups=2, padding=1,
                             norm_layer=torch.nn.LayerNorm)
    torch.manual_seed(7)
    # trailing spatial dim == in_g == 3 (the only shape torch accepts)
    _save("conv2d_fastkan_g2_ln", lln, torch.randn(2, 6, 9, 3))


def dump_mlp_layers():
    from layers import (
        KANLayer, FastKANLayer, ChebyKANLayer, LegendreKANLayer,
        GRAMKANLayer, JacobiKANLayer, BersnsteinKANLayer, BesselKANLayer,
        FibonacciKANLayer, FourierKANLayer, GegenbauerKANLayer,
        HermiteKANLayer, LaguerreKANLayer, LucasKANLayer, ReLUKANLayer,
        TaylorKANLayer, WavKANLayer,
    )

    builders = {
        "kan": lambda: KANLayer(12, 5),
        "fastkan": lambda: FastKANLayer(12, 5),
        "cheby": lambda: ChebyKANLayer(12, 5, 3),
        "legendre": lambda: LegendreKANLayer(12, 5, 3),
        "gram": lambda: GRAMKANLayer(12, 5, 3),
        "jacobi": lambda: JacobiKANLayer(12, 5, 3),
        "bernstein": lambda: BersnsteinKANLayer(12, 5, 3),
        "bessel": lambda: BesselKANLayer(12, 5, 3),
        "fibonacci": lambda: FibonacciKANLayer(12, 5, 3),
        "fourier": lambda: FourierKANLayer(12, 5, 3),
        "gegenbauer": lambda: GegenbauerKANLayer(12, 5, 3, 0.5),
        "hermite": lambda: HermiteKANLayer(12, 5, 3),
        "laguerre": lambda: LaguerreKANLayer(12, 5, 3, 1.0),
        "lucas": lambda: LucasKANLayer(12, 5, 3),
        "relukan": lambda: ReLUKANLayer(12, 5, 3, 5),
        "taylor": lambda: TaylorKANLayer(12, 5, 3, add_bias=True),
        "wavkan": lambda: WavKANLayer(12, 5),
    }
    for fam, b in builders.items():
        torch.manual_seed(42)
        layer = b()
        torch.manual_seed(7)
        x = torch.randn(4, 12)
        _save(f"mlp_{fam}", layer, x)

    # wavkan MLP per wavelet type
    for wt in ["morlet", "dog", "meyer", "shannon"]:
        torch.manual_seed(42)
        layer = WavKANLayer(12, 5, wavelet_type=wt)
        torch.manual_seed(7)
        _save(f"mlp_wavkan_{wt}", layer, torch.randn(4, 12))


def dump_models():
    """Whole-model goldens: reference VGGKAN forward on fixed seeds."""
    import types

    if "torchvision" not in sys.modules:
        tv = types.ModuleType("torchvision")
        tv_ops = types.ModuleType("torchvision.ops")
        tv_misc = types.ModuleType("torchvision.ops.misc")
        tv_misc.SqueezeExcitation = torch.nn.Identity
        tv_ops.misc = tv_misc
        tv.ops = tv_ops
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.ops"] = tv_ops
        sys.modules["torchvision.ops.misc"] = tv_misc

    from models.kan_vgg import vggkan

    configs = [
        ("model_vgg_kan_linear",
         dict(kan_conv="KAN", classifier_type="Linear")),
        ("model_vgg_cheby_kanhead",
         dict(kan_conv="ChebyKAN", classifier_type="KAN",
              kan_classifier="KAN")),
    ]
    for name, kw in configs:
        torch.manual_seed(42)
        model = vggkan(input_channels=3, num_classes=10,
                       arch="VGG16_kansmall", **kw)
        torch.manual_seed(7)
        x = torch.randn(2, 3, 32, 32)
        _save(name, model, x)

    # NOTE: an AlexNet-small whole-model golden was evaluated and dropped —
    # the f64 fixture is 250 MB (fc1 alone is 9216x1024).  AlexNet
    # migration is covered structurally (tests/test_model_migration.py::
    # test_alexnet_state_dict_migration) on top of the layer-level numeric
    # goldens, which pin the same convert_kan_conv mapping.


def dump_train_steps():
    """Training-dynamics golden: 5 AdamW steps on a KAN MLP with fixed
    weights/data; the per-step losses pin gradient + optimizer numerics."""
    from layers import KANLayer

    class Stack(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.l1 = KANLayer(12, 8)
            self.l2 = KANLayer(8, 4)

        def forward(self, x):
            return self.l2(self.l1(x))

    torch.manual_seed(42)
    model = Stack().double()
    torch.manual_seed(7)
    x = torch.randn(16, 12)
    y = torch.randint(0, 4, (16,), generator=torch.Generator().manual_seed(3))
    opt = torch.optim.AdamW(model.parameters(), lr=1e-3, weight_decay=1e-3)
    crit = torch.nn.CrossEntropyLoss()
    losses = []
    sd0 = {k: v.detach().clone().numpy() for k, v in model.state_dict().items()}
    for _ in range(5):
        opt.zero_grad()
        loss = crit(model(x), y)
        loss.backward()
        opt.step()
        losses.append(float(loss))
    blob = {"x": x.numpy(), "y": np.zeros(1), "labels": y.numpy(),
            "losses": np.asarray(losses),
            # KANLayer.grid is a plain (unregistered) tensor attribute
            "l1.grid": model.l1.grid.numpy(),
            "l2.grid": model.l2.grid.numpy()}
    for k, v in sd0.items():
        blob[f"param:{k}"] = v
    path = os.path.join(OUT_DIR, "train_steps_kan_mlp.npz")
    np.savez_compressed(path, **blob)
    print(f"wrote {path}  losses={losses}")


def dump_rank_coverage():
    """1D/3D goldens for every non-wavelet family (VERDICT r1 #5) plus
    groups>1 WavKAN 1D/3D.  Oracle: the reference's per-family
    `<Basis>KANConv{1,3}DLayer` classes (e.g.
    layers/legendre_kan_layers.py:166-193)."""
    import layers as L

    prefixes = {
        "fastkan": "FastKAN", "cheby": "ChebyKAN", "legendre": "LegendreKAN",
        "gram": "GRAMKAN", "jacobi": "JacobiKAN", "bernstein": "BersnsteinKAN",
        "bessel": "BesselKAN", "fibonacci": "FibonacciKAN",
        "fourier": "FourierKAN", "gegenbauer": "GegenbauerKAN",
        "hermite": "HermiteKAN", "laguerre": "LaguerreKAN",
        "lucas": "LucasKAN", "relukan": "ReLUKAN", "taylor": "TaylorKAN",
    }
    fam_kw = {
        "fastkan": dict(grid_size=8),
        "fourier": dict(grid_size=3),
        "gegenbauer": dict(degree=3, alpha_param=0.5),
        "laguerre": dict(degree=3, alpha=1.0),
        "relukan": dict(g=5, k=3),
    }
    for fam, pre in prefixes.items():
        kw = fam_kw.get(fam, dict(degree=3))
        c1 = getattr(L, f"{pre}Conv1DLayer")
        c3 = getattr(L, f"{pre}Conv3DLayer")
        torch.manual_seed(42)
        l1 = c1(6, 8, 3, padding=1, **kw)
        torch.manual_seed(7)
        _save(f"conv1d_{fam}_g1", l1, torch.randn(2, 6, 16))
        torch.manual_seed(42)
        l3 = c3(4, 6, 3, padding=1, **kw)
        torch.manual_seed(7)
        _save(f"conv3d_{fam}_g1", l3, torch.randn(2, 4, 5, 6, 6))

    from layers import WavKANConv1DLayer, WavKANConv3DLayer
    torch.manual_seed(42)
    w1 = WavKANConv1DLayer(6, 8, 3, padding=1, groups=2, wav_version="fast")
    torch.manual_seed(7)
    _save("conv1d_wavkan_fast_g2", w1, torch.randn(2, 6, 16))
    torch.manual_seed(42)
    w3 = WavKANConv3DLayer(4, 6, 3, padding=1, groups=2, wav_version="fast")
    torch.manual_seed(7)
    _save("conv3d_wavkan_fast_g2", w3, torch.randn(2, 4, 5, 6, 6))


def dump_mobilenet_v3():
    """Whole-model MNv3-small migration fixture (VERDICT r2 #5): grafted
    reference weights must reproduce the reference forward end-to-end.
    width_mult=0.25 + 64^2 input keeps the committed f64 fixture small."""
    import tv_stub  # noqa: F401  (torchvision SqueezeExcitation stub)
    from models.kan_mobilenetv3 import MobileNetV3KAN

    torch.manual_seed(42)
    m = MobileNetV3KAN(arch="small", num_classes=4, width_mult=0.25,
                       kan_conv="ChebyKAN", degree=3,
                       classifier_type="Linear")
    # move BatchNorm running stats off init so the eval fixture covers them
    m = m.double().train()
    torch.manual_seed(11)
    with torch.no_grad():
        for _ in range(2):
            m(torch.randn(2, 3, 64, 64).double())
    torch.manual_seed(7)
    _save("model_mnv3_small_cheby", m, torch.randn(2, 3, 64, 64))

    # a base-path family (FastKAN): pins that kanconv layers use the
    # MODEL-level activation (the per-block RE/HS only reaches the std
    # depthwise layers — kan_mobilenetv3.py:253-271)
    torch.manual_seed(42)
    mf = MobileNetV3KAN(arch="small", num_classes=4, width_mult=0.25,
                        kan_conv="FastKAN",
                        classifier_type="Linear").double().train()
    torch.manual_seed(11)
    with torch.no_grad():
        for _ in range(2):
            mf(torch.randn(2, 3, 64, 64).double())
    torch.manual_seed(7)
    _save("model_mnv3_small_fastkan", mf, torch.randn(2, 3, 64, 64))


def dump_mobilenet_v1_v2():
    """Whole-model MNv1/MNv2 migration fixtures (VERDICT r2 #5)."""
    import tv_stub  # noqa: F401  (models/__init__ imports EffNet -> tv)
    from models.kan_mobilenet import MobileNetV1KAN
    from models.kan_mobilenetv2 import MobileNetV2KAN

    # the reference's MNv1 kanconv path is unconstructible (in_channels vs
    # in_planes crash, kan_mobilenet.py:249) — conv_type='conv' is the
    # only layout real reference checkpoints can have
    torch.manual_seed(42)
    m1 = MobileNetV1KAN(num_classes=4, width_mult=0.25,
                        conv_type="conv",
                        classifier_type="Linear").double().train()
    torch.manual_seed(11)
    with torch.no_grad():
        for _ in range(2):
            m1(torch.randn(2, 3, 64, 64).double())
    torch.manual_seed(7)
    _save("model_mnv1_conv", m1, torch.randn(2, 3, 64, 64))

    torch.manual_seed(42)
    m2 = MobileNetV2KAN(num_classes=4, arch="kan_small", width_mult=0.25,
                        kan_conv="BesselKAN", degree=3,
                        classifier_type="Linear").double().train()
    torch.manual_seed(11)
    with torch.no_grad():
        for _ in range(2):
            m2(torch.randn(2, 3, 32, 32).double())
    torch.manual_seed(7)
    _save("model_mnv2_kansmall_bessel", m2, torch.randn(2, 3, 32, 32))


def dump_efficientnetv2():
    """Whole-model EfficientNetV2 kan_tiny migration fixture."""
    import tv_stub  # noqa: F401
    from models.kan_efficientnetv2 import efficientnetv2_kan_small

    torch.manual_seed(42)
    m = efficientnetv2_kan_small(arch="kan_tiny", num_classes=4,
                                 kan_conv="GRAMKAN", degree=3,
                                 classifier_type="Linear").double().train()
    torch.manual_seed(11)
    with torch.no_grad():
        for _ in range(2):
            m(torch.randn(2, 3, 32, 32).double())
    torch.manual_seed(7)
    _save("model_effv2_kantiny_gram", m, torch.randn(2, 3, 32, 32))


if __name__ == "__main__":
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    if "--rank-coverage" in sys.argv:
        dump_rank_coverage()
    elif "--fastkan-norms" in sys.argv:
        dump_fastkan_norm_variants()
    elif "--mnv3" in sys.argv:
        dump_mobilenet_v3()
    elif "--mnv12" in sys.argv:
        dump_mobilenet_v1_v2()
    elif "--effv2" in sys.argv:
        dump_efficientnetv2()
    else:
        dump_conv_layers()
        dump_fastkan_norm_variants()
        dump_mobilenet_v3()
        dump_mobilenet_v1_v2()
        dump_efficientnetv2()
        dump_mlp_layers()
        dump_models()
        dump_train_steps()
        dump_rank_coverage()
    print("done")
