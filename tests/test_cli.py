"""CLI parity: every --model choice (train.py:50-53) builds through the
argument plumbing without touching devices."""

import pytest

import train as cli


CASES = [
    ["--model", "VGGKAN", "--arch", "VGG16", "--kan_conv", "FastKAN",
     "--classifier_type", "KAN"],
    ["--model", "VGGKAN", "--arch", "VGG16_small", "--conv_type", "conv",
     "--classifier_type", "VGG"],
    ["--model", "AlexNetKAN", "--arch", "small", "--kan_conv", "GRAMKAN"],
    ["--model", "FlexibleAlexNet", "--classifier_type", "KAN"],
    ["--model", "MobileNetV1KAN", "--width_scale", "0.5",
     "--replace_depthwise"],
    ["--model", "MobileNetV2KAN", "--arch", "kan_small",
     "--kan_conv", "ChebyKAN"],
    ["--model", "MobileNetV3KAN", "--arch", "large",
     "--classifier_type", "KAN", "--classifier_degree", "4"],
    ["--model", "EfficientNetKAN", "--arch", "b0_small"],
    ["--model", "EfficientNetKAN", "--arch", "b0"],
    ["--model", "EfficientNetV2KAN", "--arch", "kan_tiny",
     "--classifier_type", "HiddenKAN"],
    ["--model", "EfficientNetV2KAN", "--arch", "s",
     "--norm_layer", "InstanceNorm2d", "--norm_affine"],
    ["--model", "MoEKanMLP", "--kan_classifier", "ChebyKAN",
     "--moe_experts", "8", "--moe_blocks", "1"],
    ["--model", "PipelinedKanMLP", "--kan_classifier", "FastKAN",
     "--pipe_stages", "6", "--pipe_hidden", "32"],
]


@pytest.mark.parametrize("argv", CASES, ids=lambda a: "_".join(a[1:4]))
def test_cli_builds_model(argv):
    args = cli.build_parser().parse_args(argv + ["--synthetic_data"])
    model = cli.build_model(args, (32, 32, 3), 10)
    assert model is not None
    assert getattr(model, "model_name", None)


def test_cli_rejects_bad_effv2_arch():
    args = cli.build_parser().parse_args(
        ["--model", "EfficientNetV2KAN", "--arch", "bogus"])
    with pytest.raises(SystemExit):
        cli.build_model(args, (32, 32, 3), 10)


@pytest.mark.slow
def test_cli_main_end_to_end_report_artifacts(tmp_path):
    """train.py main(): full run emits the reference report surface —
    loss curves, params-vs-acc scatter, reference-schema
    experiment_results.csv + styled HTML, all-classes ROC figure, and the
    per-epoch training_history.csv (evaluations.py:263-400)."""
    import os
    cli.main(["--model", "VGGKAN", "--arch", "VGG16_kansmall",
              "--dataset", "MNIST", "--synthetic_data",
              "--synthetic_size", "128", "--epoch", "1",
              "--batch_size", "64", "--grad_accum", "2",
              "--results_dir", str(tmp_path)])
    for name in ("loss_curves.png", "params_vs_accuracy.png",
                 "roc_curves.png", "experiment_results.csv",
                 "experiment_results.html", "training_history.csv"):
        p = tmp_path / name
        assert p.exists() and p.stat().st_size > 0, name
    head = (tmp_path / "experiment_results.csv").read_text().splitlines()[0]
    assert head.startswith("Model Name,Final Test Accuracy")
    assert os.path.isdir(tmp_path / "MNIST" / "models")
    # run record for `python -m convkan_tpu.report` aggregation
    recs = list((tmp_path / "runs").glob("*.npz"))
    assert len(recs) == 1 and recs[0].stat().st_size > 0


def test_cli_mesh_spatial_validation():
    """--mesh_spatial misconfigurations die with a clear SystemExit at
    setup, not a raw JAX shape error mid-run: H not divisible by the
    spatial axis; more mesh devices than exist."""
    base = ["--model", "VGGKAN", "--arch", "VGG16_kansmall",
            "--dataset", "MNIST", "--synthetic_data",
            "--synthetic_size", "64", "--epoch", "1", "--batch_size", "32"]
    with pytest.raises(SystemExit, match="divide the image height"):
        cli.main(base + ["--mesh_spatial", "8"])  # 28 % 8 != 0
    with pytest.raises(SystemExit, match="devices"):
        cli.main(base + ["--mesh_spatial", "16"])  # > device count


@pytest.mark.slow
def test_cli_main_mesh_spatial(tmp_path):
    """--mesh_spatial 2: end-to-end spatially-sharded training through
    the CLI — data_sharding H-shards the input batches and
    set_spatial_defaults halo-shards every conv; composes with
    --mesh_data."""
    from convkan_tpu.parallel import halo

    prev = (halo._SPATIAL_DEFAULTS["mesh"], halo._SPATIAL_DEFAULTS["axis"])
    try:
        cli.main(["--model", "VGGKAN", "--arch", "VGG16_kansmall",
                  "--dataset", "CIFAR10", "--synthetic_data",
                  "--synthetic_size", "128", "--epoch", "1",
                  "--batch_size", "64", "--mesh_data", "2",
                  "--mesh_spatial", "2",
                  "--results_dir", str(tmp_path)])
    finally:
        halo.set_spatial_defaults(*prev)
    import os
    assert os.path.isdir(tmp_path / "CIFAR10" / "models")


@pytest.mark.slow
def test_cli_bf16_island_trains(tmp_path):
    """--bf16_island: the mixed-precision island knob reaches every layer
    built by the CLI (process default) and a short run still learns on
    the memorization set."""
    from convkan_tpu.nn.kan_conv import _PERF_DEFAULTS, set_perf_defaults

    import numpy as np

    assert _PERF_DEFAULTS["island_bf16"] is False
    try:
        cli.main(["--model", "VGGKAN", "--arch", "VGG16_kansmall",
                  "--dataset", "MNIST", "--synthetic_data",
                  "--synthetic_size", "128", "--epoch", "2",
                  "--batch_size", "64", "--bf16_island",
                  "--results_dir", str(tmp_path)])
        assert _PERF_DEFAULTS["island_bf16"] is True
        import csv

        hist = tmp_path / "training_history.csv"
        with open(hist) as f:
            rows = list(csv.DictReader(f))
        losses = [float(r["train_loss"]) for r in rows]
        assert len(losses) == 2 and all(np.isfinite(losses))
        assert losses[-1] < losses[0], f"no learning under bf16: {losses}"
    finally:
        set_perf_defaults(island_bf16=False)


def test_cli_profile_and_debug_nans(tmp_path):
    """--profile_dir writes a jax.profiler trace of the run; --debug_nans
    turns on the NaN tripwire (the reference's set_detect_anomaly
    analogue, train.py:431 — opt-in here) without breaking a clean run."""
    import glob
    import os

    import jax

    prof = tmp_path / "trace"
    try:
        cli.main(["--model", "VGGKAN", "--arch", "VGG16_kansmall",
                  "--dataset", "MNIST", "--synthetic_data",
                  "--synthetic_size", "64", "--epoch", "1",
                  "--batch_size", "32", "--debug_nans",
                  "--profile_dir", str(prof),
                  "--results_dir", str(tmp_path)])
        assert jax.config.jax_debug_nans
        assert glob.glob(os.path.join(str(prof), "**", "*.pb"),
                         recursive=True) or \
            glob.glob(os.path.join(str(prof), "**", "*.json.gz"),
                      recursive=True), "no trace artifact written"
    finally:
        from convkan_tpu.train.profiling import debug_nans

        debug_nans(False)  # process-wide flag: don't leak into other tests


@pytest.mark.slow
def test_cli_eval_only(tmp_path):
    """--eval_only: evaluates an existing checkpoint without training —
    the reference's post-hoc test() surface (evaluations.py:81-153) as a
    CLI.  Metrics must match what a fresh evaluate() of that checkpoint
    returns, and a missing checkpoint must fail loudly."""
    base = ["--model", "VGGKAN", "--arch", "VGG16_kansmall",
            "--dataset", "MNIST", "--synthetic_data",
            "--synthetic_size", "128", "--batch_size", "64",
            "--results_dir", str(tmp_path)]
    with pytest.raises(SystemExit, match="no 'best' checkpoint"):
        cli.main(base + ["--eval_only"])
    cli.main(base + ["--epoch", "1"])
    out = cli.main(base + ["--eval_only"])
    assert set(out) == {"test_loss", "accuracy", "precision", "recall",
                        "f1", "inference_ms"}
    assert 0.0 <= out["accuracy"] <= 1.0 and out["inference_ms"] > 0
    # determinism: a second eval of the same checkpoint agrees exactly
    out2 = cli.main(base + ["--eval_only", "--eval_kind", "last"])
    assert out2["test_loss"] == pytest.approx(out["test_loss"], abs=1e-6)


@pytest.mark.slow
def test_cli_eval_only_ema_and_clip(tmp_path):
    """--eval_only restores the raw payload (no optimizer template), so
    checkpoints trained with --ema_decay/--clip_grad_norm/--scheduler
    evaluate WITHOUT re-specifying the flags, and EMA-trained checkpoints
    are evaluated on the EMA weights — the same weights the training
    loop's per-epoch eval used and serve.py serves."""
    import csv

    base = ["--model", "VGGKAN", "--arch", "VGG16_kansmall",
            "--dataset", "MNIST", "--synthetic_data",
            "--synthetic_size", "128", "--batch_size", "64",
            "--results_dir", str(tmp_path)]
    cli.main(base + ["--epoch", "1", "--ema_decay", "0.9",
                     "--clip_grad_norm", "1.0"])
    # no --ema_decay / --clip_grad_norm here: must still evaluate
    out = cli.main(base + ["--eval_only", "--eval_kind", "last"])
    # ... on the EMA weights: matches the training loop's recorded eval
    with open(tmp_path / "training_history.csv") as f:
        last_row = list(csv.DictReader(f))[-1]
    assert out["test_loss"] == pytest.approx(float(last_row["test_loss"]),
                                             abs=1e-5)
    assert out["accuracy"] == pytest.approx(float(last_row["accuracy"]),
                                            abs=1e-6)


def test_cli_mesh_expert_validation():
    """--mesh_expert: MoEKanMLP-only, must divide --moe_experts, and is
    exclusive with --zero1."""
    base = ["--dataset", "MNIST", "--synthetic_data", "--synthetic_size",
            "64", "--epoch", "1", "--batch_size", "32"]
    with pytest.raises(SystemExit, match="MoEKanMLP only"):
        cli.main(["--model", "VGGKAN", "--arch", "VGG16_kansmall",
                  "--mesh_expert", "2"] + base)
    with pytest.raises(SystemExit, match="divide"):
        cli.main(["--model", "MoEKanMLP", "--moe_experts", "3",
                  "--mesh_expert", "2"] + base)
    with pytest.raises(SystemExit, match="exclusive"):
        cli.main(["--model", "MoEKanMLP", "--mesh_expert", "2",
                  "--mesh_data", "2", "--zero1"] + base)


def test_cli_main_moe_expert_parallel(tmp_path):
    """MoEKanMLP end-to-end through the CLI with experts sharded over a
    2-wide 'expert' axis (x4 data)."""
    import os
    cli.main(["--model", "MoEKanMLP", "--kan_classifier", "ChebyKAN",
              "--moe_experts", "4", "--moe_blocks", "1",
              "--moe_hidden", "32", "--dataset", "MNIST",
              "--synthetic_data", "--synthetic_size", "128",
              "--epoch", "1", "--batch_size", "64",
              "--mesh_data", "4", "--mesh_expert", "2",
              "--results_dir", str(tmp_path)])
    assert os.path.isdir(tmp_path / "MNIST" / "models")


def test_cli_mesh_pipe_validation():
    """--mesh_pipe: PipelinedKanMLP or VGGKAN only (round 4 added the
    heterogeneous CNN path), must divide --pipe_stages, and the
    per-data-shard batch must split into the GPipe microbatches."""
    base = ["--dataset", "MNIST", "--synthetic_data", "--synthetic_size",
            "64", "--epoch", "1", "--batch_size", "32"]
    with pytest.raises(SystemExit, match="PipelinedKanMLP"):
        cli.main(["--model", "AlexNetKAN", "--arch", "default",
                  "--mesh_pipe", "2"] + base)
    with pytest.raises(SystemExit, match="divide"):
        cli.main(["--model", "PipelinedKanMLP", "--pipe_stages", "3",
                  "--mesh_pipe", "2"] + base)
    with pytest.raises(SystemExit, match="microbatches"):
        cli.main(["--model", "PipelinedKanMLP", "--pipe_stages", "4",
                  "--mesh_pipe", "4", "--mesh_data", "2",
                  "--pipe_microbatches", "7"] + base)


def test_cli_main_pipeline_parallel(tmp_path):
    """PipelinedKanMLP end-to-end through the CLI: 4 stages GPipe-
    scheduled over a 2-wide 'pipe' axis (x4 data), stage params and
    moments sharded."""
    import os
    cli.main(["--model", "PipelinedKanMLP", "--kan_classifier", "ChebyKAN",
              "--pipe_stages", "4", "--pipe_hidden", "32",
              "--dataset", "MNIST", "--synthetic_data",
              "--synthetic_size", "128", "--epoch", "1",
              "--batch_size", "64", "--mesh_data", "4", "--mesh_pipe", "2",
              "--results_dir", str(tmp_path)])
    assert os.path.isdir(tmp_path / "MNIST" / "models")


def test_cli_mesh_model_validation():
    """--mesh_model: too many devices rejected.  (--mesh_model x
    --mesh_spatial is a supported composition since round 4 — see
    test_cli_main_spatial_model.)"""
    base = ["--model", "VGGKAN", "--arch", "VGG16_kansmall",
            "--dataset", "MNIST", "--synthetic_data", "--synthetic_size",
            "64", "--epoch", "1", "--batch_size", "32"]
    with pytest.raises(SystemExit, match="devices"):
        cli.main(base + ["--mesh_model", "4", "--mesh_data", "4"])


@pytest.mark.slow
def test_cli_main_spatial_model(tmp_path):
    """--mesh_data 2 x --mesh_model 2 x --mesh_spatial 2 on the 8-device
    mesh: composed data x tensor x spatial parallel training through the
    CLI (VERDICT r3 #4) — params 'model'-sharded, convs halo-exchanged,
    weights kept sharded inside the halo shard_map (parallel/halo.py)."""
    from convkan_tpu.parallel import halo

    prev = (halo._SPATIAL_DEFAULTS["mesh"], halo._SPATIAL_DEFAULTS["axis"])
    try:
        cli.main(["--model", "VGGKAN", "--arch", "VGG16_kansmall",
                  "--dataset", "CIFAR10", "--synthetic_data",
                  "--synthetic_size", "128", "--epoch", "1",
                  "--batch_size", "64", "--mesh_data", "2",
                  "--mesh_model", "2", "--mesh_spatial", "2",
                  "--results_dir", str(tmp_path)])
    finally:
        halo.set_spatial_defaults(*prev)
    import os
    assert os.path.isdir(tmp_path / "CIFAR10" / "models")


def test_cli_main_tensor_parallel(tmp_path):
    """--mesh_model: end-to-end CLI training with conv/linear output
    channels (and optimizer moments) sharded over a 4-wide 'model' axis
    (x2 data)."""
    import os
    cli.main(["--model", "VGGKAN", "--arch", "VGG16_kansmall",
              "--dataset", "MNIST", "--synthetic_data",
              "--synthetic_size", "128", "--epoch", "1",
              "--batch_size", "64", "--mesh_data", "2",
              "--mesh_model", "4", "--results_dir", str(tmp_path)])
    assert os.path.isdir(tmp_path / "MNIST" / "models")


def test_cli_zero1_needs_data_axis():
    """--zero1 without a multi-device data axis dies with a clear
    SystemExit at setup."""
    with pytest.raises(SystemExit, match="zero1"):
        cli.main(["--model", "VGGKAN", "--arch", "VGG16_kansmall",
                  "--dataset", "MNIST", "--synthetic_data",
                  "--synthetic_size", "64", "--epoch", "1",
                  "--batch_size", "32", "--mesh_data", "1", "--zero1"])


@pytest.mark.slow
def test_cli_main_zero1(tmp_path):
    """--zero1: end-to-end training through the CLI with the optimizer
    state sharded over the data axis."""
    cli.main(["--model", "VGGKAN", "--arch", "VGG16_kansmall",
              "--dataset", "CIFAR10", "--synthetic_data",
              "--synthetic_size", "128", "--epoch", "1",
              "--batch_size", "64", "--mesh_data", "8", "--zero1",
              "--results_dir", str(tmp_path)])
    import os
    assert os.path.isdir(tmp_path / "CIFAR10" / "models")


def test_cli_fsdp_needs_data_axis():
    """--fsdp without a multi-device data axis dies with a clear
    SystemExit at setup."""
    with pytest.raises(SystemExit, match="fsdp"):
        cli.main(["--model", "VGGKAN", "--arch", "VGG16_kansmall",
                  "--dataset", "MNIST", "--synthetic_data",
                  "--synthetic_size", "64", "--epoch", "1",
                  "--batch_size", "32", "--mesh_data", "1", "--fsdp"])


@pytest.mark.slow
def test_cli_main_fsdp(tmp_path):
    """--fsdp: end-to-end training through the CLI with params + optimizer
    state sharded over the data axis (GSPMD ZeRO-3), composed with a
    2-wide tensor-parallel 'model' axis."""
    import os
    cli.main(["--model", "VGGKAN", "--arch", "VGG16_kansmall",
              "--dataset", "CIFAR10", "--synthetic_data",
              "--synthetic_size", "128", "--epoch", "1",
              "--batch_size", "64", "--mesh_data", "4",
              "--mesh_model", "2", "--fsdp",
              "--results_dir", str(tmp_path)])
    assert os.path.isdir(tmp_path / "CIFAR10" / "models")
