"""Training CLI — flag-for-flag parity with the reference's train.py:44-92,
driving the TPU-native stack (jitted train/eval steps, on-device metrics,
Orbax checkpoints, optional data-parallel mesh).

Extra flags beyond the reference (documented): --resume (true mid-training
resume), --synthetic_data (zero-egress smoke runs), --mesh_data (data-
parallel device count; default all devices), --mesh_spatial (shard the
image H plane over N devices with halo-exchange convs — inputs too large
for one chip; composes with --mesh_data), --grad_accum (microbatched
gradient accumulation inside the jitted step — batch sizes beyond HBM).
"""

from __future__ import annotations

import argparse
import logging
import os
import sys

NORM_LAYER_CHOICES = ["BatchNorm2d", "InstanceNorm2d", "GroupNorm",
                      "RMSNorm", "LayerNorm", "None"]
ACT_CHOICES = ["gelu", "silu", "relu", "leakyrelu", "prelu", "tanh",
               "sigmoid", "hardswish", "None"]

MODEL_CHOICES = ["VGGKAN", "FlexibleAlexNet", "EfficientNetKAN",
                 "EfficientNetV2KAN", "AlexNetKAN", "MobileNetV2KAN",
                 "MobileNetV1KAN", "MobileNetV3KAN",
                 # beyond-reference: sparse mixture-of-KAN-experts MLP
                 # (parallel/moe.py), expert-parallel via --mesh_expert
                 "MoEKanMLP",
                 # beyond-reference: deep stage-stacked KAN MLP
                 # (parallel/pipeline.py), GPipe via --mesh_pipe
                 "PipelinedKanMLP"]


def build_parser() -> argparse.ArgumentParser:
    # reference train.py:44-92
    p = argparse.ArgumentParser(description="Training.")
    p.add_argument("--seed", default=42, type=int)
    p.add_argument("--dataset", type=str, default="MNIST",
                   choices=["MNIST", "SVHN", "CIFAR10", "CIFAR100"])
    p.add_argument("--batch_size", type=int, default=64)
    p.add_argument("--data_path", type=str, default="./data")
    p.add_argument("--epoch", type=int, default=20)
    p.add_argument("--model", type=str, default="FlexibleAlexNet",
                   choices=MODEL_CHOICES)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--weight_decay", type=float, default=1e-3)
    p.add_argument("--gamma", type=float, default=0.8)
    p.add_argument("--imagenet_preprocessing", action="store_true")
    p.add_argument("--results_dir", type=str, default="./results")
    p.add_argument("--num_workers", type=int, default=1)
    p.add_argument("--use_cuda", action="store_true",
                   help="accepted for reference-CLI parity (ignored; device "
                        "selection is JAX-platform driven)")
    p.add_argument("--arch", type=str)
    p.add_argument("--classifier_type", type=str, default="Linear")
    p.add_argument("--conv_type", type=str, default="kanconv",
                   choices=["kanconv", "conv"])
    p.add_argument("--kan_conv", type=str, default="KAN")
    p.add_argument("--kan_classifier", type=str, default="KAN")
    p.add_argument("--norm_layer", type=str, default="BatchNorm2d",
                   choices=NORM_LAYER_CHOICES)
    p.add_argument("--kan_norm_layer", type=str, default="BatchNorm2d",
                   choices=NORM_LAYER_CHOICES)
    p.add_argument("--norm_affine", action="store_true")
    p.add_argument("--dropout_conv", type=float, default=0.0)
    p.add_argument("--dropout_linear", type=float, default=0.5)
    p.add_argument("--grid_size", type=int, default=5)
    p.add_argument("--spline_order", type=int, default=3)
    p.add_argument("--l1_decay", type=float, default=0.0)
    p.add_argument("--groups", type=int, default=1)
    p.add_argument("--degree", type=int, default=3)
    p.add_argument("--classifier_dropout", type=float, default=None)
    p.add_argument("--classifier_grid_size", type=int, default=None)
    p.add_argument("--classifier_spline_order", type=int, default=None)
    p.add_argument("--classifier_l1_decay", type=float, default=None)
    p.add_argument("--classifier_degree", type=int, default=None)
    p.add_argument("--classifier_base_activation", type=str, default="None",
                   choices=ACT_CHOICES)
    p.add_argument("--width_scale", type=float, default=1)
    p.add_argument("--stochastic_depth_prob", type=float, default=0.2)
    p.add_argument("--replace_depthwise", action="store_true")
    # TPU-native extensions
    p.add_argument("--resume", action="store_true",
                   help="resume from the _last checkpoint if present")
    p.add_argument("--grad_accum", type=int, default=1,
                   help="split each batch into N microbatches inside the "
                        "jitted step (gradients averaged before the single "
                        "optimizer update) — trains batch sizes whose "
                        "activations exceed HBM")
    p.add_argument("--synthetic_data", action="store_true",
                   help="use synthetic dataset-shaped data (no files needed)")
    p.add_argument("--synthetic_size", type=int, default=2048,
                   help="synthetic train-set size (with --synthetic_data)")
    p.add_argument("--mesh_data", type=int, default=None,
                   help="data-parallel devices (default: all)")
    p.add_argument("--mesh_spatial", type=int, default=1,
                   help="shard the image H plane over this many devices "
                        "(halo-exchange convs, parallel/halo.py) — for "
                        "inputs too large for one chip; composes with "
                        "--mesh_data (data x spatial devices total)")
    p.add_argument("--mesh_expert", type=int, default=1,
                   help="expert-parallel devices: shard MoEKanMLP's "
                        "expert stacks (and their optimizer moments) over "
                        "an 'expert' mesh axis (parallel/moe.py; must "
                        "divide --moe_experts); composes with --mesh_data "
                        "(data x expert devices total)")
    p.add_argument("--moe_experts", type=int, default=4,
                   help="MoEKanMLP: experts per MoE block")
    p.add_argument("--moe_blocks", type=int, default=2,
                   help="MoEKanMLP: number of residual MoE blocks")
    p.add_argument("--moe_hidden", type=int, default=64,
                   help="MoEKanMLP: hidden width")
    p.add_argument("--moe_capacity_factor", type=float, default=1.25,
                   help="MoEKanMLP: expert buffer = ceil(tokens/E * this);"
                        " overflow tokens are dropped (Switch semantics)")
    p.add_argument("--moe_aux_weight", type=float, default=1e-2,
                   help="MoEKanMLP: weight of the load-balance aux loss")
    p.add_argument("--mesh_model", type=int, default=1,
                   help="tensor-parallel devices: shard every conv/linear "
                        "weight's output channels (and the matching "
                        "optimizer moments) over a 'model' mesh axis "
                        "(parallel/sharding.py GSPMD rules; XLA inserts "
                        "the ICI collectives); composes with --mesh_data "
                        "and --zero1 (data x model devices total)")
    p.add_argument("--mesh_pipe", type=int, default=1,
                   help="pipeline-parallel devices: run PipelinedKanMLP's "
                        "stage-stacked trunk as a GPipe scan+ppermute "
                        "schedule over a 'pipe' mesh axis "
                        "(parallel/pipeline.py; must divide "
                        "--pipe_stages); composes with --mesh_data")
    p.add_argument("--pipe_stages", type=int, default=4,
                   help="PipelinedKanMLP: identical hidden->hidden stages")
    p.add_argument("--pipe_hidden", type=int, default=64,
                   help="PipelinedKanMLP: hidden width")
    p.add_argument("--pipe_microbatches", type=int, default=0,
                   help="PipelinedKanMLP: GPipe microbatches per step "
                        "(0 = the pipe width); must divide the per-"
                        "data-shard batch")
    p.add_argument("--zero1", action="store_true",
                   help="shard the AdamW optimizer state over the 'data' "
                        "mesh axis (ZeRO-1: each shard stores 1/N of the "
                        "moments and computes 1/N of the update; params "
                        "stay replicated) — cuts per-device optimizer "
                        "memory ~2x param bytes; needs --mesh_data > 1")
    p.add_argument("--fsdp", action="store_true",
                   help="fully-sharded data parallelism (GSPMD ZeRO-3): "
                        "shard params, EMA, AND optimizer moments over "
                        "the 'data' mesh axis (parallel/sharding.py; XLA "
                        "all-gathers each weight at its use sites and "
                        "reduce-scatters its gradient) — per-device model "
                        "memory drops ~1/N; implies --zero1's moment "
                        "sharding, composes with --mesh_model; needs "
                        "--mesh_data > 1")
    p.add_argument("--patience", type=float, default=float("inf"),
                   help="early-stopping patience in epochs (reference "
                        "default: inf, evaluations.py:156)")
    p.add_argument("--eval_only", action="store_true",
                   help="evaluate an existing {name}_{kind} checkpoint on "
                        "the test set (loss/acc/macro P/R/F1 + honest "
                        "forward ms/image) and exit without training — the "
                        "reference's post-hoc test() surface "
                        "(evaluations.py:81-153) as a CLI")
    p.add_argument("--eval_kind", default="best", choices=["best", "last"],
                   help="which checkpoint --eval_only loads")
    p.add_argument("--bf16_island", action="store_true",
                   help="bf16 mixed precision for the KAN basis->conv "
                        "islands (KanConvND/WavKANConvND.island_bf16): the "
                        "wide basis tensors and their cotangents move half "
                        "the HBM bytes.  Measured +4%% on KAN-VGG, +18%% on "
                        "WavKAN (BENCH_NOTES.md); not torch-bit-exact")
    p.add_argument("--label_smoothing", type=float, default=0.0,
                   help="CE label smoothing (torch semantics; beyond-"
                        "reference, default off)")
    p.add_argument("--ema_decay", type=float, default=0.0,
                   help="maintain an EMA of the params with this decay "
                        "(e.g. 0.999) — evaluation, best-model selection "
                        "and checkpoints then use the EMA weights (the "
                        "EfficientNet serving recipe; beyond-reference)")
    p.add_argument("--scheduler", default="exponential",
                   choices=["exponential", "cosine"],
                   help="LR schedule: the reference's per-epoch "
                        "ExponentialLR(gamma), or cosine decay to 0 over "
                        "--epoch (beyond-reference)")
    p.add_argument("--warmup_epochs", type=int, default=0,
                   help="linear LR warmup epochs prepended to the "
                        "schedule (beyond-reference, default off)")
    p.add_argument("--clip_grad_norm", type=float, default=0.0,
                   help="clip gradients to this global L2 norm before the "
                        "optimizer update (torch clip_grad_norm_ "
                        "semantics; beyond-reference, default off)")
    p.add_argument("--debug_nans", action="store_true",
                   help="NaN/Inf tripwire (jax_debug_nans/_infs) — the "
                        "reference's always-on "
                        "torch.autograd.set_detect_anomaly(True) "
                        "(train.py:431), opt-in here because it forces "
                        "re-execution on failure")
    p.add_argument("--profile_dir", default=None,
                   help="write a jax.profiler trace of the run here "
                        "(open with Perfetto/XProf); profile a SHORT "
                        "--epoch schedule — the trace covers the whole "
                        "train/eval loop")
    return p


def build_model(args, input_shape, num_classes, expert_mesh=None,
                pipe_mesh=None):
    from convkan_tpu.models import (
        alexnet_kan, efficientnet_kan, efficientnet_kan_small,
        efficientnetv2_kan, efficientnetv2_kan_small, mobilenet_v1_kan,
        mobilenet_v2_kan, mobilenet_v3_kan, vggkan,
    )

    common_cls = dict(
        classifier_spline_order=args.classifier_spline_order,
        classifier_grid_size=args.classifier_grid_size,
        classifier_dropout=args.classifier_dropout,
        classifier_l1_decay=args.classifier_l1_decay,
        classifier_degree=args.classifier_degree,
        classifier_base_activation=(
            None if args.classifier_base_activation == "None"
            else args.classifier_base_activation),
    )

    norm = args.norm_layer
    kan_norm = args.kan_norm_layer

    if args.model == "VGGKAN":
        kw = {}
        builder = vggkan
        if pipe_mesh is not None:
            # heterogeneous-stage GPipe (models/vgg.PipelinedVGGKAN):
            # conv trunk FLOP-partitioned over the 'pipe' axis.  The VGG
            # norms must be stateless — force the InstanceNorm default
            # rather than crash on BatchNorm running stats.
            from convkan_tpu.models.vgg import pipelined_vggkan

            # either norm flag can route BatchNorm into the trunk
            # (norm_layer drives conv_type=conv blocks, kan_norm_layer the
            # KAN blocks) — apply the same graceful override to both
            # (ADVICE r4 #3)
            if "BatchNorm2d" in (args.kan_norm_layer, args.norm_layer):
                logging.getLogger("train").warning(
                    "--mesh_pipe VGGKAN needs stateless norms; using "
                    "InstanceNorm2d in place of BatchNorm2d")
                norm = kan_norm = "InstanceNorm2d"
            kw = dict(mesh=pipe_mesh,
                      n_microbatches=args.pipe_microbatches)
            builder = pipelined_vggkan
        return builder(
            input_channels=input_shape[-1], num_classes=num_classes,
            **kw,
            conv_type=args.conv_type,
            kan_conv=args.kan_conv if args.conv_type == "kanconv" else None,
            kan_classifier=(args.kan_classifier if args.classifier_type in
                            ["VGGKAN", "KAN", "HiddenKAN"] else None),
            dropout=args.dropout_conv, l1_decay=args.l1_decay,
            dropout_linear=args.dropout_linear,
            arch=args.arch or "VGG16", classifier_type=args.classifier_type,
            expected_feature_shape=(7, 7) if args.imagenet_preprocessing
            else (1, 1),
            width_scale=args.width_scale, affine=args.norm_affine,
            norm_layer=norm, kan_norm_layer=kan_norm,
            grid_size=args.grid_size, spline_order=args.spline_order,
            conv_dropout=args.dropout_conv, degree=args.degree,
            groups=args.groups, **common_cls)
    if args.model in ("FlexibleAlexNet", "AlexNetKAN"):
        return alexnet_kan(
            num_classes=num_classes, input_channels=input_shape[-1],
            dropout=args.dropout_linear, arch=args.arch or "default",
            conv_type=args.conv_type,
            kan_conv=args.kan_conv if args.conv_type == "kanconv" else None,
            classifier_type=args.classifier_type,
            kan_classifier=args.kan_classifier,
            norm_layer=norm, kan_norm_layer=kan_norm,
            affine=args.norm_affine, l1_decay=args.l1_decay,
            groups=args.groups, grid_size=args.grid_size,
            spline_order=args.spline_order, degree=args.degree,
            conv_dropout=args.dropout_conv, **common_cls)
    if args.model == "MobileNetV1KAN":
        return mobilenet_v1_kan(
            num_classes=num_classes, input_channels=input_shape[-1],
            width_mult=args.width_scale, dropout=args.dropout_linear,
            conv_type=args.conv_type, kan_conv=args.kan_conv,
            replace_depthwise=args.replace_depthwise,
            classifier_type=args.classifier_type,
            kan_classifier=args.kan_classifier, norm_layer=norm,
            kan_norm_layer=kan_norm, affine=args.norm_affine,
            l1_decay=args.l1_decay, groups=args.groups,
            grid_size=args.grid_size, spline_order=args.spline_order,
            degree=args.degree, conv_dropout=args.dropout_conv, **common_cls)
    if args.model == "MobileNetV2KAN":
        return mobilenet_v2_kan(
            num_classes=num_classes, arch=args.arch or "default",
            input_channels=input_shape[-1], width_mult=args.width_scale,
            dropout=args.dropout_linear, conv_type=args.conv_type,
            kan_conv=args.kan_conv,
            replace_depthwise=args.replace_depthwise,
            classifier_type=args.classifier_type,
            kan_classifier=args.kan_classifier, norm_layer=norm,
            kan_norm_layer=kan_norm, affine=args.norm_affine,
            l1_decay=args.l1_decay, groups=args.groups,
            grid_size=args.grid_size, spline_order=args.spline_order,
            degree=args.degree, conv_dropout=args.dropout_conv, **common_cls)
    if args.model == "MobileNetV3KAN":
        if args.arch not in ("large", "small"):
            raise SystemExit("MobileNetV3 requires --arch large|small")
        return mobilenet_v3_kan(
            arch=args.arch, num_classes=num_classes,
            input_channels=input_shape[-1], width_mult=args.width_scale,
            dropout=args.dropout_linear, conv_type=args.conv_type,
            kan_conv=args.kan_conv,
            replace_depthwise=args.replace_depthwise,
            classifier_type=args.classifier_type,
            kan_classifier=args.kan_classifier, norm_layer=norm,
            kan_norm_layer=kan_norm, affine=args.norm_affine,
            l1_decay=args.l1_decay, groups=args.groups,
            grid_size=args.grid_size, spline_order=args.spline_order,
            degree=args.degree, conv_dropout=args.dropout_conv, **common_cls)
    if args.model == "EfficientNetKAN":
        fn = (efficientnet_kan_small if args.arch and "small" in args.arch
              else efficientnet_kan)
        return fn(
            arch=args.arch or "b0", num_classes=num_classes,
            in_channels=input_shape[-1], conv_type=args.conv_type,
            kan_conv=args.kan_conv,
            replace_depthwise=args.replace_depthwise,
            classifier_type=args.classifier_type,
            kan_classifier=args.kan_classifier, norm_layer=norm,
            kan_norm_layer=kan_norm, affine=args.norm_affine,
            stochastic_depth_prob=args.stochastic_depth_prob,
            l1_decay=args.l1_decay, grid_size=args.grid_size,
            spline_order=args.spline_order,
            conv_dropout=args.dropout_conv, **common_cls)
    if args.model == "EfficientNetV2KAN":
        if args.arch not in ("s", "m", "l", "tiny", "kan_tiny"):
            raise SystemExit(
                f"Unsupported EfficientNetV2 arch: {args.arch}")
        fn = (efficientnetv2_kan_small if args.arch in ("tiny", "kan_tiny")
              else efficientnetv2_kan)
        return fn(
            arch=args.arch, num_classes=num_classes,
            in_channels=input_shape[-1], conv_type=args.conv_type,
            kan_conv=args.kan_conv,
            replace_depthwise=args.replace_depthwise,
            classifier_type=args.classifier_type,
            kan_classifier=args.kan_classifier, norm_layer=norm,
            kan_norm_layer=kan_norm, affine=args.norm_affine,
            stochastic_depth_prob=args.stochastic_depth_prob,
            l1_decay=args.l1_decay, grid_size=args.grid_size,
            spline_order=args.spline_order,
            conv_dropout=args.dropout_conv, **common_cls)
    if args.model == "PipelinedKanMLP":
        from convkan_tpu.parallel.pipeline import PipelinedKanMLP

        h, w, c = input_shape
        family = args.kan_classifier or "ChebyKAN"
        return PipelinedKanMLP(
            family=family, in_dim=h * w * c, hidden=args.pipe_hidden,
            n_stages=args.pipe_stages, out_dim=num_classes,
            cfg={k: v for k, v in
                 {"degree": args.classifier_degree,
                  "grid_size": args.classifier_grid_size,
                  "spline_order": args.classifier_spline_order}.items()
                 if v is not None},
            mesh=pipe_mesh, n_microbatches=args.pipe_microbatches)
    if args.model == "MoEKanMLP":
        from convkan_tpu.parallel.moe import MoEKanMLP

        h, w, c = input_shape
        family = args.kan_classifier or "ChebyKAN"
        return MoEKanMLP(
            family=family, in_dim=h * w * c, hidden=args.moe_hidden,
            num_classes=num_classes, n_experts=args.moe_experts,
            n_blocks=args.moe_blocks,
            capacity_factor=args.moe_capacity_factor,
            aux_weight=args.moe_aux_weight,
            cfg={k: v for k, v in
                 {"degree": args.classifier_degree,
                  "grid_size": args.classifier_grid_size,
                  "spline_order": args.classifier_spline_order}.items()
                 if v is not None},
            mesh=expert_mesh)
    raise SystemExit(f"Model {args.model!r} not recognized")


def main(argv=None):
    args = build_parser().parse_args(argv)

    results_path = os.path.join(".", args.results_dir)
    model_save_path = os.path.join(results_path, args.dataset, "models")
    log_save_path = os.path.join(results_path, args.dataset, "logs")
    for d in (results_path, model_save_path, log_save_path):
        os.makedirs(d, exist_ok=True)

    log_file = os.path.join(
        log_save_path,
        f"{args.model}_{args.classifier_type}_{args.dataset}_seed"
        f"{args.seed}_train.log")
    logging.basicConfig(
        level=logging.INFO,
        format="%(asctime)s - %(message)s", datefmt="%Y-%m-%d %H:%M:%S",
        handlers=[logging.FileHandler(log_file),
                  logging.StreamHandler(sys.stdout)])
    logger = logging.getLogger("train")
    logger.info("--- Start Training Script ---")
    for k, v in vars(args).items():
        logger.info("  %s: %s", k, v)

    import jax

    # persistent compile cache (remote-TPU compiles run minutes under
    # contention; re-runs on this host reuse the artifacts)
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_COMPILATION_CACHE_DIR",
                                     "/tmp/convkan_jax_tpu_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from convkan_tpu.parallel.mesh import make_mesh
    from convkan_tpu.train.data import get_datasets
    from convkan_tpu.train.loop import train_model_generic, write_results_csv

    if args.bf16_island:
        # process-wide default BEFORE build_model so every layer built
        # below picks it up (explicit ctor kwargs would still win)
        from convkan_tpu.nn.kan_conv import set_perf_defaults

        set_perf_defaults(island_bf16=True)

    if args.debug_nans:
        from convkan_tpu.train.profiling import debug_nans

        debug_nans(True)

    train_ds, test_ds, classes = get_datasets(
        args.dataset, args.data_path, synthetic=args.synthetic_data,
        synthetic_size=args.synthetic_size,
        imagenet_preprocessing=args.imagenet_preprocessing)
    num_classes = len(classes)
    if args.imagenet_preprocessing:
        input_shape = (224, 224, 3)
    else:
        h, w, c = train_ds.images.shape[1:]
        input_shape = (h, w, c)

    n_dev = len(jax.devices())
    expert_mesh = None
    if args.mesh_expert > 1:
        if args.model != "MoEKanMLP":
            raise SystemExit(
                "--mesh_expert shards MoE expert stacks — it applies to "
                "--model MoEKanMLP only")
        if args.moe_experts % args.mesh_expert:
            raise SystemExit(
                f"--mesh_expert {args.mesh_expert} must divide "
                f"--moe_experts {args.moe_experts}")
        if (args.mesh_spatial > 1 or args.zero1 or args.fsdp
                or args.mesh_model > 1):
            raise SystemExit(
                "--mesh_expert is exclusive with --mesh_spatial/--zero1/"
                "--fsdp/--mesh_model")
        from convkan_tpu.parallel.moe import make_expert_mesh

        data = args.mesh_data or max(n_dev // args.mesh_expert, 1)
        if data * args.mesh_expert > n_dev:
            data_src = (str(args.mesh_data) if args.mesh_data
                        else f"(derived: {data})")
            raise SystemExit(
                f"--mesh_data {data_src} x "
                f"--mesh_expert {args.mesh_expert} needs "
                f"{data * args.mesh_expert} devices; have {n_dev}")
        if data * args.mesh_expert < n_dev:
            logger.warning(
                "mesh uses %d of %d devices (%d idle) — pick --mesh_data/"
                "--mesh_expert that multiply to the device count to use "
                "all of them", data * args.mesh_expert, n_dev,
                n_dev - data * args.mesh_expert)
        expert_mesh = make_expert_mesh(
            expert=args.mesh_expert, data=data,
            devices=jax.devices()[:data * args.mesh_expert])

    pipe_mesh = None
    if args.mesh_pipe > 1:
        if args.model not in ("PipelinedKanMLP", "VGGKAN"):
            raise SystemExit(
                "--mesh_pipe pipelines PipelinedKanMLP (stage-stacked "
                "trunk) or VGGKAN (heterogeneous FLOP-balanced stages)")
        if (args.model == "PipelinedKanMLP"
                and args.pipe_stages % args.mesh_pipe):
            raise SystemExit(
                f"--mesh_pipe {args.mesh_pipe} must divide "
                f"--pipe_stages {args.pipe_stages}")
        if (args.mesh_spatial > 1 or args.zero1 or args.fsdp
                or args.mesh_expert > 1 or args.mesh_model > 1):
            raise SystemExit(
                "--mesh_pipe is exclusive with --mesh_spatial/--zero1/"
                "--fsdp/--mesh_expert/--mesh_model")
        from convkan_tpu.parallel.pipeline import make_pipeline_mesh

        data = args.mesh_data or max(n_dev // args.mesh_pipe, 1)
        if data * args.mesh_pipe > n_dev:
            data_src = (str(args.mesh_data) if args.mesh_data
                        else f"(derived: {data})")
            raise SystemExit(
                f"--mesh_data {data_src} x --mesh_pipe {args.mesh_pipe} "
                f"needs {data * args.mesh_pipe} devices; have {n_dev}")
        if data * args.mesh_pipe < n_dev:
            logger.warning(
                "mesh uses %d of %d devices (%d idle) — pick --mesh_data/"
                "--mesh_pipe that multiply to the device count to use "
                "all of them", data * args.mesh_pipe, n_dev,
                n_dev - data * args.mesh_pipe)
        m = args.pipe_microbatches or args.mesh_pipe
        if (args.batch_size // data) % m:
            raise SystemExit(
                f"--batch_size {args.batch_size} gives per-data-shard "
                f"batches of {args.batch_size // data}, not divisible by "
                f"the {m} GPipe microbatches — adjust --batch_size/"
                "--pipe_microbatches")
        pipe_mesh = make_pipeline_mesh(
            pipe=args.mesh_pipe, data=data,
            devices=jax.devices()[:data * args.mesh_pipe])

    model = build_model(args, input_shape, num_classes,
                        expert_mesh=expert_mesh, pipe_mesh=pipe_mesh)
    model_name = getattr(model, "model_name", type(model).__name__)
    logger.info("Instantiated model '%s'", model_name)

    mesh = None
    prev_spatial = None
    spatial = max(args.mesh_spatial, 1)
    if expert_mesh is not None:
        mesh = expert_mesh
        logger.info("mesh: %s", mesh)
    elif pipe_mesh is not None:
        mesh = pipe_mesh
        logger.info("mesh: %s", mesh)
    elif spatial > 1 or args.mesh_model > 1 or (args.mesh_data or n_dev) > 1:
        tp = max(args.mesh_model, 1)
        data = args.mesh_data or n_dev // (spatial * tp)
        if data < 1 or data * spatial * tp > n_dev:
            raise SystemExit(
                f"--mesh_data {args.mesh_data} x --mesh_model {tp} x "
                f"--mesh_spatial {spatial} needs "
                f"{max(data, 1) * spatial * tp} devices; have {n_dev}")
        if data * spatial * tp < n_dev:
            logger.warning(
                "mesh uses %d of %d devices (%d idle) — pick --mesh_data/"
                "--mesh_model/--mesh_spatial that multiply to the device "
                "count to use all of them", data * spatial * tp, n_dev,
                n_dev - data * spatial * tp)
        if spatial > 1 and input_shape[0] % spatial:
            raise SystemExit(
                f"--mesh_spatial {spatial} must divide the image height "
                f"{input_shape[0]} ({args.dataset}) — the input batches "
                "are H-sharded over the 'spatial' axis")
        mesh = make_mesh(data=data, model=tp, spatial=spatial,
                         devices=jax.devices()[:data * spatial * tp])
        logger.info("mesh: %s", mesh)
        if spatial > 1:
            # every conv built by the factories halo-shards its H plane
            # over 'spatial'; data_sharding H-shards the input batches.
            # Restored in the finally below so in-process callers (tests,
            # notebooks) don't leak a stale mesh into later builds.
            from convkan_tpu.parallel.halo import set_spatial_defaults

            prev_spatial = set_spatial_defaults(mesh, "spatial")
    if args.zero1 or args.fsdp:
        data_axis = (dict(zip(mesh.axis_names, mesh.devices.shape))
                     .get("data", 1) if mesh is not None else 1)
        if data_axis <= 1:
            flag = "--fsdp" if args.fsdp else "--zero1"
            what = ("params + optimizer state" if args.fsdp
                    else "the optimizer state")
            raise SystemExit(
                f"{flag} shards {what} over the 'data' mesh axis, which "
                "needs more than one data-parallel device — run with "
                "--mesh_data N (N > 1)")
    import contextlib

    profile_ctx = contextlib.nullcontext()
    if args.profile_dir:
        from convkan_tpu.train.profiling import trace

        profile_ctx = trace(args.profile_dir)
        logger.info("profiling to %s (Perfetto/XProf)", args.profile_dir)
    try:
        with profile_ctx:
            return _main_with_mesh(args, model, model_name, mesh,
                                   input_shape, num_classes, train_ds,
                                   test_ds, model_save_path, results_path,
                                   classes)
    finally:
        if prev_spatial is not None:
            from convkan_tpu.parallel.halo import set_spatial_defaults

            set_spatial_defaults(*prev_spatial)


def _main_with_mesh(args, model, model_name, mesh, input_shape, num_classes,
                    train_ds, test_ds, model_save_path, results_path,
                    classes):
    """The post-mesh half of main(): eval_only or the full train + report
    path.  Split out so main() can restore the process-wide spatial
    defaults in a finally regardless of how this returns."""
    import jax

    from convkan_tpu.train.loop import train_model_generic, write_results_csv

    logger = logging.getLogger("train")

    if args.eval_only:
        import jax.numpy as jnp

        import optax

        from convkan_tpu.train import checkpoint as ckpt_lib
        from convkan_tpu.train.loop import (batch_put_sharding, evaluate,
                                            make_eval_step, make_infer_timer,
                                            make_timer_batch)
        from convkan_tpu.train.state import TrainState

        if not ckpt_lib.checkpoint_exists(model_save_path, model_name,
                                          args.eval_kind):
            raise SystemExit(
                f"--eval_only: no '{args.eval_kind}' checkpoint for "
                f"{model_name} under {model_save_path} — train first, or "
                f"import one with `python -m convkan_tpu.migrate`")
        # raw-payload restore (no optimizer template): eval never touches
        # opt_state, so checkpoints trained with any --clip_grad_norm /
        # --scheduler / --ema_decay combination evaluate without the flags
        # being re-specified.  EMA-trained checkpoints are evaluated on the
        # EMA weights — the same weights training's best-selection used and
        # serve.py serves.
        payload = ckpt_lib.restore_checkpoint(model_save_path, model_name,
                                              args.eval_kind)
        ema = payload.get("ema_params") or None
        state = TrainState(
            step=jnp.asarray(payload["step"]), params=payload["params"],
            opt_state=(), batch_stats=payload.get("batch_stats") or {},
            tx=optax.identity(), ema_params=ema)
        extra = payload.get("extra", {})
        if ema is not None:
            logger.info("eval_only: checkpoint carries EMA weights — "
                        "evaluating the EMA (what serving uses)")
        imagenet = getattr(test_ds, "imagenet", False)
        eval_step = make_eval_step(model, args.dataset, num_classes,
                                   mesh=mesh, imagenet=imagenet,
                                   use_ema=ema is not None)
        batch_sharding = batch_put_sharding(mesh)
        loss, acc, prec, rec, f1 = evaluate(
            eval_step, state, test_ds, args.batch_size, num_classes,
            batch_sharding=batch_sharding)
        timer = make_infer_timer(model, args.dataset, imagenet=imagenet)
        inf_ms = timer(state, make_timer_batch(test_ds, args.batch_size,
                                               batch_sharding))
        logger.info(
            "eval[%s] %s: test_loss %.4f acc %.4f P %.4f R %.4f F1 %.4f "
            "(%.3f ms/img, trained %d epochs)",
            args.eval_kind, model_name, loss, acc, prec, rec, f1, inf_ms,
            int(extra.get("epoch", 0)))
        return {"test_loss": loss, "accuracy": acc, "precision": prec,
                "recall": rec, "f1": f1, "inference_ms": inf_ms}

    from convkan_tpu.train.loop import PREEMPTED_EXIT_CODE, TrainingPreempted

    try:
        state, history = train_model_generic(
            model, train_ds, test_ds, args.dataset, num_classes,
            batch_size=args.batch_size, learning_rate=args.lr,
            weight_decay=args.weight_decay, gamma=args.gamma,
            epochs=args.epoch,
            # NOTE: --l1_decay reaches the loss through the per-layer L1
            # wrappers the factories build (utils/regularization.L1), not as
            # a global penalty — layer-scoped, matching the reference
            # interface.
            seed=args.seed, mesh=mesh,
            path=model_save_path, resume=args.resume, model_name=model_name,
            patience=args.patience, grad_accum=args.grad_accum,
            label_smoothing=args.label_smoothing, ema_decay=args.ema_decay,
            scheduler=args.scheduler, warmup_epochs=args.warmup_epochs,
            clip_grad_norm=args.clip_grad_norm, zero1=args.zero1,
            fsdp=args.fsdp,
            expert_parallel=args.mesh_expert > 1,
            pipeline_parallel=args.mesh_pipe > 1,
            tensor_parallel=args.mesh_model > 1)
    except TrainingPreempted as e:
        # SIGTERM arrived (cloud preemption notice): a resumable 'last'
        # checkpoint was saved.  EX_TEMPFAIL tells the supervisor
        # (python -m convkan_tpu.train.supervise) to relaunch with --resume.
        logger.info("preempted at epoch %d: %s", e.epoch, e)
        raise SystemExit(PREEMPTED_EXIT_CODE)

    # per-epoch trajectory (beyond the reference's one-row summary)
    write_results_csv(os.path.join(results_path, "training_history.csv"),
                      model_name, history)
    try:
        import jax as _jax
        from convkan_tpu.report import save_run_record
        from convkan_tpu.train.plots import (final_plots, predict_probs,
                                             results_table, roc_all_models)
        n_params = sum(p.size for p in
                       _jax.tree_util.tree_leaves(state.params))
        probs, targets = predict_probs(
            model, state, test_ds, args.dataset, args.batch_size,
            imagenet=getattr(test_ds, "imagenet", False))
        # run record: feeds `python -m convkan_tpu.report` (the reference's
        # multi-model final_plots/ROC comparison, evaluations.py:263-400)
        save_run_record(results_path, model_name, history, n_params,
                        probs, targets, classes, args.dataset)
        final_plots({model_name: history}, {model_name: n_params},
                    out_dir=results_path)
        # reference-schema summary table (evaluations.py:318-338): CSV +
        # styled HTML with per-column bold-max
        results_table({model_name: history}, {model_name: n_params},
                      out_dir=results_path, use_time=True)
        # all-classes / all-models ROC figure (evaluations.py:342-400)
        roc_all_models({model_name: (probs, targets)}, list(classes),
                       os.path.join(results_path, "roc_curves.png"))
    except Exception as e:  # plotting is best-effort (headless parity)
        logger.warning("plotting skipped: %s", e)
    logger.info("Training process completed for model: %s", model_name)


if __name__ == "__main__":
    main()
