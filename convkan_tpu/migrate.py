"""Checkpoint migration CLI: reference PyTorch <-> convkan_tpu Orbax.

Makes the `torch_compat` / `torch_export` interop usable from the shell,
with the same model-flag vocabulary as train.py:

  # reference -> TPU: continue a torch run on TPU hardware
  python -m convkan_tpu.migrate import --src vgg_best.pt \\
      --model VGGKAN --arch VGG16_kansmall --dataset CIFAR10 \\
      --results_dir runs
  python train.py --resume --model VGGKAN --arch VGG16_kansmall ...

  # TPU -> reference: hand TPU-trained weights back to torch users
  python -m convkan_tpu.migrate export --src runs/CIFAR10/models \\
      --dest vgg_tpu.pt --model VGGKAN --arch VGG16_kansmall ...

`import` accepts a torch state_dict file (.pt/.pth via torch.load, or an
.npz of arrays) — including the reference's whole-module pickles
(torch.save(model), evaluations.py:225) when --reference_path points at
the reference source tree (unpickling needs the class code,
generic_train.py:37).  The result is a standard Orbax checkpoint
(step 0, fresh optimizer state) under
``<results_dir>/<dataset>/models/<model_name>_<kind>`` that
``train.py --resume`` continues from.

`export` restores an Orbax checkpoint and writes a reference-layout
state_dict (.pt when the destination ends in .pt/.pth, .npz otherwise)
that ``load_state_dict(strict=True)`` accepts on the matching reference
class.
"""

from __future__ import annotations

import os
import sys

import numpy as np

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_train_module():
    """train.py holds the reference-parity flag vocabulary and model
    dispatcher; import it from the repo root regardless of cwd."""
    try:
        import train
        if hasattr(train, "build_parser"):
            return train
    except ImportError:
        pass
    import importlib.util

    path = os.path.join(_REPO_ROOT, "train.py")
    spec = importlib.util.spec_from_file_location("convkan_train_cli", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _dataset_input_shape(args):
    # train.py input-shape contract (reference train.py:136-146)
    if args.imagenet_preprocessing:
        return (224, 224, 3)
    if args.dataset == "MNIST":
        return (28, 28, 1)
    return (32, 32, 3)


def _interop_fns(model_key: str):
    from .utils import torch_compat as tc
    from .utils import torch_export as te

    table = {
        "VGGKAN": (tc.convert_vggkan, te.export_vggkan_state_dict),
        "AlexNetKAN": (tc.convert_alexnet, te.export_alexnet_state_dict),
        "FlexibleAlexNet": (tc.convert_alexnet, te.export_alexnet_state_dict),
        "MobileNetV1KAN": (tc.convert_mobilenet_v1,
                           te.export_mobilenet_v1_state_dict),
        "MobileNetV2KAN": (tc.convert_mobilenet_v2,
                           te.export_mobilenet_v2_state_dict),
        "MobileNetV3KAN": (tc.convert_mobilenet_v3,
                           te.export_mobilenet_v3_state_dict),
        "EfficientNetV2KAN": (tc.convert_efficientnetv2,
                              te.export_efficientnetv2_state_dict),
    }
    if model_key not in table:
        msg = f"no reference interop for {model_key!r}; " \
              f"supported: {sorted(table)}"
        if model_key == "EfficientNetKAN":
            msg += (" (the reference's EfficientNet V1 kanconv path "
                    "crashes at construction — kan_efficientnet.py:155 "
                    "in_channels vs in_planes, see PARITY.md — so no "
                    "reference checkpoints of it can exist)")
        raise SystemExit(msg)
    return table[model_key]


def _load_source_state_dict(src: str, reference_path: str = None):
    if src.endswith(".npz"):
        blob = np.load(src)
        return {(k[len("param:"):] if k.startswith("param:") else k): blob[k]
                for k in blob.files if k not in ("x", "y", "grid")}
    import torch

    if reference_path:
        # whole-module pickle: unpickling runs the reference class code.
        # sys.path additions are scoped — the reference tree's top-level
        # train/utils/models modules must not shadow repo imports later.
        tools = os.path.join(_REPO_ROOT, "tools", "goldens")
        sys.path.insert(0, tools)
        sys.path.insert(0, reference_path)
        try:
            import tv_stub  # noqa: F401  (torchvision SqueezeExcitation stub)
            obj = torch.load(src, map_location="cpu", weights_only=False)
        finally:
            sys.path.remove(tools)
            sys.path.remove(reference_path)
    else:
        obj = torch.load(src, map_location="cpu", weights_only=True)
    if hasattr(obj, "state_dict") and callable(obj.state_dict):
        obj = obj.state_dict()
    return {k: np.asarray(v.detach().cpu().numpy()) for k, v in obj.items()}


def main(argv=None):
    train = _load_train_module()
    p = train.build_parser()
    p.description = "Checkpoint migration: reference torch <-> Orbax."
    p.add_argument("command", choices=["import", "export"])
    p.add_argument("--src", required=True,
                   help="import: torch .pt/.pth or .npz state_dict file; "
                        "export: Orbax checkpoint root directory "
                        "(e.g. <results_dir>/<dataset>/models)")
    p.add_argument("--dest", default=None,
                   help="import: checkpoint root (default "
                        "<results_dir>/<dataset>/models); export: output "
                        "file (.pt/.pth or .npz; default "
                        "<model_name>_<kind>.pt)")
    p.add_argument("--kind", default="last", choices=["best", "last"],
                   help="checkpoint kind in the {name}_{kind} contract")
    p.add_argument("--ckpt_name", default=None,
                   help="checkpoint name (default: the model's "
                        "auto-derived model_name, as train.py uses)")
    p.add_argument("--reference_path", default=None,
                   help="path to the reference source tree; enables "
                        "importing whole-module pickles (torch.save(model))")
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from .train.checkpoint import restore_checkpoint, save_checkpoint
    from .train.state import create_train_state

    input_shape = _dataset_input_shape(args)
    num_classes = 100 if args.dataset == "CIFAR100" else 10
    model = train.build_model(args, input_shape, num_classes)
    name = args.ckpt_name or getattr(model, "model_name",
                                     type(model).__name__)
    convert_fn, export_fn = _interop_fns(args.model)

    if args.command == "import":
        sd = _load_source_state_dict(args.src, args.reference_path)
        state = create_train_state(
            model, jax.random.PRNGKey(args.seed),
            jnp.zeros((1,) + input_shape, jnp.float32),
            learning_rate=args.lr, weight_decay=args.weight_decay,
            gamma=args.gamma)
        variables = {"params": state.params}
        if state.batch_stats:
            variables["batch_stats"] = state.batch_stats
        migrated = convert_fn(sd, model, variables)
        state = state.replace(
            params=migrated["params"],
            batch_stats=migrated.get("batch_stats", state.batch_stats))
        root = args.dest or os.path.join(args.results_dir, args.dataset,
                                         "models")
        path = save_checkpoint(root, name, args.kind, state,
                               extra={"migrated_from":
                                      os.path.abspath(args.src)})
        print(f"imported {args.src} -> {path}")
        return path

    # export
    payload = restore_checkpoint(args.src, name, args.kind)
    variables = {"params": payload["params"]}
    if payload.get("batch_stats"):
        variables["batch_stats"] = payload["batch_stats"]
    sd = export_fn(model, variables)
    dest = args.dest or f"{name}_{args.kind}.pt"
    if dest.endswith(".npz"):
        np.savez(dest, **sd)
    else:
        import torch

        torch.save({k: torch.as_tensor(np.array(v)) for k, v in sd.items()},
                   dest)
    print(f"exported {len(sd)} tensors -> {dest}")
    return dest


if __name__ == "__main__":
    main()
