"""save_pretrained / from_pretrained — the local-first equivalent of the
reference's PyTorchModelHubMixin (mixed into every model class, e.g.
kan_vgg.py:190).

Stores a model's constructor config (JSON) next to an Orbax param
checkpoint so a model can be rebuilt and reloaded with two calls:

    save_pretrained(model, variables, "ckpt/my_model")
    model, variables = from_pretrained("ckpt/my_model")

Works for every model in convkan_tpu.models (builders are resolved by
name).  No network IO — push/pull to a remote hub reduces to syncing the
directory.
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Any, Tuple

import jax
import orbax.checkpoint as ocp


def _config_of(model) -> dict:
    cfg = {}
    for f in dataclasses.fields(model):
        if f.name in ("parent", "name"):
            continue
        v = getattr(model, f.name)
        if isinstance(v, tuple) and v and dataclasses.is_dataclass(v[0]):
            v = [dataclasses.asdict(c) for c in v]
        else:
            try:
                json.dumps(v)
            except TypeError:
                v = repr(v)
        cfg[f.name] = v
    return cfg


def save_pretrained(model, variables, path: str):
    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, "config.json"), "w") as f:
        json.dump({"model_class": type(model).__name__,
                   "config": _config_of(model)}, f, indent=2, default=repr)
    ckptr = ocp.PyTreeCheckpointer()
    ckptr.save(os.path.abspath(os.path.join(path, "variables")),
               jax.device_get(variables), force=True)
    return path


def push_to_hub(model, variables, repo_id: str, *, private: bool = False,
                token: str = None, commit_message: str = "Upload convkan_tpu model"):
    """PyTorchModelHubMixin.push_to_hub equivalent (kan_vgg.py:190):
    save_pretrained into a temp dir and upload it to the Hugging Face Hub.
    Requires network egress + a write token."""
    import tempfile

    from huggingface_hub import HfApi

    api = HfApi(token=token)
    api.create_repo(repo_id, private=private, exist_ok=True)
    with tempfile.TemporaryDirectory() as td:
        save_pretrained(model, variables, td)
        return api.upload_folder(repo_id=repo_id, folder_path=td,
                                 commit_message=commit_message)


def from_pretrained(path: str, *, revision: str = None,
                    token: str = None) -> Tuple[Any, Any]:
    """Rebuild the model from config.json and restore its variables.

    `path` may be a local save_pretrained directory OR a Hugging Face Hub
    repo id (PyTorchModelHubMixin.from_pretrained parity) — hub repos are
    snapshot-downloaded into the local cache first."""
    from .. import models as model_zoo

    if not os.path.isdir(path):
        from huggingface_hub import snapshot_download

        path = snapshot_download(repo_id=path, revision=revision,
                                 token=token)

    with open(os.path.join(path, "config.json")) as f:
        meta = json.load(f)
    cls = getattr(model_zoo, meta["model_class"])
    cfg = dict(meta["config"])
    # JSON round-trip turns tuples into lists and norm classes into reprs;
    # re-resolve the common cases
    for k in ("grid_range", "expected_feature_shape", "kernel_size"):
        if k in cfg and isinstance(cfg[k], list):
            cfg[k] = tuple(cfg[k])
    for k in ("norm_layer", "kan_norm_layer"):
        if k in cfg and isinstance(cfg[k], str) and "class" in cfg[k]:
            name = cfg[k].split(".")[-1].rstrip("'>")
            from ..utils.norms import NORM_LAYERS
            for norm_name, norm_cls in NORM_LAYERS.items():
                if norm_cls is not None and norm_cls.__name__ == name:
                    cfg[k] = norm_cls
                    break
            else:
                # fail at LOAD time with the real cause — leaving the
                # repr string gives a baffling KeyError deep inside the
                # first forward pass
                raise ValueError(
                    f"config.json {k}={cfg[k]!r} does not name a "
                    f"registered norm class (have "
                    f"{sorted(c.__name__ for c in set(NORM_LAYERS.values()) if c)})")
    if "inverted_residual_setting" in cfg:
        from ..models.efficientnetv2 import MBConfig
        cfg["inverted_residual_setting"] = tuple(
            MBConfig(**c) if isinstance(c, dict) else c
            for c in cfg["inverted_residual_setting"])
    model = cls(**cfg)
    ckptr = ocp.PyTreeCheckpointer()
    variables = ckptr.restore(os.path.abspath(os.path.join(path, "variables")))
    return model, variables
