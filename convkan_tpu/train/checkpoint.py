"""Orbax checkpointing with the reference's `{name}_best` / `{name}_last`
naming contract (evaluations.py:225,244), plus what the reference lacks:
optimizer state and full mid-training resume (SURVEY.md §5).
"""

from __future__ import annotations

import os
from typing import Any, Optional

import flax.serialization as fser
import jax
import numpy as np
import orbax.checkpoint as ocp


def _path(root: str, name: str, kind: str) -> str:
    return os.path.abspath(os.path.join(root, f"{name}_{kind}"))


def save_checkpoint(root: str, name: str, kind: str, state,
                    extra: Optional[dict] = None):
    """kind: 'best' | 'last'.  Saves params, opt_state, batch_stats, step,
    and optional metadata (epoch, metric history)."""
    os.makedirs(root, exist_ok=True)
    path = _path(root, name, kind)
    payload = {
        "step": np.asarray(state.step),
        "params": jax.device_get(state.params),
        # optax states are NamedTuple pytrees; serialize to plain dicts and
        # restore against the live template (see restore_checkpoint)
        "opt_state": fser.to_state_dict(jax.device_get(state.opt_state)),
        "batch_stats": jax.device_get(state.batch_stats),
    }
    if extra:
        payload["extra"] = extra
    ckptr = ocp.PyTreeCheckpointer()
    ckptr.save(path, payload, force=True)
    return path


def restore_checkpoint(root: str, name: str, kind: str, state=None):
    """Restore a checkpoint.  With a template `state`, returns an updated
    TrainState (full resume); otherwise returns the raw payload dict."""
    path = _path(root, name, kind)
    ckptr = ocp.PyTreeCheckpointer()
    payload = ckptr.restore(path)
    if state is None:
        return payload
    opt_state = fser.from_state_dict(state.opt_state, payload["opt_state"])
    return state.replace(
        step=jax.numpy.asarray(payload["step"]),
        params=payload["params"],
        opt_state=opt_state,
        batch_stats=payload["batch_stats"],
    ), payload.get("extra", {})


def checkpoint_exists(root: str, name: str, kind: str) -> bool:
    return os.path.exists(_path(root, name, kind))
