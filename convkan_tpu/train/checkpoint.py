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


_ASYNC_CKPTRS: dict = {}  # target path -> AsyncCheckpointer


def _async_checkpointer(path: str):
    # one checkpointer per target path: the best and last saves of the
    # same epoch then overlap each other AND the next epoch's compute
    # (a single global checkpointer would serialize them — the second
    # save would block the host on the first write)
    if path not in _ASYNC_CKPTRS:
        _ASYNC_CKPTRS[path] = ocp.AsyncCheckpointer(
            ocp.PyTreeCheckpointHandler())
    return _ASYNC_CKPTRS[path]


def wait_for_async_saves():
    """Block until every pending async save has committed to disk.  Call
    before restoring a checkpoint that may still be in flight and at the
    end of training."""
    for ckptr in _ASYNC_CKPTRS.values():
        ckptr.wait_until_finished()


def save_checkpoint(root: str, name: str, kind: str, state,
                    extra: Optional[dict] = None,
                    async_save: bool = False):
    """kind: 'best' | 'last'.  Saves params, opt_state, batch_stats, step,
    and optional metadata (epoch, metric history).

    async_save=True hands the (host-copied) payload to an Orbax
    AsyncCheckpointer: the device stays busy with the next epoch while
    the write runs in the background.  The payload is device_get'd
    either way, so the saved values are a consistent snapshot regardless
    of later state updates.  Pair with wait_for_async_saves()."""
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
    if async_save:
        ckptr = _async_checkpointer(path)
        # drain only THIS path's previous write (same directory cannot
        # have two in-flight saves); other paths stay overlapped
        ckptr.wait_until_finished()
        ckptr.save(path, payload, force=True)
        return path
    ckptr = ocp.PyTreeCheckpointer()
    ckptr.save(path, payload, force=True)
    return path


def restore_checkpoint(root: str, name: str, kind: str, state=None):
    """Restore a checkpoint.  With a template `state`, returns an updated
    TrainState (full resume); otherwise returns the raw payload dict."""
    path = _path(root, name, kind)
    wait_for_async_saves()  # the target may still be in flight
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
    wait_for_async_saves()  # an in-flight save commits via final rename
    return os.path.exists(_path(root, name, kind))
