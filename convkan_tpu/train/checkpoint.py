"""Orbax checkpointing with the reference's `{name}_best` / `{name}_last`
naming contract (evaluations.py:225,244), plus what the reference lacks:
optimizer state and full mid-training resume (SURVEY.md §5).

Durability contract: `{name}_{kind}` is a symlink that always resolves to
a fully-committed checkpoint.  Each save writes a fresh versioned
directory (`{name}_{kind}.v<N>` — Orbax itself commits atomically via a
tmp-dir rename) and then swaps the symlink in one atomic os.rename; the
displaced version is deleted only afterwards.  A crash or preemption at
ANY point during a save therefore leaves the previous checkpoint
restorable — the pre-round-3 scheme (`force=True` onto the live path)
deleted the old checkpoint for the whole serialize+write window, which is
exactly when an OOM-kill or preemption strikes.
"""

from __future__ import annotations

import glob
import os
import shutil
from typing import Any, Optional

import flax.serialization as fser
import jax
import numpy as np
import orbax.checkpoint as ocp


# --------------------------------------------------------- multi-process
# Under `jax.distributed` training, N processes share the run directory.
# The commit protocol must not race: exactly one process (0) writes and
# swaps the symlink; every process synchronizes on the commit so a
# subsequent restore on ANY process sees the committed version.  Sharded
# arrays (FSDP/ZeRO over a multi-process mesh) are allgathered to host
# numpy first — every process holds only its addressable shards, so a
# bare device_get on process 0 would crash (or silently save a shard).

def _is_multiprocess() -> bool:
    return jax.process_count() > 1


def _barrier(tag: str):
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices(f"convkan-ckpt-{tag}")


def _to_host(tree):
    """Host snapshot for the SAVE payload.

    Single-process: device_get (the async save path needs a host copy so
    later state mutations cannot leak into an in-flight write).

    Multi-process: leave jax.Arrays IN PLACE — Orbax's type handlers save
    sharded arrays natively (each process writes only its addressable
    shards via TensorStore, with its own cross-process sync), so
    FSDP/ZeRO state costs O(local shards) host memory at checkpoint time
    instead of the O(full params+moments)-per-host of the previous
    process_allgather scheme (ADVICE r4 #4).  Multi-process saves are
    synchronous, so no snapshot copy is needed."""
    if not _is_multiprocess():
        return jax.device_get(tree)
    return tree


def _path(root: str, name: str, kind: str) -> str:
    return os.path.abspath(os.path.join(root, f"{name}_{kind}"))


_ASYNC_CKPTRS: dict = {}  # target path -> AsyncCheckpointer (LRU order)
_VERSIONS: dict = {}      # target path -> last version number used
_PENDING: dict = {}       # target path -> committed-version dir to swap in

# Each AsyncCheckpointer owns a persistent background thread (plus
# TensorStore resources).  A long multi-model run — or a test suite where
# every test saves under a fresh tmp dir — would otherwise accumulate one
# live thread pool PER TARGET PATH forever; measured: ~1 OS thread per
# checkpointer, never freed.  That unbounded growth is the prime suspect
# for the intermittent late-suite `Fatal Python error: Aborted` (resource
# exhaustion after ~380 tests).  Cap the cache LRU-style and close
# everything on wait_for_async_saves().
_MAX_CACHED_CKPTRS = 4


def _close_checkpointer(path: str):
    """Drain + commit + release one cached AsyncCheckpointer."""
    ckptr = _ASYNC_CKPTRS.pop(path, None)
    if ckptr is None:
        return
    ckptr.wait_until_finished()
    _commit_pending(path)
    ckptr.close()


def _async_checkpointer(path: str):
    # one checkpointer per target path: the best and last saves of the
    # same epoch then overlap each other AND the next epoch's compute
    # (a single global checkpointer would serialize them — the second
    # save would block the host on the first write)
    if path in _ASYNC_CKPTRS:
        _ASYNC_CKPTRS[path] = _ASYNC_CKPTRS.pop(path)  # LRU bump
    else:
        while len(_ASYNC_CKPTRS) >= _MAX_CACHED_CKPTRS:
            _close_checkpointer(next(iter(_ASYNC_CKPTRS)))
        _ASYNC_CKPTRS[path] = ocp.AsyncCheckpointer(
            ocp.PyTreeCheckpointHandler())
    return _ASYNC_CKPTRS[path]


def _next_version_dir(path: str) -> str:
    n = _VERSIONS.get(path, 0) + 1
    while os.path.exists(f"{path}.v{n}"):  # resumed process: skip leftovers
        n += 1
    _VERSIONS[path] = n
    return f"{path}.v{n}"


def _swap_into_place(path: str, new_dir: str):
    """Atomically repoint `path` (a symlink) at the committed `new_dir`,
    then delete the displaced version.  Pre-round-3 checkpoints where
    `path` is a real directory are moved aside first (the one non-atomic
    legacy-upgrade window is two renames with no data writes between)."""
    old_target = None
    if os.path.islink(path):
        old_target = os.path.join(os.path.dirname(path), os.readlink(path))
    link_tmp = new_dir + ".link"
    if os.path.lexists(link_tmp):
        os.unlink(link_tmp)
    os.symlink(os.path.basename(new_dir), link_tmp)
    if os.path.isdir(path) and not os.path.islink(path):
        legacy = path + ".legacy"
        shutil.rmtree(legacy, ignore_errors=True)
        os.rename(path, legacy)
        os.rename(link_tmp, path)
        shutil.rmtree(legacy, ignore_errors=True)
    else:
        os.rename(link_tmp, path)  # atomically replaces an existing symlink
    if old_target and os.path.abspath(old_target) != os.path.abspath(new_dir):
        shutil.rmtree(old_target, ignore_errors=True)


def _gc_stale_versions(path: str, keep=()):
    """Delete leftover version dirs (and swap-link temps) of `path` that a
    crashed run never swapped in: everything matching `{path}.v*` except
    the live symlink target and `keep`.  Called once this path's async
    writes are drained, so nothing matched can be in flight (each name has
    a single writer — the training process that owns the run directory)."""
    live = None
    if os.path.islink(path):
        live = os.path.abspath(
            os.path.join(os.path.dirname(path), os.readlink(path)))
    keep = {os.path.abspath(k) for k in keep}
    for p in glob.glob(glob.escape(path) + ".v*"):
        ap = os.path.abspath(p)
        if ap == live or ap in keep:
            continue
        if os.path.islink(p) or not os.path.isdir(p):
            os.unlink(p)
        else:
            shutil.rmtree(p, ignore_errors=True)


def _commit_pending(path: str):
    dst = _PENDING.pop(path, None)
    if dst is not None:
        _swap_into_place(path, dst)


def wait_for_async_saves():
    """Block until every pending async save has committed to disk and its
    symlink swap is in place, then RELEASE the checkpointers (each holds a
    live background thread — see _MAX_CACHED_CKPTRS).  Call before
    restoring a checkpoint that may still be in flight and at the end of
    training; a later async save transparently recreates its
    checkpointer."""
    for path in list(_ASYNC_CKPTRS):
        _close_checkpointer(path)
    for path in list(_PENDING):
        _commit_pending(path)


def save_checkpoint(root: str, name: str, kind: str, state,
                    extra: Optional[dict] = None,
                    async_save: bool = False):
    """kind: 'best' | 'last'.  Saves params, opt_state, batch_stats, step,
    and optional metadata (epoch, metric history).

    async_save=True hands the (host-copied) payload to an Orbax
    AsyncCheckpointer: the device stays busy with the next epoch while
    the write runs in the background; the symlink swap happens on the
    next drain (wait_for_async_saves / the next save to this path), so
    the live name never points at an in-flight write.  The payload is
    device_get'd either way, so the saved values are a consistent
    snapshot regardless of later state updates."""
    path = _path(root, name, kind)
    payload = {
        "step": np.asarray(jax.device_get(state.step)),
        "params": _to_host(state.params),
        # optax states are NamedTuple pytrees; serialize to plain dicts and
        # restore against the live template (see restore_checkpoint)
        "opt_state": fser.to_state_dict(_to_host(state.opt_state)),
        "batch_stats": _to_host(state.batch_stats),
    }
    if getattr(state, "ema_params", None) is not None:
        payload["ema_params"] = _to_host(state.ema_params)
    if extra:
        payload["extra"] = extra
    if _is_multiprocess():
        # Process 0 owns the commit bookkeeping (version-dir choice,
        # symlink swap, GC), but the Orbax save itself is COLLECTIVE:
        # PyTreeCheckpointer.save runs its own sync_global_processes
        # barriers and gates the actual writes to the primary host, so
        # every process must call it with the same destination.  The
        # version number is chosen on process 0 and broadcast (the local
        # _VERSIONS caches could disagree after a partial failure).
        # Saves are synchronous in this mode — the async overlap is a
        # single-host optimization and a deferred cross-process symlink
        # swap would need a second barrier inside a background thread.
        from jax.experimental import multihost_utils

        if jax.process_index() == 0:
            os.makedirs(root, exist_ok=True)
            _commit_pending(path)
            dst0 = _next_version_dir(path)
            _gc_stale_versions(path, keep=(dst0,))
            ver = int(dst0.rsplit(".v", 1)[1])
        else:
            ver = 0
        ver = int(multihost_utils.broadcast_one_to_all(np.int32(ver)))
        dst = f"{path}.v{ver}"
        ocp.PyTreeCheckpointer().save(dst, payload)
        if jax.process_index() == 0:
            _swap_into_place(path, dst)
        # every process sees the committed symlink before any of them can
        # issue a restore
        _barrier(f"save-{name}-{kind}")
        return path
    os.makedirs(root, exist_ok=True)
    dst = _next_version_dir(path)
    if async_save:
        ckptr = _async_checkpointer(path)
        # drain only THIS path's previous write (same name cannot have two
        # in-flight saves); other paths stay overlapped
        ckptr.wait_until_finished()
        _commit_pending(path)
        _gc_stale_versions(path, keep=(dst,))
        ckptr.save(dst, payload)
        _PENDING[path] = dst
        return path
    # drain any in-flight async save to this path BEFORE the GC sweep —
    # otherwise _gc_stale_versions would rmtree the pending version dir out
    # from under Orbax and the deferred symlink swap would point at nothing
    if path in _ASYNC_CKPTRS:
        _ASYNC_CKPTRS[path].wait_until_finished()
    _commit_pending(path)
    ckptr = ocp.PyTreeCheckpointer()
    _gc_stale_versions(path, keep=(dst,))
    ckptr.save(dst, payload)
    _swap_into_place(path, dst)
    return path


def _numpy_restore_args(ckptr, path):
    """RestoreArgs forcing sharding-bearing leaves back to host numpy.

    Multi-process saves write sharded jax.Arrays natively (see _to_host);
    their on-disk sharding metadata names the SAVING run's mesh, which a
    restoring process on a different topology (fewer hosts, an elastic
    dp→fsdp relaunch, an offline tool) cannot reconstruct — Orbax's
    default restore then fails.  Restoring those leaves as np.ndarray is
    topology-free; the caller reshards onto the live mesh (train loop
    does a device_put onto the current state shardings).  Leaves saved
    without sharding keep the default behavior.  Returns None (default
    restore) when metadata is unreadable — e.g. pre-round-3 legacy dirs."""
    try:
        meta = ckptr.metadata(path)
        tree = (meta.item_metadata.tree
                if hasattr(meta, "item_metadata") else meta)

        def leaf(m):
            if getattr(m, "sharding", None) is not None:
                return ocp.RestoreArgs(restore_type=np.ndarray)
            return ocp.RestoreArgs()

        return jax.tree_util.tree_map(leaf, tree)
    except Exception:
        return None


def restore_checkpoint(root: str, name: str, kind: str, state=None):
    """Restore a checkpoint.  With a template `state`, returns an updated
    TrainState (full resume); otherwise returns the raw payload dict."""
    path = _path(root, name, kind)
    wait_for_async_saves()  # the target may still be in flight
    ckptr = ocp.PyTreeCheckpointer()
    payload = ckptr.restore(os.path.realpath(path),
                            restore_args=_numpy_restore_args(
                                ckptr, os.path.realpath(path)))
    if state is None:
        return payload
    try:
        opt_state = fser.from_state_dict(state.opt_state,
                                         payload["opt_state"])
    except (ValueError, KeyError) as e:
        raise ValueError(
            f"checkpoint '{name}_{kind}' holds optimizer state that does "
            "not match this run's optimizer — resume must use the same "
            "optimizer configuration as the original run (same "
            "--clip_grad_norm on/off, --scheduler, lr/wd flags). "
            f"Underlying mismatch: {e}") from e
    # ema_params is restored only when the template tracks an EMA
    # (ema_decay > 0 this run).  Resuming an EMA-trained checkpoint with
    # EMA off must NOT carry the stale EMA tree forward — it would stop
    # updating but still be preferred by serving (serve.py build_engine).
    if state.ema_params is not None:
        # enabling EMA on resume from a non-EMA checkpoint seeds the EMA
        # from the RESTORED params (the template's ema_params is a copy of
        # fresh random init — decay 0.999 would keep it mostly-random for
        # hundreds of steps, corrupting eval/best-selection/serving)
        ema = payload.get("ema_params", payload["params"])
    else:
        ema = None
    return state.replace(
        step=jax.numpy.asarray(payload["step"]),
        params=payload["params"],
        opt_state=opt_state,
        batch_stats=payload["batch_stats"],
        ema_params=ema,
    ), payload.get("extra", {})


def checkpoint_exists(root: str, name: str, kind: str) -> bool:
    wait_for_async_saves()  # an in-flight save commits via final rename
    return os.path.exists(_path(root, name, kind))
