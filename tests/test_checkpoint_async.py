"""Async checkpointing: overlapped Orbax saves commit correctly and
restore drains in-flight writes (train/checkpoint.py)."""

import jax
import jax.numpy as jnp
import numpy as np

from convkan_tpu.train import checkpoint as ckpt_lib
from convkan_tpu.train.state import create_train_state


def _tiny_state():
    import flax.linen as nn

    class Tiny(nn.Module):
        @nn.compact
        def __call__(self, x, train: bool = True):
            return nn.Dense(4)(x.reshape(x.shape[0], -1))

    model = Tiny()
    return create_train_state(model, jax.random.PRNGKey(0),
                              jnp.zeros((2, 8), jnp.float32),
                              steps_per_epoch=10)


def test_async_save_then_restore_drains(tmp_path):
    state = _tiny_state()
    root = str(tmp_path)
    ckpt_lib.save_checkpoint(root, "m", "best", state,
                             extra={"epoch": 3}, async_save=True)
    # restore without an explicit wait: restore_checkpoint must drain the
    # in-flight write itself
    restored, extra = ckpt_lib.restore_checkpoint(root, "m", "best", state)
    assert extra["epoch"] == 3
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a),
                                                   np.asarray(b)),
        state.params, restored.params)


def test_sync_save_while_async_pending(tmp_path):
    """A sync save issued while an async save to the SAME path is still
    pending must drain it first — the GC sweep would otherwise rmtree the
    in-flight version dir out from under Orbax and the deferred symlink
    swap would point at a deleted directory."""
    state = _tiny_state()
    root = str(tmp_path)
    for i in range(3):  # repeat: the race window depends on write timing
        ckpt_lib.save_checkpoint(root, "m", "last", state,
                                 extra={"epoch": 2 * i}, async_save=True)
        ckpt_lib.save_checkpoint(root, "m", "last", state,
                                 extra={"epoch": 2 * i + 1},
                                 async_save=False)
        # the sync save is the newest commit and must win
        payload = ckpt_lib.restore_checkpoint(root, "m", "last")
        assert payload["extra"]["epoch"] == 2 * i + 1


def test_resave_never_removes_live_checkpoint(tmp_path):
    """Durability: re-saving {name}_last must never leave a window where
    the name is missing or unrestorable — a preemption mid-save used to
    destroy the only resume point (the old force=True overwrite deleted
    the live directory for the whole serialize+write window)."""
    import os
    import threading

    state = _tiny_state()
    root = str(tmp_path)
    ckpt_lib.save_checkpoint(root, "m", "last", state, extra={"epoch": 0})
    path = os.path.join(root, "m_last")
    assert os.path.exists(path)

    missing = []
    stop = threading.Event()

    def poll():
        while not stop.is_set():
            if not os.path.exists(path):
                missing.append(1)

    t = threading.Thread(target=poll)
    t.start()
    try:
        for epoch in range(1, 6):
            ckpt_lib.save_checkpoint(root, "m", "last", state,
                                     extra={"epoch": epoch})
    finally:
        stop.set()
        t.join()
    assert not missing, "live checkpoint name vanished during a re-save"
    payload = ckpt_lib.restore_checkpoint(root, "m", "last")
    assert payload["extra"]["epoch"] == 5
    # displaced versions are cleaned up: exactly one version dir remains
    vdirs = [d for d in os.listdir(root) if d.startswith("m_last.v")]
    assert len(vdirs) == 1, vdirs


def test_legacy_realdir_checkpoint_upgrades(tmp_path):
    """Pre-round-3 checkpoints where {name}_last is a real directory (not
    a symlink) still restore, and the next save upgrades them in place."""
    import os

    import orbax.checkpoint as ocp

    state = _tiny_state()
    root = str(tmp_path)
    # simulate the legacy layout: orbax dir directly at the live name
    legacy = os.path.join(root, "m_last")
    ocp.PyTreeCheckpointer().save(
        legacy, {"step": np.asarray(state.step),
                 "params": jax.device_get(state.params),
                 "opt_state": {}, "batch_stats": {},
                 "extra": {"epoch": 7}})
    assert os.path.isdir(legacy) and not os.path.islink(legacy)
    payload = ckpt_lib.restore_checkpoint(root, "m", "last")
    assert payload["extra"]["epoch"] == 7
    ckpt_lib.save_checkpoint(root, "m", "last", state, extra={"epoch": 8})
    assert os.path.islink(legacy)
    payload = ckpt_lib.restore_checkpoint(root, "m", "last")
    assert payload["extra"]["epoch"] == 8


def test_async_overwrite_same_path_sequences(tmp_path):
    """Two async saves to the same directory (the per-epoch _last
    pattern): the second must win and the payload must be consistent."""
    state = _tiny_state()
    root = str(tmp_path)
    for epoch in (1, 2):
        ckpt_lib.save_checkpoint(root, "m", "last", state,
                                 extra={"epoch": epoch}, async_save=True)
    ckpt_lib.wait_for_async_saves()
    payload = ckpt_lib.restore_checkpoint(root, "m", "last")
    assert payload["extra"]["epoch"] == 2


def test_async_snapshot_is_consistent(tmp_path):
    """The payload is host-snapshotted at save time: mutating the live
    state afterwards must not leak into the in-flight write."""
    state = _tiny_state()
    root = str(tmp_path)
    before = jax.tree_util.tree_map(np.asarray, state.params)
    ckpt_lib.save_checkpoint(root, "m", "best", state, async_save=True)
    # clobber the live params while the write may still be in flight
    state = state.replace(params=jax.tree_util.tree_map(
        lambda x: x + 100.0, state.params))
    ckpt_lib.wait_for_async_saves()
    payload = ckpt_lib.restore_checkpoint(root, "m", "best")
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a),
                                                   np.asarray(b)),
        before, payload["params"])


def test_async_checkpointers_do_not_accumulate(tmp_path):
    """Resource-leak regression (round-5 suite-abort class): every
    AsyncCheckpointer pins a live background thread until closed, and the
    per-path cache used to grow without bound — one leaked thread pool per
    checkpoint directory ever touched (hundreds across a test suite or a
    many-model sweep), ending in pthread/alloc exhaustion and a hard
    `Fatal Python error: Aborted`.  The cache is now LRU-capped and
    wait_for_async_saves() closes everything it drained."""
    import threading

    state = _tiny_state()
    base_threads = threading.active_count()
    for i in range(3 * ckpt_lib._MAX_CACHED_CKPTRS):
        ckpt_lib.save_checkpoint(str(tmp_path / f"run{i}"), "m", "last",
                                 state, extra={"epoch": i},
                                 async_save=True)
        assert len(ckpt_lib._ASYNC_CKPTRS) <= ckpt_lib._MAX_CACHED_CKPTRS
    ckpt_lib.wait_for_async_saves()
    assert len(ckpt_lib._ASYNC_CKPTRS) == 0
    # every background thread was released (not merely parked)
    assert threading.active_count() <= base_threads + 1
    # the LRU evictions committed their symlinks: every run restorable
    for i in range(3 * ckpt_lib._MAX_CACHED_CKPTRS):
        payload = ckpt_lib.restore_checkpoint(str(tmp_path / f"run{i}"),
                                              "m", "last")
        assert payload["extra"]["epoch"] == i


def test_stale_crash_leftovers_are_garbage_collected(tmp_path):
    """A run killed mid-save leaves unswapped {name}.vN dirs (and possibly
    a .link temp); the next run's first save must clean them up instead of
    accumulating one orphan per crash — while never touching the live
    checkpoint."""
    import os

    state = _tiny_state()
    root = str(tmp_path)
    ckpt_lib.save_checkpoint(root, "m", "last", state, extra={"epoch": 1})
    path = os.path.join(root, "m_last")
    # simulate crash leftovers: a committed-but-unswapped version, a
    # partially-written orbax temp, and an orphaned swap link
    os.makedirs(os.path.join(root, "m_last.v90", "inner"))
    os.makedirs(os.path.join(root, "m_last.v91.orbax-checkpoint-tmp-7"))
    os.symlink("m_last.v90", os.path.join(root, "m_last.v90.link"))
    ckpt_lib.save_checkpoint(root, "m", "last", state, extra={"epoch": 2})
    leftovers = sorted(d for d in os.listdir(root)
                       if d.startswith("m_last.v9"))
    assert leftovers == [], leftovers
    payload = ckpt_lib.restore_checkpoint(root, "m", "last")
    assert payload["extra"]["epoch"] == 2
    vdirs = [d for d in os.listdir(root) if d.startswith("m_last.v")]
    assert len(vdirs) == 1, vdirs
