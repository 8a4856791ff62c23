"""Training/eval loops — parity with evaluations.py:15-247 and
generic_train.py:18-53, redesigned TPU-first:

  * ONE jitted train step: on-device augmentation + normalization, forward,
    CE loss (+ optional explicit L1), backward, AdamW update — with donated
    state (no reallocation) and optional data-parallel sharding over a Mesh;
  * ONE jitted eval step accumulating loss + confusion matrix on device;
    macro P/R/F1 derived from the confusion matrix (no sklearn host sync);
  * partial eval batches are padded+masked instead of recompiled;
  * best/last Orbax checkpoints with the reference's naming contract and
    real resume (params + optimizer state), which the reference lacks
    (SURVEY.md §5);
  * per-epoch metrics, LR record, CSV dump (experiment_results.csv parity)
    and average inference ms/image.

Deviation (documented): the train loop drops the final partial batch to
keep a single compiled step shape; the reference trains on it.
"""

from __future__ import annotations

import csv
import logging
import os
import signal
import threading
import time
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from . import checkpoint as ckpt_lib
from .data import (ArrayDataset, epoch_batches, local_batch_slice,
                   normalize_batch, prefetch_batches, put_batch, train_batch)
from .metrics import (accuracy_from_cm, confusion_matrix,
                      cross_entropy_loss, macro_prf1)
from .state import (TrainState, create_train_state, l1_penalty,
                    make_lr_schedule)
from ..utils.regularization import sown_losses_total

logger = logging.getLogger(__name__)

# --- graceful preemption (SURVEY.md §5 "failure detection / recovery") ---
# Cloud TPU workers get SIGTERM ahead of preemption.  The epoch loop
# installs a handler that sets this event; the batch loop polls it and,
# when set, saves a resumable 'last' checkpoint and raises
# TrainingPreempted so the caller can exit with a restart-me status
# (train.py exits PREEMPTED_EXIT_CODE; train/supervise.py relaunches
# with --resume).
_PREEMPT = threading.Event()

PREEMPTED_EXIT_CODE = 75  # EX_TEMPFAIL: transient, retry me


class TrainingPreempted(RuntimeError):
    """Raised by train_and_test_models after a preemption-triggered
    checkpoint save; .epoch is the epoch the resumed run will redo."""

    def __init__(self, epoch: int, message: str):
        super().__init__(message)
        self.epoch = epoch


def request_preemption():
    """Ask the running epoch loop to checkpoint and stop at the next
    batch boundary (what the SIGTERM handler calls; tests and embedders
    can call it directly from any thread)."""
    _PREEMPT.set()


def _preempt_agreed() -> bool:
    """Cross-process agreement on the preempt flag (VERDICT r4 #1).

    SIGTERM delivery is SKEWED across `jax.distributed` processes, but
    multi-process save_checkpoint is COLLECTIVE: if process A entered the
    collective save at batch k while process B was still issuing train-step
    collectives at k+1, the programs' collectives would mismatch and the
    job would hang away its preemption grace window.  Every process
    therefore calls this at the SAME loop points (each batch boundary and
    each epoch top), and stops iff ANY process saw the signal — so all of
    them enter the collective checkpoint at the same step.  The agreement
    is an allgather of one int32 per process (~µs on ICI; the multi-host
    tests measure the CPU path) and is made sticky locally so later local
    checks observe it.  Single-process: the plain local flag, zero cost."""
    if jax.process_count() == 1:
        return _PREEMPT.is_set()
    from jax.experimental import multihost_utils

    flags = multihost_utils.process_allgather(
        np.int32(1 if _PREEMPT.is_set() else 0))
    if bool(np.any(flags)):
        _PREEMPT.set()
        return True
    return False


def _install_preemption_handler():
    """SIGTERM -> request_preemption().  Returns a restore() callable.
    No-op outside the main thread (signal.signal would raise) or where a
    non-default handler is already installed (don't steal an embedding
    application's handler)."""
    try:
        prev = signal.getsignal(signal.SIGTERM)
        if prev not in (signal.SIG_DFL, None):
            return lambda: None
        signal.signal(signal.SIGTERM, lambda *_: request_preemption())
        return lambda: signal.signal(signal.SIGTERM, prev)
    except ValueError:  # not the main thread
        return lambda: None


def _preempt_checkpoint_and_raise(path, model_name, state, epoch, best_acc,
                                  epochs_no_improve, history, save_last):
    """Synchronously persist a resumable 'last' checkpoint (epoch NOT
    counted as done — the resumed run redoes it from its start with the
    freshest params/opt-state/BN-stats) and raise TrainingPreempted."""
    # drain in-flight async epoch saves first: a concurrent writer on the
    # same checkpoint name would race with (and be GC'd by) the sync save
    ckpt_lib.wait_for_async_saves()
    if path and save_last:
        ckpt_lib.save_checkpoint(
            path, model_name, "last", state,
            extra={"epoch": epoch, "best_acc": best_acc,
                   "epochs_no_improve": epochs_no_improve,
                   "history": history},
            async_save=False)
    ckpt_lib.wait_for_async_saves()
    logger.info("preemption: checkpointed at epoch %d; exiting for restart",
                epoch)
    raise TrainingPreempted(
        epoch, f"preempted during epoch {epoch}; resumable 'last' "
               f"checkpoint saved" if path and save_last else
               f"preempted during epoch {epoch} (no checkpoint path)")


def _shardings(mesh):
    """(replicated sharding, batch-sharding-by-rank fn) for a mesh.
    The fn shards the batch dim over the data axes and — on meshes with a
    'spatial' axis — the H dim of image batches (parallel/mesh.py).
    Cached per rank: the resolver runs per array per batch in the
    prefetch hot path."""
    if mesh is None:
        return None, None
    from ..parallel.mesh import data_sharding

    repl = NamedSharding(mesh, P())
    cache = {}

    def batch(ndim):
        if ndim not in cache:
            cache[ndim] = data_sharding(mesh, ndim)
        return cache[ndim]

    return repl, batch


def batch_put_sharding(mesh):
    """Per-array sharding resolver for put_batch/prefetch_batches on this
    mesh (None for single-device runs)."""
    _, batch = _shardings(mesh)
    return None if batch is None else (lambda a: batch(a.ndim))


def make_train_step(model, dataset: str, augment: bool, l1_decay: float = 0.0,
                    mesh=None, state_shardings=None, imagenet: bool = False,
                    grad_accum: int = 1, label_smoothing: float = 0.0,
                    ema_decay: float = 0.0):
    """grad_accum > 1 splits each global batch into that many equal
    microbatches inside ONE jitted step (a `lax.scan` over microbatches,
    gradients averaged before the single optimizer update) — the
    activation working set shrinks by the accumulation factor while the
    effective batch/update semantics stay those of the full batch.  For
    models without batch-dependent state (everything but BatchNorm
    running stats, which advance once per microbatch — standard
    accumulation semantics) the averaged gradient is bit-for-bit the
    mean-CE full-batch gradient up to f32 summation order."""

    def micro_grads(params, x, labels, drop_rng, stats):
        def loss_fn(params):
            variables = {"params": params}
            if stats:
                variables["batch_stats"] = stats
            out, mut = model.apply(
                variables, x, train=True, rngs={"dropout": drop_rng},
                mutable=["batch_stats", "losses"],
            )
            loss = cross_entropy_loss(out, labels,
                                      label_smoothing=label_smoothing)
            # per-layer penalties sown by L1/L2-wrapped layers
            # (utils/regularization.py) — layer-scoped, reference interface
            loss = loss + sown_losses_total(mut)
            if l1_decay > 0:
                # opt-in *global* L1 over every parameter (beyond-reference)
                loss = loss + l1_penalty(params, l1_decay)
            return loss, mut.get("batch_stats", stats)

        return jax.value_and_grad(loss_fn, has_aux=True)(params)

    def step(state: TrainState, rng, x_uint8, labels):
        rng = jax.random.fold_in(rng, state.step)
        aug_rng, drop_rng = jax.random.split(rng)
        x = train_batch(aug_rng, x_uint8, dataset, augment,
                        imagenet=imagenet)

        if grad_accum <= 1:
            (loss, new_stats), grads = micro_grads(
                state.params, x, labels, drop_rng, state.batch_stats)
        else:
            n = x.shape[0]
            if n % grad_accum:
                raise ValueError(
                    f"batch {n} not divisible by grad_accum={grad_accum}")
            mb = n // grad_accum
            xs = x.reshape((grad_accum, mb) + x.shape[1:])
            ys = labels.reshape((grad_accum, mb))
            zeros = jax.tree_util.tree_map(jnp.zeros_like, state.params)

            def body(carry, inp):
                stats, gsum, lsum, i = carry
                x_mb, y_mb = inp
                (loss, new_stats), g = micro_grads(
                    state.params, x_mb, y_mb,
                    jax.random.fold_in(drop_rng, i), stats)
                gsum = jax.tree_util.tree_map(jnp.add, gsum, g)
                return (new_stats, gsum, lsum + loss, i + 1), ()

            (new_stats, gsum, lsum, _), _ = jax.lax.scan(
                body, (state.batch_stats, zeros, jnp.zeros(()),
                       jnp.zeros((), jnp.int32)), (xs, ys))
            inv = 1.0 / grad_accum
            grads = jax.tree_util.tree_map(lambda g: g * inv, gsum)
            loss = lsum * inv

        state = state.apply_gradients(grads, new_batch_stats=new_stats,
                                      ema_decay=ema_decay)
        return state, loss

    repl, batch = _shardings(mesh)
    if mesh is None:
        return jax.jit(step, donate_argnums=0)
    # tensor parallelism: pass a TrainState-shaped tree of NamedShardings
    # (parallel.sharding.state_shardings) to shard params/opt-state over
    # the 'model' axis; XLA SPMD inserts the ICI collectives
    st_sh = state_shardings if state_shardings is not None else repl
    return jax.jit(
        step, donate_argnums=0,
        in_shardings=(st_sh, repl, batch(4), batch(1)),
        out_shardings=(st_sh, repl),
    )


def make_eval_step(model, dataset: str, num_classes: int, mesh=None,
                   imagenet: bool = False, state_shardings=None,
                   use_ema: bool = False):
    def step(state: TrainState, x_uint8, labels, weights):
        x = _eval_preprocess(x_uint8, dataset, imagenet)
        variables = {"params": (state.ema_params if use_ema
                                else state.params)}
        if state.batch_stats:
            variables["batch_stats"] = state.batch_stats
        logits = model.apply(variables, x, train=False)
        logp = jax.nn.log_softmax(logits)
        nll = -jnp.take_along_axis(logp, labels[:, None], axis=-1)[:, 0]
        loss_sum = jnp.sum(nll * weights)
        preds = jnp.argmax(logits, axis=-1)
        cm = confusion_matrix(preds, labels, num_classes, weights=weights)
        return loss_sum, cm

    repl, batch = _shardings(mesh)
    if mesh is None:
        return jax.jit(step)
    # tensor-parallel eval: keep params sharded over 'model' (pass the same
    # state_shardings tree as make_train_step) instead of re-replicating
    st_sh = state_shardings if state_shardings is not None else repl
    return jax.jit(step, in_shardings=(st_sh, batch(4), batch(1), batch(1)),
                   out_shardings=(repl, repl))


def _pad_batch(x, y, batch_size):
    n = len(x)
    w = np.zeros(batch_size, np.float32)
    w[:n] = 1.0
    if n < batch_size:
        x = np.concatenate([x, np.zeros((batch_size - n,) + x.shape[1:],
                                        x.dtype)])
        y = np.concatenate([y, np.zeros(batch_size - n, y.dtype)])
    return x, y, w


def _local_rows(batch):
    """Multi-host DP hook: keep only this process's rows of a global batch
    (no-op in single-process runs)."""
    if jax.process_count() == 1:
        return batch
    s, e = local_batch_slice(len(batch[0]))
    return tuple(a[s:e] for a in batch)


def evaluate(eval_step, state, ds: ArrayDataset, batch_size: int,
             num_classes: int, batch_sharding=None):
    """Full-dataset eval: returns (loss, acc, precision, recall, f1)."""
    # accumulate on device, sync ONCE at the end — per-batch syncs would
    # serialize the dispatch pipeline (the reference pays a host sync per
    # batch for its sklearn metrics, evaluations.py:139-148)
    loss_sum = jnp.zeros((), jnp.float32)
    cm = jnp.zeros((num_classes, num_classes), jnp.float32)
    n = len(ds)

    def padded():
        for xb, yb in epoch_batches(ds, batch_size, seed=0, shuffle=False):
            yield _local_rows(_pad_batch(xb, yb, batch_size))

    for xb, yb, w in prefetch_batches(padded(), sharding=batch_sharding):
        ls, cmb = eval_step(state, xb, yb, w)
        loss_sum = loss_sum + ls
        cm = cm + cmb
    p, r, f1 = macro_prf1(cm)
    acc = accuracy_from_cm(cm)
    return (float(loss_sum) / n, float(acc), float(p), float(r), float(f1))


def make_timer_batch(ds: ArrayDataset, batch_size: int, batch_sharding=None):
    """Fixed first test batch (padded to batch_size, process-local rows,
    device-put to the mesh sharding) for make_infer_timer — shared by the
    training loop's per-epoch timing and train.py --eval_only."""
    xb0, yb0 = next(epoch_batches(ds, batch_size, seed=0, shuffle=False))
    xb0 = _local_rows(_pad_batch(xb0, yb0, batch_size)[:2])[0]
    if batch_sharding is not None:
        # put_batch, not raw device_put: under multi-host DP the rows here
        # are this process's local slice of the global batch and must go
        # through make_array_from_process_local_data
        (xb0,) = put_batch((xb0,), batch_sharding)
    return xb0


def make_infer_timer(model, dataset: str, imagenet: bool = False,
                     reps: int = 8):
    """Average inference ms/image of the pure jitted forward — the
    reference's timed region (evaluations.py:107-129,152): only
    `model(inputs)` sits inside the clock; preprocessing, metric math and
    host iteration are excluded, and compile is excluded by a warm-up call
    per invocation (so epoch-0 and epoch-N agree within noise).

    `reps` forwards are chained in one jitted lax.scan with a
    data-dependent carry, ending in a host readback of the result — the
    only timing an async dispatch path cannot fake (BENCH_NOTES.md)."""

    prep = jax.jit(lambda xb: _eval_preprocess(xb, dataset, imagenet))

    @jax.jit
    def chain(state, x):
        variables = {"params": state.params}
        if state.batch_stats:
            variables["batch_stats"] = state.batch_stats

        def body(acc, _):
            out = model.apply(variables, x + acc * 1e-20, train=False)
            return jnp.sum(out), None

        acc, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32), None,
                              length=reps)
        return acc

    def timer(state, x_uint8) -> float:
        x = prep(x_uint8)
        np.asarray(chain(state, x))  # warm-up: compile / cache effects
        t0 = time.perf_counter()
        np.asarray(chain(state, x))  # host readback = honest sync
        dt = time.perf_counter() - t0
        return dt / (reps * x.shape[0]) * 1000.0

    return timer


def _eval_preprocess(x_uint8, dataset: str, imagenet: bool):
    if imagenet:
        from .data import imagenet_batch
        return imagenet_batch(None, x_uint8, train=False, dataset=dataset)
    return normalize_batch(x_uint8, dataset)


def train_and_test_models(model, state: TrainState, train_ds: ArrayDataset,
                          test_ds: ArrayDataset, dataset: str,
                          num_classes: int, batch_size: int, epochs: int,
                          *, seed: int = 42, l1_decay: float = 0.0,
                          mesh=None, path: Optional[str] = None,
                          model_name: str = "model", patience=np.inf,
                          save_last: bool = True, resume: bool = False,
                          learning_rate: float = 1e-3, gamma: float = 0.8,
                          grad_accum: int = 1, async_checkpoints: bool = True,
                          label_smoothing: float = 0.0,
                          ema_decay: float = 0.0,
                          scheduler: str = "exponential",
                          warmup_epochs: int = 0,
                          zero1: bool = False,
                          fsdp: bool = False,
                          expert_parallel: bool = False,
                          pipeline_parallel: bool = False,
                          tensor_parallel: bool = False):
    """Epoch loop with best-checkpointing and early stopping
    (evaluations.py:156-247 parity).

    async_checkpoints: per-epoch best/last saves go through an Orbax
    AsyncCheckpointer — the write overlaps the next epoch's compute
    (the payload is host-snapshotted before the save returns, so the
    values are consistent).  All pending writes are drained before the
    function returns and before any restore.

    ema_decay > 0 (beyond-reference): the train step maintains an EMA of
    the params (state.ema_params must exist — create_train_state(ema_decay=...));
    per-epoch evaluation, best-model selection, and checkpoints then use
    the EMA weights, the standard EfficientNet/MobileNet serving recipe."""
    use_ema = ema_decay > 0 and state.ema_params is not None
    # zero1: distribute the AdamW moments over the 'data' axis (ZeRO-1,
    # parallel/sharding.state_shardings) — params stay replicated, XLA
    # inserts the reduce-scatter/all-gather pair around the update
    st_sh = None
    if ((zero1 or fsdp) + expert_parallel + pipeline_parallel > 1
            or (tensor_parallel and (expert_parallel or pipeline_parallel))):
        raise ValueError(
            "zero1/fsdp / expert_parallel / pipeline_parallel pick "
            "different optimizer-state shardings — enable one at a time "
            "(tensor_parallel composes with zero1/fsdp only)")
    if zero1 or fsdp or tensor_parallel:
        sizes = (dict(zip(mesh.axis_names, mesh.devices.shape))
                 if mesh is not None else {})
        if (zero1 or fsdp) and sizes.get("data", 1) <= 1:
            # fail loudly rather than silently training unsharded — the
            # caller asked for optimizer memory that won't materialize
            raise ValueError(
                ("fsdp" if fsdp else "zero1") + "=True needs a mesh with "
                "a >1-wide 'data' axis to shard the "
                + ("params + optimizer state" if fsdp
                   else "optimizer state") + " over")
        if tensor_parallel and sizes.get("model", 1) <= 1:
            raise ValueError(
                "tensor_parallel=True needs a mesh with a >1-wide 'model' "
                "axis to shard conv/linear output channels over")
        from ..parallel.sharding import state_shardings as _state_shardings

        # one call covers all three: the TP 'model' rule applies whenever
        # the mesh has a model axis, zero1 adds the 'data' moment
        # distribution, fsdp extends it to params/EMA (ZeRO-3 analogue)
        st_sh = _state_shardings(state, mesh, zero1=zero1, fsdp=fsdp)
    if (expert_parallel and mesh is not None
            and dict(zip(mesh.axis_names,
                         mesh.devices.shape)).get("expert", 1) > 1):
        # expert parallelism: MoE 'experts' param stacks (and their
        # optimizer moments / EMA mirrors) shard over the 'expert' axis
        from ..parallel.moe import expert_state_shardings

        st_sh = expert_state_shardings(state, mesh)
    if (pipeline_parallel and mesh is not None
            and dict(zip(mesh.axis_names,
                         mesh.devices.shape)).get("pipe", 1) > 1):
        # pipeline parallelism: the 'stages' param stack (and its
        # optimizer moments / EMA mirrors) shards over the 'pipe' axis
        from ..parallel.pipeline import pipeline_state_shardings

        st_sh = pipeline_state_shardings(state, mesh)
    train_step = make_train_step(model, dataset, train_ds.augment,
                                 l1_decay=l1_decay, mesh=mesh,
                                 state_shardings=st_sh,
                                 imagenet=getattr(train_ds, "imagenet", False),
                                 grad_accum=grad_accum,
                                 label_smoothing=label_smoothing,
                                 ema_decay=ema_decay if use_ema else 0.0)
    eval_step = make_eval_step(model, dataset, num_classes, mesh=mesh,
                               imagenet=getattr(test_ds, "imagenet", False),
                               state_shardings=st_sh,
                               use_ema=use_ema)
    # NOTE: train_and_test_models runs dp-style (replicated params) unless
    # tensor_parallel / zero1 / expert_parallel / pipeline_parallel pick a
    # state sharding (train.py --mesh_model/--zero1/--mesh_expert/
    # --mesh_pipe); see also __graft_entry__.dryrun_multichip /
    # tests/test_parallel.py for step-level sharding callers.

    history = {k: [] for k in ["train_loss", "test_loss", "accuracy",
                               "precision", "recall", "f1", "lr",
                               "inference_ms", "epoch_min"]}
    start_epoch = 0
    best_acc = -1.0
    if resume and path and ckpt_lib.checkpoint_exists(path, model_name, "last"):
        state, extra = ckpt_lib.restore_checkpoint(path, model_name, "last",
                                                   state)
        start_epoch = int(extra.get("epoch", 0))
        best_acc = float(extra.get("best_acc", -1.0))
        history = extra.get("history", history)
        history.setdefault("epoch_min", [])  # pre-round-3 checkpoints
        logger.info("resumed from epoch %d", start_epoch)

    if st_sh is not None:
        # place the (fresh or restored) state onto the ZeRO-1 shardings up
        # front, so the first donated train step isn't forced to reshard
        state = jax.device_put(state, st_sh)

    rng = jax.random.PRNGKey(seed)
    # resumed so a preemption cannot reset the early-stopping window
    epochs_no_improve = (int(extra.get("epochs_no_improve", 0))
                         if resume and start_epoch else 0)

    if jax.process_count() > 1 and mesh is None:
        # _local_rows would slice disjoint per-process rows with NO
        # gradient sync (no sharding -> no psum), silently training
        # divergent replicas and under-counting eval loss
        raise ValueError(
            "multi-process run without a mesh: pass mesh= (train.py does "
            "this automatically) so batches are globally sharded and "
            "gradients sync")

    batch_sharding = batch_put_sharding(mesh)

    # the lr recorded in history: the schedule the optimizer was built
    # with, sampled at each epoch's first step (same steps_per_epoch rule
    # as train_model_generic/create_train_state)
    steps_per_epoch = max(len(train_ds) // batch_size, 1)
    lr_schedule = make_lr_schedule(learning_rate, gamma, steps_per_epoch,
                                   scheduler, warmup_epochs,
                                   total_epochs=epochs)

    # fixed batch for the per-epoch inference timing (reference times only
    # the forward on already-loaded data — evaluations.py:107-129)
    infer_timer = make_infer_timer(
        model, dataset, imagenet=getattr(test_ds, "imagenet", False))
    xb0 = make_timer_batch(test_ds, batch_size, batch_sharding)

    # graceful preemption: SIGTERM (what cloud schedulers send ahead of a
    # TPU preemption) requests a checkpoint-and-stop at the next batch
    # boundary instead of killing the run mid-step
    _PREEMPT.clear()
    restore_sigterm = _install_preemption_handler()
    try:
        for epoch in range(start_epoch, epochs):
            if _preempt_agreed():  # fired during the previous epoch's eval/save
                _preempt_checkpoint_and_raise(
                    path, model_name, state, epoch, best_acc,
                    epochs_no_improve, history, save_last)
            t0 = time.perf_counter()
            losses = []

            def shuffled(ep):
                for b in epoch_batches(train_ds, batch_size, seed=seed + ep,
                                       shuffle=True, drop_last=True):
                    yield _local_rows(b)

            for xb, yb in prefetch_batches(shuffled(epoch),
                                           sharding=batch_sharding):
                state, loss = train_step(state, rng, xb, yb)
                losses.append(loss)
                if _preempt_agreed():
                    # the epoch is incomplete: checkpoint the freshest state
                    # with epoch=epoch so the resumed run redoes this epoch
                    _preempt_checkpoint_and_raise(
                        path, model_name, state, epoch, best_acc,
                        epochs_no_improve, history, save_last)
            train_loss = float(jnp.mean(jnp.stack(losses))) if losses else 0.0

            test_loss, acc, prec, rec, f1 = evaluate(
                eval_step, state, test_ds, batch_size, num_classes,
                batch_sharding=batch_sharding)
            inf_ms = infer_timer(state, xb0)
            # LR used this epoch (schedule value at the epoch's first step;
            # default staircase exponential = lr * gamma^epoch,
            # generic_train.py:25 parity)
            lr_now = float(lr_schedule(epoch * steps_per_epoch))
            history["train_loss"].append(train_loss)
            history["test_loss"].append(test_loss)
            history["accuracy"].append(acc)
            history["precision"].append(prec)
            history["recall"].append(rec)
            history["f1"].append(f1)
            history["lr"].append(lr_now)
            history["inference_ms"].append(inf_ms)

            dt = time.perf_counter() - t0
            # avg epoch minutes is a reference harness metric
            # (generic_train.py:32; surfaced by final_plots' use_time table)
            history["epoch_min"].append(dt / 60.0)
            logger.info(
                "epoch %d: train_loss %.4f test_loss %.4f acc %.4f "
                "P %.4f R %.4f F1 %.4f (%.1fs, %.3f ms/img)",
                epoch, train_loss, test_loss, acc, prec, rec, f1, dt, inf_ms)

            if acc > best_acc:
                best_acc = acc
                epochs_no_improve = 0
                if path:
                    ckpt_lib.save_checkpoint(
                        path, model_name, "best", state,
                        extra={"epoch": epoch + 1, "best_acc": best_acc,
                               "epochs_no_improve": epochs_no_improve,
                               "history": history},
                        async_save=async_checkpoints)
            else:
                epochs_no_improve += 1
            if path and save_last:
                ckpt_lib.save_checkpoint(
                    path, model_name, "last", state,
                    extra={"epoch": epoch + 1, "best_acc": best_acc,
                           "epochs_no_improve": epochs_no_improve,
                           "history": history},
                    async_save=async_checkpoints)
            if epochs_no_improve > patience:
                logger.info("early stopping at epoch %d", epoch)
                break
    finally:
        restore_sigterm()

    ckpt_lib.wait_for_async_saves()
    return state, history


def predict_probs(model, state: TrainState, ds: ArrayDataset, dataset: str,
                  batch_size: int, imagenet: bool = False):
    """Softmax probabilities over a dataset (for ROC curves etc. —
    evaluations.py:340 parity).  Returns (probs [N, C], targets [N]).
    Single implementation lives in plots.predict_probs (imagenet-aware;
    this alias keeps existing import sites working)."""
    from .plots import predict_probs as _impl

    return _impl(model, state, ds, dataset, batch_size, imagenet=imagenet)


def write_results_csv(path: str, model_name: str, history: dict):
    """experiment_results.csv parity (evaluations.py:329)."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["model", "epoch", "train_loss", "test_loss", "accuracy",
                    "precision", "recall", "f1", "lr", "inference_ms",
                    "epoch_min"])
        em = history.get("epoch_min", [])
        lrs = history.get("lr", [])
        for i in range(len(history["train_loss"])):
            w.writerow([model_name, i, history["train_loss"][i],
                        history["test_loss"][i], history["accuracy"][i],
                        history["precision"][i], history["recall"][i],
                        history["f1"][i], lrs[i] if i < len(lrs) else "",
                        history["inference_ms"][i],
                        em[i] if i < len(em) else ""])


def train_model_generic(model, train_ds, test_ds, dataset: str,
                        num_classes: int, *, batch_size=64,
                        learning_rate=1e-3, weight_decay=1e-3, gamma=0.8,
                        epochs=15, seed=42, l1_decay=0.0, mesh=None,
                        path: Optional[str] = None, resume: bool = False,
                        model_name: Optional[str] = None,
                        sample_input=None, patience=np.inf,
                        grad_accum: int = 1, label_smoothing: float = 0.0,
                        ema_decay: float = 0.0,
                        scheduler: str = "exponential",
                        warmup_epochs: int = 0,
                        clip_grad_norm: float = 0.0,
                        zero1: bool = False,
                        fsdp: bool = False,
                        expert_parallel: bool = False,
                        pipeline_parallel: bool = False,
                        tensor_parallel: bool = False):
    """generic_train.py:18-53 parity: build optimizer/state and run the
    epoch loop; returns (state, history).  label_smoothing / ema_decay /
    scheduler='cosine' / warmup_epochs / clip_grad_norm / zero1 / fsdp /
    expert_parallel / pipeline_parallel are opt-in beyond-reference
    production knobs (defaults reproduce the reference recipe)."""
    model_name = model_name or getattr(model, "model_name", None) or type(model).__name__
    if sample_input is None:
        if getattr(train_ds, "imagenet", False):
            h = w = 224
            c = 3
        else:
            h, w, c = train_ds.images.shape[1:]
        sample_input = jnp.zeros((batch_size, h, w, c), jnp.float32)
    steps_per_epoch = max(len(train_ds) // batch_size, 1)
    state = create_train_state(
        model, jax.random.PRNGKey(seed), sample_input,
        learning_rate=learning_rate, weight_decay=weight_decay, gamma=gamma,
        steps_per_epoch=steps_per_epoch, scheduler=scheduler,
        warmup_epochs=warmup_epochs, total_epochs=epochs,
        ema_decay=ema_decay, clip_grad_norm=clip_grad_norm)
    n_params = sum(p.size for p in jax.tree_util.tree_leaves(state.params))
    logger.info("Training model %s (%d params)", model_name, n_params)
    t0 = time.perf_counter()
    state, history = train_and_test_models(
        model, state, train_ds, test_ds, dataset, num_classes, batch_size,
        epochs, seed=seed, l1_decay=l1_decay, mesh=mesh, path=path,
        model_name=model_name, resume=resume, learning_rate=learning_rate,
        gamma=gamma, patience=patience, grad_accum=grad_accum,
        label_smoothing=label_smoothing, ema_decay=ema_decay,
        scheduler=scheduler, warmup_epochs=warmup_epochs, zero1=zero1,
        fsdp=fsdp, expert_parallel=expert_parallel,
        pipeline_parallel=pipeline_parallel,
        tensor_parallel=tensor_parallel)
    total = time.perf_counter() - t0
    logger.info("total training time %.2f min (%.2f min/epoch)",
                total / 60, total / 60 / max(epochs, 1))
    return state, history
