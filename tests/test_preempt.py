"""Graceful preemption: SIGTERM → resumable checkpoint → exit 75 →
supervisor relaunch with --resume (SURVEY.md §5 "failure detection /
elastic recovery" — the reference has none; a crash loses everything
except saved .pt files)."""

import os
import signal
import sys

import numpy as np
import pytest

from convkan_tpu.factory.mlp_factory import MLP_KAN_FACTORY
from convkan_tpu.train import checkpoint as ckpt_lib
from convkan_tpu.train import loop as loop_mod
from convkan_tpu.train.data import get_datasets
from convkan_tpu.train.loop import (PREEMPTED_EXIT_CODE, TrainingPreempted,
                                    request_preemption, train_model_generic)
from convkan_tpu.train.supervise import _with_resume, supervise


def _trigger_after_train_batches(monkeypatch, n: int):
    """Patch loop.prefetch_batches so request_preemption() fires right
    after the n-th *train* batch is consumed (train yields (x, y) pairs;
    eval yields (x, y, w) triples and is not counted) — a deterministic
    stand-in for a SIGTERM arriving mid-epoch."""
    real = loop_mod.prefetch_batches
    seen = {"train": 0}

    def wrapper(it, **kw):
        for item in real(it, **kw):
            yield item
            if len(item) == 2:
                seen["train"] += 1
                if seen["train"] == n:
                    request_preemption()

    monkeypatch.setattr(loop_mod, "prefetch_batches", wrapper)
    return real


def test_preempt_mid_epoch_checkpoints_and_resumes(tmp_path, monkeypatch):
    """Preemption during epoch 1's batches: TrainingPreempted carries the
    incomplete epoch, a 'last' checkpoint marks that epoch as not-done,
    and a --resume run redoes it and finishes the full schedule."""
    train_ds, test_ds, _ = get_datasets("MNIST", synthetic=True,
                                        synthetic_size=256)
    model = MLP_KAN_FACTORY["FastKAN"]([784, 32, 10])
    steps_per_epoch = 256 // 64
    real = _trigger_after_train_batches(monkeypatch, steps_per_epoch + 1)

    with pytest.raises(TrainingPreempted) as ei:
        train_model_generic(model, train_ds, test_ds, "MNIST", 10,
                            batch_size=64, epochs=3, path=str(tmp_path),
                            model_name="m")
    assert ei.value.epoch == 1

    # the checkpoint is resumable and epoch 1 is marked as to-redo
    assert ckpt_lib.checkpoint_exists(str(tmp_path), "m", "last")
    payload = ckpt_lib.restore_checkpoint(str(tmp_path), "m", "last")
    assert int(payload["extra"]["epoch"]) == 1
    # one completed epoch's worth of history (epoch 0 only)
    assert len(payload["extra"]["history"]["train_loss"]) == 1
    # the checkpoint holds MID-epoch-1 state: steps advanced past epoch 0
    # but epoch 1 did not finish (the poll runs after each train step, so
    # one more batch lands between the request and the stop)
    assert steps_per_epoch < int(payload["step"]) < 2 * steps_per_epoch

    # resume (trigger removed): epochs 1 and 2 run, schedule completes.
    # Also proves the preempt flag is cleared on loop entry — a stale
    # flag would kill the resumed run on its first batch.
    monkeypatch.setattr(loop_mod, "prefetch_batches", real)
    state, history = train_model_generic(
        model, train_ds, test_ds, "MNIST", 10, batch_size=64, epochs=3,
        path=str(tmp_path), model_name="m", resume=True)
    assert len(history["train_loss"]) == 3
    assert np.isfinite(history["train_loss"]).all()


def test_sigterm_sets_preempt_flag():
    """The installed handler turns a real SIGTERM into a preemption
    request; restore() puts the previous disposition back."""
    restore = loop_mod._install_preemption_handler()
    try:
        if signal.getsignal(signal.SIGTERM) in (signal.SIG_DFL, None):
            pytest.skip("handler not installable in this environment")
        loop_mod._PREEMPT.clear()
        os.kill(os.getpid(), signal.SIGTERM)
        # delivery is synchronous in the main thread at the next bytecode
        assert loop_mod._PREEMPT.is_set()
    finally:
        restore()
        loop_mod._PREEMPT.clear()
    assert signal.getsignal(signal.SIGTERM) in (signal.SIG_DFL, None)


def test_handler_does_not_steal_existing():
    """An embedding application's SIGTERM handler is left in place."""
    sentinel = lambda *_: None  # noqa: E731
    prev = signal.signal(signal.SIGTERM, sentinel)
    try:
        restore = loop_mod._install_preemption_handler()
        assert signal.getsignal(signal.SIGTERM) is sentinel
        restore()
        assert signal.getsignal(signal.SIGTERM) is sentinel
    finally:
        signal.signal(signal.SIGTERM, prev)


@pytest.mark.slow
def test_cli_preempt_exit_code_and_resume(tmp_path, monkeypatch):
    """train.py exits PREEMPTED_EXIT_CODE (75) on preemption; rerunning
    with --resume completes the schedule and emits the report surface."""
    import train as cli

    _trigger_after_train_batches(monkeypatch, 1)  # epoch 0, after batch 1
    argv = ["--model", "AlexNetKAN", "--arch", "small",
            "--classifier_type", "Linear", "--conv_type", "conv",
            "--dataset", "MNIST", "--synthetic_data",
            "--synthetic_size", "128", "--epoch", "1",
            "--batch_size", "64", "--results_dir", str(tmp_path)]
    with pytest.raises(SystemExit) as ei:
        cli.main(argv)
    assert ei.value.code == PREEMPTED_EXIT_CODE

    monkeypatch.undo()
    cli.main(argv + ["--resume"])
    assert os.path.exists(os.path.join(str(tmp_path),
                                       "training_history.csv"))


def test_with_resume_appends_once():
    assert _with_resume(["python", "train.py"])[-1] == "--resume"
    cmd = ["python", "train.py", "--resume"]
    assert _with_resume(cmd) == cmd


def _child_cmd(body: str):
    return [sys.executable, "-c", body]


def test_supervise_relaunches_with_resume(tmp_path):
    """First run 'preempts' (exit 75); the supervisor reruns the command
    with --resume; the second run succeeds → supervise returns 0."""
    marker = tmp_path / "preempted_once"
    log = tmp_path / "argv.log"
    body = (
        "import os, sys\n"
        f"open({str(log)!r}, 'a').write(repr(sys.argv[1:]) + chr(10))\n"
        f"if not os.path.exists({str(marker)!r}):\n"
        f"    open({str(marker)!r}, 'w').close()\n"
        "    sys.exit(75)\n"
        "sys.exit(0 if '--resume' in sys.argv else 9)\n")
    assert supervise(_child_cmd(body), max_restarts=3) == 0
    runs = log.read_text().strip().splitlines()
    assert len(runs) == 2
    assert "--resume" not in runs[0] and "--resume" in runs[1]


def test_supervise_budget_exhausted(tmp_path):
    """A child that preempts forever: the budget caps restarts and 75 is
    propagated so an outer scheduler can continue the chain."""
    log = tmp_path / "count.log"
    body = (f"import sys; open({str(log)!r}, 'a').write('x'); "
            "sys.exit(75)\n")
    assert supervise(_child_cmd(body), max_restarts=2) == PREEMPTED_EXIT_CODE
    assert log.read_text() == "xxx"  # initial run + 2 restarts


def test_supervise_passes_through_real_failures(tmp_path):
    """Non-preemption exit codes are not retried."""
    log = tmp_path / "count.log"
    body = (f"import sys; open({str(log)!r}, 'a').write('x'); "
            "sys.exit(3)\n")
    assert supervise(_child_cmd(body), max_restarts=5) == 3
    assert log.read_text() == "x"


def test_supervise_sigterm_propagates_not_relaunch(tmp_path):
    """When the SUPERVISOR is SIGTERMed (the host itself is going away),
    it forwards the signal to the child and propagates the child's exit
    code instead of relaunching training on the dying host — an outer
    process manager that restarts on 75 re-schedules the whole pair."""
    import subprocess
    import time

    log = tmp_path / "runs.log"
    child = (
        "import signal, sys, time\n"
        f"open({str(log)!r}, 'a').write('x')\n"
        "signal.signal(signal.SIGTERM, lambda *_: sys.exit(75))\n"
        "print('READY', flush=True)\n"
        "time.sleep(60)\n")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sup = subprocess.Popen(
        [sys.executable, "-m", "convkan_tpu.train.supervise", "--",
         sys.executable, "-c", child],
        stdout=subprocess.PIPE, text=True, cwd=repo)
    try:
        assert sup.stdout.readline().strip() == "READY"
        sup.send_signal(signal.SIGTERM)
        rc = sup.wait(timeout=60)
    finally:
        if sup.poll() is None:
            sup.kill()
            sup.wait()
        sup.stdout.close()
    assert rc == PREEMPTED_EXIT_CODE
    time.sleep(0.2)  # a (buggy) relaunch would have re-written by now
    assert log.read_text() == "x", "child was relaunched after SIGTERM"
