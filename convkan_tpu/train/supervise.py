"""Relaunch-on-preemption supervisor — the failure-recovery half of
SURVEY.md §5 ("failure detection / elastic recovery": the reference has
none; a crash loses everything except saved .pt files).

Cloud TPU schedulers deliver SIGTERM ahead of a preemption.  The training
loop (train/loop.py) catches it, saves a resumable 'last' checkpoint, and
train.py exits with PREEMPTED_EXIT_CODE (75, EX_TEMPFAIL).  This module
watches for that exit code and relaunches the command with --resume so
training continues from the checkpoint:

    python -m convkan_tpu.train.supervise --max_restarts 10 -- \
        python train.py --dataset CIFAR10 --model VGGKAN ...

Any other exit code (0 = done, nonzero = real failure) is passed through
unchanged.  If the supervisor itself receives SIGTERM/SIGINT it forwards
the signal to the child and exits with the child's code — so under a
process manager that restarts on 75, the whole pair is preemption-safe.
"""

from __future__ import annotations

import argparse
import logging
import signal
import subprocess
import sys

from .loop import PREEMPTED_EXIT_CODE

logger = logging.getLogger(__name__)


def _with_resume(cmd: list) -> list:
    """The relaunch command: cmd with --resume appended (once)."""
    return cmd if "--resume" in cmd else list(cmd) + ["--resume"]


def supervise(cmd: list, max_restarts: int = 10) -> int:
    """Run `cmd`; while it exits PREEMPTED_EXIT_CODE and the restart
    budget lasts, relaunch it with --resume.  Returns the final exit
    code (PREEMPTED_EXIT_CODE itself if the budget is exhausted, so an
    outer scheduler can keep the chain going)."""
    restarts = 0
    current = list(cmd)
    terminated = []  # set when WE got SIGTERM: propagate, don't relaunch
    while True:
        child = subprocess.Popen(current)

        def forward(signum, _frame):
            # pass the preemption notice down; the child checkpoints and
            # exits 75, which we then propagate instead of relaunching
            # (the host itself is going away — an outer process manager
            # that restarts on 75 re-schedules the whole pair)
            terminated.append(signum)
            child.send_signal(signum)

        prev_term = signal.signal(signal.SIGTERM, forward)
        try:
            rc = child.wait()
        finally:
            signal.signal(signal.SIGTERM, prev_term)

        if terminated:
            logger.info("supervisor terminated; propagating child exit %d",
                        rc)
            return rc
        if rc != PREEMPTED_EXIT_CODE:
            return rc
        if restarts >= max_restarts:
            logger.warning(
                "preempted again but restart budget (%d) exhausted",
                max_restarts)
            return rc
        restarts += 1
        current = _with_resume(cmd)
        logger.info("child preempted (exit %d); restart %d/%d: %s",
                    rc, restarts, max_restarts, " ".join(current))


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(
        description="Relaunch a training command when it exits with the "
                    "preemption code (75); everything after `--` is the "
                    "command.")
    parser.add_argument("--max_restarts", type=int, default=10)
    args, rest = parser.parse_known_args(argv)
    if rest and rest[0] == "--":
        rest = rest[1:]
    if not rest:
        parser.error("no command given (usage: ... -- python train.py ...)")
    logging.basicConfig(level=logging.INFO,
                        format="%(asctime)s - supervise - %(message)s")
    return supervise(rest, max_restarts=args.max_restarts)


if __name__ == "__main__":
    sys.exit(main())
