"""Deterministic synthetic CIFAR-10-scale dataset for the epoch-scale
convergence-parity artifact (VERDICT r3 #7).

This host has zero egress, so real CIFAR-10 cannot be fetched (see
tests/test_real_data.py — the real-data suite arms itself the moment the
files exist).  The convergence comparison instead uses a *procedural*
10-class dataset with CIFAR-like shape (50,000 train / 10,000 test,
32x32x3 uint8) and non-trivial structure: each class is a mixture of two
low-frequency color templates, rendered with random sub-image translation,
per-sample brightness/contrast jitter, and pixel noise.  Both harnesses
(the reference torch loop in /root/reference/evaluations.py:156-247 and
convkan_tpu's train/loop.py) consume the exact same uint8 arrays, so the
curves isolate the *training dynamics*, not the data pipeline.

Everything is seeded: re-running this script reproduces the .npz bit-for-bit.
"""

import os

import numpy as np

OUT = os.environ.get("CONV_DATA", "/tmp/convergence_data.npz")
N_TRAIN = int(os.environ.get("CONV_NTRAIN", 50_000))
N_TEST = int(os.environ.get("CONV_NTEST", 10_000))
H, W, C, K = 32, 32, 3, 10
# Hardness knobs (round 5, VERDICT r4 #5): the round-4 dataset saturates
# (both harnesses reach 99.8% — drift invisible).  More templates per
# class + more noise + stronger jitter push 10-epoch accuracy into the
# informative 0.6-0.85 band where optimizer/numerics differences show.
TPC = int(os.environ.get("CONV_TPC", 2))          # templates per class
NOISE = float(os.environ.get("CONV_NOISE", 0.35))  # pixel noise sigma


def _templates(rng):
    """(K, TPC, H, W, C) low-frequency class templates in [-1, 1]."""
    low = rng.standard_normal((K, TPC, 8, 8, C))
    # bilinear 8->32 upsample via np.kron + box smoothing
    up = np.kron(low, np.ones((1, 1, 4, 4, 1)))
    ker = np.ones(5) / 5
    for axis in (2, 3):
        up = np.apply_along_axis(
            lambda v: np.convolve(v, ker, mode="same"), axis, up)
    up /= np.abs(up).max(axis=(2, 3, 4), keepdims=True)
    return up


def _render(rng, templates, n):
    y = rng.integers(0, K, size=n)
    mix = rng.integers(0, TPC, size=n)
    base = templates[y, mix]                       # (n, H, W, C)
    # random translation +-4 px (reflect-padded slice)
    pad = np.pad(base, ((0, 0), (4, 4), (4, 4), (0, 0)), mode="reflect")
    dx, dy = rng.integers(0, 9, size=(2, n))
    idx = np.arange(H)
    rows = dy[:, None] + idx[None, :]
    shifted = pad[np.arange(n)[:, None, None], rows[:, :, None],
                  (dx[:, None] + idx[None, :])[:, None, :]]
    # brightness/contrast jitter + noise
    gain = rng.uniform(0.6, 1.4, size=(n, 1, 1, 1))
    bias = rng.uniform(-0.2, 0.2, size=(n, 1, 1, 1))
    noise = rng.standard_normal(shifted.shape) * NOISE
    img = shifted * gain + bias + noise
    img = np.clip((img + 1.5) / 3.0, 0, 1)         # -> [0, 1]
    return (img * 255).astype(np.uint8), y.astype(np.int64)


def main():
    rng = np.random.default_rng(1234)
    templates = _templates(rng)
    xtr, ytr = _render(rng, templates, N_TRAIN)
    xte, yte = _render(rng, templates, N_TEST)
    np.savez_compressed(OUT, x_train=xtr, y_train=ytr,
                        x_test=xte, y_test=yte)
    print(f"wrote {OUT}: train {xtr.shape} test {xte.shape} "
          f"class histogram {np.bincount(ytr, minlength=K)}")


if __name__ == "__main__":
    main()
