"""Input pipeline: MNIST / SVHN / CIFAR-10 / CIFAR-100.

Parity with utils/dataloader.py:14-114 (same normalization constants, same
augmentation policy), redesigned TPU-first:

  * native file parsers (IDX / CIFAR pickle / SVHN .mat) — no torchvision;
  * normalization + augmentation (random crop with 4px pad + horizontal
    flip) run ON DEVICE inside the jitted train step (see `augment_batch`) —
    the host only ships uint8 batches;
  * deterministic epoch shuffling from a seed;
  * `synthetic=True` provides a dataset-shaped random substitute for
    benchmarks/tests on machines without the raw files (zero-egress).
"""

from __future__ import annotations

import gzip
import os
import pickle
import tarfile
from dataclasses import dataclass
from typing import Iterator, Optional, Tuple

import jax
import jax.image
import jax.numpy as jnp
import numpy as np

# utils/dataloader.py:56-90 (float32 so normalization never upcasts the
# activation dtype under jax_enable_x64)
NORMALIZATION = {
    "MNIST": (np.array([0.1307], np.float32), np.array([0.3081], np.float32)),
    "SVHN": (np.array([0.4377, 0.4438, 0.4728], np.float32),
             np.array([0.1980, 0.2010, 0.1970], np.float32)),
    "CIFAR10": (np.array([0.4914, 0.4822, 0.4465], np.float32),
                np.array([0.2470, 0.2435, 0.2616], np.float32)),
    "CIFAR100": (np.array([0.5071, 0.4867, 0.4408], np.float32),
                 np.array([0.2675, 0.2565, 0.2761], np.float32)),
}

CIFAR10_CLASSES = ["airplane", "automobile", "bird", "cat", "deer", "dog",
                   "frog", "horse", "ship", "truck"]
DIGIT_CLASSES = [str(i) for i in range(10)]


IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)
IMAGENET_RESIZE_SIZE = 256
IMAGENET_CROP_SIZE = 224


@dataclass
class ArrayDataset:
    """In-memory dataset: uint8 HWC images + int labels."""

    images: np.ndarray     # (N, H, W, C) uint8
    labels: np.ndarray     # (N,) int32
    num_classes: int
    augment: bool = False  # random crop(pad 4) + hflip on device
    imagenet: bool = False  # resize/crop-to-224 ImageNet preprocessing

    def __len__(self):
        return len(self.images)


# ------------------------------------------------------------------ parsers
def _read_idx(path: str) -> np.ndarray:
    opener = gzip.open if path.endswith(".gz") else open
    with opener(path, "rb") as f:
        data = f.read()
    magic = int.from_bytes(data[2:3], "big")
    ndim = data[3]
    dims = [int.from_bytes(data[4 + 4 * i: 8 + 4 * i], "big")
            for i in range(ndim)]
    return np.frombuffer(data, np.uint8, offset=4 + 4 * ndim).reshape(dims)


def _load_mnist(root: str, train: bool):
    base = os.path.join(root, "MNIST", "raw")
    stem = "train" if train else "t10k"
    for ext in ("", ".gz"):
        ip = os.path.join(base, f"{stem}-images-idx3-ubyte{ext}")
        lp = os.path.join(base, f"{stem}-labels-idx1-ubyte{ext}")
        if os.path.exists(ip) and os.path.exists(lp):
            x = _read_idx(ip)[..., None]
            y = _read_idx(lp).astype(np.int32)
            return x, y
    raise FileNotFoundError(f"MNIST raw files not found under {base}")


def _load_cifar(root: str, train: bool, coarse100: bool = False, n100=False):
    if n100:
        d = os.path.join(root, "cifar-100-python")
        files = ["train"] if train else ["test"]
        key = b"fine_labels"
    else:
        d = os.path.join(root, "cifar-10-batches-py")
        files = [f"data_batch_{i}" for i in range(1, 6)] if train else ["test_batch"]
        key = b"labels"
    xs, ys = [], []
    for fn in files:
        with open(os.path.join(d, fn), "rb") as f:
            blob = pickle.load(f, encoding="bytes")
        xs.append(blob[b"data"])
        ys.append(np.asarray(blob[key]))
    x = np.concatenate(xs).reshape(-1, 3, 32, 32).transpose(0, 2, 3, 1)
    y = np.concatenate(ys).astype(np.int32)
    return np.ascontiguousarray(x), y


def _load_svhn(root: str, train: bool):
    from scipy.io import loadmat  # scipy ships with the image

    fn = os.path.join(root, f"{'train' if train else 'test'}_32x32.mat")
    blob = loadmat(fn)
    x = np.transpose(blob["X"], (3, 0, 1, 2))  # (N, 32, 32, 3)
    y = blob["y"].reshape(-1).astype(np.int32)
    y[y == 10] = 0
    return x, y


def _synthetic(dataset: str, n: int, seed: int = 0):
    rng = np.random.RandomState(seed)
    if dataset == "MNIST":
        shape, nc = (n, 28, 28, 1), 10
    elif dataset == "CIFAR100":
        shape, nc = (n, 32, 32, 3), 100
    else:
        shape, nc = (n, 32, 32, 3), 10
    x = rng.randint(0, 256, size=shape, dtype=np.uint8)
    y = rng.randint(0, nc, size=(n,), dtype=np.int32)
    return x, y


def get_datasets(dataset: str, data_path: str = "./data",
                 synthetic: bool = False, synthetic_size: int = 2048,
                 imagenet_preprocessing: bool = False):
    """Returns (train: ArrayDataset, test: ArrayDataset, classes)."""
    nc = 100 if dataset == "CIFAR100" else 10
    aug = dataset in ("CIFAR10", "CIFAR100")
    if synthetic:
        xtr, ytr = _synthetic(dataset, synthetic_size, seed=0)
        xte, yte = _synthetic(dataset, max(synthetic_size // 4, 256), seed=1)
    elif dataset == "MNIST":
        xtr, ytr = _load_mnist(data_path, True)
        xte, yte = _load_mnist(data_path, False)
    elif dataset == "SVHN":
        xtr, ytr = _load_svhn(data_path, True)
        xte, yte = _load_svhn(data_path, False)
    elif dataset == "CIFAR10":
        xtr, ytr = _load_cifar(data_path, True)
        xte, yte = _load_cifar(data_path, False)
    elif dataset == "CIFAR100":
        xtr, ytr = _load_cifar(data_path, True, n100=True)
        xte, yte = _load_cifar(data_path, False, n100=True)
    else:
        raise ValueError(dataset)
    if dataset == "CIFAR10":
        classes = CIFAR10_CLASSES
    elif dataset == "CIFAR100":
        classes = [str(i) for i in range(100)]
    else:
        classes = DIGIT_CLASSES
    if imagenet_preprocessing:
        # utils/dataloader.py:26-54: resize(+random-resized-crop/flip) to
        # 224 with ImageNet normalization; augmentation runs on device
        aug = dataset != "MNIST"
        return (ArrayDataset(xtr, ytr, nc, augment=aug, imagenet=True),
                ArrayDataset(xte, yte, nc, augment=False, imagenet=True),
                classes)
    return (ArrayDataset(xtr, ytr, nc, augment=aug),
            ArrayDataset(xte, yte, nc, augment=False), classes)


# ------------------------------------------------------- on-device pipeline
def normalize_batch(x_uint8, dataset: str):
    """uint8 NHWC -> normalized float32 (ToTensor + Normalize parity)."""
    mean, std = NORMALIZATION[dataset]
    x = x_uint8.astype(jnp.float32) / 255.0
    return (x - mean.reshape(1, 1, 1, -1)) / std.reshape(1, 1, 1, -1)


def augment_batch(rng, x):
    """Random 32x32 crop from 4px zero-pad + horizontal flip, per sample,
    fully on device (utils/dataloader.py:70-71 parity).  Operates on the
    normalized float tensor; zero padding then matches torch's pad-then-
    normalize only up to the pad pixels, which torch normalizes from 0 —
    we therefore pad BEFORE normalization in the train step."""
    B, H, W, C = x.shape
    pad = 4
    rng_crop, rng_flip = jax.random.split(rng)
    xp = jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)))
    offs = jax.random.randint(rng_crop, (B, 2), 0, 2 * pad + 1)

    def crop_one(img, off):
        return jax.lax.dynamic_slice(img, (off[0], off[1], 0), (H, W, C))

    xc = jax.vmap(crop_one)(xp, offs)
    flip = jax.random.bernoulli(rng_flip, 0.5, (B,))
    return jnp.where(flip[:, None, None, None], xc[:, :, ::-1, :], xc)


def _imagenet_resize(x):
    """Bilinear resize so the short side is IMAGENET_RESIZE_SIZE
    (transforms.Resize parity, up to interpolation kernel details)."""
    B, H, W, C = x.shape
    if H <= W:
        nh, nw = IMAGENET_RESIZE_SIZE, max(
            round(W * IMAGENET_RESIZE_SIZE / H), IMAGENET_RESIZE_SIZE)
    else:
        nw, nh = IMAGENET_RESIZE_SIZE, max(
            round(H * IMAGENET_RESIZE_SIZE / W), IMAGENET_RESIZE_SIZE)
    return jax.image.resize(x, (B, nh, nw, C), method="bilinear")


def _to_3ch(x):
    return jnp.repeat(x, 3, axis=-1) if x.shape[-1] == 1 else x


def imagenet_batch(rng, x_uint8, train: bool, dataset: str):
    """utils/dataloader.py:26-54 on device: MNIST -> resize 224 + 3-channel
    grayscale; others -> resize 256 + (random crop + hflip | center crop)
    to 224; ImageNet mean/std."""
    x = x_uint8.astype(jnp.float32)
    if dataset == "MNIST":
        B, H, W, C = x.shape
        x = jax.image.resize(
            x, (B, IMAGENET_CROP_SIZE, IMAGENET_CROP_SIZE, C), "bilinear")
        x = _to_3ch(x)
    else:
        x = _imagenet_resize(x)
        B, H, W, C = x.shape
        S = IMAGENET_CROP_SIZE
        if train:
            rng_crop, rng_flip = jax.random.split(rng)
            offs = jax.random.randint(
                rng_crop, (B, 2), 0,
                jnp.asarray([H - S + 1, W - S + 1]))
            x = jax.vmap(lambda img, o: jax.lax.dynamic_slice(
                img, (o[0], o[1], 0), (S, S, C)))(x, offs)
            flip = jax.random.bernoulli(rng_flip, 0.5, (B,))
            x = jnp.where(flip[:, None, None, None], x[:, :, ::-1, :], x)
        else:
            h0, w0 = (H - S) // 2, (W - S) // 2
            x = x[:, h0:h0 + S, w0:w0 + S, :]
    x = x / 255.0
    return ((x - IMAGENET_MEAN.reshape(1, 1, 1, -1))
            / IMAGENET_STD.reshape(1, 1, 1, -1))


def train_batch(rng, x_uint8, dataset: str, augment: bool,
                imagenet: bool = False):
    """uint8 batch -> augmented normalized float batch, all on device."""
    if imagenet:
        return imagenet_batch(rng, x_uint8, train=augment, dataset=dataset)
    if augment:
        x = augment_batch(rng, x_uint8.astype(jnp.float32))
        x = x / 255.0
        mean, std = NORMALIZATION[dataset]
        return (x - mean.reshape(1, 1, 1, -1)) / std.reshape(1, 1, 1, -1)
    return normalize_batch(x_uint8, dataset)


def epoch_batches(ds: ArrayDataset, batch_size: int, seed: int,
                  shuffle: bool, drop_last: bool = False
                  ) -> Iterator[Tuple[np.ndarray, np.ndarray]]:
    """Host-side batch iterator over uint8 data."""
    n = len(ds)
    idx = np.arange(n)
    if shuffle:
        np.random.RandomState(seed).shuffle(idx)
    end = (n // batch_size) * batch_size if drop_last else n
    for s in range(0, end, batch_size):
        sel = idx[s: s + batch_size]
        yield ds.images[sel], ds.labels[sel]
