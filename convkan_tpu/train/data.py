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
import math
import os
import pickle
from dataclasses import dataclass
from typing import Iterator, Tuple

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
    if data[0] != 0 or data[1] != 0 or data[2] != 0x08:
        # IDX header: two zero bytes, dtype byte (0x08 = uint8), ndim —
        # reject corrupt/mislabeled files instead of parsing garbage
        raise ValueError(
            f"{path} is not a uint8 IDX file (header "
            f"{data[:4].hex()}) — see README 'Getting the data'")
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


def _load_cifar(root: str, train: bool, n100: bool = False):
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
    if dataset not in ("MNIST", "SVHN", "CIFAR10", "CIFAR100"):
        # validate even for synthetic data — otherwise a typo'd name
        # surfaces later as an opaque KeyError inside the jitted train step
        raise ValueError(dataset)
    if synthetic:
        xtr, ytr = _synthetic(dataset, synthetic_size, seed=0)
        xte, yte = _synthetic(dataset, max(synthetic_size // 4, 256), seed=1)
    else:
        try:
            if dataset == "MNIST":
                xtr, ytr = _load_mnist(data_path, True)
                xte, yte = _load_mnist(data_path, False)
            elif dataset == "SVHN":
                xtr, ytr = _load_svhn(data_path, True)
                xte, yte = _load_svhn(data_path, False)
            elif dataset == "CIFAR10":
                xtr, ytr = _load_cifar(data_path, True)
                xte, yte = _load_cifar(data_path, False)
            else:
                xtr, ytr = _load_cifar(data_path, True, n100=True)
                xte, yte = _load_cifar(data_path, False, n100=True)
        except FileNotFoundError as e:
            # the exact offline contract (reference downloads implicitly
            # via torchvision; here acquisition is a documented opt-in)
            raise FileNotFoundError(
                f"{e}\n\n{dataset} raw files not found under "
                f"'{data_path}'.  Fetch them once with\n"
                f"    python -m convkan_tpu.train.download {dataset} "
                f"--data_path {data_path}\n"
                "(or copy them from another machine — see that module's "
                "docstring for the exact file layout), or pass "
                "--synthetic_data for a smoke run without real data."
            ) from e
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


def _batched_crop(xp, offs, out_h: int, out_w: int, flip=None):
    """Per-sample integer crop (and optional horizontal flip) as two
    `take_along_axis` gathers.  Bit-exact with the naive per-image
    `lax.dynamic_slice`, but ~10x faster on TPU: vmapped dynamic slices
    lower to serialized per-image gathers, while a batched gather along a
    single axis pipelines cleanly through the VPU.

    xp: (B, Hp, Wp, C); offs: (B, 2) int row/col offsets."""
    rows = offs[:, 0:1] + jnp.arange(out_h)[None]             # (B, out_h)
    cols = offs[:, 1:2] + jnp.arange(out_w)[None]             # (B, out_w)
    if flip is not None:
        cols_r = offs[:, 1:2] + (out_w - 1) - jnp.arange(out_w)[None]
        cols = jnp.where(flip[:, None], cols_r, cols)         # fold the flip
    xg = jnp.take_along_axis(xp, rows[:, :, None, None], axis=1)
    return jnp.take_along_axis(xg, cols[:, None, :, None], axis=2)


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
    flip = jax.random.bernoulli(rng_flip, 0.5, (B,))
    return _batched_crop(xp, offs, H, W, flip=flip)


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


def sample_resized_crop_boxes(rng, B: int, H: int, W: int,
                              scale=(0.08, 1.0), ratio=(3.0 / 4, 4.0 / 3)):
    """torchvision RandomResizedCrop.get_params (utils/dataloader.py:44)
    vectorized: 10 rejection-sampling attempts per image, first valid wins,
    torchvision's ratio-clamped center crop as fallback.  Returns float
    (i, j, h, w) boxes, shape (B, 4)."""
    r_area, r_ar, r_i, r_j = jax.random.split(rng, 4)
    area = float(H * W)
    ta = area * jax.random.uniform(r_area, (B, 10), minval=scale[0],
                                   maxval=scale[1])
    log_r = (math.log(ratio[0]), math.log(ratio[1]))
    ar = jnp.exp(jax.random.uniform(r_ar, (B, 10), minval=log_r[0],
                                    maxval=log_r[1]))
    w = jnp.round(jnp.sqrt(ta * ar))
    h = jnp.round(jnp.sqrt(ta / ar))
    valid = (w > 0) & (w <= W) & (h > 0) & (h <= H)
    first = jnp.argmax(valid, axis=1)                      # first True
    any_valid = jnp.any(valid, axis=1)
    hs = jnp.take_along_axis(h, first[:, None], 1)[:, 0]
    ws = jnp.take_along_axis(w, first[:, None], 1)[:, 0]
    # fallback: clamp aspect, center (torchvision RandomResizedCrop
    # get_params tail)
    in_ratio = W / H
    if in_ratio < ratio[0]:
        fw, fh = float(W), round(W / ratio[0])
    elif in_ratio > ratio[1]:
        fh, fw = float(H), round(H * ratio[1])
    else:
        fw, fh = float(W), float(H)
    hs = jnp.where(any_valid, hs, fh)
    ws = jnp.where(any_valid, ws, fw)
    # torch.randint(0, H - h + 1): uniform integer offset
    ui = jax.random.uniform(r_i, (B,))
    uj = jax.random.uniform(r_j, (B,))
    i = jnp.floor(ui * (H - hs + 1.0))
    j = jnp.floor(uj * (W - ws + 1.0))
    i = jnp.where(any_valid, i, jnp.round((H - hs) / 2.0))
    j = jnp.where(any_valid, j, jnp.round((W - ws) / 2.0))
    return jnp.stack([i, j, hs, ws], axis=1)


def _warp_axis(x, axis: int, src):
    """Separable bilinear sample along one spatial axis.
    x: (B, H, W, C); src: (B, S) fractional source coords for `axis`."""
    n = x.shape[axis]
    src = jnp.clip(src, 0.0, n - 1.0)
    lo = jnp.floor(src).astype(jnp.int32)
    hi = jnp.minimum(lo + 1, n - 1)
    t = (src - lo)[..., None, None] if axis == 1 else (src - lo)[:, None, :, None]
    shape = (-1, src.shape[1], 1, 1) if axis == 1 else (-1, 1, src.shape[1], 1)
    g_lo = jnp.take_along_axis(x, lo.reshape(shape), axis=axis)
    g_hi = jnp.take_along_axis(x, hi.reshape(shape), axis=axis)
    return g_lo * (1.0 - t) + g_hi * t


def random_resized_crop(rng, x, size: int,
                        scale=(0.08, 1.0), ratio=(3.0 / 4, 4.0 / 3),
                        flip=None):
    """RandomResizedCrop(size) + optional horizontal flip, fully on device
    with static shapes: sample torchvision-distribution crop boxes, then
    bilinear-resample each (i, j, h, w) box to (size, size) as a separable
    coordinate warp (align_corners=False convention; PIL's kernel differs
    only in its antialias prefilter when downscaling).

    x: (B, H, W, C) float. Returns (B, size, size, C)."""
    B, H, W, C = x.shape
    r_box, _ = jax.random.split(rng)
    boxes = sample_resized_crop_boxes(r_box, B, H, W, scale, ratio)
    i, j, h, w = boxes[:, 0], boxes[:, 1], boxes[:, 2], boxes[:, 3]
    u = jnp.arange(size, dtype=jnp.float32)
    # dst -> src: (u + 0.5) * (h / S) - 0.5, offset into the crop box.
    # Clamp at BOTH box edges: torchvision crops first then resizes, so a
    # sample can never blend in pixels outside the (i, j, h, w) box — when
    # upscaling (h < size) the last output rows' unclamped source
    # coordinate exceeds h - 1 and would otherwise leak the row below the
    # box into the bottom edge.
    rows = i[:, None] + jnp.clip(
        (u[None] + 0.5) * (h[:, None] / size) - 0.5, 0.0, h[:, None] - 1.0)
    cols_off = jnp.clip((u[None] + 0.5) * (w[:, None] / size) - 0.5,
                        0.0, w[:, None] - 1.0)
    if flip is not None:
        cols_off = jnp.where(flip[:, None], cols_off[:, ::-1], cols_off)
    cols = j[:, None] + cols_off
    x = _warp_axis(x, 1, rows)
    return _warp_axis(x, 2, cols)


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
            # RandomResizedCrop(224) + RandomHorizontalFlip — torchvision
            # scale/aspect sampling (utils/dataloader.py:44-45), not a plain
            # fixed-size crop
            rng_crop, rng_flip = jax.random.split(rng)
            flip = jax.random.bernoulli(rng_flip, 0.5, (B,))
            x = random_resized_crop(rng_crop, x, S, flip=flip)
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
        # crop/flip are pure permutations (pad pixels are zero in either
        # dtype), so augment in uint8 — 4x less gather traffic — and cast
        # to float after; bit-identical to the float-first order.
        x = augment_batch(rng, x_uint8).astype(jnp.float32)
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


def put_batch(arrays, sharding=None):
    """Ship one host batch to device(s), asynchronously.

    * sharding=None: plain async `jax.device_put` (single device).
    * NamedSharding + one process: `device_put` with the sharding — the
      jitted step then consumes it with zero re-layout.
    * a callable: resolved per array (`sharding(a)`) — how batches with
      mixed ranks shard differently (images also H-shard on meshes with a
      'spatial' axis; labels shard on batch only).
    * NamedSharding + multi-process (multi-host DP, SURVEY §2.5): each
      process provides only its local shard of the global batch via
      `jax.make_array_from_process_local_data`; `arrays` must already be
      the process-local slice (see `local_batch_slice`).
    """
    if sharding is None:
        return tuple(jax.device_put(a) for a in arrays)
    get = sharding if callable(sharding) else (lambda a: sharding)
    if jax.process_count() == 1:
        return tuple(jax.device_put(a, get(a)) for a in arrays)
    return tuple(
        jax.make_array_from_process_local_data(get(a), a) for a in arrays)


def local_batch_slice(n: int):
    """(start, stop) rows of a global batch of `n` owned by this process —
    the per-host sharding hook for multi-host data parallelism.

    `jax.make_array_from_process_local_data` with an evenly-partitioned
    NamedSharding requires equal per-process shards, so the global batch
    must divide evenly (train uses drop_last and eval pads, so it does)."""
    pc, pi = jax.process_count(), jax.process_index()
    if n % pc:
        raise ValueError(
            f"global batch {n} is not divisible by process_count {pc}; "
            "pad or drop the remainder before sharding across hosts "
            "(train batches use drop_last=True, eval batches are padded)")
    per = n // pc
    return pi * per, (pi + 1) * per


def prefetch_batches(it, size: int = 2, sharding=None, host_thread=True):
    """Double-buffered device prefetch (depth `size`).

    Overlaps (a) host batch assembly — the numpy fancy-index gather runs in
    a daemon thread feeding a bounded queue — and (b) the H2D transfer —
    `device_put` is async, so up to `size` batches are in flight on the
    interconnect while the device crunches the current step.  Order is
    preserved exactly, so training trajectories are bit-identical to the
    synchronous loop (tests/test_train_e2e.py::test_prefetch_exact).

    The reference's analogue is torch's multi-worker DataLoader
    (utils/dataloader.py:111-112); here the heavy work (augment/normalize)
    is already on device, so prefetch only needs to hide gather+transfer.
    """
    import queue as _q
    import threading

    if host_thread:
        q: _q.Queue = _q.Queue(maxsize=max(size, 1))
        _END = object()
        abandoned = threading.Event()

        def _put(item) -> bool:
            # A consumer that abandons this generator mid-epoch (train
            # step raised, KeyboardInterrupt, early break) stops draining
            # the queue; a plain q.put would then block this thread
            # forever, pinning the queued host batches.  Poll the
            # abandoned flag so the feeder exits instead.
            while not abandoned.is_set():
                try:
                    q.put(item, timeout=0.2)
                    return True
                except _q.Full:
                    continue
            return False

        def _feed():
            # An iterator error must fail the run, not silently truncate
            # the epoch: forward the exception to the consumer thread.
            try:
                for b in it:
                    if not _put(b):
                        return
                _put(_END)
            except BaseException as e:  # noqa: BLE001 - re-raised in consumer
                _put(e)

        threading.Thread(target=_feed, daemon=True).start()

        def host_iter():
            while True:
                b = q.get()
                if b is _END:
                    return
                if isinstance(b, BaseException):
                    raise b
                yield b
        src = host_iter()
    else:
        abandoned = None
        src = it

    from collections import deque
    try:
        buf: deque = deque()
        for b in src:
            buf.append(put_batch(b, sharding))
            if len(buf) >= size:
                yield buf.popleft()
        while buf:
            yield buf.popleft()
    finally:
        # runs on normal exhaustion AND on generator close/abandonment
        if abandoned is not None:
            abandoned.set()
