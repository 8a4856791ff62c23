"""Opt-in dataset downloader (reference parity: utils/dataloader.py:14-112
passes download=True to torchvision).

This host may have zero egress — downloading is therefore OPT-IN and never
implicit: run it once on a connected machine (or copy the files), then the
loaders in train/data.py read the raw files directly.

    python -m convkan_tpu.train.download CIFAR10 --data_path ./data

Layout produced (what train/data.py expects):
    MNIST:    <data_path>/MNIST/raw/{train,t10k}-{images-idx3,labels-idx1}-ubyte(.gz)
    CIFAR10:  <data_path>/cifar-10-batches-py/{data_batch_1..5,test_batch}
    CIFAR100: <data_path>/cifar-100-python/{train,test}
    SVHN:     <data_path>/{train,test}_32x32.mat
"""

from __future__ import annotations

import argparse
import hashlib
import os
import sys
import tarfile
import urllib.request

# (url, md5, post) per file; md5s are the torchvision-published ones
MNIST_BASE = "https://ossci-datasets.s3.amazonaws.com/mnist/"
FILES = {
    "MNIST": [
        (MNIST_BASE + "train-images-idx3-ubyte.gz",
         "f68b3c2dcbeaaa9fbdd348bbdeb94873", "MNIST/raw"),
        (MNIST_BASE + "train-labels-idx1-ubyte.gz",
         "d53e105ee54ea40749a09fcbcd1e9432", "MNIST/raw"),
        (MNIST_BASE + "t10k-images-idx3-ubyte.gz",
         "9fb629c4189551a2d022fa330f9573f3", "MNIST/raw"),
        (MNIST_BASE + "t10k-labels-idx1-ubyte.gz",
         "ec29112dd5afa0611ce80d1b7f02629c", "MNIST/raw"),
    ],
    "CIFAR10": [
        ("https://www.cs.toronto.edu/~kriz/cifar-10-python.tar.gz",
         "c58f30108f718f92721af3b95e74349a", "untar"),
    ],
    "CIFAR100": [
        ("https://www.cs.toronto.edu/~kriz/cifar-100-python.tar.gz",
         "eb9058c3a382ffc7106e4002c42a8d85", "untar"),
    ],
    "SVHN": [
        ("http://ufldl.stanford.edu/housenumbers/train_32x32.mat",
         "e26dedcc434d2e4c54c9b2d4a06d8373", "."),
        ("http://ufldl.stanford.edu/housenumbers/test_32x32.mat",
         "eb5a983be6a315427106f1b164d9cef3", "."),
    ],
}


def _md5(path: str) -> str:
    h = hashlib.md5()
    with open(path, "rb") as f:
        for chunk in iter(lambda: f.read(1 << 20), b""):
            h.update(chunk)
    return h.hexdigest()


def download(dataset: str, data_path: str = "./data", quiet: bool = False):
    """Fetch + verify + unpack one dataset into the expected layout."""
    if dataset not in FILES:
        raise ValueError(f"unknown dataset {dataset!r}; "
                         f"choose from {sorted(FILES)}")
    for url, md5, post in FILES[dataset]:
        fname = url.rsplit("/", 1)[1]
        dest_dir = os.path.join(data_path,
                                post if post not in ("untar", ".") else "")
        os.makedirs(dest_dir or ".", exist_ok=True)
        dest = os.path.join(dest_dir, fname)
        if os.path.exists(dest) and _md5(dest) == md5:
            if not quiet:
                print(f"ok (cached): {dest}")
        else:
            if not quiet:
                print(f"fetching {url} -> {dest}")
            try:
                urllib.request.urlretrieve(url, dest)
            except OSError as e:
                raise OSError(
                    f"download failed ({e}); this machine may have no "
                    f"egress.  Fetch {url} elsewhere, verify md5={md5}, "
                    f"and place it at {dest} — or use --synthetic_data "
                    "for smoke runs.") from e
            got = _md5(dest)
            if got != md5:
                raise OSError(f"md5 mismatch for {dest}: {got} != {md5}")
        if post == "untar":
            # skip when the extracted tree already exists (a verified
            # cached archive used to be re-untarred on EVERY invocation,
            # racing any concurrent reader of the batch files)
            with tarfile.open(dest) as tf:
                first = tf.next().name.split("/")[0]
            top = os.path.join(data_path, first)
            if os.path.isdir(top):
                if not quiet:
                    print(f"already extracted: {top}")
            else:
                with tarfile.open(dest) as tf:
                    tf.extractall(data_path, filter="data")
                if not quiet:
                    print(f"extracted into {data_path}")


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("dataset", choices=sorted(FILES) + ["all"])
    ap.add_argument("--data_path", default="./data")
    args = ap.parse_args(argv)
    for ds in (sorted(FILES) if args.dataset == "all" else [args.dataset]):
        download(ds, args.data_path)


if __name__ == "__main__":
    sys.exit(main())
