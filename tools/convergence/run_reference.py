"""Reference-harness leg of the convergence-parity artifact.

Runs /root/reference's own training loop (evaluations.py:156-247
train_and_test_models) on the procedural CIFAR-scale dataset from
gen_data.py, with the reference recipe: VGG16_small + ChebyKAN convs,
AdamW lr=1e-3 wd=1e-3, ExponentialLR gamma=0.8, CrossEntropy, batch 128,
RandomCrop(32, pad=4) + hflip + CIFAR-10 Normalize (utils/dataloader.py:
68-78 — torchvision is absent on this host, so the same three transforms
are implemented inline in torch).

Saves the model's INITIAL state_dict (so the convkan_tpu leg can start
from bit-identical weights via convert_vggkan) and the per-epoch curves.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "goldens"))
sys.path.insert(0, "/root/reference")
import tv_stub  # noqa: F401  (models/__init__ imports EffNet -> torchvision)

import numpy as np
import torch
import torch.nn as nn
from torch.utils.data import DataLoader, Dataset

from evaluations import train_and_test_models
from models.kan_vgg import vggkan

DATA = os.environ.get("CONV_DATA", "/tmp/convergence_data.npz")
OUTDIR = os.environ.get("CONV_OUT", "/tmp/convergence_ref")
EPOCHS = int(os.environ.get("CONV_EPOCHS", "10"))
# ChebyKAN is the VERDICT-named family; it turns out NOT to learn under
# the reference recipe (flat 2.3026 CE for 10 epochs — the clamp-acos
# basis saturates on normalized inputs and there is no base path), which
# the convkan_tpu leg reproduces as pathology-parity.  CONV_KAN=FastKAN
# provides the learning-dynamics comparison.
KAN_CONV = os.environ.get("CONV_KAN", "ChebyKAN")
# CONV_AUG=0 + CONV_SEED: identical-batch-sequence mode (round 5) — no
# augmentation, and the DataLoader is driven by a sampler that replays
# convkan_tpu's exact shuffle rule (np.random.RandomState(seed+epoch)
# over arange(n), last partial batch dropped — train/data.py
# epoch_batches), so both harnesses consume bit-identical batches and
# the per-epoch gap isolates numeric/optimizer drift.
AUG = os.environ.get("CONV_AUG", "1") == "1"
SEED = int(os.environ.get("CONV_SEED", "42"))
# CONV_LR: the recipe's AdamW lr (default = the reference's 1e-3).  The
# WavKAN informative-regime pair uses a tuned lr — VGG16_small+WavKAN is
# a non-learner at 1e-3 (loss pins at ln 10; pathology documented in
# results/convergence/SUMMARY_hard.md).
LR = float(os.environ.get("CONV_LR", "1e-3"))
BATCH = 128


class _MatchedOrderSampler:
    """Replays convkan_tpu's per-epoch shuffle: RandomState(seed+epoch)
    over arange(n), truncated to full batches (drop_last)."""

    def __init__(self, n, batch, seed):
        self.n, self.batch, self.seed = n, batch, seed
        self.epoch = 0

    def __len__(self):
        return (self.n // self.batch) * self.batch

    def __iter__(self):
        idx = np.arange(self.n)
        np.random.RandomState(self.seed + self.epoch).shuffle(idx)
        self.epoch += 1
        return iter(idx[: (self.n // self.batch) * self.batch].tolist())


MEAN = torch.tensor([0.4914, 0.4822, 0.4465]).view(3, 1, 1)
STD = torch.tensor([0.2470, 0.2435, 0.2616]).view(3, 1, 1)


class _Cifar(Dataset):
    def __init__(self, x, y, train):
        self.x, self.y, self.train = x, y, train

    def __len__(self):
        return len(self.x)

    def __getitem__(self, i):
        img = torch.from_numpy(self.x[i]).permute(2, 0, 1).float() / 255.0
        if self.train and AUG:
            img = torch.nn.functional.pad(img, (4, 4, 4, 4))
            r, c = torch.randint(0, 9, (2,))
            img = img[:, r:r + 32, c:c + 32]
            if torch.rand(()) < 0.5:
                img = torch.flip(img, dims=[2])
        return (img - MEAN) / STD, int(self.y[i])


def main():
    os.makedirs(OUTDIR, exist_ok=True)
    d = np.load(DATA)
    torch.manual_seed(42)
    model = vggkan(3, 10, kan_conv=KAN_CONV, classifier_type="Linear",
                   arch="VGG16_small", dropout_linear=0.0)
    torch.save(model.state_dict(), os.path.join(OUTDIR, "init_state.pt"))

    if AUG:
        train_loader = DataLoader(_Cifar(d["x_train"], d["y_train"], True),
                                  batch_size=BATCH, shuffle=True,
                                  generator=torch.Generator().manual_seed(42))
    else:
        train_loader = DataLoader(
            _Cifar(d["x_train"], d["y_train"], True), batch_size=BATCH,
            sampler=_MatchedOrderSampler(len(d["x_train"]), BATCH, SEED),
            drop_last=True)
    test_loader = DataLoader(_Cifar(d["x_test"], d["y_test"], False),
                             batch_size=256, shuffle=False)

    opt = torch.optim.AdamW(model.parameters(), lr=LR, weight_decay=1e-3)
    sched = torch.optim.lr_scheduler.ExponentialLR(opt, gamma=0.8)
    t0 = time.time()
    (tr_loss, te_loss, te_acc, te_prec, te_rec, te_f1, lrs,
     inf_t) = train_and_test_models(
        model, torch.device("cpu"), train_loader, test_loader, opt,
        nn.CrossEntropyLoss(), EPOCHS, sched, path=OUTDIR, verbose=False)
    out = dict(train_loss=tr_loss, test_loss=te_loss, accuracy=te_acc,
               precision=te_prec, recall=te_rec, f1=te_f1, lr=lrs,
               wall_s=time.time() - t0, epochs=EPOCHS, batch=BATCH)
    with open(os.path.join(OUTDIR, "curves.json"), "w") as f:
        json.dump(out, f, indent=1)
    print("done", json.dumps({k: v for k, v in out.items()
                              if k in ("accuracy", "wall_s")}))


if __name__ == "__main__":
    main()
