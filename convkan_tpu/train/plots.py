"""Reporting/plotting parity with evaluations.py:263-400: loss curves,
params-vs-accuracy scatter, styled results CSV, and one-vs-rest ROC
curves.  All host-side (matplotlib), called after training."""

from __future__ import annotations

import os
from typing import Dict, List, Optional, Sequence

import numpy as np


def _plt():
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    return plt


def final_plots(histories: Dict[str, dict], param_counts: Dict[str, int],
                out_dir: str = "./results"):
    """Loss curves + params-vs-accuracy scatter + experiment_results.csv
    (evaluations.py:263-338 parity, minus the notebook styling)."""
    plt = _plt()
    os.makedirs(out_dir, exist_ok=True)

    fig, axes = plt.subplots(1, 2, figsize=(12, 4))
    for name, h in histories.items():
        axes[0].plot(h["train_loss"], label=f"{name} train")
        axes[0].plot(h["test_loss"], "--", label=f"{name} test")
        axes[1].plot(h["accuracy"], label=name)
    axes[0].set_xlabel("epoch"); axes[0].set_ylabel("loss"); axes[0].legend(fontsize=6)
    axes[1].set_xlabel("epoch"); axes[1].set_ylabel("test accuracy"); axes[1].legend(fontsize=6)
    fig.tight_layout()
    fig.savefig(os.path.join(out_dir, "loss_curves.png"), dpi=120)
    plt.close(fig)

    fig, ax = plt.subplots(figsize=(6, 4))
    for name, h in histories.items():
        if name in param_counts and h["accuracy"]:
            ax.scatter(param_counts[name], max(h["accuracy"]), label=name)
    ax.set_xlabel("parameters"); ax.set_ylabel("best accuracy")
    ax.set_xscale("log"); ax.legend(fontsize=6)
    fig.tight_layout()
    fig.savefig(os.path.join(out_dir, "params_vs_accuracy.png"), dpi=120)
    plt.close(fig)

    rows = ["model,best_acc,final_train_loss,final_test_loss,params"]
    for name, h in histories.items():
        rows.append(
            f"{name},{max(h['accuracy']) if h['accuracy'] else ''},"
            f"{h['train_loss'][-1] if h['train_loss'] else ''},"
            f"{h['test_loss'][-1] if h['test_loss'] else ''},"
            f"{param_counts.get(name, '')}")
    with open(os.path.join(out_dir, "experiment_results.csv"), "w") as f:
        f.write("\n".join(rows) + "\n")


def roc_one_vs_rest(probs: np.ndarray, targets: np.ndarray,
                    class_names: Sequence[str],
                    out_path: Optional[str] = None):
    """One-vs-rest ROC curves + AUCs from predicted probabilities
    (evaluations.py:340-400 parity, sklearn-free trapezoidal AUC).
    Returns {class_name: auc}."""
    n_classes = probs.shape[1]
    aucs = {}
    curves = {}
    for c in range(n_classes):
        score = probs[:, c]
        pos = targets == c
        order = np.argsort(-score)
        pos_sorted = pos[order]
        tp = np.cumsum(pos_sorted)
        fp = np.cumsum(~pos_sorted)
        P = max(int(pos.sum()), 1)
        N = max(int((~pos).sum()), 1)
        tpr = np.concatenate([[0.0], tp / P])
        fpr = np.concatenate([[0.0], fp / N])
        auc = float(np.trapezoid(tpr, fpr))
        aucs[class_names[c]] = auc
        curves[class_names[c]] = (fpr, tpr)
    if out_path:
        plt = _plt()
        fig, ax = plt.subplots(figsize=(6, 5))
        for name, (fpr, tpr) in curves.items():
            ax.plot(fpr, tpr, label=f"{name} (AUC {aucs[name]:.3f})")
        ax.plot([0, 1], [0, 1], "k--", lw=0.5)
        ax.set_xlabel("FPR"); ax.set_ylabel("TPR"); ax.legend(fontsize=6)
        fig.tight_layout()
        fig.savefig(out_path, dpi=120)
        plt.close(fig)
    return aucs
