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

    # the reference-schema summary table (experiment_results.csv) is
    # written by results_table(); final_plots only renders figures


def _roc_curves(probs: np.ndarray, targets: np.ndarray,
                class_names: Sequence[str]):
    """Per-class one-vs-rest (fpr, tpr) curves + trapezoidal AUCs
    (sklearn-free RocCurveDisplay.from_predictions equivalent)."""
    aucs, curves = {}, {}
    for c in range(probs.shape[1]):
        score = probs[:, c]
        pos = targets == c
        order = np.argsort(-score, kind="stable")
        score_sorted = score[order]
        pos_sorted = pos[order]
        tp = np.cumsum(pos_sorted)
        fp = np.cumsum(~pos_sorted)
        # collapse tied thresholds (sklearn roc_curve semantics): keep only
        # the LAST index of each run of equal scores, so ties contribute a
        # single diagonal segment instead of an argsort-order-dependent
        # staircase (saturated f32 softmax ties at exactly 0/1 are common)
        last_of_run = np.r_[score_sorted[1:] != score_sorted[:-1], True]
        tp = tp[last_of_run]
        fp = fp[last_of_run]
        P = max(int(pos.sum()), 1)
        N = max(int((~pos).sum()), 1)
        tpr = np.concatenate([[0.0], tp / P])
        fpr = np.concatenate([[0.0], fp / N])
        aucs[class_names[c]] = float(np.trapezoid(tpr, fpr))
        curves[class_names[c]] = (fpr, tpr)
    return curves, aucs


def _draw_roc(ax, curves, aucs, title: str):
    """One axes of one-vs-rest ROC curves (evaluations.py:357-400)."""
    for name, (fpr, tpr) in curves.items():
        ax.plot(fpr, tpr, label=f"{name} (AUC {aucs[name]:.3f})")
    ax.plot([0, 1], [0, 1], "k--", lw=0.8, label="Chance level (AUC = 0.5)")
    ax.set_title(title)
    ax.set_xlabel("False Positive Rate")
    ax.set_ylabel("True Positive Rate")
    ax.legend(fontsize=6)
    ax.grid(True)


def roc_one_vs_rest(probs: np.ndarray, targets: np.ndarray,
                    class_names: Sequence[str],
                    out_path: Optional[str] = None):
    """One-vs-rest ROC curves + AUCs from predicted probabilities
    (evaluations.py:357-400 parity, sklearn-free trapezoidal AUC).
    Returns {class_name: auc}."""
    curves, aucs = _roc_curves(probs, targets, class_names)
    if out_path:
        plt = _plt()
        fig, ax = plt.subplots(figsize=(7, 6))
        _draw_roc(ax, curves, aucs, "One-vs-Rest ROC Curves")
        fig.tight_layout()
        fig.savefig(out_path, dpi=120)
        plt.close(fig)
    return aucs


def roc_all_models(prob_sets: Dict[str, tuple], class_names: Sequence[str],
                   out_path: str):
    """All-models ROC figure: one stacked subplot per model
    (plot_roc_one_vs_rest_all_models, evaluations.py:342-355).

    `prob_sets` maps model name -> (probs [n, C], targets [n]) as returned
    by predict_probs.  Returns {model: {class: auc}}."""
    plt = _plt()
    n = max(len(prob_sets), 1)
    fig, axs = plt.subplots(n, 1, figsize=(7, 6 * n), squeeze=False)
    all_aucs = {}
    for ax, (model_name, (probs, targets)) in zip(axs[:, 0],
                                                  prob_sets.items()):
        curves, aucs = _roc_curves(np.asarray(probs), np.asarray(targets),
                                   class_names)
        _draw_roc(ax, curves, aucs,
                  f"One-vs-Rest ROC Curves - {model_name}")
        all_aucs[model_name] = aucs
    fig.tight_layout()
    fig.savefig(out_path, dpi=120)
    plt.close(fig)
    return all_aucs


def predict_probs(model, state, ds, dataset: str, batch_size: int,
                  imagenet: bool = False):
    """Softmax probabilities + targets over a dataset with the jitted
    eval forward (the reference's ROC input loop, evaluations.py:361-375,
    without per-batch host syncs)."""
    import jax

    from .data import epoch_batches
    from .loop import _eval_preprocess, _pad_batch

    @jax.jit
    def fwd(state, xb):
        x = _eval_preprocess(xb, dataset, imagenet)
        variables = {"params": state.params}
        if state.batch_stats:
            variables["batch_stats"] = state.batch_stats
        return jax.nn.softmax(model.apply(variables, x, train=False),
                              axis=-1)

    probs, targets = [], []
    for xb, yb in epoch_batches(ds, batch_size, seed=0, shuffle=False):
        n = len(xb)
        xb_p, yb_p, _ = _pad_batch(xb, yb, batch_size)
        probs.append(np.asarray(fwd(state, xb_p))[:n])
        targets.append(yb)
    return np.concatenate(probs), np.concatenate(targets)


def _highlight_max(col):
    """Bold the max of a numeric column (evaluations.py:253-260)."""
    try:
        mx = np.nanmax(col.to_numpy(dtype=float))
    except (TypeError, ValueError):
        return ["" for _ in col]
    return ["font-weight: bold" if v == mx else "" for v in col]


def results_table(histories: Dict[str, dict], param_counts: Dict[str, int],
                  out_dir: Optional[str] = None, use_time: bool = False):
    """Reference results DataFrame (evaluations.py:318-338): final macro
    metrics + parameter counts per model, styled with per-column bold-max
    and the reference number formats.  Writes experiment_results.csv
    (index_label 'Model Name') and an HTML render of the styled table.
    Returns the pandas Styler."""
    import pandas as pd

    names = list(histories)

    def last(h, k):
        v = h.get(k) or [np.nan]
        return v[-1]

    df_data = {
        "Final Test Accuracy": [last(histories[n], "accuracy") for n in names],
        "Final Test Precision (Macro)": [last(histories[n], "precision")
                                         for n in names],
        "Final Test Recall (Macro)": [last(histories[n], "recall")
                                      for n in names],
        "Final Test F1 Score (Macro)": [last(histories[n], "f1")
                                        for n in names],
        "Number of Parameters": [param_counts.get(n, np.nan) for n in names],
    }
    if use_time:
        df_data["Avg Epoch Time (min)"] = [
            float(np.mean(histories[n].get("epoch_min") or [np.nan]))
            for n in names]
    df = pd.DataFrame(df_data, index=names)

    # ONE format() call: a chained second .format(dict) resets the display
    # funcs of every unlisted column back to default (verified on pandas
    # 3.x), wiping the '{:.4f}'/na_rep formatting
    fmt = {c: "{:.4f}" for c in df.columns}
    fmt["Number of Parameters"] = "{:,}"
    styled = (df.style.apply(_highlight_max, axis=0)
              .format(fmt, na_rep="N/A"))
    if out_dir:
        os.makedirs(out_dir, exist_ok=True)
        df.to_csv(os.path.join(out_dir, "experiment_results.csv"),
                  index=True, index_label="Model Name")
        with open(os.path.join(out_dir, "experiment_results.html"),
                  "w") as f:
            f.write(styled.to_html())
    return styled
