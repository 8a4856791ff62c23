"""On-device classification metrics.

The reference computes macro precision/recall/F1 with sklearn on host
(evaluations.py:146-148), forcing a device->host sync per batch.  Here the
confusion matrix is accumulated on device inside the jitted eval step and
the macro metrics are derived from it — no per-batch syncs.
"""

from __future__ import annotations

import jax.numpy as jnp


def confusion_matrix(preds, targets, num_classes: int, weights=None):
    """(N,) int preds/targets -> (C, C) counts [true, pred].  `weights`
    (e.g. the padded-eval-batch mask, train/loop.py) weight each sample's
    contribution."""
    idx = targets * num_classes + preds
    cm = jnp.bincount(idx, weights=weights, length=num_classes * num_classes)
    return cm.reshape(num_classes, num_classes)


def macro_prf1(cm):
    """Macro precision/recall/F1 from a confusion matrix — matches
    sklearn's macro average with zero_division=0 semantics, INCLUDING
    its label set: sklearn averages only over labels observed in
    y_true or y_pred, so classes absent from both (cm row+col all zero)
    must not deflate the mean."""
    tp = jnp.diagonal(cm).astype(jnp.float32)
    pred_c = jnp.sum(cm, axis=0).astype(jnp.float32)
    true_c = jnp.sum(cm, axis=1).astype(jnp.float32)
    observed = (pred_c + true_c) > 0
    n_obs = jnp.maximum(jnp.sum(observed.astype(jnp.float32)), 1.0)
    precision = jnp.where(pred_c > 0, tp / jnp.maximum(pred_c, 1), 0.0)
    recall = jnp.where(true_c > 0, tp / jnp.maximum(true_c, 1), 0.0)
    f1 = jnp.where(precision + recall > 0,
                   2 * precision * recall / jnp.maximum(precision + recall, 1e-12),
                   0.0)
    return (jnp.sum(precision) / n_obs, jnp.sum(recall) / n_obs,
            jnp.sum(f1) / n_obs)


def accuracy_from_cm(cm):
    return jnp.sum(jnp.diagonal(cm)) / jnp.maximum(jnp.sum(cm), 1)


def cross_entropy_loss(logits, targets, label_smoothing: float = 0.0):
    """Mean CE over the batch (torch nn.CrossEntropyLoss parity).

    label_smoothing follows torch's semantics (beyond-reference, default
    off): loss = (1-ls) * NLL(target) + ls * mean_c(-log p_c)."""
    logp = logits - jnp.max(logits, axis=-1, keepdims=True)
    logp = logp - jnp.log(jnp.sum(jnp.exp(logp), axis=-1, keepdims=True))
    nll = -jnp.take_along_axis(logp, targets[:, None], axis=-1)[:, 0]
    if label_smoothing:
        smooth = -jnp.mean(logp, axis=-1)
        nll = (1.0 - label_smoothing) * nll + label_smoothing * smooth
    return jnp.mean(nll)
