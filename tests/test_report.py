"""Report-surface tests (evaluations.py:253-400 parity): ROC curves/AUC,
the all-models ROC figure, and the styled results table."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from convkan_tpu.train.plots import (predict_probs, results_table,
                                     roc_all_models, roc_one_vs_rest)


def _fake_probs(n=200, c=4, seed=0):
    rs = np.random.RandomState(seed)
    targets = rs.randint(0, c, n)
    logits = rs.randn(n, c) + 2.0 * np.eye(c)[targets]
    probs = np.exp(logits) / np.exp(logits).sum(1, keepdims=True)
    return probs, targets


def test_roc_auc_matches_sklearn():
    """Trapezoidal one-vs-rest AUC == sklearn's (the reference's metric
    backend, evaluations.py:385-391)."""
    from sklearn.metrics import roc_auc_score

    probs, targets = _fake_probs()
    names = [f"c{i}" for i in range(probs.shape[1])]
    aucs = roc_one_vs_rest(probs, targets, names)
    for c, name in enumerate(names):
        ref = roc_auc_score(targets == c, probs[:, c])
        np.testing.assert_allclose(aucs[name], ref, atol=1e-9)


def test_roc_all_models_figure(tmp_path):
    """plot_roc_one_vs_rest_all_models parity: one stacked subplot per
    model, single figure (evaluations.py:342-355)."""
    out = str(tmp_path / "roc.png")
    sets = {"m1": _fake_probs(seed=0), "m2": _fake_probs(seed=1)}
    aucs = roc_all_models(sets, [f"c{i}" for i in range(4)], out)
    assert os.path.exists(out) and os.path.getsize(out) > 0
    assert set(aucs) == {"m1", "m2"}
    assert all(0.5 < a <= 1.0 for m in aucs.values() for a in m.values())


def test_results_table_styled(tmp_path):
    """Reference results DataFrame (evaluations.py:318-338): exact column
    schema, 'Model Name' index label, bold-max styling, ',' params
    format."""
    histories = {
        "A": {"accuracy": [0.5, 0.9], "precision": [0.8], "recall": [0.7],
              "f1": [0.75], "epoch_min": [1.0, 2.0]},
        "B": {"accuracy": [0.4, 0.6], "precision": [0.5], "recall": [0.6],
              "f1": [0.55], "epoch_min": [2.0]},
    }
    styled = results_table(histories, {"A": 12345, "B": 999},
                           out_dir=str(tmp_path), use_time=True)

    csv_path = tmp_path / "experiment_results.csv"
    head = csv_path.read_text().splitlines()[0]
    assert head == ("Model Name,Final Test Accuracy,"
                    "Final Test Precision (Macro),"
                    "Final Test Recall (Macro),Final Test F1 Score (Macro),"
                    "Number of Parameters,Avg Epoch Time (min)")

    html = (tmp_path / "experiment_results.html").read_text()
    assert "font-weight: bold" in html
    assert "12,345" in html  # '{:,}' parameter format
    assert "0.9000" in html  # '{:.4f}' metric format
    # bold-max lands on A's accuracy (0.9 > 0.6)
    ctx = styled._compute().ctx
    assert ("font-weight", " bold") in ctx[(0, 0)] or \
           ("font-weight", "bold") in ctx[(0, 0)]
    assert ctx.get((1, 0), []) == []


def test_predict_probs_matches_direct_forward():
    """predict_probs equals softmax(model.apply) on the same rows and pads
    nothing into the output."""
    from convkan_tpu.factory.mlp_factory import MLP_KAN_FACTORY
    from convkan_tpu.train.data import ArrayDataset, normalize_batch
    from convkan_tpu.train.state import create_train_state

    rs = np.random.RandomState(0)
    images = rs.randint(0, 256, (10, 8, 8, 1), dtype=np.uint8)
    labels = rs.randint(0, 3, 10).astype(np.int32)
    ds = ArrayDataset(images, labels, num_classes=3, augment=False)

    model = MLP_KAN_FACTORY["KAN"]([64, 8, 3])
    state = create_train_state(model, jax.random.PRNGKey(0),
                               jnp.zeros((4, 8, 8, 1), jnp.float32),
                               steps_per_epoch=2)
    probs, targets = predict_probs(model, state, ds, "MNIST", batch_size=4)
    assert probs.shape == (10, 3) and targets.shape == (10,)
    np.testing.assert_allclose(probs.sum(1), 1.0, atol=1e-5)
    np.testing.assert_array_equal(targets, labels)

    x = normalize_batch(jnp.asarray(images[:4]), "MNIST")
    variables = {"params": state.params}
    if state.batch_stats:
        variables["batch_stats"] = state.batch_stats
    direct = jax.nn.softmax(model.apply(variables, x, train=False), axis=-1)
    np.testing.assert_allclose(probs[:4], np.asarray(direct), atol=1e-6)


def test_report_cli_aggregates_runs(tmp_path, capsys):
    """python -m convkan_tpu.report: run records from several training runs
    aggregate into the reference's multi-model comparison artifacts
    (final_plots + results table + all-models ROC, evaluations.py:263-400)."""
    from convkan_tpu.report import build_report, main, save_run_record

    classes = [f"c{i}" for i in range(4)]
    for i, name in enumerate(["VGGKAN_A", "AlexNetKAN_B"]):
        probs, targets = _fake_probs(seed=i)
        history = {"train_loss": [1.0, 0.5], "test_loss": [1.1, 0.6],
                   "accuracy": [0.4, 0.6 + 0.1 * i], "precision": [0.5],
                   "recall": [0.5], "f1": [0.5], "epoch_min": [1.0]}
        save_run_record(str(tmp_path), name, history, 1000 * (i + 1),
                        probs, targets, classes, "CIFAR10")

    info = main(["--results_dir", str(tmp_path)])
    assert set(info["models"]) == {"VGGKAN_A", "AlexNetKAN_B"}
    assert set(info["aucs"]) == {"VGGKAN_A", "AlexNetKAN_B"}
    out = capsys.readouterr().out
    assert "compared 2 model(s)" in out

    csv = (tmp_path / "experiment_results.csv").read_text().splitlines()
    assert len(csv) == 3  # header + one row per model
    assert any(line.startswith("VGGKAN_A,") for line in csv)
    assert any(line.startswith("AlexNetKAN_B,") for line in csv)
    for f in ("loss_curves.png", "params_vs_accuracy.png",
              "roc_curves.png", "experiment_results.html"):
        assert (tmp_path / f).stat().st_size > 0

    # records from a different dataset (different class set) are rejected
    save_run_record(str(tmp_path), "MNISTKAN_C", history, 10,
                    *_fake_probs(seed=2), ["d0", "d1", "d2", "d3"], "MNIST")
    with pytest.raises(ValueError, match="same dataset"):
        build_report(str(tmp_path))

    # and an empty directory fails loudly with the workflow hint
    with pytest.raises(FileNotFoundError, match="train at"):
        build_report(str(tmp_path / "nowhere"))
