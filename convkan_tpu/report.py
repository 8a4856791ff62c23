"""Cross-run comparison reports: ``python -m convkan_tpu.report``.

The reference's reporting functions take DICTS of several trained models
(`final_plots(models, …)` evaluations.py:263-338,
`plot_roc_one_vs_rest_all_models` evaluations.py:342-355) — its intended
workflow is "train N models, then compare them in one table/figure set",
driven from a notebook.  Our `train.py` trains one model per invocation
(like the reference CLI) and renders the single-model report; this module
restores the multi-model comparison as a CLI:

    python train.py --model VGGKAN  … --results_dir results
    python train.py --model AlexNetKAN … --results_dir results
    python -m convkan_tpu.report --results_dir results

Each training run persists a small *run record*
(`<results_dir>/runs/<model_name>.npz`: metric history, parameter
count, test-set softmax probabilities + targets, class names).  The report
CLI aggregates every record in a directory into the reference's comparison
artifacts: `loss_curves.png` + `params_vs_accuracy.png` (all models on
shared axes), `experiment_results.csv`/`.html` (one row per model,
per-column bold-max styling), and `roc_curves.png` (stacked one-vs-rest
ROC subplots, one per model).
"""

from __future__ import annotations

import argparse
import glob
import json
import os
from typing import Dict, Optional, Sequence, Tuple

import numpy as np

RUNS_SUBDIR = "runs"


def save_run_record(results_dir: str, model_name: str, history: dict,
                    n_params: int, probs: np.ndarray, targets: np.ndarray,
                    classes: Sequence[str], dataset: str) -> str:
    """Persist one training run's report inputs (overwrites any previous
    record for the same model name — latest run wins).  Returns the path."""
    runs_dir = os.path.join(results_dir, RUNS_SUBDIR)
    os.makedirs(runs_dir, exist_ok=True)
    path = os.path.join(runs_dir, f"{model_name}.npz")
    np.savez_compressed(
        path,
        history=json.dumps(history),
        n_params=int(n_params),
        probs=np.asarray(probs, dtype=np.float32),
        targets=np.asarray(targets),
        classes=np.asarray(list(classes), dtype=np.str_),
        dataset=str(dataset),
    )
    return path


def load_run_records(results_dir: str) -> Tuple[
        Dict[str, dict], Dict[str, int], Dict[str, tuple], list]:
    """Load every run record under ``<results_dir>/runs/``.

    Returns (histories, param_counts, prob_sets, classes) shaped exactly
    for `train.plots.final_plots` / `results_table` / `roc_all_models`.
    Raises FileNotFoundError (no records) or ValueError (records from
    datasets with different class sets — not comparable on one ROC axis).
    """
    paths = sorted(glob.glob(os.path.join(results_dir, RUNS_SUBDIR,
                                          "*.npz")))
    if not paths:
        raise FileNotFoundError(
            f"no run records under {results_dir}/{RUNS_SUBDIR}/ — train at "
            f"least one model with `python train.py --results_dir …` "
            f"first (each run writes <results_dir>/runs/<model>.npz)")
    histories: Dict[str, dict] = {}
    param_counts: Dict[str, int] = {}
    prob_sets: Dict[str, tuple] = {}
    classes: Optional[list] = None
    for path in paths:
        name = os.path.splitext(os.path.basename(path))[0]
        with np.load(path, allow_pickle=False) as rec:
            histories[name] = json.loads(str(rec["history"]))
            param_counts[name] = int(rec["n_params"])
            prob_sets[name] = (rec["probs"], rec["targets"])
            rec_classes = [str(c) for c in rec["classes"]]
        if classes is None:
            classes = rec_classes
        elif classes != rec_classes:
            raise ValueError(
                f"run record {name} has classes {rec_classes[:3]}… but "
                f"earlier records have {classes[:3]}… — comparison reports "
                f"need runs from the same dataset; point --results_dir at "
                f"one dataset's results directory")
    return histories, param_counts, prob_sets, classes or []


def build_report(results_dir: str, out_dir: Optional[str] = None) -> dict:
    """Aggregate all run records into the multi-model report artifacts.
    Returns {"models": […], "out_dir": …, "aucs": {model: {class: auc}}}."""
    from .train.plots import final_plots, results_table, roc_all_models

    out_dir = out_dir or results_dir
    histories, param_counts, prob_sets, classes = \
        load_run_records(results_dir)
    os.makedirs(out_dir, exist_ok=True)
    final_plots(histories, param_counts, out_dir=out_dir)
    results_table(histories, param_counts, out_dir=out_dir, use_time=True)
    aucs = roc_all_models(prob_sets, classes,
                          os.path.join(out_dir, "roc_curves.png"))
    return {"models": list(histories), "out_dir": out_dir, "aucs": aucs}


def main(argv=None):
    p = argparse.ArgumentParser(
        prog="python -m convkan_tpu.report",
        description="Aggregate the run records of several training runs "
                    "into the reference's multi-model comparison report "
                    "(evaluations.py:263-400 surface).")
    p.add_argument("--results_dir", required=True,
                   help="a results directory containing runs/*.npz — the "
                        "--results_dir the training runs used (keep one "
                        "results dir per dataset; mixed-dataset records "
                        "are rejected)")
    p.add_argument("--out_dir", default=None,
                   help="where to write the report artifacts "
                        "(default: --results_dir)")
    args = p.parse_args(argv)
    info = build_report(args.results_dir, args.out_dir)
    print(f"compared {len(info['models'])} model(s): "
          f"{', '.join(info['models'])}")
    for f in ("experiment_results.csv", "experiment_results.html",
              "loss_curves.png", "params_vs_accuracy.png",
              "roc_curves.png"):
        print(f"  {os.path.join(info['out_dir'], f)}")
    return info


if __name__ == "__main__":
    main()
