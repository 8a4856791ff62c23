"""Render the convergence-parity curves (results/convergence/curves_*.json)
as a committed PNG.  Follows the dataviz method: two series in fixed
categorical order (reference=slot-1 blue #2a78d6, convkan_tpu=slot-2
orange #eb6834 — the validated default palette), one axis per panel,
thin 2px lines, direct labels, recessive grid, no color-alone identity
(linestyle differs too)."""

import json
import os

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt

HERE = os.path.dirname(os.path.abspath(__file__))
OUT = os.path.join(HERE, "..", "..", "results", "convergence")
BLUE, ORANGE = "#2a78d6", "#eb6834"
INK, MUTED = "#333333", "#888888"


def main():
    files = sorted(f for f in os.listdir(OUT)
                   if f.startswith("curves_") and f.endswith(".json"))
    fig, axes = plt.subplots(len(files), 2,
                             figsize=(9, 3.2 * len(files)), squeeze=False)
    for r, fname in enumerate(files):
        d = json.load(open(os.path.join(OUT, fname)))
        epochs = list(range(1, d["epochs"] + 1))
        # left series label from the wall_s key (the island file's left
        # series is our exact-f32 run, not the torch reference)
        ref_key = [k for k in d.get("wall_s", {}) if k != "convkan_tpu"]
        ref_label = (ref_key[0].replace("_", " ") if ref_key
                     else "reference (torch)")
        tag = fname[len("curves_"):-len(".json")]
        for c, (key, title) in enumerate(
                (("accuracy", "test accuracy"),
                 ("train_loss", "train loss"))):
            ax = axes[r][c]
            for src, color, ls, label in (
                    ("reference", BLUE, "-", ref_label),
                    ("convkan_tpu", ORANGE, "--", "convkan_tpu")):
                ys = d[src][key][:len(epochs)]
                ax.plot(epochs[:len(ys)], ys, color=color, ls=ls, lw=2,
                        label=label)
                ax.annotate(f"{ys[-1]:.3f}", (len(ys), ys[-1]),
                            textcoords="offset points", xytext=(4, 0),
                            color=color, fontsize=8, va="center")
            ax.set_title(f"{tag} — {title}", fontsize=10, color=INK)
            ax.set_xlabel("epoch", fontsize=9, color=MUTED)
            ax.grid(True, color="#eeeeee", lw=0.6)
            for s in ("top", "right"):
                ax.spines[s].set_visible(False)
            for s in ("left", "bottom"):
                ax.spines[s].set_color("#cccccc")
            ax.tick_params(colors=MUTED, labelsize=8)
            ax.margins(x=0.02)
        axes[r][0].legend(frameon=False, fontsize=8, loc="best")
    fig.suptitle("Epoch-scale convergence parity: reference harness vs "
                 "convkan_tpu\n(identical init weights, recipe, and "
                 "procedural CIFAR-scale data)", fontsize=11, color=INK)
    fig.tight_layout(rect=(0, 0, 1, 0.92))
    path = os.path.join(OUT, "curves.png")
    fig.savefig(path, dpi=140)
    print("wrote", path)


if __name__ == "__main__":
    main()
