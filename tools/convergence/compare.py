"""Assemble the convergence-parity artifact: reference vs convkan_tpu
per-epoch curves for each family, written as results/convergence/
curves_<family>.json + a markdown summary."""

import json
import os
import sys

PAIRS = {
    "ChebyKAN": ("/tmp/convergence_ref", "/tmp/convergence_tpu_cheby"),
    "FastKAN": ("/tmp/convergence_ref_fastkan", "/tmp/convergence_tpu_fastkan"),
}
OUT = os.path.join(os.path.dirname(__file__), "..", "..", "results",
                   "convergence")


def main():
    os.makedirs(OUT, exist_ok=True)
    rows = []
    for family, (ref_dir, tpu_dir) in PAIRS.items():
        ref_p = os.path.join(ref_dir, "curves.json")
        tpu_p = os.path.join(tpu_dir, "curves.json")
        if not (os.path.exists(ref_p) and os.path.exists(tpu_p)):
            print(f"skip {family}: missing {ref_p} or {tpu_p}")
            continue
        ref = json.load(open(ref_p))
        tpu = json.load(open(tpu_p))
        merged = {
            "family": family,
            "epochs": ref["epochs"],
            "reference": {k: ref[k] for k in
                          ("train_loss", "test_loss", "accuracy", "lr")},
            "convkan_tpu": {k: tpu[k] for k in
                            ("train_loss", "test_loss", "accuracy", "lr")},
            "wall_s": {"reference_torch_cpu": round(ref["wall_s"], 1),
                       "convkan_tpu": round(tpu["wall_s"], 1)},
        }
        with open(os.path.join(OUT, f"curves_{family}.json"), "w") as f:
            json.dump(merged, f, indent=1)
        n = min(len(ref["accuracy"]), len(tpu["accuracy"]))
        gaps = [abs(ref["accuracy"][i] - tpu["accuracy"][i])
                for i in range(n)]
        rows.append((family, ref["accuracy"][-1], tpu["accuracy"][-1],
                     max(gaps), ref["wall_s"], tpu["wall_s"]))
        print(f"{family}: ref acc {ref['accuracy']}\n"
              f"          tpu acc {tpu['accuracy']}\n"
              f"          max epoch gap {max(gaps):.4f}")
    if rows:
        with open(os.path.join(OUT, "SUMMARY.md"), "w") as f:
            f.write("# Epoch-scale convergence parity (round 4)\n\n"
                    "Same procedural CIFAR-10-scale dataset (50k/10k, "
                    "tools/convergence/gen_data.py — zero-egress host, "
                    "see that file), same initial weights (reference "
                    "init_state.pt migrated via convert_vggkan), same "
                    "recipe (VGG16_small, AdamW 1e-3/wd 1e-3, ExpLR 0.8, "
                    "batch 128, crop+flip aug), 10 epochs.\n\n"
                    "| family | ref final acc | tpu final acc | max "
                    "per-epoch acc gap | ref wall (torch-CPU) | tpu wall "
                    "|\n|---|---|---|---|---|---|\n")
            for r in rows:
                f.write(f"| {r[0]} | {r[1]:.4f} | {r[2]:.4f} | {r[3]:.4f}"
                        f" | {r[4]:.0f}s | {r[5]:.0f}s |\n")
        print("wrote", os.path.join(OUT, "SUMMARY.md"))


if __name__ == "__main__":
    main()
