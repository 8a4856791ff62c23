"""Assemble the convergence-parity artifact: reference vs convkan_tpu
per-epoch curves for each family, written as results/convergence/
curves_<family><tag>.json + a markdown summary.

Round-4 usage (no args) keeps the original saturated-regime pairs.
Round-5 (VERDICT r4 #5/#6) usage passes pairs + a tag + a dataset note:

    python compare.py --tag _hard --note "<dataset/recipe line>" \
        FastKAN:/tmp/ref_dir:/tmp/tpu_dir WavKAN:/tmp/...:/tmp/...

A pair may also compare two of OUR runs (e.g. exact vs --bf16_island):
label the 'reference' dir accordingly in --ref_label.
"""

import argparse
import json
import os

DEFAULT_PAIRS = {
    "ChebyKAN": ("/tmp/convergence_ref", "/tmp/convergence_tpu_cheby"),
    "FastKAN": ("/tmp/convergence_ref_fastkan",
                "/tmp/convergence_tpu_fastkan"),
}
OUT = os.path.join(os.path.dirname(__file__), "..", "..", "results",
                   "convergence")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("pairs", nargs="*",
                    help="family:ref_dir:tpu_dir triples")
    ap.add_argument("--tag", default="")
    ap.add_argument("--note", default="")
    ap.add_argument("--ref_label", default="reference_torch_cpu")
    ap.add_argument("--summary", default=None,
                    help="summary filename (default SUMMARY<tag>.md)")
    args = ap.parse_args()

    pairs = (dict((p.split(":")[0], tuple(p.split(":")[1:]))
                  for p in args.pairs)
             if args.pairs else DEFAULT_PAIRS)

    os.makedirs(OUT, exist_ok=True)
    rows = []
    for family, (ref_dir, tpu_dir) in pairs.items():
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
            "wall_s": {args.ref_label: round(ref["wall_s"], 1),
                       "convkan_tpu": round(tpu["wall_s"], 1)},
        }
        if args.note:
            merged["dataset_note"] = args.note
        with open(os.path.join(OUT, f"curves_{family}{args.tag}.json"),
                  "w") as f:
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
        name = args.summary or f"SUMMARY{args.tag}.md"
        with open(os.path.join(OUT, name), "w") as f:
            f.write(f"# Epoch-scale convergence parity ({name})\n\n")
            if args.note:
                f.write(args.note + "\n\n")
            else:
                f.write("Same procedural CIFAR-10-scale dataset "
                        "(tools/convergence/gen_data.py), same initial "
                        "weights (reference init_state.pt migrated via "
                        "convert_vggkan), same recipe (VGG16_small, AdamW "
                        "1e-3/wd 1e-3, ExpLR 0.8, batch 128, crop+flip "
                        "aug), 10 epochs.\n\n")
            f.write(f"| family | {args.ref_label} final acc | tpu final "
                    "acc | max per-epoch acc gap | ref wall | tpu wall "
                    "|\n|---|---|---|---|---|---|\n")
            for r in rows:
                f.write(f"| {r[0]} | {r[1]:.4f} | {r[2]:.4f} | {r[3]:.4f}"
                        f" | {r[4]:.0f}s | {r[5]:.0f}s |\n")
        print("wrote", os.path.join(OUT, name))


if __name__ == "__main__":
    main()
