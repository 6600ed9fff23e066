"""Loss-floor evidence for the early presets at their trained budgets.

VERDICT r4 "next" #7 offers two completions for the early-preset budget
question: top the models up to the reference epoch counts
(/root/reference/CNNOne_192/CNN_One.py:103 trains 500 epochs; CNN_Six 200)
OR record whether the trained budget already reached the loss floor.  This
script computes the floor evidence from the stored per-epoch histories
(docs/artifacts/ml_early*/"<name>_x.json", written by ml.train via
train_early_presets.py) — no TPU time needed:

- ``best_epoch`` / ``epochs``: where the minimum val loss sits.  A best
  epoch well inside the run (not the last epoch) is direct floor evidence.
- ``tail_decades_per_100ep``: slope of log10(val_loss) fit over the last
  third of training.  Near 0 = flat tail; -0.5 would mean the loss still
  drops 3x per 100 epochs.
- ``projected_floor_gain_decades``: tail slope extrapolated to the
  reference budget — the most the reference's extra epochs could plausibly
  buy if the tail trend continued (an upper bound: decays flatten).

The verdict per model: ``at_floor`` if the tail is flatter than
0.1 decades/100ep or the projected gain to the reference budget is under
0.15 decades (a <1.4x loss change, smaller than seed-to-seed scatter).

Writes a ``loss_floor`` block into the artifact dir's summary.json and
prints a table.
"""
from __future__ import annotations

import json
import os
import sys

import numpy as np

# Reference epoch budgets (CNN_<X>.py model.fit epochs= in
# /root/reference/CNN<X>_192/): One/Two/Four/Five 500, Six 200, Seven 500.
REF_EPOCHS = {
    "cnn_one": 500, "cnn_two": 500, "cnn_three": 500, "cnn_four": 500,
    "cnn_five": 500, "cnn_six": 200, "cnn_seven": 500,
    "cnn_ten": 400,   # CNNTen_384/CNN_Ten.py:170 (per-component fits)
}

FLAT_SLOPE = 0.1      # decades per 100 epochs
SMALL_GAIN = 0.15     # projected decades to the reference budget


def analyze(history: dict, trained: int, ref_budget: int) -> dict:
    val = np.asarray(history.get("val_loss", history["loss"]), np.float64)
    n = len(val)
    best = int(np.argmin(val))
    tail = val[max(0, n - max(10, n // 3)):]
    # Least-squares slope of log10(val) over the tail, in decades/100ep.
    x = np.arange(len(tail), dtype=np.float64)
    y = np.log10(np.maximum(tail, 1e-300))
    slope = float(np.polyfit(x, y, 1)[0] * 100.0) if len(tail) >= 4 else 0.0
    extra = max(0, ref_budget - trained)
    projected = slope * extra / 100.0
    # A rising val-loss tail (slope > 0) means the best-val floor is already
    # behind us (early-stopping regime): more epochs cannot help.
    at_floor = (slope > 0 or abs(slope) < FLAT_SLOPE
                or abs(projected) < SMALL_GAIN)
    return {
        "epochs": trained,
        "ref_epochs": ref_budget,
        "best_epoch": best,
        "best_val_loss": float(val[best]),
        "final_val_loss": float(val[-1]),
        "tail_decades_per_100ep": round(slope, 4),
        "projected_floor_gain_decades": round(projected, 4),
        "at_floor": bool(at_floor),
    }


def _model_jsons(art_dir: str):
    """Yield (key, history-json path) for every ``cnn_*_{x,y}.json`` under
    the artifact dir's model subdirectories."""
    for sub in sorted(os.listdir(art_dir)):
        mdir = os.path.join(art_dir, sub)
        if not os.path.isdir(mdir):
            continue
        for fn in sorted(os.listdir(mdir)):
            if fn.startswith("cnn_") and fn.endswith((
                    "_x.json", "_y.json")):
                comp = fn[-6]                           # x or y
                yield (sub if comp == "x" else f"{sub}_{comp}"), \
                    os.path.join(mdir, fn)


def main(art_dir: str = "docs/artifacts/ml_early") -> int:
    summary_path = os.path.join(art_dir, "summary.json")
    with open(summary_path) as f:
        summary = json.load(f)
    out = {}
    for key, jpath in _model_jsons(art_dir):
        with open(jpath) as f:
            hist = json.load(f)["history"]
        name = os.path.basename(jpath)[:-7]   # cnn_two_x.json -> cnn_two
        trained = len(hist["loss"])
        ref = REF_EPOCHS.get(name)
        if ref is None:
            continue  # 384-class models have their own budget record
        out[key] = analyze(hist, trained, ref)
    summary["loss_floor"] = {
        "what": ("floor evidence at the trained budget vs the reference's "
                 "epoch counts; see scripts/loss_floor_report.py docstring"),
        "criteria": {"flat_tail_decades_per_100ep": FLAT_SLOPE,
                     "small_projected_gain_decades": SMALL_GAIN},
        "models": out,
    }
    with open(summary_path, "w") as f:
        json.dump(summary, f, indent=1)
    w = max(len(k) for k in out)
    print(f"{'model':<{w}}  ep/ref   best@  tail d/100ep  proj d  at_floor")
    for k, v in out.items():
        print(f"{k:<{w}}  {v['epochs']}/{v['ref_epochs']:<5} "
              f"{v['best_epoch']:>5}  {v['tail_decades_per_100ep']:>12} "
              f"{v['projected_floor_gain_decades']:>7}  {v['at_floor']}")
    return 0


if __name__ == "__main__":
    sys.exit(main(*sys.argv[1:]))
