#!/usr/bin/env python
"""Controlled experiment: why does cnn_eight collapse at 384²?

Round-2 result: cnn_eight (aux-at-head-only, reference
``CNNEight_384/CNN_Eight.py:105-161``) trained at 384² plateaus at held-out
relL2 ≈ 47% / val MSE 3.9e-4 while cnn_nine / cnn_ten on the *same dataset*
reach relL2 ≈ 2.5-3% / val MSE ~3e-6 — yet the same preset at 192² (round 1)
scored centerline R² = 0.987.  This script isolates training-config vs
architecture causes with short matched runs (x component only):

  base150     lr 1e-3 Adam constant   — the round-2 recipe, shortened
  lr3e-4      lr 3e-4 Adam constant
  cosine      lr 1e-3 Adam cosine->1e-5
  plateau     lr 1e-3 Adam /5 at 50%/80%
  auxin       cnn_eight + aux-at-input (structural probe: does feeding the
              BC planes to the encoder rescue it? cnn_nine minus the
              multiscale front)
  msfront     cnn_eight + multiscale front (cnn_nine minus aux-at-input)
  g192        unchanged preset on the 2x-downsampled dataset (the round-1
              control that worked)

Each run reports final val MSE and held-out Re=5000 full-field relL2/R²;
results -> docs/artifacts/cnn_eight_diag/summary.json.

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python scripts/diagnose_cnn_eight.py \
        [--epochs 150] [--data data/ml_full]
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from latticeboltzmannsimulations_tpu.ml import datagen, predict, train as tr  # noqa: E402
from latticeboltzmannsimulations_tpu.ml.models import PRESETS  # noqa: E402
from train_full import (  # noqa: E402
    HELD_OUT, downsample, full_field_r2, split_dataset,
)

EVAL_RE = 5000.0


def run_one(tag, preset_name, data, ds, u_lid, epochs, lr,
            schedule, out_dir, log):
    t0 = time.time()
    res = tr.train(preset_name, data, component="x", epochs=epochs,
                   learning_rate=lr, optimizer="adam", schedule=schedule)
    dt = time.time() - t0
    tr.plot_history(res.history, os.path.join(out_dir, f"{tag}_loss.png"))
    # Held-out eval (x component, Re=5000 vs the stored LBM field).
    fnet, aux = predict.build_input(preset_name, EVAL_RE, ds.feq_initial,
                                    data.scalers, u_lid=u_lid)
    u_cnn = predict.predict_velocity(preset_name, res.params, res.params,
                                     fnet, aux, data.scalers)
    i = int(np.argwhere(ds.re_range == EVAL_RE)[0, 0])
    u_true = ds.u_final[i]
    rec = {
        "tag": tag, "preset": preset_name, "epochs": epochs, "lr": lr,
        "schedule": schedule or "constant",
        "val_mse": res.history["val_loss"][-1],
        "min_val_mse": float(np.min(res.history["val_loss"])),
        "r2_ux_re5000": round(full_field_r2(u_true[0], u_cnn[0]), 5),
        "rel_l2_ux_re5000": round(
            float(np.linalg.norm(u_cnn[0] - u_true[0])
                  / np.linalg.norm(u_true[0])), 5),
        "train_s": round(dt, 1),
    }
    log(f"{tag}: val {rec['val_mse']:.3e} (min {rec['min_val_mse']:.3e}) "
        f"relL2(ux)@Re5000 {rec['rel_l2_ux_re5000']:.4f} in {dt:.0f}s")
    return rec


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=150)
    ap.add_argument("--data", default=None)
    ap.add_argument("--out", default=None)
    ap.add_argument("--only", default="",
                    help="comma list of tags to run (default: all)")
    args = ap.parse_args()

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    data_dir = args.data or os.path.join(root, "data", "ml_full")
    out_dir = args.out or os.path.join(root, "docs", "artifacts",
                                       "cnn_eight_diag")
    os.makedirs(out_dir, exist_ok=True)
    t_start = time.time()

    def log(msg):
        print(f"[{time.time() - t_start:8.1f}s] {msg}", flush=True)

    ds = datagen.load_dataset(data_dir)
    meta_path = os.path.join(data_dir, "metadata.json")
    meta = json.load(open(meta_path)) if os.path.exists(meta_path) else {}
    u_lid = meta.get("u_lid", 0.08)
    train_ds, _ = split_dataset(ds, HELD_OUT)
    log(f"dataset {ds.f_final.shape}, {len(train_ds.re_range)} train cavities")

    # Structural variants (registered so make_model/train resolve them).
    PRESETS["cnn_eight_auxin"] = dataclasses.replace(
        PRESETS["cnn_eight"], name="cnn_eight_auxin", aux_bc_at_input=True)
    PRESETS["cnn_eight_ms"] = dataclasses.replace(
        PRESETS["cnn_eight"], name="cnn_eight_ms",
        multiscale_front=(2, 4, 8, 12))

    data384 = tr.prepare_inputs(train_ds, PRESETS["cnn_eight"], u_lid=u_lid)
    ep = args.epochs
    runs = [
        ("base150", "cnn_eight", data384, ds, 1e-3, None),
        ("lr3e-4", "cnn_eight", data384, ds, 3e-4, None),
        ("cosine", "cnn_eight", data384, ds, 1e-3, "cosine"),
        ("plateau", "cnn_eight", data384, ds, 1e-3, "plateau"),
        ("auxin", "cnn_eight_auxin", data384, ds, 1e-3, None),
        ("msfront", "cnn_eight_ms", data384, ds, 1e-3, None),
    ]
    only = {t for t in args.only.split(",") if t}
    recs = []
    for tag, name, data, dsx, lr, sched in runs:
        if only and tag not in only:
            continue
        recs.append(run_one(tag, name, data, dsx, u_lid, ep, lr,
                            sched, out_dir, log))
        with open(os.path.join(out_dir, "summary.json"), "w") as fh:
            json.dump({"epochs": ep, "eval_re": EVAL_RE, "runs": recs},
                      fh, indent=1)

    if not only or "g192" in only:
        ds192_full = downsample(ds, 2)
        train192 = downsample(train_ds, 2)
        data192 = tr.prepare_inputs(train192, PRESETS["cnn_eight"],
                                    u_lid=u_lid)
        recs.append(run_one("g192", "cnn_eight", data192,
                            ds192_full, u_lid, ep, 1e-3, None, out_dir, log))

    with open(os.path.join(out_dir, "summary.json"), "w") as fh:
        json.dump({"epochs": ep, "eval_re": EVAL_RE, "runs": recs},
                  fh, indent=1)
    log(f"done -> {out_dir}/summary.json")
    return 0


if __name__ == "__main__":
    sys.exit(main())
