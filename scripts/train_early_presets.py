#!/usr/bin/env python
"""Train the early-generation CNN presets M2-M7 (VERDICT r2 missing #1).

The reference trained and committed results for every model variant
(``CNNTwo_192/CNN_Two.py:104-118`` ... ``CNNSeven_384/CNN_Seven.py:103-119``);
after round 2, cnn_two..cnn_seven existed here only as presets with
forward-shape tests.  Sanity scale per VERDICT: the 2x-downsampled 192²
dataset, ~120 epochs, x component (cnn_seven additionally at its native
384²), Adam override (TPU 384²: optax RMSprop stalls at the mean predictor,
see ml/train.py).

Each run records the loss descent + held-out Re=5000 full-field metrics ->
docs/artifacts/ml_early/summary.json and per-model weights/loss plots.

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python scripts/train_early_presets.py \
        [--epochs 120] [--models cnn_two,...,cnn_seven]
"""

from __future__ import annotations

import argparse
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


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=120)
    ap.add_argument("--models",
                    default="cnn_two,cnn_three,cnn_four,cnn_five,cnn_six,"
                            "cnn_seven")
    ap.add_argument("--seven-384-epochs", type=int, default=60,
                    help="extra cnn_seven run at native 384² (0 disables)")
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--optimizer", default="adam",
                    choices=["adam", "rmsprop"])
    ap.add_argument("--schedule", default=None,
                    choices=["cosine", "plateau", "inverse"])
    ap.add_argument("--clip-norm", type=float, default=None,
                    help="global-norm gradient clipping (stabilises "
                         "raw-scaled presets that diverge at lr 1e-3)")
    ap.add_argument("--kernel-init", default="lecun_normal",
                    choices=["lecun_normal", "glorot_uniform"],
                    help="glorot_uniform = Keras 2.x Conv/ConvTranspose "
                         "default (the r5 init-controlled retry)")
    ap.add_argument("--data", default=None)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    data_dir = args.data or os.path.join(root, "data", "ml_full")
    out_root = args.out or os.path.join(root, "docs", "artifacts", "ml_early")
    os.makedirs(out_root, exist_ok=True)
    t_start = time.time()

    def log(msg):
        print(f"[{time.time() - t_start:8.1f}s] {msg}", flush=True)

    ds = datagen.load_dataset(data_dir)
    meta_path = os.path.join(data_dir, "metadata.json")
    meta = json.load(open(meta_path)) if os.path.exists(meta_path) else {}
    u_lid = meta.get("u_lid", 0.08)
    train_ds, _ = split_dataset(ds, HELD_OUT)
    ds192 = downsample(ds, 2)
    train192 = downsample(train_ds, 2)
    log(f"dataset {ds.f_final.shape}; training M2-M7 on 192² downsample")

    summary_path = os.path.join(out_root, "summary.json")
    summary = (json.load(open(summary_path))
               if os.path.exists(summary_path) else {"models": {}})

    def run(name, data, eval_ds, grid_tag, epochs):
        out_dir = os.path.join(out_root, f"{name}_{grid_tag}")
        os.makedirs(out_dir, exist_ok=True)
        t0 = time.time()
        res = tr.train(name, data, component="x", epochs=epochs,
                       optimizer=args.optimizer, learning_rate=args.lr,
                       schedule=args.schedule, clip_norm=args.clip_norm,
                       kernel_init=args.kernel_init,
                       checkpoint_path=os.path.join(out_dir, f"{name}_x.ckpt"),
                       checkpoint_every=25)
        dt = time.time() - t0
        tr.save_weights(res, out_dir, scalers=data.scalers)
        tr.plot_history(res.history,
                        os.path.join(out_dir, f"{name}_x_loss.png"))
        # Partial datasets (budget-cut sweeps assembled with
        # --assemble-partial) may lack Re=5000 exactly, and a quarantined
        # (zero-filled) slot must never be the "truth" (rel_l2 would divide
        # by ||0||): evaluate at the nearest non-quarantined Re.
        ok = (np.ones(len(eval_ds.re_range), bool) if eval_ds.failed is None
              else ~eval_ds.failed)
        cand = np.where(ok)[0]
        if not len(cand):
            raise RuntimeError("all eval slots quarantined in this dataset")
        i = int(cand[np.argmin(np.abs(eval_ds.re_range[cand] - EVAL_RE))])
        eval_re = float(eval_ds.re_range[i])
        fnet, aux = predict.build_input(name, eval_re, eval_ds.feq_initial,
                                        data.scalers, u_lid=u_lid)
        u_cnn = predict.predict_velocity(name, res.params, res.params,
                                         fnet, aux, data.scalers)
        u_true = eval_ds.u_final[i]
        h = res.history
        rec = {
            "epochs": epochs, "grid": data.fnet.shape[1],
            "first_loss": h["loss"][0], "final_loss": h["loss"][-1],
            "final_val_mse": h["val_loss"][-1],
            "eval_re": eval_re,
            "r2_ux_re5000": round(full_field_r2(u_true[0], u_cnn[0]), 5),
            "rel_l2_ux_re5000": round(
                float(np.linalg.norm(u_cnn[0] - u_true[0])
                      / np.linalg.norm(u_true[0])), 5),
            "train_s": round(dt, 1),
            "lr": args.lr,
            "optimizer": args.optimizer,
            **({"kernel_init": args.kernel_init}
               if args.kernel_init != "lecun_normal" else {}),
            **({"schedule": args.schedule} if args.schedule else {}),
            **({"clip_norm": args.clip_norm}
               if args.clip_norm is not None else {}),
        }
        summary["models"][f"{name}_{grid_tag}"] = rec
        with open(summary_path, "w") as fh:
            json.dump(summary, fh, indent=1)
        log(f"{name}@{grid_tag}: loss {h['loss'][0]:.3e} -> "
            f"{h['loss'][-1]:.3e}, val {h['val_loss'][-1]:.3e}, "
            f"relL2(ux)@Re5000 {rec['rel_l2_ux_re5000']:.4f} in {dt:.0f}s")

    for name in [m for m in args.models.split(",") if m]:
        data = tr.prepare_inputs(train192, PRESETS[name], u_lid=u_lid)
        run(name, data, ds192, "192", args.epochs)

    if args.seven_384_epochs and "cnn_seven" in args.models:
        data = tr.prepare_inputs(train_ds, PRESETS["cnn_seven"], u_lid=u_lid)
        run("cnn_seven", data, ds, "384", args.seven_384_epochs)

    log(f"done -> {summary_path}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
