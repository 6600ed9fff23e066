#!/usr/bin/env python
"""Resume the cnn_eight 3M-dataset retrain at the y component (the x leg
completed and saved; the y leg's TPU process wedged on the relay).  Trains
y, then runs train_full's held-out evaluation with the fresh x weights from
disk and merges the summary exactly as train_full would."""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/scripts")

from latticeboltzmannsimulations_tpu.ml import datagen, predict, train as tr  # noqa: E402
from latticeboltzmannsimulations_tpu.ml.models import PRESETS  # noqa: E402
from train_full import HELD_OUT, evaluate, split_dataset  # noqa: E402

t0 = time.time()


def log(msg):
    print(f"[{time.time() - t0:8.1f}s] {msg}", flush=True)


root = "/root/repo"
data_dir = os.path.join(root, "data", "ml_full")
out_root = os.path.join(root, "docs", "artifacts", "ml_full")
out_dir = os.path.join(out_root, "cnn_eight")
name = "cnn_eight"

ds = datagen.load_dataset(data_dir)
meta = json.load(open(os.path.join(data_dir, "metadata.json")))
u_lid = meta.get("u_lid", 0.08)
train_ds, held = split_dataset(ds, HELD_OUT)
data = tr.prepare_inputs(train_ds, PRESETS[name], u_lid=u_lid)
log(f"dataset {ds.f_final.shape}; resuming {name}/y")

res_y = tr.train(name, data, component="y", optimizer="adam", verbose=False)
tr.save_weights(res_y, out_dir, scalers=data.scalers)
tr.plot_history(res_y.history, os.path.join(out_dir, f"{name}_y_loss.png"))
log(f"{name}/y: {len(res_y.history['loss'])} epochs, final val MSE "
    f"{res_y.history['val_loss'][-1]:.3e}")

# Rebuild the results dict with the completed x leg from disk.
fnet, aux = predict.build_input(name, 5000.0, ds.feq_initial, data.scalers,
                                u_lid=u_lid)
px, meta_x = tr.load_weights(name, "x", out_dir, (fnet, aux))


class _Loaded:
    def __init__(self, params, history):
        self.params = params
        self.history = history


results = {"x": _Loaded(px, meta_x["history"]), "y": res_y}
recs = evaluate(name, results, data, ds, held, u_lid, out_dir, log)

summary_file = os.path.join(out_root, "summary.json")
summary = json.load(open(summary_file))
summary["models"][name] = {
    "epochs": {c: len(results[c].history["loss"]) for c in results},
    "lr": 1e-3, "schedule": "constant",
    "final_val_mse": {c: results[c].history["val_loss"][-1] for c in results},
    "held_out_eval": recs,
}
with open(summary_file, "w") as fh:
    json.dump(summary, fh, indent=1)
log("summary merged")
