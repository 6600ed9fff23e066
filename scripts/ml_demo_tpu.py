"""End-to-end ML pipeline demo on TPU: vmapped Re-sweep datagen at 128²,
CNN_Eight-class surrogate training, prediction vs LBM + Ghia.

A scaled-down but complete pass through BASELINE config 5
(datagen -> train -> predict); writes artifacts to docs/artifacts/ml_demo/.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from latticeboltzmannsimulations_tpu.config import SimConfig
from latticeboltzmannsimulations_tpu.ml import (
    PRESETS, generate_dataset, save_dataset,
)
from latticeboltzmannsimulations_tpu.ml import predict as ml_predict
from latticeboltzmannsimulations_tpu.ml import train as ml_train

OUT = os.path.join(os.path.dirname(__file__), "..", "docs", "artifacts", "ml_demo")


def main():
    os.makedirs(OUT, exist_ok=True)
    t0 = time.perf_counter()

    # --- datagen: 48 cavities, Re 100..5000, one vmapped batch sweep -------
    # 192^2: cnn_eight's native stride pyramid divides 192 (models.check_grid)
    cfg = SimConfig(
        nx=192, ny=192, reynolds=100.0, collision="srt",
        turbulence="smagorinsky", precision="float32",
        max_steps=120_000, report_interval=5_000,
        convergence_tol=1e-7, convergence_hits=3,
    ).validate()
    re_values = np.linspace(100.0, 5000.0, 48)
    ds = generate_dataset(cfg, re_values, batch_size=24, progress=print)
    save_dataset(ds, os.path.join(OUT, "data"))
    t1 = time.perf_counter()
    print(f"datagen: {len(re_values)} cavities in {t1 - t0:.1f}s")

    # --- train cnn_eight-class models (reduced epochs for the demo) --------
    preset = PRESETS["cnn_eight"]
    data = ml_train.prepare_inputs(ds, preset, u_lid=cfg.u_lid)
    results = {}
    for comp in ("x", "y"):
        res = ml_train.train("cnn_eight", data, component=comp,
                             epochs=500, batch_size=8, verbose=False)
        ml_train.save_weights(res, OUT, scalers=data.scalers)
        ml_train.plot_history(
            res.history, os.path.join(OUT, f"cnn_eight_{comp}_loss.png"))
        results[comp] = res
        print(f"train[{comp}]: final val MSE {res.history['val_loss'][-1]:.3e}")
    t2 = time.perf_counter()

    # --- predict at an unseen Re and compare vs LBM + Ghia -----------------
    re_test = 1000.0
    fnet, aux = ml_predict.build_input(
        "cnn_eight", re_test, ds.feq_initial, data.scalers, u_lid=cfg.u_lid)
    u_cnn = ml_predict.predict_velocity(
        "cnn_eight", results["x"].params, results["y"].params,
        fnet, aux, data.scalers)
    cfg_ref = SimConfig(nx=192, ny=192, reynolds=re_test, collision="srt",
                        turbulence="smagorinsky", precision="float32",
                        max_steps=200_000, report_interval=10_000).validate()
    u_lbm = ml_predict.lbm_reference(cfg_ref)
    metrics = ml_predict.comparison_figure(
        cfg_ref, u_lbm, u_cnn,
        os.path.join(OUT, f"cnn8_predict_Re{re_test:g}.png"))
    metrics["train_s"] = round(t2 - t1, 1)
    metrics["datagen_s"] = round(t1 - t0, 1)
    print(json.dumps(metrics))
    with open(os.path.join(OUT, "metrics.json"), "w") as fh:
        json.dump(metrics, fh, indent=2)


if __name__ == "__main__":
    main()
