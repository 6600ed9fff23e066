#!/usr/bin/env python
"""Far-extrapolation surrogate evaluation at Re = 7500 / 10000 (VERDICT r2
missing #3): the reference evaluated CNN_Eight at double the sweep's top
Reynolds number (``CNNEight_384/CNN8_predict_Re10000.png``,
``CNN_predict.py:116-265``); this drives cnn_nine / cnn_ten the same way —
CNN prediction vs a *fresh* LBM solution (dataset physics: SRT + Smagorinsky,
384², u_lid 0.08, 3M-step budget), side-by-side streamline/centerline
figures + metrics.

LBM fields are cached to .npz per Re, so re-runs only pay CNN inference.

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python scripts/predict_extrapolate.py \
        [--re 7500,10000] [--models cnn_nine,cnn_ten]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from latticeboltzmannsimulations_tpu.config import SimConfig  # noqa: E402
from latticeboltzmannsimulations_tpu.ml import datagen, predict, train as tr  # noqa: E402
from latticeboltzmannsimulations_tpu.ml.models import PRESETS  # noqa: E402

WEIGHT_DIRS = {
    "cnn_nine": "docs/artifacts/ml_full/cnn_nine",
    "cnn_ten": "docs/artifacts/ml_full_b/cnn_ten",
    "cnn_eight": "docs/artifacts/ml_full/cnn_eight",
}


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--re", default="7500,10000")
    ap.add_argument("--models", default="cnn_nine,cnn_ten")
    ap.add_argument("--data", default=None)
    ap.add_argument("--out", default=None)
    ap.add_argument("--max-steps", type=int, default=3_000_000)
    ap.add_argument("--report-interval", type=int, default=20_000)
    args = ap.parse_args()

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    data_dir = args.data or os.path.join(root, "data", "ml_full")
    out_dir = args.out or os.path.join(root, "docs", "artifacts",
                                       "extrapolation")
    os.makedirs(out_dir, exist_ok=True)
    t_start = time.time()

    def log(msg):
        print(f"[{time.time() - t_start:8.1f}s] {msg}", flush=True)

    ds = datagen.load_dataset(data_dir)
    meta_path = os.path.join(data_dir, "metadata.json")
    meta = json.load(open(meta_path)) if os.path.exists(meta_path) else {}
    u_lid = meta.get("u_lid", 0.08)
    g = ds.feq_initial.shape[1]
    res_list = [float(r) for r in args.re.split(",") if r]

    # Fresh LBM truths (cached; dataset physics, full 3M budget).
    lbm = {}
    for re in res_list:
        cache = os.path.join(out_dir, f"lbm_re{re:g}.npz")
        if os.path.exists(cache):
            lbm[re] = np.load(cache)["u"]
            log(f"LBM Re={re:g}: cached")
            continue
        cfg = SimConfig(nx=g, ny=g, reynolds=re, collision="srt",
                        turbulence="smagorinsky", precision="float32",
                        max_steps=args.max_steps,
                        report_interval=args.report_interval,
                        convergence_tol=1e-7, u_lid=u_lid).validate()
        t0 = time.time()
        u = predict.lbm_reference(cfg)
        np.savez_compressed(cache, u=u, re=re)
        lbm[re] = u
        log(f"LBM Re={re:g}: solved in {time.time() - t0:.0f}s")

    summary_path = os.path.join(out_dir, "summary.json")
    summary = (json.load(open(summary_path))
               if os.path.exists(summary_path) else {})

    for name in [m for m in args.models.split(",") if m]:
        wdir = os.path.join(root, WEIGHT_DIRS[name])
        data = tr.prepare_inputs(ds, PRESETS[name], u_lid=u_lid)
        px, w_meta = tr.load_weights(name, "x", wdir, (data.fnet, data.aux))
        py, _ = tr.load_weights(name, "y", wdir, (data.fnet, data.aux))
        scalers = w_meta.get("scalers", data.scalers)
        for re in res_list:
            fnet, aux = predict.build_input(name, re, ds.feq_initial,
                                            scalers, u_lid=u_lid)
            u_cnn = predict.predict_velocity(name, px, py, fnet, aux, scalers)
            cfg = SimConfig(nx=g, ny=g, reynolds=re, collision="srt",
                            turbulence="smagorinsky", precision="float32",
                            u_lid=u_lid)
            m = predict.comparison_figure(
                cfg, lbm[re], u_cnn,
                os.path.join(out_dir, f"{name}_predict_Re{re:g}.png"))
            m = {k: (round(v, 5) if isinstance(v, float) else v)
                 for k, v in m.items()}
            summary.setdefault(name, {})[f"re{re:g}"] = m
            with open(summary_path, "w") as fh:
                json.dump(summary, fh, indent=1)
            log(f"{name} Re={re:g}: CNN-vs-LBM relL2 "
                f"{m['cnn_vs_lbm_l2']:.4f}")

    log(f"done -> {summary_path}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
