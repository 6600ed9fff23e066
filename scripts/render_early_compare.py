#!/usr/bin/env python
"""Render truth-vs-prediction compare PNGs for the early-preset runs.

The reference committed a prediction figure in every per-model folder
(``CNNTwo_192/CNN2_predict.png`` ... ``CNNSeven_384/CNN7_predict.png``);
this renders the same evidence post-hoc from the weights saved by
``train_early_presets.py`` — CPU-only, one forward pass per model.

Usage: PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
       PYTHONPATH=/root/repo:$PYTHONPATH python scripts/render_early_compare.py \
       [--out docs/artifacts/ml_early_ref_budget]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402
import numpy as np  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from latticeboltzmannsimulations_tpu.ml import datagen, predict, train as tr  # noqa: E402
from train_full import downsample  # noqa: E402

EVAL_RE = 5000.0


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=None,
                    help="artifact root to scan (default docs/artifacts/ml_early)")
    args = ap.parse_args()
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    data_dir = os.path.join(root, "data", "ml_full")
    out_root = args.out or os.path.join(root, "docs", "artifacts", "ml_early")

    ds384 = datagen.load_dataset(data_dir)
    ds192 = downsample(ds384, 2)
    i_eval = int(np.argwhere(ds384.re_range == EVAL_RE)[0, 0])
    meta_path = os.path.join(data_dir, "metadata.json")
    meta = json.load(open(meta_path)) if os.path.exists(meta_path) else {}
    u_lid = meta.get("u_lid", 0.08)

    for entry in sorted(os.listdir(out_root)):
        mdir = os.path.join(out_root, entry)
        if not os.path.isdir(mdir):
            continue
        name, grid_tag = entry.rsplit("_", 1)
        ds = ds384 if grid_tag == "384" else ds192
        stem = os.path.join(mdir, f"{name}_x")
        if not os.path.exists(stem + ".msgpack"):
            print(f"  {entry}: no weights, skipping")
            continue
        scalers = json.load(open(stem + ".json")).get("scalers", {})
        fnet, aux = predict.build_input(name, EVAL_RE, ds.feq_initial,
                                        scalers, u_lid=u_lid)
        params, _ = tr.load_weights(name, "x", mdir, (fnet, aux))
        u_cnn = predict.predict_velocity(name, params, params, fnet, aux,
                                         scalers)
        ux_cnn = u_cnn[0]
        ux_true = np.asarray(ds.u_final[i_eval, 0])
        rel_l2 = float(np.linalg.norm(ux_cnn - ux_true)
                       / np.linalg.norm(ux_true))

        fig, axes = plt.subplots(1, 3, figsize=(13, 4.2), constrained_layout=True)
        vmax = float(np.abs(ux_true).max())
        for ax, field, title in (
            (axes[0], ux_true, f"LBM ux (Re={EVAL_RE:.0f}, held out)"),
            (axes[1], ux_cnn, f"{name} prediction"),
        ):
            im = ax.imshow(field.T, origin="upper", cmap="RdBu_r",
                           vmin=-vmax, vmax=vmax)
            ax.set_title(title)
            fig.colorbar(im, ax=ax, shrink=0.85)
        im = axes[2].imshow(np.abs(ux_cnn - ux_true).T, origin="upper",
                            cmap="magma")
        axes[2].set_title(f"|error|  (relL2 {rel_l2:.3f})")
        fig.colorbar(im, ax=axes[2], shrink=0.85)
        for ax in axes:
            ax.set_xticks([])
            ax.set_yticks([])
        path = os.path.join(mdir, f"{name}_predict_re{EVAL_RE:.0f}.png")
        fig.savefig(path, dpi=110)
        plt.close(fig)
        print(f"  {entry}: relL2(ux) {rel_l2:.4f} -> {path}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
