"""Unit pins for scripts/loss_floor_report.analyze.

The r5 loss-floor verdicts (which early presets get topped up to the
reference's 500-epoch budgets, VERDICT r4 next #7) hang off this analyzer,
so its three regimes are pinned on synthetic histories:

- a val-loss tail still descending steeply  -> NOT at floor (top-up target)
- a flat tail                               -> at floor
- a rising tail past the best epoch         -> at floor (early-stopping
  regime: more epochs cannot recover a val curve already past its minimum)
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))

from loss_floor_report import analyze  # noqa: E402


def _hist(val):
    return {"loss": list(val), "val_loss": list(val)}


def test_descending_tail_is_not_at_floor():
    # 1 decade per 100 epochs, still falling at epoch 120 of a 500 budget.
    val = 10.0 ** (-1.0 - np.arange(120) / 100.0)
    rec = analyze(_hist(val), 120, 500)
    assert not rec["at_floor"]
    assert rec["tail_decades_per_100ep"] < -0.5
    # Projection covers the remaining 380 epochs of the reference budget.
    assert rec["projected_floor_gain_decades"] < -1.0
    assert rec["best_epoch"] == 119


def test_flat_tail_is_at_floor():
    rng = np.random.default_rng(0)
    val = 1e-5 * (1.0 + 0.02 * rng.standard_normal(120))
    rec = analyze(_hist(val), 120, 500)
    assert rec["at_floor"]
    assert abs(rec["tail_decades_per_100ep"]) < 0.1


def test_rising_tail_is_at_floor():
    # Best val at epoch ~60, then overfitting: slope > 0 => at floor.
    ep = np.arange(120)
    val = 1e-4 * (1.0 + ((ep - 60) / 60.0) ** 2)
    rec = analyze(_hist(val), 120, 500)
    assert rec["at_floor"]
    assert rec["tail_decades_per_100ep"] > 0
    assert rec["best_epoch"] == 60


def test_full_budget_run_is_at_floor_by_zero_projection():
    # Trained to the reference budget already: nothing left to project.
    val = 10.0 ** (-1.0 - np.arange(500) / 100.0)
    rec = analyze(_hist(val), 500, 500)
    assert rec["at_floor"]
    assert rec["projected_floor_gain_decades"] == 0.0
