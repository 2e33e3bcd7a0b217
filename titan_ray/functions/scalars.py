"""Scalar functions re-implemented from the reference (SURVEY.md §2.9)."""

from __future__ import annotations

import numpy as np


def boxcox(x: np.ndarray, lam: float = 0.5) -> np.ndarray:
    """Box-Cox transform: log(x) if λ==0 else (x^λ − 1)/λ
    (reference: functions/misc/statistics_util.r:101-107; default λ=0.5,
    argparser_data_misc.r:12-14). Used optionally to symmetrize the score
    distribution before the buddy/SCT z tests."""
    x = np.asarray(x, dtype=np.float64)
    if lam == 0.0:
        return np.log(x)
    return (np.power(x, lam) - 1.0) / lam


def lapse_adjust(val: np.ndarray, z: np.ndarray, gamma: float = -0.0065, z_ref: float = 0.0) -> np.ndarray:
    """Lapse-rate adjustment val + gamma*(z - z_ref) (reference:
    argparser_data_misc.r:17-20; applied at ccrrt.r:91, fgt.r:262-264,
    statSpat_mapply:68). Transcript recast: adjust an expected score by a
    covariate (e.g. turn length) before comparing."""
    return np.asarray(val, dtype=np.float64) + gamma * (np.asarray(z, dtype=np.float64) - z_ref)


def metrics_from_cells(a: float, b: float, c: float, d: float) -> dict[str, float]:
    """ACC / POD / POFA / ETS / precision / recall / F1 from the (a,b,c,d)
    contingency cells (reference: test/test_titan_ta_sct.r:10-18) — the one
    formula implementation; callers supply cells however they aggregate
    them (driver-side booleans here, distributed Sum in __ray_entry__)."""
    n = a + b + c + d
    a_random = (a + b) * (a + c) / n if n else 0.0
    denom_ets = a + b + c - a_random
    return {
        "acc": (a + d) / n if n else 0.0,
        "pod": a / (a + c) if a + c else 0.0,
        "pofa": b / (a + b) if a + b else 0.0,
        "ets": (a - a_random) / denom_ets if denom_ets else 0.0,
        "precision": a / (a + b) if a + b else 0.0,
        "recall": a / (a + c) if a + c else 0.0,
        "f1": 2 * a / (2 * a + b + c) if 2 * a + b + c else 0.0,
    }


def contingency_metrics(pred_bad: np.ndarray, truth_bad: np.ndarray) -> dict[str, float]:
    """metrics_from_cells over boolean prediction/truth vectors."""
    pred_bad = np.asarray(pred_bad, dtype=bool)
    truth_bad = np.asarray(truth_bad, dtype=bool)
    return metrics_from_cells(
        float(np.sum(pred_bad & truth_bad)),
        float(np.sum(pred_bad & ~truth_bad)),
        float(np.sum(~pred_bad & truth_bad)),
        float(np.sum(~pred_bad & ~truth_bad)),
    )
