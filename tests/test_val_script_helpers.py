"""Unit tests for the val-sweep helpers in scripts/smc_bop_val.py.

_quantize_steps feeds the persistent-XLA-cache strategy (equal-parameter
runs across scenes must produce identical step counts -> identical
programs); tuned_parameters implements the per-(dataset, sampler)
operating-point lookup (each sampler compared at ITS OWN synthcad-train
optimum — parity with the reference's per-dataset tuning,
/root/reference/scripts/smc_mh_hyperopt.jl:182-204).
"""

import csv
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT / "scripts"))

from smc_bop_val import (  # noqa: E402
    CAD_TUNED,
    TUNED_PARAMETERS,
    _quantize_steps,
    tuned_parameters,
)


def test_quantize_steps_floors_onto_coarse_grid():
    # below 64 every step matters (short budgets): identity
    for n in (1, 13, 63):
        assert _quantize_steps(n) == n
    for n in (64, 100, 480, 481, 511, 512, 1000, 3841, 50_000):
        q = _quantize_steps(n)
        # flooring: never exceeds the calibrated count (budget safety)
        assert q <= n
        # granularity: losing at most ~6.25% of the budgeted steps
        assert q > n * (1 - 1 / 16) - 1, (n, q)
    # equal inputs across scenes -> equal programs (the cache property)
    assert _quantize_steps(480) == _quantize_steps(481) == 480


def test_tuned_parameters_precedence():
    # exact (dataset, sampler) match wins
    assert tuned_parameters("synthcad", "mh_sampler") is CAD_TUNED
    # dataset fallback
    assert tuned_parameters("synthcad", "some_new_sampler") is CAD_TUNED
    assert tuned_parameters("synth", "smc_mh") is TUNED_PARAMETERS
    # unknown dataset -> global default
    assert tuned_parameters("tless", "smc_mh") is TUNED_PARAMETERS


def test_checked_in_recall_csv_cis_contain_recall():
    """The committed sampler_recall.csv rows must be internally consistent:
    Wilson interval contains the point recall (regression for the
    negative-error-bar bug caught on the real TPU in round 4)."""
    path = ROOT / "data/exp_pro/smc_bop_cad/sampler_recall.csv"
    rows = list(csv.DictReader(open(path)))
    assert rows
    for r in rows:
        for metric in ("adds", "vsd"):
            lo = float(r[f"{metric}_ci_lo"])
            hi = float(r[f"{metric}_ci_hi"])
            rec = float(r[f"{metric}_recall"])
            assert lo <= rec <= hi, (r["sampler"], metric, lo, rec, hi)
        assert int(r["n_gt"]) > 0
