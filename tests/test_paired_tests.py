"""Paired McNemar analysis script (scripts/paired_tests.py).

The exact two-sided binomial is the statistical core — check it against
hand-computed pmf sums — and the loader must reproduce the committed
headline CSV from the checked-in error artifacts (consistency gate for
the README's paired-test claims).
"""

import csv
import sys
from pathlib import Path

import numpy as np
import pytest

ROOT = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT / "scripts"))

from paired_tests import binom_two_sided, load_correct  # noqa: E402


@pytest.mark.parametrize(
    "k,n,expected",
    [
        (0, 0, 1.0),
        (0, 5, 2 * (1 / 32)),              # both tails are the endpoints
        (1, 6, 14 / 64),                   # pmf(0)+pmf(1)+pmf(5)+pmf(6)
        (3, 6, 1.0),                       # the mode: everything is <= it
        (15, 31, 1.0),                     # near-symmetric discordants
    ],
)
def test_binom_two_sided_exact(k, n, expected):
    assert binom_two_sided(k, n) == pytest.approx(expected, rel=1e-12)


def test_binom_two_sided_symmetry():
    # minlike two-sided test is symmetric in k <-> n-k at p=0.5
    for n in (7, 20, 49):
        for k in range(n + 1):
            assert binom_two_sided(k, n) == pytest.approx(
                binom_two_sided(n - k, n), rel=1e-9)


def test_paired_csv_consistent_with_error_artifacts():
    """The committed paired_tests.csv must be reproducible from the
    committed per-scene error npz files (same gt count, same discordant
    pairs, same p-values)."""
    exp_dir = ROOT / "data/exp_pro/smc_bop_cad"
    csv_path = exp_dir / "paired_tests.csv"
    if not csv_path.exists():
        pytest.skip("smc_bop_cad paired_tests.csv not present")
    with open(csv_path) as f:
        rows = list(csv.DictReader(f))
    correct = {}
    for row in rows:
        for s in (row["sampler_a"], row["sampler_b"]):
            if s not in correct:
                correct[s] = load_correct(exp_dir, s)
    for row in rows:
        mi = {"adds": 0, "vsd": 1}[row["metric"]]
        a = correct[row["sampler_a"]][mi]
        b = correct[row["sampler_b"]][mi]
        assert len(a) == int(row["n_gt"])
        b01, b10 = int(np.sum(a & ~b)), int(np.sum(~a & b))
        assert (b01, b10) == (int(row["a_only_correct"]),
                              int(row["b_only_correct"]))
        p = binom_two_sided(min(b01, b10), b01 + b10)
        assert p == pytest.approx(float(row["mcnemar_p"]), abs=5e-7)
