"""Trajectory evaluation (scripts/trajectory_error.py): association, ATE/RPE.

Parity context: the reference exports TUM trajectories for offline comparison
(/root/reference/src/ExperimentUtils.jl:47-57); this pins the error math on
synthetic trajectories with known answers.
"""

import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "scripts"))

import trajectory_error as te  # noqa: E402

from bayesianposeestimation.jl_tpu.utils.experiment_io import (  # noqa: E402
    load_tum,
    save_tum,
)


def _orbit(n, dt=1 / 30):
    import jax
    import jax.numpy as jnp

    from bayesianposeestimation.jl_tpu import quaternions as quat

    s = np.arange(n) * dt
    t = np.stack([0.1 * np.sin(s), 0.05 * np.cos(s), 1.0 + 0.02 * s], 1)
    q = np.asarray(jax.vmap(quat.qexp)(jnp.asarray(
        np.stack([0.5 * s, 0.1 * np.sin(s), np.zeros(n)], 1), np.float32)))
    return s, t.astype(np.float64), q.astype(np.float64)


def test_associate_nearest():
    est = np.asarray([0.0, 0.101, 0.35])
    gt = np.asarray([0.0, 0.033, 0.066, 0.1, 0.133, 0.3])
    ie, ig = te.associate(est, gt, max_dt=0.02)
    # 0.35 is 0.05 from the nearest gt stamp -> dropped
    np.testing.assert_array_equal(ie, [0, 1])
    np.testing.assert_array_equal(ig, [0, 3])


def test_perfect_trajectory_zero_error(tmp_path):
    s, t, q = _orbit(60)
    save_tum(tmp_path / "e.tum", s, t, q)
    s2, t2, q2 = load_tum(tmp_path / "e.tum")
    ie, ig = te.associate(s2, s2)
    assert len(ie) == 60
    assert np.linalg.norm(t2[ie] - t2[ig], axis=1).max() == 0.0
    assert te.quat_angle(q2[ie], q2[ig]).max() < 1e-6
    rpe_t, rpe_r = te.relative_errors(t2, q2, t2, q2)
    assert rpe_t.max() < 1e-9 and rpe_r.max() < 1e-5


def test_constant_offset_ate_but_zero_rpe():
    """A constant translation offset shows up fully in ATE but (expressed in
    the object frame with identical rotations) not in the relative error."""
    s, t, q = _orbit(60)
    off = np.asarray([0.01, -0.02, 0.005])
    trans_err = np.linalg.norm((t + off) - t, axis=1)
    assert np.allclose(trans_err, np.linalg.norm(off))
    q_id = np.tile([1.0, 0, 0, 0], (60, 1))
    rpe_t, rpe_r = te.relative_errors(t + off, q_id, t, q_id)
    assert rpe_t.max() < 1e-9
    assert rpe_r.max() < 1e-5


def test_quat_angle_sign_invariant():
    q = np.asarray([[1.0, 0, 0, 0]])
    assert te.quat_angle(q, -q)[0] == pytest.approx(0.0, abs=1e-6)
    # 90 deg about z
    qz = np.asarray([[np.cos(np.pi / 4), 0, 0, np.sin(np.pi / 4)]])
    assert te.quat_angle(q, qz)[0] == pytest.approx(np.pi / 2, abs=1e-6)
