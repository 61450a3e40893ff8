"""Importing the package must never initialize a device backend.

Round-3 postmortem: a module-level ``jnp.log`` in distributions.py forced
jax backend init at ``import bayesianposeestimation``, so a wedged TPU
tunnel turned every entry point (bench.py, host-only scripts) into an
import-time hang/crash — and cost the round its bench artifact
(BENCH_r03.json rc:1). This test imports every submodule in a subprocess
whose only allowed jax platform is a nonexistent one: any device op at
import time raises immediately.
"""

import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

_SCRIPT = """
import jax
jax.config.update("jax_platforms", "nonexistent")
import importlib, pkgutil
import bayesianposeestimation.jl_tpu as pkg
for m in pkgutil.walk_packages(pkg.__path__, pkg.__name__ + "."):
    importlib.import_module(m.name)
print("OK")
"""


def test_package_import_performs_no_backend_init():
    env = {"PATH": "/usr/bin:/bin", "JAX_PLATFORMS": "nonexistent",
           "PYTHONPATH": str(REPO), "HOME": "/root"}
    proc = subprocess.run([sys.executable, "-c", _SCRIPT], capture_output=True,
                          text=True, timeout=120, env=env, cwd=str(REPO))
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "OK" in proc.stdout
