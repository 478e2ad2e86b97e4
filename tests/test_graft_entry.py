"""Guard the driver contract: entry() compiles and dryrun_multichip runs
a DP step + BMUF round on the 8-device virtual mesh.

The multichip test reproduces the DRIVER's invocation exactly: a fresh
subprocess (sitecustomize on PYTHONPATH, JAX_PLATFORMS from the ambient
environment, no conftest platform forcing) running
``import __graft_entry__; __graft_entry__.dryrun_multichip(8)``.
Round 1 failed this contract (MULTICHIP_r01.json ok=false) because the
function assumed the caller had already forced the CPU platform.
"""

import os
import subprocess
import sys

import jax
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
AXON_SITE = "/root/.axon_site"

sys.path.insert(0, REPO)


@pytest.mark.slow
def test_entry_compiles():
    import __graft_entry__ as ge

    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    assert out.ndim == 4  # (B, T', U+1, V) log-prob lattice
    assert out.shape[0] == 2


@pytest.mark.slow
def test_dryrun_multichip_inprocess():
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)


@pytest.mark.slow
def test_dryrun_multichip_driver_contract():
    """The driver's bare call must succeed in a process whose sitecustomize
    pre-imports jax with a TPU platform pinned — dryrun_multichip has to
    force the 8-device CPU mesh itself."""
    env = dict(os.environ)
    pythonpath = [REPO]
    if os.path.isdir(AXON_SITE):
        pythonpath.append(AXON_SITE)
        # Reproduce the driver environment: the TPU platform pinned by the
        # ambient env, NOT the cpu override that tests/conftest.py exports.
        env["JAX_PLATFORMS"] = "axon"
    env["PYTHONPATH"] = os.pathsep.join(pythonpath)
    env.pop("XLA_FLAGS", None)
    proc = subprocess.run(
        [sys.executable, "-c",
         "import __graft_entry__; __graft_entry__.dryrun_multichip(8)"],
        env=env, cwd=REPO, capture_output=True, text=True, timeout=900,
    )
    assert proc.returncode == 0, (
        f"driver-style dryrun_multichip failed (rc={proc.returncode})\n"
        f"stdout:\n{proc.stdout}\nstderr:\n{proc.stderr}")
    assert "OK" in proc.stdout
