"""Driver-entry regression tests: the multichip dryrun must self-provision
its virtual device mesh even when the calling process only has one device
(MULTICHIP_r01 failure mode: TPU backend already initialized with 1 chip)."""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_dryrun_multichip_self_provisions_from_single_device():
    """Parent process pinned to ONE CPU device; dryrun_multichip(8) must
    re-exec itself with an 8-device virtual mesh and succeed."""
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env.pop("XLA_FLAGS", None)  # no pre-provisioned virtual devices
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    code = (
        "import jax; jax.config.update('jax_platforms', 'cpu');\n"
        "assert len(jax.devices()) == 1, jax.devices()\n"
        "import __graft_entry__ as g; g.dryrun_multichip(8)\n"
    )
    proc = subprocess.run([sys.executable, "-c", code], env=env, cwd=REPO,
                          capture_output=True, text=True, timeout=600)
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "dryrun_multichip ok [ordered]" in proc.stdout
    assert "dryrun_multichip ok [wavefront ED dp]" in proc.stdout
