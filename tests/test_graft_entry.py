"""Driver-contract regression tests for __graft_entry__.

dryrun_multichip must self-bootstrap a virtual n-device CPU mesh when the
visible backend has fewer devices (the axon tunnel exposes exactly one chip),
instead of asserting — round-1 MULTICHIP artifact failure.
"""
import os
import re
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_dryrun_bootstraps_virtual_mesh_from_single_device():
    # Parent subprocess sees ONE CPU device (no forced host device count);
    # dryrun_multichip(4) must detect the shortfall and re-exec itself with
    # a 4-device virtual mesh rather than raising.
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = re.sub(
        r"--xla_force_host_platform_device_count=\d+", "",
        env.get("XLA_FLAGS", "")).strip()
    code = (
        "import jax; jax.config.update('jax_platforms', 'cpu')\n"
        "assert len(jax.devices()) == 1, jax.devices()\n"
        "import __graft_entry__ as g; g.dryrun_multichip(4)\n"
    )
    r = subprocess.run([sys.executable, "-c", code], env=env, cwd=REPO,
                       capture_output=True, text=True, timeout=600)
    assert r.returncode == 0, r.stderr[-2000:]
    assert "dp ok on 4 devices" in r.stdout
    assert "data x inst (2x2) ok" in r.stdout


def test_dryrun_runs_inline_when_devices_suffice():
    # Under the test conftest there are 8 virtual CPU devices already; the
    # dryrun must run inline (no subprocess) and succeed.
    import __graft_entry__ as g
    g.dryrun_multichip(2)
