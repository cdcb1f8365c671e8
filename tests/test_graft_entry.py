"""Driver-contract test for __graft_entry__.dryrun_multichip.

The driver imports the module and calls ``dryrun_multichip(8)`` with NO
platform setup of its own (round-1 failure mode: all CPU/virtual-device
config lived in the ``__main__`` block, so the driver's direct call hit the
live 1-device TPU backend). This test replays the driver's exact calling
convention in a subprocess whose environment has neither JAX_PLATFORMS=cpu
nor the device-count XLA flag.
"""

import os
import subprocess
import sys
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_dryrun_multichip_driver_convention():
    env = dict(os.environ)
    # strip the harness's CPU/virtual-device setup: the function must
    # reconstruct it internally
    env.pop("JAX_PLATFORMS", None)
    env["XLA_FLAGS"] = " ".join(
        f for f in env.get("XLA_FLAGS", "").split()
        if "xla_force_host_platform_device_count" not in f
    )
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    # keep the subprocess off the real TPU: the tunnel serializes clients
    # and a second live backend would wedge concurrent runs. The dryrun
    # itself never asks for the TPU, but a regression would — fail fast
    # instead of hanging.
    proc = subprocess.run(
        [sys.executable, "-c",
         "import __graft_entry__ as g; g.dryrun_multichip(4)"],
        env=env, cwd=REPO, capture_output=True, text=True, timeout=560,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "dryrun_multichip OK" in proc.stdout
