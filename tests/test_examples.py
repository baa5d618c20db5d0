"""The shipped examples must keep running as the library API evolves."""
import os
import subprocess
import sys

import pytest

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_library_quickstart_runs():
    env = dict(os.environ,
               PALLAS_AXON_POOL_IPS="", JAX_PLATFORMS="cpu",
               XLA_FLAGS="--xla_force_host_platform_device_count=2",
               PYTHONPATH=_ROOT)
    out = subprocess.run(
        [sys.executable, os.path.join(_ROOT, "examples",
                                      "library_quickstart.py")],
        capture_output=True, text=True, timeout=600, env=env, cwd=_ROOT)
    assert out.returncode == 0, out.stderr[-2000:]
    assert "samples: (255, 2)" in out.stdout      # painter per-server quota
    assert "sharded round ok" in out.stdout
