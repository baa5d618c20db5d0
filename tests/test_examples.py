"""The shipped examples must keep running as the library API evolves."""
import os
import subprocess
import sys

import pytest

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run_example(name: str) -> str:
    env = dict(os.environ,
               PALLAS_AXON_POOL_IPS="", JAX_PLATFORMS="cpu",
               XLA_FLAGS="--xla_force_host_platform_device_count=2",
               PYTHONPATH=_ROOT)
    out = subprocess.run(
        [sys.executable, os.path.join(_ROOT, "examples", name)],
        capture_output=True, text=True, timeout=600, env=env, cwd=_ROOT)
    assert out.returncode == 0, out.stderr[-2000:]
    return out.stdout


@pytest.mark.slow
def test_library_quickstart_runs():
    stdout = _run_example("library_quickstart.py")
    assert "samples: (255, 2)" in stdout          # painter per-server quota
    assert "served: (50, 2)" in stdout            # serving export round-trip
    assert "sharded round ok" in stdout


@pytest.mark.slow
def test_custom_round_composition_runs():
    stdout = _run_example("custom_round_composition.py")
    assert "d_norm=" in stdout                    # custom metric surfaced
    assert ("finished all" in stdout
            or "early-stopped" in stdout)
