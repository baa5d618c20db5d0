"""Bounded backend liveness probe.

The tunneled axon TPU backend can wedge such that ``jax.devices()`` hangs
forever (observed repeatedly in round 3), so no in-process call may ever
touch device init on a possibly-dead backend.  Probe in a killable
subprocess instead.  Shared by ``bench.py`` (retry loop before
measuring) and ``tpufed doctor`` (one-shot diagnosis).
"""
from __future__ import annotations

import json
import os
import subprocess
import sys
from typing import Any, Dict, Optional, Tuple

# A requested platform is enforced via jax.config INSIDE the child: this
# image's sitecustomize registers the axon TPU plugin and overrides the
# JAX_PLATFORMS env var, so env alone cannot steer the probe away from a
# wedged default backend — the config update after import wins (same
# technique as tests/conftest.py).
_PROBE_CODE = (
    "import json, os; import jax; "
    "p = os.environ.get('CGLGAN_PROBE_PLATFORM'); "
    "jax.config.update('jax_platforms', p) if p else None; "
    "ds = jax.devices(); "
    "print(json.dumps({'platform': ds[0].platform, "
    "'device_kind': ds[0].device_kind, 'count': len(ds)}))")


def probe(timeout: int = 60,
          platform: Optional[str] = None) -> Tuple[str, Any]:
    """Probe device init in a killable subprocess.

    Returns ``(status, info)``: ``("ok", {platform, device_kind, count})``,
    ``("error", message)`` for a fast failure (code/registration problem,
    not an infra wedge), or ``("timeout", None)`` when init exceeded the
    deadline (wedged tunnel).
    """
    env = dict(os.environ)
    if platform:
        env["CGLGAN_PROBE_PLATFORM"] = platform
    try:
        out = subprocess.run([sys.executable, "-c", _PROBE_CODE],
                             capture_output=True, text=True,
                             timeout=timeout, env=env)
    except subprocess.TimeoutExpired:
        return "timeout", None
    if out.returncode == 0:
        for line in reversed(out.stdout.strip().splitlines()):
            try:
                return "ok", json.loads(line)
            except json.JSONDecodeError:
                continue
        return "error", "probe printed no parseable device report"
    tail = out.stderr.strip().splitlines()
    return "error", (tail[-1][:200] if tail
                     else f"probe exited {out.returncode} with no stderr")
