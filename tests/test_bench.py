"""The driver-facing bench artifact contract (bench.py).

bench.py must print ONE parseable JSON line in every outcome, including
the wedged-tunnel fallback (the axon tunnel has been observed to hang
device init for hours — see docs/CHANGELOG.md round 3).  These tests pin
the cached record's schema to the live record's so the fallback cannot
silently desync, without ever touching a backend.
"""
import ast
import json
import os
import sys

import pytest

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)

import bench  # noqa: E402


def test_cached_record_is_one_json_line():
    line = json.dumps(bench.CACHED_TPU_RECORD)
    assert "\n" not in line
    parsed = json.loads(line)
    assert parsed["metric"] == "capgan16_mnist_rounds_per_sec"
    assert parsed["tpu_source"].startswith("cached")
    for k, v in parsed.items():
        if isinstance(v, float):
            assert v > 0, k


def _live_record_keys():
    """Static-parse main()'s record literal so the schema check needs no
    TPU (the runtime assert in main() re-checks it on the live path)."""
    with open(os.path.join(_ROOT, "bench.py")) as f:
        tree = ast.parse(f.read())
    for node in ast.walk(tree):
        if (isinstance(node, ast.Assign)
                and any(getattr(t, "id", None) == "record"
                        for t in node.targets)
                and isinstance(node.value, ast.Dict)):
            return {k.value for k in node.value.keys
                    if isinstance(k, ast.Constant)}
    pytest.fail("record dict literal not found in bench.main()")


def test_cached_schema_matches_live_schema():
    assert set(bench.CACHED_TPU_RECORD) == _live_record_keys()


def test_split_fixed_program_recovers_known_decomposition():
    # synthesize throughputs from a known (fixed=150ms, 0.3ms/round) model
    fixed, per_round = 0.150, 0.0003
    rps_a = 500 / (fixed + 500 * per_round)
    rps_b = 2000 / (fixed + 2000 * per_round)
    f, p = bench.split_fixed_program(rps_a, rps_b, 500, 2000)
    assert abs(f - fixed) < 1e-9
    assert abs(p - per_round) < 1e-12


def test_baseline_fallback_covers_both_epoch_settings():
    # main() divides by _floored(1) and _floored(5); both must have a
    # cached floor so a dead torch subprocess cannot crash the artifact
    assert {1, 5} <= set(bench.TORCH_CPU_BASELINE_FALLBACK_RPS)
    assert all(v > 0 for v in bench.TORCH_CPU_BASELINE_FALLBACK_RPS.values())
