"""Bounded backend probe (utils/backend_probe.py) — shared by bench.py's
retry loop and `tpufed doctor`.  The wedge case (status "timeout") cannot
be simulated cheaply here; ok and fast-error paths are pinned.
"""
from cglgan_tpu.utils import backend_probe


def test_ok_on_cpu():
    status, info = backend_probe.probe(timeout=120, platform="cpu")
    assert status == "ok"
    assert info["platform"] == "cpu"
    assert info["count"] >= 1


def test_fast_error_reports_not_raises():
    status, info = backend_probe.probe(timeout=120,
                                       platform="no-such-backend")
    assert status == "error"
    assert isinstance(info, str) and info
