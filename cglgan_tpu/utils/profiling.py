"""Profiling hooks.

The reference has only vestigial ``time.time()`` pairs whose results are
never used (MDGAN/2DMG/mdgan.py:249,279-280; SURVEY.md §5).  Here:
``trace(logdir)`` wraps a block in a ``jax.profiler`` trace viewable in
TensorBoard/XProf, and the trainer already reports rounds/sec per tick.
"""
from __future__ import annotations

import contextlib

import jax


@contextlib.contextmanager
def trace(logdir: str):
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
