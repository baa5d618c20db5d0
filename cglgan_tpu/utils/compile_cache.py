"""Persistent XLA compilation cache for `tpufed` invocations.

The first compile of a jitted federated round costs 20-100 s on the TPU
backend (PERF.md "first compile"); the reference pays no such step (eager
torch), so an unconfigured framework loses its first minute to XLA on
every process start — every `tpufed run`, every `tpufed sweep` arm in a
fresh process, every driver restart.  JAX ships a persistent on-disk
compilation cache keyed on (serialized HLO, compile options, backend
version): with it enabled, re-running any already-seen (config, shapes)
program loads the compiled executable in milliseconds instead of
recompiling.

`enable()` is called by every CLI command (cli.py) unless the user passes
``--compile-cache off``; library users call it directly.  The cache
directory resolves, in order:

1. an explicit ``path`` argument / ``--compile-cache DIR``,
2. ``$CGLGAN_TPU_COMPILE_CACHE`` (``off``/``0``/empty disables),
3. ``$XDG_CACHE_HOME/cglgan_tpu/xla`` (default ``~/.cache/cglgan_tpu/xla``).

Enabling is best-effort: on an unwritable filesystem the cache is skipped
with a warning rather than failing the run.  Entries are keyed by backend,
so one directory safely serves CPU tests and TPU runs side by side.

Caveat: XLA:CPU entries embed the compiling host's CPU features — do not
share a cache directory across heterogeneous hosts (XLA logs a
machine-feature mismatch and may SIGILL).  TPU entries are keyed by
device kind and are safe to share between same-generation chips.
"""
from __future__ import annotations

import os
import warnings
from typing import Optional

_OFF = ("off", "0", "none", "")
_configured = False


def configured() -> bool:
    """True once `enable()` has made a decision this process (including
    the decision to DISABLE via off/env) — lets late callers like
    bench.main() default the cache on without overriding an explicit
    `--compile-cache off`/DIR choice made at the CLI."""
    return _configured


def default_dir() -> str:
    base = os.environ.get("XDG_CACHE_HOME",
                          os.path.join(os.path.expanduser("~"), ".cache"))
    return os.path.join(base, "cglgan_tpu", "xla")


def enable(path: Optional[str] = None,
           min_compile_secs: float = 0.2) -> Optional[str]:
    """Turn on JAX's persistent compilation cache at ``path``.

    Returns the resolved cache directory, or None when disabled (path/env
    set to one of ``off``/``0``/``none``/empty) or unusable.  Safe to call
    repeatedly and before/after jax initializes its backends; it only sets
    config flags read at compile time.

    ``min_compile_secs``: only executables whose compile took at least this
    long are persisted (keeps the sub-ms CPU test programs from churning
    the directory while catching every real TPU round, which compiles in
    seconds to minutes).
    """
    global _configured
    _configured = True
    if path is None:
        path = os.environ.get("CGLGAN_TPU_COMPILE_CACHE", default_dir())
    if path.strip().lower() in _OFF:
        return None
    path = os.path.abspath(os.path.expanduser(path))
    try:
        os.makedirs(path, exist_ok=True)
        probe = os.path.join(path, ".writable")
        with open(probe, "w"):
            pass
        os.remove(probe)
    except OSError as e:
        warnings.warn(f"compilation cache disabled: {path!r} not writable "
                      f"({e})", stacklevel=2)
        return None
    import jax
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs",
                      min_compile_secs)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    return path
