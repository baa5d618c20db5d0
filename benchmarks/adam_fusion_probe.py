"""Probe: exact-f32-numerics round-time levers on the headline workload.

VERDICT round-1 follow-up (PERF.md "future levers"): the two D Adam updates
are ~0.12 ms of the 0.295 ms CAP-GAN round.  Candidates measured here, all
bit-identical math to optax.adam:

* v0  baseline round_fn (optax.adam)
* v1  hand-inlined Adam — one tree pass computing (p, mu, nu) updates with
  precomputed bias-correction scalars, no optax tree machinery
* v2  donated scan carry — jit(run, donate_argnums=0) so XLA reuses the
  state buffers in place instead of copying the carry

Run ON TPU (the axon default platform):
    python benchmarks/adam_fusion_probe.py
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def headline_runner(inline_adam: bool):
    """The families look up ``optax.adam`` at build time, so patching the
    attribute around build_runner swaps every optimizer instance."""
    import optax

    from cglgan_tpu.algos.common import adam_inline
    from cglgan_tpu.algos.registry import build_runner
    from cglgan_tpu.core.config import FedGANConfig

    cfg = FedGANConfig(algo="capgan", dataset="synthetic-mnist",
                       num_workers=16, num_servers=1, iid=1, batch_size=100,
                       epoch=1, num_communication=20000)
    if not inline_adam:
        return build_runner(cfg)
    real_adam = optax.adam
    optax.adam = lambda lr, b1=0.9, b2=0.999, **kw: adam_inline(lr, b1, b2)
    try:
        return build_runner(cfg)
    finally:
        optax.adam = real_adam


def measure(run, state, chunk, reps=5):
    state, _ = run(state)                    # compile + warm
    jax.block_until_ready(state)
    t0 = time.perf_counter()
    for _ in range(reps):
        state, _ = run(state)
    jax.block_until_ready(state)
    dt = time.perf_counter() - t0
    return reps * chunk / dt, state


def main():
    from cglgan_tpu.algos.runner import scan_rounds

    chunk = 200
    print(f"devices: {jax.devices()}")

    # v0: baseline
    r0 = headline_runner(inline_adam=False)
    run0 = scan_rounds(r0.round_fn, chunk)
    rps0, s0 = measure(run0, r0.init_state(), chunk)
    print(f"v0 baseline optax.adam:      {rps0:8.1f} rounds/s")

    # v2: donated carry on the same round_fn
    def body(state, _):
        return r0.round_fn(state)[0], None

    @lambda f: jax.jit(f, donate_argnums=0)
    def run2(state):
        state, _ = jax.lax.scan(body, state, None, length=chunk)
        return state, None

    rps2, _ = measure(run2, r0.init_state(), chunk)
    print(f"v2 donated scan carry:       {rps2:8.1f} rounds/s")

    # v1: inline adam
    r1 = headline_runner(inline_adam=True)
    run1 = scan_rounds(r1.round_fn, chunk)
    rps1, s1 = measure(run1, r1.init_state(), chunk)
    print(f"v1 inline adam:              {rps1:8.1f} rounds/s")

    # numerics check: v1 params must be BIT-identical to v0 after 1200
    # rounds (same op order as optax.scale_by_adam + scale)
    max_diff = 0.0
    for a, b in zip(jax.tree.leaves(s0.g.params), jax.tree.leaves(s1.g.params)):
        max_diff = max(max_diff, float(np.abs(np.asarray(a)
                                              - np.asarray(b)).max()))
    print(f"v1 vs v0 max param diff after {chunk} warmup + {5 * chunk} "
          f"measured rounds: {max_diff:.3e}")


if __name__ == "__main__":
    main()
