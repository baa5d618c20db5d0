"""Probe: does ``lax.scan(..., unroll=k)`` speed up the headline round?

The headline CAP-GAN round is ~75% batch-size-independent (PERF.md) —
op-count/latency-bound, not FLOP-bound.  Unrolling the round scan gives XLA
k rounds of straight-line code per scan iteration, letting it software-
pipeline independent ops across round boundaries (the D-step of round t+1
does not depend on the G-step of round t finishing its Adam update).

Usage: python benchmarks/scan_unroll_probe.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax


def measure(run, state, chunk, reps=5):
    state, _ = run(state)
    jax.block_until_ready(state)
    t0 = time.perf_counter()
    for _ in range(reps):
        state, _ = run(state)
    jax.block_until_ready(state)
    return reps * chunk / (time.perf_counter() - t0), state


def main():
    from cglgan_tpu.algos.registry import build_runner
    from cglgan_tpu.algos.runner import scan_rounds
    from cglgan_tpu.core.config import FedGANConfig

    cfg = FedGANConfig(algo="capgan", dataset="synthetic-mnist",
                       num_workers=16, num_servers=1, iid=1, batch_size=100,
                       epoch=1, num_communication=20000)
    runner = build_runner(cfg)
    chunk = 200
    for unroll in (1, 2, 4, 8):
        state = runner.init_state()
        run = scan_rounds(runner.round_fn, chunk, unroll=unroll)
        t0 = time.perf_counter()
        rps, _ = measure(run, state, chunk)
        print(f"unroll={unroll}: {rps:8.1f} rounds/s   "
              f"(total incl. compile {time.perf_counter()-t0:.1f}s)")


if __name__ == "__main__":
    main()
