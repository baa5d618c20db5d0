"""Clients-axis scaling of the headline workload on one chip.

PERF.md's workload sweep showed 16-client CAP-GAN MNIST at 0.295 ms/round
but 128 clients at 4.64 ms — 2x WORSE than W-linear.  The round's matmul
work is W-linear by construction (one W-batched dot per layer), so the
super-linear tail must be HBM state traffic: per round, Adam reads and
rewrites every client's D and G params + both moment trees, and at W=128
that state (~0.5 GB f32 for the D stack alone) no longer hides behind
compute.  This probe measures rounds/s and ms/round at W in {16, 32, 64,
128} for float32 and bfloat16 (bf16 halves both param and moment bytes —
optax moments mirror the param dtype) and prints the per-worker cost so
the roofline crossover is visible.

Run on the TPU:

    python -m benchmarks.worker_scaling_probe
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from cglgan_tpu.algos.registry import build_runner
from cglgan_tpu.algos.runner import scan_rounds
from cglgan_tpu.core.config import FedGANConfig

WORKERS = (16, 32, 64, 128)
CHUNK = 500
REPS = 2


def measure(num_workers: int, dtype: str) -> float:
    cfg = FedGANConfig(algo="capgan", dataset="synthetic-mnist",
                       num_workers=num_workers, num_servers=1, iid=1,
                       batch_size=100, epoch=1, dtype=dtype,
                       num_communication=20000)
    runner = build_runner(cfg)
    state = runner.init_state()
    run = scan_rounds(runner.round_fn, CHUNK)
    state, _ = run(state)                      # compile + warm
    jax.block_until_ready(state)
    t0 = time.perf_counter()
    for _ in range(REPS):
        state, _ = run(state)
    jax.block_until_ready(state)
    dt = time.perf_counter() - t0
    return REPS * CHUNK / dt


def main():
    print(f"{'W':>4} {'dtype':>9} {'rounds/s':>9} {'ms/round':>9} "
          f"{'us/worker/round':>16}")
    base = {}
    for dtype in ("float32", "bfloat16"):
        for w in WORKERS:
            rps = measure(w, dtype)
            ms = 1000.0 / rps
            print(f"{w:>4} {dtype:>9} {rps:>9.1f} {ms:>9.3f} "
                  f"{1000.0 * ms / w:>16.2f}")
            base[(w, dtype)] = ms
    for dtype in ("float32", "bfloat16"):
        lin = base[(16, dtype)] * (128 / 16)
        print(f"{dtype}: 128-worker round {base[(128, dtype)]:.3f} ms vs "
              f"W-linear-from-16 {lin:.3f} ms "
              f"({base[(128, dtype)] / lin:.2f}x)")


if __name__ == "__main__":
    main()
