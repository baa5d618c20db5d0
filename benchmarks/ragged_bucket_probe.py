"""Measure the ragged-sweep bucketing win on the FL-GAN MNIST workload.

The "epochs" local sweep (FLGAN/MNIST/flgan.py:249-269) is the wall-clock
dominator of the results suite (4613 s of the ~5400 s total in round 2):
every vmapped worker lane ran max(steps)=~115 scan iterations while the
mean worker needs ~38 — two thirds of the lane-steps were masked waste.
``_plan_buckets`` splits workers into step-count buckets, each scanning
only its own max.  This probe measures rounds/s with and without
bucketing on the same config (monkeypatching the planner off for the
baseline).  Run on the TPU:

    python -m benchmarks.ragged_bucket_probe
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from cglgan_tpu.algos import fedavg_family
from cglgan_tpu.algos.registry import build_runner
from cglgan_tpu.algos.runner import scan_rounds
from cglgan_tpu.core.config import FedGANConfig


def measure(bucketed: bool, *, chunk: int = 50, reps: int = 4) -> float:
    cfg = FedGANConfig(algo="flgan", dataset="synthetic-mnist",
                       num_workers=16, iid=1, batch_size=100, epoch=1,
                       num_communication=20000)
    orig = fedavg_family._plan_buckets
    if not bucketed:
        fedavg_family._plan_buckets = lambda *a, **k: None
    try:
        runner = build_runner(cfg)
    finally:
        fedavg_family._plan_buckets = orig
    state = runner.init_state()
    run = scan_rounds(runner.round_fn, chunk)
    state, _ = run(state)
    jax.block_until_ready(state)
    t0 = time.perf_counter()
    for _ in range(reps):
        state, _ = run(state)
    jax.block_until_ready(state)
    return reps * chunk / (time.perf_counter() - t0)


def main():
    off = measure(False)
    on = measure(True)
    print(f"flgan synthetic-mnist W=16 iid=1 epoch=1 (ragged 5..115 steps):")
    print(f"  unbucketed: {off:7.2f} rounds/s")
    print(f"  bucketed:   {on:7.2f} rounds/s  ({on / off:.2f}x)")


if __name__ == "__main__":
    main()
