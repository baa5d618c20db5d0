"""TPU probe: fused local D/G-sweep kernel vs the jitted scan path,
END-TO-END FedAvg-family rounds (broadcast + local sweep + aggregation).

Measures flgan and fegan 2DMG rounds/s at several local epoch counts E,
with the fused kernel (ops/pallas/fused_sweep.py) forced on vs off.  Rounds
run inside lax.scan chunks so the axon per-dispatch cost is amortised.

Run ON TPU:  python benchmarks/pallas_sweep_probe.py
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from cglgan_tpu.algos.registry import build_runner, load_partition
from cglgan_tpu.algos.runner import scan_rounds
from cglgan_tpu.core.config import FedGANConfig

CHUNK = 100


def bench(algo, epoch, kernel, num_workers=16, reps=3, **kw):
    cfg = FedGANConfig(algo=algo, dataset="2dmg", num_workers=num_workers,
                       num_class=8, num_sample=1000, batch_size=100, iid=1,
                       epoch=epoch, num_communication=20000,
                       pallas_sweep=kernel, **kw)
    runner = build_runner(cfg, load_partition(cfg))
    state = runner.init_state()
    run = scan_rounds(runner.round_fn, CHUNK)
    state, _ = run(state)                    # compile + warm
    jax.block_until_ready(state)
    t0 = time.perf_counter()
    for _ in range(reps):
        state, _ = run(state)
    jax.block_until_ready(state)
    dt = (time.perf_counter() - t0) / (reps * CHUNK)
    return 1.0 / dt


def main():
    for algo, kw in (("flgan", {}), ("fegan", {"frac_workers": 0.5})):
        for epoch in (1, 2, 5):
            base = bench(algo, epoch, False, **kw)
            fused = bench(algo, epoch, True, **kw)
            print(f"{algo} E={epoch}: baseline {base:8.1f} r/s   "
                  f"fused {fused:8.1f} r/s   ({fused / base:.2f}x)")


if __name__ == "__main__":
    main()
