"""Mesh-path carry-donation probe (VERDICT r3 weak #2 / next #3).

Round 3 measured the 1-device GSPMD mesh at 0.24x unsharded for capgan
MNIST at chunk=1000 and attributed the gap to the tunneled backend
round-tripping the ~90 MB scan carry per dispatch.  This probe measures
the obvious lever — donating the carry buffers (``scan_rounds(donate=
True)``) so input/output alias — against the undonated path, unsharded
and on the 1-device mesh, at the production chunk (500).  Run on the real
chip:

    python -m benchmarks.mesh_donation_probe
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
from cglgan_tpu.core.meshes import client_mesh

CHUNK = 500


def measure(mesh, donate: bool, *, reps: int = 3) -> float:
    cfg = FedGANConfig(algo="capgan", dataset="synthetic-mnist",
                       num_workers=16, num_servers=1, iid=1, batch_size=100,
                       num_communication=20000)
    runner = build_runner(cfg, load_partition(cfg), mesh=mesh)
    state = runner.init_state()
    run = scan_rounds(runner.round_fn, CHUNK, donate=donate)
    state, _ = run(state)                    # compile + warm
    jax.block_until_ready(state)
    t0 = time.perf_counter()
    for _ in range(reps):
        state, _ = run(state)
    jax.block_until_ready(state)
    return reps * CHUNK / (time.perf_counter() - t0)


def main():
    print(f"device: {jax.devices()[0]}  chunk={CHUNK}", flush=True)
    rows = []
    for label, mesh in (("unsharded", None), ("mesh1", client_mesh(1))):
        for donate in (False, True):
            rps = measure(mesh, donate)
            rows.append((label, donate, rps))
            print(f"{label:10s} donate={donate!s:5s} {rps:8.1f} r/s",
                  flush=True)
    base = rows[0][2]
    for label, donate, rps in rows:
        print(f"{label:10s} donate={donate!s:5s} {rps / base:.3f}x of "
              "unsharded-undonated", flush=True)


if __name__ == "__main__":
    main()
