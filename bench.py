"""Headline benchmark: 16-client CAP-GAN MNIST federated rounds/sec on TPU.

This is BASELINE.md's north-star workload (16-client CAP-GAN, batch 100,
MNIST-shaped data).  The baseline denominator is the reference's execution
architecture — torch CPU, one thread per federated node, queue transport —
self-measured by benchmarks/torch_baseline.py on this machine (the reference
publishes no numbers; see BASELINE.md).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""
import json
import os
import subprocess
import sys
import time

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, _HERE)

# Fallback if the live measurement fails: self-measured on this image
# (torch 1-thread CPU, 16 workers, batch 100, CAP-GAN protocol): 4.08 r/s.
TORCH_CPU_BASELINE_FALLBACK_RPS = 4.08


def measure_baseline_rps(timeout: int = 240) -> tuple:
    """Measure the torch-CPU thread/queue baseline LIVE in a subprocess (so
    a silent torch/thread-count env change cannot skew vs_baseline), falling
    back to the cached constant.  Returns (rps, source)."""
    try:
        out = subprocess.run(
            [sys.executable, "-c",
             "import sys; sys.path.insert(0, %r); "
             "from benchmarks.torch_baseline import measure_rounds_per_sec; "
             "print(measure_rounds_per_sec())" % _HERE],
            capture_output=True, text=True, timeout=timeout, cwd=_HERE)
        rps = float(out.stdout.strip().splitlines()[-1])
        if out.returncode == 0 and rps > 0:
            return rps, "live"
    except Exception:
        pass
    return TORCH_CPU_BASELINE_FALLBACK_RPS, "cached"


def main():
    import jax

    from cglgan_tpu.algos.registry import build_runner
    from cglgan_tpu.algos.runner import scan_rounds
    from cglgan_tpu.core.config import FedGANConfig

    cfg = FedGANConfig(algo="capgan", dataset="synthetic-mnist",
                       num_workers=16, num_servers=1, iid=1, batch_size=100,
                       epoch=1, num_communication=20000)
    runner = build_runner(cfg)
    state = runner.init_state()

    chunk = 200
    run = scan_rounds(runner.round_fn, chunk)
    state, _ = run(state)                    # compile + warm
    jax.block_until_ready(state)

    reps = 5
    t0 = time.perf_counter()
    for _ in range(reps):
        state, metrics = run(state)
    jax.block_until_ready(state)
    dt = time.perf_counter() - t0
    rps = reps * chunk / dt

    live, source = measure_baseline_rps()
    # conservative denominator: a loaded host can make the live torch
    # baseline measure artificially slow, inflating vs_baseline — take the
    # FASTER of (live, cached) so the reported speedup never benefits from
    # transient machine contention
    baseline = max(live, TORCH_CPU_BASELINE_FALLBACK_RPS)
    if baseline != live:
        source = f"{source}-floored-at-cached"
    print(json.dumps({
        "metric": "capgan16_mnist_rounds_per_sec",
        "value": round(rps, 2),
        "unit": "federated rounds/sec (16 clients, batch 100)",
        "vs_baseline": round(rps / baseline, 2),
        "baseline_rps": round(baseline, 3),
        "baseline_source": source,
    }))


if __name__ == "__main__":
    main()
