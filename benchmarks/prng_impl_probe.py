"""Probe: threefry vs rbg vs unsafe_rbg PRNG on the headline round.

Each CAP-GAN round draws ~3x(100,100) latent normals plus batch-offset
randints per client from threefry2x32 — op-count-heavy on TPU, where the
round is latency-bound (PERF.md).  ``rbg`` lowers to the hardware RNG
instruction; ``unsafe_rbg`` additionally cheapens split/fold_in.  Both
change the random STREAM (not the algorithm semantics), so they can only
ever be an opt-in knob — reference-numerics parity needs threefry.

Usage: python benchmarks/prng_impl_probe.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def measure(impl: str) -> float:
    # fresh process per impl would be cleaner, but the default_prng_impl
    # config only affects PRNGKey creation, so setting it before building
    # the runner (which creates every key) is sufficient
    import jax

    jax.config.update("jax_default_prng_impl", impl)

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
    state, _ = run(state)
    jax.block_until_ready(state)
    reps = 5
    t0 = time.perf_counter()
    for _ in range(reps):
        state, _ = run(state)
    jax.block_until_ready(state)
    return reps * chunk / (time.perf_counter() - t0)


if __name__ == "__main__":
    impl = sys.argv[1] if len(sys.argv) > 1 else None
    if impl:
        print(f"{impl}: {measure(impl):8.1f} rounds/s")
    else:
        import subprocess
        # plain "rbg" is excluded from the default sweep: its 200-round scan
        # never finished compiling within 5 min on the axon backend (see
        # PERF.md) — run `python benchmarks/prng_impl_probe.py rbg` to retry
        # it explicitly
        for i in ("threefry2x32", "unsafe_rbg"):
            r = subprocess.run([sys.executable, __file__, i], timeout=600)
            if r.returncode != 0:
                print(f"{i}: FAILED (rc={r.returncode})")
