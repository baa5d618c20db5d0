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


def mnist_proxy(W=16, B=100, epochs=(1, 5), reps=3, steps=20):
    """The MNIST-regime measurement (VERDICT r4 weak #3): the sweep
    structure at the FLGAN/MNIST shapes — 1.49M-param G (100-128-256-512-
    1024-784), 533k-param D (784-512-256-1), W=16, B=100 — with BatchNorm
    elided on BOTH paths so the comparison isolates the state-residency
    question the kernel exists to answer.  The full G+D Adam state at these
    shapes is ~24 MB/worker vs ~16 MB VMEM/core, so the expected outcome is
    a Mosaic VMEM failure (recorded as such) or a heavy-spill slowdown;
    either result settles whether a real MNIST sweep kernel is worth
    building on this generation.
    """
    import functools

    import jax.numpy as jnp
    import numpy as np
    import optax

    from cglgan_tpu.ops.pallas.fused_sweep import fused_sweep_steps

    G_DIMS = [(100, 128), (128, 256), (256, 512), (512, 1024), (1024, 784)]
    D_DIMS = [(784, 512), (512, 256), (256, 1)]
    key = jax.random.key(0)

    def flat_state(dims, k):
        ks = jax.random.split(k, len(dims))
        flat = []
        for (i, o), kk in zip(dims, ks):
            flat += [jax.random.normal(kk, (W, i, o)) * 0.05,
                     jnp.zeros((W, o))]
        return flat

    g_p = flat_state(G_DIMS, jax.random.fold_in(key, 1))
    d_p = flat_state(D_DIMS, jax.random.fold_in(key, 2))
    zeros = lambda flat: [jnp.zeros_like(t) for t in flat]
    state_mb = sum(t.nbytes for t in g_p + d_p) * 3 / W / 2**20
    print(f"mnist-proxy: per-worker G+D Adam state = {state_mb:.1f} MB "
          f"(VMEM ~16 MB/core)")

    def fwd(flat, x, last):
        h = x
        n = len(flat) // 2
        for i in range(n):
            h = h @ flat[2 * i] + flat[2 * i + 1]
            if i < n - 1:
                h = jnp.where(h >= 0, h, 0.2 * h)
        return jnp.tanh(h) if last == "tanh" else jax.nn.sigmoid(h)

    opt = optax.adam(2e-4, b1=0.5, b2=0.999)

    def xla_sweep(carry, eb):
        g, d, og, od = carry
        real, z1, z2 = eb

        def d_loss(dp):
            fake = fwd(g, z1, "tanh")
            p = jnp.clip(fwd(dp, jnp.concatenate([real, fake]), "sigmoid"),
                         1e-12, 1 - 1e-7)
            tgt = (jnp.arange(2 * B)[:, None] < B).astype(jnp.float32)
            return -jnp.mean(tgt * jnp.log(p) + (1 - tgt) * jnp.log1p(-p)) * 2

        gd = jax.grad(d_loss)(d)
        up, od = opt.update(gd, od)
        d = [a + b for a, b in zip(d, up)]

        def g_loss(gp):
            p = jnp.clip(fwd(d, fwd(gp, z2, "tanh"), "sigmoid"),
                         1e-12, 1 - 1e-7)
            return -jnp.mean(jnp.log(p))

        gg = jax.grad(g_loss)(g)
        up, og = opt.update(gg, og)
        g = [a + b for a, b in zip(g, up)]
        return (g, d, og, od), 0.0

    def time_it(fn, *args):
        out = fn(*args)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn(*args)
        jax.block_until_ready(out)
        return (time.perf_counter() - t0) / reps

    for E in epochs:
        ks = jax.random.fold_in(key, 10 + E)
        reals = jax.random.normal(jax.random.fold_in(ks, 0), (W, E, B, 784))
        z1 = jax.random.normal(jax.random.fold_in(ks, 1), (W, E, B, 100))
        z2 = jax.random.normal(jax.random.fold_in(ks, 2), (W, E, B, 100))

        @jax.jit
        def run_xla(g_p, d_p, reals, z1, z2, _E=E):
            def worker(g, d, r, a, b):
                init = (g, d, opt.init(g), opt.init(d))
                (g, d, _, _), _ = jax.lax.scan(xla_sweep, init, (r, a, b))
                return g, d
            return jax.vmap(worker)(
                [t.reshape((W, -1, t.shape[-1])) if t.ndim == 2 else t
                 for t in g_p],
                [t.reshape((W, -1, t.shape[-1])) if t.ndim == 2 else t
                 for t in d_p], reals, z1, z2)

        # scan wants uniform pytrees: pass biases as (W,1,o) inside run_xla
        dt_x = time_it(run_xla, g_p, d_p, reals, z1, z2)
        sweeps_x = 1.0 / dt_x
        print(f"mnist-proxy E={E}: XLA sweep {sweeps_x:8.2f} sweeps/s "
              f"({W}w x {E} interleaved D/G steps)")

        try:
            run_k = jax.jit(functools.partial(
                fused_sweep_steps, lr_g=2e-4, lr_d=2e-4, b1=0.5, b2=0.999))
            dt_k = time_it(
                run_k, tuple(g_p), tuple(zeros(g_p)), tuple(zeros(g_p)),
                jnp.zeros((W,), jnp.int32), tuple(d_p), tuple(zeros(d_p)),
                tuple(zeros(d_p)), jnp.zeros((W,), jnp.int32),
                reals, z1, z2)
            print(f"mnist-proxy E={E}: fused kernel {1.0 / dt_k:8.2f} "
                  f"sweeps/s ({1.0 / dt_k / sweeps_x:.2f}x)")
        except Exception as e:
            msg = str(e).splitlines()[0][:200]
            print(f"mnist-proxy E={E}: fused kernel FAILED — {msg}")


def main():
    if "--mnist-proxy" in sys.argv:
        mnist_proxy()
        return
    for algo, kw in (("flgan", {}), ("fegan", {"frac_workers": 0.5})):
        for epoch in (1, 2, 5):
            base = bench(algo, epoch, False, **kw)
            fused = bench(algo, epoch, True, **kw)
            print(f"{algo} E={epoch}: baseline {base:8.1f} r/s   "
                  f"fused {fused:8.1f} r/s   ({fused / base:.2f}x)")
    mnist_proxy()


if __name__ == "__main__":
    main()
