"""TPU probe: fused VMEM-resident D-epoch kernel vs the jitted scan path.

Times ONLY the per-round local-D phase of the headline workload (16 clients,
batch 100, MNIST-shaped 784-512-256-2 D, logits2 head) at several local
epoch counts E.  Both paths run inside lax.scan over R rounds so the axon
per-dispatch cost is amortised (env-tpu gotcha).

Run ON TPU:  python benchmarks/pallas_dstep_probe.py
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
import optax

from cglgan_tpu.algos import common
from cglgan_tpu.models.zoo import build_discriminator
from cglgan_tpu.ops.pallas.fused_dstep import fused_d_epoch_steps

W, B, DIN = 16, 100, 784
LR, B1, B2 = 2e-4, 0.5, 0.999
ROUNDS = 100


def setup(out_dim=2):
    d = build_discriminator("mnist", out_dim, in_dim=DIN)
    opt = optax.adam(LR, b1=B1, b2=B2)
    net = common.init_net_stacked(d, jax.random.key(0), opt, W)
    rng = np.random.default_rng(0)
    shard = jnp.asarray(rng.integers(0, 256, size=(W, 4096, DIN), dtype=np.uint8))
    fake = jnp.asarray(rng.normal(size=(B, DIN)).astype(np.float32))
    return d, opt, net, shard, fake


def time_scan(fn, state, reps=3):
    state2 = fn(state)                      # compile + warm
    jax.block_until_ready(state2)
    t0 = time.perf_counter()
    for _ in range(reps):
        state2 = fn(state2)
    jax.block_until_ready(state2)
    return (time.perf_counter() - t0) / (reps * ROUNDS)


def bench_baseline(E):
    d, opt, net, shard, fake = setup()
    adv = common.make_adv_loss("logits2")
    step = common.d_epoch_steps(
        common.d_step_fn(d, adv, opt, B, is_image=True, d_loss_half=True,
                         fuse_concat=True), E)
    starts = jnp.arange(E, dtype=jnp.int32) * 64 + 1
    key = jax.random.key(9)

    @jax.jit
    def run(net):
        def body(net, _):
            new, _loss = jax.vmap(step, in_axes=(0, 0, None, None, None))(
                net, shard, starts, fake, key)
            return new, None
        net, _ = jax.lax.scan(body, net, None, length=ROUNDS)
        return net

    return time_scan(run, net)


def bench_kernel(E):
    d, opt, net, shard, fake = setup()
    lin = [p for p in net.params if isinstance(p, dict)]
    six = (lin[0]["w"], lin[0]["b"], lin[1]["w"], lin[1]["b"],
           lin[2]["w"], lin[2]["b"])
    st = net.opt[0]
    mus = [p for p in st.mu if isinstance(p, dict)]
    nus = [p for p in st.nu if isinstance(p, dict)]
    mu6 = (mus[0]["w"], mus[0]["b"], mus[1]["w"], mus[1]["b"],
           mus[2]["w"], mus[2]["b"])
    nu6 = (nus[0]["w"], nus[0]["b"], nus[1]["w"], nus[1]["b"],
           nus[2]["w"], nus[2]["b"])
    starts = np.arange(E) * 64 + 1
    reals = jnp.stack([shard[:, s:s + B] for s in starts], axis=1)

    @jax.jit
    def run(carry):
        def body(carry, _):
            p, mu, nu, count = carry
            p, mu, nu, count, _loss = fused_d_epoch_steps(
                p, mu, nu, count, reals, fake, head="logits2",
                d_loss_half=True, is_image=True, lr=LR, b1=B1, b2=B2)
            return (p, mu, nu, count), None
        carry, _ = jax.lax.scan(body, carry, None, length=ROUNDS)
        return carry

    return time_scan(run, (six, mu6, nu6, jnp.int32(0)))


def main():
    print(f"devices: {jax.devices()}")
    print(f"{'E':>3} {'baseline ms':>12} {'kernel ms':>10} {'speedup':>8}")
    for E in (1, 2, 5, 10):
        tb = bench_baseline(E) * 1e3
        tk = bench_kernel(E) * 1e3
        print(f"{E:>3} {tb:12.4f} {tk:10.4f} {tb / tk:8.2f}x")


if __name__ == "__main__":
    main()
