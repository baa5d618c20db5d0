"""Extending the framework without touching it: round_fn composition.

Where a reference user edits the Worker/Server thread classes (e.g.
CGLGAN/MNIST/main.py:79-394) to change the protocol, here every algorithm
is one pure jittable transition ``round_fn(state) -> (state, metrics)`` —
so customization is function wrapping: the wrapped round stays jittable,
scannable and mesh-shardable, and `train()` accepts it unchanged.

This example adds three things to stock FL-GAN, all from user code:

1. a DP-style Gaussian perturbation of the aggregated discriminator
   after every round (key derived from the round counter — deterministic,
   resume-safe, no host RNG in the compiled loop);
2. a custom metric (global D parameter norm) surfaced per tick;
3. an early-stopping `on_tick` hook on mode coverage.

Run on CPU (~40 s):

    PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python examples/custom_round_composition.py
"""
import jax
import jax.numpy as jnp

from cglgan_tpu.algos.registry import build_runner
from cglgan_tpu.algos.runner import train
from cglgan_tpu.core.config import FedGANConfig

cfg = FedGANConfig(algo="flgan", dataset="2dmg", num_workers=10,
                   num_class=10, num_sample=1000, iid=1, batch_size=100,
                   num_communication=600, num_plt=100, seed=7)
base = build_runner(cfg)

DP_SIGMA = 1e-3
ROOT_KEY = jax.random.key(42)


def dp_round(state):
    """One federated round, then N(0, sigma^2) noise on the aggregated D
    parameters.  Everything stays a pure function of `state`."""
    state, metrics = base.round_fn(state)
    key = jax.random.fold_in(ROOT_KEY, state.t)         # per-round subkey
    leaves, treedef = jax.tree.flatten(state.d.params)
    keys = jax.random.split(key, len(leaves))
    noisy = [p + DP_SIGMA * jax.random.normal(k, p.shape, p.dtype)
             for p, k in zip(leaves, keys)]
    state = state._replace(
        d=state.d._replace(params=jax.tree.unflatten(treedef, noisy)))
    metrics = dict(metrics,
                   d_norm=jnp.sqrt(sum(jnp.sum(p * p) for p in noisy)))
    return state, metrics


custom = base._replace(round_fn=dp_round)


class EarlyStop(Exception):
    pass


def stop_when_covered(rnd, tick, state):
    print(f"round {rnd:4d}  kl={tick['kl_score']:.3f}  "
          f"coverage={tick['mode_coverage']:.2f}  "
          f"d_norm={tick['d_norm']:.2f}")
    if tick["mode_coverage"] >= 0.9:
        raise EarlyStop


try:
    out = train(custom, on_tick=stop_when_covered)
    print("finished all", cfg.num_communication, "rounds")
except EarlyStop:
    print("early-stopped at >=90% mode coverage")
